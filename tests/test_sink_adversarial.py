"""Hostile-key battery for the partitioned sinks (`sources/readers.py`
K1/K3): partition-column VALUES become directory names, so a scraped
key containing path separators, '=', unicode, whitespace, or percent
sequences must round-trip through Spark's partition-value escaping —
and the two values that CANNOT round-trip (the Hive conventions) must
stay pinned and documented rather than silently drift:

- empty string   → read back as NULL (Hive default-partition rule);
- the literal '__HIVE_DEFAULT_PARTITION__' → read back as NULL (it IS
  the default-partition sentinel, indistinguishable on disk).

Everything else — including '/', '=', ':', '..', '%2F', '#', tabs,
unicode — must come back byte-identical. A pipeline partitioning by an
uncontrolled scraped column (source/site/lang) relies on exactly this;
the F8 null/blank-skip operators exist to normalize the two
non-round-trippable values upstream.

The keyed-overwrite sink's hostile-key behavior (NULL keys, upsert
merge) is pinned in tests/test_idempotent_sink.py.
"""

from __future__ import annotations

from syntheticdata_pipeline__spark.sources.readers import write_keyed_json

ROUND_TRIP_KEYS = [
    "a/b",                  # path separator → escaped in dir name
    "a=b",                  # partition k=v syntax collision
    "a:b",
    "a b",                  # space
    "a\tb",                 # tab
    "..",                   # directory traversal shape
    "café",                 # unicode latin
    "中文",                 # unicode CJK
    "a#b",                  # fragment char
    "a%2Fb",                # pre-escaped percent sequence (must NOT decode)
    "dot.",
    "ALL_CAPS",
]

COLLAPSE_TO_NULL = [
    "",                             # Hive: empty partition value = default
    "__HIVE_DEFAULT_PARTITION__",   # Hive: the sentinel itself
]


def test_partition_value_round_trip(spark, tmp_path):
    vals = ROUND_TRIP_KEYS + COLLAPSE_TO_NULL + [None]
    # repartition(1) forces every colliding value into ONE task — the
    # deterministic reproduction of the pre-fix FileAlreadyExistsException
    # (three in-memory values escaping to the same partition directory
    # made the dynamic writer open the same output file twice per task)
    df = spark.createDataFrame(
        [(i, v, f"payload{i}") for i, v in enumerate(vals)],
        "id int, k string, payload string",
    ).repartition(1)
    path = str(tmp_path / "keyed_json")
    write_keyed_json(df, path, partition_cols=["k"])
    back = {r.id: r.k for r in spark.read.json(path).collect()}

    assert len(back) == len(vals)  # conservation: no row lost to escaping
    for i, v in enumerate(vals):
        if v in COLLAPSE_TO_NULL or v is None:
            assert back[i] is None, f"id {i}: {v!r} should collapse to NULL"
        else:
            assert back[i] == v, f"id {i}: wrote {v!r}, read {back[i]!r}"


def test_hostile_partition_dirs_stay_inside_root(spark, tmp_path):
    # '..' and '/' in values must be escaped into the partition dir name,
    # never interpreted as path navigation
    import os

    df = spark.createDataFrame(
        [(1, "..", "p"), (2, "../..", "q"), (3, "a/b", "r")],
        "id int, k string, payload string",
    )
    root = tmp_path / "traversal"
    write_keyed_json(df, str(root), partition_cols=["k"])
    outside = [
        p for p in (tmp_path / "..").resolve().iterdir() if p.name == "k=.."
    ] if (tmp_path / "..").resolve().exists() else []
    assert not outside
    # all three rows land under the sink root and read back intact
    back = sorted((r.id, r.k) for r in spark.read.json(str(root)).collect())
    assert back == [(1, ".."), (2, "../.."), (3, "a/b")]
    # and every partition directory is a direct child of the root
    parts = [d for d in os.listdir(root) if d.startswith("k=")]
    assert len(parts) == 3


def test_objectstore_key_cannot_escape_root(tmp_path):
    # S3 keys are opaque ('..' is literal key text there); the directory
    # adapter cannot represent that, so a traversal key must be rejected
    # loudly — before the fix, put('../../x', ...) wrote OUTSIDE the
    # store root (an uncontrolled scraped id in a key template).
    import pytest as _pytest

    from syntheticdata_pipeline__spark.sources.objectstore import LocalFSStore

    root = tmp_path / "store"
    root.mkdir()
    store = LocalFSStore(str(root))
    store.put("a/b/ok.txt", b"fine")
    assert store.get("a/b/ok.txt") == b"fine"
    # interior dot-dot that STAYS inside the root normalizes harmlessly
    assert store.get("a/b/../b/ok.txt") == b"fine"
    for hostile in ("../escape.txt", "a/../../escape.txt", "/../escape.txt"):
        with _pytest.raises(ValueError):
            store.put(hostile, b"evil")
    assert not (tmp_path / "escape.txt").exists()
