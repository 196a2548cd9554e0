"""Hostile-bytes battery for the S1 tolerant JSONL scan
(`sources/readers.py::read_jsonl_tolerant`).

The reference's prompt/JSON ingestion loops over attacker-adjacent files
with per-line try/except (AsyncImageGen/src/parser.py:5-45,
prompts_parser.py:35-86): a corrupt line is logged and skipped, never
fatal, and never silently lost. The engine's PERMISSIVE reader must
honor the same contract at the BYTE level, where the existing S1 test
(tests/test_sources.py — well-formed text with one bad line) cannot
reach. Each case here was discovered empirically against Spark 4.x and
pinned, so a Spark/Jackson upgrade that shifts any of these semantics
trips the suite:

- **conservation** (the load-bearing assertion, same class as the r10
  props finding): every non-blank input line lands either as a parsed
  row or as a ``_corrupt`` row — no silent drops, for ANY hostile input;
- BOM is consumed, not corrupt; CRLF and bare-CR line endings both
  split correctly (Hadoop line reader);
- raw NUL inside a JSON string and invalid UTF-8 bytes → corrupt (the
  raw line is preserved, invalid bytes as U+FFFD replacements);
- type mismatch (string where long expected) → the field nulls, other
  fields still parse, AND the raw line is captured in ``_corrupt``
  (partial-row + evidence, which the require_col filter keeps);
- array root / trailing comma / long-overflow number → corrupt (no
  silent wraparound);
- duplicate keys → LAST occurrence wins (the same LAST_WIN rule pinned
  for parse_props_json in round 10);
- \\uXXXX escapes incl. surrogate pairs parse; a 10 MB single line
  parses (no line-length cliff); a 2,000-deep nested value in an
  IGNORED field exceeds Jackson's nesting limit → corrupt, not a crash
  (the depth analog of the DOM battery's RecursionError finding —
  here the underlying parser already bounds it).
"""

from __future__ import annotations

import pytest

from syntheticdata_pipeline__spark.sources.readers import read_jsonl_tolerant


def _scan(spark, tmp_path, name: str, data: bytes):
    p = tmp_path / f"{name}.jsonl"
    p.write_bytes(data)
    rows = read_jsonl_tolerant(spark, str(p)).collect()
    import re

    # Hadoop's line reader treats \r\n, \r, and \n all as terminators
    nonblank = sum(
        1 for ln in re.split(b"\r\n|\r|\n", data) if ln.strip(b" \t")
    )
    # conservation: nothing silently lost (parsed rows with a present
    # require-key, plus corrupt rows, cover every non-blank line)
    assert len(rows) == nonblank, f"{name}: {len(rows)} rows != {nonblank} lines"
    return rows


def test_bom_consumed(spark, tmp_path):
    rows = _scan(
        spark, tmp_path, "bom",
        b'\xef\xbb\xbf{"prompt_number": 1, "prompt": "a"}\n{"prompt_number": 2}\n',
    )
    assert sorted(r.prompt_number for r in rows) == [1, 2]
    assert all(r._corrupt is None for r in rows)


@pytest.mark.parametrize("sep", [b"\r\n", b"\r"], ids=["crlf", "cr-only"])
def test_cr_line_endings(spark, tmp_path, sep):
    data = b'{"prompt_number": 1}' + sep + b'{"prompt_number": 2}' + sep
    rows = _scan(spark, tmp_path, "cr", data)
    assert sorted(r.prompt_number for r in rows) == [1, 2]


def test_nul_byte_and_invalid_utf8_go_corrupt_with_line_preserved(spark, tmp_path):
    rows = _scan(
        spark, tmp_path, "bytes",
        b'{"prompt_number": 1, "prompt": "a\x00b"}\n'
        b'{"prompt_number": 2, "prompt": "a\xff\xfeb"}\n'
        b'{"prompt_number": 3}\n',
    )
    corrupt = [r for r in rows if r._corrupt is not None]
    assert len(corrupt) == 2
    assert any("a\x00b" in r._corrupt for r in corrupt)          # NUL preserved
    assert any("a��b" in r._corrupt for r in corrupt)  # U+FFFD per bad byte
    assert [r.prompt_number for r in rows if r._corrupt is None] == [3]


def test_type_mismatch_keeps_partial_row_and_evidence(spark, tmp_path):
    rows = _scan(
        spark, tmp_path, "mismatch",
        b'{"prompt_number": "seven", "prompt": "x"}\n{"prompt_number": 8}\n',
    )
    bad = next(r for r in rows if r.prompt_number is None)
    assert bad.prompt == "x"               # siblings still parse
    assert '"seven"' in bad._corrupt       # raw line captured
    assert next(r for r in rows if r._corrupt is None).prompt_number == 8


@pytest.mark.parametrize(
    "name,line",
    [
        ("array_root", b"[1,2,3]"),
        ("trailing_comma", b'{"prompt_number": 1,}'),
        ("long_overflow", b'{"prompt_number": 99999999999999999999999999}'),
    ],
)
def test_unparseable_shapes_go_corrupt(spark, tmp_path, name, line):
    rows = _scan(spark, tmp_path, name, line + b"\n")
    assert len(rows) == 1 and rows[0]._corrupt is not None
    assert rows[0].prompt_number is None   # no silent coercion/wraparound


def test_duplicate_keys_last_wins(spark, tmp_path):
    rows = _scan(
        spark, tmp_path, "dup", b'{"prompt_number": 1, "prompt_number": 5}\n'
    )
    assert rows[0].prompt_number == 5 and rows[0]._corrupt is None


def test_unicode_escapes_and_surrogate_pairs(spark, tmp_path):
    rows = _scan(
        spark, tmp_path, "esc",
        b'{"prompt_number": 3, "prompt": "\\u000b\\ud83d\\ude00"}\n',
    )
    assert rows[0].prompt == "\x0b\U0001f600"


def test_ten_megabyte_line_parses(spark, tmp_path):
    data = b'{"prompt_number": 7, "prompt": "' + b"x" * (10 * 1024 * 1024) + b'"}\n'
    rows = _scan(spark, tmp_path, "huge", data)
    assert rows[0].prompt_number == 7 and len(rows[0].prompt) == 10 * 1024 * 1024


def test_deep_nested_ignored_field_bounded_not_fatal(spark, tmp_path):
    deep = (
        b'{"prompt_number": 11, "extra": '
        + b'{"a":' * 2000 + b"1" + b"}" * 2000 + b"}\n"
    )
    rows = _scan(spark, tmp_path, "deep", deep)
    # Jackson's nesting bound routes the line to _corrupt instead of
    # blowing the task — pinned so an upgrade lifting the bound (or
    # converting it to an exception) is visible either way.
    assert rows[0]._corrupt is not None and rows[0].prompt_number is None


# ---------------------------------------------------------------------------
# S2 whole-file JSON (read_json_docs): the same conservation contract at
# file granularity, plus the multiLine shape behaviors.
# ---------------------------------------------------------------------------


def test_json_docs_hostile_files(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from syntheticdata_pipeline__spark.sources.readers import read_json_docs

    schema = StructType(
        [StructField("name", StringType()), StructField("n", LongType())]
    )
    (tmp_path / "good.json").write_text('{\n "name": "ok",\n "n": 1\n}')
    (tmp_path / "bom.json").write_bytes(b'\xef\xbb\xbf{"name": "bom", "n": 4}')
    # top-level array: one row PER ELEMENT (multiLine semantics)
    (tmp_path / "arr.json").write_text('[{"name": "a", "n": 2}, {"name": "b", "n": 3}]')
    # truncated file: must surface as a _corrupt row carrying the raw
    # text, NOT a silent all-NULL row (read_json_docs previously never
    # wired columnNameOfCorruptRecord, so the content was lost)
    (tmp_path / "trunc.json").write_text('{"name": "t", "n":')
    # empty / whitespace-only files: absent (no row), not corrupt
    (tmp_path / "empty.json").write_text("")
    (tmp_path / "ws.json").write_text("   \n  ")

    rows = read_json_docs(spark, str(tmp_path / "*.json"), schema).collect()
    parsed = sorted((r.name, r.n) for r in rows if r._corrupt is None)
    assert parsed == [("a", 2), ("b", 3), ("bom", 4), ("ok", 1)]
    corrupt = [r for r in rows if r._corrupt is not None]
    assert len(corrupt) == 1 and '"name": "t"' in corrupt[0]._corrupt
    assert corrupt[0]._src_file.endswith("trunc.json")
    assert len(rows) == 5  # 4 parsed + 1 corrupt; empty/ws contribute none


def test_pairs_txt_hostile_lines(spark, tmp_path):
    # S10 pinned behaviors: extra whitespace-separated tokens beyond the
    # two schema columns are dropped (the reference's split()[0:2]
    # shape); a one-token line yields cloth=NULL instead of the
    # reference's IndexError; blank lines are skipped.
    from syntheticdata_pipeline__spark.sources.readers import read_pairs_txt

    p = tmp_path / "pairs.txt"
    p.write_text(
        "person1.jpg cloth1.jpg\n"
        "person with space.jpg cloth2.jpg\n"
        "only_one_token\n"
        "\n"
        "trailing.jpg cloth.jpg   \n"
    )
    rows = sorted(
        ((r.person, r.cloth) for r in read_pairs_txt(spark, str(p)).collect()),
        key=str,
    )
    assert rows == [
        ("only_one_token", None),
        ("person", "with"),
        ("person1.jpg", "cloth1.jpg"),
        ("trailing.jpg", "cloth.jpg"),
    ]
