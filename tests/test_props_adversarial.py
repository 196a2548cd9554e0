"""Hostile-JSON props battery: the events.props payload with malformed,
truncated, duplicate-key, wrong-root, wrong-type, and overflow JSON —
the one hostile class the events NULL sweep (which only NULLs props)
cannot reach, and exactly what the reference's free-text JSON rescue
exists for (qwen_vl_processor.py:177-187: model output is UNTRUSTED
text that merely claims to be JSON).

JSON parsing is where the two engines' semantics genuinely fork:
Spark's PERMISSIVE ``from_json`` nulls what it cannot coerce, DuckDB's
``json_valid``/``json_extract``/CAST pipeline has its own validity and
coercion rules (duplicate keys, quoted numbers, 1e999 → inf, huge
integers). The sweep runs every catalog query that reads props —
membership derived from the registry so it cannot rot — against its
oracle on the hostile fixture.

Stripes on event_id % 31 (coprime with the query's own %17 garbage
stripe, so garbage-prefixed hostile payloads occur too): truncated
object, empty string, array root, duplicate keys, quoted number,
1e999, JSON null value, bare null root, whitespace object, INT64+1,
plus three round-11 flavor stripes: VT pseudo-whitespace (illegal per
the JSON spec, must invalidate on both engines), a legal \\t/\\r/\\n
mix (must parse to k=7 on both), and a pretty-printed multi-line
object (caught the oracle's RE2-'.'-cannot-cross-newline gap in the
greedy k-extraction prefix).

ROUND-10 FREEZE NOTE: divergences ship fixture-first (strict xfail +
DIVERGENCES.md queue) unless wrong-answer-on-clean-data — clean props
are uniformly valid ``{"k": <int>}``, so none of these stripes can
affect clean-data results.
"""

from __future__ import annotations

import os
import shutil

import pytest

_SRC = "/root/testdata/sf0.001"

_STRIPES = [
    '{"k":',                            # truncated object
    "",                                 # empty string (not NULL)
    "[]",                               # array root
    '{"k":1,"k":2}',                    # duplicate keys
    '{"k": "12"}',                      # quoted number
    '{"k": 1e999}',                     # double overflow literal
    '{"k": null}',                      # explicit null value
    "null",                             # bare null root
    "{ }",                              # whitespace-only object
    '{"k": 9223372036854775808}',       # INT64_MAX + 1
    # round-11 additions (hostile-text battery follow-up): VT is NOT
    # legal JSON whitespace (spec: space/\t/\n/\r only), so a VT after
    # the colon must invalidate the payload on BOTH engines — and the
    # oracle's RE2 '\s*' (which excludes VT) must not extract k either;
    # the legal-whitespace mix must parse to k=7 on both.
    '{"k":\u000b7}',            # VT pseudo-whitespace → invalid
    '{"k":\t 7\r\n}',                   # legal JSON whitespace mix → k=7
    # pretty-printed object (round-11 regex-flavor sweep): the
    # oracle's greedy k-extraction prefix was '.*', and RE2's '.'
    # excludes newline, so a multi-line object parsed k=7 in the
    # engine but NULL in the oracle; the prefix is now [\s\S]*
    '{\n  "k": 7,\n  "other": "x"\n}',
]


@pytest.fixture(scope="module")
def hostile_props_dir(tmp_path_factory):
    import duckdb

    tmp = str(tmp_path_factory.mktemp("hostile_props"))
    cases = " ".join(
        f"WHEN {i} THEN '{s.replace(chr(39), chr(39)*2)}'" for i, s in enumerate(_STRIPES)
    )
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * REPLACE (
            CASE event_id % 31 {cases} ELSE props END AS props)
            FROM read_parquet('{_SRC}/events.parquet'))
            TO '{tmp}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        src = os.path.join(_SRC, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(tmp, f"{t}.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _members():
    """Every registered query whose build source or oracle SQL touches
    props (currently the T10/T11/S1 tolerant-parse family) — quoted-name
    source matching + word-boundary oracle matching, the
    sweep_membership discipline (a bare substring would sweep in any
    oracle containing a word like 'properties'); floor pinned at the
    current membership size (r10 ADVICE)."""
    import inspect
    import re

    from syntheticdata_pipeline__spark.plans import load_all

    pat = re.compile(r"\bprops\b")
    out = []
    for name, spec in load_all().items():
        try:
            src = inspect.getsource(spec.build)
        except (OSError, TypeError):
            src = ""
        if '"props"' in src or "'props'" in src or (spec.oracle and pat.search(spec.oracle)):
            out.append(name)
    assert len(out) >= 1, f"props membership shrank below its pinned floor: {out}"
    return sorted(out)


# The r10 first run found SIX divergence classes in the tolerant-parse
# family, all hostile-data-only (clean props are uniformly valid
# {"k": <int>}); the r11 fix wave landed the shared contract — validity
# = parses as a JSON OBJECT (engine: schema-free map parse; oracle:
# json_valid + json_type='OBJECT'), k = strict int32 JSON-number with
# LAST_WIN duplicates (engine: schema-typed from_json; oracle: greedy
# last-occurrence integer-literal regex + TRY_CAST), raw_response =
# payload iff invalid. Every stripe below now matches engine-vs-oracle;
# see plans/textual.py::parse_props_json and DIVERGENCES.md
# "Queued fix: hostile JSON props" for the per-stripe rationale.


@pytest.mark.parametrize("name", _members())
def test_hostile_props_match_oracle(spark, hostile_props_dir, name):
    from tools.check_oracle import compare_one, duck_connect

    from syntheticdata_pipeline__spark.plans import load_all

    registry = load_all()
    qs = {name: registry[name].build}
    oracles = {name: registry[name].oracle} if registry[name].oracle else {}
    con = duck_connect(hostile_props_dir)
    try:
        assert compare_one(spark, con, name, qs, oracles, hostile_props_dir) is not False
    finally:
        con.close()
