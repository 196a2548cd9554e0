"""Round-12 hostile model-output battery for the U1-U5 inference layer
(operators/inference.py) — the T10 JSON-rescue contract under the
free-form text a real VLM emits (qwen_vl_processor.py:177-187 is the
reference idiom: find the {...} block, parse, fall back to raw).

First run: ZERO engine changes needed — every case lands in one of the
three pinned outcomes below. Pinned so the contract can't drift:

1. FULL FALLBACK (parsed NULL, raw carries the whole response):
   unparseable block or no block at all — the conservation property;
2. PARTIAL PARSE (parsed non-NULL, raw NULL, bad FIELDS null):
   type mismatch / overflow / JSON null inside a well-formed object —
   field-level nulls do NOT trigger fallback (callers needing evidence
   of a half-parsed response must check field nullity, not raw);
3. FIRST WINS: multiple {...} blocks (greedy extract + Jackson's
   lenient trailing-text parse) and array-root responses both yield the
   FIRST object; duplicate keys yield the LAST value (the session-wide
   LAST_WIN policy, same as the props parser).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from syntheticdata_pipeline__spark.operators.inference import (
    accept_reject_filter,
    infer_text,
    parse_model_json,
)

def _parse(spark, resp: str):
    # fromDDL needs an active session -> build inside the fixture-scoped call
    schema = StructType.fromDDL("score int, label string")
    df = spark.createDataFrame([(resp,)], "resp string")
    return df.select(*parse_model_json(F.col("resp"), schema)).collect()[0]


@pytest.mark.parametrize(
    "resp",
    [
        '{"score": 5, "label": "ok"',  # unclosed brace -> regex finds no block
        "score is five",  # no block at all
    ],
)
def test_no_block_falls_back_whole(spark, resp):
    r = _parse(spark, resp)
    assert r.parsed is None
    assert r.raw_response == resp  # conservation: nothing silently lost


@pytest.mark.parametrize(
    "resp", ["{not json at all}", '{"score": bad}', "{,}", '{"a"}']
)
def test_garbage_in_braces_keeps_raw_after_conservation_fix(spark, resp):
    """FLIPPED r13 (queued fix #6): a malformed-but-extracted block used
    to parse to an ALL-NULL struct (not NULL), so the raw fallback never
    fired and the response text was LOST. The fix threads from_json's
    columnNameOfCorruptRecord through, so fallback keys on parse-failure
    EVIDENCE: corrupt block → parsed NULL, raw = the full response —
    exactly the no-block contract (reference: qwen_vl_processor.py:
    184-187 catches JSONDecodeError and keeps the raw text)."""
    r = _parse(spark, resp)
    assert r.parsed is None
    assert r.raw_response == resp  # conservation: nothing silently lost


@pytest.mark.parametrize(
    "resp, score, label",
    [
        ('{"score": "high", "label": "ok"}', None, "ok"),  # type mismatch
        ('{"score": 99999999999999999999, "label": "ok"}', None, "ok"),  # overflow
        ('{"score": null, "label": null}', None, None),  # explicit nulls
        ("{}", None, None),  # empty object
    ],
)
def test_bad_fields_null_without_fallback(spark, resp, score, label):
    """PARTIAL PARSE pin: a well-formed object with unusable fields
    parses to a struct with NULL fields — raw stays NULL. Checking
    raw_response alone does NOT detect half-parsed responses."""
    r = _parse(spark, resp)
    assert r.parsed is not None and r.raw_response is None
    assert (r.parsed.score, r.parsed.label) == (score, label)


def test_first_block_wins_on_chatty_output(spark):
    r = _parse(spark, 'a {"score":1,"label":"x"} b {"score":2,"label":"y"} c')
    assert (r.parsed.score, r.parsed.label) == (1, "x")
    assert r.raw_response is None


def test_array_root_takes_first_element(spark):
    r = _parse(spark, '[{"score":1,"label":"x"},{"score":2,"label":"y"}]')
    assert (r.parsed.score, r.parsed.label) == (1, "x")


def test_duplicate_keys_last_win(spark):
    r = _parse(spark, '{"score":1,"score":2,"label":"ok"}')
    assert r.parsed.score == 2  # session LAST_WIN policy, same as props


def test_brace_inside_string_value_survives(spark):
    r = _parse(spark, 'x {"score":3,"label":"a{b}c"} y')
    assert (r.parsed.score, r.parsed.label) == (3, "a{b}c")


def test_unicode_label_round_trips(spark):
    r = _parse(spark, '{"score":1,"label":"🎉 café"}')
    assert r.parsed.label == "🎉 café"


def test_infer_text_null_input_reaches_model_as_none(spark):
    """Kernel contract pin: NULL input rows are handed to the model
    callable as None/NaN — filtering them is the CALLER's job (same
    contract as the throttled harness)."""
    seen = []

    def factory():
        def model(x):
            seen.append(x)
            return "r" if x is not None else "null-in"

        return model

    df = spark.createDataFrame([("a",), (None,)], "t string").coalesce(1)
    out = {r.t: r.response for r in infer_text(df, "t", factory, "adv-null").collect()}
    assert out == {"a": "r", None: "null-in"}


def test_accept_reject_raising_model_kills_task_pinned(spark):
    """A model callable that RAISES aborts the job (local mode has no
    task retries): the inference kernels are the fast path; fallible
    external calls belong in the throttled harness, whose call_with_retry
    converts failures to (ok=False, err) rows instead."""

    def factory():
        def model(x):
            raise ValueError("GPU OOM")

        return model

    df = spark.createDataFrame([("a",)], "t string")
    with pytest.raises(Exception, match="GPU OOM|PythonException"):
        accept_reject_filter(df, "t", factory, "adv-raise").collect()
