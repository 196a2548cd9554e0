"""Model-UDF surface (U1-U5): per-executor singleton, Arrow batching,
schema-enforced JSON parsing with corrupt fallback. Deterministic fakes —
no real models in the container."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql.types import StructType

from syntheticdata_pipeline__spark.operators.inference import (
    accept_reject_filter,
    infer_text,
    parse_model_json,
)


def _fake_vlm_factory():
    """Deterministic stand-in for the VLM: echoes a JSON analysis with
    chatter around it (the free-text + embedded JSON shape the reference
    parser rescues, qwen_vl_processor.py:177-187)."""

    def model(prompt: str) -> str:
        payload = {"garment_type": prompt.split()[0], "confidence_score": 0.9}
        if prompt.startswith("corrupt"):
            return "no json here at all"
        return f"Sure! Here is the analysis: {json.dumps(payload)} Hope that helps."

    return model


def test_infer_text_singleton_and_output(spark):
    df = spark.createDataFrame(
        [("dress red",), ("kimono blue",), ("corrupt input",)], "prompt string"
    )
    out = infer_text(df, "prompt", _fake_vlm_factory, model_key="fake-vlm")
    rows = {r.prompt: r.response for r in out.collect()}
    assert "dress" in rows["dress red"]
    assert rows["corrupt input"] == "no json here at all"


def test_parse_model_json_rescue_and_fallback(spark):
    df = spark.createDataFrame(
        [("dress red",), ("kimono blue",), ("corrupt input",)], "prompt string"
    )
    out = infer_text(df, "prompt", _fake_vlm_factory, model_key="fake-vlm")
    schema = StructType.fromDDL("garment_type string, confidence_score double")
    parsed = out.select(
        "prompt", *parse_model_json(F.col("response"), schema)
    )
    rows = {r.prompt: r for r in parsed.collect()}
    assert rows["dress red"].parsed.garment_type == "dress"
    assert rows["dress red"].raw_response is None
    assert rows["corrupt input"].parsed is None
    assert rows["corrupt input"].raw_response == "no json here at all"


def test_accept_reject_filter(spark):
    df = spark.createDataFrame([(f"img{i}",) for i in range(10)], "image string")
    out = accept_reject_filter(
        df,
        "image",
        model_factory=lambda: (lambda x: int(x[3:]) % 2 == 0),
        model_key="fake-rubric",
    )
    kept = sorted(r.image for r in out.collect())
    assert kept == [f"img{i}" for i in range(0, 10, 2)]


def test_accept_reject_filter_keep_rejected(spark):
    """keep_accepted=False returns ONLY rejected rows (was: unfiltered)."""
    df = spark.createDataFrame([(f"img{i}",) for i in range(10)], "image string")
    out = accept_reject_filter(
        df,
        "image",
        model_factory=lambda: (lambda x: int(x[3:]) % 2 == 0),
        model_key="fake-rubric-neg",
        keep_accepted=False,
    )
    kept = sorted(r.image for r in out.collect())
    assert kept == [f"img{i}" for i in range(1, 10, 2)]
