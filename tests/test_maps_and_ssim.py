"""Map-typed merge semantics (J5 map form) + SSIM kernel (M9) + base64
transport (T13)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from syntheticdata_pipeline__spark.operators.multimodal import ssim_pairs
from syntheticdata_pipeline__spark.session import ensure_runtime_confs


def test_map_concat_last_win(spark):
    """J5: {**medium, **hard} — right side wins per key (hard_sampler.py:66-70)
    via map_concat under LAST_WIN policy."""
    ensure_runtime_confs(spark)
    df = spark.createDataFrame(
        [({"a": 1.0, "b": 2.0}, {"b": 20.0, "c": 30.0})],
        "medium map<string,double>, hard map<string,double>",
    )
    merged = df.select(F.map_concat("medium", "hard").alias("m")).collect()[0].m
    assert merged == {"a": 1.0, "b": 20.0, "c": 30.0}


def test_map_entries_roundtrip(spark):
    """M14: dict→rows→dict via map_entries / map_from_arrays."""
    df = spark.createDataFrame([({"x": 0.5, "y": 0.5},)], "w map<string,double>")
    rows = df.select(F.explode(F.map_entries("w")).alias("e")).select("e.key", "e.value")
    assert sorted(map(tuple, rows.collect())) == [("x", 0.5), ("y", 0.5)]
    back = (
        rows.agg(
            F.map_from_arrays(F.collect_list("key"), F.collect_list("value")).alias("w")
        )
        .collect()[0]
        .w
    )
    assert back == {"x": 0.5, "y": 0.5}


def test_ssim_identity_and_degradation(spark):
    """M9: SSIM(x, x) = 1; SSIM drops for a perturbed copy."""
    np = pytest.importorskip("numpy")
    rng = np.random.default_rng(42)
    base = rng.uniform(-1, 1, 64).tolist()
    noisy = [v * 0.5 + 0.3 for v in base]
    df = spark.createDataFrame(
        [(1, base, base), (2, base, noisy)], "pid long, a array<double>, b array<double>"
    )
    out = {r.pid: r.ssim for r in ssim_pairs(df, "a", "b").collect()}
    assert out[1] == pytest.approx(1.0, abs=1e-9)
    assert out[2] < 0.9


def test_base64_transport(spark):
    """T13: binary → base64 string for model transport
    (qwen_vl_processor.py:29-32), lossless roundtrip."""
    payload = b"\x00\xffimage-bytes\x10"
    df = spark.createDataFrame([(bytearray(payload),)], "content binary")
    enc = df.select(F.base64("content").alias("b64"), F.unbase64(F.base64("content")).alias("rt"))
    row = enc.collect()[0]
    import base64 as b64mod

    assert row.b64 == b64mod.b64encode(payload).decode()
    assert bytes(row.rt) == payload
