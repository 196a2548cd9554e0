"""Stream-static enrichment and watermarked stream-stream joins."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.streaming.windows import (
    enrich_with_dim,
    read_events_stream,
    run_append_to_memory,
    stream_stream_join,
)

from .conftest import SF_SMOKE


def test_stream_static_enrichment(spark):
    """J4 in streaming form: per-type config broadcast into the stream."""
    ev = read_events_stream(spark, SF_SMOKE)
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("view", 0.5), ("signup", 3.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    enriched = enrich_with_dim(ev, dim, ["event_type"]).select(
        "event_id", "event_type", "weight"
    )
    out = run_append_to_memory(enriched)
    n_raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert out.count() == n_raw
    assert out.filter(F.col("weight").isNull()).count() == 0
    w = {r.event_type: r.weight for r in out.select("event_type", "weight").distinct().collect()}
    assert w["purchase"] == 5.0


def test_stream_stream_join_bounded(spark):
    """Purchases joined to the same user's errors within ±5 minutes —
    state-bounded by watermarks; result equals the batch interval join."""
    purchases = read_events_stream(spark, SF_SMOKE).filter(
        F.col("event_type") == "purchase"
    ).select(F.col("user_id").alias("u"), F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    errors = read_events_stream(spark, SF_SMOKE).filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"), F.col("ts").alias("ets"), F.col("event_id").alias("eid")
    )
    l_w = purchases.withWatermark("pts", "10 minutes")
    r_w = errors.withWatermark("ets", "10 minutes")
    joined = l_w.join(
        r_w,
        (l_w["u"] == r_w["u"])
        & (r_w["ets"] >= l_w["pts"] - F.expr("INTERVAL 5 minutes"))
        & (r_w["ets"] <= l_w["pts"] + F.expr("INTERVAL 5 minutes")),
    ).select("pid", "eid")
    streamed = run_append_to_memory(joined)

    # batch twin
    from syntheticdata_pipeline__spark.plans.common import T

    ev = T(spark, SF_SMOKE, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts_us").alias("pus"), F.col("event_id").alias("pid")
    )
    er = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"), F.col("ts_us").alias("eus"), F.col("event_id").alias("eid")
    )
    batch = p.join(er, "u").filter(
        F.abs(F.col("pus") - F.col("eus")) <= 5 * 60 * 1_000_000
    ).select("pid", "eid")
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))
