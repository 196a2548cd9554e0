"""Structured Streaming semantics (SURVEY.md §2.9): streaming results must
equal their batch twins on a bounded source (availableNow ⇒ single batch,
no late data)."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_append_to_memory,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

from .conftest import SF_SMOKE


def test_stream_tumbling_equals_batch(spark):
    ev = read_events_stream(spark, SF_SMOKE)
    streamed = run_to_memory(tumbling_counts(ev))
    from syntheticdata_pipeline__spark.plans.common import T

    batch = (
        T(spark, SF_SMOKE, "events")
        .groupBy(
            (F.col("ts_us") - F.col("ts_us") % F.lit(300_000_000)).alias("window_start_us"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,12)")).cast("double").alias("sum_value"),
        )
    )
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_stream_sliding_panes(spark):
    ev = read_events_stream(spark, SF_SMOKE)
    out = run_to_memory(sliding_counts(ev))
    total_events = out.agg(F.sum("n_events")).collect()[0][0]
    n_raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert total_events == 2 * n_raw  # width/slide = 2 panes per event


def test_stream_session_equals_batch_sessionization(spark):
    ev = read_events_stream(spark, SF_SMOKE)
    streamed = run_to_memory(session_counts(ev, gap="30 minutes"))
    from syntheticdata_pipeline__spark.plans import load_all

    batch = load_all()["session_windows_batch"].build(spark, SF_SMOKE)
    s = sorted((r.user_id, r.session_start_us, r.n_events) for r in streamed.collect())
    b = sorted((r.user_id, r.session_start_us, r.n_events) for r in batch.collect())
    assert s == b


def test_stream_dedup_within_watermark(spark):
    ev = read_events_stream(spark, SF_SMOKE)
    deduped = run_append_to_memory(dedup_within_watermark(ev, ["user_id", "event_type"]))
    n_pairs = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert deduped.count() == n_pairs
