"""applyInPandasWithState: state survives across micro-batches and final
totals equal the batch aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.streaming.stateful import running_user_totals

from .conftest import SF_SMOKE


def _prepare_chunked_source(spark, tmp_path, n_chunks=3):
    """Split events into n parquet files so maxFilesPerTrigger=1 forces
    multiple micro-batches (state must carry across them)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    src = str(tmp_path / "chunks")
    for i in range(n_chunks):
        ev.filter(F.col("event_id") % n_chunks == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return src, ev


def test_state_carries_across_microbatches(spark, tmp_path):
    src, ev = _prepare_chunked_source(spark, tmp_path)
    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # R1/D9: trigger-bounded increments
        .parquet(src)
    )
    totals = running_user_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends one row per (batch, user); the LAST
    # row per user is the final running total.
    out = spark.table("running_totals")
    import pyspark.sql.functions as F2

    # multiple micro-batches ⇒ more rows than users
    n_users = ev.select("user_id").distinct().count()
    assert out.count() > n_users

    # n_events is per-user monotonic across batches ⇒ final = max
    final = out.groupBy("user_id").agg(
        F2.max("n_events").alias("n_events"),
        F2.max_by("sum_value_micros", "n_events").alias("sum_value_micros"),
    )
    expect = ev.groupBy("user_id").agg(
        F2.count("*").alias("n_events"),
        F2.sum(F2.round(F2.col("value") * 1_000_000).cast("bigint")).alias("sv_ref"),
    )
    got = {r.user_id: r.n_events for r in final.collect()}
    want = {r.user_id: r.n_events for r in expect.collect()}
    assert got == want
