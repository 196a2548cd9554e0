"""Event-time watermark semantics with actual late data.

Spark drops a late row only once its window's state has been EVICTED
(emission + eviction happen at the end of the batch in which the
watermark passes the window end — not on arrival). So the drop needs
three micro-batches: (1) advance the watermark, (2) finalize + evict the
old windows, (3) deliver the late row → dropped.
"""

from __future__ import annotations

import datetime as dt
import time

import pyspark.sql.functions as F


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def _write_chunk(spark, path, rows):
    spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long").coalesce(
        1
    ).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mod-times → deterministic batch order


def test_late_event_after_eviction_dropped(spark, tmp_path):
    src = str(tmp_path / "late_src")
    # batch 1: events through 10:30 → watermark will advance to 10:20
    _write_chunk(spark, src, [(1, _ts(0), 1), (2, _ts(5), 1), (3, _ts(30), 1)])
    # batch 2: benign event; at this batch's end the ≤10:20 windows are
    # finalized (emitted) and their state evicted
    _write_chunk(spark, src, [(4, _ts(28), 1)])
    # batch 3: event 5 @10:02 arrives after its window was evicted → DROPPED
    _write_chunk(spark, src, [(5, _ts(2), 1), (6, _ts(29), 1)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list("event_id")).alias("ids"))
        .select(F.unix_micros(F.col("window.start")).alias("ws"), "n", "ids")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("late_test").collect()
    emitted_ids = sorted(i for r in rows for i in r.ids)
    assert 5 not in emitted_ids, f"late event leaked: {rows}"
    assert 1 in emitted_ids and 2 in emitted_ids
    # the early windows were emitted exactly once, without the late row
    w0 = [r for r in rows if r.ws == 1704103200000000]
    assert len(w0) == 1 and list(w0[0].ids) == [1]
