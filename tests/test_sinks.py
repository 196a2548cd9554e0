"""Sink family (K1-K6) + foreachBatch checkpointed streaming sink (K5)."""

from __future__ import annotations

import glob
import json
import os

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.sources.readers import (
    write_keyed_json,
    write_summary_json,
    write_text_rendered,
)

from .conftest import SF_SMOKE


def test_keyed_json_roundtrip(spark, tmp_path):
    """K1: one row per product, partitioned JSON, readable back."""
    df = spark.createDataFrame(
        [(1, "amazon", "a"), (2, "zalando", "b")], "item_id long, source string, title string"
    )
    path = str(tmp_path / "meta")
    write_keyed_json(df, path, partition_cols=["source"])
    back = spark.read.json(path)
    assert back.count() == 2
    assert sorted(r.title for r in back.collect()) == ["a", "b"]


def test_text_rendered_sink(spark, tmp_path):
    """K2: formatted text file per record."""
    df = spark.createDataFrame([("p1",), ("p2",)], "s string").select(
        F.concat(F.lit("PROMPT: "), F.col("s")).alias("txt")
    )
    path = str(tmp_path / "txt")
    write_text_rendered(df, "txt", path)
    lines = []
    for f in glob.glob(os.path.join(path, "part-*")):
        lines += open(f).read().splitlines()
    assert sorted(lines) == ["PROMPT: p1", "PROMPT: p2"]


def test_summary_json_single_file(spark, tmp_path):
    """K6: aggregate → one JSON file."""
    df = spark.createDataFrame([(5, 2)], "ok long, failed long")
    path = str(tmp_path / "summary")
    write_summary_json(df, path)
    parts = glob.glob(os.path.join(path, "part-*"))
    assert len(parts) == 1
    rec = json.loads(open(parts[0]).read().strip())
    assert rec == {"ok": 5, "failed": 2}


def test_foreachbatch_checkpointed_sink(spark, tmp_path):
    """K5/R2: streaming foreachBatch with a checkpointLocation — restart
    with the same checkpoint must not reprocess the batch (exactly-once
    per source offset, replacing the reference's manual progress JSON)."""
    from syntheticdata_pipeline__spark.streaming.windows import read_events_stream

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    seen_batches = []

    def sink(batch_df, batch_id):
        seen_batches.append(batch_id)
        batch_df.groupBy("event_type").count().write.mode("overwrite").parquet(
            f"{out_dir}/b{batch_id}"
        )

    def run_once():
        q = (
            read_events_stream(spark, SF_SMOKE)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert seen_batches == [0]
    n_first = spark.read.parquet(f"{out_dir}/b0").agg(F.sum("count")).collect()[0][0]
    assert n_first == spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()

    run_once()  # same checkpoint, no new files → no new batch
    assert seen_batches == [0]
