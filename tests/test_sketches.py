"""HLL sketch properties beyond the oracle twin: mergeability and the
error bound the register design promises."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from syntheticdata_pipeline__spark.operators.sketches import hll_distinct


@pytest.fixture(scope="module")
def people(spark):
    # 3000 distinct keys, each duplicated 3x, across two groups
    return (
        spark.range(9000)
        .select(
            (F.col("id") % 2).cast("int").alias("grp"),
            (F.col("id") % 3000).alias("k"),
        )
    )


def test_hll_accuracy_within_bound(people):
    """m=64 registers ⇒ relative error ~1.04/sqrt(64) = 13%; assert 3σ."""
    rows = hll_distinct(people, ["grp"], F.col("k"), p=6).collect()
    assert len(rows) == 2
    for r in rows:
        exact = 1500  # ids 0..2999 split even/odd by grp
        assert abs(r.distinct_est - exact) / exact < 0.39


def test_hll_duplicates_do_not_move_estimate(spark):
    """Register maxima are idempotent: every key seen once vs 100x gives
    the identical estimate (the property countDistinct pays a shuffle
    for, HLL gets from max())."""
    once = spark.range(500).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    many = spark.range(50000).select(
        F.lit(0).alias("g"), (F.col("id") % 500).alias("k")
    )
    e1 = hll_distinct(once, ["g"], F.col("k")).collect()[0].distinct_est
    e2 = hll_distinct(many, ["g"], F.col("k")).collect()[0].distinct_est
    assert e1 == e2


def test_hll_merge_equals_whole(spark):
    """Sketching two disjoint halves into one group equals sketching the
    union: register-max state is mergeable (the streaming contract)."""
    whole = spark.range(2000).select(F.lit(0).alias("g"), F.col("id").alias("k"))
    halves = spark.range(2000).select(
        F.lit(0).alias("g"), F.col("id").alias("k")
    ).repartition(7)  # arbitrary partitioning: partial maxima must combine
    ew = hll_distinct(whole, ["g"], F.col("k")).collect()[0].distinct_est
    eh = hll_distinct(halves, ["g"], F.col("k")).collect()[0].distinct_est
    assert ew == eh


def test_hll_streaming_foreachbatch_equals_batch(spark, tmp_path):
    """The foreachBatch ingestion form: each micro-batch appends its
    register partials to a parquet state table; merging the accumulated
    state reproduces the one-shot batch sketch exactly — bounded state
    (m registers/group) over an unbounded stream."""
    from pyspark.sql import functions as F

    from syntheticdata_pipeline__spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_partials,
    )

    data = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 1700).alias("k")
    )
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    data.repartition(4).write.parquet(src)

    stream = spark.readStream.schema("g string, k long").parquet(src)

    def sink(batch_df, batch_id):
        hll_partials(batch_df, ["g"], F.col("k")).write.mode("append").parquet(state)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = hll_merge(spark.read.parquet(state), ["g"])
    streamed = {
        r.g: r.distinct_est for r in hll_estimate(merged, ["g"]).collect()
    }
    oneshot = {
        r.g: r.distinct_est for r in hll_distinct(data, ["g"], F.col("k")).collect()
    }
    assert streamed == oneshot
