"""Temporal operators: as-of with tolerance, range-join banding edges,
multi-resolution rollup consistency."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.operators.temporal import (
    asof_join,
    multi_resolution_rollup,
    range_join_buckets,
)


def _quotes_trades(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 5, 3), ("A", 7, 4)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 9, 50.0)],
        "sym string, t long, px double",
    )
    return trades, quotes


def test_asof_join_basic_semantics(spark):
    trades, quotes = _quotes_trades(spark)
    out = asof_join(trades, quotes, ["sym"], "t", "t", ["px"])
    got = {r.trade_id: r.asof_px for r in out.collect()}
    # t=10 sees the simultaneous quote (<=); t=25 sees t=20; t=7 sees none;
    # B@5 precedes B's only quote at 9.
    assert got == {1: 101.0, 2: 102.0, 3: None, 4: None}


def test_asof_join_tolerance(spark):
    trades, quotes = _quotes_trades(spark)
    out = asof_join(trades, quotes, ["sym"], "t", "t", ["px"], tolerance=3)
    got = {r.trade_id: r.asof_px for r in out.collect()}
    # t=25 vs quote t=20 → Δ5 > 3 ⇒ dropped; t=10 vs t=10 → Δ0 kept.
    assert got == {1: 101.0, 2: None, 3: None, 4: None}


def test_range_join_bucket_edges(spark):
    """Pairs straddling bucket boundaries must not be lost (the 3-bucket
    explode covers ±radius across edges)."""
    left = spark.createDataFrame([("u", 100, 1), ("u", 199, 2)], "k string, t long, lid long")
    right = spark.createDataFrame(
        [("u", 95, 10), ("u", 205, 11), ("u", 350, 12)], "k string, t long, rid long"
    )
    out = range_join_buckets(left, right, ["k"], "t", "t", radius=10)
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    assert pairs == [(1, 10), (2, 11)]  # |100-95|=5; |199-205|=6; 350 out of range


def test_multi_resolution_rollup_consistency(spark):
    """Coarser buckets must contain exactly the finer buckets' totals."""
    df = spark.createDataFrame(
        [(i, i * 1_000_000, "t", 1.0) for i in range(600)],
        "event_id long, ts_us long, event_type string, value double",
    )
    out = multi_resolution_rollup(
        df,
        F.col("ts_us"),
        [("1m", 60_000_000), ("5m", 300_000_000)],
        group_cols=["event_type"],
        aggs=[F.count("*").alias("n")],
    )
    rows = out.collect()
    n_1m = sum(r.n for r in rows if r.resolution == "1m")
    n_5m = sum(r.n for r in rows if r.resolution == "5m")
    assert n_1m == n_5m == 600
    assert len([r for r in rows if r.resolution == "1m"]) == 10
    assert len([r for r in rows if r.resolution == "5m"]) == 2


def test_asof_join_null_right_value_advances_timestamp(spark):
    """A newer right row whose value column is NULL must win as-of (row
    semantics): the carried value is that row's NULL, not an older non-null
    value, and the tolerance clock advances with it."""
    trades = spark.createDataFrame([("A", 30, 1)], "sym string, t long, trade_id long")
    quotes = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 28, None)], "sym string, t long, px double"
    )
    out = asof_join(trades, quotes, ["sym"], "t", "t", ["px"])
    assert out.collect()[0].asof_px is None
    # With tolerance 5 the match is the t=28 row (Δ2 ≤ 5) — still NULL px,
    # NOT the stale 100.0 from t=10 (Δ20 would fail the tolerance anyway).
    tol = asof_join(trades, quotes, ["sym"], "t", "t", ["px"], tolerance=5)
    assert tol.collect()[0].asof_px is None


def test_range_join_bucket_smaller_than_radius(spark):
    """bucket < radius widens the explode fan-out (ceil(radius/bucket))
    instead of silently missing pairs more than one bucket apart."""
    left = spark.createDataFrame([("u", 100, 1)], "k string, t long, lid long")
    right = spark.createDataFrame(
        [("u", 75, 10), ("u", 124, 11), ("u", 131, 12)], "k string, t long, rid long"
    )
    out = range_join_buckets(left, right, ["k"], "t", "t", radius=25, bucket=10)
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    assert pairs == [(1, 10), (1, 11)]  # Δ25 and Δ24 in; Δ31 out
