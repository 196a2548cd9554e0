"""Regression pin for the r12 sf0.1 sweep's one find: decimal-halfway
values on a histogram grid must be keyed with the engine-identical IEEE
floor grid, never engine-native round().

Three sf0.1 docs carry quality exactly 0.72125 — a true decimal halfway
at the 4-dp grid. Spark's round() goes through BigDecimal's shortest
decimal representation and rounds HALF_UP (.7213); DuckDB rounds the
binary double half-even (.7212). One cell of drift shifted the
cumulative rank of EVERY doc at that quality level, failing
rank_normalized_quality's hash at sf0.1 (and only there — smaller SFs
have no tie). The fix keys the histogram with
``floor(q * 1e4 + 0.5)`` — pure double arithmetic, bit-identical on
both engines; the key is internal and never reaches the output.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

# the live tie from sf0.1 plus synthetic neighbors on both sides
TIE_VALUES = [0.72125, 0.72124999, 0.72125001, 0.5, 0.0, 1.0, 0.99995]


def _spark_grid(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "q double")
    rows = df.select(
        "q",
        F.floor(F.col("q") * F.lit(10000.0) + F.lit(0.5)).cast("bigint").alias("g"),
    ).collect()
    return {r.q: r.g for r in rows}


def _duck_grid(vals):
    con = duckdb.connect()
    out = {}
    for v in vals:
        out[v] = con.execute(
            f"SELECT CAST(floor(CAST({v!r} AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
        ).fetchall()[0][0]
    return out


def test_floor_grid_identical_across_engines(spark):
    s = _spark_grid(spark, TIE_VALUES)
    d = _duck_grid(TIE_VALUES)
    assert s == d


def test_live_tie_lands_deterministically(spark):
    """0.72125 (the sf0.1 tie) must land on ONE grid cell, the same on
    both engines — whichever side of the halfway its nearest double
    sits. (round() disagreed: Spark .7213, DuckDB .7212.)"""
    s = _spark_grid(spark, [0.72125])[0.72125]
    d = _duck_grid([0.72125])[0.72125]
    assert s == d
    assert s in (7212, 7213)  # a definite single cell, not engine-dependent


def test_spark_round_duckdb_round_do_disagree_on_the_tie(spark):
    """The counterfactual that motivated the fix, kept as documentation:
    engine-native round() DOES split on the live tie value."""
    spark_rounded = (
        spark.createDataFrame([(0.72125,)], "q double")
        .select(F.round("q", 4).alias("r"))
        .collect()[0]
        .r
    )
    duck_rounded = duckdb.connect().execute(
        "SELECT round(CAST(0.72125 AS DOUBLE), 4)"
    ).fetchall()[0][0]
    assert spark_rounded == pytest.approx(0.7213)
    assert duck_rounded == pytest.approx(0.7212)


def test_round_key_audit_allowlist_is_exhaustive():
    """r14 (ADVICE r13 #3): the static backstop now audits EVERY F.round
    alias feeding a groupBy/join/partitionBy key (any alias, whole
    package) plus round-aliases in evaluated-oracle GROUP BY/PARTITION
    BY/ON clauses, against an allowlist that must match the found set
    exactly — an unlisted site (new round-keyed grid) or a stale entry
    (audited site gone) both fail."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.grid_tie_sweep import audit_no_round_keys

    assert audit_no_round_keys() == []
