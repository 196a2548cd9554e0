"""TPC-H-style analytics over the driver's star schema (adapted to the
columns present — TESTDATA.md). The reference is an ETL pipeline, not a
SQL engine, but its rebuilt engine IS one: these classics demonstrate the
full relational surface (multi-way joins, date-range scans, grouped
revenue math) with the same decimal-exact determinism as every other
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import davg, davg_sql, dsum, dsum_sql
from . import register
from .common import T

_DEC = "decimal(18,2)"


def _rev(df: DataFrame) -> F.Column:
    return (
        F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    )


# --- Q1: pricing summary report --------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))', scale=4)} AS sum_disc_price,
  {dsum_sql('CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4)) * CAST(1 + l_tax AS DECIMAL(18,2))', scale=6)} AS sum_charge,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount', scale=2)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", oracle=_Q1_ORACLE, bench=True, tags=("tpch", "A1", "A7"))
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one scan, pushed-down date predicate, partial-agg
    shuffle of 6 exact decimal accumulators."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz")
    )
    disc_price = _rev(li)
    charge = disc_price.cast("decimal(28,4)") * (F.lit(1) + F.col("l_tax")).cast(_DEC)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        davg(F.col("l_discount"), scale=2).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- Q3-shape: top unshipped-revenue orders ---------------------------------

_Q3_ORACLE = f"""
SELECT o.o_orderkey,
  {dsum_sql('CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))', scale=4)} AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@register("tpch_q3_shipping_priority", oracle=_Q3_ORACLE, tags=("tpch", "J2", "D8"))
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join, revenue per order,
    deterministic top-10 (exact decimal revenue ⇒ stable ordering)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    j = c.join(o, c.c_custkey == o.o_custkey).join(li, F.col("l_orderkey") == o.o_orderkey)
    agg = j.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum(_rev(j)).cast("double").alias("revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# --- Q5-shape: local-supplier revenue by nation ------------------------------

_Q5_ORACLE = f"""
SELECT n.n_name AS nation,
  {dsum_sql('CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))', scale=4)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("tpch_q5_local_supplier_revenue", oracle=_Q5_ORACLE, bench=True, tags=("tpch", "J2", "J4"))
def tpch_q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join where supplier nation must equal
    customer nation — broadcast dims, one fact shuffle."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(_rev(j)).cast("double").alias("revenue")
    )


# --- Q10-shape: returned-item reporting --------------------------------------

_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
  {dsum_sql('CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))', scale=4)} AS revenue,
  ANY_VALUE(n.n_name) AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", oracle=_Q10_ORACLE, tags=("tpch", "J2", "A3"))
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most value — the
    'problem customers' report."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name").agg(
        F.sum(_rev(j)).cast("double").alias("revenue"),
        F.first("n_name").alias("nation"),
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20).select(
        "c_custkey", "c_name", "revenue", "nation"
    )
