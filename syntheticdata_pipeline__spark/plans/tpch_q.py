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


# --- Q4-shape: order-priority checking (EXISTS ⇒ left-semi join) -------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
"""


@register("tpch_q4_order_priority", oracle=_Q4_ORACLE, tags=("tpch", "J3", "A1"))
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with ≥1 item shipped >90 days after order —
    EXISTS as a left-semi join (adapted: no commit/receipt dates in the
    fixture, lateness vs orderdate instead)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- Q6-shape: forecasting revenue change (pure range-filter agg) ------------

_Q6_ORACLE = f"""
SELECT {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))', scale=4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("tpch", "F1"))
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate pushes to the scan; one global decimal
    sum — the minimal scan-dominated query."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
        .cast("double")
        .alias("revenue")
    )


# --- Q18-shape: large-volume customers (HAVING + join back) ------------------

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 150)
SELECT c.c_name, o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("tpch_q18_large_orders", oracle=_Q18_ORACLE, tags=("tpch", "A1", "J2"))
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-filter (HAVING) then join the surviving
    keys back to the dims."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey", F.col("__q").cast("double").alias("total_qty"))
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    j = big.join(o, big.l_orderkey == o.o_orderkey).join(c, o.o_custkey == c.c_custkey)
    return j.select(
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_totalprice",
        "total_qty",
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
