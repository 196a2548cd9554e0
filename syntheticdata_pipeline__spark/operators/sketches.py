"""Deterministic sketches (SURVEY.md §2.11 "novel sketch" extension).

Engine-native approximate aggregates (HLL `approx_count_distinct`,
t-digest `approx_percentile`) are implementation-specific and can't face a
cross-engine oracle. These sketches are built on md5 hashing instead —
identical in any engine — so the *approximations themselves* are
reproducible and oracle-checkable, while keeping sketch scaling behavior
(fixed memory per group, mergeable partials):

- **KMV (k-minimum-values)** distinct-count estimator: keep the k
  smallest hash values per group; estimate = (k−1)/h_k.
- **Count-Min** frequency sketch: d hash rows × w buckets of counts;
  point estimate = min over rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.determinism import unit_rand, unit_rand_sql


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """KMV estimate of |distinct key| per group.

    Hash each distinct key to [0,1); keep the k smallest per group
    (windowed rank — Spark's group-limit pushes k into the sort); the
    k-th smallest value h_k gives est = (k−1)/h_k. If a group has < k
    distinct keys the exact count is returned (standard KMV fallback).
    """
    hashed = (
        df.select(*group_cols, key.alias("__k"))
        .dropDuplicates([*group_cols, "__k"])
        .withColumn("__h", unit_rand(F.col("__k"), salt))
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = hashed.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    return ranked.groupBy(*group_cols).agg(
        F.count("*").alias("__n"),
        F.max(F.when(F.col("__r") == k, F.col("__h"))).alias("__hk"),
    ).select(
        *group_cols,
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise((F.lit(float(k - 1)) / F.col("__hk")))
        .alias("distinct_est"),
    )


def kmv_distinct_sql(
    table: str, group_col: str, key_sql: str, k: int = 64, salt: str = "kmv"
) -> str:
    """DuckDB twin of :func:`kmv_distinct`."""
    h = unit_rand_sql("__k", salt)
    return f"""
WITH dedup AS (
  SELECT DISTINCT {group_col}, {key_sql} AS __k FROM {table}),
hashed AS (SELECT {group_col}, {h} AS __h FROM dedup),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {group_col} ORDER BY __h) AS __r
  FROM hashed)
SELECT {group_col},
  CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
       ELSE {float(k - 1)} / MAX(CASE WHEN __r = {k} THEN __h END) END AS distinct_est
FROM ranked WHERE __r <= {k}
GROUP BY {group_col}
"""


def countmin_tables(
    df: DataFrame,
    key: Column,
    depth: int = 3,
    width: int = 64,
    salt: str = "cm",
) -> DataFrame:
    """Count-Min sketch tables: one row per (d, bucket) with the bucket
    count — the mergeable distributed representation (partial sums
    map-side, one small shuffle)."""
    rows = df.select(key.alias("__k"))
    per_d = [
        rows.select(
            F.lit(d).alias("d"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{salt}{d}|"), F.col("__k").cast("string"))), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % width
            ).cast("int").alias("bucket"),
        )
        for d in range(depth)
    ]
    unioned = per_d[0]
    for p in per_d[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy("d", "bucket").agg(F.count("*").alias("n"))


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 64,
    salt: str = "cm",
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from the sketch tables:
    est(key) = min over d of bucket count (classic CM upper bound)."""
    probes = keys.select(F.col(key_col))
    per_d = [
        probes.select(
            F.col(key_col),
            F.lit(d).alias("d"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{salt}{d}|"), F.col(key_col).cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % width
            ).cast("int").alias("bucket"),
        )
        for d in range(depth)
    ]
    unioned = per_d[0]
    for p in per_d[1:]:
        unioned = unioned.unionByName(p)
    joined = unioned.join(F.broadcast(sketch), ["d", "bucket"], "left").na.fill({"n": 0})
    return joined.groupBy(key_col).agg(F.min("n").alias("freq_est"))
