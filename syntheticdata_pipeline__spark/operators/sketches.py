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
- **HyperLogLog** register-max distinct estimator: md5-derived register
  index + leading-zero rank, scaled-integer indicator sum (exact,
  order-independent), linear-counting small-range correction.
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

    NULL keys are dropped at build (r13, "no key ⇒ no participation"):
    a NULL key hashes to a NULL __h, which Spark ranks NULLS FIRST and
    DuckDB NULLS LAST — the r12 kernel battery measured the estimates
    splitting on identical input (12.11 vs 6.05), and the sf0.01 depth
    sweep proved the split reachable from ``kmv_distinct_users``. The
    twin SQL drops NULLs in lockstep.
    """
    hashed = (
        df.select(*group_cols, key.alias("__k"))
        .where(F.col("__k").isNotNull())
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
    """DuckDB twin of :func:`kmv_distinct` (same NULL-key drop)."""
    h = unit_rand_sql("__k", salt)
    return f"""
WITH dedup AS (
  SELECT DISTINCT {group_col}, {key_sql} AS __k FROM {table}
  WHERE {key_sql} IS NOT NULL),
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
    map-side, one small shuffle).

    NULL keys are dropped at build (r13): they otherwise land in NULL
    buckets that the probe's equi-join can never match, so a NULL key
    estimates 0 below its true count — the one guarantee CM makes
    (est ≥ true) broken exactly and only for NULL (r12 kernel battery).
    """
    rows = df.select(key.alias("__k")).where(F.col("__k").isNotNull())
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
    est(key) = min over d of bucket count (classic CM upper bound).
    NULL probe keys are dropped (r13) — a NULL key was never counted
    into the sketch, so it has no estimate, not an under-count of 0."""
    probes = keys.select(F.col(key_col)).where(F.col(key_col).isNotNull())
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


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group, md5-deterministic.

    Classic HLL (Flajolet et al. 2007) with m = 2**p registers: the md5
    hash's first two hex chars pick the register, the next 12 hex chars
    (48 bits) give rho = 1 + leading-zero count — computed as
    49 − length(bin(h48)) via integer/string ops only, so both engines
    agree bit-for-bit. The indicator sum Z is kept in scaled-integer form
    (each register contributes 2**(49−rho) to a BIGINT) so it is exact and
    order-independent; only the final ln() of the linear-counting branch
    sees libm, absorbed by round(·, 6) at the caller.

    Scale shape: map-side (group, register) partial maxima, one shuffle of
    at most m rows per group, constant-memory mergeable state — the same
    contract as `approx_count_distinct`, but engine-portable.
    """
    regs = hll_partials(df, group_cols, key, p=p, salt=salt)
    return hll_estimate(regs, group_cols, p=p)


def hll_partials(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """The mergeable HLL representation: (group, __reg, __rho) register
    maxima. Partials from disjoint chunks (micro-batches, partitions,
    days) merge by groupBy(...).max("__rho") — max is idempotent,
    commutative, and associative, so any chunking gives the identical
    sketch (the streaming-state contract)."""
    m = 1 << p
    h = F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")))
    reg = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % m).alias("__reg")
    h48 = F.conv(F.substring(h, 3, 12), 16, 10).cast("bigint")
    rho = F.when(h48 == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(h48)))
    # NULL keys are dropped (r13, "no key ⇒ no participation"): a NULL
    # key hashes to a NULL register on both engines — consistent, but a
    # phantom register that inflates __present and skews the estimate.
    return (
        df.where(key.isNotNull())
        .select(*group_cols, reg, rho.alias("__rho"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__rho"))
    )


def hll_merge(partials: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge register partials from any number of chunks into one sketch."""
    return partials.groupBy(*group_cols, "__reg").agg(F.max("__rho").alias("__rho"))


def hll_estimate(regs: DataFrame, group_cols: Sequence[str], p: int = 6) -> DataFrame:
    """Finalize merged register maxima into the distinct-count estimate."""
    m = 1 << p
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("__present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - __rho)")).alias("__z_present"),
    )
    zeros = F.lit(m) - F.col("__present")
    z_int = F.col("__z_present") + zeros.cast("long") * F.lit(1 << 49).cast("long")
    e_raw = F.lit(_hll_alpha(m) * m * m * float(1 << 49)) / z_int.cast("double")
    est = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, est.alias("distinct_est"))


def hll_distinct_sql(
    table: str, group_col: str, key_sql: str, p: int = 6, salt: str = "hll"
) -> str:
    """DuckDB twin of :func:`hll_distinct` (identical md5/bit arithmetic)."""
    m = 1 << p
    alpha = _hll_alpha(m)
    num = alpha * m * m * float(1 << 49)
    return f"""
WITH hashed AS (
  SELECT {group_col},
         md5('{salt}|' || CAST({key_sql} AS VARCHAR)) AS __h
  FROM {table} WHERE {key_sql} IS NOT NULL),
rr AS (
  SELECT {group_col},
         CAST('0x' || substr(__h, 1, 2) AS INTEGER) % {m} AS __reg,
         CAST('0x' || substr(__h, 3, 12) AS BIGINT) AS __h48
  FROM hashed),
regs AS (
  SELECT {group_col}, __reg,
         MAX(CASE WHEN __h48 = 0 THEN 49 ELSE 49 - length(bin(__h48)) END) AS __rho
  FROM rr GROUP BY 1, 2),
agg AS (
  SELECT {group_col}, COUNT(*) AS __present,
         SUM(1::BIGINT << (49 - __rho)) AS __z_present
  FROM regs GROUP BY 1)
SELECT {group_col},
  CASE WHEN ({num!r} / CAST(__z_present + ({m} - __present) * (1::BIGINT << 49) AS DOUBLE))
         <= {2.5 * m}
        AND ({m} - __present) > 0
       THEN {float(m)} * ln({float(m)} / CAST({m} - __present AS DOUBLE))
       ELSE ({num!r} / CAST(__z_present + ({m} - __present) * (1::BIGINT << 49) AS DOUBLE))
  END AS distinct_est
FROM agg
"""
