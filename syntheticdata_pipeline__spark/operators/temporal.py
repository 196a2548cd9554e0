"""Temporal operators Spark's DataFrame API lacks natively — as-of join,
bounded range join, multi-resolution rollup — built as scalable
compositions of built-ins (no UDFs, no driver loops).

These extend the engine beyond the reference's surface (which is
processing-time-only, SURVEY §2.9) with the event-time machinery a
training-data/telemetry pipeline needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row at or
    before its time, per key.

    Plan: tag and union both sides, sort within key by (time, tag) with
    one window pass carrying the last right value forward
    (``last(ignorenulls)``) — a single shuffle on the key, no range
    explosion, no skew beyond the key distribution. This is the
    merge-as-of algorithm expressed relationally; ``tolerance`` (same
    units as the time columns) drops matches older than the window.

    NULL join keys follow SQL join semantics (NULL matches nothing): a
    left row with a NULL key is emitted with NULL as-of values, and
    NULL-key right rows are dropped up front — without this the shared
    window partition would pair NULL-key rows with each other, which
    DuckDB's native ASOF JOIN (the oracle) never does.

    NULL event TIMES follow the same rule (hostile-ts sweep, round 11):
    a left row with a NULL time matches nothing (``t >= anything`` is
    UNKNOWN) and a right row with a NULL time is never a candidate.
    Without this, Spark's NULLS-FIRST window order would carry a
    NULL-time right value into every subsequent left row — and DuckDB's
    native ASOF exhibits the opposite quirk (its sort treats a NULL left
    time as +inf, matching the LATEST right row), so neither engine
    default is SQL-comparison-consistent; this operator pins the SQL
    reading on both.

    Determinism: among right rows sharing one (key, time), which value
    is carried is tie-broken only by input order — pre-collapse the
    right side to unique (key, time) (as plans/temporal_q.py does) for
    a deterministic result.
    """
    key_cols = list(on)
    # the mask is resolved against the post-union frame, where the left
    # time column travels as __t
    null_key = F.col("__t").isNull()
    right = right.filter(F.col(right_time).isNotNull())
    for k in key_cols:
        null_key = null_key | F.col(k).isNull()
        right = right.filter(F.col(k).isNotNull())
    # Timestamp and values travel in ONE struct built only from right rows,
    # so last(ignorenulls) can never pair a stale value with a newer right
    # timestamp (a right row whose value column is NULL still advances the
    # carried timestamp, matching merge-asof row semantics).
    rrow_type = (
        "struct<__rt: long, "
        + ", ".join(f"__rv_{v}: {right.schema[v].dataType.simpleString()}" for v in right_values)
        + ">"
    )
    l_tag = left.select(
        *key_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).cast("long").alias("__rt"),
            *[F.col(v).alias(f"__rv_{v}") for v in right_values],
        ).alias("__rrow"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"{c}: {left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__lrow"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal time (tag 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row (<=).
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        F.last("__rrow", ignorenulls=True).over(w).alias("__crow"),
    ).select(
        "*",
        *[F.col(f"__crow.__rv_{v}").alias(f"__c_{v}") for v in right_values],
        F.col("__crow.__rt").alias("__c_rt"),
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        keep = F.col("__c_rt").isNotNull() & (
            F.col("__t").cast("long") - F.col("__c_rt") <= F.lit(tolerance)
        )
        out = out.select(
            "*",
            *[
                F.when(keep, F.col(f"__c_{v}")).otherwise(F.lit(None)).alias(f"__k_{v}")
                for v in right_values
            ],
        )
        value_cols = [
            F.when(null_key, F.lit(None)).otherwise(F.col(f"__k_{v}")).alias(f"asof_{v}")
            for v in right_values
        ]
    else:
        value_cols = [
            F.when(null_key, F.lit(None)).otherwise(F.col(f"__c_{v}")).alias(f"asof_{v}")
            for v in right_values
        ]
    return out.select(F.col("__lrow.*"), *value_cols)


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    radius: int,
    bucket: int | None = None,
) -> DataFrame:
    """Bounded interval join: pairs (l, r) with |l.time − r.time| ≤ radius
    and matching keys.

    A naive theta-join degenerates to per-key cross products; here both
    sides are bucketed by ``bucket`` (default = radius) and the left side
    explodes into its 2k+1 candidate buckets, k = ceil(radius / bucket) —
    the join becomes an equi-join on (key, bucket) with a final exact
    filter. Cost is O(pairs within ±k·bucket), the canonical scalable
    range-join plan; bucket < radius trades wider fan-out for smaller
    bucket populations under skew.
    """
    b = bucket or radius
    if b <= 0:
        raise ValueError(f"bucket must be positive, got {b}")
    k = -(-radius // b)  # ceil: bucket < radius needs a wider fan-out or pairs are missed
    # internal renames so identical time-column names on both sides can't
    # collide after the join
    l_r = left.withColumnRenamed(left_time, "__lt")
    r_r = right.withColumnRenamed(right_time, "__rt")
    lb = F.floor(F.col("__lt").cast("long") / F.lit(b)).cast("long")
    l_b = l_r.withColumn("__b", F.explode(F.array(*[lb + i for i in range(-k, k + 1)])))
    r_b = r_r.withColumn(
        "__b", F.floor(F.col("__rt").cast("long") / F.lit(b)).cast("long")
    )
    joined = l_b.join(r_b, [*on, "__b"])
    return (
        joined.filter(
            F.abs(F.col("__lt").cast("long") - F.col("__rt").cast("long")) <= radius
        )
        .drop("__b")
        .withColumnRenamed("__lt", left_time if left_time != right_time else f"{left_time}_left")
        .withColumnRenamed("__rt", right_time if left_time != right_time else f"{right_time}_right")
    )


def multi_resolution_rollup(
    events: DataFrame,
    time_us: Column,
    resolutions: Sequence[tuple[str, int]],
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Hypertable-style rollup: aggregates at several time resolutions in
    ONE pass via explode over (resolution, bucket) pairs — one shuffle
    total instead of one scan+shuffle per resolution.

    ``resolutions``: (label, width_us) pairs; output carries
    ``resolution`` and ``bucket_start_us``. Buckets are FLOOR-aligned
    for every timestamp including pre-epoch (hostile-ts convention,
    round 11: ``t - t % w`` flips to ceiling for negative µs), matching
    Spark's native window().start.
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(label).alias("resolution"),
                (time_us - F.pmod(time_us, F.lit(width)))
                .cast("bigint")
                .alias("bucket_start_us"),
            )
            for label, width in resolutions
        ]
    )
    exploded = events.select("*", F.explode(pairs).alias("__rb")).select(
        F.col("__rb.resolution").alias("resolution"),
        F.col("__rb.bucket_start_us").alias("bucket_start_us"),
        *events.columns,
    )
    return exploded.groupBy("resolution", "bucket_start_us", *group_cols).agg(*aggs)
