"""Training-dataset preparation operators (SURVEY.md §2.11 north star):
deterministic splits, fixed-size per-group samples, sequence packing,
and source-mixture weighting — the ops a 100 TB pretraining corpus runs
after dedup/quality filtering.

All randomness is md5-keyed (functions.determinism.unit_rand): splits and
samples are reproducible on any cluster and any partitioning, and the
DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.determinism import unit_rand


def split_bounds(
    fractions: Sequence[tuple[str, float]],
) -> list[tuple[str, float]]:
    """Cumulative upper bounds for the split CASE ladder. Exposed so the
    oracle SQL interpolates the *same* float literals the Spark plan uses
    (the accumulation order matters at the last ulp)."""
    bounds = []
    acc = 0.0
    total = sum(f for _, f in fractions)
    for name, f in fractions:
        acc += f / total
        bounds.append((name, acc))
    return bounds


def deterministic_split(
    df: DataFrame,
    key: Column,
    fractions: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a split by its key's seeded uniform draw —
    stable under reshuffling, re-runs, and cluster moves (unlike
    ``randomSplit``, which is partition-dependent)."""
    bounds = split_bounds(fractions)
    r = unit_rand(key, salt)
    expr = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(r < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def sample_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column,
    k: int,
    salt: str = "sample",
) -> DataFrame:
    """Fixed-size deterministic sample per group: rank rows by a seeded
    draw (tie-broken by the key) and keep k. The distributed form of
    reservoir sampling — one shuffle on the group key, top-k pushed into
    the sort."""
    w = Window.partitionBy(*group_cols).orderBy(unit_rand(key, salt), key)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: Column,
    size_col: Column,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Sequence packing: assign documents (ordered within each group) to
    consecutive token-budget bins — bin = floor(exclusive running token
    sum / budget). One window cumsum; bins stream out in order, which is
    what a packed-example writer consumes.

    (Greedy first-fit packs marginally tighter but needs sequential
    state; the cumsum form is the scalable canonical approximation.)
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl_cum = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(bin_col, F.floor(excl_cum / F.lit(budget)).cast("bigint"))


def mixture_expand(
    df: DataFrame,
    weight_col: Column,
    max_repeats: int = 10,
) -> DataFrame:
    """Source-mixture upsampling: repeat each row ``weight`` times (the
    epoch-expansion form of mixture weights). Integer weights only;
    explode(sequence) keeps it JVM-side — no Python, no driver loop."""
    reps = F.least(F.greatest(weight_col.cast("int"), F.lit(0)), F.lit(max_repeats))
    return (
        df.withColumn("__rep", F.explode(F.sequence(F.lit(1), reps)))
        .withColumnRenamed("__rep", "epoch_copy")
    )
