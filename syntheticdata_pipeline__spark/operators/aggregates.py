"""Aggregation/report suite (SURVEY.md §2.5, A1-A11).

The reference's reports are hand-maintained counter dicts printed at the
end of a run (test_kimono.py:63-74, 732-782). Here each report is one
``groupBy().agg()`` + a derived-rate projection — partial aggregation
(map-side combine) makes these a single shuffle of pre-aggregated rows at
any scale.

All double outputs follow the determinism rules in
functions/determinism.py (decimal accumulate → double export).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import davg, dstddev, dsum


def run_report(
    df: DataFrame,
    group_cols: Sequence[str],
    success_col: Column,
    items_col: Column,
    elapsed_seconds: Column,
) -> DataFrame:
    """A1-A3: the "FINAL SCRAPING REPORT" recast as one aggregation.

    Rate formulas mirror test_kimono.py:743-766:
    success_rate = successes/explored·100; items/min = successes/elapsed·60.
    """
    agg = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_explored"),
        F.sum(F.when(success_col, 1).otherwise(0)).cast("bigint").alias("n_success"),
        dsum(items_col, scale=2).alias("total_items"),
        dsum(elapsed_seconds, scale=6).alias("elapsed_s"),
    )
    return agg.select(
        *group_cols,
        "n_explored",
        "n_success",
        "total_items",
        (F.col("n_success").cast("double") / F.col("n_explored").cast("double") * 100.0).alias(
            "success_rate"
        ),
        (F.col("n_success").cast("double") / F.col("elapsed_s") * 60.0).alias("items_per_min"),
    )


def status_pivot(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    pivot_values: Sequence[str],
) -> DataFrame:
    """A4: category × status counts as a wide pivot
    (test_website_accessibility.py:390-447). Explicit ``pivot_values``
    avoids the extra distinct-scan job and keeps column names stable."""
    out = df.groupBy(row_col).pivot(pivot_col, list(pivot_values)).count().na.fill(0)
    for v in pivot_values:
        out = out.withColumnRenamed(v, f"n_{v}")
    return out


def grouped_stats(df: DataFrame, group_cols: Sequence[str], metric: str, scale: int = 2) -> DataFrame:
    """A7: mean/std per metric (metrics.py:334-345), exact-sum variant."""
    c = F.col(metric)
    return df.groupBy(*group_cols).agg(
        F.count(c).cast("bigint").alias("n"),
        davg(c, scale=scale).alias(f"avg_{metric}"),
        dstddev(c, scale=scale).alias(f"std_{metric}"),
    )


def max_by_deterministic(
    df: DataFrame,
    group_cols: Sequence[str],
    metric: Column,
    tiebreak: Sequence[str],
    keep: Sequence[str],
) -> DataFrame:
    """A6: pick the row with the max metric per group (largest image
    variant, any_scraper.py:364-368) with explicit tiebreaks — engines'
    bare max_by is nondeterministic on ties."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        metric.desc(), *[F.col(c) for c in tiebreak]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*group_cols, *keep)
    )


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """A8 closure: Fréchet distance between two Gaussians
    (metrics.py:254-274) — the driver-side scalar once per-dim means
    (embedding_moments query) and covariance entries
    (embedding_covariance query) are aggregated distributedly.

    ||μ₁−μ₂||² + Tr(Σ₁ + Σ₂ − 2(Σ₁Σ₂)^½), numpy on small d×d matrices.
    """
    import numpy as np

    mu1 = np.asarray(mu1, dtype=np.float64)
    mu2 = np.asarray(mu2, dtype=np.float64)
    cov1 = np.asarray(cov1, dtype=np.float64)
    cov2 = np.asarray(cov2, dtype=np.float64)
    diff = float(((mu1 - mu2) ** 2).sum())
    # symmetric PSD sqrt via eigendecomposition of cov1 @ cov2
    prod = cov1 @ cov2
    eigvals = np.linalg.eigvals(prod)
    covmean_trace = float(np.sqrt(np.clip(eigvals.real, 0, None)).sum())
    return diff + float(np.trace(cov1) + np.trace(cov2)) - 2.0 * covmean_trace


def split_mean(
    df: DataFrame, key_col: str, value: Column, n_splits: int = 5
) -> DataFrame:
    """A9 (Inception-Score shape): deterministic splits → per-split mean →
    mean/std over splits (metrics.py:199-212, which chunks a shuffled
    array into N splits).

    Split assignment is a seeded md5 bucket of ``key_col`` — a map-side
    expression, so the plan is two ordinary shuffled aggregations with no
    global-order window (a single-partition ntile sort would serialize the
    whole table through one task at scale). Same statistical intent as the
    reference's shuffle-then-chunk: a uniform, data-independent partition
    of rows into N groups."""
    from ..functions.determinism import hash_bucket

    per_split = (
        df.withColumn("split", hash_bucket(F.col(key_col), n_splits, salt="is-split") + F.lit(1))
        .groupBy("split")
        .agg(davg(value, scale=6).alias("split_mean"))
    )
    return per_split.agg(
        davg(F.col("split_mean"), scale=12).alias("mean_of_splits"),
        dstddev(F.col("split_mean"), scale=12).alias("std_of_splits"),
    )
