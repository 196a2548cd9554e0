"""Vector/array math over embedding columns (SURVEY.md §2.11 extensions +
M8/M10 metric formulas from experiments/standard_vton/metrics.py).

All folds are strict left-to-right over DOUBLE, which is bit-identical in
Spark (``aggregate``) and DuckDB (``list_reduce``) — no rounding slop in
the oracle comparison, and deterministic top-k ordering.

At cluster scale these expressions run inside whole-stage codegen; for very
wide vectors a Pandas-UDF (Arrow) variant is the faster path — see
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict sequential double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    # NULL-in -> NULL-out, matching Spark's F.aggregate: without the CASE,
    # DuckDB's list_prepend(0.0, NULL) yields [0.0] and the fold returns
    # 0.0 for a NULL array where Spark returns NULL (found by the round-9
    # NULL-embeddings sweep via embedding_norms / ann_brute_topk).
    fold = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )
    return f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL ELSE {fold} END)"


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    """NULL when either side is the zero vector (degenerate-vector sweep,
    round 11): a zero norm makes the ratio 0/0 — Spark's ANSI division
    raises outright and DuckDB's IEEE division yields NaN, which ranks
    FIRST under DESC, so without the guard one all-zeros embedding (a
    failed encoder's natural output) crashes or tops every similarity
    list. An angle with the zero vector is undefined; NULL is the pinned
    twinned answer."""
    den = l2_norm(a) * l2_norm(b)
    return F.when(den != F.lit(0.0), dot(a, b) / den)


def cosine_sql(a: str, b: str) -> str:
    den = f"({l2_norm_sql(a)} * {l2_norm_sql(b)})"
    return f"(CASE WHEN {den} <> 0.0 THEN {dot_sql(a, b)} / {den} END)"


def mae(a: Column, b: Column) -> Column:
    """Mean absolute error between two equal-length arrays (metrics.py:99-108)."""
    s = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return s / F.size(a).cast("double")


def mae_sql(a: str, b: str) -> str:
    s = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), "
        f"(acc, v) -> acc + v)"
    )
    # NULL-in -> NULL-out (see dot_sql)
    return (
        f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
        f"ELSE {s} / CAST(len({a}) AS DOUBLE) END)"
    )


def mse(a: Column, b: Column) -> Column:
    """Mean squared error (metrics.py:111-120)."""
    s = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return s / F.size(a).cast("double")


def mse_sql(a: str, b: str) -> str:
    s = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), "
        f"(acc, v) -> acc + v)"
    )
    # NULL-in -> NULL-out (see dot_sql)
    return (
        f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
        f"ELSE {s} / CAST(len({a}) AS DOUBLE) END)"
    )


def psnr(mse_col: Column, max_value: float = 2.0) -> Column:
    """PSNR = 20·log10(max/√mse) (metrics.py:13-33). ``max_value=2`` for
    unit-normalized embedding components in [-1, 1]."""
    return F.lit(20.0) * F.log10(F.lit(max_value) / F.sqrt(mse_col))


def psnr_sql(mse_sql_expr: str, max_value: float = 2.0) -> str:
    return f"(20.0 * log10({max_value} / sqrt({mse_sql_expr})))"


def sqdist(a: Column, b: Column) -> Column:
    """Squared euclidean distance Σ (aᵢ−bᵢ)² as a strict sequential fold
    (bit-identical to :func:`sqdist_sql`)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sqdist_sql(a: str, b: str) -> str:
    fold = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), "
        f"(acc, v) -> acc + v)"
    )
    # NULL-in -> NULL-out (see dot_sql)
    return f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL ELSE {fold} END)"
