"""Dedup / top-k / limit family (SURVEY.md §2.6, D1-D11).

The reference dedups with in-memory Python sets where *first occurrence
wins in insertion order* (any_scraper.py:584-603). Bare ``dropDuplicates``
is order-nondeterministic across partitionings, so the engine's
order-sensitive dedup is a window over an explicit position — deterministic
at any parallelism, shuffle-partitioned by the dedup key (scales to 100 TB:
one hash shuffle, no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_wins(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    order_cols: Sequence[str | Column],
) -> DataFrame:
    """Keep the first row per key, "first" defined by ``order_cols``.

    Mirrors the seen-set insertion-order semantics of
    any_scraper.py:584-597; D1/D2. ``order_cols`` must be a total order
    within each key group (include a unique id as the last tiebreaker) or
    the result is nondeterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep ≤k rows per group (D8: ≤6 images/product,
    zalando_production_scraper.py:142,162-163).

    Physical plan: hash shuffle on keys + per-partition top-k sort —
    Spark pushes the limit into the sort for small k (WindowGroupLimit),
    so no group ever materializes fully. ``order_cols`` should end with a
    unique tiebreaker for determinism.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def exact_dedup_by_hash(
    df: DataFrame,
    content_col: str,
    id_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Exact content dedup: md5 of (optionally normalized) content, lowest
    id wins. Extension op (SURVEY §2.11) generalizing D1-D4 to documents.

    At 100 TB this is a single hash shuffle on a 128-bit key — the standard
    exact-dedup plan; no skew (hash keys are uniform).
    """
    c = F.col(content_col)
    if normalize:
        from ..functions.text import ws_normalize

        c = ws_normalize(c)
    keyed = df.withColumn("__content_key", F.md5(c))
    return first_wins(keyed, ["__content_key"], [F.col(id_col)]).withColumnRenamed(
        "__content_key", "content_key"
    )


def anti_join_state(
    new_df: DataFrame,
    state_df: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Skip already-processed work: ``left_anti`` against a state table.

    Replaces the reference's in-memory ``scraped_urls`` set membership
    (any_scraper.py:731,745-747; AsyncImageGen/main.py:40-42). The state
    side is usually much smaller → Spark broadcasts it; at larger state
    sizes AQE falls back to a shuffled anti join.
    """
    return new_df.join(state_df.select(*on).dropDuplicates(list(on)), on=list(on), how="left_anti")
