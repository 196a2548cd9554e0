"""Join family (SURVEY.md §2.4, J1-J5).

The reference's only join algorithms are Python nested loops and set
membership; here every join is declarative so Catalyst picks broadcast vs
shuffled strategies (+ AQE skew splitting) by size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cross_pair_budget(
    left: DataFrame,
    right: DataFrame,
    budget: int,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """J1: bounded cross pairing — every person × every cloth image, cut at
    ``batch_size`` (pipeline_orchestrator.py:135-149, dataloader.py:83-90).

    With ``order_cols`` the cut is deterministic (orderBy→limit); Spark
    pushes the limit into a TakeOrderedAndProject, so the full cross
    product never materializes. Without order it is a plain
    ``crossJoin().limit()`` (fastest, reference-equivalent semantics).

    Determinism contract: ``order_cols`` must form a total order over
    the paired rows, which requires the caller to drop NULL-keyed rows
    first — NULL sorts first in Spark and last in most SQL engines, and
    duplicate NULL keys destroy totality, so a NULL-keyed row has no
    well-defined position in the budget (see cross_pair_budget_q).
    """
    paired = left.crossJoin(right)
    if order_cols:
        paired = paired.orderBy(*order_cols)
    return paired.limit(budget)


def broadcast_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """J4: dispatch/config lookup against a small dimension table
    (site→selectors at any_scraper.py:346-354,623-630). Always broadcast —
    config dims are tiny by construction."""
    return facts.join(F.broadcast(dim), on=list(on), how=how)


def merge_with_precedence(
    low: DataFrame,
    high: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """J5: ``{**medium, **hard}`` — right side wins per key
    (hard_sampler.py:66-70), as a full-outer join + per-column coalesce
    (high first). Row-form equivalent of map_concat LAST_WIN."""
    lo = low.select(*key_cols, *[F.col(c).alias(f"__lo_{c}") for c in value_cols])
    hi = high.select(*key_cols, *[F.col(c).alias(f"__hi_{c}") for c in value_cols])
    joined = lo.join(hi, on=list(key_cols), how="full_outer")
    return joined.select(
        *key_cols,
        *[F.coalesce(F.col(f"__hi_{c}"), F.col(f"__lo_{c}")).alias(c) for c in value_cols],
    )
