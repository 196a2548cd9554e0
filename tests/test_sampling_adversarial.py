"""Round-12 hostile-weight battery for the sampling family (M4-M6/A10,
operators/sampling.py). Weights are plan-build-time Python constants
(the reference hard-codes sane ones, keyword_sampler.py:5-14), so every
failure mode here fires on the DRIVER at build — but three of them fire
SILENTLY, producing a wrong distribution instead of an error, and those
are QUEUED for construction-time validation (r12 → r13, DIVERGENCES.md
"Queued fix: sampling weight validation"):

- a NEGATIVE weight makes the cumulative bounds non-monotone — the CASE
  ladder still evaluates deterministically but the draw probabilities
  are meaningless (the negative item is unreachable and its mass is
  smeared over its neighbors);
- a NaN weight poisons every bound — `r < NaN` is false for every
  bucket, so EVERY draw silently lands on the ladder's ELSE (the last
  item): a single bad weight turns the sampler into a constant;
- an EMPTY item list builds empty bounds and only fails later
  (IndexError at ladder build), far from the cause.

All-zero weights already crash loudly at build (ZeroDivisionError) —
the same contract as the reference's random.choices ValueError; pinned
as the intended loud parity, message clarity deferred to the same
queued validation.
"""

from __future__ import annotations

import math

import pytest

from syntheticdata_pipeline__spark.operators.sampling import (
    cumulative_weights,
    weighted_choice,
)


def test_all_zero_weights_crash_loudly_at_build():
    """Parity pin: Python's random.choices raises on zero total; the
    engine's build-time normalization does too (ZeroDivisionError)."""
    with pytest.raises(ZeroDivisionError):
        cumulative_weights([("a", 0.0), ("b", 0.0)])


def test_negative_weight_bounds_non_monotone_pinned():
    """QUEUED FIX: negative mass yields bounds (0,0.5),(0.5,-0.5),
    (-0.5,1.0) — 'b' is unreachable and its mass redistributes silently.
    r13: reject w < 0 at build with a clear message."""
    bounds = cumulative_weights([("a", 1.0), ("b", -2.0), ("c", 3.0)])
    his = [hi for _n, _lo, hi in bounds]
    assert his == [0.5, -0.5, 1.0]  # non-monotone, pinned as-is


def test_nan_weight_poisons_all_bounds_pinned(spark):
    """QUEUED FIX: one NaN weight makes every bound NaN, and Spark's SQL
    ordering puts NaN ABOVE every double (not IEEE-incomparable), so
    `r < NaN` is TRUE in the first WHEN and EVERY draw silently lands on
    the FIRST item — a constant sampler. (The IEEE-semantics engine
    would constant-pick the LAST item instead; either way one bad weight
    kills the distribution without an error.) r13: reject non-finite
    weights at build."""
    bounds = cumulative_weights([("a", float("nan")), ("b", 1.0)])
    assert all(math.isnan(lo) and math.isnan(hi) for _n, lo, hi in bounds)
    from pyspark.sql import functions as F

    df = spark.range(50)
    out = weighted_choice(
        df, F.col("id").cast("string"), [("a", float("nan")), ("b", 1.0)], "pick", "s"
    )
    picks = {r.pick for r in out.collect()}
    assert picks == {"a"}  # Spark NaN-max ordering: first WHEN always true


def test_empty_items_fail_far_from_cause_pinned():
    """QUEUED FIX: empty items build empty bounds; the failure surfaces
    only at ladder build (IndexError on bounds[-1]), one call away from
    the mistake. r13: reject empty items at build."""
    assert cumulative_weights([]) == []
    from syntheticdata_pipeline__spark.operators.sampling import weighted_choice_sql

    with pytest.raises(IndexError):
        weighted_choice_sql("k", [], "s")  # fails at ladder build, not at cause


def test_tiny_and_huge_weights_stay_normalized():
    """Contrast pin: extreme-but-valid magnitudes normalize fine — the
    bounds stay monotone in [0, 1] and end exactly at 1.0."""
    bounds = cumulative_weights([("a", 1e-300), ("b", 1e300), ("c", 1.0)])
    los = [lo for _n, lo, _hi in bounds]
    his = [hi for _n, _lo, hi in bounds]
    assert los == sorted(los) and his == sorted(his)
    assert his[-1] == 1.0 and all(0.0 <= x <= 1.0 for x in los + his)
