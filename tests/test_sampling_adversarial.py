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


def test_negative_weight_rejected_at_build():
    """FLIPPED r13 (queued fix #5): negative mass used to yield
    non-monotone bounds — 'b' unreachable, its mass silently
    redistributed. Now a build-time ValueError naming the item."""
    with pytest.raises(ValueError, match="negative weight.*'b'"):
        cumulative_weights([("a", 1.0), ("b", -2.0), ("c", 3.0)])


def test_nan_weight_rejected_at_build(spark):
    """FLIPPED r13 (queued fix #5): one NaN weight used to poison every
    bound, and under Spark's NaN-above-everything SQL ordering every
    draw silently landed on the FIRST item — a constant sampler with no
    error. Non-finite weights are now rejected at build, before any
    plan is constructed."""
    with pytest.raises(ValueError, match="non-finite weight"):
        cumulative_weights([("a", float("nan")), ("b", 1.0)])
    from pyspark.sql import functions as F

    df = spark.range(50)
    with pytest.raises(ValueError, match="non-finite weight"):
        weighted_choice(
            df, F.col("id").cast("string"), [("a", float("inf")), ("b", 1.0)], "pick", "s"
        )


def test_empty_items_rejected_at_build():
    """FLIPPED r13 (queued fix #5): empty items used to build empty
    bounds and only fail one call away (IndexError at ladder build).
    Now rejected at the cause."""
    with pytest.raises(ValueError, match="non-empty"):
        cumulative_weights([])
    from syntheticdata_pipeline__spark.operators.sampling import weighted_choice_sql

    with pytest.raises(ValueError, match="non-empty"):
        weighted_choice_sql("k", [], "s")


def test_tiny_and_huge_weights_stay_normalized():
    """Contrast pin: extreme-but-valid magnitudes normalize fine — the
    bounds stay monotone in [0, 1] and end exactly at 1.0."""
    bounds = cumulative_weights([("a", 1e-300), ("b", 1e300), ("c", 1.0)])
    los = [lo for _n, lo, _hi in bounds]
    his = [hi for _n, _lo, hi in bounds]
    assert los == sorted(los) and his == sorted(his)
    assert his[-1] == 1.0 and all(0.0 <= x <= 1.0 for x in los + his)
