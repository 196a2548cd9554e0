"""Backfill sampler invariants, reference-dict ingestion, FID closure,
and hypothesis property tests for the portable scalar functions."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from syntheticdata_pipeline__spark.operators.aggregates import frechet_distance
from syntheticdata_pipeline__spark.operators.sampling import (
    cumulative_weights,
    gates_with_backfill,
    reference_dict_to_tree,
)


def test_backfill_guarantees_minimum(spark):
    """M5: every key ends with ≥ min_count selected categories, and gated
    categories are never dropped (medium_sampler.py:24-50)."""
    gates = [("a", 0.1), ("b", 0.2), ("c", 0.05), ("d", 0.9)]
    df = spark.range(500)
    out = gates_with_backfill(df, F.col("id"), gates, min_count=3)
    per_key = (
        out.groupBy("key")
        .agg(F.sum(F.when(F.col("selected"), 1).otherwise(0)).alias("n_sel"))
        .collect()
    )
    assert all(r.n_sel >= 3 for r in per_key)
    assert len(per_key) == 500
    # selection rate of 'd' must be at least its gate prob
    d_rate = out.filter((F.col("category") == "d") & F.col("selected")).count() / 500
    assert d_rate > 0.85


def test_backfill_no_min_is_pure_gates(spark):
    """min_count=0 degrades to plain independent gates (rate check)."""
    gates = [("a", 0.5), ("b", 0.5)]
    out = gates_with_backfill(spark.range(200), F.col("id"), gates, min_count=0)
    n_sel = out.filter("selected").count()
    assert 140 < n_sel < 260  # ≈ 0.5 · 400


def test_reference_dict_to_tree_shapes():
    ref = {
        "upper": {
            "prob": 0.7,
            "casual": {"prob": 0.6, "keywords": [("tshirt", 1.0)]},
            "formal": {"prob": 0.4, "keywords": [("shirt", 0.5), ("blazer", 0.5)]},
        },
        "lower": {"prob": 0.3, "keywords": [("jeans", 1.0)]},
    }
    tree = reference_dict_to_tree(ref)
    assert set(tree["children"]) == {"upper", "lower"}
    assert tree["children"]["lower"]["keywords"] == [("jeans", 1.0)]
    assert set(tree["children"]["upper"]["children"]) == {"casual", "formal"}


def test_frechet_distance_identity_and_shift():
    import numpy as np

    mu = np.zeros(4)
    cov = np.eye(4)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-9)
    d = frechet_distance(mu, cov, mu + 2.0, cov)
    assert d == pytest.approx(16.0, abs=1e-6)  # ||Δμ||² = 4·4


# --- hypothesis property tests ------------------------------------------------


@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=3), st.floats(0.01, 10.0)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=50, deadline=None)
def test_cumulative_weights_properties(items):
    cw = cumulative_weights(items)
    assert cw[0][1] == 0.0
    assert cw[-1][2] == pytest.approx(1.0)
    for (_, lo, hi), (_, lo2, hi2) in zip(cw, cw[1:]):
        assert hi == pytest.approx(lo2)
        assert lo < hi


@given(st.text(max_size=80))
@settings(max_examples=30, deadline=None)
def test_slugify_property(spark, s):
    """Slug output is always filesystem-safe and capped."""
    import re as _re

    from syntheticdata_pipeline__spark.functions.text import slugify

    df = spark.createDataFrame([(s,)], "s string")
    out = df.select(slugify(F.col("s")).alias("v")).collect()[0].v
    assert out is None or (_re.fullmatch(r"[a-z0-9_.-]*", out) and len(out) <= 200)
