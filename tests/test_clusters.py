"""connected_components: min-label propagation over pair lists."""

from __future__ import annotations

from syntheticdata_pipeline__spark.operators.clusters import connected_components


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["lab"] for r in connected_components(df, **kw).collect()}


def test_two_components(spark):
    # chain 1-2-3 plus pair 10-11: two components, min-id reps.
    labs = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert labs == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # 0-1-2-...-9: diameter 9, needs multiple propagation rounds.
    labs = _labels(spark, [(i, i + 1) for i in range(9)])
    assert labs == {i: 0 for i in range(10)}


def test_edge_direction_irrelevant(spark):
    # same component regardless of (src, dst) orientation.
    labs = _labels(spark, [(5, 2), (2, 9), (9, 5)])
    assert labs == {2: 2, 5: 2, 9: 2}


def test_max_iters_bound(spark):
    # with max_iters=1 a long chain is refined but unconverged: every
    # node still holds the min of its 1-hop neighborhood.
    labs = _labels(spark, [(i, i + 1) for i in range(4)], max_iters=1)
    assert labs[0] == 0 and labs[1] == 0 and labs[2] == 1
