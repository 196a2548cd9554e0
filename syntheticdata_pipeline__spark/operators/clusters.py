"""Connected components over a near-dup pair list — the step after
candidate generation: pairs → duplicate CLUSTERS (pick one survivor per
component). Reference analogue: the global dedup registry semantics
(test_kimono_ec2.py progress-set dedup), generalized to transitive
near-dup groups.

Implementation is iterative min-label propagation on DataFrames:
every node starts labeled with its own id; each round takes the min of
its own and its neighbors' labels; converges in O(graph diameter) rounds.
Near-dup graphs are short-diameter (clusters are cliques-ish), so this
beats the large-star/small-star alternation in practice while staying
fully distributed: each round is one equi-join + partial-agg min, keyed
on node — no driver-side graph, no quadratic step. Lineage is truncated
per round with localCheckpoint (otherwise the plan doubles each
iteration); the convergence probe is a count() action per round, which is
how iterative DataFrame algorithms are driven (cf. GraphFrames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` (undirected) with the
    MIN node id of its component. Returns (node, lab) — deterministic for
    any partitioning: min is order-independent.

    ``max_iters`` bounds runtime on pathological long-chain graphs (a
    25-hop diameter near-dup cluster does not occur in practice; if the
    bound is hit the labels are still a valid refinement, just possibly
    unconverged — callers that need certainty can re-run on the output).
    """
    sym = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")).unionAll(
        edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    )
    sym = sym.repartition("node").persist()
    labels = sym.select("node").distinct().withColumn("lab", F.col("node"))
    labels = labels.localCheckpoint(eager=True)
    try:
        for _ in range(max_iters):
            nbr_lab = labels.select(
                F.col("node").alias("nbr"), F.col("lab").alias("nbr_lab")
            )
            nbr_min = (
                sym.join(nbr_lab, "nbr")
                .groupBy("node")
                .agg(F.min("nbr_lab").alias("nlab"))
            )
            new = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))).alias(
                        "lab"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new.select("node", F.col("lab").alias("new_lab"))
                .join(labels, "node")
                .filter(F.col("new_lab") != F.col("lab"))
                .count()
            )
            labels = new
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels
