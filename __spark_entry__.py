"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``syntheticdata_pipeline__spark/``; the query
catalog (Spark plan + DuckDB oracle twins) is
``syntheticdata_pipeline__spark/plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from syntheticdata_pipeline__spark.plans import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The A1-A3 "final scraping report" shape: scan → join → agg → derived
    rates (SURVEY.md §7.1).
    """
    registry = load_all()
    return registry["report_order_fulfillment"].build(spark, _SMOKE_SF_DIR)


# Queries whose implementation changed since their MOST RECENT driver
# check: verify them FIRST, before even the never-checked tier — a stale
# green on rewritten semantics affirmatively describes code that no
# longer exists, which is worse evidence than no check at all
# (round-6 verdict, "Next round" #2). Entries leave this list only once
# a driver round has re-checked them post-rewrite. Add entries here ONLY
# for queries rewritten this round.
#
# Round 13 — the queued-fix payoff round (r12 verdict "Next round" #1):
# the r12 freeze's 12 queued fixes landed, and every catalog query whose
# kernel or oracle they touched re-enters below. Head = the two
# wrong-answer-on-hostile-input fixes (Q16 oracle NOT IN → NOT EXISTS;
# sketch kernels drop NULL keys — kmv/cm/hll on both engines, oracle
# twins in lockstep), then the grid-key floor conversion
# (quality_duplication_lift — the latent 0.72125 sibling the r13 tie
# sweep found), then the perf rewrites whose clean outputs are proven
# identical (incremental collapse; gopher token hoist), and last the two
# r11 leftovers the r12 window could not reach (both independently
# re-verified by the r12 judge at sf0.01 — the designed lowest-risk
# tail). kmv_set_overlap does NOT re-enter: its build never calls the
# rewritten kernel (it inlines its own r9 NULL-filtered sketch) and its
# oracle is unchanged. curation_pipeline_end_to_end does NOT re-enter:
# it calls gopher_flags via the unchanged default path, so its plan is
# byte-identical. Tier-0 size / window / overflow are COMPUTED by
# tools/staleness.py (pinned in tests/test_staleness_report.py) — do
# not hand-write those numbers here; the tail rule stands in prose: the
# list ends with the lowest-risk entries so any overflow falls on them.
_CHANGED_THIS_ROUND = (
    # --- r14 wrong-answer fixes (r13 ADVICE medium + same-class audit),
    # landed in-round with pinned tests (tests/test_incremental_dedup.py
    # ::test_null_text_survives_and_associative + the three new rows in
    # tests/test_nulltext_guard.py):
    # (a) incremental_minhash_dedup's identical-signature collapse keyed
    #     all-NULL signatures (NULL text) under md5('') and dropped the
    #     non-minimum ids within a batch, while cross-batch NULL band
    #     hashes never matched -- survivor sets depended on batch
    #     boundaries, breaking the documented associativity guarantee.
    #     All-NULL signatures are now exempt from the collapse on both
    #     the batch and prior-state sides (operators/neardup.py);
    # (b) jaccard_pairs_inverted's collapse path fingerprinted NULL
    #     shingle sets into the empty-encoding group and emitted phantom
    #     within-group jac=1.0 pairs the collapse-off plan (and the
    #     oracle's NULL jaccard) never produce -- NULL sets are now
    #     dropped before the collapse, restoring collapse-on ==
    #     collapse-off ---
    "incremental_dedup_survivors",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pruned",
    # --- plan-identical refactor, re-entered out of caution: the
    # simhash operator's stages 1-3 split out as
    # simhash_hamming_rep_pairs so the 100x deep point can time the
    # 2^16-bounded band stage without the (contractually quadratic-in-
    # replicas) member-pair expansion; the catalog query composes the
    # same DataFrames as before (collapse-equivalence + oracle
    # re-verified at the split) ---
    "simhash_hamming_pairs_q",
    # --- r14 optimization rewrites (value-identical by construction,
    # kernel equivalence pinned in tests, 190/190 local oracle + touched
    # set re-checked at sf0.1; re-entered so the driver re-verifies the
    # rewritten plans): the explode+aggregate min-hash kernel + fan-out
    # lineage pins (OPTIMIZATION_r14.md §8-§9), the token-set collapse
    # (§10), the IVF cells-from-assignment projection (§11), and the
    # connected-components round-1 fold (§12) ---
    # (token_overlap/ngram_jaccard*/substring* additionally carry the
    # §13 NULL-block collapse guard — a wrong-answer-on-hostile-input
    # fix found by the NULL-metadata battery this round, pinned in
    # tests/test_nullblock_guard.py)
    "minhash_lsh_candidates",
    "corpus_dedup_pipeline",
    "token_overlap_pairs",
    "ngram_containment_pairs",
    "substring_dup_pairs",
    "substring_max_span",
    "quality_duplication_lift",
    "cluster_aware_split_leakage",
    "neardup_clusters",
    "cluster_dedup_stats",
    "cluster_best_survivors",
    "semantic_dedup_stats",
    "entity_resolution_parts",
    "ann_ivf_trained_topk",
    "kmeans_embedding_clusters",
)



def _catalog_order(names: list[str]) -> list[str]:
    """Order the catalog so the driver's (possibly capped) verification pass
    covers the queries with the least evidence first:

    0. changed since their most recent driver check (a stale green on
       rewritten semantics is actively misleading — worse than no check),
    1. never driver-checked,
    2. red at their MOST RECENT check (an old green does not excuse a
       current failure),
    3. green at their most recent check, stalest round first — every query
       keeps cycling back through the window over successive rounds.

    The catalog is FROZEN at 190 queries as of round 7 (round-6 verdict
    "Next round" #1): with a 50-slot driver window per round, tiers 0+1
    (~26 entries) plus the stalest 24 of the r2 cohort drain this round
    and the r3/r4 cohorts next round, bringing every query's external
    evidence within two rounds of current.

    Within a tier, ties keep registry (module import) order."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    last_round: dict[str, int] = {}
    last_ok: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for k, v in rows.items():
            ok = bool(
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            )
            if rnd >= last_round.get(k, -1):
                last_round[k] = rnd
                last_ok[k] = ok

    def key(name: str) -> tuple[int, int, int]:
        idx_n = idx[name]
        if name in _CHANGED_THIS_ROUND:
            # within tier 0, list order is priority order: if the tier
            # overflows the driver window (tools/staleness.py computes
            # and prints the overflow), the cut must fall on the LIST's
            # tail — the lowest-risk wave — never on the semantic fix
            # waves at its head, whatever their registry positions are
            return (0, _CHANGED_THIS_ROUND.index(name), idx_n)
        if name not in last_round:
            return (1, 0, idx_n)
        if not last_ok[name]:
            return (2, 0, idx_n)
        return (3, last_round[name], idx_n)

    idx = {n: i for i, n in enumerate(names)}
    return sorted(names, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2, ordered
    least-verified-first (see _catalog_order)."""
    registry = load_all()
    return {name: registry[name].build for name in _catalog_order(list(registry))}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every SQL-expressible query (same column
    aliases — the driver hashes values after sorting columns by name)."""
    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _catalog_order(list(registry))
        if registry[name].oracle is not None
    }
