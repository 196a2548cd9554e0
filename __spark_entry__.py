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
# Round 15 (optimization round 2/2) — every r14 entry was re-checked
# green by the r14 driver window (CORRECTNESS_r14: 50/50, all 19 listed)
# and rotates out. This round's entries are the reach of two
# value-identical operator changes, re-entered so the driver re-verifies
# the rewritten plans first:
# (a) collapse_identical_sets' group fingerprint became the injective
#     double-join md5(\x01-join)||md5(\x02-join) (r14 ADVICE high: a
#     single-separator join let an element containing \x01 forge the
#     encoding and emit phantom pairs; pinned in
#     tests/test_collapse_equivalence.py). Clean-data grouping is
#     unchanged; 190/190 local oracle re-verified.
# (b) minhash_pairs_from_sets dropped its dead .repartition("band","bh")
#     (the r14 plan dump proved the intended exchange reuse never fires
#     — one side broadcasts; EnsureRequirements re-inserts join-key
#     exchanges wherever SMJ/SHJ is picked at scale).
# Order: the six minhash-family paths (both changes) first, then the
# collapse-only consumers, lowest-risk (sweep/param mirrors) last so any
# window overflow falls on them. Tier-0 size / window / overflow are
# COMPUTED by tools/staleness.py (pinned in
# tests/test_staleness_report.py) — do not hand-write those numbers
# here.
_CHANGED_THIS_ROUND = (
    "minhash_lsh_candidates",
    "corpus_dedup_pipeline",
    "incremental_dedup_survivors",
    "neardup_clusters",
    "cluster_dedup_stats",
    "cluster_best_survivors",
    "quality_duplication_lift",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pruned",
    "cluster_aware_split_leakage",
    "token_overlap_pairs",
    "substring_dup_pairs",
    "substring_max_span",
    "jaccard_prefix_filter_join",
    "simhash_hamming_pairs_q",
    "lsh_band_sweep",
    "lsh_param_chooser",
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
