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
# Round 12 — HARD FREEZE (r11 verdict "Next round" #1): with ONE
# documented exception, no semantics changed this round; the list below
# is the 51 round-11 rewrites that the 50-slot r11 window could not
# reach (CORRECTNESS_r11.json drained the other 50). The exception is
# rank_normalized_quality, listed FIRST: the r12 sf0.1 full-catalog
# oracle sweep found it wrong-on-CLEAN-data (three docs carry quality
# exactly 0.72125, a decimal halfway at the 4-dp grid where Spark's
# HALF_UP and DuckDB's half-even disagree) — the freeze's explicit
# exemption; fixed in-round with an IEEE floor-grid key on both engines
# (DIVERGENCES.md "sf0.1 sweep"). Every entry was independently re-verified by
# the r11 judge at sf0.01 (51/51) and is green in SELFCHECK.json and the
# in-suite sf0.001 full-catalog parity test; this round exists to put
# the DRIVER's evidence back in front of the code. Any new adversarial
# finding this round is committed as a fixture + DIVERGENCES "Queued
# fixes" entry and lands in r13 — unless it is wrong-answer-on-CLEAN-
# data. Tier-0 size / window / overflow are COMPUTED by
# tools/staleness.py (pinned in tests/test_staleness_report.py) — do
# not hand-write those numbers here (r11 verdict "What's wrong" #2).
#
# List order is r11's priority order preserved: whitespace-class (VT)
# tokenizer tail first, then the hostile-timestamp events wave, the
# floor-bucket trio, and the degenerate-vector ANN/embeddings wave —
# the lowest-risk tail (clean-fixture outputs identical) sits last so
# any 1-entry overflow falls on it.
_CHANGED_THIS_ROUND = (
    # --- r12 clean-data fix (the freeze exemption; see block comment):
    # rank_normalized_quality's qv grid moved from round(·,4) to the
    # engine-identical IEEE floor grid ---
    "rank_normalized_quality",
    # --- whitespace-class (VT) rewrite tail, round 11 ---
    "repetition_top_bigram",
    "simhash_hamming_pairs_q",
    "simhash_signatures",
    "slugify_titles",
    "source_sqrt_mixture",
    "substring_dup_pairs",
    "substring_dup_removal",
    "substring_max_span",
    "tfidf_top_terms",
    "token_entropy_by_source",
    "token_overlap_pairs",
    "top_tokens_per_lang",
    "unigram_perplexity_gate",
    "vocab_coverage_oov",
    "winnowing_fingerprints",
    "zipf_slope_by_lang",
    # --- hostile-timestamp sweep (round 11): NULL-ts ordering pinned
    # (sequences/sessions/dwell exclude unstamped events; first-wins and
    # moving-average pin NULLS LAST + event_id), as-of gains the NULL-time
    # rule + simultaneous-purchase collapse, and the tumbling/sliding
    # family moved from truncate-toward-zero to FLOOR buckets so pre-epoch
    # windows match Spark's native window() ---
    "asof_view_purchase",
    "dwell_time_by_type",
    "session_windows_batch",
    "stream_tumbling_counts",
    "stateful_dedup_events",
    "moving_avg_user_value",
    "event_transition_matrix",
    "top_event_trigrams",
    "user_behavior_features",
    "tumbling_event_stats",
    "sliding_event_counts",
    # --- floor-bucket convention completion (round 11): week/day bucket
    # keys move from DIV truncation to floor_bucket_start, so pre-epoch
    # buckets stop straddling the epoch (retention's cohort key is now
    # the week START in µs and renamed accordingly) ---
    "weekly_retention_cohorts",
    "conversion_deadline_attribution",
    "multi_resolution_rollup_q",
    # --- degenerate-vector sweep (round 11): the valid-vector rule gains
    # the corpus-dim check (ragged/empty vectors nullified at load) and
    # cosine gains the zero-norm guard. Clean-fixture outputs are
    # IDENTICAL (the clean corpus is uniformly dim-64 with no zero
    # norms) — listed per the rewritten-build discipline, ordered last
    # as the lowest-risk tier-0 tail (cosine_pair_histogram is already
    # listed in the head block) ---
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_recall_at_k",
    "ann_dim_truncation_recall",
    "array_error_metrics",
    "cosine_neardup_lsh",
    "cosine_neardup_lsh_probed",
    "embedding_cosine_neardup",
    "embedding_covariance",
    "embedding_int8_quantize",
    "embedding_moments",
    "embedding_norms",
    "embedding_top_pc_power",
    "inception_score_splits",
    "kmeans_embedding_clusters",
    "semantic_decontaminate",
    "semantic_dedup_stats",
    "similarity_pagerank",
    "split_mean_labels",
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
