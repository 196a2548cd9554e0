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
# Round 11: the r10 window drained the entire r9 rewrite tail
# (CORRECTNESS_r10.json: all 27 tier-0 entries green) and the r5
# cohort, so the freeze lifted and the three queued fix waves landed
# (DIVERGENCES.md "Queued fixes", r10 → r11). The six entries below are
# the queries those waves rewrote:
#   - exact_median_two_pass: NULLs leave the selection machinery
#     (n/k/buckets count measurements only) + clamped bucket indexes;
#   - event_value_histogram / cosine_pair_histogram: bucket/bin indexes
#     clamp into the BIGINT envelope on both engines (clamped_floor);
#   - weighted_sample_no_replacement / tpch_q2_min_cost_supplier:
#     ANSI-divide → try_divide/NULLIF, zero-denominator rows fall out
#     identically;
#   - parse_props_json: tolerant-parse contract keyed on
#     object-parseability (not the test stripe's marker prefix), strict
#     int32 LAST_WIN extraction, regex-twinned oracle.
# Mid-round addition: the hostile-text battery (tests/
# test_text_adversarial.py) found a real cross-engine tokenizer
# divergence — Java's \s includes \x0B (vertical tab), RE2's does not —
# so every '\s' in a twinned kernel (tokens/tokens_sql, slugify,
# strip_html, the exact-dedup content-key normalize, BPE_ISH_PATTERN)
# was replaced by the explicit WS_CLASS set, and the
# html_selector_extract oracle gained the get_text(strip=True) twin.
# That rewrites the oracle text of 57 token-family queries (listed
# below after the six wave entries, in registry order); the regex-
# flavor wave adds three more. 66 tier-0 entries overflow a 50-slot
# window by 16 (all on the mechanical whitespace tail, by the
# priority-order rule in _catalog_order): every changed query is green
# in SELFCHECK.json (sf0.01, re-run post-rewrite) and the in-suite
# sf0.001 full-catalog parity test; the overflow and the r6-r8 cohorts
# (13+10+14 unrewritten queries) cycle through the r12 window next.
_CHANGED_THIS_ROUND = (
    "exact_median_two_pass",
    "event_value_histogram",
    "cosine_pair_histogram",
    "weighted_sample_no_replacement",
    "tpch_q2_min_cost_supplier",
    "parse_props_json",
    # --- regex-flavor ('.' vs \r/U+2028, greedy-prefix) wave, round 11:
    # _P_LAST_SEG's tail and the props-oracle k-extraction prefix moved
    # from '.' to [\s\S] so Java and RE2 read them identically ---
    "extract_ids_from_urls",
    "pipeline_end_to_end",
    # resolve_url gained the CPython WHATWG unsafe-byte removal (same
    # flavor sweep; clean-fixture outputs identical, build rewritten):
    "resolve_relative_urls",
    # --- whitespace-class (VT) rewrite wave, round 11 ---
    "bigram_perplexity_gate",
    "bloom_decontaminate",
    "bm25_topk_docs",
    "ccnet_perplexity_buckets",
    "chunk_documents",
    "chunk_level_dedup_stats",
    "cluster_aware_split_leakage",
    "cluster_best_survivors",
    "cluster_dedup_stats",
    "corpus_dedup_pipeline",
    "cross_source_overlap",
    "curation_pipeline_end_to_end",
    "decontaminate_train",
    "doc_continuation_pairs",
    "doc_quality_scores",
    "doc_token_stats",
    "domain_quota_topquality",
    "dsir_importance_resample",
    "dup_rate_estimate",
    "exact_dedup_docs",
    "gopher_quality_flags",
    "heaps_vocab_growth",
    "html_selector_extract",
    "html_title_extract",
    "incremental_dedup_survivors",
    "intradoc_repeated_span",
    "jaccard_prefix_filter_join",
    "lang_id_confusion",
    "lsh_band_sweep",
    "lsh_param_chooser",
    "minhash_lsh_candidates",
    "neardup_clusters",
    "ngram_containment_pairs",
    "ngram_diversity_by_source",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pruned",
    "pack_token_bins",
    "pmi_collocations",
    "quality_duplication_lift",
    "rank_normalized_quality",
    "repetition_dup_ngrams",
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
            # within tier 0, list order is priority order: when the tier
            # overflows the driver window (63 entries vs 50 slots, r11),
            # the cut must fall on the LIST's tail — the mechanical
            # whitespace wave — never on the semantic fix waves at its
            # head, whatever their registry positions are
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
