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
# a driver round has re-checked them post-rewrite: the full round-6 and
# round-7 cohorts (15 entries) all got their post-rewrite driver green in
# CORRECTNESS_r07 and cycled out per the exit criterion above, freeing
# the round-8 window for the tier-3 stalest cohort (r7 verdict "Next
# round" #1-2). Add entries here ONLY for queries rewritten this round.
#
# Round 9: the events-table NULL/empty adversarial sweep
# (tests/test_events_adversarial.py, r7 verdict item #7) found four real
# engine/oracle divergences; the fixes touch query semantics, so the
# driver must re-check them post-rewrite:
#   dwell_time_by_type        — avg is now the bare IEEE division (the
#                               round(·,6) itself diverged past double
#                               precision at µs magnitudes)
#   asof_view_purchase        — asof_join now gives SQL NULL-key
#                               semantics (NULL matches nothing)
#   kmv_set_overlap           — NULL user_id excluded from both set
#                               sides (oracle was internally
#                               inconsistent: jaccard_exact > 1)
#   funnel_conversion_ordered — stage counts are global aggs so an
#                               empty stream still emits all 3 stages;
#                               conv_rate via try_divide
# Also round 9: the identical-vector collapse in lsh_neardup_pairs
# (PERF.md optimization log #9) rewrites the PLAN (not the semantics —
# outputs are bit-identical, pinned by the flat-vs-collapsed equivalence
# test) of the three queries below; their r8 greens describe the
# pre-collapse plan, so the driver re-checks them too:
_CHANGED_THIS_ROUND = (
    "dwell_time_by_type",
    "asof_view_purchase",
    "kmv_set_overlap",
    "funnel_conversion_ordered",
    "cosine_neardup_lsh",
    "cosine_neardup_lsh_probed",
    "semantic_dedup_stats",
    # Round 9 phase 3: the embeddings-table NULL/empty sweep
    # (tests/test_embeddings_adversarial.py) — NULL vectors are now
    # excluded from ANN search, int8 quantization, and the pair
    # histogram on both engine and oracle sides (ann_recall_at_k
    # inherits the filter through the ANN builders it composes), and
    # the DuckDB fold helpers are NULL-in -> NULL-out like F.aggregate:
    "ann_brute_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_recall_at_k",
    "ann_dim_truncation_recall",
    "embedding_int8_quantize",
    "cosine_pair_histogram",
    # Round 9 phase 4: the empty-fact-tables sweep
    # (tests/test_empty_facts.py) — SQL CUBE/GROUPING SETS emit the ()
    # grand-total row even on empty input, Spark's cube/groupingSets
    # emit nothing; both queries now merge in a literal zero-row:
    "cube_segment_status",
    "grouping_sets_order_stats",
    # Round 9 phase 5: the NULL-laced fact-tables sweep
    # (tests/test_nullfacts_adversarial.py) — six divergences: window
    # NULL ordering (Spark NULLS FIRST vs DuckDB NULLS LAST, now
    # explicit), NULL-priority three-valued bucketing, NULL-CLV bins,
    # double→BIGINT cast rounding (trunc vs nearest), and the
    # grouping-null vs value-null CUBE label collision (cube/gsets
    # above, reworked again through GROUPING()):
    "first_wins_dedup_parts",
    "running_order_totals",
    "customer_revenue_concentration",
    "tpch_q12_ship_priority_split",
    # Round 9 phase 6: the NULL-laced dimension-tables sweep
    # (tests/test_nulldims_adversarial.py) — NOT IN vs anti-join NULL
    # semantics (oracle now NOT EXISTS), merge-precedence winner
    # provenance lost on a NULL group key (now tagged through the fold),
    # and the unpivot melt-back join zero-filling the real NULL-segment
    # counts (oracle join now null-safe):
    "anti_join_new_customers",
    "merge_precedence_nation_counts",
    "unpivot_segment_status",
    # ... and the region-stripes extension of the same sweep: a NULL
    # identity key has no position in the deterministic budget cut
    # (Spark NULLS FIRST vs DuckDB NULLS LAST pick different top-50
    # sets; duplicate NULL keys break the total order), so pairing
    # keys are now required non-NULL on both sides:
    "cross_pair_budget_q",
    # Round 9 phase 7: the NULL-laced documents-metadata sweep
    # (tests/test_nullmeta_adversarial.py) — NULL lang/source/n_chars:
    # unknown lengths leave every length CDF and population count
    # (percentiles/quartiles/KS/rank-blend, where Spark's NULLS-FIRST
    # window default would otherwise fold the NULL bucket into every
    # rank DuckDB's NULLS LAST excludes); NULL lang is a real group, so
    # lang joins are null-safe; NULL page metadata renders an absent
    # DOM element, not a NULL page; the rank-blend composite is now
    # halfway-tie-proof (scaled-integer average):
    "corpus_dedup_pipeline",
    "doc_length_percentiles",
    "doc_length_quartiles",
    "html_selector_extract",
    "ks_length_drift_by_source",
    "rank_normalized_quality",
    # Round 9 phase 9: the non-finite (NaN/±Inf) sweep
    # (tests/test_nonfinite_adversarial.py). Contract: a non-finite
    # double is "not a measurement" and skips every exact statistic
    # like NULL on BOTH engines (functions/determinism.finite_or_null;
    # loud symmetric rejection stays reserved for finite out-of-range
    # magnitudes). Before the guard, Spark's non-ANSI casts silently
    # NULLed (decimal) or mangled (NaN→BIGINT = 0, -Inf = LONG_MIN)
    # what DuckDB's decimal/HUGEINT accumulation rejects loudly — the
    # asymmetric middle state. The list below is computed by diffing
    # the rendered registry (build source + oracle SQL) against the
    # pre-change commit: it includes every query whose oracle text
    # changed through the shared dsum/davg/dstddev/format_duration
    # twins, not just the hand-edited ones. All 190 catalog queries
    # re-verified green at sf0.01 AND sf0.001 after the change
    # (SELFCHECK.json), and the three non-finite fixtures pass 124/124.
    "dispatch_rollup_by_region",
    "event_value_histogram",
    "event_value_outliers",
    "event_value_stats",
    "exact_median_two_pass",
    "largest_variant_per_brand",
    "moving_avg_user_value",
    "multi_resolution_rollup_q",
    "neyman_allocation_sample",
    "order_aging_report",
    "part_velocity_movers",
    "region_nation_revenue_share",
    "report_order_fulfillment",
    "salted_skew_aggregate",
    "slugify_titles",
    "split_mean_labels",
    "stats_quantity_by_returnflag",
    "stream_tumbling_counts",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q20_part_promotion",
    "tpch_q22_dormant_customers",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q7_binational_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tumbling_event_stats",
    "value_trend_by_type",
    # Round 9 phase 10: the valid-vector rule — an embedding with ANY
    # non-finite component carries no geometry (a NaN dot product ranks
    # FIRST under DESC in both engines, so one corrupt vector topped
    # every ANN list; scaled-integer kernels crashed outright), so it
    # is nullified at load (`plans/vectors_q._E` + the module-tail
    # oracle rewrite) and the sweep-proven NULL-embedding semantics
    # take over. Also fixes a latent NULL bug the NULL sweep missed by
    # seed luck: a NULL seed centroid made Spark (NULLS FIRST) and
    # DuckDB (NULLS LAST) pick different kmeans assignments — kmeans
    # now clusters valid vectors only on both sides. The ann/cosine
    # family above is already tier-0; the additional rewritten-oracle
    # queries:
    "array_error_metrics",
    "embedding_cosine_neardup",
    "embedding_covariance",
    "embedding_moments",
    "embedding_norms",
    "embedding_top_pc_power",
    "inception_score_splits",
    "kmeans_embedding_clusters",
    "semantic_decontaminate",
    "similarity_pagerank",
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
            return (0, 0, idx_n)
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
