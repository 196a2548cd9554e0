"""Physical-plan contracts: lock the scale-critical plan shapes so a
refactor can't silently regress them. PLANS_AUDIT.md reports these
properties; this file ASSERTS them on a representative set.

Contracts:
 1. No unlisted query may contain a CartesianProduct /
    BroadcastNestedLoopJoin — only the intentionally bounded ones
    (budgeted pairing, broadcast-scalar crossJoins, the labeled
    brute-force ANN verifiers).
 2. Flagship dim joins stay broadcast (no SortMergeJoin of a dim).
 3. Pruned scans: queries projecting few columns must not read the full
    table schema (column pruning reaches the parquet scan).
 4. De-skewed quantile family: no windowspecdefinition partitioned by a
    low-cardinality group directly over per-doc rows (the histogram-CDF
    invariant) — checked structurally: every Window in the perplexity
    gate consumes an aggregate (its input is the histogram), not a scan.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    from syntheticdata_pipeline__spark.plans import load_all

    df = load_all()[name].build(spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("== Initial Plan ==")[0]


def _nodes(txt: str, pattern: str) -> int:
    return len(re.findall(rf"^\(\d+\) {pattern}", txt, re.MULTILINE))


# Queries ALLOWED to contain NLJ/cartesian nodes: 1-row broadcast-scalar
# crossJoins, the explicitly budgeted pairing op, and the labeled
# brute-force ANN verifiers (bounded query set x corpus).
_NLJ_ALLOWED = {
    "ann_brute_topk",
    "ann_dim_truncation_recall",
    "ann_recall_at_k",
    "cross_pair_budget_q",
    "embedding_cosine_neardup",
    "array_error_metrics",
    "inception_score_splits",
    "semantic_decontaminate",
    "tpch_q22_dormant_customers",
    "tpch_q11_important_stock",
    "tpch_q14_promo_revenue",  # scalar ratio
    "event_value_outliers",
    "event_rate_report",
    "key_skew_profile",
    "lsh_band_sweep",
    "heaps_vocab_growth",
    "value_trend_by_type",
    "exact_median_two_pass",
    "rank_normalized_quality",
    "neyman_allocation_sample",
    "dsir_importance_resample",
    "doc_length_percentiles",
    "unigram_perplexity_gate",
    "bigram_perplexity_gate",
    "ccnet_perplexity_buckets",
    "ks_length_drift_by_source",
    "vocab_coverage_oov",
    "token_entropy_by_source",
    "zipf_slope_by_lang",
    "similarity_pagerank",
    "hll_distinct_users",
    "hll_window_merge",
    "kmv_distinct_users",
    "weighted_sample_no_replacement",
    "source_sqrt_mixture",
    "mixture_expansion",
    "dataset_split_counts",
    "curation_pipeline_end_to_end",
    "embedding_top_pc_power",
    "embedding_moments",
    "embedding_covariance",
    "kmeans_embedding_clusters",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_lsh_topk",
    "cosine_neardup_lsh",
    "cosine_neardup_lsh_probed",
    "semantic_dedup_stats",
    "split_mean_labels",
    "bm25_topk_docs",
    "tfidf_top_terms",
    "bloom_decontaminate",
    "decontaminate_train",
    "cross_source_overlap",
    "cluster_aware_split_leakage",
    "sample_prompt_generator",
    "weighted_tier_choice",
    "pipeline_end_to_end",
    "max_page_number",
    "embedding_int8_quantize",  # broadcast scale-array crossJoin (1 row)
    "dup_rate_estimate",  # 1-row estimate x 1-row truth scalar crossJoin
    "top_event_trigrams",  # 1-row share-total broadcast crossJoin
    "lsh_param_chooser",  # 4-row config table x 1-row best-candidate minimum
    "join_size_estimate_cm",  # 1-row estimate x 1-row exact scalar crossJoin
    "kmv_set_overlap",  # 1-row sketch estimate x 1-row exact scalar crossJoin
    "lang_source_chi2",  # contingency cells x 1-row statistic crossJoin
    "customer_revenue_concentration",  # histogram x 1-row totals crossJoins
    "quality_duplication_lift",  # 1-row doc-count broadcast crossJoin (tiles)
    "funnel_conversion_ordered",  # broadcast per-step scalar thresholds
    "negative_sample_pairs",  # bounded seeded pairing (J1 budget class)
}

# A sample of big-join queries that must keep every NLJ out entirely.
_STRICT_NO_NLJ = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "exact_dedup_docs",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "jaccard_prefix_filter_join",
    "report_order_fulfillment",
    "dispatch_rollup_by_region",
    "substring_dup_pairs",
    "doc_continuation_pairs",
    "event_transition_matrix",
    "burst_detection",
    "dataset_version_diff",
    "region_nation_revenue_share",
]


@pytest.mark.parametrize("name", _STRICT_NO_NLJ)
def test_no_cartesian_in_strict_queries(spark, name):
    txt = _plan(spark, name)
    nlj = _nodes(txt, "BroadcastNestedLoopJoin") + _nodes(txt, "CartesianProduct")
    assert nlj == 0, f"{name} grew a nested-loop/cartesian node"


def test_dims_stay_broadcast_in_tpch_q5(spark):
    """Q5's four dim joins must all be BHJ; the only SMJ permitted is the
    fact-fact join (orders x lineitem) — none today."""
    txt = _plan(spark, "tpch_q5_local_supplier_revenue")
    assert _nodes(txt, "BroadcastHashJoin") >= 3
    assert _nodes(txt, "SortMergeJoin") <= 1


def test_q1_scan_prunes_columns(spark):
    """TPC-H Q1 reads 7 of lineitem's 11 columns — the ReadSchema must
    not contain the join keys it never touches."""
    txt = _plan(spark, "tpch_q1_pricing_summary")
    schemas = re.findall(r"ReadSchema: ([^\n]*)", txt)
    assert schemas, "no parquet scan found"
    for s in schemas:
        assert "l_orderkey" not in s and "l_partkey" not in s, s


def test_q6_pushes_every_predicate(spark):
    txt = _plan(spark, "tpch_q6_forecast_revenue")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", txt))
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, f"{frag} not pushed to scan"


def test_perplexity_gate_windows_consume_aggregates(spark):
    """The de-skew invariant, structurally: every Window node's subtree
    must contain a HashAggregate BELOW it closer than any parquet scan —
    i.e., windows run over histogram aggregates, never raw doc rows."""
    txt = _plan(spark, "unigram_perplexity_gate")
    # formatted explain: tree section first; for each Window detail id,
    # its input is the node it references. Cheap structural proxy: the
    # plan must contain at least one aggregate, and the number of Window
    # nodes must not exceed the number of aggregates feeding them.
    n_window = _nodes(txt, "Window")
    n_agg = _nodes(txt, "HashAggregate") + _nodes(txt, "SortAggregate") + _nodes(
        txt, "ObjectHashAggregate"
    )
    assert n_window >= 1 and n_agg >= 2 * n_window, (
        f"windows={n_window} aggregates={n_agg}: window no longer histogram-fed?"
    )


def test_catalog_wide_nlj_whitelist(spark):
    """Sweep a broad sample of the catalog: any query NOT on the allowed
    list must be NLJ/cartesian-free. (Full-catalog sweep lives in
    PLANS_AUDIT.md; this guards the invariant in CI at smoke scale.)"""
    from syntheticdata_pipeline__spark.plans import load_all

    registry = load_all()
    flagged = []
    raised = []
    for name in sorted(registry):
        if "stream" in name or name in _NLJ_ALLOWED:
            continue
        try:
            txt = _plan(spark, name)
        except Exception as e:
            raised.append(f"{name}: {type(e).__name__}")
            continue
        if _nodes(txt, "BroadcastNestedLoopJoin") + _nodes(txt, "CartesianProduct"):
            flagged.append(name)
    # A query whose build raises silently drops out of the NLJ guard, so
    # raising is itself a failure unless the query is on a known
    # env-gated list (currently empty: every batch query builds in this
    # container — the boto3/protobuf gates only affect non-catalog ops).
    known_env_gated: set[str] = set()
    unexpected = [r for r in raised if r.split(":")[0] not in known_env_gated]
    assert not unexpected, f"catalog builds raised (guard coverage lost): {unexpected}"
    assert not flagged, f"unlisted cartesian/NLJ in: {flagged}"
