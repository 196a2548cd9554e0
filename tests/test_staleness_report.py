"""Pin the tier-0 bookkeeping: tools/staleness.py COMPUTES the
size/window/overflow numbers, and __spark_entry__.py's comment must not
hand-write them (r11 verdict "What's wrong" #2 — the r11 comment said
"overflow ... by 16" when the real overflow was 51).

No SparkSession needed — this exercises only the ordering metadata.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import __spark_entry__ as entry  # noqa: E402
import staleness  # noqa: E402

from syntheticdata_pipeline__spark.plans import load_all  # noqa: E402


def _ordered_names() -> list[str]:
    return entry._catalog_order(list(load_all()))


def test_changed_list_names_exist_in_registry():
    registry = set(load_all())
    unknown = [n for n in entry._CHANGED_THIS_ROUND if n not in registry]
    assert unknown == [], f"typo'd _CHANGED_THIS_ROUND entries: {unknown}"


def test_changed_list_has_no_duplicates():
    names = entry._CHANGED_THIS_ROUND
    assert len(names) == len(set(names))


def test_overflow_is_computed_not_hand_written():
    """The overflow must equal max(0, tier0 - WINDOW): tier-0 entries
    sort strictly first in _catalog_order, so exactly the list tail
    beyond WINDOW misses the window."""
    ordered = _ordered_names()
    changed = set(entry._CHANGED_THIS_ROUND)
    overflow = staleness.tier0_overflow(ordered, changed)
    expected_n = max(0, len(changed) - staleness.WINDOW)
    assert len(overflow) == expected_n
    # and the overflow is exactly the priority-list tail, in order
    assert overflow == list(entry._CHANGED_THIS_ROUND)[staleness.WINDOW :]


def test_summary_line_matches_computation():
    ordered = _ordered_names()
    changed = set(entry._CHANGED_THIS_ROUND)
    line = staleness.summary_line(ordered, changed)
    m = re.fullmatch(
        r"tier0: (\d+) rewritten-unchecked; window: (\d+); overflow: (\d+)", line
    )
    assert m, line
    assert int(m.group(1)) == len(changed)
    assert int(m.group(2)) == staleness.WINDOW
    assert int(m.group(3)) == len(staleness.tier0_overflow(ordered, changed))


def test_entry_comment_contains_no_hand_written_overflow():
    """The tier-0 comment block must defer to tools/staleness.py instead
    of asserting numeric size/window/overflow claims — r11's stale
    'overflow a 50-slot window by 16', and r12's equally stale 'any
    1-entry overflow' (the real overflow was 2; r12 ADVICE #1 flagged
    that the original regex missed this phrasing). Any numeric
    quantifier attached to 'overflow' in the block is a hand-written
    claim that staleness.py should own."""
    src = open(os.path.join(ROOT, "__spark_entry__.py")).read()
    block = src[: src.index("_CHANGED_THIS_ROUND = (")]
    assert "tools/staleness.py" in block
    assert not re.search(r"overflow[s]? a \d+-slot window by \d+", block)
    # numeric overflow claims in ANY phrasing: "1-entry overflow",
    # "overflow of 2", "overflow is 3", "2 entries overflow", ...
    assert not re.search(r"\b\d+[- ]entr(y|ies)?\s+overflow", block)
    assert not re.search(r"overflow\s+(of|is|=)\s*\d+", block)
    assert not re.search(r"\b\d+\s+entr(y|ies)\s+(will\s+)?overflow", block)


def test_tier0_entries_precede_all_other_tiers():
    ordered = _ordered_names()
    changed = set(entry._CHANGED_THIS_ROUND)
    n = len(changed)
    assert set(ordered[:n]) == changed


def test_tier0_entries_were_not_driver_checked_since_rewrite():
    """Round-14 pin: every tier-0 entry is either an r14 correctness fix
    (NULL-signature collapse family) or an r14 optimization rewrite
    (OPTIMIZATION_r14.md §1-§12) — none may appear in
    CORRECTNESS_r13.json unless it was rewritten again afterward
    (entries the r13 driver re-checked post-rewrite must leave the
    list or carry a justification below).

    Pinned to the correctness file that was CURRENT when this round's
    list was written (not "latest": the driver writes CORRECTNESS_r14
    at round end, after the list is frozen). Each round's list
    maintenance bumps this pin alongside the list itself.
    """
    pin = "CORRECTNESS_r13.json"
    # Queries legitimately REWRITTEN AGAIN after the pinned round's
    # check — each needs a DIVERGENCES.md or OPTIMIZATION_r14.md entry
    # justifying the rewrite. r14 is the optimization round: every
    # plan rewritten here is output-identical by construction (kernel
    # equivalence tests + 190/190 local oracle + sf0.1 re-checks), and
    # re-enters tier-0 so the driver re-verifies the rewritten plan.
    rewritten_after_pin: set[str] = {
        # r14 correctness fixes on r13-checked queries (ADVICE medium)
        "incremental_dedup_survivors",
        "ngram_jaccard_pairs",
        "ngram_jaccard_pruned",
        "simhash_hamming_pairs_q",
        # r14 optimization rewrites (OPTIMIZATION_r14.md §1-§12)
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
    }
    checked = set(json.load(open(os.path.join(ROOT, pin))))
    stale_greens = [
        n
        for n in entry._CHANGED_THIS_ROUND
        if n in checked and n not in rewritten_after_pin
    ]
    assert stale_greens == [], (
        f"{pin} already re-checked these post-rewrite; they must leave "
        f"_CHANGED_THIS_ROUND: {stale_greens}"
    )
