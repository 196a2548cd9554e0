"""The identical-set collapse must be a pure plan optimization: pair
output with collapse on == off, on a corpus with planted exact
duplicates, fuzzed near-duplicates, and degenerate docs."""

from __future__ import annotations

import random

import pytest

from syntheticdata_pipeline__spark.operators.neardup import (
    jaccard_pairs_inverted,
    simhash_hamming_pairs,
)


@pytest.fixture(scope="module")
def dup_corpus(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = []
    doc_id = 0
    for base in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        text = " ".join(words)
        # exact replicas (1-4 copies) — the case the collapse targets
        for _ in range(rng.randint(1, 4)):
            rows.append((doc_id, text, "xx"))
            doc_id += 1
        # a near-duplicate: one word changed
        if len(words) > 2:
            mutated = list(words)
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            rows.append((doc_id, " ".join(mutated), "xx"))
            doc_id += 1
    # degenerate docs: empty and single-word
    rows.append((doc_id, "", "xx"))
    rows.append((doc_id + 1, "", "xx"))
    rows.append((doc_id + 2, "solo", "xx"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_jaccard_collapse_equivalence(dup_corpus):
    on = jaccard_pairs_inverted(dup_corpus, collapse_identical=True)
    off = jaccard_pairs_inverted(dup_corpus, collapse_identical=False)
    got, want = _pairs(on), _pairs(off)
    assert got == want and len(want) > 0


def test_jaccard_collapse_equivalence_with_df_cap(dup_corpus):
    on = jaccard_pairs_inverted(dup_corpus, collapse_identical=True, df_cap=3)
    off = jaccard_pairs_inverted(dup_corpus, collapse_identical=False, df_cap=3)
    assert _pairs(on) == _pairs(off)


def test_simhash_collapse_equivalence(dup_corpus):
    on = simhash_hamming_pairs(dup_corpus, collapse_identical=True)
    off = simhash_hamming_pairs(dup_corpus, collapse_identical=False)
    got, want = _pairs(on), _pairs(off)
    assert got == want and len(want) > 0
