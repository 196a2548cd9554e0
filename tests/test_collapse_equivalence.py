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


def test_separator_in_element_never_collides(spark):
    """r15 (r14 ADVICE high): a \\x01 INSIDE a token must not make two
    distinct sets fingerprint identically. Before the length-prefixed
    encoding, {'abcd\\x01efgh'} and {'abcd','efgh'} encoded to the same
    md5, collapsed into one group, and emitted a phantom jac=1.0 pair
    the base equi-join can never produce."""
    from pyspark.sql import functions as F

    from syntheticdata_pipeline__spark.operators.neardup import (
        collapse_identical_sets,
    )

    rows = [
        (0, ["abcd\x01efgh"]),
        (1, ["abcd", "efgh"]),
        # positive control: truly identical sets still collapse
        (2, ["abcd", "efgh"]),
        # more forgery shapes: empty vs ['']; prefix-ambiguous splits
        (3, [""]),
        (4, ["", ""]),
        (5, ["1:a"]),
        (6, ["a"]),
    ]
    df = spark.createDataFrame(rows, "id long, sh array<string>")
    groups = collapse_identical_sets(df, id_col="id", set_col="sh").collect()
    by_rep = {r["id"]: sorted(r["members"]) for r in groups}
    assert by_rep[1] == [1, 2]  # identical sets still collapse
    assert by_rep[0] == [0]  # the forged set stays its own group
    assert by_rep[3] == [3] and by_rep[4] == [4]
    assert by_rep[5] == [5] and by_rep[6] == [6]
    assert len(groups) == 6


def test_collapse_equivalence_under_separator_texts(spark):
    """End-to-end: docs whose TEXT contains \\x01 (so shingles carry it)
    must produce identical pair sets with the collapse on and off."""
    rows = [
        (0, "abcd\x01efgh w x", "xx"),
        (1, "abcd efgh w x", "xx"),
        (2, "abcd efgh w x", "xx"),
        (3, "q r s t", "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    on = jaccard_pairs_inverted(df, collapse_identical=True, threshold=0.01)
    off = jaccard_pairs_inverted(df, collapse_identical=False, threshold=0.01)
    assert _pairs(on) == _pairs(off) and len(_pairs(off)) > 0
