"""Span-merge semantics for the positional substring-duplication query:
adjacent shared 8-grams must merge into one maximal span (Lee et al. 2021),
and identical docs must collapse/re-expand to span = full doc length."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _words(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def span_docs(spark, tmp_path_factory):
    shared12 = _words(12, "s")          # a 12-token shared run
    shared8 = _words(8, "x")            # an exactly-8-token shared run
    rows = [
        # pair (1,2): doc1 embeds shared12 mid-document → max span 12
        (1, "en", f"{_words(5, 'a')} {shared12} {_words(4, 'b')}"),
        (2, "en", f"{_words(3, 'c')} {shared12} {_words(6, 'd')}"),
        # pair (3,4): exactly one 8-gram shared → max span 8
        (3, "en", f"{shared8} {_words(7, 'e')}"),
        (4, "en", f"{_words(9, 'f')} {shared8}"),
        # 5 is an exact duplicate of 1 → collapse; span(1,5)=len(doc1)=21
        (5, "en", f"{_words(5, 'a')} {shared12} {_words(4, 'b')}"),
        # 6: same tokens as shared12 but in another lang → never pairs
        (6, "de", f"{_words(2, 'g')} {shared12} {_words(2, 'h')}"),
        # 7: too short for a full 8-gram → never pairs
        (7, "en", _words(7, "s")),
    ]
    d = tmp_path_factory.mktemp("spans")
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df = df.withColumn("n_chars", F.length("text")).withColumn(
        "source", F.lit("t")
    )
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_max_span_merges_adjacent_grams(spark, span_docs):
    from syntheticdata_pipeline__spark.plans.docs_q import substring_max_span

    out = {
        (r["id_a"], r["id_b"]): r["max_span_tokens"]
        for r in substring_max_span(spark, span_docs).collect()
    }
    assert out[(1, 2)] == 12          # 5 overlapping 8-grams merged, not 8
    assert out[(3, 4)] == 8           # single 8-gram stays 8
    assert out[(1, 5)] == 21          # identical docs: whole doc
    assert out[(2, 5)] == 12          # re-expanded member inherits rep span
    assert all(k[0] != 6 and k[1] != 6 for k in out)   # cross-lang never pairs
    assert all(k[0] != 7 and k[1] != 7 for k in out)   # short doc never pairs
    assert set(out) == {(1, 2), (3, 4), (1, 5), (2, 5)}


def test_dup_removal_first_wins_and_interval_union(spark, span_docs):
    from syntheticdata_pipeline__spark.plans.docs_q import substring_dup_removal

    out = {r["lang"]: r.asDict() for r in substring_dup_removal(spark, span_docs).collect()}
    en = out["en"]
    # docs 1..5 + 7 are en; doc 7 (<8 tokens) can never be flagged, doc 1
    # is the earliest owner of both shared runs it contains
    assert en["n_docs"] == 6
    # affected: 2 (shared12 seen in doc 1), 4 (shared8 seen in doc 3),
    # 5 (exact dup of 1)
    assert en["n_docs_affected"] == 3
    # doc 2 loses the 12 shared tokens, doc 4 loses 8, doc 5 loses all 21
    assert en["tokens_removed"] == 12 + 8 + 21
    # de doc 6 is alone in its lang: nothing removed
    assert out["de"]["n_docs_affected"] == 0 and out["de"]["tokens_removed"] == 0
