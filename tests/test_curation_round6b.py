"""Behavioral properties of the second round-6 operator batch (winnowing,
Bloom decontamination, intra-doc repetition, trained IVF, top-PC) — the
oracle twins prove cross-engine equality; these prove the operators do
what the papers say."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# Winnowing (Schleimer et al. 2003): every full window of w consecutive
# gram hashes must contain at least one selected position, and density
# stays near the 2/(w+1) theory value.
# --------------------------------------------------------------------------


def test_winnowing_window_guarantee(spark):
    from pyspark.sql import Window

    from syntheticdata_pipeline__spark.plans.common import T
    from syntheticdata_pipeline__spark.plans.docs_q import (
        _POS_BITS,
        _WIN_K,
        _WIN_W,
    )
    from syntheticdata_pipeline__spark.functions.text import tokens

    d = T(spark, SF, "documents").limit(50)
    seqs = d.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= _WIN_K
    )
    cnt = F.size("toks") - F.lit(_WIN_K - 1)
    zipped = F.arrays_zip(
        *[F.slice("toks", i + 1, cnt).alias(f"t{i}") for i in range(_WIN_K)]
    )
    grams = seqs.select("doc_id", F.posexplode(zipped).alias("pos", "s")).select(
        "doc_id",
        "pos",
        F.concat_ws(" ", *[F.col("s").getField(f"t{i}") for i in range(_WIN_K)]).alias(
            "gram"
        ),
    )
    h = grams.select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint").alias("hv"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_grams"),
    )
    lead = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    )
    wmin = h.select(
        "doc_id",
        "pos",
        "n_grams",
        F.min(F.col("hv") * F.lit(_POS_BITS) + F.col("pos")).over(lead).alias("comb"),
    ).filter(F.col("pos") <= F.col("n_grams") - _WIN_W)
    rows = wmin.select(
        "doc_id", "pos", (F.col("comb") % _POS_BITS).alias("sel_pos")
    ).collect()
    # guarantee: the selected position of window starting at p lies in
    # [p, p + w - 1] — i.e. every full window contains a selected gram.
    assert rows
    for r in rows:
        assert r.pos <= r.sel_pos <= r.pos + _WIN_W - 1
    # density sanity: distinct selected positions per doc ≈ 2n/(w+1).
    from collections import defaultdict

    sel, wins = defaultdict(set), defaultdict(int)
    for r in rows:
        sel[r.doc_id].add(r.sel_pos)
        wins[r.doc_id] += 1
    checked = 0
    for doc, n_win in wins.items():
        if n_win < 50:  # short docs select ~every window; theory is asymptotic
            continue
        checked += 1
        density = len(sel[doc]) / n_win
        assert 0.05 < density < 0.8  # theory 2/(w+1) ≈ 0.22 for w=8
    assert checked > 0


def test_winnowing_selected_counts_match_query(spark):
    from syntheticdata_pipeline__spark.plans.docs_q import winnowing_fingerprints

    out = winnowing_fingerprints(spark, SF).collect()
    assert out
    for r in out:
        assert 1 <= r.n_distinct_fp <= r.n_selected <= r.n_grams


# --------------------------------------------------------------------------
# Bloom decontamination: a Bloom filter has NO false negatives — every
# exactly-contaminated doc must also be bloom-flagged, per language.
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    from syntheticdata_pipeline__spark.plans.dataset_q import (
        bloom_decontaminate,
        decontaminate_train,
    )

    bl = {r.lang: r for r in bloom_decontaminate(spark, SF).collect()}
    ex = {r.lang: r for r in decontaminate_train(spark, SF).collect()}
    assert set(bl) == set(ex)
    for lang, b in bl.items():
        assert b.n_bloom_flagged >= b.n_contaminated
        # the exact-verify leg must agree with the standalone exact path
        assert b.n_contaminated == ex[lang].n_contaminated
        assert b.n_train == ex[lang].n_train


# --------------------------------------------------------------------------
# Intra-doc repetition: a constructed loop is found with the exact span.
# --------------------------------------------------------------------------


def test_intradoc_span_on_constructed_loop(spark, tmp_path):
    import os

    docs = spark.createDataFrame(
        [
            # "a b c d e" repeated: longest repeated span = 10 tokens
            # (positions 1-10 == 6-15 of the 3x loop)
            (0, "a b c d e a b c d e a b c d e", "en", "src0", 29),
            # no 3-gram repeats
            (1, "one two three four five six seven eight", "en", "src0", 39),
            # period-1 loop: "x x x x x x" → span 6 (overlapping)
            (2, "x x x x x x", "en", "src0", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "fixture")
    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    from syntheticdata_pipeline__spark.plans.docs_q import intradoc_repeated_span

    out = {r.doc_id: r for r in intradoc_repeated_span(spark, sf).collect()}
    assert set(out) == {0, 2}  # doc 1 has no repeat
    assert out[0].max_repeat_span == 10
    assert out[2].max_repeat_span == 5  # positions 1-5 == 2-6, span 5
