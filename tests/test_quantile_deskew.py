"""Oracle-scale verifiers for the de-skewed quantile family.

The production plans compute per-lang quantile thresholds on the
per-(lang, value) HISTOGRAM (count → running-sum CDF → broadcast
threshold), never ranking per-doc rows in a per-lang window. These tests
prove, at test scale, that the histogram form is EQUAL to the per-doc
window form it replaced — the window form stays here as the verifier,
off the production path (VERDICT r5 "next round" #1).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_perplexity_threshold_equals_cume_dist_window(spark):
    """keep == (logprob >= q1) where q1 from the histogram CDF must equal
    the per-doc cume_dist window definition: q1 = min logprob whose
    cume_dist (= count(<=)/n per lang) reaches 0.25."""
    from syntheticdata_pipeline__spark.plans.docs_q import unigram_perplexity_gate

    prod = unigram_perplexity_gate(spark, SF_SMOKE).cache()
    scored = prod.select("doc_id", "lang", "logprob")

    w = Window.partitionBy("lang").orderBy("logprob")
    q1_window = (
        scored.withColumn("cd", F.cume_dist().over(w))
        .filter(F.col("cd") >= 0.25)
        .groupBy("lang")
        .agg(F.min("logprob").alias("q1"))
    )
    window_form = (
        scored.join(q1_window, "lang")
        .select("doc_id", (F.col("logprob") >= F.col("q1")).alias("keep_w"))
    )
    diff = (
        prod.select("doc_id", "keep")
        .join(window_form, "doc_id")
        .filter(F.col("keep") != F.col("keep_w"))
        .count()
    )
    assert diff == 0

    # gate semantics: drops at most 25% per lang, and drops something
    # whenever the language has >= 4 distinct score values
    frac = (
        prod.groupBy("lang")
        .agg(
            F.avg(F.col("keep").cast("double")).alias("kept"),
            F.countDistinct("logprob").alias("nv"),
        )
        .collect()
    )
    assert frac
    for r in frac:
        assert r["kept"] >= 0.75 - 1e-9
        if r["nv"] >= 4:
            assert r["kept"] < 1.0
    prod.unpersist()


def test_length_quartiles_equal_per_doc_window_form(spark):
    """Histogram-level tile rollup must equal assigning each doc its tile
    via a per-doc window (count of strictly-smaller same-lang lengths via
    a RANGE frame) and rolling up."""
    from syntheticdata_pipeline__spark.plans.quality_q import doc_length_quartiles
    from syntheticdata_pipeline__spark.session import ensure_runtime_confs

    # pin the session confs BEFORE building either side: the prod side
    # applies them inside T() but the hand-built reference side would
    # otherwise run under whatever a prior suite left set — the one
    # suspected leak channel for the open r11 flake (DIVERGENCES.md
    # "Open flake: quantile-deskew window form", r11 ADVICE #3)
    ensure_runtime_confs(spark)
    prod = doc_length_quartiles(spark, SF_SMOKE)

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    n = d.groupBy("lang").agg(F.count("*").alias("n_lang"))
    per_doc = (
        d.withColumn("cum_lt", F.coalesce(F.count("*").over(w), F.lit(0)))
        .join(n, "lang")
        .withColumn(
            "quartile",
            F.least(
                F.lit(4).cast("bigint"),
                F.floor(F.lit(4.0) * F.col("cum_lt") / F.col("n_lang")) + 1,
            ).cast("int"),
        )
        .groupBy("lang", "quartile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )
    only_prod = prod.exceptAll(per_doc).collect()
    only_ref = per_doc.exceptAll(prod).collect()
    # one unexplained in-suite failure (r11 closing gates: sym_diff=20 —
    # EVERY tile row differed — while solo runs and the pure-python
    # recompute of both forms agree exactly); dump both sides so a
    # recurrence is diagnosable instead of a bare count.
    assert not only_prod and not only_ref, (
        f"prod-only={sorted(map(tuple, only_prod))} "
        f"ref-only={sorted(map(tuple, only_ref))}"
    )
    # every (lang) has tiles covering 1..4 unless tie-collapsed; at least
    # tile 1 and the clamp tile 4 exist for every lang in this fixture
    tiles = {(r["lang"], r["quartile"]) for r in prod.collect()}
    langs = {t[0] for t in tiles}
    for lang in langs:
        assert (lang, 1) in tiles and (lang, 4) in tiles
