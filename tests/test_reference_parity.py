"""Parity tests against the reference's OWN committed output fixtures
(read-only at /root/reference) — the de-facto goldens SURVEY §5.1 names:

- vton_gallery_dataset/metadata/*.json  (product_metadata records)
- vton_zalando_dataset/metadata/*.json  (vton_pair records)
- vton_gallery_dataset/progress/scraper_progress.json (checkpoint)
- website_accessibility_results/website_categorization.json (survey golden)

The engine's schemas must read these verbatim, its id-extraction rules
must reproduce the reference's keying, and the resume flow must compute
the same remaining-work set the reference would.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from syntheticdata_pipeline__spark.functions.text import (
    extract_image_id,
    extract_product_id,
)
from syntheticdata_pipeline__spark.operators.dedup import anti_join_state
from syntheticdata_pipeline__spark.schemas import PRODUCT_METADATA, PROGRESS_CHECKPOINT

_REF = "/root/reference"
_GALLERY_META = f"{_REF}/vton_scraper/vton_gallery_dataset/metadata"
_PAIR_META = f"{_REF}/vton_scraper/vton_zalando_dataset/metadata"
_PROGRESS = f"{_REF}/vton_scraper/vton_gallery_dataset/progress/scraper_progress.json"
_CATEGORIZATION = f"{_REF}/website_accessibility_results/website_categorization.json"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_GALLERY_META), reason="reference fixtures not present"
)


def _read_gallery(spark):
    return (
        spark.read.schema(PRODUCT_METADATA)
        .option("multiLine", True)
        .json(f"{_GALLERY_META}/*.json")
    )


def test_product_metadata_schema_reads_reference_goldens(spark):
    """PRODUCT_METADATA (any_scraper.py:764-774) parses every committed
    gallery record with no corrupt rows."""
    df = _read_gallery(spark)
    n_files = len(glob.glob(f"{_GALLERY_META}/*.json"))
    assert df.count() == n_files > 0
    assert df.filter(F.col("product_id").isNull()).count() == 0
    assert df.filter(F.size("images") < 1).count() == 0


def test_t1_reproduces_reference_product_keying(spark):
    """extract_product_id must reproduce the reference's own product_id
    for every committed record (zalando .html slug rule,
    zalando_gallery_scraper_s3.py:197-202)."""
    df = _read_gallery(spark).select(
        "product_id", extract_product_id(F.col("url")).alias("derived")
    )
    mismatches = df.filter(F.col("product_id") != F.col("derived")).collect()
    assert mismatches == []


def test_t3_extracts_media_hash_ids_from_reference_urls(spark):
    """The gallery image URLs carry 32-hex media hashes — the reference's
    dedup keys (any_scraper.py:209-222). T3 must find them on every image."""
    imgs = _read_gallery(spark).select(F.explode("images").alias("img"))
    ids = imgs.select(extract_image_id(F.col("img.url")).alias("img_id"))
    assert ids.filter(~F.col("img_id").rlike("^[a-f0-9]{32,}$")).count() == 0


def test_reference_image_indexes_are_first_wins_order(spark):
    """Image indexes are assigned in insertion order starting at 0
    (any_scraper.py:584-603). Note: the reference assigns the index BEFORE
    download validation, so a failed download leaves a hole (one committed
    product has indexes {0,1,2,4}) — the invariant that holds is
    min==0 + strictly increasing + distinct, not dense."""
    imgs = _read_gallery(spark).select(
        "product_id", F.explode("images").alias("img")
    ).select("product_id", F.col("img.index").alias("idx"))
    per_product = imgs.groupBy("product_id").agg(
        F.min("idx").alias("mn"),
        F.count("*").alias("n"),
        F.countDistinct("idx").alias("n_distinct"),
    )
    bad = per_product.filter(
        (F.col("mn") != 0) | (F.col("n") != F.col("n_distinct"))
    ).collect()
    assert bad == []


def test_progress_checkpoint_schema_and_resume_flow(spark):
    """R2 on the reference's real checkpoint: PROGRESS_CHECKPOINT reads
    the progress JSON; anti-joining its scraped_urls against the committed
    metadata reproduces the remaining-work set."""
    ckpt = (
        spark.read.schema(PROGRESS_CHECKPOINT)
        .option("multiLine", True)
        .json(_PROGRESS)
    )
    row = ckpt.collect()[0]
    assert row.items_scraped == len(row.scraped_urls) > 0

    state = ckpt.select(F.explode("scraped_urls").alias("url"))
    work = _read_gallery(spark).select("url", "product_id")
    remaining = anti_join_state(work, state, ["url"])
    assert remaining.count() == work.count() - row.items_scraped
    # and none of the remaining were in the state
    overlap = remaining.join(state, "url").count()
    assert overlap == 0


def test_accessibility_categorization_matches_golden_counts(spark):
    """A4 golden: per-category site counts must equal the reference's
    committed website_categorization.json (3/30/14/4/13 …,
    BASELINE.md site-survey table)."""
    raw = spark.read.text(_CATEGORIZATION, wholetext=True)
    parsed = raw.select(
        F.from_json(F.col("value"), "map<string,array<string>>").alias("m")
    )
    counts = (
        parsed.select(F.explode("m").alias("category", "sites"))
        .select("category", F.size("sites").alias("n"))
        .collect()
    )
    got = {r.category: r.n for r in counts}
    assert got["accessible_and_scrapeable"] == 3
    assert got["blocked_by_captcha"] == 30
    assert got["blocked_by_login"] == 14
    assert got["blocked_by_access_denied"] == 4
    assert got["failed_timeout"] == 13
