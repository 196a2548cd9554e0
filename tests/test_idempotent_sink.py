"""Idempotent keyed-overwrite sink: replaying a batch (task retry / rerun)
must not duplicate records, and — since round 11 — a PARTIAL batch must
replace exactly its keys, like the reference's per-product_id file
overwrite (any_scraper.py:776), not its keys' whole hash buckets."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.sources.readers import write_keyed_overwrite


def test_replay_does_not_duplicate(spark, tmp_path):
    path = str(tmp_path / "keyed")
    batch1 = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "product_id long, payload string"
    )
    write_keyed_overwrite(batch1, path, "product_id", n_buckets=8)
    assert spark.read.parquet(path).count() == 20

    # replay the identical batch (simulates a retried/duplicated run)
    write_keyed_overwrite(batch1, path, "product_id", n_buckets=8)
    back = spark.read.parquet(path)
    assert back.count() == 20
    assert back.select("product_id").distinct().count() == 20


def test_partial_batch_replaces_only_its_keys(spark, tmp_path):
    # the round-11 upsert contract: the reference overwrites per KEY, so
    # a one-key update batch must leave every other key intact — keys
    # sharing the updated key's hash bucket included (the pre-r11
    # bucket-replace semantics silently deleted those).
    path = str(tmp_path / "keyed2")
    batch1 = spark.createDataFrame(
        [(i, "old") for i in range(20)], "product_id long, payload string"
    )
    write_keyed_overwrite(batch1, path, "product_id", n_buckets=8)

    update = spark.createDataFrame(
        [(0, "new")], "product_id long, payload string"
    )
    write_keyed_overwrite(update, path, "product_id", n_buckets=8)
    vals = {r.product_id: r.payload for r in spark.read.parquet(path).collect()}
    assert len(vals) == 20
    assert vals[0] == "new"
    assert all(vals[k] == "old" for k in range(1, 20))


def test_bucket_replace_fast_path_contract(spark, tmp_path):
    # upsert=False is the no-read retry path: a partial batch replaces
    # its buckets wholesale — pinned so the sharper contract stays
    # visible and deliberate.
    path = str(tmp_path / "keyed3")
    batch1 = spark.createDataFrame(
        [(i, "old") for i in range(20)], "product_id long, payload string"
    )
    write_keyed_overwrite(batch1, path, "product_id", n_buckets=8, upsert=False)
    update = spark.createDataFrame([(0, "new")], "product_id long, payload string")
    write_keyed_overwrite(update, path, "product_id", n_buckets=8, upsert=False)

    back = spark.read.parquet(path)
    vals = {r.product_id: r.payload for r in back.collect()}
    assert vals[0] == "new"
    from syntheticdata_pipeline__spark.functions.determinism import hash_bucket

    buckets = {
        r.product_id: r.b
        for r in batch1.select(
            "product_id", hash_bucket(F.col("product_id"), 8).alias("b")
        ).collect()
    }
    untouched = [k for k, b in buckets.items() if b != buckets[0]]
    assert sorted(vals) == sorted([0, *untouched])


def test_upsert_null_key_replaces_not_duplicates(spark, tmp_path):
    # NULL keys must merge null-safely: a NULL-key batch row REPLACES the
    # stored NULL-key row (eqNullSafe), instead of NULL != NULL skipping
    # the anti-join and duplicating it.
    path = str(tmp_path / "keyed4")
    b1 = spark.createDataFrame(
        [(None, "old-null"), (1, "one")], "product_id long, payload string"
    )
    write_keyed_overwrite(b1, path, "product_id", n_buckets=4)
    b2 = spark.createDataFrame([(None, "new-null")], "product_id long, payload string")
    write_keyed_overwrite(b2, path, "product_id", n_buckets=4)

    rows = sorted(
        ((r.product_id, r.payload) for r in spark.read.parquet(path).collect()),
        key=lambda t: (t[0] is not None, t[0]),
    )
    assert rows == [(None, "new-null"), (1, "one")]
