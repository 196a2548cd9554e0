"""K3/K4 object-store sink: keyed idempotent PUT, error isolation, resume
scan (s3_uploader.py semantics on the container-testable LocalFSStore)."""

from __future__ import annotations

import pyspark.sql.functions as F

from syntheticdata_pipeline__spark.sources.objectstore import (
    LocalFSStore,
    existing_ids,
    upload_objects,
)


def _assets(spark, n=6):
    rows = [(i, f"generated_images/{i}/{i}.png", bytes([i]) * (i + 1)) for i in range(n)]
    return spark.createDataFrame(rows, "prompt_number long, key string, payload binary")


def test_upload_roundtrip_and_layout(spark, tmp_path):
    store = LocalFSStore(str(tmp_path))
    out = upload_objects(
        _assets(spark), lambda: LocalFSStore(str(tmp_path)), store_key=f"t1-{tmp_path}"
    )
    rows = out.collect()
    assert all(r.upload_ok == "ok" for r in rows)
    # reference key layout {prefix}/{prompt_number}/{prompt_number}.png
    assert store.get("generated_images/3/3.png") == b"\x03" * 4
    assert store.list_keys("generated_images") == [
        f"generated_images/{i}/{i}.png" for i in range(6)
    ]


def test_upload_idempotent_rerun(spark, tmp_path):
    """Re-running the same upload (retry/speculation) converges to the
    same store state — overwrite-by-key, the reference's S3 semantics."""
    factory = lambda: LocalFSStore(str(tmp_path))
    upload_objects(_assets(spark), factory, store_key=f"t2-{tmp_path}").collect()
    first = {k: LocalFSStore(str(tmp_path)).get(k) for k in LocalFSStore(str(tmp_path)).list_keys("")}
    upload_objects(_assets(spark), factory, store_key=f"t2-{tmp_path}").collect()
    second = {k: LocalFSStore(str(tmp_path)).get(k) for k in LocalFSStore(str(tmp_path)).list_keys("")}
    assert first == second and len(first) == 6


def test_upload_error_isolation(spark, tmp_path):
    class FlakyStore(LocalFSStore):
        def put(self, key, data):
            if "/2/" in key:
                raise OSError("simulated 503")
            super().put(key, data)

    out = upload_objects(
        _assets(spark), lambda: FlakyStore(str(tmp_path)), store_key=f"t3-{tmp_path}"
    )
    by_key = {r.key: r.upload_ok for r in out.collect()}
    assert by_key["generated_images/2/2.png"] == "error"
    assert sum(1 for v in by_key.values() if v == "ok") == 5


def test_resume_scan_anti_join(spark, tmp_path):
    """get_existing_prompts → anti-join: only unprocessed ids remain
    (the reference's resume path, s3_uploader.py:41-79)."""
    factory = lambda: LocalFSStore(str(tmp_path))
    done = _assets(spark).filter(F.col("prompt_number") < 3)
    upload_objects(done, factory, store_key=f"t4-{tmp_path}").collect()
    processed = existing_ids(spark, LocalFSStore(str(tmp_path)), "generated_images")
    pending = _assets(spark).join(
        processed, F.col("prompt_number") == F.col("done_id"), "left_anti"
    )
    assert sorted(r.prompt_number for r in pending.collect()) == [3, 4, 5]
