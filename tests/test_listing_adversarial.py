"""Round-12 hostile-filename battery for the S3-analog binary listing
scan (S3, operators/multimodal.py::read_binary_dir — Spark's
``binaryFile`` source). The reference lists with os.listdir / S3
ListObjects (image_utils.py:50-73, s3_uploader.py:40-79), which see
EVERY object; the Spark source has two visibility gaps a scraping
pipeline must know about:

1. **Zero-byte files are silently invisible** (pinned, fix QUEUED
   r12 → r13, DIVERGENCES.md "Queued fix: zero-byte files invisible to
   the binary listing"): Spark's FilePartition planner drops 0-length
   files before tasks exist, so a truncated/failed download can never
   be counted, flagged invalid by the F-family validity predicates, or
   seen by a listing-based resume — the reference's listing sees it.
2. **The path glob is case-sensitive** (pinned as the documented Spark
   contract): the default ``*.jpg`` excludes ``B.JPG``; callers
   scanning scraped dirs must pass an explicit case set.

Everything else round-trips: newlines, spaces, unicode, and percent
sequences in filenames; an empty directory lists zero rows; a MISSING
directory fails loudly (PATH_NOT_FOUND) rather than listing empty —
resume logic can distinguish "nothing there" from "wrong path".
"""

from __future__ import annotations

import os

import pytest

from syntheticdata_pipeline__spark.operators.multimodal import read_binary_dir


def _touch(d, name: str, payload: bytes = b"x") -> None:
    with open(os.path.join(d, name), "wb") as f:
        f.write(payload)


def test_hostile_filenames_round_trip(spark, tmp_path):
    d = str(tmp_path)
    names = ["normal.jpg", "café 中文.jpg", "a b.jpg", "new\nline.jpg", "pct%2F.jpg"]
    for n in names:
        _touch(d, n, b"payload-" + n.encode())
    rows = read_binary_dir(spark, d).collect()
    # paths come back VERBATIM (no URL encoding) — a literal '%2F' in a
    # filename must stay '%2F', never decode to '/'
    got = {os.path.basename(r.path) for r in rows}
    assert got == set(names)
    assert all(r.n_bytes > 0 and r.content is not None for r in rows)


def test_zero_byte_file_listed_after_fix(spark, tmp_path):
    """FLIPPED r13 (queued fix #8): the binaryFile source plans no read
    for a 0-byte file, so a truncated download used to be absent from
    the listing. The Hadoop-FS glob twin now unions it back with
    content=NULL / n_bytes=0 — visible as an INVALID asset, not unseen."""
    d = str(tmp_path)
    _touch(d, "empty.jpg", b"")
    _touch(d, "one.jpg", b"x")
    rows = read_binary_dir(spark, d).collect()
    byname = {os.path.basename(r.path): r for r in rows}
    assert set(byname) == {"one.jpg", "empty.jpg"}
    assert byname["empty.jpg"].n_bytes == 0
    assert byname["empty.jpg"].content is None
    assert byname["one.jpg"].n_bytes == 1


def test_zero_byte_hidden_files_stay_hidden(spark, tmp_path):
    """r14 (ADVICE): raw globStatus does not apply Spark's hidden-file
    rule, so a zero-byte '_'- or '.'-prefixed file matching the glob
    used to be unioned into the listing even though Spark excludes such
    names at ANY size. The twin now applies the same basename filter."""
    d = str(tmp_path)
    _touch(d, "real.jpg", b"x")
    _touch(d, "_SUCCESS.jpg", b"")
    _touch(d, ".hidden.jpg", b"")
    _touch(d, "empty.jpg", b"")
    listed = {os.path.basename(r.path) for r in read_binary_dir(spark, d).collect()}
    assert listed == {"real.jpg", "empty.jpg"}


def test_zero_byte_modified_at_is_session_tz_instant(spark, tmp_path):
    """r14 (ADVICE): the twin's modified_at was datetime.fromtimestamp —
    naive SYSTEM-zone wallclock, which Spark re-interprets in the session
    timezone, skewing the instant whenever the two zones differ. Built
    from epoch millis via a Spark cast, the instant survives any session
    timezone: casting the timestamp back to epoch seconds must agree
    with the file's real mtime for the zero-byte row exactly as it does
    for the binaryFile row."""
    import pyspark.sql.functions as F

    d = str(tmp_path)
    _touch(d, "full.jpg", b"x")
    _touch(d, "empty.jpg", b"")
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")  # UTC+14
    try:
        rows = read_binary_dir(spark, d).select(
            "path", F.col("modified_at").cast("long").alias("epoch_s")
        ).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    for r in rows:
        true_mtime = os.path.getmtime(r.path.replace("file:", ""))
        assert abs(r.epoch_s - true_mtime) < 5, r.path


def test_glob_is_case_sensitive_pinned(spark, tmp_path):
    d = str(tmp_path)
    for n in ("a.jpg", "B.JPG", "c.jpeg", "d.png"):
        _touch(d, n)
    listed = {os.path.basename(r.path) for r in read_binary_dir(spark, d).collect()}
    assert listed == {"a.jpg"}  # documented contract: pass explicit case sets


def test_empty_dir_lists_zero_rows(spark, tmp_path):
    assert read_binary_dir(spark, str(tmp_path)).count() == 0


def test_missing_dir_fails_loudly(spark, tmp_path):
    """Resume logic must be able to distinguish 'nothing scraped yet'
    (empty dir → 0 rows) from 'wrong path' (loud failure)."""
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        read_binary_dir(spark, str(tmp_path / "nope")).count()
