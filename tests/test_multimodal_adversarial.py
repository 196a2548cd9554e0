"""Multimodal (binary-column) adversarial battery — hostile payloads
through every mapInPandas kernel in operators/multimodal.py, the one
kernel family the NULL/empty/non-finite sweeps could not reach via a
DuckDB twin (binary columns have no oracle; the contract is pinned
engine-side instead, FIXTURES.md pattern).

Reference anchors: the download validator treats empty/failed payloads
as invalid (any_scraper.py:301-318), and the resize path re-raises on
undecodable images (image_utils.py:31-36).

Contracts pinned here:

- **NULL and empty payloads are 'corrupt', never 'ok'** through both
  decode_images and resize_images: they are detectably invalid without
  any codec, so the no-PIL fake must not launder them into a green
  decode (found by this battery — both kernels previously routed them
  to the deterministic fake / 'unsupported').
- **A payload that declares the P6 magic but fails to parse is
  'corrupt', not 'unsupported'**: 'unsupported' is reserved for formats
  this build has no codec for; a claimed-PPM that the real
  container-native codec rejects is a decode failure on any path.
- **ssim_pairs returns NULL, not NaN and not a task failure, for
  undefined inputs**: NULL side, empty arrays, mismatched lengths
  (previously a numpy broadcasting ValueError that killed the task),
  or any non-finite component — mirroring the r9 valid-vector /
  non-finite rule (bad measurements skip like NULL).
- **decode_ppm rejects, without allocating, every malformed header**:
  wrong magic, maxval != 255, zero dims, truncated raster, and
  billion-pixel declared dims backed by a tiny raster; trailing junk
  after the exact raster is tolerated (netpbm readers accept it).
- **Fan-out kernels never crash on NULL/short payloads**: sample_frames
  emits exactly n_frames rows per input row regardless, and
  extract_features stays a deterministic unit vector (NULL == empty
  payload).
"""

from __future__ import annotations

import math

import pytest

from syntheticdata_pipeline__spark.operators.multimodal import (
    bilinear_resize,
    decode_images,
    decode_ppm,
    encode_ppm,
    extract_features,
    resize_images,
    sample_frames,
    ssim_pairs,
)


def _ppm(w: int, h: int, val: int = 50) -> bytes:
    import numpy as np

    return encode_ppm(np.full((h, w, 3), val, dtype=np.uint8))


# --- decode_ppm header hostility (no Spark needed) --------------------------


def test_decode_ppm_rejects_malformed_headers():
    assert decode_ppm(b"") is None
    assert decode_ppm(b"P6") is None
    assert decode_ppm(b"P6\n") is None
    assert decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4) is None  # PGM magic
    assert decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24) is None  # 16-bit
    assert decode_ppm(b"P6\n0 0\n255\n") is None  # zero dims
    assert decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 11) is None  # short raster


def test_decode_ppm_huge_declared_dims_reject_fast():
    # a 1-billion-pixel header backed by 12 bytes must return None without
    # trying to materialize the declared raster
    assert decode_ppm(b"P6\n100000 10000\n255\n" + b"\x00" * 12) is None


def test_decode_ppm_comment_header_and_trailing_junk():
    import numpy as np

    data = b"P6\n# a comment\n3 2\n255\n" + bytes(range(18))
    arr = decode_ppm(data)
    assert arr is not None and arr.shape == (2, 3, 3)
    # trailing junk after the exact raster is tolerated (netpbm convention)
    arr2 = decode_ppm(_ppm(3, 2) + b"JUNKJUNK")
    assert arr2 is not None and (arr2 == 50).all()
    assert np.array_equal(arr2.shape, (2, 3, 3))


# --- decode_images under hostile payloads -----------------------------------


def test_decode_images_null_empty_and_malformed_p6_are_corrupt(spark):
    rows = [
        (1, None),  # NULL payload
        (2, bytearray(b"")),  # empty payload
        (3, bytearray(b"P6\n2 2\n255\nxx")),  # claimed P6, truncated raster
        (4, bytearray(_ppm(4, 3))),  # valid P6
        (5, bytearray(b"opaque-jpeg-ish")),  # unknown format → fake path
    ]
    df = spark.createDataFrame(rows, "asset_id long, content binary")
    out = {r.asset_id: r for r in decode_images(df).collect()}
    for aid in (1, 2, 3):
        assert out[aid].decode_ok == "corrupt", aid
        assert out[aid].width is None and out[aid].height is None
    assert (out[4].width, out[4].height, out[4].decode_ok) == (4, 3, "ok")
    assert out[5].decode_ok == "ok" and out[5].width >= 400  # deterministic fake


# --- resize_images under hostile payloads -----------------------------------


def test_resize_images_null_empty_and_malformed_p6_are_corrupt(spark):
    rows = [
        (1, None),
        (2, bytearray(b"")),
        (3, bytearray(b"P6\n9 9\n255\nshort")),
        (4, bytearray(_ppm(8, 8, val=200))),
        (5, bytearray(b"not-an-image")),
    ]
    df = spark.createDataFrame(rows, "asset_id long, content binary")
    out = {r.asset_id: r for r in resize_images(df, width=4, height=4).collect()}
    for aid in (1, 2, 3):
        assert out[aid].resize_ok == "corrupt", aid
        assert out[aid].width is None
    # corrupt payloads pass through untouched (NULL → empty bytes)
    assert bytes(out[3].content) == b"P6\n9 9\n255\nshort"
    assert out[4].resize_ok == "ok"
    arr = decode_ppm(bytes(out[4].content))
    assert arr.shape == (4, 4, 3) and (arr == 200).all()
    assert out[5].resize_ok == "unsupported"
    assert bytes(out[5].content) == b"not-an-image"


def test_bilinear_resize_1x1_input_upscales_solid():
    import numpy as np

    px = np.array([[[7, 8, 9]]], dtype=np.uint8)
    out = bilinear_resize(px, 16, 16)
    assert out.shape == (16, 16, 3)
    assert (out == [7, 8, 9]).all()


# --- ssim_pairs under undefined inputs --------------------------------------


def test_ssim_pairs_undefined_inputs_yield_null(spark):
    base = [float(i) / 32 - 1.0 for i in range(64)]
    rows = [
        (1, base, base),  # valid: exactly 1.0
        (2, None, base),  # NULL left
        (3, base, None),  # NULL right
        (4, [], []),  # empty both
        (5, base, base[:32]),  # mismatched lengths (was a task-killing crash)
        (6, base, base[:1] + [float("nan")] + base[2:]),  # NaN component
        (7, base, base[:1] + [float("inf")] + base[2:]),  # Inf component
    ]
    df = spark.createDataFrame(
        rows, "pid long, a array<double>, b array<double>"
    )
    out = {r.pid: r.ssim for r in ssim_pairs(df, "a", "b").collect()}
    assert out[1] == pytest.approx(1.0, abs=1e-9)
    for pid in (2, 3, 4, 5, 6, 7):
        assert out[pid] is None, pid
    # NULL, never NaN — the engine-wide non-finite contract
    assert not any(v is not None and math.isnan(v) for v in out.values())


def test_ssim_pairs_constant_images_are_self_similar(spark):
    # zero-variance inputs: the stabilizing constants keep SSIM(x, x) = 1
    # instead of 0/0
    flat = [0.25] * 16
    df = spark.createDataFrame([(1, flat, flat)], "pid long, a array<double>, b array<double>")
    assert ssim_pairs(df, "a", "b").collect()[0].ssim == pytest.approx(1.0)


# --- fan-out kernels under NULL/short payloads ------------------------------


def test_sample_frames_null_and_short_payloads(spark):
    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b"ab")), (3, bytearray(bytes(range(8))))],
        "asset_id long, content binary",
    )
    frames = sample_frames(df, n_frames=4).collect()
    # exactly n_frames rows per input row, crash-free
    by_id = {}
    for r in frames:
        by_id.setdefault(r.asset_id, []).append(r)
    assert {k: len(v) for k, v in by_id.items()} == {1: 4, 2: 4, 3: 4}
    assert all(len(bytes(r.frame_bytes)) == 0 for r in by_id[1])  # NULL → empty frames
    # 2-byte payload, 4 frames: step=1 → b"a", b"b", b"", b""
    two = sorted(by_id[2], key=lambda r: r.frame_index)
    assert [bytes(r.frame_bytes) for r in two] == [b"a", b"b", b"", b""]


def test_extract_features_null_equals_empty_payload(spark):
    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b""))], "asset_id long, content binary"
    )
    out = {r.asset_id: r.features for r in extract_features(df, dim=8).collect()}
    assert out[1] == out[2]  # NULL and empty digest identically
    norm = sum(x * x for x in out[1]) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-5)
