"""Multimodal (binary) columns: decode / feature-extract / resize /
frame-sample plumbing (SURVEY.md §2.11).

Images/audio/video are opaque ``BinaryType`` columns with typed metadata,
processed by Arrow-batched Pandas UDFs over ``mapInPandas``. The image
codecs are NOT in this container, so the decode kernels are deterministic
fakes behind ``_HAVE_PIL`` gates — the Spark-side plumbing (schema,
partition sizing, batch shape, UDF signatures) is real and tested, which
is the part that matters for the 100 TB plan: binary payloads never pass
through the driver and never blow a single Arrow batch (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``).

Reference anchors: image download/validate any_scraper.py:267-330 (S6),
min-res/aspect predicates image_utils.py:12-29 (F1/F2), base64 transport
qwen_vl_processor.py:29-32 (T13).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codec gate — not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

IMAGE_META = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("content", BinaryType()),
        StructField("content_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("ok", StringType()),
    ]
)


def read_binary_dir(spark, path: str, glob: str = "*.jpg") -> DataFrame:
    """S3-analog file-listing scan: ``binaryFile`` source with glob
    pushdown (image_utils.py:50-73 → dataset index).

    Zero-byte visibility (r13, queued fix #8): the binaryFile source
    plans NO read for a 0-byte file, so a truncated download was simply
    absent from the listing — invisible instead of invalid. A Hadoop-FS
    glob twin now unions those entries back with content=NULL /
    n_bytes=0, so downstream validators see them and mark them corrupt
    rather than never seeing them. Two alignments keep the twin faithful
    to Spark's own file index (r14, ADVICE): raw globStatus does NOT
    apply Spark's hidden-file rule, so basenames starting with '_' or
    '.' are skipped here exactly as InMemoryFileIndex would skip them at
    any size; and modified_at is built from the epoch millis via a Spark
    cast (an absolute instant, rendered in the session timezone like
    binaryFile's modificationTime) — datetime.fromtimestamp would bake
    in the SYSTEM zone and disagree whenever
    spark.sql.session.timeZone differs from it."""
    listed = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path"),
            F.col("length").alias("n_bytes"),
            F.col("content"),
            F.col("modificationTime").alias("modified_at"),
        )
    )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + glob)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(hpath)
    empties = [
        (st.getPath().toString(), 0, None, st.getModificationTime())
        for st in (statuses or [])
        if st.isFile()
        and st.getLen() == 0
        and not st.getPath().getName().startswith(("_", "."))
    ]
    if not empties:
        return listed
    zero = spark.createDataFrame(
        empties, "path string, n_bytes long, content binary, __mod_ms long"
    ).select(
        "path",
        "n_bytes",
        "content",
        (F.col("__mod_ms") / F.lit(1000.0)).cast("timestamp").alias("modified_at"),
    )
    return listed.unionByName(zero)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: derives a stable
    (width, height) from the payload hash. Replace with PIL when present."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return 400 + h[0] * 8, 400 + h[1] * 8


def decode_images(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Decode binary → (width, height, ok) via mapInPandas.

    With PIL present this decodes for real; without, the deterministic
    fake keeps schema/partitioning/testing honest. Raises on neither —
    malformed payloads yield ok='corrupt' (PERMISSIVE-style, mirroring
    the reference's download validator any_scraper.py:301-318).
    """
    fields = [f for f in df.schema.fields if f.name != content_col]
    out_schema = StructType(
        fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("decode_ok", StringType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            widths, heights, oks = [], [], []
            for payload in pdf[content_col]:
                try:
                    data = bytes(payload or b"")
                    arr = decode_ppm(data)
                    if arr is not None:  # real container-native codec
                        h, w = arr.shape[:2]
                    elif not data or data.startswith(b"P6"):
                        # detectable without any codec: a NULL/empty payload,
                        # or one that declares the P6 magic but failed to
                        # parse, is corrupt on the real (PIL) path too — the
                        # fake must not launder it into 'ok'
                        raise ValueError("empty or malformed payload")
                    elif _HAVE_PIL:
                        import io

                        from PIL import Image as _I

                        with _I.open(io.BytesIO(payload)) as im:
                            w, h = im.size
                    else:
                        w, h = _fake_decode(payload)
                    widths.append(w)
                    heights.append(h)
                    oks.append("ok")
                except Exception:
                    widths.append(None)
                    heights.append(None)
                    oks.append("corrupt")
            out = pdf.drop(columns=[content_col])
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["decode_ok"] = oks
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


# --- real resize kernel ------------------------------------------------------
# The netpbm P6 (PPM) codec below is a REAL image codec implemented with
# numpy only — no external library — so resize is genuinely exercised in
# this container. When PIL is present, non-PPM payloads (JPEG/PNG/WebP)
# take the reference's path: Image.resize(..., LANCZOS)
# (image_utils.py:31-36, any_scraper.py:301-318).


def decode_ppm(data: bytes):
    """Decode a binary PPM (P6, maxval 255) → (H, W, 3) uint8 array, or
    None if the payload is not a well-formed P6."""
    import re as _re

    import numpy as np

    if not data or not data.startswith(b"P6"):
        return None
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    m = _re.match(rb"P6\s+(?:#[^\n]*\n\s*)?(\d+)\s+(\d+)\s+(\d+)\s", data)
    if not m:
        return None
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    raster = data[m.end() : m.end() + w * h * 3]
    if len(raster) != w * h * 3:
        return None
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr) -> bytes:
    """(H, W, 3) uint8 array → binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def bilinear_resize(arr, out_w: int, out_h: int):
    """Vectorized bilinear resample of an (H, W, C) uint8 array (numpy
    only; half-pixel centers, the OpenCV/PIL convention)."""
    import numpy as np

    in_h, in_w = arr.shape[:2]
    # sample positions: half-pixel-center mapping, clamped at borders
    xs = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    ys = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    xs = np.clip(xs, 0, in_w - 1)
    ys = np.clip(ys, 0, in_h - 1)
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    x1 = np.minimum(x0 + 1, in_w - 1)
    y1 = np.minimum(y0 + 1, in_h - 1)
    wx = (xs - x0)[None, :, None]
    wy = (ys - y0)[:, None, None]
    a = arr.astype(np.float64)
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resize_images(
    df: DataFrame,
    width: int = 512,
    height: int = 512,
    content_col: str = "content",
) -> DataFrame:
    """Resize binary image payloads to (width, height) via mapInPandas.

    Per payload: PPM/P6 → numpy bilinear (real, container-native);
    other formats with PIL present → ``Image.resize(LANCZOS)``
    (image_utils.py:31-36); otherwise ``resize_ok='unsupported'`` with the
    payload passed through untouched. Binary bytes never visit the driver;
    batch memory is bounded by Arrow's maxRecordsPerBatch."""
    fields = [f for f in df.schema.fields if f.name != content_col]
    out_schema = StructType(
        fields
        + [
            StructField(content_col, BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("resize_ok", StringType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            contents, widths, heights, oks = [], [], [], []
            for payload in pdf[content_col]:
                data = bytes(payload or b"")
                arr = decode_ppm(data)
                if arr is not None:
                    resized = bilinear_resize(arr, width, height)
                    contents.append(encode_ppm(resized))
                    widths.append(width)
                    heights.append(height)
                    oks.append("ok")
                elif not data or data.startswith(b"P6"):
                    # NULL/empty payloads and claimed-P6 payloads that fail
                    # to parse are detectably corrupt container-natively —
                    # not merely 'unsupported' (which is for formats this
                    # build has no codec for); payload passes through
                    contents.append(data)
                    widths.append(None)
                    heights.append(None)
                    oks.append("corrupt")
                elif _HAVE_PIL:  # pragma: no cover - codec not in container
                    import io

                    from PIL import Image as _I

                    try:
                        with _I.open(io.BytesIO(data)) as im:
                            fmt = im.format or "PNG"
                            resized = im.resize((width, height), _I.LANCZOS)
                            buf = io.BytesIO()
                            resized.save(buf, format=fmt)
                        contents.append(buf.getvalue())
                        widths.append(width)
                        heights.append(height)
                        oks.append("ok")
                    except Exception:
                        contents.append(data)
                        widths.append(None)
                        heights.append(None)
                        oks.append("corrupt")
                else:
                    contents.append(data)
                    widths.append(None)
                    heights.append(None)
                    oks.append("unsupported")
            import pandas as pd

            out = pdf.drop(columns=[content_col])
            out[content_col] = contents
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["resize_ok"] = oks
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def extract_features(
    df: DataFrame, content_col: str = "content", dim: int = 16, out_col: str = "features"
) -> DataFrame:
    """Feature-extraction kernel: binary payload → fixed-dim float vector
    via mapInPandas. Without a vision model in the container, the
    deterministic stand-in derives features from the payload digest — the
    schema (array<float>), batching, and downstream joinability (feeds
    operators/similarity.py) are the real tested surface."""
    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [StructField(out_col, ArrayType(FloatType()))]
    )

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        for pdf in batches:
            feats = []
            for payload in pdf[content_col]:
                h = hashlib.md5(bytes(payload or b"")).digest()
                raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
                v = (raw.astype(np.float64) / 2**32) - 0.5
                v /= np.linalg.norm(v) or 1.0
                feats.append(v.astype(np.float32).tolist())
            out = pdf.drop(columns=[content_col])
            out[out_col] = feats
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    n_frames: int = 4,
    id_col: str = "asset_id",
) -> DataFrame:
    """Frame-sampling kernel: one binary "video" row → n evenly-spaced
    frame rows (asset_id, frame_index, frame_bytes). The fan-out happens
    inside mapInPandas (no driver involvement); a real decoder slots into
    the byte-slicing stand-in."""
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_index", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf[id_col], pdf[content_col]):
                data = bytes(payload or b"")
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame_bytes": frames})

    return df.mapInPandas(kernel, schema=out_schema)


def ssim_pairs(
    df: DataFrame,
    a_col: str,
    b_col: str,
    side: int = 8,
    out_col: str = "ssim",
) -> DataFrame:
    """M9: SSIM between paired pixel arrays (metrics.py:36-96), computed
    as the global (single-window) SSIM over side×side images via an
    Arrow-batched numpy kernel — the gaussian-window variant drops in by
    replacing the window weights. Columns ``a_col``/``b_col`` are flat
    float arrays of length side².
    """
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(out_col, DoubleType())]
    )
    c1, c2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2  # L=2 for [-1,1] data

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            vals = []
            for a, b in zip(pdf[a_col], pdf[b_col]):
                # undefined-input contract (mirrors the r9 valid-vector /
                # non-finite rule: bad measurements skip like NULL): a NULL
                # or empty side, mismatched lengths (would otherwise raise a
                # broadcasting error and kill the task), or any non-finite
                # component → NULL ssim
                if a is None or b is None or len(a) == 0 or len(a) != len(b):
                    vals.append(None)
                    continue
                x = np.asarray(a, dtype=np.float64)
                y = np.asarray(b, dtype=np.float64)
                if not (np.isfinite(x).all() and np.isfinite(y).all()):
                    vals.append(None)
                    continue
                mx, my = x.mean(), y.mean()
                vx, vy = x.var(), y.var()
                cxy = ((x - mx) * (y - my)).mean()
                vals.append(
                    ((2 * mx * my + c1) * (2 * cxy + c2))
                    / ((mx * mx + my * my + c1) * (vx + vy + c2))
                )
            pdf = pdf.copy()
            pdf[out_col] = vals
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def min_resolution_ok(width, height, min_px: int = 512):
    """F1 predicate (image_utils.py:24-29; 512 per config.py:105-106)."""
    return (width >= min_px) & (height >= min_px)


ALLOWED_RATIOS = (3.0 / 4.0, 4.0 / 5.0, 1.0)


def aspect_ratio_ok(width, height, tol: float = 0.05, ratios=ALLOWED_RATIOS):
    """F2 predicate: |w/h − r| < tol for any allowed ratio
    (image_utils.py:12-22)."""
    r = width.cast("double") / height.cast("double")
    cond = F.lit(False)
    for ratio in ratios:
        cond = cond | (F.abs(r - F.lit(ratio)) < F.lit(tol))
    return cond
