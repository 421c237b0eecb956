"""Multimodal (binary-column) operators — image/audio/video as opaque
binary with typed metadata (SURVEY §2.12; parity targets: the ONNX
smoke/fire classifier odin_onnx/src/lib.rs:47-150 with its tiling
strategies, image ops odin_image/src/lib.rs:149-246, R9 image
similarity).

Design for 100 TB of media:
- media rows carry `content: binary` + metadata columns; bytes NEVER
  leave the executor (no driver collect), and Arrow moves them to
  Python in bounded batches (`spark.sql.execution.arrow.maxRecordsPerBatch`
  should be lowered for large blobs — see `media_repartition`).
- every operator is `mapInPandas`/`pandas_udf` over an iterator of
  batches → constant memory per task regardless of partition size.
- decode itself is STUBBED here: the container has no image/audio
  codecs. Each stub is deterministic (derived from the bytes) so tests
  pin the plumbing — schema, batching, partitioning — while a real
  deployment swaps `_decode_backend` for PIL/ffmpeg/onnxruntime.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def _decode_backend():
    """Real decoder hook. Returns None in this container (no codec
    libraries baked in); operators then use the deterministic fake so
    the Spark-side plumbing stays executable and tested."""
    try:  # pragma: no cover - not installed here
        import PIL.Image  # noqa: F401

        return "pil"
    except Exception:
        return None


def _fake_pixels(content: bytes, n: int = 16) -> list[float]:
    """Deterministic stand-in for decoded pixel statistics: n floats in
    [0,1) derived from a SHA-256 hex-string stream of the bytes. NOT a
    decode — a placeholder with the same shape/dtype a real decoder
    would emit. The stream iterates on HEX DIGEST STRINGS (not raw
    digests) so any engine with a string sha256 reproduces it — the
    DuckDB oracle replays it as nested sha256() calls + hex substrings:
      float k of round r = CAST('0x' || substr(d_r, 8k+1, 8) AS BIGINT)
                           / 4294967296.0,  d_1 = sha256(sha256(text)).
    """
    out: list[float] = []
    h = hashlib.sha256(content or b"").hexdigest()
    while len(out) < n:
        h = hashlib.sha256(h.encode()).hexdigest()
        for i in range(0, 57, 8):
            out.append(int(h[i : i + 8], 16) / 2**32)
            if len(out) == n:
                break
    return out


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("mean_val", DoubleType()),
        StructField("max_val", DoubleType()),
    ]
)


def extract_features(media: DataFrame, n_features: int = 16) -> DataFrame:
    """Decode → per-item feature vector + running stats (A4 analog,
    Stats::add odin_image/src/lib.rs:53-98). mapInPandas over batch
    iterators: constant memory, parallel per partition.

    With a real backend this is where pixels→embedding runs; the stub
    emits deterministic pseudo-features of identical schema.
    """
    if _decode_backend() is not None:  # pragma: no cover
        raise NotImplementedError(
            "real decode backend detected but not wired; swap _fake_pixels"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_pixels(c, n_features) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                    "mean_val": [sum(f) / len(f) for f in feats],
                    "max_val": [max(f) for f in feats],
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


TILE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("strategy", StringType()),
        StructField("content", BinaryType()),
    ]
)


def tile_media(
    media: DataFrame, nx: int = 2, ny: int = 2, strategy: str = "mosaic"
) -> DataFrame:
    """Tiling stage of the ONNX classifier (fit_scaled/padded/mosaic,
    odin_onnx config): one input item → nx*ny tile rows. The stub
    byte-slices `content` into equal chunks standing in for image
    crops; the fan-out/partitioning (the scale-relevant part) is real.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "tile_x": [], "tile_y": [], "strategy": [], "content": []}
            for _, r in pdf.iterrows():
                c = r["content"] or b""
                n = nx * ny
                step = max(1, len(c) // n)
                for t in range(n):
                    rows["media_id"].append(r["media_id"])
                    rows["tile_x"].append(t % nx)
                    rows["tile_y"].append(t // nx)
                    rows["strategy"].append(strategy)
                    rows["content"].append(c[t * step : (t + 1) * step])
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, TILE_SCHEMA)


def classify_stub(content: Column | str, labels: tuple[str, ...] = ("smoke", "fire", "none")) -> Column:
    """predict_batch shape of the ONNX smoke/fire classifier
    (odin_onnx/src/lib.rs:47-150) as a vectorized pandas_udf: bytes →
    struct(label, confidence). Deterministic stub scores (hash-derived);
    a real deployment replaces the body with an onnxruntime session —
    the UDF signature, Arrow batching, and downstream filtering are the
    engine surface being pinned.
    """
    c = F.col(content) if isinstance(content, str) else content

    @F.pandas_udf(
        StructType(
            [StructField("label", StringType()), StructField("confidence", DoubleType())]
        )
    )
    def _udf(s: pd.Series) -> pd.DataFrame:
        scores = [_fake_pixels(b, len(labels)) for b in s]
        return pd.DataFrame(
            {
                "label": [labels[sc.index(max(sc))] for sc in scores],
                "confidence": [max(sc) for sc in scores],
            }
        )

    return _udf(c)


def frame_sample(video: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one video row → up to `max_frames`
    frame rows (every_n-th). Stub emits byte-window pseudo-frames; the
    row fan-out and bounded output are the real contract."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "content": []}
            for _, r in pdf.iterrows():
                c = r["content"] or b""
                # pretend each "frame" is a 64-byte window at stride every_n*64
                for i in range(max_frames):
                    off = i * every_n * 64
                    if off >= len(c):
                        break
                    rows["media_id"].append(r["media_id"])
                    rows["frame_no"].append(i * every_n)
                    rows["content"].append(c[off : off + 64])
            yield pd.DataFrame(rows)

    return video.mapInPandas(
        fn,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("frame_no", IntegerType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def media_repartition(media: DataFrame, partitions: int, max_records_per_batch: int = 64) -> DataFrame:
    """Partitioning/batching hygiene for big blobs: hash-repartition on
    media_id (even blob distribution, no skew from source file layout)
    and cap Arrow batch row count so a batch of large images fits in
    worker memory. Returns the repartitioned frame; the conf is set on
    the session (documented side effect)."""
    media.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(max_records_per_batch)
    )
    return media.repartition(partitions, "media_id")


def image_similarity(a: DataFrame, b: DataFrame, n_features: int = 16) -> DataFrame:
    """R9 — pairwise image similarity via feature vectors (RGB-hybrid /
    SSIM-style compare, odin_image/src/lib.rs:218-246): decode both
    sides to features, equi-join on media_id, cosine on the vectors.
    Join stays JVM-side; only decode crosses to Python."""
    from odin_rs_spark.operators.similarity import cosine

    fa = extract_features(a, n_features).select(
        "media_id", F.col("features").alias("fa")
    )
    fb = extract_features(b, n_features).select(
        "media_id", F.col("features").alias("fb")
    )
    return fa.join(fb, "media_id").select(
        "media_id", cosine(F.col("fa"), F.col("fb")).alias("similarity")
    )


# --------------------------------------------------------------------------
# R9 real decode path (PNG/PNM via sources.imagecodec — no libraries)
# --------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("dhash", LongType()),
    ]
)


def image_decode_errors(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Dead-letter audit for image decode: one (id, error) row per
    undecodable item (same contract as the netcdf3/grib2 audits)."""
    from odin_rs_spark.sources.imagecodec import decode_image

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, errs = [], []
            for mid, content in zip(pdf[id_col], pdf["content"]):
                try:
                    decode_image(bytes(content))
                except ValueError as exc:
                    ids.append(mid)
                    errs.append(str(exc)[:500])
            yield pd.DataFrame({id_col: ids, "error": errs})

    return media.select(F.col(id_col), "content").mapInPandas(
        probe, f"{id_col} long, error string"
    )


def image_pixel_stats(
    media: DataFrame, id_col: str = "media_id", on_error: str = "raise"
) -> DataFrame:
    """REAL image decode → per-image pixel statistics + 64-bit dHash
    (odin_image/src/lib.rs:149-246 load/stats; R9 similarity via
    perceptual hash). PNG/PNM decode runs in pure Python inside
    mapInPandas (sources/imagecodec) — bytes never leave the executor,
    no shuffle before the stats exist. Every number is integer-exact
    arithmetic (mean as sum/count in double, dHash fully integer), so an
    external oracle that knows the pixel generator replays it verbatim
    (q124). PNG/PNM and JPEG decode — baseline and progressive SOF2,
    4:2:0 included (sources/jpegcodec; arithmetic-coded JPEG raises
    and remains the `_decode_backend` swap point). `on_error="skip"`
    drops
    undecodable items (pair with `image_decode_errors`).
    """
    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image, dhash64, luma

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "width": [], "height": [],
                "channels": [], "mean_luma": [], "dhash": [],
            }
            for mid, content in zip(pdf[id_col], pdf["content"]):
                try:
                    img = decode_image(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                g = luma(img)
                rows["media_id"].append(mid)
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["channels"].append(1 if img.ndim == 2 else img.shape[2])
                rows["mean_luma"].append(
                    float(g.astype(np.int64).sum()) / g.size
                )
                # dhash packs bit 63 — reinterpret as signed for the
                # LongType column (same 64 bits; oracle does the same)
                rows["dhash"].append(
                    int(np.uint64(dhash64(img)).astype(np.int64))
                )
            yield pd.DataFrame(rows)

    return media.select(F.col(id_col), "content").mapInPandas(
        fn, IMAGE_STATS_SCHEMA
    )


def image_near_dup_groups(stats: DataFrame) -> DataFrame:
    """R9 image near-dup: exact grouping on the perceptual dHash (the
    0-distance case; Hamming-radius>0 would bucket on hash bands like
    SimHash — dedup.simhash's shape). One groupBy on an 8-byte key."""
    return stats.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("media_id").alias("keeper_id"),
        F.round(F.avg("mean_luma"), 6).alias("avg_luma"),
    )


TILE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("n_px", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def image_tile_stats(
    media: DataFrame, nx: int = 2, ny: int = 2, on_error: str = "raise"
) -> DataFrame:
    """REAL pixel tiling (the odin_onnx mosaic/fit strategies on actual
    pixels, not byte slices): decode each image, split the luma plane
    into nx*ny tiles on floor boundaries (tile tx spans columns
    [tx*W//nx, (tx+1)*W//nx)), and emit per-tile pixel count + exact
    mean luma. One mapInPandas stage; the tile fan-out (the
    scale-relevant part) is rows-out = rows-in * nx * ny. Integer-exact
    boundaries + sums make the whole stage SQL-replayable (q128)."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image, luma

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "tile_x": [], "tile_y": [],
                "n_px": [], "mean_luma": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    g = luma(decode_image(bytes(content)))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                h, w = g.shape
                for ty in range(ny):
                    y0, y1 = ty * h // ny, (ty + 1) * h // ny
                    for tx in range(nx):
                        x0, x1 = tx * w // nx, (tx + 1) * w // nx
                        t = g[y0:y1, x0:x1]
                        if t.size == 0:
                            # image smaller than the tile grid: floor
                            # boundaries produce empty tiles — skip
                            # rather than divide by zero
                            continue
                        rows["media_id"].append(mid)
                        rows["tile_x"].append(tx)
                        rows["tile_y"].append(ty)
                        rows["n_px"].append(t.size)
                        rows["mean_luma"].append(
                            float(t.astype(np.int64).sum()) / t.size
                        )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, TILE_STATS_SCHEMA)


STRUCTURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win_x", IntegerType()),
        StructField("win_y", IntegerType()),
        StructField("ssim", DoubleType()),
    ]
)


def image_structure_compare(
    pairs: DataFrame, win: int = 8, id_col: str = "media_id"
) -> DataFrame:
    """SSIM-style gray structure comparison of image PAIRS (R9; parity:
    gray_structure_compare, odin_image/src/lib.rs:234-239, which runs
    the image_compare crate's windowed MSSIM on the luma planes).

    Input: (id_col, content_a, content_b) rows of same-size images.
    Output: one row per full win x win window with its SSIM index
    (C1=6.5025, C2=58.5225 — the standard (K*255)^2 constants for
    K1=0.01/K2=0.03); the caller aggregates (mean SSIM = the crate's
    score). Mismatched dimensions raise, matching the reference's
    InvalidDimensions error.

    Determinism for the oracle: windows are FULL win^2-pixel blocks on
    integer boundaries, so with win=8 every mean/variance/covariance is
    an integer sum divided by the dyadic 64 — exact in doubles — and
    the final SSIM expression is evaluated in one fixed association
    order that an external SQL replay reproduces bit-for-bit.
    """
    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image, luma

    C1, C2 = 6.5025, 58.5225

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "win_x": [], "win_y": [], "ssim": []}
            for mid, ca, cb in zip(
                pdf[id_col], pdf["content_a"], pdf["content_b"]
            ):
                ga = luma(decode_image(bytes(ca))).astype(np.int64)
                gb = luma(decode_image(bytes(cb))).astype(np.int64)
                if ga.shape != gb.shape:
                    raise ValueError(
                        f"image dimensions differ: {ga.shape} vs {gb.shape}"
                    )
                h, w = ga.shape
                n = win * win
                for wy in range(h // win):
                    for wx in range(w // win):
                        ta = ga[wy * win : (wy + 1) * win, wx * win : (wx + 1) * win]
                        tb = gb[wy * win : (wy + 1) * win, wx * win : (wx + 1) * win]
                        # integer sums -> exact dyadic moments (win=8)
                        mx = float(ta.sum()) / n
                        my = float(tb.sum()) / n
                        vx = float((ta * ta).sum()) / n - mx * mx
                        vy = float((tb * tb).sum()) / n - my * my
                        cov = float((ta * tb).sum()) / n - mx * my
                        num = (2.0 * mx * my + C1) * (2.0 * cov + C2)
                        den = (mx * mx + my * my + C1) * (vx + vy + C2)
                        rows["media_id"].append(mid)
                        rows["win_x"].append(wx)
                        rows["win_y"].append(wy)
                        rows["ssim"].append(num / den)
            yield pd.DataFrame(rows)

    return pairs.select(F.col(id_col), "content_a", "content_b").mapInPandas(
        fn, STRUCTURE_SCHEMA
    )


SMOKE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("y", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("g_diff", DoubleType()),
        StructField("w_diff", DoubleType()),
    ]
)

_WHITE_LEN = 441.6729559300637  # sqrt(3 * 255^2)
_MAX_A = 0.9553166181245093  # max angle between any [r,g,b] and white


def _rgb_to_gw(rgb: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """Vectorized gray-/white-ness factors (odin_image/src/lib.rs:
    960-1008): gray = 1 - acos(cos_a)/MAX_A (1 = perfect gray, 0 = a
    pure primary), white = projection of [r,g,b] on the white axis,
    which reduces exactly to (r+g+b)/765 (0 = black, 1 = white).
    Singularities pinned like the reference: black -> (1, 0),
    white -> (1, 1)."""
    import numpy as np

    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    s = r + g + b
    length = np.sqrt(r * r + g * g + b * b)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos_a = np.clip(255.0 * s / (length * _WHITE_LEN), -1.0, 1.0)
        gray = 1.0 - np.arccos(cos_a) / _MAX_A
    white = s / 765.0
    black = s == 0
    gray = np.where(black, 1.0, gray)
    white = np.where(black, 0.0, white)
    full = (rgb[..., 0] == 255) & (rgb[..., 1] == 255) & (rgb[..., 2] == 255)
    gray = np.where(full, 1.0, gray)
    white = np.where(full, 1.0, white)
    return gray, white


def grayworld_smoke_diff(
    pairs: DataFrame,
    tile_w: int = 8,
    tile_h: int = 8,
    min_valid: float = 0.5,
    min_g_diff: float = 0.02,
    min_w_diff: float = 0.05,
    w_saturation: float = 1.0,
    horizon: list[int] | None = None,
    mask: set[tuple[int, int]] | None = None,
    id_col: str = "media_id",
) -> DataFrame:
    """Grayworld smoke detection between a before/after image pair
    (parity: get_gw_smoke_diff, odin_image/src/smoke.rs:71-106 — smoke
    shows as tiles whose WHITE-ness rises by >= min_w_diff while the
    GRAY-ness also rises by >= min_g_diff): per-pixel (gray, white)
    factors, per-tile means over valid pixels (white < w_saturation —
    already-saturated pixels carry no signal — and, when `horizon` is
    given, y >= horizon[x]: the sky above a camera's horizon line is
    excluded, the reference's valid_pixel_predicate), with at least
    `min_valid` of the tile valid in BOTH frames; tile-wise
    after-minus-before diffs, threshold filter. `mask` excludes whole
    (tile_x, tile_y) tiles — the reference's per-tile Mask for known
    false-alarm regions. Output rows carry the tile's pixel rectangle
    exactly like the reference's SmokeDiff. Full tiles only
    (fractional_tiles=false). `horizon` must have one entry per pixel
    COLUMN of the frames (the reference errors likewise).

    Scale shape: one mapInPandas pass over the paired frames — pixels
    never shuffle; the output is candidate tiles only (sparse)."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image

    def tile_means(img: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
        if img.ndim != 3 or img.shape[2] < 3:
            raise ValueError("grayworld smoke diff needs RGB images")
        gray, white = _rgb_to_gw(img)
        valid = white < w_saturation
        h, w = gray.shape
        if horizon is not None:
            if len(horizon) != w:
                raise ValueError(
                    f"horizon length {len(horizon)} != image width {w}"
                )
            yy = np.arange(h)[:, None]
            valid &= yy >= np.asarray(horizon, dtype=np.int64)[None, :]
        ny, nx = h // tile_h, w // tile_w
        gm = np.full((ny, nx), np.nan)
        wm = np.full((ny, nx), np.nan)
        for ty in range(ny):
            for tx in range(nx):
                sl = (
                    slice(ty * tile_h, (ty + 1) * tile_h),
                    slice(tx * tile_w, (tx + 1) * tile_w),
                )
                v = valid[sl]
                nv = int(v.sum())
                if nv >= min_valid * tile_w * tile_h and nv > 0:
                    gm[ty, tx] = float(gray[sl][v].sum()) / nv
                    wm[ty, tx] = float(white[sl][v].sum()) / nv
        return gm, wm

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "tile_x": [], "tile_y": [], "x": [], "y": [],
                "width": [], "height": [], "g_diff": [], "w_diff": [],
            }
            for mid, ca, cb in zip(
                pdf[id_col], pdf["content_a"], pdf["content_b"]
            ):
                a = decode_image(bytes(ca))
                b = decode_image(bytes(cb))
                if a.shape != b.shape:
                    raise ValueError(
                        f"image dimensions differ: {a.shape} vs {b.shape}"
                    )
                g1, w1 = tile_means(a)
                g2, w2 = tile_means(b)
                g_diff = g2 - g1
                w_diff = w2 - w1
                cand = (
                    ~np.isnan(g_diff)
                    & ~np.isnan(w_diff)
                    & (w_diff >= min_w_diff)
                    & (g_diff >= min_g_diff)
                )
                if mask:
                    for mtx, mty in mask:
                        if 0 <= mty < cand.shape[0] and 0 <= mtx < cand.shape[1]:
                            cand[mty, mtx] = False
                for ty, tx in zip(*np.nonzero(cand)):
                    rows["media_id"].append(mid)
                    rows["tile_x"].append(int(tx))
                    rows["tile_y"].append(int(ty))
                    rows["x"].append(int(tx) * tile_w)
                    rows["y"].append(int(ty) * tile_h)
                    rows["width"].append(tile_w)
                    rows["height"].append(tile_h)
                    rows["g_diff"].append(float(g_diff[ty, tx]))
                    rows["w_diff"].append(float(w_diff[ty, tx]))
            yield pd.DataFrame(rows)

    return pairs.select(F.col(id_col), "content_a", "content_b").mapInPandas(
        fn, SMOKE_SCHEMA
    )


EQUALIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("cdf_min", LongType()),
        StructField("eq_mean", DoubleType()),
        StructField("eq_min", IntegerType()),
        StructField("eq_max", IntegerType()),
    ]
)


def equalize_lut(hist: "np.ndarray", n_pixels: int) -> "np.ndarray":
    """Histogram-equalization lookup table (parity: compute_lut,
    odin_image/src/lib.rs:192-213): cdf over the 256-bin gray
    histogram, cdf_min = the first nonzero cdf entry, lut[v] =
    round((cdf[v]-cdf_min)/(n-cdf_min)*255) for populated bins, 0
    otherwise. Rounding is floor(x+0.5) — Rust's round() half-away
    semantics, NOT numpy's banker's rounding — in float64 (the
    reference uses f32; same formula, documented precision widening).
    A constant image (n == cdf_min) maps to 0, matching the
    reference's NaN-as-u8 collapse."""
    import numpy as np

    cdf = np.cumsum(hist.astype(np.int64))
    nz = np.nonzero(cdf)[0]
    cdf_min = int(cdf[nz[0]]) if len(nz) else 0
    lut = np.zeros(256, dtype=np.int64)
    if n_pixels > cdf_min:
        pop = cdf > 0
        lut[pop] = np.floor(
            (cdf[pop] - cdf_min).astype(np.float64)
            / (n_pixels - cdf_min)
            * 255.0
            + 0.5
        ).astype(np.int64)
    return lut


def image_equalize_stats(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Histogram equalization over decoded luma planes, emitting the
    per-image equalized statistics (cdf_min, exact mean of the
    equalized plane, min/max). One mapInPandas pass — histograms and
    LUTs are 256-slot arrays, pixels never leave the executor. Every
    number is integer arithmetic except the single LUT division, so an
    oracle that knows the pixel generator replays it verbatim (q134)."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image, luma

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "cdf_min": [], "eq_mean": [],
                "eq_min": [], "eq_max": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    g = luma(decode_image(bytes(content)))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                hist = np.bincount(g.reshape(-1), minlength=256)[:256]
                lut = equalize_lut(hist, g.size)
                eq = lut[g]
                cdf = np.cumsum(hist)
                nz = np.nonzero(cdf)[0]
                rows["media_id"].append(mid)
                rows["cdf_min"].append(int(cdf[nz[0]]) if len(nz) else 0)
                rows["eq_mean"].append(float(eq.sum()) / g.size)
                rows["eq_min"].append(int(eq.min()))
                rows["eq_max"].append(int(eq.max()))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, EQUALIZE_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("peak", IntegerType()),
        StructField("mean_abs", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_stats(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL audio decode → per-clip sample statistics: the WAV bytes
    (sources/audiocodec — pure-stdlib RIFF PCM) decode inside
    mapInPandas and every emitted number is integer-exact arithmetic
    over the samples (mean_abs = integer sum / count, zero crossings =
    sign-change count on channel 0), so an oracle that knows the sample
    generator replays verbatim. Lossy codecs raise and remain the
    `_decode_backend` seam — same contract as image_pixel_stats."""
    import numpy as np

    from odin_rs_spark.sources.audiocodec import decode_wav

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "rate": [], "channels": [], "n_samples": [],
                "peak": [], "mean_abs": [], "zero_crossings": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rate, a = decode_wav(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                s = a.astype(np.int64)
                c0 = s[:, 0]
                # sign-change count, zeros attach to the previous sign
                # (np.sign(0)=0 would double-count plateaus): compare
                # consecutive NONZERO signs
                nz = c0[c0 != 0]
                zc = int((np.sign(nz[1:]) != np.sign(nz[:-1])).sum()) if len(nz) > 1 else 0
                rows["media_id"].append(mid)
                rows["rate"].append(rate)
                rows["channels"].append(a.shape[1])
                rows["n_samples"].append(a.shape[0])
                rows["peak"].append(int(np.abs(s).max()) if s.size else 0)
                rows["mean_abs"].append(
                    float(np.abs(s).sum()) / s.size if s.size else 0.0
                )
                rows["zero_crossings"].append(zc)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, AUDIO_STATS_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win", IntegerType()),
        StructField("mean_abs", DoubleType()),
        StructField("is_silent", IntegerType()),
    ]
)


def audio_silence_windows(
    media: DataFrame,
    window: int = 256,
    threshold: float = 100.0,
    on_error: str = "raise",
) -> DataFrame:
    """Windowed silence detection on decoded samples (the
    voice-activity-style segmentation a speech-corpus pipeline runs
    before transcription): fixed `window`-sample frames on channel 0
    (full frames only), per-frame integer-exact mean absolute level,
    silent iff strictly below `threshold`. One mapInPandas pass;
    output is one row per frame — rows-out = n_samples/window."""
    import numpy as np

    from odin_rs_spark.sources.audiocodec import decode_wav

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "win": [], "mean_abs": [], "is_silent": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    _rate, a = decode_wav(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                c0 = a[:, 0].astype(np.int64)
                nwin = len(c0) // window
                if nwin == 0:
                    continue
                fr = np.abs(c0[: nwin * window]).reshape(nwin, window)
                mean_abs = fr.sum(axis=1) / float(window)
                rows["media_id"].extend([mid] * nwin)
                rows["win"].extend(range(nwin))
                rows["mean_abs"].extend(mean_abs.tolist())
                rows["is_silent"].extend(
                    (mean_abs < threshold).astype(np.int32).tolist()
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, AUDIO_WINDOW_SCHEMA)


FOCUS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("focus", DoubleType()),
    ]
)


def image_focus(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Brenner focus measure over decoded luma (parity:
    avg_horizontal_brenner_focus, odin_image/src/lib.rs:550-567 — the
    reference differences along y with stride 2 despite the name; the
    camera-health metric its tower monitors alarm on): focus =
    sum((l[y+2,x] - l[y,x])^2) / (w * (h-2)). Integer-exact numerator,
    one division — an oracle that knows the pixel generator replays it
    verbatim."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image, luma

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "focus": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    g = luma(decode_image(bytes(content))).astype(np.int64)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                h, w = g.shape
                if h < 3:
                    continue  # no y+2 differences exist
                d = g[2:, :] - g[:-2, :]
                rows["media_id"].append(mid)
                rows["focus"].append(float((d * d).sum()) / (w * (h - 2)))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, FOCUS_SCHEMA)


FRACTAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fractal_dim", DoubleType()),
    ]
)


def image_fractal_dim(
    media: DataFrame, s_min: float = 0.5, on_error: str = "raise"
) -> DataFrame:
    """Compression-based fractal-dimension estimate (parity:
    fractal_dim, odin_image/src/lib.rs:580-608, after Del-Pozo-Velazquez
    et al. 2025's smoke/no-smoke texture classifier): resize the luma
    plane at scales s_min, s_min+0.1, ..., 1.0, take log2 of each
    scale's DEFLATE-compressed byte size, and return the least-squares
    slope of log2(size) against log2(10*s). Deviations from the
    reference, both documented: nearest-neighbor resampling (no image
    libs in this container; the reference uses CatmullRom) and zlib
    level 6 as the compressor. Deterministic for a given zlib build but
    NOT SQL-expressible (no oracle can run DEFLATE), so the catalog
    entry is a rows-only check."""
    import zlib

    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image, luma, resize_nearest

    if not 0.0 < s_min < 1.0:
        raise ValueError(f"s_min out of range: {s_min}")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "fractal_dim": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    g = luma(decode_image(bytes(content)))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                h, w = g.shape
                xs, ys = [], []
                s = s_min
                while s < 1.0:
                    sw, sh = int(w * s), int(h * s)
                    if sw < 1 or sh < 1:
                        s += 0.1
                        continue
                    sz = len(zlib.compress(resize_nearest(g, sw, sh).tobytes(), 6))
                    xs.append(np.log2(s * 10.0))
                    ys.append(np.log2(sz))
                    s += 0.1
                xs.append(np.log2(10.0))
                ys.append(np.log2(len(zlib.compress(g.tobytes(), 6))))
                xa, ya = np.array(xs), np.array(ys)
                denom = ((xa - xa.mean()) ** 2).sum()
                slope = (
                    ((xa - xa.mean()) * (ya - ya.mean())).sum() / denom
                    if denom > 0
                    else 0.0
                )
                rows["media_id"].append(mid)
                rows["fractal_dim"].append(float(slope))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, FRACTAL_SCHEMA)


FRAME_INDEX_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("offset", LongType()),
        StructField("size", LongType()),
        StructField("keyframe", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fps_micro", LongType()),
    ]
)


def video_frame_index(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL video container walk → per-frame index rows (frame number,
    absolute byte offset, payload size, keyframe flag, plus the
    clip's dimensions and frame interval) from the AVI idx1 index
    (sources/avicodec) — NO frame decode: this is the metadata a video
    training pipeline needs to turn frame sampling into byte-range
    reads (sample every Nth frame / keyframes only, then hand each
    payload to the `_decode_backend` seam). One mapInPandas pass;
    output is rows-out = frames-in, bytes never shuffle."""
    from odin_rs_spark.sources.avicodec import parse_avi_index

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_no": [], "offset": [], "size": [],
                "keyframe": [], "width": [], "height": [], "fps_micro": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    g = parse_avi_index(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for fno, off, size, kf in g["frames"]:
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["offset"].append(off)
                    rows["size"].append(size)
                    rows["keyframe"].append(int(kf))
                    rows["width"].append(g["width"])
                    rows["height"].append(g["height"])
                    rows["fps_micro"].append(g["fps_micro"])
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, FRAME_INDEX_SCHEMA)


def fit_image(
    img: "np.ndarray",
    model_w: int,
    model_h: int,
    policy: str = "scale",
    pad_value: int | tuple = 0,
) -> "np.ndarray":
    """Fit an arbitrary-size decoded image to fixed model dimensions —
    the reference's FitPolicy (odin_onnx/src/lib.rs:37-108) on REAL
    pixels: "scale" resamples to (model_w, model_h) with Catmull-Rom
    ignoring aspect ratio (fit_scaled); "pad" preserves aspect — copy
    at the origin when the image already fits, else downscale by the
    dominant factor min(mw/w, mh/h) and pad the remainder with
    `pad_value` (fit_padded). "mosaic" raises, as it does in the
    reference (todo!())."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import resize_catmullrom

    h, w = img.shape[:2]
    if policy == "scale":
        return resize_catmullrom(img, model_w, model_h)
    if policy == "pad":
        if w <= model_w and h <= model_h:
            scaled = img
        else:
            s = min(model_w / w, model_h / h)
            sw, sh = max(int(w * s), 1), max(int(h * s), 1)
            scaled = resize_catmullrom(img, sw, sh)
        shape = (
            (model_h, model_w)
            if img.ndim == 2
            else (model_h, model_w, img.shape[2])
        )
        out = np.full(shape, pad_value, dtype=img.dtype)
        out[: scaled.shape[0], : scaled.shape[1]] = scaled
        return out
    if policy == "mosaic":
        raise NotImplementedError("mosaic fit is todo!() in the reference too")
    raise ValueError(f"unknown fit policy {policy!r}")


FIT_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("n_pad_px", LongType()),
    ]
)


def image_fit_stats(
    media: DataFrame,
    model_w: int,
    model_h: int,
    policy: str = "pad",
    pad_value: int = 0,
    on_error: str = "raise",
) -> DataFrame:
    """Decode → fit to model dims → exact stats of the fitted luma
    plane (mean + pad-pixel count). The model-input normalization
    stage of the odin_onnx classify pipeline, driven through Spark:
    one mapInPandas pass, pixels never shuffle."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import decode_image, luma

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "out_w": [], "out_h": [],
                "mean_luma": [], "n_pad_px": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    g = luma(decode_image(bytes(content)))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                fitted = fit_image(g, model_w, model_h, policy, pad_value)
                h, w = g.shape
                if policy == "pad" and w <= model_w and h <= model_h:
                    n_pad = model_w * model_h - w * h
                else:
                    n_pad = 0 if policy == "scale" else None
                    if n_pad is None:
                        sh, sw = fitted.shape[:2]
                        # padded area after downscale
                        s = min(model_w / w, model_h / h)
                        n_pad = model_w * model_h - max(int(w * s), 1) * max(
                            int(h * s), 1
                        )
                rows["media_id"].append(mid)
                rows["out_w"].append(fitted.shape[1])
                rows["out_h"].append(fitted.shape[0])
                rows["mean_luma"].append(
                    float(fitted.astype(np.int64).sum()) / fitted.size
                )
                rows["n_pad_px"].append(int(n_pad))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, FIT_STATS_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fingerprint", LongType()),
        StructField("n_windows", IntegerType()),
    ]
)


def audio_fingerprint(
    media: DataFrame, window: int = 256, n_bits: int = 63, on_error: str = "raise"
) -> DataFrame:
    """Perceptual audio fingerprint — the dHash move on the time axis
    (a chromaprint-style energy-delta signature, fully integer): frame
    channel 0 into fixed windows, take per-window integer energy
    (sum |s|), and set bit w iff energy[w+1] > energy[w] over the
    first n_bits+1 windows (shorter clips contribute fewer bits;
    window count rides along so unequal-length clips can't collide by
    zero-padding). Robust to constant gain ONLY in the strict sense
    that monotone per-window comparisons survive any positive scaling
    — the property that makes re-encoded/volume-normalized duplicates
    collide. Exact integer arithmetic end to end, so the oracle
    replays it verbatim (q149)."""
    import numpy as np

    from odin_rs_spark.sources.audiocodec import decode_wav

    if not 1 <= n_bits <= 63:
        raise ValueError("n_bits must be 1..63 (signed long assembly)")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "fingerprint": [], "n_windows": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    _rate, a = decode_wav(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                c0 = np.abs(a[:, 0].astype(np.int64))
                nwin = len(c0) // window
                e = c0[: nwin * window].reshape(nwin, window).sum(axis=1)
                bits = (e[1:] > e[:-1])[: n_bits]
                fp = 0
                for i, b in enumerate(bits):
                    if b:
                        fp |= 1 << i
                rows["media_id"].append(mid)
                rows["fingerprint"].append(fp)
                rows["n_windows"].append(nwin)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, AUDIO_FP_SCHEMA)


def audio_near_dup_groups(fps: DataFrame) -> DataFrame:
    """Exact grouping on (fingerprint, n_windows) — one groupBy on a
    12-byte key, the audio twin of image_near_dup_groups."""
    return fps.groupBy("fingerprint", "n_windows").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.min("media_id").alias("keeper_id"),
    )


RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("rate", IntegerType()),
        StructField("content", BinaryType()),
        StructField("n_samples", LongType()),
    ]
)


def audio_resample_linear(
    media: DataFrame, dst_rate: int, on_error: str = "raise"
) -> DataFrame:
    """Rate-normalize clips by exact-rational linear interpolation —
    the resample a speech-corpus pipeline runs before feature
    extraction (16 kHz -> model rate): dst sample j sits at source
    position j·src/dst; out[j] = floor(s[k] + (s[k+1]−s[k])·frac +
    0.5) with frac = (j·src mod dst)/dst, so every arithmetic step is
    a fixed-order double expression an external oracle reproduces
    bit-for-bit. Output rows carry re-encoded WAV bytes (channel 0) —
    the operator composes with every other audio op. Output length is
    every j whose source position lands within [0, n-1] — a dst
    sample landing EXACTLY on the last source sample (frac == 0, e.g.
    the identity resample) needs no s[k+1] and is kept, so
    n_out = floor((n-1)·dst/src) + 1 and src==dst round-trips all n
    samples (ADVICE r6: the old (n-2)-based bound dropped it)."""
    import numpy as np

    from odin_rs_spark.sources.audiocodec import decode_wav, encode_wav

    if dst_rate < 1:
        raise ValueError("dst_rate must be positive")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "rate": [], "content": [], "n_samples": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    src_rate, a = decode_wav(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                s = a[:, 0].astype(np.float64)
                n = len(s)
                if n < 2:
                    continue
                # largest j with j*src <= (n-1)*dst; for that j either
                # k+1 <= n-1 or frac == 0 (k == n-1 forces
                # j*src == (n-1)*dst), so the k+1 clamp below is only
                # ever read where its weight is exactly zero
                n_out = ((n - 1) * dst_rate) // src_rate + 1
                j = np.arange(n_out, dtype=np.int64)
                k = (j * src_rate) // dst_rate
                frac = ((j * src_rate) % dst_rate) / float(dst_rate)
                kp1 = np.minimum(k + 1, n - 1)
                v = s[k] + (s[kp1] - s[k]) * frac
                out = np.floor(v + 0.5).astype(np.int16)
                rows["media_id"].append(mid)
                rows["rate"].append(dst_rate)
                rows["content"].append(encode_wav(out, rate=dst_rate))
                rows["n_samples"].append(int(n_out))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, RESAMPLE_SCHEMA)


VIDEO_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("keyframe", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sum_channels", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def video_decode_frames(
    media: DataFrame,
    every_n: int = 1,
    keyframes_only: bool = False,
    max_frames: int | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """REAL video frame decode — the step `video_frame_index` (q143)
    stages for: walk the AVI idx1 index (sources/avicodec), byte-slice
    each selected MJPG frame payload, decode it with the pure-Python
    baseline JPEG codec (sources/jpegcodec) and emit per-frame pixel
    stats. Composes the two verified codecs into the operator a video
    training pipeline actually runs (sample frames -> decode ->
    featurize); parity target is the reference's media ingest seam
    (odin_image/src/lib.rs:149-246 does the same decode-then-measure
    on stills).

    Scale shape: one mapInPandas pass; frame SELECTION (every_n /
    keyframes_only / max_frames) happens on the index before any
    decode, so skipped frames cost a byte-slice of zero work; video
    bytes never shuffle, rows-out = selected frames. `sum_channels` is
    the RAW integer sum over every pixel of every channel — one unit
    for all rows (ADVICE r7: a conditional /3 gave the column
    row-dependent units on RGB frames, silently mixing scales in any
    downstream SUM) — with `n_channels` alongside so aggregates can
    normalize exactly; `mean_luma` (= sum_channels / n_channels / n_px)
    is the only derived value."""
    import numpy as np

    from odin_rs_spark.sources.avicodec import parse_avi_index
    from odin_rs_spark.sources.jpegcodec import decode_jpeg

    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_no": [], "keyframe": [], "width": [],
                "height": [], "n_px": [], "n_channels": [],
                "sum_channels": [], "mean_luma": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                try:
                    g = parse_avi_index(buf)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                taken = 0
                for fno, off, size, kf in g["frames"]:
                    if fno % every_n or (keyframes_only and not kf):
                        continue
                    if max_frames is not None and taken >= max_frames:
                        break
                    try:
                        img = decode_jpeg(buf[off + 8 : off + 8 + size])
                    except ValueError:
                        if on_error == "skip":
                            continue
                        raise
                    a = np.asarray(img, dtype=np.uint8)
                    h, w = a.shape[:2]
                    n_px = h * w
                    nch = a.shape[2] if a.ndim == 3 else 1
                    s = int(a.astype(np.int64).sum())
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["keyframe"].append(int(kf))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_px"].append(n_px)
                    rows["n_channels"].append(nch)
                    rows["sum_channels"].append(s)
                    rows["mean_luma"].append(s / nch / n_px)
                    taken += 1
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        fn, VIDEO_FRAME_STATS_SCHEMA
    )


FRAME_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("fp", StringType()),
    ]
)


def video_frame_fingerprints(
    media: DataFrame, nx: int = 4, ny: int = 3, on_error: str = "raise"
) -> DataFrame:
    """Per-frame content fingerprint for VIDEO DEDUP — the multimodal
    twin of the text near-dup family: decode every MJPG frame
    (avicodec index walk + jpegcodec), split the luma plane into an
    ny-by-nx tile grid, and fingerprint the frame as
    md5("s0,s1,...") over the row-major integer tile sums. Identical
    decoded frames (re-encoded or re-containered copies of the same
    pixels) collide exactly; the tile-sum string is replayable in
    plain SQL (md5 + concat of bigints), so a planted-duplicate
    oracle verifies the whole decode path with zero tolerance.
    Scale shape: one mapInPandas pass, fingerprints (not pixels)
    shuffle into the dedup groupBy; rows-out = frames-in."""
    import hashlib as _hashlib

    import numpy as np

    from odin_rs_spark.sources.avicodec import parse_avi_index
    from odin_rs_spark.sources.jpegcodec import decode_jpeg

    if nx < 1 or ny < 1:
        raise ValueError("nx/ny must be >= 1")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "fp": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                try:
                    g = parse_avi_index(buf)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for fno, off, size, kf in g["frames"]:
                    try:
                        img = decode_jpeg(buf[off + 8 : off + 8 + size])
                    except ValueError:
                        if on_error == "skip":
                            continue
                        raise
                    a = np.asarray(img, dtype=np.int64)
                    if a.ndim == 3:
                        a = a.sum(axis=2)  # integer channel sum: exact
                    h, w = a.shape
                    sums = []
                    for ty in range(ny):
                        y0, y1 = ty * h // ny, (ty + 1) * h // ny
                        for tx in range(nx):
                            x0, x1 = tx * w // nx, (tx + 1) * w // nx
                            sums.append(int(a[y0:y1, x0:x1].sum()))
                    key = ",".join(str(s) for s in sums)
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["fp"].append(_hashlib.md5(key.encode()).hexdigest())
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, FRAME_FP_SCHEMA)


DEMUX_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("content", BinaryType()),
    ]
)


def video_demux_audio(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Demux the PCM16 audio track out of AVI clips
    (sources/avicodec.parse_avi_audio: 'auds' strh/WAVEFORMATEX walk +
    '##wb' chunk gather in idx1 order) and re-encode it as WAV bytes —
    so the ENTIRE existing audio pipeline (audio_stats,
    audio_silence_windows, audio_fingerprint dedup, audio_resample)
    composes onto video soundtracks unchanged. This is the A/V
    counterpart of video_decode_frames: a speech/captioning corpus
    pipeline's first step on crawled video. One mapInPandas pass;
    clips without an audio track (or non-PCM16 tracks) raise, or drop
    under on_error='skip'; container bytes never shuffle."""
    from odin_rs_spark.sources.audiocodec import encode_wav
    from odin_rs_spark.sources.avicodec import parse_avi_audio

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "rate": [], "channels": [],
                "n_samples": [], "content": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rate, ch, a = parse_avi_audio(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                rows["media_id"].append(mid)
                rows["rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_samples"].append(a.shape[0])
                rows["content"].append(encode_wav(a, rate=rate))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(fn, DEMUX_SCHEMA)


EXIF_STATS_SCHEMA = (
    "media_id long, make string, model string, orientation int, "
    "dt string, lat double, lon double, gps_present int, "
    "gps_after_strip int"
)


def exif_stats(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Image-side PII audit (sources/exif): per JPEG, the EXIF camera
    identity, orientation and GPS position — plus proof the scrub
    works (`gps_after_strip` re-parses the strip_app_segments output
    and must be 0 everywhere). A corpus build runs the audit to find
    location-bearing media, the strip before distribution. One
    mapInPandas pass; media bytes never shuffle."""
    from odin_rs_spark.sources.exif import parse_exif, strip_app_segments

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "make": [], "model": [], "orientation": [],
                "dt": [], "lat": [], "lon": [], "gps_present": [],
                "gps_after_strip": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                try:
                    e = parse_exif(buf)
                    e2 = parse_exif(strip_app_segments(buf))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                rows["media_id"].append(mid)
                rows["make"].append(e["make"])
                rows["model"].append(e["model"])
                rows["orientation"].append(e["orientation"])
                rows["dt"].append(e["datetime"])
                rows["lat"].append(e["lat"])
                rows["lon"].append(e["lon"])
                rows["gps_present"].append(int(e["lat"] is not None))
                rows["gps_after_strip"].append(int(e2["lat"] is not None))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        fn, EXIF_STATS_SCHEMA
    )


ORIENTED_TILE_SCHEMA = (
    "media_id long, orientation int, out_w int, out_h int, "
    "tile_x int, tile_y int, n_px long, sum_v long"
)


def image_oriented_stats(
    media: DataFrame, nx: int = 2, ny: int = 2, on_error: str = "raise"
) -> DataFrame:
    """Orientation-NORMALIZED tile stats: decode each image, apply its
    EXIF orientation (sources/exif.apply_orientation — phone photos
    store pixels rotated with only tag 0x0112 carrying the truth),
    then emit integer-exact per-tile sums over the DISPLAY-order
    plane. The multimodal twin of q36's raster warp: geometry fixed
    before any aggregate. One mapInPandas pass; bytes never
    shuffle."""
    import numpy as np

    from odin_rs_spark.sources.exif import apply_orientation, parse_exif
    from odin_rs_spark.sources.imagecodec import decode_image, luma

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "orientation": [], "out_w": [], "out_h": [],
                "tile_x": [], "tile_y": [], "n_px": [], "sum_v": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                try:
                    o = parse_exif(buf)["orientation"] if buf[:2] == b"\xff\xd8" else None
                    g = luma(decode_image(buf))
                    g = apply_orientation(g, o)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                h, w = g.shape
                for ty in range(ny):
                    y0, y1 = ty * h // ny, (ty + 1) * h // ny
                    for tx in range(nx):
                        x0, x1 = tx * w // nx, (tx + 1) * w // nx
                        t = g[y0:y1, x0:x1]
                        if t.size == 0:
                            continue
                        rows["media_id"].append(mid)
                        rows["orientation"].append(o if o is not None else 1)
                        rows["out_w"].append(w)
                        rows["out_h"].append(h)
                        rows["tile_x"].append(tx)
                        rows["tile_y"].append(ty)
                        rows["n_px"].append(t.size)
                        rows["sum_v"].append(int(t.astype(np.int64).sum()))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        fn, ORIENTED_TILE_SCHEMA
    )


CNN_CLASSIFY_SCHEMA = "media_id bigint, pred int, margin double"


def cnn_classify_media(
    media: DataFrame, weights: dict, on_error: str = "raise"
) -> DataFrame:
    """REAL image decode → conv-net classification in ONE mapInPandas
    stage (the reference's image classifier path, odin_onnx/src/lib.rs:
    47-150: load model → fit → forward → scores): PNG/JPEG bytes decode
    via sources/imagecodec, grayscale via exact luma when RGB, then the
    dyadic-exact Conv→ReLU→MaxPool→Flatten→Gemm forward of
    functions/cnn. Bytes never shuffle; weights ride the closure
    (broadcast-sized). Images must match the model's input side."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        import numpy as np

        from odin_rs_spark.functions.cnn import classify_pixels
        from odin_rs_spark.sources.imagecodec import decode_image, luma

        for pdf in batches:
            ids, grays = [], []
            # model input side from the head shape: flat = F·(side/2)²
            n_filt = weights["wc"].shape[0]
            in_side = 2 * int(
                round((weights["wd"].shape[0] / n_filt) ** 0.5)
            )
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    img = decode_image(bytes(content))
                    g = luma(img) if img.ndim == 3 else img
                    if g.shape != (in_side, in_side):
                        # wrong-sized image must be skippable, not kill
                        # the whole batch inside np.stack
                        raise ValueError(
                            f"image {g.shape} != model input "
                            f"({in_side}, {in_side})"
                        )
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                ids.append(int(mid))
                grays.append(g)
            if not ids:
                yield pd.DataFrame(
                    {"media_id": [], "pred": [], "margin": []}
                ).astype({"media_id": "int64", "pred": "int32",
                          "margin": "float64"})
                continue
            pred, margin = classify_pixels(np.stack(grays), weights)
            yield pd.DataFrame(
                {"media_id": ids, "pred": pred, "margin": margin}
            )

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(
        fn, CNN_CLASSIFY_SCHEMA
    )


JPEG_QUALITY_SCHEMA = (
    "media_id bigint, est_quality int, n_bytes int, mode string"
)


def jpeg_quality_scan(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Per-JPEG encoder-quality estimate from the luma DQT
    (sources/jpegcodec.jpeg_quality_estimate — the ImageMagick-style
    IJG inverse): the corpus filter multimodal builds run to drop
    over-compressed images before any pixel work, because the DQT
    sits in the first kilobyte and never needs entropy decode.
    Adds the detected mode (baseline/progressive) from the SOF
    marker. Bytes never shuffle (mapInPandas scan-local walk)."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        from odin_rs_spark.sources.jpegcodec import (
            jpeg_quality_estimate,
            jpeg_sof_mode,
        )

        for pdf in batches:
            rows = {"media_id": [], "est_quality": [], "n_bytes": [], "mode": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                try:
                    q = jpeg_quality_estimate(buf)
                    # mode from the actual SOF marker via the segment
                    # walk, not a raw byte scan (ADVICE r9)
                    mode = jpeg_sof_mode(buf)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                rows["media_id"].append(int(mid))
                rows["est_quality"].append(q)
                rows["n_bytes"].append(len(buf))
                rows["mode"].append(mode)
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(
        fn, JPEG_QUALITY_SCHEMA
    )


WEBDATASET_SCHEMA = (
    "file string, key string, caption string, n_caption_words int,"
    " meta_id bigint, img_w int, img_h int, img_mean double"
)


def webdataset_samples(files_df, on_error: str = "raise") -> DataFrame:
    """WebDataset-convention multimodal shard reader: a .tar whose
    members group into SAMPLES by basename — `<key>.jpg` (image),
    `<key>.txt` (caption), `<key>.json` (metadata) — the layout
    LAION-style image-text corpora actually ship in. One mapInPandas
    walk does the tar parse (sources/archive) AND the JPEG decode
    (sources/jpegcodec) in the scan task, so neither archive bytes
    nor pixels ever shuffle; rows out = samples in.

    Incomplete samples (missing .jpg or .txt) are dropped — the
    WebDataset contract treats the sample, not the member, as the
    unit. meta_id is pulled from the .json sidecar when present."""
    import json as _json

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        import os

        import numpy as np

        from odin_rs_spark.sources.archive import parse_tar
        from odin_rs_spark.sources.jpegcodec import decode_jpeg

        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "key": [], "caption": [], "n_caption_words": [],
                "meta_id": [], "img_w": [], "img_h": [], "img_mean": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    members = parse_tar(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                samples: dict[str, dict] = {}
                for m in members:
                    if m["data"] is None:
                        continue
                    key, dot, ext = m["name"].rpartition(".")
                    if dot:
                        samples.setdefault(key, {})[ext] = m["data"]
                for key in sorted(samples):
                    parts = samples[key]
                    if "jpg" not in parts or "txt" not in parts:
                        continue
                    try:
                        img = decode_jpeg(parts["jpg"])
                    except ValueError:
                        if on_error == "skip":
                            continue
                        raise
                    caption = parts["txt"].decode("utf-8", "replace")
                    meta_id = None
                    if "json" in parts:
                        try:
                            meta_id = int(
                                _json.loads(parts["json"].decode("utf-8"))["id"]
                            )
                        except (ValueError, KeyError, TypeError):
                            meta_id = None
                    rows["file"].append(base)
                    rows["key"].append(key)
                    rows["caption"].append(caption)
                    rows["n_caption_words"].append(len(caption.split()))
                    rows["meta_id"].append(meta_id)
                    rows["img_h"].append(int(img.shape[0]))
                    rows["img_w"].append(int(img.shape[1]))
                    rows["img_mean"].append(float(np.mean(img)))
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(
        fn, WEBDATASET_SCHEMA
    )


DTMF_LOW = (697, 770, 852, 941)
DTMF_HIGH = (1209, 1336, 1477, 1633)
DTMF_PAD = "123A456B789C*0#D"  # row-major over (low, high)


def dtmf_decode(
    media: DataFrame,
    frame: int = 205,
    silence_power: float = 1e9,
    on_error: str = "raise",
) -> DataFrame:
    """REAL audio decode → per-frame DTMF detection by the GOERTZEL
    single-bin DFT (the classic telephony algorithm: power at the 8
    keypad frequencies only — O(frames x 8) instead of a full FFT,
    which is exactly the shape a scan-side kernel wants). WAV bytes
    decode inside mapInPandas; per 205-sample frame (the ITU-standard
    block at 8 kHz) the kernel computes p(f) = (SUM s cos(wn))^2 +
    (SUM s sin(wn))^2 over the frame-local index, detects the row/
    column pair by band-wise argmax (ties -> lower frequency), and
    maps the 4x4 keypad. Frames whose total detected power stays under
    `silence_power` report NULLs (inter-digit gaps). Output is
    DECISION-LEVEL (frequencies + digit, never raw powers), so the
    compare is robust to last-ulp libm/BLAS drift in the trig."""
    import numpy as np

    from odin_rs_spark.sources.audiocodec import decode_wav

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_no": [], "silence": [],
                "f_low": [], "f_high": [], "digit": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rate, a = decode_wav(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                s = a[:, 0].astype(np.float64)
                nfr = len(s) // frame
                n = np.arange(frame, dtype=np.float64)
                freqs = np.array(DTMF_LOW + DTMF_HIGH, dtype=np.float64)
                w = 2.0 * np.pi * freqs[:, None] * n[None, :] / rate
                cosb, sinb = np.cos(w), np.sin(w)  # (8, frame)
                for k in range(nfr):
                    seg = s[k * frame : (k + 1) * frame]
                    re = cosb @ seg
                    im = sinb @ seg
                    p = re * re + im * im
                    lo = int(np.argmax(p[:4]))
                    hi = int(np.argmax(p[4:]))
                    quiet = bool(p.max() < silence_power)
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(k)
                    rows["silence"].append(quiet)
                    rows["f_low"].append(None if quiet else DTMF_LOW[lo])
                    rows["f_high"].append(None if quiet else DTMF_HIGH[hi])
                    rows["digit"].append(
                        None if quiet else DTMF_PAD[lo * 4 + hi]
                    )
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(
        fn,
        "media_id bigint, frame_no bigint, silence boolean, "
        "f_low int, f_high int, digit string",
    )
