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
    (q124). JPEG and other DCT formats raise here and remain the
    documented `_decode_backend` swap point. `on_error="skip"` drops
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
