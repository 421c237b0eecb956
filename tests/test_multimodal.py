"""Multimodal binary-column plumbing tests: schema, batching, fan-out,
determinism (decode itself is stubbed — no codec libs in container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odin_rs_spark.operators import multimodal as mm
from odin_rs_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    """Binary media rows synthesized from the documents table (text bytes
    as opaque blobs — deterministic, no codecs needed)."""
    docs = load_table(spark, "documents", sf_dir).limit(50)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").cast("binary").alias("content"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def test_extract_features_schema_and_determinism(spark, media):
    out = mm.extract_features(media, n_features=8)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "n_bytes", "features", "mean_val", "max_val",
    ]
    r1 = {r.media_id: r.features for r in out.collect()}
    r2 = {r.media_id: r.features for r in mm.extract_features(media, 8).collect()}
    assert r1 == r2  # deterministic across runs
    assert all(len(v) == 8 and all(0 <= x < 1 for x in v) for v in r1.values())


def test_tile_fanout(spark, media):
    tiles = mm.tile_media(media, nx=2, ny=2)
    n_media = media.count()
    assert tiles.count() == 4 * n_media
    per = tiles.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)
    coords = {
        (r.tile_x, r.tile_y)
        for r in tiles.filter(F.col("media_id") == per[0].media_id).collect()
    }
    assert coords == {(0, 0), (1, 0), (0, 1), (1, 1)}


def test_classify_stub(spark, media):
    scored = media.select("media_id", mm.classify_stub("content").alias("pred"))
    rows = scored.collect()
    assert all(r.pred.label in ("smoke", "fire", "none") for r in rows)
    assert all(0 <= r.pred.confidence < 1 for r in rows)
    # deterministic
    again = {r.media_id: r.pred for r in scored.collect()}
    assert all(again[r.media_id] == r.pred for r in rows)


def test_frame_sample_bounded(spark, media):
    frames = mm.frame_sample(media, every_n=2, max_frames=4)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] <= 4 for r in per)
    assert frames.filter(F.col("frame_no") % 2 != 0).count() == 0


def test_media_repartition(spark, media):
    rp = mm.media_repartition(media, partitions=6)
    assert rp.rdd.getNumPartitions() == 6
    assert (
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == "64"
    )


def test_image_similarity_self_is_one(spark, media):
    sim = mm.image_similarity(media, media)
    rows = sim.collect()
    assert len(rows) == media.count()
    assert all(abs(r.similarity - 1.0) < 1e-9 for r in rows)


def _rgb_pair_frames(spark, n=4):
    from odin_rs_spark.plans.catalog import _formula_rgb_pair_media

    return _formula_rgb_pair_media(spark, n)


def test_structure_compare_identical_is_one(spark):
    """Self-compare: every window's SSIM is exactly 1.0 (num == den)."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import encode_png

    arr = ((np.arange(24)[:, None] * 7 + np.arange(32)) % 256).astype(np.uint8)
    png = encode_png(arr)
    pairs = spark.createDataFrame(
        [(1, bytearray(png), bytearray(png))],
        "media_id long, content_a binary, content_b binary",
    )
    rows = mm.image_structure_compare(pairs, win=8).collect()
    assert len(rows) == (32 // 8) * (24 // 8)
    assert all(r.ssim == 1.0 for r in rows)


def test_structure_compare_degraded_window_drops(spark):
    """Perturbing one 8x8 window leaves every other window at 1.0 and
    that window strictly below."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import encode_png

    a = ((np.arange(24)[:, None] * 5 + np.arange(32) * 3) % 256).astype(np.uint8)
    b = a.copy()
    b[0:8, 0:8] = 255 - b[0:8, 0:8]
    pairs = spark.createDataFrame(
        [(1, bytearray(encode_png(a)), bytearray(encode_png(b)))],
        "media_id long, content_a binary, content_b binary",
    )
    rows = {(r.win_x, r.win_y): r.ssim for r in
            mm.image_structure_compare(pairs, win=8).collect()}
    assert rows[(0, 0)] < 1.0
    assert all(v == 1.0 for k, v in rows.items() if k != (0, 0))


def test_structure_compare_dim_mismatch_raises(spark):
    import numpy as np
    import pytest
    from py4j.protocol import Py4JJavaError

    from odin_rs_spark.sources.imagecodec import encode_png

    a = np.zeros((16, 16), np.uint8)
    b = np.zeros((8, 8), np.uint8)
    pairs = spark.createDataFrame(
        [(1, bytearray(encode_png(a)), bytearray(encode_png(b)))],
        "media_id long, content_a binary, content_b binary",
    )
    with pytest.raises(Exception, match="dimensions differ"):
        mm.image_structure_compare(pairs).collect()


def test_rgb_to_gw_reference_values():
    """Pin the gw factor math (odin_image/src/lib.rs:960-1008): black
    and white singularities, perfect-gray axis, pure-primary zero, and
    the exact rational whiteness (r+g+b)/765."""
    import numpy as np

    px = np.array(
        [[[0, 0, 0], [255, 255, 255], [128, 128, 128], [255, 0, 0], [100, 50, 25]]],
        dtype=np.uint8,
    )
    g, w = mm._rgb_to_gw(px)
    assert (g[0, 0], w[0, 0]) == (1.0, 0.0)  # black
    assert (g[0, 1], w[0, 1]) == (1.0, 1.0)  # white
    assert abs(g[0, 2] - 1.0) < 1e-12 and abs(w[0, 2] - 128 / 255) < 1e-12
    assert abs(g[0, 3]) < 1e-12  # pure primary = max angle
    assert w[0, 4] == (100 + 50 + 25) / 765.0


def test_smoke_diff_detects_plume_tiles(spark):
    """The formula pair brightens/grays tiles with (tx+ty)%4==0 — the
    detector must return exactly those tiles, with positive diffs."""
    pairs = _rgb_pair_frames(spark, 4)
    rows = mm.grayworld_smoke_diff(
        pairs, tile_w=8, tile_h=8, min_g_diff=0.005, min_w_diff=0.05
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, set()).add((r.tile_x, r.tile_y))
        assert r.g_diff > 0 and r.w_diff > 0
        assert r.x == r.tile_x * 8 and r.width == 8
    want = {(tx, ty) for tx in range(4) for ty in range(3) if (tx + ty) % 4 == 0}
    assert per == {mid: want for mid in range(4)}


def test_smoke_diff_w_saturation_invalidates(spark):
    """Tiles whose pixels are already saturated white carry no signal:
    with w_saturation below the plume's whiteness the after-frame tile
    fails min_valid and drops from the candidate set."""
    pairs = _rgb_pair_frames(spark, 2)
    rows = mm.grayworld_smoke_diff(
        pairs, tile_w=8, tile_h=8, min_g_diff=0.005, min_w_diff=0.05,
        w_saturation=0.55,
    ).collect()
    # plume pixels land at whiteness ~0.61-0.87 -> invalid after-tiles
    assert rows == []


def test_equalize_lut_reference_semantics():
    """Pin compute_lut (odin_image/src/lib.rs:192-213) by hand: 4
    pixels {0:1, 100:2, 200:1} -> cdf [1,3,4], cdf_min=1, lut = round(
    (cdf-1)/3*255): 0 -> 0, 100 -> 170, 200 -> 255. Constant image
    collapses to 0 (the reference's NaN-as-u8 path)."""
    import numpy as np

    hist = np.zeros(256, dtype=np.int64)
    hist[0], hist[100], hist[200] = 1, 2, 1
    lut = mm.equalize_lut(hist, 4)
    assert (lut[0], lut[100], lut[200]) == (0, 170, 255)
    assert lut[50] == 0  # unpopulated bin

    const = np.zeros(256, dtype=np.int64)
    const[7] = 64
    assert mm.equalize_lut(const, 64)[7] == 0

    # half-away rounding, not banker's: cdf=[1,2], n=2? use a case where
    # the scaled value lands exactly on .5: hist {0:1, 255:1} -> lut[255]
    # = round(1/1*255) = 255; {0:2,1:1,2:1} -> lut[1]=round(1/2*255)=
    # round(127.5) -> 128 (banker's would give 128 too); use 85/2:
    h = np.zeros(256, dtype=np.int64)
    h[0], h[1], h[2] = 3, 1, 1
    # cdf=[3,4,5], cdf_min=3, n=5: lut[1]=round(1/2*255)=round(127.5)=128
    assert mm.equalize_lut(h, 5)[1] == 128


def test_image_equalize_stats_spreads_histogram(spark):
    """Equalization must stretch the equalized range to [~0, 255] and
    keep the row count (one row per decodable image)."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import encode_png

    jj, ii = np.mgrid[0:24, 0:32]
    # low-contrast ramp confined to [100, 131]
    arr = (100 + ((ii + jj) % 32)).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(arr)))], "media_id long, content binary"
    )
    r = mm.image_equalize_stats(media).collect()[0]
    assert r.eq_min == 0 and r.eq_max == 255
    assert 100 < r.eq_mean < 160  # spread across the full range


def test_image_focus_reference_semantics(spark):
    """Brenner focus = mean of squared stride-2 y-differences: a
    constant image scores 0, a y-ramp of slope k scores (2k)^2, and
    images shorter than 3 rows emit nothing."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import encode_png

    flat = np.full((8, 5), 77, np.uint8)
    ramp = (np.arange(8)[:, None] * 3 + np.zeros((1, 5), int)).astype(np.uint8)
    tiny = np.zeros((2, 5), np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(flat))), (2, bytearray(encode_png(ramp))),
         (3, bytearray(encode_png(tiny)))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r.focus for r in mm.image_focus(media).collect()}
    assert rows[1] == 0.0
    assert rows[2] == 36.0  # (2*3)^2 everywhere
    assert 3 not in rows


def test_fractal_dim_deterministic_and_ordered(spark):
    """The compression-slope estimate must be deterministic run-to-run
    and rank a high-texture (noisy) plane above a flat one."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import encode_png

    flat = np.full((48, 64), 9, np.uint8)
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(flat))), (2, bytearray(encode_png(noise)))],
        "media_id long, content binary",
    )
    a = {r.media_id: r.fractal_dim for r in mm.image_fractal_dim(media).collect()}
    b = {r.media_id: r.fractal_dim for r in mm.image_fractal_dim(media).collect()}
    assert a == b  # deterministic
    assert a[2] > a[1]  # noise compresses worse at every scale


def test_smoke_diff_horizon_and_mask(spark):
    """Horizon excludes sky rows (valid = y >= horizon[x]); a tile mask
    drops known false-alarm tiles; a wrong-length horizon raises —
    the reference's InvalidDimensions contract."""
    import pytest

    pairs = _rgb_pair_frames(spark, 1)
    base = {(r.tile_x, r.tile_y) for r in mm.grayworld_smoke_diff(
        pairs, tile_w=8, tile_h=8, min_g_diff=0.005, min_w_diff=0.05
    ).collect()}
    assert (0, 0) in base and (3, 1) in base

    # horizon at y=8 for every column: tile row 0 becomes sky-only ->
    # invalid in both frames -> its candidates vanish, others survive
    rows = mm.grayworld_smoke_diff(
        pairs, tile_w=8, tile_h=8, min_g_diff=0.005, min_w_diff=0.05,
        horizon=[8] * 32,
    ).collect()
    got = {(r.tile_x, r.tile_y) for r in rows}
    assert got == {t for t in base if t[1] != 0}

    # masking one tile removes exactly it
    got2 = {(r.tile_x, r.tile_y) for r in mm.grayworld_smoke_diff(
        pairs, tile_w=8, tile_h=8, min_g_diff=0.005, min_w_diff=0.05,
        mask={(3, 1)},
    ).collect()}
    assert got2 == base - {(3, 1)}

    with pytest.raises(Exception, match="horizon length"):
        mm.grayworld_smoke_diff(
            pairs, min_g_diff=0.005, min_w_diff=0.05, horizon=[0] * 5
        ).collect()


def test_fit_image_policies():
    """FitPolicy parity (odin_onnx/src/lib.rs:37-108): scale ignores
    aspect; pad copies at origin when the image fits, downscales by the
    dominant factor otherwise; mosaic raises like the reference's
    todo!()."""
    import numpy as np
    import pytest

    small = np.full((10, 20), 50, np.uint8)
    scaled = mm.fit_image(small, 40, 40, "scale")
    assert scaled.shape == (40, 40) and (scaled == 50).all()

    padded = mm.fit_image(small, 32, 16, "pad", pad_value=9)
    assert padded.shape == (16, 32)
    assert (padded[:10, :20] == 50).all()
    assert (padded[10:, :] == 9).all() and (padded[:, 20:] == 9).all()

    big = np.full((100, 60), 80, np.uint8)
    fit = mm.fit_image(big, 30, 30, "pad", pad_value=0)
    # dominant factor = min(30/60, 30/100) = 0.3 -> 18x30 content
    assert fit.shape == (30, 30)
    assert (fit[:30, :18] == 80).all() and (fit[:, 18:] == 0).all()

    with pytest.raises(NotImplementedError):
        mm.fit_image(small, 8, 8, "mosaic")
    with pytest.raises(ValueError, match="unknown fit policy"):
        mm.fit_image(small, 8, 8, "stretch")


def test_catmullrom_linear_invariants():
    """Cubic resampling reproduces constants everywhere and linear
    ramps in the interior (the filter's defining property) — and a
    sharp edge must NOT ring outside the uint8 clamp."""
    import numpy as np

    from odin_rs_spark.sources.imagecodec import resize_catmullrom

    const = np.full((6, 6), 200, np.uint16)
    out = resize_catmullrom(const, 13, 9)
    assert out.dtype == np.uint16 and (out == 200).all()

    edge = np.zeros((8, 16), np.uint8)
    edge[:, 8:] = 255
    up = resize_catmullrom(edge, 32, 8)
    assert up.min() == 0 and up.max() == 255  # clamped, no wrap


class TestDtmfGoertzel:
    @staticmethod
    def _call(digits: str, noise: int = 0):
        import numpy as np

        from odin_rs_spark.operators.multimodal import DTMF_HIGH, DTMF_LOW, DTMF_PAD
        from odin_rs_spark.sources.audiocodec import encode_wav

        segs = []
        for ch in digits:
            d = DTMF_PAD.index(ch)
            flo, fhi = DTMF_LOW[d // 4], DTMF_HIGH[d % 4]
            m = np.arange(410, dtype=np.float64)
            tone = np.floor(
                5000 * np.sin(2 * np.pi * flo * m / 8000.0)
                + 4000 * np.sin(2 * np.pi * fhi * m / 8000.0)
                + 0.5
            )
            if noise:
                tone = tone + ((m * 37).astype(np.int64) % (2 * noise + 1)) - noise
            segs.append(tone)
            segs.append(np.zeros(205))
        s = np.concatenate(segs).astype(np.int16)
        return encode_wav(s, rate=8000)

    def test_decodes_dialed_sequence(self, spark):
        from odin_rs_spark.operators.multimodal import dtmf_decode

        number = "18005550*#D"
        df = spark.createDataFrame(
            [(0, self._call(number))], "media_id long, content binary"
        )
        out = sorted(dtmf_decode(df).collect(), key=lambda r: r.frame_no)
        # tone spans two frames; take one per key via frame_no % 3 == 0
        got = "".join(
            r.digit for r in out if not r.silence and r.frame_no % 3 == 0
        )
        assert got == number
        assert all(r.silence for r in out if r.frame_no % 3 == 2)

    def test_robust_to_additive_noise(self, spark):
        from odin_rs_spark.operators.multimodal import dtmf_decode

        df = spark.createDataFrame(
            [(0, self._call("42", noise=50))], "media_id long, content binary"
        )
        out = dtmf_decode(df).collect()
        got = "".join(
            r.digit for r in out if not r.silence and r.frame_no % 3 == 0
        )
        assert got == "42"
