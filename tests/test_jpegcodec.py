"""Baseline JPEG codec (sources/jpegcodec.py): exact roundtrip on the
DC-only fixture class, lossy-bounded roundtrips on smooth content,
marker/structure validation, Huffman table construction against T.81,
and the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from odin_rs_spark.sources.jpegcodec import (
    DC_LUMA_SPEC,
    _build_huffman,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _block_constant(bx=4, by=3, seed=0):
    byy, bxx = np.mgrid[0:by, 0:bx]
    vals = 2 * ((seed * 3 + bxx * 7 + byy * 11) % 100) + 12
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)


def test_dc_only_roundtrip_exact():
    """Constant 8x8 blocks with even values survive the LOSSY codec
    bit-for-bit — the q144 exactness contract."""
    for seed in range(5):
        img = _block_constant(seed=seed)
        assert np.array_equal(decode_jpeg(encode_jpeg(img)), img), seed


def test_smooth_gradient_bounded_error():
    """A smooth (wrap-free) ramp roundtrips within small error — the
    general lossy path with nonzero AC coefficients, ZRL runs and
    byte stuffing exercised."""
    jj, ii = np.mgrid[0:24, 0:32]
    img = (40 + ii * 3 + jj * 2).astype(np.uint8)  # max 40+93+46 < 256
    back = decode_jpeg(encode_jpeg(img))
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 2.0


def test_color_roundtrip_bounded_error():
    jj, ii = np.mgrid[0:16, 0:16]
    r = (60 + ii * 4).astype(np.uint8)
    g = (200 - jj * 4).astype(np.uint8)
    b = (100 + ii * 2 + jj * 2).astype(np.uint8)
    rgb = np.stack([r, g, b], axis=-1)
    back = decode_jpeg(encode_jpeg(rgb))
    assert back.shape == rgb.shape
    err = np.abs(back.astype(int) - rgb.astype(int))
    # chroma quantization is coarse (Annex-K table starts at 17)
    assert err.max() <= 24 and err.mean() < 6.0


def test_huffman_table_matches_t81_examples():
    """T.81 Annex C worked example: the DC luminance table's first
    codes are 00 (cat 0, 2 bits), 010/011/100/101/110 (cats 1-5,
    3 bits), 1110 (cat 6, 4 bits)."""
    t = _build_huffman(DC_LUMA_SPEC)
    assert t[0] == (0b00, 2)
    assert t[1] == (0b010, 3)
    assert t[5] == (0b110, 3)
    assert t[6] == (0b1110, 4)
    assert t[11] == (0b111111110, 9)


def test_progressive_equals_baseline_decode():
    """Progressive entropy coding is a LOSSLESS repackaging of the
    same quantized coefficients: decode(progressive(x)) must equal
    decode(baseline(x)) bit-for-bit on ANY input — random content
    exercises newly-significant insertion, correction bits, ZRL runs
    and EOB tails in the refinement passes."""
    rng = np.random.default_rng(7)
    for shape, sub in [
        ((24, 32), "444"),
        ((8, 8), "444"),
        ((24, 32, 3), "444"),
        ((32, 48, 3), "420"),
        ((16, 16, 3), "420"),
    ]:
        for _ in range(3):
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(img, subsampling=sub))
            prog = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))
            assert np.array_equal(base, prog), (shape, sub)


def test_progressive_dc_only_roundtrip_exact():
    """The q144 exactness contract carries to the progressive path:
    constant even-valued blocks survive SOF2 encode→decode exactly."""
    for seed in range(5):
        img = _block_constant(seed=seed)
        buf = encode_jpeg_progressive(img)
        assert b"\xff\xc2" in buf  # really SOF2
        assert buf.count(b"\xff\xda") == 5  # gray scan script
        assert np.array_equal(decode_jpeg(buf), img), seed


def test_progressive_color_scan_script():
    img = _block_constant(bx=4, by=4, seed=2)  # 32x32: 4:2:0 needs %16
    rgb = np.stack([img, img, img], axis=-1)
    buf = encode_jpeg_progressive(rgb, subsampling="420")
    assert buf.count(b"\xff\xda") == 9  # 2 DC + 4 AC first + 3 refine
    assert np.array_equal(decode_jpeg(buf), rgb)


def test_progressive_truncated_scan_raises():
    buf = encode_jpeg_progressive(_block_constant())
    with pytest.raises(ValueError):
        decode_jpeg(buf[: len(buf) * 2 // 3])


def test_unsupported_and_corrupt_raise():
    img = _block_constant()
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + good)
    # lossless SOF3 rejected by name
    bad = bytearray(good)
    sof = bytes(bad).find(b"\xff\xc0")
    bad[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(bad))
    # a baseline scan header under an SOF2 frame is an invalid
    # progressive scan (Ss=0 requires Se=0), not a crash
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        decode_jpeg(bytes(bad))
    # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    # odd dimensions rejected by the fixture encoder
    with pytest.raises(ValueError, match="multiple-of-8"):
        encode_jpeg(np.zeros((10, 16), np.uint8))


def test_decode_image_dispatch_and_spark_pipeline(spark):
    """JPEG bytes flow through the SAME multimodal pipeline as PNG:
    decode_image sniffs the SOI magic and image_pixel_stats emits the
    exact mean for the DC-only fixture."""
    from odin_rs_spark.operators.multimodal import image_pixel_stats
    from odin_rs_spark.sources.imagecodec import decode_image

    img = _block_constant(seed=3)
    buf = encode_jpeg(img)
    assert np.array_equal(decode_image(buf), img)

    media = spark.createDataFrame(
        [(1, bytearray(buf))], "media_id long, content binary"
    )
    r = image_pixel_stats(media).collect()[0]
    assert (r.width, r.height, r.channels) == (32, 24, 1)
    assert r.mean_luma == img.astype(np.int64).sum() / img.size


def test_420_subsampling_roundtrip():
    """The camera-standard 4:2:0 layout: 16x16 MCUs (4 Y blocks +
    box-subsampled Cb/Cr), chroma upsampled by replication on decode."""
    jj, ii = np.mgrid[0:32, 0:32]
    rgb = np.stack(
        [
            (60 + ii * 4).astype(np.uint8),
            (200 - jj * 4).astype(np.uint8),
            (100 + ii * 2 + jj * 2).astype(np.uint8),
        ],
        axis=-1,
    )
    back = decode_jpeg(encode_jpeg(rgb, subsampling="420"))
    assert back.shape == rgb.shape
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.max() <= 16 and err.mean() < 4.0
    # 4:2:0 demands multiple-of-16 dims from the fixture encoder
    with pytest.raises(ValueError, match="multiple-of-16"):
        encode_jpeg(np.zeros((24, 32, 3), np.uint8), subsampling="420")


def test_restart_intervals_exact_and_validated():
    """DRI/RSTn: bit realignment + DC-predictor reset at every
    boundary — the DC-only fixture stays EXACT through restarts, and a
    corrupted restart marker is rejected by name."""
    img = _block_constant(seed=1)
    buf = encode_jpeg(img, restart_interval=2)
    assert b"\xff\xd0" in buf  # RST0 present
    assert np.array_equal(decode_jpeg(buf), img)

    bad = bytearray(buf)
    pos = bytes(bad).find(b"\xff\xd0")
    bad[pos + 1] = 0xD5  # wrong restart number
    with pytest.raises(ValueError, match="expected RST"):
        decode_jpeg(bytes(bad))


class TestQualityScaling:
    def test_scale_quant_inverts_exactly_for_q20_plus(self):
        import numpy as np

        from odin_rs_spark.sources.jpegcodec import (
            QUANT_LUMA,
            encode_jpeg,
            jpeg_quality_estimate,
            scale_quant,
        )

        img = (np.arange(256).reshape(16, 16) % 200 + 20).astype(np.uint8)
        for q in (20, 30, 50, 75, 85, 95, 97):
            assert jpeg_quality_estimate(encode_jpeg(img, quality=q)) == q
        # quality=None writes the exact Annex-K tables == quality 50
        buf_none = encode_jpeg(img)
        assert jpeg_quality_estimate(buf_none) == 50
        assert buf_none == encode_jpeg(img, quality=50)
        # the 255-clamp seam: q=10 flattens the table, estimate reads high
        assert jpeg_quality_estimate(encode_jpeg(img, quality=10)) > 10
        assert (scale_quant(QUANT_LUMA, 50) == QUANT_LUMA).all()

    def test_decoder_uses_written_tables(self):
        import numpy as np

        from odin_rs_spark.sources.jpegcodec import decode_jpeg, encode_jpeg

        img = (np.arange(256).reshape(16, 16) % 200 + 20).astype(np.uint8)
        errs = [
            int(abs(decode_jpeg(encode_jpeg(img, quality=q)).astype(int)
                    - img.astype(int)).max())
            for q in (30, 75, 95)
        ]
        # higher quality must reconstruct strictly better on this image
        assert errs[0] > errs[1] > errs[2]

    def test_estimate_rejections(self):
        import pytest

        from odin_rs_spark.sources.jpegcodec import jpeg_quality_estimate

        for bad in (b"", b"\xff\xd8\xff\xd9", b"nope"):
            with pytest.raises(ValueError):
                jpeg_quality_estimate(bad)


class TestSofMode:
    def test_mode_from_marker_walk_not_byte_scan(self):
        """b'\\xff\\xc2' inside an APP1 payload must not flip a
        baseline file to progressive (ADVICE r9)."""
        import numpy as np

        from odin_rs_spark.sources.jpegcodec import (
            encode_jpeg,
            encode_jpeg_progressive,
            jpeg_sof_mode,
        )

        img = (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8)
        base = encode_jpeg(img)
        assert jpeg_sof_mode(base) == "baseline"
        assert jpeg_sof_mode(encode_jpeg_progressive(img)) == "progressive"
        app1 = b"\xff\xe1" + (6).to_bytes(2, "big") + b"zz\xff\xc2"
        assert jpeg_sof_mode(base[:2] + app1 + base[2:]) == "baseline"
        import pytest

        with pytest.raises(ValueError, match="no SOF|missing SOI"):
            jpeg_sof_mode(b"\xff\xd8\xff\xd9")
        with pytest.raises(ValueError):
            jpeg_sof_mode(b"not a jpeg")
