"""Pure-Python image codec (R9 decode path): filter-level PNG spec
compliance pinned against hand-built scanlines (independent of our
encoder), roundtrips, CRC rejection, PNM, resample/dHash determinism,
and the Spark decode→stats→dedup operators."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from odin_rs_spark.sources.imagecodec import (
    _PNG_SIG,
    decode_image,
    decode_png,
    decode_pnm,
    dhash64,
    encode_png,
    encode_pnm,
    luma,
    resize_nearest,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_from_raw(w: int, h: int, color: int, raw: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_hand_built_filters_decode_per_spec():
    """4x3 gray image, one scanline per filter type (Sub, Up, Average,
    Paeth would each reconstruct differently) — filtered bytes written
    BY HAND from the spec's recon equations, not via encode_png."""
    # target pixels
    want = np.array(
        [[10, 20, 30, 40], [15, 25, 35, 45], [100, 90, 80, 70]], dtype=np.uint8
    )
    # row 0: filter 1 (Sub): raw = x - left → 10, 10, 10, 10
    # row 1: filter 2 (Up):  raw = x - up   → 5, 5, 5, 5
    # row 2: filter 4 (Paeth): pred(left, up, ul); for the first pixel
    #   a=0,b=15,c=0 → p=15 → pred=b=15 → raw=100-15=85; then
    #   x=1: a=100,b=25,c=15 → p=110, pa=10,pb=85,pc=95 → pred=a → raw=90-100=-10 (246)
    #   x=2: a=90,b=35,c=25 → p=100, pa=10,pb=65,pc=75 → pred=a → raw=80-90=-10 (246)
    #   x=3: a=80,b=45,c=35 → p=90, pa=10,pb=45,pc=55 → pred=a → raw=70-80=-10 (246)
    raw = bytes(
        [1, 10, 10, 10, 10]
        + [2, 5, 5, 5, 5]
        + [4, 85, 246, 246, 246]
    )
    got = decode_png(_png_from_raw(4, 3, 0, raw))
    assert np.array_equal(got, want), got


def test_hand_built_average_filter():
    # 3x2 gray; row 0 filter 0; row 1 filter 3 (Average):
    # recon = raw + (left + up)//2
    # want row1 = [7, 20, 33]; ups = [10, 20, 30]
    #   x0: left=0, up=10 → raw = 7 - 5 = 2
    #   x1: left=7, up=20 → (27)//2=13 → raw = 20-13 = 7
    #   x2: left=20, up=30 → 25 → raw = 33-25 = 8
    raw = bytes([0, 10, 20, 30] + [3, 2, 7, 8])
    got = decode_png(_png_from_raw(3, 2, 0, raw))
    assert np.array_equal(got, np.array([[10, 20, 30], [7, 20, 33]], np.uint8))


def test_roundtrip_all_filter_modes_and_shapes():
    rng = np.random.default_rng(11)
    for shape in [(8, 5), (6, 4, 2), (7, 9, 3), (5, 5, 4)]:
        a = rng.integers(0, 256, shape).astype(np.uint8)
        for fm in ("none", "cycle"):
            assert np.array_equal(decode_png(encode_png(a, filter_mode=fm)), a)


def test_crc_corruption_rejected():
    a = np.arange(24, dtype=np.uint8).reshape(4, 6)
    buf = bytearray(encode_png(a))
    buf[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(buf))


def test_unsupported_rejected():
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"JFIF" + b"\x00" * 32)
    # 4-bit depth header (16-bit became a SUPPORTED path in r6)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    buf = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(buf)
    # JPEG magic now DISPATCHES to the baseline decoder (r6), which
    # rejects this truncated stream as corrupt rather than unrecognized
    with pytest.raises(ValueError, match="missing SOF|corrupt"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    # GIF magic now DISPATCHES to the GIF decoder (r7), which rejects
    # this truncated stream as corrupt rather than unrecognized
    with pytest.raises(ValueError, match="corrupt GIF|unexpected block"):
        decode_image(b"GIF89a not supported")
    # BMP magic now DISPATCHES to the BMP decoder (r7)
    with pytest.raises(ValueError, match="corrupt BMP|unsupported BMP"):
        decode_image(b"BM bmp-ish-garbage....................")
    # TIFF magic now DISPATCHES to the baseline TIFF decoder (r9),
    # which rejects this truncated stream as corrupt
    with pytest.raises(ValueError, match="corrupt TIFF|TIFF"):
        decode_image(b"II*\x00 tiff-is-not-an-image-here")
    with pytest.raises(ValueError, match="unrecognized image format"):
        decode_image(b"ICO? not-an-image-signature")


def test_pnm_comment_and_roundtrip():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(decode_pnm(encode_pnm(g)), g)
    with_comment = b"P5\n# a comment\n4 3\n255\n" + g.tobytes()
    assert np.array_equal(decode_pnm(with_comment), g)


def test_resize_and_dhash_integer_exact():
    jj, ii = np.mgrid[0:24, 0:32]
    img = ((7 + ii * 3 + jj * 2) % 256).astype(np.uint8)
    r = resize_nearest(img, 9, 8)
    # replay the floor-index mapping by hand
    for j in range(8):
        for i in range(9):
            assert r[j, i] == img[(j * 24) // 8, (i * 32) // 9]
    h = dhash64(img)
    bits = 0
    for j in range(8):
        for i in range(8):
            if r[j, i] > r[j, i + 1]:
                bits |= 1 << (j * 8 + i)
    assert h == bits
    # identical pixels → identical hash regardless of container/filters
    assert dhash64(decode_png(encode_png(img, "cycle"))) == h
    assert dhash64(decode_pnm(encode_pnm(img))) == h


def test_luma_color_vs_gray():
    rng = np.random.default_rng(5)
    c = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    g = luma(c)
    r_, gr, b_ = (c[:, :, k].astype(int) for k in range(3))
    assert np.array_equal(g, ((r_ + 2 * gr + b_) // 4).astype(np.uint8))


def test_spark_image_stats_and_dedup(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from odin_rs_spark.operators.multimodal import (
        image_near_dup_groups,
        image_pixel_stats,
    )

    def _mk(s):
        import pandas as pd

        from odin_rs_spark.sources.imagecodec import encode_png

        out = []
        for mid in s:
            seed = int(mid) % 3  # 3 duplicate groups; vary the WRAP
            # pattern (dHash is difference-based: constant offsets AND
            # monotone ramps collapse — by design — so the groups
            # differ in where the modular wraps flip the gradient sign)
            jj, ii = np.mgrid[0:12, 0:16]
            arr = ((ii * (3 * seed + 5) + jj * 7) % 31 * 8).astype(np.uint8)
            out.append(encode_png(arr))
        return pd.Series(out)

    mk = F.pandas_udf(_mk, BinaryType())
    media = spark.range(12).select(
        F.col("id").alias("media_id"), mk(F.col("id")).alias("content")
    )
    stats = image_pixel_stats(media)
    rows = stats.collect()
    assert all(r["width"] == 16 and r["height"] == 12 for r in rows)
    groups = image_near_dup_groups(stats).collect()
    assert len(groups) == 3
    assert all(g["n_images"] == 4 for g in groups)
    assert sorted(g["keeper_id"] for g in groups) == [0, 1, 2]


def test_image_tile_stats_real_crops(spark):
    """Tile boundaries are floor splits of the PIXEL grid (not byte
    slices): per-tile pixel counts and exact means must match numpy
    crops of the decoded image."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from odin_rs_spark.operators.multimodal import image_tile_stats
    from odin_rs_spark.sources.imagecodec import decode_image

    def _mk(s):
        import pandas as pd

        from odin_rs_spark.sources.imagecodec import encode_png

        out = []
        for mid in s:
            jj, ii = np.mgrid[0:10, 0:13]  # odd width → uneven tiles
            out.append(encode_png(((ii * 7 + jj * 3 + int(mid)) % 256).astype(np.uint8)))
        return pd.Series(out)

    mk = F.pandas_udf(_mk, BinaryType())
    media = spark.range(3).select(
        F.col("id").alias("media_id"), mk(F.col("id")).alias("content")
    )
    rows = image_tile_stats(media, nx=2, ny=2).collect()
    assert len(rows) == 12  # 3 images x 4 tiles
    by_img = {}
    for r in media.collect():
        by_img[r["media_id"]] = decode_image(bytes(r["content"]))
    for r in rows:
        g = by_img[r["media_id"]]
        x0, x1 = r["tile_x"] * 13 // 2, (r["tile_x"] + 1) * 13 // 2
        y0, y1 = r["tile_y"] * 10 // 2, (r["tile_y"] + 1) * 10 // 2
        t = g[y0:y1, x0:x1]
        assert r["n_px"] == t.size
        assert r["mean_luma"] == float(t.astype(np.int64).sum()) / t.size


def test_png_16bit_roundtrip_all_filters():
    """Depth-16 PNG (the reference's luma16 DEM/radiance path): filters
    operate on BYTES with bpp = 2*channels per spec; values round-trip
    exactly through every filter type and decode as uint16."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 65536, (24, 32)).astype(np.uint16)
    for mode in ("none", "cycle"):
        back = decode_png(encode_png(img, filter_mode=mode))
        assert back.dtype == np.uint16
        assert np.array_equal(back, img), mode
    rgb = rng.randint(0, 65536, (9, 7, 3)).astype(np.uint16)
    back3 = decode_png(encode_png(rgb))
    assert back3.dtype == np.uint16 and np.array_equal(back3, rgb)
    # byte order is big-endian per spec: pin via the DEFLATE-stored
    # scanline (filter byte 0 + 0x12 0x34)
    one = np.array([[0x1234]], dtype=np.uint16)
    buf = encode_png(one, filter_mode="none")
    idat = buf.find(b"IDAT")
    (ln,) = struct.unpack(">I", buf[idat - 4 : idat])
    assert zlib.decompress(buf[idat + 4 : idat + 4 + ln]) == b"\x00\x12\x34"
    assert decode_png(buf)[0, 0] == 0x1234


def test_adam7_interlaced_roundtrip_all_shapes():
    """Adam7 (interlace 1): seven independently-filtered pass streams;
    roundtrip across shapes that exercise empty passes (tiny images),
    odd dimensions, every filter, all color types, and 16-bit."""
    for shape in [(24, 32), (7, 5), (1, 1), (2, 3), (9, 16, 3), (16, 9, 4), (8, 8, 2)]:
        a = (np.arange(np.prod(shape)).reshape(shape) * 37 % 256).astype(np.uint8)
        for fm in ("none", "cycle"):
            buf = encode_png(a, filter_mode=fm, interlace=True)
            assert np.array_equal(decode_png(buf), a), (shape, fm)
    b = (np.arange(13 * 11).reshape(13, 11) * 997 % 65536).astype(np.uint16)
    assert np.array_equal(decode_png(encode_png(b, interlace=True)), b)
    # truncated interlaced stream is a named error
    buf = encode_png(np.zeros((16, 16), np.uint8), interlace=True)
    import struct as _struct
    import zlib as _zlib
    # corrupt: re-wrap a short IDAT (drop last pass bytes) with valid CRC
    raw = _zlib.decompress(buf[8 + 8 + 25 : -24] if False else _idat_of(buf))
    short = _zlib.compress(raw[:-40])
    with pytest.raises(ValueError, match="size mismatch|corrupt"):
        decode_png(_rebuild_png(buf, short))


def _idat_of(buf):
    import struct as _struct

    pos = 8
    while pos < len(buf):
        (ln,) = _struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        if typ == b"IDAT":
            return buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raise AssertionError("no IDAT")


def _rebuild_png(buf, new_idat):
    import struct as _struct
    import zlib as _zlib

    pos = 8
    out = bytearray(buf[:8])
    while pos < len(buf):
        (ln,) = _struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        if typ == b"IDAT":
            data = new_idat
        out += _struct.pack(">I", len(data)) + typ + data
        out += _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
        pos += 12 + ln
    return bytes(out)


def test_bmp_roundtrip_and_dispatch():
    from odin_rs_spark.sources.imagecodec import decode_bmp, encode_bmp

    g = ((np.arange(13)[:, None] * 7 + np.arange(17)[None, :] * 11) % 256).astype(
        np.uint8
    )
    assert np.array_equal(decode_bmp(encode_bmp(g)), g)
    c = np.zeros((5, 6, 3), np.uint8)
    c[..., 0] = 10
    c[2, 3] = [1, 2, 3]
    assert np.array_equal(decode_bmp(encode_bmp(c)), c)
    for wv in (1, 2, 3, 5):  # row padding boundaries
        a = (np.arange(4 * wv).reshape(4, wv) % 256).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a)
    # magic dispatch through decode_image
    assert np.array_equal(decode_image(encode_bmp(g)), g)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX")
    with pytest.raises(ValueError, match="runs past"):
        decode_bmp(encode_bmp(g)[:-20])
    with pytest.raises(ValueError, match="unsupported BMP"):
        bad = bytearray(encode_bmp(g))
        bad[28] = 4  # 4-bit
        decode_bmp(bytes(bad))
