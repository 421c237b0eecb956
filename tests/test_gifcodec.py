"""GIF codec (sources/gifcodec): LZW both directions (variable width,
12-bit cap + re-CLEAR), 4-pass interlace, palettes, multi-frame walk,
named errors, and the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from odin_rs_spark.sources.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frames,
)
from odin_rs_spark.sources.imagecodec import decode_image


def _grad(h, w):
    return ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 11) % 256).astype(
        np.uint8
    )


def test_lzw_roundtrip_with_width_growth_and_recler():
    # enough distinct phrases to cross several width bumps and the
    # 12-bit re-CLEAR
    data = bytes((i * 31 + (i >> 3)) % 256 for i in range(20000))
    enc = _lzw_encode(data, 8)
    assert bytes(_lzw_decode(enc, 8, len(data))) == data
    assert len(enc) < len(data)  # it actually compresses this stream
    with pytest.raises(ValueError, match="ended before EOI"):
        _lzw_decode(enc[:10], 8, len(data))


def test_gray_and_rgb_roundtrip_plain_and_interlaced():
    g = _grad(24, 31)
    img = np.zeros((10, 13, 3), np.uint8)
    img[::2] = [255, 0, 0]
    img[1::2] = [0, 128, 255]
    img[3, 5] = [7, 7, 7]
    for interlace in (False, True):
        got = decode_gif(encode_gif(g, interlace=interlace))
        assert got.shape == (24, 31, 3)
        for c in range(3):  # identity gray palette
            assert np.array_equal(got[:, :, c], g)
        assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)


def test_multi_frame_walk_and_extension_skip():
    a, b = _grad(8, 9), (_grad(8, 9) // 2)
    ga, gb = encode_gif(a), encode_gif(b)
    # splice: header+GCT+frame of a, a GCE extension, frame of b, trailer
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = ga[:-1] + gce + gb[13 + 768 : ]
    frames = gif_frames(spliced)
    assert len(frames) == 2
    assert np.array_equal(frames[0][:, :, 0], a)
    assert np.array_equal(frames[1][:, :, 0], b)


def test_named_errors():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF00")
    big = encode_gif(_grad(50, 50))
    with pytest.raises(ValueError, match="corrupt GIF|LZW|no image"):
        decode_gif(big[: len(big) // 2])  # cut mid LZW stream
    g = encode_gif(_grad(6, 6))
    with pytest.raises(ValueError, match="unexpected block"):
        gif_frames(g[: 13 + 768] + b"\x99" + g[13 + 768 :])
    with pytest.raises(ValueError, match="> 256"):
        ys, xs = np.mgrid[0:20, 0:20]
        rainbow = np.stack([ys, xs, ys + xs], axis=2).astype(np.uint8)
        encode_gif(rainbow)  # 400 distinct (y, x, y+x) colors


def test_decode_image_dispatch():
    g = _grad(12, 12)
    got = decode_image(encode_gif(g))
    assert got.shape == (12, 12, 3) and np.array_equal(got[:, :, 1], g)
