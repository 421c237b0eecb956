"""JPEG 2000 codec (sources/j2kcodec, the GRIB2 DRT 5.40 seam):
layer-by-layer property tests — MQ coder, packet-header bit I/O with
0xFF stuffing, tag trees, 5/3 DWT perfect reconstruction, Tier-1
code-block round trips per band type, full codestream round trips
across sizes/depths/levels — plus GRIB2 5.40 integration on the
committed fixture and the fuzz discipline."""

from __future__ import annotations

import os
import random
import struct

import numpy as np
import pytest

import odin_rs_spark
from odin_rs_spark.sources.j2kcodec import (
    BitReader,
    BitWriter,
    BlockDecoder,
    BlockEncoder,
    MQDecoder,
    MQEncoder,
    TagTree,
    decode_j2k,
    dwt53_forward,
    dwt53_inverse,
    encode_j2k,
)

FIX = os.path.join(
    os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
    "sources", "fixtures",
)


class TestMQ:
    def test_random_roundtrips(self):
        random.seed(42)
        for _ in range(30):
            seq = [(random.randrange(19), random.randrange(2))
                   for _ in range(random.randint(1, 1500))]
            enc = MQEncoder()
            for cx, d in seq:
                enc.encode(cx, d)
            dec = MQDecoder(enc.flush())
            assert all(dec.decode(cx) == d for cx, d in seq)

    def test_skewed_compresses(self):
        random.seed(1)
        seq = [(random.randrange(19), 1 if random.random() < 0.97 else 0)
               for _ in range(8000)]
        enc = MQEncoder()
        for cx, d in seq:
            enc.encode(cx, d)
        data = enc.flush()
        assert len(data) < 8000 // 16  # adaptive coder really adapts
        dec = MQDecoder(data)
        assert all(dec.decode(cx) == d for cx, d in seq)

    def test_carry_and_ff_paths(self):
        # all-LPS-ish patterns drive byteout carries and FF stuffing
        enc = MQEncoder()
        for i in range(4000):
            enc.encode(0, i % 2)
        data = enc.flush()
        dec = MQDecoder(data)
        assert all(dec.decode(0) == (i % 2) for i in range(4000))
        # no 0xFF byte is followed by > 0x8F inside a segment
        for a, b in zip(data, data[1:]):
            if a == 0xFF:
                assert b <= 0x8F


class TestBIO:
    def test_stuffing_roundtrip(self):
        random.seed(9)
        for _ in range(100):
            bits = [random.randrange(2) for _ in range(random.randint(0, 99))]
            bw = BitWriter()
            for b in bits:
                bw.write(b)
            br = BitReader(bw.flush())
            assert [br.read() for _ in bits] == bits
            br.align()

    def test_all_ones_stuff(self):
        bw = BitWriter()
        for _ in range(64):
            bw.write(1)
        data = bw.flush()
        for a, b in zip(data, data[1:]):
            if a == 0xFF:
                assert not (b & 0x80)
        br = BitReader(data)
        assert all(br.read() == 1 for _ in range(64))


class TestTagTree:
    def test_incremental_thresholds(self):
        random.seed(5)
        for _ in range(25):
            w, h = random.randint(1, 6), random.randint(1, 6)
            vals = [[random.randint(0, 5) for _ in range(w)]
                    for _ in range(h)]
            enc = TagTree(w, h)
            enc.set_values(vals)
            bw = BitWriter()
            sched = [(x, y, t) for t in range(1, 8)
                     for y in range(h) for x in range(w)]
            for x, y, t in sched:
                enc.encode(bw, x, y, t)
            dec = TagTree(w, h)
            br = BitReader(bw.flush())
            for x, y, t in sched:
                known = dec.decode(br, x, y, t)
                assert known == (vals[y][x] < t)
                if known:
                    assert dec.leaf_value(x, y) == vals[y][x]


class TestDWT:
    def test_perfect_reconstruction(self):
        np.random.seed(11)
        for h, w, lv in [(1, 1, 1), (1, 9, 2), (7, 1, 2), (5, 5, 3),
                         (16, 12, 4), (33, 31, 5), (64, 48, 3)]:
            img = np.random.randint(-1000, 1000, size=(h, w))
            back = dwt53_inverse(dwt53_forward(img, lv), (h, w))
            assert np.array_equal(back, img), (h, w, lv)


class TestTier1:
    def test_block_roundtrips_all_bands(self):
        random.seed(13)
        np.random.seed(13)
        for band in ("ll", "lh", "hl", "hh"):
            for _ in range(6):
                h, w = random.randint(1, 64), random.randint(1, 64)
                c = np.random.choice(
                    [0, 0, 0, 0, 1, -1, 3, -3, 100, -77, 2000],
                    size=(h, w),
                )
                data, numbps, npasses = BlockEncoder(c, band).encode()
                got = BlockDecoder(data, w, h, band, numbps, npasses).decode()
                assert np.array_equal(got, c), (band, h, w)

    def test_zero_block(self):
        c = np.zeros((8, 8), int)
        data, numbps, npasses = BlockEncoder(c, "hh").encode()
        assert numbps == 0 and npasses == 0 and data == b""


class TestCodestream:
    def test_roundtrips(self):
        random.seed(17)
        np.random.seed(17)
        for _ in range(8):
            h, w = random.randint(5, 90), random.randint(5, 90)
            depth = random.choice([6, 8, 12, 16])
            img = np.random.randint(0, 1 << depth, size=(h, w))
            lv = random.randint(1, 4)
            buf = encode_j2k(img, levels=lv,
                             cb_exp=random.choice([4, 5, 6]))
            assert np.array_equal(decode_j2k(buf), img)

    def test_smooth_field_compresses(self):
        yy, xx = np.mgrid[0:64, 0:96]
        img = ((xx * 3 + yy * 2) % 256).astype(np.int64)
        buf = encode_j2k(img, levels=4)
        assert len(buf) < img.size  # < 1 byte/sample on smooth data
        assert np.array_equal(decode_j2k(buf), img)

    def test_named_rejections(self):
        img = np.arange(64, dtype=np.int64).reshape(8, 8)
        buf = bytearray(encode_j2k(img, levels=1))
        i = buf.find(b"\xff\x52")  # COD
        wav_off = i + 2 + 2 + 5 + 4  # marker+Lcod+Scod/SG+levels..style
        assert buf[wav_off] == 1
        buf[wav_off] = 0  # 9/7 irreversible
        with pytest.raises(ValueError, match="9/7"):
            decode_j2k(bytes(buf))
        with pytest.raises(ValueError, match="SOC"):
            decode_j2k(b"\x00\x00junk")

    def test_fuzz_valueerror_only(self):
        yy, xx = np.mgrid[0:24, 0:32]
        buf = encode_j2k(((xx * 37 + yy * 23) % 89), levels=2)
        for cut in range(0, len(buf), 9):
            try:
                decode_j2k(buf[:cut])
            except ValueError:
                pass
        for pos in range(0, len(buf), 5):
            mb = bytearray(buf)
            mb[pos] ^= 0xFF
            try:
                decode_j2k(bytes(mb))
            except ValueError:
                pass


class TestGrib2Integration:
    def test_committed_fixture_exact(self):
        from odin_rs_spark.sources.grib2 import parse_grib2

        msg = parse_grib2(
            open(os.path.join(FIX, "wind_j2k.grib2"), "rb").read()
        )
        yy, xx = np.mgrid[0:48, 0:64]
        vals = ((xx * 37 + yy * 23) % 97) * 0.25 - 10.0
        assert np.array_equal(msg["values"], vals)
        assert msg["lat0"] == 40.0 and msg["lon0"] == -105.0

    def test_twin_roundtrip_and_lossy_rejection(self, tmp_path):
        from odin_rs_spark.sources.grib2 import (
            parse_grib2,
            write_grib2_jpeg2000,
        )

        np.random.seed(23)
        vals = np.random.randint(0, 4000, size=(20, 30)) * 0.01
        p = str(tmp_path / "t.grib2")
        write_grib2_jpeg2000(p, vals, 10.0, 20.0, -0.5, 0.5,
                             e_scale=0, d_scale=2, nbits=12)
        msg = parse_grib2(open(p, "rb").read())
        assert np.allclose(msg["values"], vals, atol=1e-12)
        buf = bytearray(open(p, "rb").read())
        # an UNKNOWN DRT octet-22 compression type (2) -> named reject
        # (0 = lossless and 1 = lossy both decode as of r11)
        i = buf.find(b"\x00\x28")  # template 5.40 big-endian in sec 5
        assert i > 0
        buf[i + 12] = 2
        with pytest.raises(ValueError, match="compression type"):
            parse_grib2(bytes(buf))

    def test_grid_cells_fanout(self, spark):
        from odin_rs_spark.sources.grib2 import grib2_grid_cells

        files = spark.read.format("binaryFile").load(
            os.path.join(FIX, "wind_j2k.grib2")
        )
        n = grib2_grid_cells(files).count()
        assert n == 48 * 64


class TestLossy97:
    """r11: 9/7 irreversible wavelet + Annex-E scalar quantization
    (Sqcd styles 1 and 2) — the lossy DRT 5.40 profile."""

    def _field(self):
        jj, ii = np.mgrid[0:48, 0:64]
        return (2000 + 800 * np.sin(ii / 9.0)
                + 500 * np.cos(jj / 7.0)).astype(np.int64)

    def test_dwt97_perfect_reconstruction(self):
        from odin_rs_spark.sources.j2kcodec import dwt97_forward, dwt97_inverse

        rng = np.random.RandomState(3)
        for shape in ((2, 2), (5, 9), (17, 23), (64, 48)):
            img = rng.randn(*shape) * 50
            for lv in (1, 2, 3):
                assert np.allclose(
                    dwt97_inverse(dwt97_forward(img, lv), shape), img,
                    atol=1e-8,
                )

    def test_dwt97_dc_gain_is_one(self):
        from odin_rs_spark.sources.j2kcodec import _fwd97_1d

        lo, hi = _fwd97_1d(np.full(32, 7.5))
        assert np.allclose(lo, 7.5, atol=1e-9)
        assert np.allclose(hi, 0.0, atol=1e-9)

    @pytest.mark.parametrize("qstep,tol", [(0.5, 2.0), (2.0, 5.0), (8.0, 16.0)])
    def test_error_bounded_by_step(self, qstep, tol):
        img = self._field()
        buf = encode_j2k(img, levels=3, wavelet="9/7", qstep=qstep)
        out = decode_j2k(buf)
        assert np.abs(out.astype(float) - img).max() <= tol
        # lossy beats lossless on size for any real step
        assert len(buf) < len(encode_j2k(img, levels=3))

    def test_derived_style1_roundtrip(self):
        img = self._field()
        buf = encode_j2k(img, levels=3, wavelet="9/7", qstep=1.0, qcd_style=1)
        out = decode_j2k(buf)
        assert np.abs(out.astype(float) - img).max() <= 8.0
        # QCD marker really is style 1 with a single 16-bit step
        i = buf.find(b"\xff\x5c")
        ln = struct.unpack(">H", buf[i + 2 : i + 4])[0]
        assert ln == 5 and (buf[i + 4] & 0x1F) == 1

    def test_decode_deterministic(self):
        img = self._field()
        buf = encode_j2k(img, levels=3, wavelet="9/7", qstep=1.0)
        assert decode_j2k(buf).tobytes() == decode_j2k(buf).tobytes()

    def test_97_without_quantization_rejected(self):
        img = self._field()
        buf = bytearray(encode_j2k(img, levels=3, wavelet="9/7", qstep=1.0))
        # splice in a style-0 QCD: flip Sqcd low bits to 0
        i = buf.find(b"\xff\x5c")
        buf[i + 4] &= 0xE0
        with pytest.raises(ValueError):
            decode_j2k(bytes(buf))

    def test_lossy_mutation_fuzz_valueerror_only(self):
        img = self._field()[:16, :16]
        buf = encode_j2k(img, levels=2, wavelet="9/7", qstep=1.0)
        for off in range(0, len(buf), 3):
            m = bytearray(buf)
            m[off] ^= 0xFF
            try:
                decode_j2k(bytes(m))
            except ValueError:
                pass  # the only allowed failure mode

    def test_grib2_lossy_twin_and_fixture(self):
        from odin_rs_spark.sources.grib2 import (
            parse_grib2,
            write_grib2_jpeg2000,
        )
        import tempfile

        jj, ii = np.mgrid[0:20, 0:30]
        vals = ((ii * 3 + jj * 5) % 97).astype(float) * 0.25
        p = tempfile.mktemp(suffix=".grib2")
        write_grib2_jpeg2000(p, vals, 10.0, 20.0, -0.5, 0.5, e_scale=-2,
                             nbits=8, lossy=True, qstep=1.0)
        g = parse_grib2(open(p, "rb").read())
        assert np.abs(g["values"] - vals).max() <= 1.0
        # committed fixture decodes with the pinned max error
        fx = os.path.join(FIX, "hrrr_lossy.grib2")
        gf = parse_grib2(open(fx, "rb").read())
        jj, ii = np.mgrid[0:64, 0:96]
        exact = ((3 * ii * ii + 5 * jj * jj + 7 * ii * jj) % 4096) * 0.25
        assert np.abs(gf["values"] - exact).max() == 0.5
