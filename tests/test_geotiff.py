"""GeoTIFF reader/writer (sources/geotiff.py): hand-derived IFD bytes,
per-dtype roundtrips, georeferencing math, nodata, corruption contract,
byte-order handling, and the Spark DEM scan."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from odin_rs_spark.sources.geotiff import (
    geotiff_grid_cells,
    parse_geotiff,
    write_geotiff,
)


def test_hand_built_minimal_tiff():
    """A 2x2 8-bit TIFF assembled field-by-field from the spec — no
    writer involved: header, one IFD with inline values, strip data,
    GeoTIFF scale/tiepoint doubles."""
    # layout: header(8) | IFD | doubles | strip
    entries = []

    def e(tag, typ, cnt, val4):
        entries.append(struct.pack("<HHI", tag, typ, cnt) + val4)

    n = 11
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n + 4
    scale_off = after_ifd
    tie_off = scale_off + 3 * 8
    strip_off = tie_off + 6 * 8
    e(256, 4, 1, struct.pack("<I", 2))  # width
    e(257, 4, 1, struct.pack("<I", 2))  # length
    e(258, 3, 1, struct.pack("<HH", 8, 0))
    e(259, 3, 1, struct.pack("<HH", 1, 0))
    e(262, 3, 1, struct.pack("<HH", 1, 0))
    e(273, 4, 1, struct.pack("<I", strip_off))
    e(277, 3, 1, struct.pack("<HH", 1, 0))
    e(278, 4, 1, struct.pack("<I", 2))
    e(279, 4, 1, struct.pack("<I", 4))
    e(33550, 12, 3, struct.pack("<I", scale_off))
    e(33922, 12, 6, struct.pack("<I", tie_off))
    buf = b"II*\x00" + struct.pack("<I", ifd_off)
    buf += struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
    buf += struct.pack("<3d", 0.5, 0.25, 0.0)  # pixel scale sx, sy
    buf += struct.pack("<6d", 0, 0, 0, 10.0, 50.0, 0)  # tiepoint
    buf += bytes([7, 8, 9, 10])  # strip
    g = parse_geotiff(buf)
    assert g["ni"] == 2 and g["nj"] == 2
    assert np.array_equal(g["values"], [[7, 8], [9, 10]])
    assert (g["lon0"], g["lat0"], g["dlon"], g["dlat"]) == (10.0, 50.0, 0.5, -0.25)


def test_roundtrips_per_dtype_and_multistrip_read():
    import tempfile

    v = np.arange(30, dtype=np.float64).reshape(5, 6)
    for dt in ("u1", "u2", "i2", "f4"):
        p = tempfile.mktemp(suffix=".tif")
        write_geotiff(p, v if dt != "i2" else v - 10, 1, 2, -0.5, 0.5, dtype=dt)
        g = parse_geotiff(open(p, "rb").read())
        want = v if dt != "i2" else v - 10
        assert np.array_equal(g["values"], want), dt


def test_nodata_and_nonzero_tiepoint():
    import tempfile

    v = np.array([[1.0, np.nan], [3.0, 4.0]])
    p = tempfile.mktemp(suffix=".tif")
    write_geotiff(p, v, lat0=5.0, lon0=6.0, dlat=-1.0, dlon=1.0,
                  dtype="f4", nodata=-1.0)
    g = parse_geotiff(open(p, "rb").read())
    assert np.isnan(g["values"][0, 1]) and g["nodata"] == -1.0
    assert g["values"][1, 1] == 4.0
    # NaN without nodata must refuse, not silently corrupt
    with pytest.raises(ValueError, match="nodata"):
        write_geotiff(p, v, 0, 0, -1, 1, dtype="f4")


def test_corrupt_and_unsupported_raise():
    import tempfile

    p = tempfile.mktemp(suffix=".tif")
    write_geotiff(p, np.ones((3, 3)), 0, 0, -1, 1, dtype="u1")
    good = open(p, "rb").read()
    with pytest.raises(ValueError, match="byte-order"):
        parse_geotiff(b"XX*\x00" + good[4:])
    # BigTIFF with an unsupported offset size rejects by name; a
    # classic body behind a BigTIFF magic is a plain ValueError
    with pytest.raises(ValueError, match="BigTIFF"):
        parse_geotiff(b"II+\x00" + struct.pack("<HHQ", 4, 0, 16) + good[4:])
    with pytest.raises(ValueError):
        parse_geotiff(b"II+\x00" + good[4:])
    # unsupported compression scheme (7 = old JPEG) rejected by name
    bad = bytearray(good)
    for off in range(10, len(bad) - 12, 12):
        if struct.unpack("<H", bad[off : off + 2])[0] == 259:
            comp_off = off + 8
            struct.pack_into("<H", bad, comp_off, 7)
            break
    with pytest.raises(ValueError, match="compression 7"):
        parse_geotiff(bytes(bad))
    # flipping an UNCOMPRESSED strip to LZW must be a ValueError from
    # the LZW decoder (short/garbage stream), never a crash
    bad_lzw = bytearray(good)
    struct.pack_into("<H", bad_lzw, comp_off, 5)
    with pytest.raises(ValueError):
        parse_geotiff(bytes(bad_lzw))
    # strip bytes inconsistent with the declared raster (fuzzer class:
    # checked BEFORE allocation)
    bad2 = bytearray(good)
    for off in range(10, len(bad2) - 12, 12):
        if struct.unpack("<H", bad2[off : off + 2])[0] == 256:
            struct.pack_into("<I", bad2, off + 8, 2_000_000)
            break
    with pytest.raises(ValueError, match="decodes to|past the file|out of bounds"):
        parse_geotiff(bytes(bad2))


def test_spark_dem_scan_nodata_and_predicate(spark, tmp_path):
    p = str(tmp_path / "dem.tif")
    v = np.array([[10.0, np.nan, 30.0], [40.0, 50.0, 60.0]])
    write_geotiff(p, v, lat0=2.0, lon0=100.0, dlat=-1.0, dlon=1.0,
                  dtype="f4", nodata=-9999.0)
    files = spark.read.format("binaryFile").load(p)
    rows = geotiff_grid_cells(files, value_min=30.0).collect()
    got = {(r.x, r.y): (r.value, r.lon, r.lat) for r in rows}
    # nodata cell and the 10.0 cell are gone; georeferencing checks out
    assert set(got) == {(2, 0), (0, 1), (1, 1), (2, 1)}
    assert got[(2, 0)] == (30.0, 102.0, 2.0)
    assert got[(1, 1)] == (50.0, 101.0, 1.0)


class TestCompressedTiled:
    """r11: tiled layout + DEFLATE/LZW + horizontal predictor — the
    shape real DEM tilesets ship (GDAL's default tiled writer)."""

    @pytest.mark.parametrize(
        "kw",
        [
            dict(dtype="f4", compression="deflate"),
            dict(dtype="f4", compression="lzw"),
            dict(dtype="i2", compression="deflate", predictor=2),
            dict(dtype="u2", compression="lzw", predictor=2),
            dict(dtype="u1", compression="lzw", predictor=2),
            dict(dtype="f4", compression="none", tile=(16, 16)),
            dict(dtype="f4", compression="deflate", tile=(16, 16)),
            dict(dtype="i2", compression="deflate", predictor=2, tile=(32, 8)),
            dict(dtype="u2", compression="lzw", predictor=2, tile=(16, 16)),
        ],
    )
    def test_roundtrip_matrix(self, tmp_path, kw):
        # 40x25 with non-tile-aligned edges exercises tile padding/crop
        v = ((np.arange(40 * 25).reshape(25, 40) * 13) % 251).astype(float)
        p = str(tmp_path / "t.tif")
        write_geotiff(p, v, lat0=37.0, lon0=-120.0, dlat=-0.01, dlon=0.01, **kw)
        g = parse_geotiff(open(p, "rb").read())
        assert (g["nj"], g["ni"]) == (25, 40)
        assert np.array_equal(g["values"], v)
        assert abs(g["lat0"] - 37.0) < 1e-12 and abs(g["lon0"] + 120.0) < 1e-12

    def test_lzw_core_crosses_width_boundaries(self):
        from odin_rs_spark.sources.geotiff import _lzw_decode, _lzw_encode

        rng = np.random.RandomState(11)
        for size in (0, 1, 255, 2000, 50000):
            for data in (
                rng.randint(0, 256, size).astype(np.uint8).tobytes(),
                bytes(np.arange(size) % 5),  # highly compressible
            ):
                assert _lzw_decode(_lzw_encode(data), len(data)) == data

    def test_lzw_output_bound_is_a_valueerror(self):
        from odin_rs_spark.sources.geotiff import _lzw_decode, _lzw_encode

        enc = _lzw_encode(b"abcabcabc" * 50)
        with pytest.raises(ValueError, match="exceeds"):
            _lzw_decode(enc, 10)

    def test_predictor_on_float_rejected_by_name(self, tmp_path):
        with pytest.raises(ValueError, match="predictor"):
            write_geotiff(
                str(tmp_path / "x.tif"), np.ones((4, 4)), 0, 0, -1, 1,
                dtype="f4", predictor=2,
            )

    def test_committed_mosaic_fixtures_replay_their_formulas(self):
        import os

        import odin_rs_spark

        fixdir = os.path.join(
            os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
            "sources", "fixtures",
        )
        jj, ii = np.mgrid[0:64, 0:96]
        for name, h, nd in (
            ("dem_tile_a.tif", (ii * 17 + jj * 23) % 700, (ii + 2 * jj) % 13 == 7),
            ("dem_tile_b.tif", (ii * 29 + jj * 31) % 900, (3 * ii + jj) % 11 == 4),
        ):
            g = parse_geotiff(open(os.path.join(fixdir, name), "rb").read())
            assert np.array_equal(np.isnan(g["values"]), nd)
            assert np.array_equal(g["values"][~nd], h.astype(float)[~nd])

    def test_tiled_mutation_fuzz_valueerror_only(self, tmp_path):
        v = ((np.arange(48 * 32).reshape(32, 48) * 7) % 300).astype(float)
        p = str(tmp_path / "m.tif")
        write_geotiff(
            p, v, lat0=1.0, lon0=2.0, dlat=-0.5, dlon=0.5,
            dtype="i2", compression="deflate", predictor=2, tile=(16, 16),
        )
        buf = open(p, "rb").read()
        for off in range(0, len(buf), 7):
            m = bytearray(buf)
            m[off] ^= 0xFF
            try:
                parse_geotiff(bytes(m))
            except ValueError:
                pass  # the only allowed failure mode

    def test_truncation_ladder_valueerror_only(self, tmp_path):
        v = np.ones((20, 20))
        p = str(tmp_path / "t.tif")
        write_geotiff(p, v, 0, 0, -1, 1, dtype="u2",
                      compression="lzw", predictor=2, tile=(16, 16))
        buf = open(p, "rb").read()
        for cut in range(0, len(buf), 11):
            try:
                parse_geotiff(buf[:cut])
            except ValueError:
                pass

    @pytest.mark.parametrize(
        "kw",
        [
            dict(compression="deflate", predictor=3),
            dict(compression="lzw", predictor=3),
            dict(compression="deflate", predictor=3, tile=(16, 16)),
            dict(compression="none", predictor=3),
        ],
    )
    def test_float_predictor3_roundtrip(self, tmp_path, kw):
        # TIFF TechNote 3 floating-point predictor: big-endian byte
        # planes + byte differencing — what GDAL float DEMs ship
        v = (np.sin(np.arange(40 * 25).reshape(25, 40) / 7.0)
             * 1234.5).astype(np.float32).astype(float)
        p = str(tmp_path / "fp3.tif")
        write_geotiff(p, v, 37.0, -120.0, -0.01, 0.01, dtype="f4", **kw)
        g = parse_geotiff(open(p, "rb").read())
        assert np.array_equal(g["values"], v)

    def test_predictor3_on_int_rejected_by_name(self, tmp_path):
        with pytest.raises(ValueError, match="float"):
            write_geotiff(str(tmp_path / "x.tif"), np.ones((4, 4)),
                          0, 0, -1, 1, dtype="i2", predictor=3)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(dtype="f4", compression="deflate", predictor=3),
            dict(dtype="i2", compression="lzw", predictor=2, tile=(16, 16)),
            dict(dtype="u2", compression="none"),
        ],
    )
    def test_bigtiff_roundtrip(self, tmp_path, kw):
        # BigTIFF (magic 43, 8-byte offsets) — the >4 GB mosaic form
        v = ((np.arange(40 * 25).reshape(25, 40) * 13) % 251).astype(float)
        p = str(tmp_path / "big.tif")
        write_geotiff(p, v, lat0=37.0, lon0=-120.0, dlat=-0.01, dlon=0.01,
                      bigtiff=True, **kw)
        buf = open(p, "rb").read()
        assert buf[:4] == b"II+\x00"
        g = parse_geotiff(buf)
        assert np.array_equal(g["values"], v)
        assert abs(g["lat0"] - 37.0) < 1e-12

    def test_bigtiff_mutation_fuzz_valueerror_only(self, tmp_path):
        v = np.ones((20, 20))
        p = str(tmp_path / "bm.tif")
        write_geotiff(p, v, 0, 0, -1, 1, dtype="u2", compression="deflate",
                      predictor=2, bigtiff=True, tile=(16, 16))
        buf = open(p, "rb").read()
        for off in range(0, len(buf), 9):
            m = bytearray(buf)
            m[off] ^= 0xFF
            try:
                parse_geotiff(bytes(m))
            except ValueError:
                pass
