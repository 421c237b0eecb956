"""GRIB2 simple-packing reader/writer (S11 decode path): roundtrips,
negative-coordinate sign-magnitude encoding, bitmaps, unsupported
templates, odd bit widths, and the Spark cell fan-out with the
in-kernel predicate."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

import odin_rs_spark
from odin_rs_spark.sources.grib2 import (
    grib2_grid_cells,
    parse_grib2,
    write_grib2,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
    "sources",
    "fixtures",
    "wind_t50.grib2",
)


def test_roundtrip_exact(tmp_path):
    jj, ii = np.mgrid[0:7, 0:9]
    vals = ((ii * 11 + jj * 13) % 97) * 0.125  # dyadic with E=-3
    p = str(tmp_path / "t.grib2")
    write_grib2(p, vals, lat0=-45.5, lon0=10.0, dlat=0.5, dlon=1.0,
                e_scale=-3, d_scale=0, r_ref=0.0, nbits=8)
    g = parse_grib2(open(p, "rb").read())
    assert np.array_equal(g["values"], vals)
    # negative first-lat survives the sign-magnitude encoding
    assert g["lat0"] == -45.5 and g["lon0"] == 10.0
    assert g["dlat"] == 0.5 and g["dlon"] == 1.0


def test_odd_bit_width(tmp_path):
    """nbits that doesn't divide 8 exercises the bit-stream unpack."""
    jj, ii = np.mgrid[0:5, 0:6]
    vals = ((ii + jj * 6) % 30).astype(float)  # needs 5 bits
    p = str(tmp_path / "t5.grib2")
    write_grib2(p, vals, lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0, nbits=5)
    assert np.array_equal(parse_grib2(open(p, "rb").read())["values"], vals)


def test_decimal_scale(tmp_path):
    jj, ii = np.mgrid[0:3, 0:4]
    vals = ((ii + jj) % 7) / 10.0  # D=1: X = v*10 integers
    p = str(tmp_path / "td.grib2")
    write_grib2(p, vals, lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0,
                e_scale=0, d_scale=1, nbits=4)
    g = parse_grib2(open(p, "rb").read())
    assert np.allclose(g["values"], vals, rtol=0, atol=1e-12)


def test_bad_magic_and_unsupported():
    with pytest.raises(ValueError, match="bad magic"):
        parse_grib2(b"NOPE" + b"\x00" * 32)
    buf = bytearray(open(FIXTURE, "rb").read())
    buf[7] = 1  # edition 1
    with pytest.raises(ValueError, match="GRIB2 only"):
        parse_grib2(bytes(buf))


def test_unsupported_packing_template_raises(tmp_path):
    p = str(tmp_path / "t.grib2")
    write_grib2(p, np.zeros((2, 2)), lat0=0, lon0=0, dlat=1, dlon=1, nbits=1)
    buf = bytearray(open(p, "rb").read())
    # find section 5 and flip its template number to 5.40 (JPEG2000)
    pos = 16
    while pos < len(buf) - 4:
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        if buf[pos + 4] == 5:
            struct.pack_into(">H", buf, pos + 9, 40)
            break
        pos += ln
    with pytest.raises(ValueError, match=r"5\.40 unsupported"):
        parse_grib2(bytes(buf))


def test_fixture_matches_formula():
    g = parse_grib2(open(FIXTURE, "rb").read())
    jj, ii = np.mgrid[0:20, 0:24]
    assert np.array_equal(g["values"], ((ii * 5 + jj * 3) % 50) * 0.25 + 0.5)
    assert g["param"] == (0, 2, 2)


def test_spark_cells_predicate_in_kernel(spark):
    files = spark.read.format("binaryFile").load(FIXTURE)
    all_cells = grib2_grid_cells(files)
    kept = grib2_grid_cells(files, value_min=5.0)
    assert all_cells.count() == 24 * 20
    rows = kept.collect()
    assert 0 < len(rows) < 24 * 20
    for r in rows[:20]:
        assert r["value"] >= 5.0
        assert r["value"] == ((r["x"] * 5 + r["y"] * 3) % 50) * 0.25 + 0.5
        assert r["lat"] == 30.0 + r["y"] * 0.125
        assert r["lon"] == -100.0 + r["x"] * 0.25


def test_north_to_south_scan_mode(tmp_path):
    """Real products (GFS/HRRR) scan rows north→south (mode 0x00): the
    writer encodes a negative dlat via the flags and the reader must
    return DESCENDING latitudes — not mirror them positive."""
    jj, ii = np.mgrid[0:4, 0:3]
    vals = (ii + jj * 3).astype(float)
    p = str(tmp_path / "n2s.grib2")
    write_grib2(p, vals, lat0=50.0, lon0=0.0, dlat=-0.5, dlon=1.0, nbits=4)
    g = parse_grib2(open(p, "rb").read())
    assert g["dlat"] == -0.5 and g["lat0"] == 50.0
    assert (g["scan"] & 0x40) == 0
    assert np.array_equal(g["values"], vals)  # row order preserved
    # negative lon direction flag too
    p2 = str(tmp_path / "wlon.grib2")
    write_grib2(p2, vals, lat0=0.0, lon0=10.0, dlat=0.5, dlon=-1.0, nbits=4)
    g2 = parse_grib2(open(p2, "rb").read())
    assert g2["dlon"] == -1.0 and (g2["scan"] & 0x80)


def test_zero_section_length_raises_not_loops(tmp_path):
    """A section length mutated to 0 must raise, not spin forever
    (pos += sec_len would never advance — found by the byte fuzzer)."""
    p = str(tmp_path / "z.grib2")
    write_grib2(p, np.zeros((2, 2)), lat0=0, lon0=0, dlat=1, dlon=1, nbits=1)
    buf = bytearray(open(p, "rb").read())
    struct.pack_into(">I", buf, 16, 0)  # first section's length → 0
    with pytest.raises(ValueError, match="section length"):
        parse_grib2(bytes(buf))
