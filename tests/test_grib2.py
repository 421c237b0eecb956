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
    # find section 5 and flip its template number to 5.4 (IEEE float,
    # genuinely unsupported; 5.40 became a REAL decode in r10)
    pos = 16
    while pos < len(buf) - 4:
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        if buf[pos + 4] == 5:
            struct.pack_into(">H", buf, pos + 9, 4)
            break
        pos += ln
    with pytest.raises(ValueError, match=r"5\.4 unsupported"):
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


# ---------------------------------------------------------------------------
# Complex packing (DRT 5.2/5.3) — what production HRRR granules carry.
# The message below is HAND-PACKED octet by octet from WMO FM 92 tables
# (DRT 5.3, data template 7.3), NOT produced by this repo's writer, so a
# symmetric encode/decode bug cannot hide (the test_netcdf3.py:35
# pattern, per VERDICT r4 #1).
# ---------------------------------------------------------------------------


def _hand_packed_53_message() -> bytes:
    """1×6 grid, f = [10, 12, 17, 19, 26, 30], E=D=0, R=0, 2nd-order
    spatial differencing. Derivation (by hand):
      d1 = [2, 5, 2, 7, 4]; d2 = [3, -3, 5, -3]; gmin = -3
      packed field (k>=2) = d2 - gmin = [6, 0, 8, 0]; k<2 packed as 0
      groups of 3: [0,0,6] ref 0 width 3; [0,8,0] ref 0 width 4
      nbits(refs)=2, wref=3, wbits=1 (scaled widths [0,1]),
      lref=3, linc=1, lbits=0, last_len=3
      descriptors (ods=1, sign-magnitude): 0x0A (10), 0x0C (12),
      0x83 (-3)
      group refs octet: 00 00 pad -> 0x00
      scaled widths octet: 0 1 pad -> 0x40
      data bits: 000 000 110 | 0000 1000 0000, padded ->
      0x03 0x04 0x00
    """
    sec0 = b"GRIB\x00\x00" + bytes([0, 2])  # discipline 0, edition 2
    sec1 = (
        struct.pack(">IB", 21, 1)
        + struct.pack(">HHBBB", 0, 0, 2, 1, 1)
        + struct.pack(">HBBBBB", 2024, 1, 1, 0, 0, 0)
        + bytes([0, 1])
    )
    sec3 = (
        struct.pack(">IB", 72, 3)
        + bytes([0])                       # source of grid definition
        + struct.pack(">I", 6)             # number of data points
        + bytes([0, 0])
        + struct.pack(">H", 0)             # template 3.0
        + bytes(16)                        # earth shape octets 15-30
        + struct.pack(">II", 6, 1)         # Ni=6, Nj=1
        + bytes(8)                         # basic angle octets 39-46
        + struct.pack(">I", 40_000_000)    # La1 = 40.0
        + struct.pack(">I", 0x80000000 | 100_000_000)  # Lo1 = -100.0 (sign-mag)
        + bytes([0x30])                    # resolution/component flags
        + struct.pack(">II", 40_000_000, 0x80000000 | 97_500_000)  # La2, Lo2
        + struct.pack(">II", 500_000, 500_000)  # Di, Dj magnitudes
        + bytes([0x40])                    # scan: +i, +j
    )
    sec4 = (
        struct.pack(">IBH", 34, 4, 0)
        + struct.pack(">H", 0)
        + bytes([2, 2])
        + bytes(23)
    )
    sec5 = (
        struct.pack(">IBI", 49, 5, 6)      # length 49 (DRT 5.3), 6 points
        + struct.pack(">H", 3)             # template 5.3
        + struct.pack(">f", 0.0)           # R
        + struct.pack(">HH", 0, 0)         # E, D
        + bytes([2, 0])                    # nbits(group refs)=2, field type
        + bytes([1, 0])                    # general splitting, no missing mgmt
        + bytes(8)                         # missing substitutes
        + struct.pack(">I", 2)             # NG = 2
        + bytes([3, 1])                    # width ref = 3, width bits = 1
        + struct.pack(">I", 3)             # length ref = 3
        + bytes([1])                       # length increment = 1
        + struct.pack(">I", 3)             # true length of last group = 3
        + bytes([0])                       # bits for scaled lengths = 0
        + bytes([2, 1])                    # order = 2, ods = 1
    )
    sec6 = struct.pack(">IBB", 6, 6, 255)
    data = bytes([0x0A, 0x0C, 0x83, 0x00, 0x40, 0x03, 0x04, 0x00])
    sec7 = struct.pack(">IB", 5 + len(data), 7) + data
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    return sec0 + struct.pack(">Q", 16 + len(body) + 4) + body + b"7777"


def test_hand_packed_complex_53():
    g = parse_grib2(_hand_packed_53_message())
    assert np.array_equal(g["values"], np.array([[10.0, 12, 17, 19, 26, 30]]))
    assert g["lat0"] == 40.0 and g["lon0"] == -100.0
    assert g["dlon"] == 0.5 and g["dlat"] == 0.5


def test_complex_roundtrip_all_orders(tmp_path):
    from odin_rs_spark.sources.grib2 import write_grib2_complex

    jj, ii = np.mgrid[0:7, 0:9]
    vals = ((ii * 11 + jj * 13) % 97) * 0.25  # dyadic, E=-2
    for order in (0, 1, 2):
        p = str(tmp_path / f"c{order}.grib2")
        write_grib2_complex(p, vals, lat0=-45.5, lon0=10.0, dlat=0.5,
                            dlon=1.0, e_scale=-2, order=order, group_len=8)
        g = parse_grib2(open(p, "rb").read())
        assert np.array_equal(g["values"], vals), order
        assert g["lat0"] == -45.5


def test_complex_negative_field_via_differencing(tmp_path):
    """Spatial differencing handles fields whose differences go negative
    (gmin < 0, sign-magnitude descriptors) and multi-octet ival1."""
    from odin_rs_spark.sources.grib2 import write_grib2_complex

    jj, ii = np.mgrid[0:6, 0:8]
    vals = (1000.0 + ((ii * 7 - jj * 9) % 41) - 20).astype(float)
    p = str(tmp_path / "neg.grib2")
    write_grib2_complex(p, vals, lat0=0, lon0=0, dlat=1, dlon=1, order=2)
    assert np.array_equal(parse_grib2(open(p, "rb").read())["values"], vals)


def test_complex_constant_field_width_zero_groups(tmp_path):
    """An all-constant field packs every group at width 0 (refs only) —
    the degenerate branch a real granule's calm regions hit."""
    from odin_rs_spark.sources.grib2 import write_grib2_complex

    vals = np.full((4, 6), 7.0)
    p = str(tmp_path / "const.grib2")
    write_grib2_complex(p, vals, lat0=0, lon0=0, dlat=1, dlon=1, order=1)
    assert np.array_equal(parse_grib2(open(p, "rb").read())["values"], vals)


def test_complex_corrupt_group_lengths_raise(tmp_path):
    """Mutated NG / group metadata must raise ValueError, never
    mis-reshape or loop (the fuzzer class)."""
    buf = bytearray(_hand_packed_53_message())
    # find section 5 (length 49) and corrupt NG -> 7
    pos = 16
    while pos < len(buf) - 4:
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        if buf[pos + 4] == 5:
            struct.pack_into(">I", buf, pos + 31, 7)
            break
        pos += ln
    with pytest.raises(ValueError):
        parse_grib2(bytes(buf))


def test_complex_huge_ng_rejected_before_allocation():
    """NG is a raw 4-byte field: a ~100-byte corrupt message claiming
    ng=2^31 must raise on the bounds check, not attempt the multi-GB
    O(ng) descriptor allocations (ADVICE r5 — the fuzzer class)."""
    import resource

    buf = bytearray(_hand_packed_53_message())
    pos = 16
    while pos < len(buf) - 4:
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        if buf[pos + 4] == 5:
            struct.pack_into(">I", buf, pos + 31, 2**31)
            break
        pos += ln
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with pytest.raises(ValueError, match="exceed"):
        parse_grib2(bytes(buf))
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is in KiB on Linux: the rejection must not have grown
    # the high-water mark by anything near the 16+ GiB an O(2^31)
    # int64 allocation would demand
    assert after - before < 1_000_000


def test_multi_message_file(tmp_path, spark):
    """Real granules CONCATENATE messages (one per field): a 2-message
    file must decode to two independent row-sets indexed by `msg`, and
    a corrupt second envelope must name its message/offset."""
    from odin_rs_spark.sources.grib2 import (
        parse_grib2_messages,
        write_grib2,
        write_grib2_complex,
    )

    v1 = np.arange(12, dtype=np.float64).reshape(3, 4) * 0.5
    v2 = np.arange(12, dtype=np.float64).reshape(3, 4) * 0.25 + 1.0
    p1, p2 = str(tmp_path / "a.grib2"), str(tmp_path / "b.grib2")
    write_grib2(p1, v1, lat0=10, lon0=20, dlat=1, dlon=1, e_scale=-1)
    write_grib2_complex(p2, v2, lat0=30, lon0=40, dlat=1, dlon=1, e_scale=-2)
    cat = open(p1, "rb").read() + open(p2, "rb").read()
    multi = str(tmp_path / "multi.grib2")
    open(multi, "wb").write(cat)

    msgs = parse_grib2_messages(cat)
    assert len(msgs) == 2
    assert np.array_equal(msgs[0]["values"], v1)
    assert np.array_equal(msgs[1]["values"], v2)
    assert msgs[1]["lat0"] == 30.0

    # the Spark cell reader emits one row-set per message
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(multi)
    cells = grib2_grid_cells(files)
    per = {r["msg"]: r["n"] for r in
           cells.groupBy("msg").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {0: 12, 1: 12}

    # corrupt second envelope names the failing message
    bad = bytearray(cat)
    bad[len(open(p1, "rb").read())] = 0x58  # break 2nd magic
    with pytest.raises(ValueError, match="message 1"):
        parse_grib2_messages(bytes(bad))
    # truncated tail: declared length runs past the buffer
    with pytest.raises(ValueError, match="runs past"):
        parse_grib2_messages(cat[:-10])


def test_complex_secondary_missing_mgmt_rejected():
    """Primary missing management (octet 23 = 1) decodes; SECONDARY
    (= 2) remains an explicit rejection."""
    buf = bytearray(_hand_packed_53_message())
    pos = 16
    while pos < len(buf) - 4:
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        if buf[pos + 4] == 5:
            buf[pos + 22] = 2  # primary + secondary management
            break
        pos += ln
    with pytest.raises(ValueError, match="missing value management"):
        parse_grib2(bytes(buf))


def test_complex_missing_values_roundtrip(tmp_path):
    """NaN cells ride the in-packing primary-missing encoding (octet
    23 = 1) through every order: scattered NaNs, NaNs inside the first
    `order` slots, and whole all-missing groups all reconstruct, with
    present values exact and the missing mask faithful."""
    from odin_rs_spark.sources.grib2 import write_grib2_complex

    rng = np.arange(48, dtype=np.float64).reshape(6, 8)
    for order in (0, 1, 2):
        v = (rng * 0.25 + 1.0).copy()
        v[0, 3] = np.nan          # scattered
        v[2, :] = np.nan          # a full row -> one all-missing group
        v[5, 7] = np.nan          # last point
        p = str(tmp_path / f"miss{order}.grib2")
        write_grib2_complex(
            p, v, lat0=10, lon0=20, dlat=0.5, dlon=0.5, e_scale=-2,
            order=order, group_len=8,
        )
        g = parse_grib2(open(p, "rb").read())
        assert g["missing"] is not None
        assert np.array_equal(g["missing"], np.isnan(v))
        assert np.array_equal(
            g["values"][~np.isnan(v)], v[~np.isnan(v)]
        ), f"order {order}"
        assert np.isnan(g["values"][np.isnan(v)]).all()
        assert g["missing_value"] == struct.unpack(">f", struct.pack(">f", 9.999e20))[0]


def test_complex_missing_in_leading_slots(tmp_path):
    """NaN at positions 0/1 forces the descriptors to carry the first
    PRESENT values — the compacted-sequence contract."""
    from odin_rs_spark.sources.grib2 import write_grib2_complex

    v = (np.arange(24, dtype=np.float64).reshape(3, 8) * 0.5 + 2.0).copy()
    v[0, 0] = np.nan
    v[0, 1] = np.nan
    p = str(tmp_path / "lead.grib2")
    write_grib2_complex(p, v, lat0=0, lon0=0, dlat=1, dlon=1, e_scale=-1, order=2)
    g = parse_grib2(open(p, "rb").read())
    assert np.array_equal(g["values"][~np.isnan(v)], v[~np.isnan(v)])
    assert np.array_equal(g["missing"], np.isnan(v))
