"""NetCDF-3 classic reader/writer (S2 decode path): spec-level byte
parse pinned against a HAND-PACKED file (independent of our writer, so
a self-consistent-but-wrong reader/writer pair cannot pass), writer
roundtrip, record variables, and the mapInPandas cell fan-out with the
in-kernel mask pushdown."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

import odin_rs_spark
from odin_rs_spark.sources.netcdf3 import (
    netcdf_grid_cells,
    parse_netcdf3,
    write_netcdf3,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
    "sources",
    "fixtures",
    "grid_cdf1.nc",
)


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b + b"\x00" * ((4 - len(b) % 4) % 4)


def test_hand_packed_cdf1_fixed_var():
    """2x3 NC_SHORT grid packed by hand, byte for byte per the public
    spec (not via write_netcdf3)."""
    header = b"CDF\x01" + struct.pack(">i", 0)
    header += struct.pack(">ii", 0x0A, 2)  # dim_list
    header += _name("y") + struct.pack(">i", 2)
    header += _name("x") + struct.pack(">i", 3)
    header += struct.pack(">ii", 0, 0)  # no global attrs
    header += struct.pack(">ii", 0x0B, 1)  # var_list
    var = _name("t")
    var += struct.pack(">i", 2) + struct.pack(">ii", 0, 1)  # dims [y, x]
    var += struct.pack(">ii", 0, 0)  # no var attrs
    var += struct.pack(">ii", 3, 8)  # NC_SHORT, vsize 6→8 padded
    begin = len(header) + len(var) + 4
    buf = header + var + struct.pack(">i", begin)
    buf += struct.pack(">6h", 1, 2, 3, 4, 5, 6) + b"\x00\x00"

    nc = parse_netcdf3(buf)
    assert nc["dims"] == [("y", 2), ("x", 3)]
    t = nc["vars"]["t"]
    assert t["dims"] == ["y", "x"]
    assert np.array_equal(t["data"], np.array([[1, 2, 3], [4, 5, 6]], dtype=np.int16))


def test_hand_packed_record_var():
    """Record variable (dim length 0): numrecs slabs interleaved at
    recsize stride."""
    header = b"CDF\x01" + struct.pack(">i", 3)  # numrecs=3
    header += struct.pack(">ii", 0x0A, 1)
    header += _name("time") + struct.pack(">i", 0)  # record dim
    header += struct.pack(">ii", 0, 0)
    header += struct.pack(">ii", 0x0B, 1)
    var = _name("v")
    var += struct.pack(">i", 1) + struct.pack(">i", 0)
    var += struct.pack(">ii", 0, 0)
    var += struct.pack(">ii", 5, 4)  # NC_FLOAT, vsize 4/record
    begin = len(header) + len(var) + 4
    buf = header + var + struct.pack(">i", begin)
    buf += struct.pack(">3f", 1.5, -2.0, 8.25)

    nc = parse_netcdf3(buf)
    assert nc["numrecs"] == 3
    assert np.allclose(nc["vars"]["v"]["data"], [1.5, -2.0, 8.25])


def test_writer_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    val = rng.standard_normal((5, 9))
    q = rng.integers(0, 5, (5, 9)).astype(np.int16)
    p = str(tmp_path / "rt.nc")
    write_netcdf3(
        p,
        dims=[("y", 5), ("x", 9)],
        variables={"speed": (["y", "x"], val), "quality": (["y", "x"], q)},
    )
    nc = parse_netcdf3(open(p, "rb").read())
    assert np.array_equal(nc["vars"]["speed"]["data"], val)
    assert np.array_equal(nc["vars"]["quality"]["data"], q)
    assert nc["vars"]["quality"]["data"].dtype == np.int16


def test_checked_in_fixture_matches_formula():
    nc = parse_netcdf3(open(FIXTURE, "rb").read())
    xx, yy = np.meshgrid(np.arange(16), np.arange(12))
    assert np.array_equal(
        nc["vars"]["speed"]["data"], ((xx * 37 + yy * 23) % 97) * 0.25 - 10.0
    )
    assert np.array_equal(nc["vars"]["quality"]["data"], (xx * 7 + yy * 11) % 5)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="bad magic"):
        parse_netcdf3(b"HDF\x01" + b"\x00" * 64)
    with pytest.raises(ValueError, match="classic only"):
        parse_netcdf3(b"CDF\x05" + b"\x00" * 64)


def test_grid_cells_mask_pushdown(spark):
    files = spark.read.format("binaryFile").load(FIXTURE)
    all_cells = netcdf_grid_cells(files, "speed", mask_var="quality")
    kept = netcdf_grid_cells(files, "speed", mask_var="quality", mask_min=2.0)
    n_all, n_kept = all_cells.count(), kept.count()
    assert n_all == 16 * 12
    assert 0 < n_kept < n_all
    rows = kept.collect()
    assert all(r["mask"] >= 2.0 for r in rows)
    # decoded values match the generator formula cell-by-cell
    for r in rows[:20]:
        assert r["value"] == ((r["x"] * 37 + r["y"] * 23) % 97) * 0.25 - 10.0


def test_huge_numrecs_raises_not_loops():
    """A corrupt numrecs must raise, not iterate billions of empty
    record slices (the unbounded-loop class the GRIB2 fuzzer caught)."""
    header = b"CDF\x01" + struct.pack(">i", 0x7FFFFFFF)  # absurd numrecs
    header += struct.pack(">ii", 0x0A, 1) + _name("t") + struct.pack(">i", 0)
    header += struct.pack(">ii", 0, 0)
    header += struct.pack(">ii", 0x0B, 1)
    var = _name("v") + struct.pack(">i", 1) + struct.pack(">i", 0)
    var += struct.pack(">ii", 0, 0) + struct.pack(">ii", 5, 4)
    buf = header + var + struct.pack(">i", len(header) + len(var) + 4)
    with pytest.raises(ValueError, match="numrecs"):
        parse_netcdf3(buf)


def test_streaming_numrecs_sentinel():
    """numrecs = 0xFFFFFFFF (classic STREAMING sentinel: record count
    unknown, derive from file size) must decode, not surface as a
    wrapped 'negative dimensions' error (ADVICE r4)."""
    import numpy as np

    from odin_rs_spark.sources.netcdf3 import parse_netcdf3

    # hand-packed: CDF-1, numrecs=0xFFFFFFFF, dim t=UNLIMITED(0),
    # one record var "v" (t,), int32 -> 2 records derivable from size
    hdr = b"CDF\x01" + b"\xff\xff\xff\xff"
    hdr += struct.pack(">ii", 0x0A, 1)  # NC_DIMENSION, 1
    hdr += struct.pack(">i", 1) + b"t\x00\x00\x00" + struct.pack(">i", 0)
    hdr += struct.pack(">ii", 0, 0)  # no global attrs
    hdr += struct.pack(">ii", 0x0B, 1)  # NC_VARIABLE, 1
    hdr += struct.pack(">i", 1) + b"v\x00\x00\x00"  # name
    hdr += struct.pack(">i", 1) + struct.pack(">i", 0)  # 1 dim, dimid 0
    hdr += struct.pack(">ii", 0, 0)  # no var attrs
    begin = len(hdr) + 12  # nc_type + vsize + begin fields remain
    hdr += struct.pack(">i", 4)  # NC_INT
    hdr += struct.pack(">i", 4)  # vsize (one record slab, padded)
    hdr += struct.pack(">i", begin)
    buf = hdr + struct.pack(">ii", 7, 9)  # 2 records
    out = parse_netcdf3(buf)
    assert out["numrecs"] == 2
    assert np.array_equal(out["vars"]["v"]["data"], np.array([7, 9]))


def test_negative_numrecs_rejected():
    from odin_rs_spark.sources.netcdf3 import parse_netcdf3

    buf = b"CDF\x01" + struct.pack(">i", -5) + struct.pack(">ii", 0, 0)
    buf += struct.pack(">ii", 0, 0) + struct.pack(">ii", 0, 0)
    with pytest.raises(ValueError, match="negative numrecs"):
        parse_netcdf3(buf)
