"""HDF5/NetCDF-4 subset reader (S2 container upgrade): spec-level
byte parse pinned against HAND-PACKED files (independent of our
writer, so a self-consistent-but-wrong reader/writer pair cannot
pass), twin round-trips over every layout/filter combination, the
netCDF-4 dimension-scale semantics, fuzz-to-ValueError, and the
mapInPandas cell fan-out with the in-kernel mask + scale/offset
unpack."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

import odin_rs_spark
from odin_rs_spark.sources.hdf5 import (
    _UNDEF,
    hdf5_grid_cells,
    nc_grid_cells_any,
    parse_hdf5,
    write_hdf5,
)

FIX = os.path.join(
    os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
    "sources",
    "fixtures",
)


def _grid(w=16, h=12):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return xx, yy


# ---------------------------------------------------------------------------
# hand-packed files (writer-independent reader pins)
# ---------------------------------------------------------------------------


def _hand_packed_v0() -> bytes:
    """Minimal spec-correct v0 file: superblock → root group with a
    symbol-table B-tree → one SNOD entry → contiguous int16 dataset,
    packed field by field from the HDF5 File Format Spec v3."""
    out = bytearray(b"\x00" * 96)  # superblock placeholder (24+32+40)

    # local heap data: "" at 0, "t" at 8
    heap_data_addr = len(out)
    out += b"\x00" * 8 + b"t\x00" + b"\x00" * 6
    heap_addr = len(out)
    out += (b"HEAP" + bytes([0, 0, 0, 0])
            + struct.pack("<QQQ", 16, 16, heap_data_addr))

    # dataset data: 2x3 int16 little-endian
    data_addr = len(out)
    out += struct.pack("<6h", 1, 2, 3, 4, 5, 6)
    out += b"\x00" * 4  # realign

    # dataset object header v1
    def msg(t, body):
        body = body + b"\x00" * (-len(body) % 8)
        return struct.pack("<HHB3x", t, len(body), 0) + body

    dspace = bytes([1, 2, 0, 0]) + b"\x00" * 4 + struct.pack("<QQ", 2, 3)
    dtype = bytes([0x10, 0x08, 0, 0]) + struct.pack("<I", 2) \
        + struct.pack("<HH", 0, 16)  # fixed-point, LE, signed, 2 bytes
    layout = bytes([3, 1]) + struct.pack("<QQ", data_addr, 12)
    body = msg(0x0001, dspace) + msg(0x0003, dtype) + msg(0x0008, layout)
    ds_addr = len(out)
    out += struct.pack("<BBHII4x", 1, 0, 3, 1, len(body)) + body

    # SNOD with one entry: name offset 8 ("t"), header ds_addr
    snod_addr = len(out)
    out += (b"SNOD" + bytes([1, 0]) + struct.pack("<H", 1)
            + struct.pack("<QQI4x16x", 8, ds_addr, 0))

    # group B-tree: 1 SNOD child, keys (0, offset of "t")
    btree_addr = len(out)
    out += (b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
            + struct.pack("<QQ", _UNDEF, _UNDEF)
            + struct.pack("<QQQ", 0, snod_addr, 8))

    # root object header v1 with symbol table message
    st = struct.pack("<QQ", btree_addr, heap_addr)
    body = msg(0x0011, st)
    root_addr = len(out)
    out += struct.pack("<BBHII4x", 1, 0, 1, 1, len(body)) + body

    sb = bytearray()
    sb += b"\x89HDF\r\n\x1a\n"
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 1])
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, _UNDEF, len(out), _UNDEF)
    sb += struct.pack("<QQI4x16x", 0, root_addr, 0)
    out[: len(sb)] = sb
    return bytes(out)


def test_hand_packed_v0_contiguous():
    nc = parse_hdf5(_hand_packed_v0())
    t = nc["vars"]["t"]
    assert t["shape"] == [2, 3]
    assert t["dims"] == ["phony_dim_0", "phony_dim_1"]  # no DIMENSION_LIST
    assert np.array_equal(
        t["data"], np.array([[1, 2, 3], [4, 5, 6]], dtype=np.int16)
    )


def _hand_packed_v3_ohdr() -> bytes:
    """Superblock v3 + OHDR v2 root group with a compact LINK message
    to a v1 dataset header — the 'latest format' read paths."""
    out = bytearray(b"\x00" * 48)  # superblock v3 is 48 bytes

    data_addr = len(out)
    out += struct.pack("<4i", 10, 20, 30, 40)

    def msg_v1(t, body):
        body = body + b"\x00" * (-len(body) % 8)
        return struct.pack("<HHB3x", t, len(body), 0) + body

    dspace = bytes([1, 1, 0, 0]) + b"\x00" * 4 + struct.pack("<Q", 4)
    dtype = bytes([0x10, 0x08, 0, 0]) + struct.pack("<I", 4) \
        + struct.pack("<HH", 0, 32)
    layout = bytes([3, 1]) + struct.pack("<QQ", data_addr, 16)
    body = (msg_v1(0x0001, dspace) + msg_v1(0x0003, dtype)
            + msg_v1(0x0008, layout))
    ds_addr = len(out)
    out += struct.pack("<BBHII4x", 1, 0, 3, 1, len(body)) + body

    # OHDR v2 root with one LINK message (v1 link, hard, name "v");
    # chunk0 size excludes the trailing checksum
    link = bytes([1, 0]) + bytes([1]) + b"v" + struct.pack("<Q", ds_addr)
    lmsg = bytes([0x06]) + struct.pack("<H", len(link)) + bytes([0]) + link
    root_addr = len(out)
    out += (b"OHDR" + bytes([2, 0x00]) + bytes([len(lmsg)]) + lmsg
            + b"\x00" * 4)  # checksum (unverified)

    sb = bytearray()
    sb += b"\x89HDF\r\n\x1a\n"
    sb += bytes([3, 8, 8, 0])
    sb += struct.pack("<QQQQ", 0, _UNDEF, len(out), root_addr)
    sb += struct.pack("<I", 0)  # checksum (unverified by the reader)
    out[: len(sb)] = sb
    return bytes(out)


def test_hand_packed_v3_ohdr_link():
    nc = parse_hdf5(_hand_packed_v3_ohdr())
    v = nc["vars"]["v"]
    assert np.array_equal(v["data"], np.array([10, 20, 30, 40], np.int32))


# ---------------------------------------------------------------------------
# twin round-trips
# ---------------------------------------------------------------------------


class TestTwin:
    def test_contiguous_all_dtypes(self, tmp_path):
        xx, yy = _grid(8, 6)
        for dt in ("<i1", "<i2", "<i4", "<i8", "<u2", "<f4", "<f8"):
            a = ((xx * 3 + yy * 5) % 11).astype(dt)
            p = str(tmp_path / f"t{dt.strip('<')}.nc")
            write_hdf5(p, [("y", 6), ("x", 8)], {"v": (["y", "x"], a)})
            nc = parse_hdf5(open(p, "rb").read())
            assert np.array_equal(nc["vars"]["v"]["data"], a), dt
            assert nc["vars"]["v"]["dims"] == ["y", "x"]

    def test_chunked_deflate_edge_chunks(self, tmp_path):
        xx, yy = _grid(16, 12)
        a = ((xx * 37 + yy * 23) % 97).astype("<f8")
        p = str(tmp_path / "c.nc")
        # 5x7 chunks do NOT divide 12x16: edge-trim path exercised
        write_hdf5(p, [("y", 12), ("x", 16)], {"v": (["y", "x"], a)},
                   chunks={"v": (5, 7)}, compress={"v": 6})
        nc = parse_hdf5(open(p, "rb").read())
        assert np.array_equal(nc["vars"]["v"]["data"], a)

    def test_chunked_uncompressed(self, tmp_path):
        a = np.arange(24, dtype="<i4").reshape(4, 6)
        p = str(tmp_path / "cu.nc")
        write_hdf5(p, [("y", 4), ("x", 6)], {"v": (["y", "x"], a)},
                   chunks={"v": (2, 2)})
        nc = parse_hdf5(open(p, "rb").read())
        assert np.array_equal(nc["vars"]["v"]["data"], a)

    def test_attrs_root_and_var(self, tmp_path):
        a = np.ones((2, 2), dtype="<i2")
        p = str(tmp_path / "at.nc")
        write_hdf5(
            p, [("y", 2), ("x", 2)], {"v": (["y", "x"], a)},
            attrs={"title": "granule", "rev": np.int32(9)},
            var_attrs={"v": {"scale_factor": np.float64(0.5),
                             "units": "K"}},
        )
        nc = parse_hdf5(open(p, "rb").read())
        assert nc["attrs"]["title"] == "granule"
        assert nc["attrs"]["rev"] == 9
        assert nc["vars"]["v"]["attrs"]["scale_factor"] == 0.5
        assert nc["vars"]["v"]["attrs"]["units"] == "K"

    def test_dimension_scales_listed_not_vars(self, tmp_path):
        a = np.zeros((3, 4), dtype="<f4")
        p = str(tmp_path / "d.nc")
        write_hdf5(p, [("y", 3), ("x", 4)], {"v": (["y", "x"], a)})
        nc = parse_hdf5(open(p, "rb").read())
        assert dict(nc["dims"]) == {"y": 3, "x": 4}
        assert set(nc["vars"]) == {"v"}


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------


def test_shuffle_then_deflate_unfilter():
    from odin_rs_spark.sources.hdf5 import _unfilter

    a = np.arange(40, dtype="<i4")
    raw = a.tobytes()
    shuffled = (np.frombuffer(raw, np.uint8).reshape(-1, 4).T).tobytes()
    stored = zlib.compress(shuffled, 6)
    # pipeline order on write: shuffle then deflate -> read undoes both
    got = _unfilter(stored, [(2, 4), (1, 6)], mask=0)
    assert got == raw
    # filter mask bit skips the masked stage
    got2 = _unfilter(zlib.compress(raw, 6), [(2, 4), (1, 6)], mask=0b01)
    assert got2 == raw


def test_unknown_filter_rejected_by_number(tmp_path):
    a = np.zeros((4, 4), dtype="<f4")
    p = str(tmp_path / "f.nc")
    write_hdf5(p, [("y", 4), ("x", 4)], {"v": (["y", "x"], a)},
               chunks={"v": (2, 2)}, compress={"v": 6})
    buf = bytearray(open(p, "rb").read())
    i = buf.find(b"deflate\x00")
    assert i > 0
    struct.pack_into("<H", buf, i - 8, 32004)  # LZ4's registered id
    with pytest.raises(ValueError, match="filter id 32004"):
        parse_hdf5(bytes(buf))


# ---------------------------------------------------------------------------
# fuzz discipline
# ---------------------------------------------------------------------------


FIXTURE = os.path.join(FIX, "grid_hdf5.nc")


def test_committed_fixture_decodes():
    nc = parse_hdf5(open(FIXTURE, "rb").read())
    xx, yy = _grid()
    assert np.array_equal(nc["vars"]["CMI"]["data"],
                          ((xx * 37 + yy * 23) % 89).astype(np.int16))
    assert np.array_equal(nc["vars"]["DQF"]["data"],
                          ((xx * 7 + yy * 11) % 4).astype(np.int8))
    assert nc["vars"]["CMI"]["attrs"]["scale_factor"] == 0.5
    assert nc["vars"]["CMI"]["attrs"]["add_offset"] == -12.0


def test_truncation_ladder_valueerror_only():
    buf = open(FIXTURE, "rb").read()
    for cut in range(0, len(buf), 11):
        try:
            parse_hdf5(buf[:cut])
        except ValueError:
            pass  # rejecting is fine; any other exception is a bug


def test_mutation_fuzz_valueerror_only():
    buf = open(FIXTURE, "rb").read()
    for pos in range(0, len(buf), 5):
        mb = bytearray(buf)
        mb[pos] ^= 0xFF
        try:
            parse_hdf5(bytes(mb))
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Spark fan-out
# ---------------------------------------------------------------------------


def test_hdf5_grid_cells_mask_and_unpack(spark):
    files = spark.read.format("binaryFile").load(FIXTURE)
    cells = hdf5_grid_cells(
        files, "CMI", mask_var="DQF", mask_min=2.0
    ).collect()
    xx, yy = _grid()
    val = ((xx * 37 + yy * 23) % 89) * 0.5 - 12.0
    msk = (xx * 7 + yy * 11) % 4
    keep = msk >= 2
    assert len(cells) == int(keep.sum())
    got = {(r.x, r.y): (r.value, r.mask) for r in cells}
    for xi, yi in zip(xx[keep], yy[keep]):
        assert got[(xi, yi)] == (val[yi, xi], float(msk[yi, xi]))


def test_nc_grid_cells_any_mixed_lake(spark, tmp_path):
    """One scan over classic CDF-1 + HDF5 granules, dispatched by
    magic inside the kernel."""
    import shutil

    lake = tmp_path / "lake"
    lake.mkdir()
    shutil.copy(FIXTURE, lake / "g_h5.nc")
    shutil.copy(os.path.join(FIX, "grid_cdf1.nc"), lake / "g_cdf.nc")
    files = spark.read.format("binaryFile").load(str(lake) + "/*.nc")
    # the classic fixture's vars are speed/quality; value_var differs
    # per container generation, so scan each by its variable
    n_h5 = nc_grid_cells_any(files, "CMI", on_error="skip").count()
    n_cdf = nc_grid_cells_any(files, "speed", on_error="skip").count()
    assert n_h5 == 16 * 12 and n_cdf == 16 * 12
