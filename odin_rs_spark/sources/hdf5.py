"""Pure-Python HDF5 / NetCDF-4 subset reader + fixture-twin writer
(SURVEY §2.1 S2 — the container format the reference's GOES-R granules
actually ship in: odin_gdal/src/lib.rs:188-208 opens NetCDF-4 via GDAL's
HDF5 driver; this container has no h5py/netCDF4/GDAL).

Everything here is decoded from the public **HDF5 File Format
Specification (version 3.0)** — the same spec-codec discipline as the
JPEG/GRIB2/PDF readers. Scope (errors name anything else):

- superblock v0 (symbol-table root group) and v2/v3 (direct root
  object header address),
- object headers v1 (with continuation blocks) and v2 (``OHDR``),
- groups via symbol-table message → B-tree v1 (node type 0) → SNOD
  entries + local heap names, and via compact LINK messages (v2
  "latest format" small groups); dense fractal-heap groups reject by
  name,
- datatypes: fixed-point (1/2/4/8-byte, either byte order, signed or
  not), IEEE float (f4/f8, either byte order), fixed strings,
  object references, and vlen-of-reference (for ``DIMENSION_LIST``),
- dataspaces v1/v2 (simple, ≤ 4 dims),
- data layout v3: contiguous, and chunked via B-tree v1 (node type 1)
  with the **deflate** (id 1) and **shuffle** (id 2) filters; other
  filter ids reject by number,
- attributes v1 (+ v3 name-charset variant), global heaps (``GCOL``)
  for vlen attribute payloads.

NetCDF-4 semantics on top of raw HDF5 (the public netcdf-c mapping):
datasets carrying ``CLASS="DIMENSION_SCALE"`` are *dimensions*; real
variables name their dims through the ``DIMENSION_LIST`` attribute
(vlen object references resolved through the global heap back to the
dimension datasets). `parse_hdf5` returns the same dict shape as
`netcdf3.parse_netcdf3`, and `hdf5_grid_cells` is the same scan →
mapInPandas fan-out with the mask predicate applied INSIDE the kernel
(S2 masked-read parity), so granules scale embarrassingly and masked
cells never materialize as rows. `nc_grid_cells_any` sniffs CDF-1/2 vs
``\\x89HDF`` magic per granule and dispatches — one scan over a mixed
100 TB granule lake.

Error contract: every malformed input raises ValueError (struct/index/
zlib errors wrapped) — one catchable type per corrupt granule.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------------------
# low-level reader
# ---------------------------------------------------------------------------


def _u(buf: bytes, off: int, n: int) -> int:
    b = buf[off : off + n]
    if len(b) != n:
        raise ValueError(f"truncated HDF5 file at offset {off}")
    return int.from_bytes(b, "little")


def _take(buf: bytes, off: int, n: int) -> bytes:
    b = buf[off : off + n]
    if len(b) != n:
        raise ValueError(f"truncated HDF5 file at offset {off}")
    return b


def parse_hdf5(buf: bytes) -> dict:
    """HDF5/NetCDF-4 bytes → {"dims": [(name, len)], "attrs": {...},
    "vars": {name: {"dims", "shape", "attrs", "data"}}} — the same
    shape `netcdf3.parse_netcdf3` returns, so downstream kernels are
    container-agnostic. Dimension-scale datasets become `dims` (their
    data, when unallocated, is irrelevant); all other datasets become
    `vars` with dim names resolved via DIMENSION_LIST (falling back to
    `phony_dim_<i>` when absent, the netcdf-c convention)."""
    try:
        return _parse_hdf5(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError, zlib.error…
        raise ValueError(f"corrupt HDF5 file: {exc}") from exc


def _superblock(buf: bytes) -> int:
    """→ root group object header address (v0 via the root symbol
    table entry; v2/v3 direct)."""
    if _take(buf, 0, 8) != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    ver = buf[8]
    if ver == 0:
        so, sl = buf[13], buf[14]
        if so != 8 or sl != 8:
            raise ValueError(f"unsupported offset/length sizes {so}/{sl}")
        # fixed prefix: 24 bytes, then 4 addresses, then root STE
        ste = 24 + 4 * 8
        return _u(buf, ste + 8, 8)  # STE: name_off(8) | objhdr addr(8)
    if ver in (2, 3):
        so, sl = buf[9], buf[10]
        if so != 8 or sl != 8:
            raise ValueError(f"unsupported offset/length sizes {so}/{sl}")
        return _u(buf, 12 + 24, 8)  # base, ext, EOF, then root OH addr
    raise ValueError(f"unsupported superblock version {ver}")


def _read_messages_v1(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    if buf[addr] != 1:
        raise ValueError(f"unsupported object header version {buf[addr]}")
    nmsg = _u(buf, addr + 2, 2)
    hsize = _u(buf, addr + 8, 4)
    blocks = [(addr + 16, hsize)]  # prefix 12 + 4 pad
    msgs: list[tuple[int, bytes]] = []
    seen_blocks = 0
    while blocks and len(msgs) < nmsg:
        seen_blocks += 1
        if seen_blocks > nmsg + 8:
            # a crafted continuation cycle adds blocks without adding
            # messages — bound the walk (GRIB2 fuzz-loop discipline)
            raise ValueError("object header continuation loop")
        off, remaining = blocks.pop(0)
        while remaining >= 8 and len(msgs) < nmsg:
            mtype = _u(buf, off, 2)
            msize = _u(buf, off + 2, 2)
            body = _take(buf, off + 8, msize)
            off += 8 + msize
            remaining -= 8 + msize
            if mtype == 0x0010:  # continuation
                blocks.append((int.from_bytes(body[:8], "little"),
                               int.from_bytes(body[8:16], "little")))
                continue
            msgs.append((mtype, body))
    return msgs


def _read_messages_v2(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    if _take(buf, addr, 4) != b"OHDR":
        raise ValueError("bad OHDR signature")
    if buf[addr + 4] != 2:
        raise ValueError(f"unsupported OHDR version {buf[addr + 4]}")
    flags = buf[addr + 5]
    off = addr + 6
    if flags & 0x20:
        off += 8  # access/mod/change/birth times
    if flags & 0x10:
        off += 4  # max compact / min dense
    size_bytes = 1 << (flags & 0x3)
    chunk0 = _u(buf, off, size_bytes)
    off += size_bytes
    tracked = bool(flags & 0x04)
    msgs: list[tuple[int, bytes]] = []
    # chunk0 size excludes the trailing checksum; an OCHK continuation
    # length includes its signature AND checksum (spec IV.A.1.b)
    blocks = [(off, chunk0)]
    guard = 0
    while blocks:
        guard += 1
        if guard > 64:
            raise ValueError("object header continuation loop")
        boff, bsize = blocks.pop(0)
        end = boff + bsize  # gap allowed before the checksum
        while boff + 4 <= end:
            mtype = buf[boff]
            msize = _u(buf, boff + 1, 2)
            boff += 4
            if tracked:
                boff += 2
            if mtype == 0 and msize == 0:
                break  # gap
            body = _take(buf, boff, msize)
            boff += msize
            if mtype == 0x10:
                caddr = int.from_bytes(body[:8], "little")
                clen = int.from_bytes(body[8:16], "little")
                if _take(buf, caddr, 4) != b"OCHK":
                    raise ValueError("bad OCHK signature")
                blocks.append((caddr + 4, clen - 8))  # sig + checksum
                continue
            msgs.append((mtype, body))
    return msgs


def _read_object_header(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    if buf[addr : addr + 4] == b"OHDR":
        return _read_messages_v2(buf, addr)
    return _read_messages_v1(buf, addr)


def _local_heap_name(buf: bytes, heap_addr: int, name_off: int) -> str:
    if _take(buf, heap_addr, 4) != b"HEAP":
        raise ValueError("bad local heap signature")
    data_addr = _u(buf, heap_addr + 24, 8)
    end = buf.index(b"\x00", data_addr + name_off)
    return buf[data_addr + name_off : end].decode("utf-8")


def _group_links(buf: bytes, msgs: list[tuple[int, bytes]]) -> dict[str, int]:
    """name → object-header address from a group's messages: symbol
    table (B-tree v1 + SNOD walk) or compact LINK messages."""
    links: dict[str, int] = {}
    for mtype, body in msgs:
        if mtype == 0x0011:  # symbol table message
            btree = int.from_bytes(body[:8], "little")
            heap = int.from_bytes(body[8:16], "little")
            links.update(_walk_group_btree(buf, btree, heap))
        elif mtype == 0x0006:  # link message (compact group)
            links.update((_parse_link(body),))
        elif mtype == 0x0002:  # link info → dense (fractal heap) group
            fheap = int.from_bytes(body[2:10], "little") if len(body) >= 10 else _UNDEF
            if fheap != _UNDEF:
                raise ValueError("dense (fractal-heap) groups unsupported")
    return links


def _parse_link(body: bytes) -> tuple[str, int]:
    if body[0] != 1:
        raise ValueError(f"unsupported link message version {body[0]}")
    flags = body[1]
    off = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[off]
        off += 1
    if flags & 0x04:
        off += 8  # creation order
    if flags & 0x10:
        off += 1  # charset
    nlen_size = 1 << (flags & 0x3)
    nlen = int.from_bytes(body[off : off + nlen_size], "little")
    off += nlen_size
    name = body[off : off + nlen].decode("utf-8")
    off += nlen
    if ltype != 0:
        raise ValueError(f"unsupported link type {ltype} (hard links only)")
    return name, int.from_bytes(body[off : off + 8], "little")


def _walk_group_btree(buf: bytes, addr: int, heap: int) -> dict[str, int]:
    links: dict[str, int] = {}
    stack = [addr]
    visited: set[int] = set()
    while stack:
        a = stack.pop()
        if a in visited:
            raise ValueError("group B-tree cycle")
        visited.add(a)
        if _take(buf, a, 4) == b"SNOD":
            n = _u(buf, a + 6, 2)
            for i in range(n):
                e = a + 8 + i * 40
                name_off = _u(buf, e, 8)
                links[_local_heap_name(buf, heap, name_off)] = _u(buf, e + 8, 8)
            continue
        if _take(buf, a, 4) != b"TREE":
            raise ValueError("bad group B-tree signature")
        if buf[a + 4] != 0:
            raise ValueError("wrong B-tree node type in group")
        level, nent = buf[a + 5], _u(buf, a + 6, 2)
        off = a + 24  # past siblings
        for i in range(nent):
            child = _u(buf, off + 8 + i * 16, 8)  # key(8) child(8) pairs
            stack.append(child)
    return links


# --- datatype / dataspace -------------------------------------------------


def _parse_datatype(body: bytes) -> dict:
    cls = body[0] & 0x0F
    ver = body[0] >> 4
    if ver not in (1, 2, 3):
        raise ValueError(f"unsupported datatype version {ver}")
    bits = body[1:4]
    size = int.from_bytes(body[4:8], "little")
    bo = ">" if bits[0] & 1 else "<"
    if cls == 0:  # fixed-point
        if size not in (1, 2, 4, 8):
            raise ValueError(f"unsupported fixed-point size {size}")
        kind = "i" if bits[0] & 0x08 else "u"
        return {"cls": cls, "size": size, "dtype": np.dtype(f"{bo}{kind}{size}"),
                "enc": body[: 8 + 4]}
    if cls == 1:  # float — accept the two IEEE layouts only
        if size == 4:
            exp_loc, exp_sz, man_sz, bias = 23, 8, 23, 127
        elif size == 8:
            exp_loc, exp_sz, man_sz, bias = 52, 11, 52, 1023
        else:
            raise ValueError(f"unsupported float size {size}")
        p = body[8:]
        got = (p[4], p[5], p[7], int.from_bytes(p[8:12], "little"))
        if got != (exp_loc, exp_sz, man_sz, bias):
            raise ValueError(f"non-IEEE float layout {got}")
        return {"cls": cls, "size": size, "dtype": np.dtype(f"{bo}f{size}"),
                "enc": body[: 8 + 12]}
    if cls == 3:  # fixed string
        return {"cls": cls, "size": size, "dtype": None, "enc": body[:8]}
    if cls == 7:  # reference
        if bits[0] & 0x0F:
            raise ValueError("only object references supported")
        return {"cls": cls, "size": size, "dtype": None, "enc": body[:8]}
    if cls == 9:  # vlen
        base = _parse_datatype(body[8:])
        return {"cls": cls, "size": size, "base": base, "dtype": None,
                "enc": body}
    raise ValueError(f"unsupported datatype class {cls}")


def _parse_dataspace(body: bytes) -> list[int]:
    ver = body[0]
    if ver == 1:
        rank, flags = body[1], body[2]
        off = 8
    elif ver == 2:
        rank, flags = body[1], body[2]
        off = 4
    else:
        raise ValueError(f"unsupported dataspace version {ver}")
    if rank > 4:
        raise ValueError(f"rank {rank} > 4 unsupported")
    return [int.from_bytes(body[off + 8 * i : off + 8 * i + 8], "little")
            for i in range(rank)]


# --- attributes & global heap ----------------------------------------------


def _parse_attribute(buf: bytes, body: bytes) -> tuple[str, object]:
    ver = body[0]
    if ver not in (1, 3):
        raise ValueError(f"unsupported attribute version {ver}")
    name_sz = int.from_bytes(body[2:4], "little")
    dt_sz = int.from_bytes(body[4:6], "little")
    ds_sz = int.from_bytes(body[6:8], "little")
    off = 8 + (1 if ver == 3 else 0)  # v3: name charset byte

    def pad8(n: int) -> int:
        return n + (-n % 8)

    name = body[off : off + name_sz].split(b"\x00")[0].decode("utf-8")
    off += pad8(name_sz) if ver == 1 else name_sz
    dt = _parse_datatype(body[off : off + dt_sz])
    off += pad8(dt_sz) if ver == 1 else dt_sz
    shape = _parse_dataspace(body[off : off + ds_sz])
    off += pad8(ds_sz) if ver == 1 else ds_sz
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    raw = body[off:]
    if dt["cls"] == 3:
        return name, raw[: dt["size"]].split(b"\x00")[0].decode("utf-8")
    if dt["cls"] == 0 or dt["cls"] == 1:
        arr = np.frombuffer(raw[: n * dt["size"]], dtype=dt["dtype"])
        vals = arr.astype(arr.dtype.newbyteorder("="))
        return name, (vals[0].item() if not shape else vals.tolist())
    if dt["cls"] == 9 and dt["base"]["cls"] == 7:
        # vlen of object refs: per element {len:4, gcol addr:8, idx:4}
        out = []
        for i in range(n):
            e = raw[i * 16 : (i + 1) * 16]
            ln = int.from_bytes(e[0:4], "little")
            gaddr = int.from_bytes(e[4:12], "little")
            gidx = int.from_bytes(e[12:16], "little")
            data = _gheap_object(buf, gaddr, gidx)
            out.append([int.from_bytes(data[j * 8 : j * 8 + 8], "little")
                        for j in range(ln)])
        return name, out
    raise ValueError(f"unsupported attribute datatype class {dt['cls']}")


def _gheap_object(buf: bytes, addr: int, idx: int) -> bytes:
    if _take(buf, addr, 4) != b"GCOL":
        raise ValueError("bad global heap signature")
    size = _u(buf, addr + 8, 8)
    off = addr + 16
    end = addr + size
    while off + 16 <= end:
        oidx = _u(buf, off, 2)
        osize = _u(buf, off + 8, 8)
        if oidx == 0:
            break
        if oidx == idx:
            return _take(buf, off + 16, osize)
        off += 16 + osize + (-osize % 8)
    raise ValueError(f"global heap object {idx} not found")


# --- data layout ------------------------------------------------------------


def _read_dataset(buf: bytes, msgs: list[tuple[int, bytes]]) -> dict:
    shape: list[int] | None = None
    dt: dict | None = None
    layout: bytes | None = None
    filters: list[tuple[int, int]] = []
    attrs: dict = {}
    for mtype, body in msgs:
        if mtype == 0x0001:
            shape = _parse_dataspace(body)
        elif mtype == 0x0003:
            dt = _parse_datatype(body)
        elif mtype == 0x0008:
            layout = body
        elif mtype == 0x000B:
            filters = _parse_filters(body)
        elif mtype == 0x000C:
            k, v = _parse_attribute(buf, body)
            attrs[k] = v
    if shape is None or dt is None or layout is None:
        raise ValueError("dataset missing dataspace/datatype/layout")
    if dt["dtype"] is None:
        raise ValueError(f"dataset datatype class {dt['cls']} unsupported")
    n = int(np.prod(shape, dtype=np.float64))
    if n * dt["size"] > len(buf) * 1100 + (1 << 16):
        # bound allocations by the max deflate ratio (~1032:1): a
        # mutated 8-byte dim size must not drive np.zeros to OOM
        raise ValueError(f"dataset shape {shape} exceeds plausible file size")
    data = _read_layout(buf, layout, shape, dt, filters)
    return {"shape": shape, "attrs": attrs, "data": data, "dtype": dt}


def _parse_filters(body: bytes) -> list[tuple[int, int]]:
    if body[0] != 1:
        raise ValueError(f"unsupported filter pipeline version {body[0]}")
    nf = body[1]
    off = 8
    out = []
    for _ in range(nf):
        fid = int.from_bytes(body[off : off + 2], "little")
        nlen = int.from_bytes(body[off + 2 : off + 4], "little")
        ncv = int.from_bytes(body[off + 6 : off + 8], "little")
        off += 8 + nlen + (-nlen % 8)
        cvals = [int.from_bytes(body[off + 4 * i : off + 4 * i + 4], "little")
                 for i in range(ncv)]
        off += 4 * ncv + (4 if ncv % 2 else 0)
        if fid not in (1, 2):
            raise ValueError(f"unsupported HDF5 filter id {fid}")
        out.append((fid, cvals[0] if cvals else 0))
    return out


def _unfilter(raw: bytes, filters: list[tuple[int, int]], mask: int) -> bytes:
    # filters apply in reverse on read; mask bit i set = filter i skipped
    for i in range(len(filters) - 1, -1, -1):
        if mask & (1 << i):
            continue
        fid, cval = filters[i]
        if fid == 1:
            raw = zlib.decompress(raw)
        elif fid == 2:  # shuffle: de-interleave byte planes
            esize = cval
            n = len(raw) // esize
            a = np.frombuffer(raw[: n * esize], dtype=np.uint8)
            raw = a.reshape(esize, n).T.tobytes() + raw[n * esize :]
    return raw


def _read_layout(buf: bytes, body: bytes, shape: list[int], dt: dict,
                 filters: list[tuple[int, int]]) -> np.ndarray | None:
    if body[0] != 3:
        raise ValueError(f"unsupported data layout version {body[0]}")
    cls = body[1]
    esize = dt["size"]
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    if cls == 1:  # contiguous
        addr = int.from_bytes(body[2:10], "little")
        if addr == _UNDEF:
            return None  # no storage allocated (dimension-only dataset)
        raw = _take(buf, addr, n * esize)
        a = np.frombuffer(raw, dtype=dt["dtype"]).reshape(shape)
        return a.astype(a.dtype.newbyteorder("="))
    if cls == 2:  # chunked, B-tree v1 index
        ndims = body[2]  # = rank + 1
        btree = int.from_bytes(body[3:11], "little")
        cdims = [int.from_bytes(body[11 + 4 * i : 15 + 4 * i], "little")
                 for i in range(ndims - 1)]
        out = np.zeros(shape, dtype=dt["dtype"].newbyteorder("="))
        if btree == _UNDEF:
            return out
        for offs, addr, nbytes, fmask in _walk_chunk_btree(buf, btree, ndims):
            raw = _unfilter(_take(buf, addr, nbytes), filters, fmask)
            chunk = np.frombuffer(raw, dtype=dt["dtype"]).reshape(cdims)
            chunk = chunk.astype(chunk.dtype.newbyteorder("="))
            sl = tuple(
                slice(o, min(o + c, s))
                for o, c, s in zip(offs, cdims, shape)
            )
            trim = tuple(slice(0, s.stop - s.start) for s in sl)
            out[sl] = chunk[trim]
        return out
    raise ValueError(f"unsupported data layout class {cls}")


def _walk_chunk_btree(buf: bytes, addr: int, ndims: int):
    key_sz = 8 + 8 * ndims
    stack = [addr]
    visited: set[int] = set()
    while stack:
        a = stack.pop()
        if a in visited:
            raise ValueError("chunk B-tree cycle")
        visited.add(a)
        if _take(buf, a, 4) != b"TREE":
            raise ValueError("bad chunk B-tree signature")
        if buf[a + 4] != 1:
            raise ValueError("wrong B-tree node type in chunk index")
        level, nent = buf[a + 5], _u(buf, a + 6, 2)
        off = a + 24
        for _ in range(nent):
            nbytes = _u(buf, off, 4)
            fmask = _u(buf, off + 4, 4)
            offs = [_u(buf, off + 8 + 8 * i, 8) for i in range(ndims - 1)]
            child = _u(buf, off + key_sz, 8)
            if level == 0:
                yield offs, child, nbytes, fmask
            else:
                stack.append(child)
            off += key_sz + 8


# --- NetCDF-4 semantics ------------------------------------------------------


def _parse_hdf5(buf: bytes) -> dict:
    root_addr = _superblock(buf)
    root_msgs = _read_object_header(buf, root_addr)
    gattrs: dict = {}
    for mtype, body in root_msgs:
        if mtype == 0x000C:
            k, v = _parse_attribute(buf, body)
            gattrs[k] = v
    links = _group_links(buf, root_msgs)
    raw: dict[str, dict] = {}
    addr_to_name: dict[int, str] = {}
    for name, addr in links.items():
        msgs = _read_object_header(buf, addr)
        if any(m in (0x0011, 0x0006, 0x0002) for m, _ in msgs) and not any(
            m == 0x0008 for m, _ in msgs
        ):
            raise ValueError(f"nested groups unsupported ({name!r})")
        raw[name] = _read_dataset(buf, msgs)
        addr_to_name[addr] = name
    dims: list[tuple[str, int]] = []
    dim_names: set[str] = set()
    for name, d in raw.items():
        if d["attrs"].get("CLASS") == "DIMENSION_SCALE":
            dims.append((name, d["shape"][0] if d["shape"] else 0))
            dim_names.add(name)
    out_vars: dict[str, dict] = {}
    for name, d in raw.items():
        if name in dim_names:
            continue
        dl = d["attrs"].get("DIMENSION_LIST")
        if dl is not None:
            vdims = []
            for refs in dl:
                if len(refs) != 1 or refs[0] not in addr_to_name:
                    raise ValueError(f"unresolvable DIMENSION_LIST on {name!r}")
                vdims.append(addr_to_name[refs[0]])
        else:
            vdims = [f"phony_dim_{i}" for i in range(len(d["shape"]))]
        attrs = {k: v for k, v in d["attrs"].items()
                 if k not in ("DIMENSION_LIST", "CLASS", "NAME")}
        out_vars[name] = {"dims": vdims, "shape": d["shape"],
                          "attrs": attrs, "data": d["data"]}
    return {"dims": dims, "numrecs": 0, "attrs": gattrs, "vars": out_vars}


# ---------------------------------------------------------------------------
# fixture-twin writer (netCDF-4 flavored HDF5, earliest format)
# ---------------------------------------------------------------------------


def _dt_encode(arr_dtype: np.dtype) -> tuple[bytes, int]:
    dt = np.dtype(arr_dtype)
    size = dt.itemsize
    le = dt.byteorder in ("<", "=", "|")
    bo = 0 if le else 1
    if dt.kind in ("i", "u"):
        bits = bytes([bo | (0x08 if dt.kind == "i" else 0), 0, 0])
        props = struct.pack("<HH", 0, size * 8)
        return bytes([0x10 | 0]) + bits + struct.pack("<I", size) + props, size
    if dt.kind == "f":
        if size == 4:
            exp_loc, exp_sz, man_sz, bias, sign = 23, 8, 23, 127, 31
        elif size == 8:
            exp_loc, exp_sz, man_sz, bias, sign = 52, 11, 52, 1023, 63
        else:
            raise ValueError(f"unsupported float size {size}")
        bits = bytes([bo | 0x20, sign, 0])  # mantissa norm = 2 (msb implied)
        props = struct.pack("<HHBBBBI", 0, size * 8, exp_loc, exp_sz, 0,
                            man_sz, bias)
        return bytes([0x10 | 1]) + bits + struct.pack("<I", size) + props, size
    raise ValueError(f"unsupported dtype {dt}")


def _dt_string(n: int) -> bytes:
    return bytes([0x10 | 3, 0, 0, 0]) + struct.pack("<I", n)


_DT_OBJREF = bytes([0x10 | 7, 0, 0, 0]) + struct.pack("<I", 8)
_DT_VLEN_REF = (bytes([0x10 | 9, 0, 0, 0]) + struct.pack("<I", 16)
                + _DT_OBJREF)


def _dataspace(shape: list[int]) -> bytes:
    body = bytes([1, len(shape), 0, 0]) + b"\x00" * 4
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _pad8b(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _attr_msg(name: str, dt_enc: bytes, shape: list[int], data: bytes) -> bytes:
    nb = name.encode("utf-8") + b"\x00"
    ds = _dataspace(shape)
    body = struct.pack("<BBHHH", 1, 0, len(nb), len(dt_enc), len(ds))
    body += _pad8b(nb) + _pad8b(dt_enc) + _pad8b(ds) + data
    return body


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def alloc(self, data: bytes) -> int:
        addr = len(self.buf)
        self.buf += data
        return addr

    def patch(self, addr: int, data: bytes) -> None:
        self.buf[addr : addr + len(data)] = data


def _obj_header_v1(msgs: list[tuple[int, bytes]]) -> bytes:
    body = b""
    for mtype, mdata in msgs:
        mdata = _pad8b(mdata)
        body += struct.pack("<HHB3x", mtype, len(mdata), 0) + mdata
    return struct.pack("<BBHII4x", 1, 0, len(msgs), 1, len(body)) + body


def write_hdf5(
    path: str,
    dims: list[tuple[str, int]],
    variables: dict[str, tuple[list[str], np.ndarray]],
    attrs: dict | None = None,
    chunks: dict[str, tuple] | None = None,
    compress: dict[str, int] | None = None,
    var_attrs: dict[str, dict] | None = None,
) -> None:
    """Fixture twin of `parse_hdf5`: a netCDF-4-shaped HDF5 file —
    superblock v0, v1 object headers, symbol-table root group (B-tree
    v1 + SNOD + local heap), dimension-scale datasets for `dims`,
    DIMENSION_LIST vlen-objref attributes through a global heap, and
    per-variable contiguous or chunked+deflate layout (`chunks` /
    `compress` keyed by variable name). Every seam the reader checks.
    """
    chunks = chunks or {}
    compress = compress or {}
    w = _Writer()
    w.alloc(b"\x00" * (24 + 32 + 40))  # superblock placeholder

    names = [n for n, _ in dims] + list(variables)
    # local heap data: empty string at offset 0, then names
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        nb = n.encode("utf-8") + b"\x00"
        heap_data += nb + b"\x00" * (-len(nb) % 8)
    heap_data_addr = w.alloc(bytes(heap_data))
    heap_addr = w.alloc(
        b"HEAP" + bytes([0, 0, 0, 0])
        + struct.pack("<QQQ", len(heap_data), len(heap_data), heap_data_addr)
    )

    # dimension datasets: contiguous with UNDEF address (no storage)
    obj_addr: dict[str, int] = {}
    for dname, dlen in dims:
        dt_enc, esize = _dt_encode(np.dtype("<f4"))
        msgs = [
            (0x0001, _dataspace([dlen])),
            (0x0003, dt_enc),
            (0x0008, bytes([3, 1]) + struct.pack("<QQ", _UNDEF, 0)),
            (0x000C, _attr_msg("CLASS", _dt_string(16), [],
                               b"DIMENSION_SCALE\x00")),
            (0x000C, _attr_msg("NAME", _dt_string(len(dname) + 1), [],
                               dname.encode() + b"\x00")),
        ]
        obj_addr[dname] = w.alloc(_obj_header_v1(msgs))

    # global heap for DIMENSION_LIST payloads: one 8-byte objref per
    # (var, dim) element
    gobjs: list[bytes] = []
    g_index: dict[tuple[str, int], int] = {}
    for vname, (vdims, _) in variables.items():
        for i, dname in enumerate(vdims):
            g_index[(vname, i)] = len(gobjs) + 1
            gobjs.append(struct.pack("<Q", obj_addr[dname]))
    gcol = bytearray(b"GCOL" + bytes([1, 0, 0, 0]) + b"\x00" * 8)
    for i, data in enumerate(gobjs, start=1):
        gcol += struct.pack("<HH4xQ", i, 1, len(data)) + _pad8b(data)
    gcol += struct.pack("<HH4xQ", 0, 0, 0)  # free-space terminator
    struct.pack_into("<Q", gcol, 8, len(gcol))
    gcol_addr = w.alloc(bytes(gcol))

    # variable datasets
    for vname, (vdims, arr) in variables.items():
        arr = np.ascontiguousarray(arr)
        shape = list(arr.shape)
        if len(vdims) != len(shape):
            raise ValueError(f"{vname}: {len(vdims)} dims for rank {len(shape)}")
        dt_enc, esize = _dt_encode(arr.dtype)
        dl_data = b"".join(
            struct.pack("<IQI", 1, gcol_addr, g_index[(vname, i)])
            for i in range(len(vdims))
        )
        msgs = [
            (0x0001, _dataspace(shape)),
            (0x0003, dt_enc),
            (0x000C, _attr_msg("DIMENSION_LIST", _DT_VLEN_REF,
                               [len(vdims)], dl_data)),
        ]
        for k, v in (var_attrs or {}).get(vname, {}).items():
            if isinstance(v, str):
                vb = v.encode("utf-8") + b"\x00"
                msgs.append((0x000C, _attr_msg(k, _dt_string(len(vb)), [], vb)))
            else:
                a = np.asarray(v)
                enc, _ = _dt_encode(a.dtype)
                msgs.append((0x000C, _attr_msg(k, enc, [], a.tobytes())))
        if vname in chunks:
            cshape = list(chunks[vname])
            level = compress.get(vname)
            if level is not None:
                msgs.append((0x000B, _filter_msg(level)))
            btree_addr = _write_chunks(w, arr, cshape, esize, level)
            layout = (bytes([3, 2, len(cshape) + 1])
                      + struct.pack("<Q", btree_addr)
                      + b"".join(struct.pack("<I", c) for c in cshape)
                      + struct.pack("<I", esize))
            msgs.insert(2, (0x0008, layout))
        else:
            daddr = w.alloc(arr.tobytes())
            layout = bytes([3, 1]) + struct.pack("<QQ", daddr, arr.nbytes)
            msgs.insert(2, (0x0008, layout))
        obj_addr[vname] = w.alloc(_obj_header_v1(msgs))

    # root group: SNOD (sorted by name) + B-tree + object header
    entries = sorted(names)
    snod = bytearray(b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(entries)))
    for n in entries:
        snod += struct.pack("<QQI4x16x", name_off[n], obj_addr[n], 0)
    snod_addr = w.alloc(bytes(snod))
    btree = (b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
             + struct.pack("<QQ", _UNDEF, _UNDEF)
             + struct.pack("<QQQ", 0, snod_addr, name_off[entries[-1]]))
    btree_addr = w.alloc(btree)
    root_msgs: list[tuple[int, bytes]] = [
        (0x0011, struct.pack("<QQ", btree_addr, heap_addr))
    ]
    for k, v in (attrs or {}).items():
        if isinstance(v, str):
            vb = v.encode("utf-8") + b"\x00"
            root_msgs.append((0x000C, _attr_msg(k, _dt_string(len(vb)), [], vb)))
        else:
            a = np.asarray(v)
            enc, _ = _dt_encode(a.dtype)
            root_msgs.append((0x000C, _attr_msg(k, enc, [], a.tobytes())))
    root_addr = w.alloc(_obj_header_v1(root_msgs))

    sb = bytearray()
    sb += _SIG
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 1])
    sb += struct.pack("<HHI", 4, 16, 0)  # leaf k, internal k, flags
    sb += struct.pack("<QQQQ", 0, _UNDEF, len(w.buf), _UNDEF)
    sb += struct.pack("<QQI4x16x", 0, root_addr, 0)  # root STE
    w.patch(0, bytes(sb))
    with open(path, "wb") as f:
        f.write(w.buf)


def _filter_msg(level: int) -> bytes:
    name = b"deflate\x00"
    return (struct.pack("<BB6x", 1, 1)
            + struct.pack("<HHHH", 1, len(name), 1, 1) + name
            + struct.pack("<II", level, 0))


def _write_chunks(w: _Writer, arr: np.ndarray, cshape: list[int],
                  esize: int, level: int | None) -> int:
    shape = arr.shape
    grid = [range(0, s, c) for s, c in zip(shape, cshape)]
    import itertools

    entries = []
    for origin in itertools.product(*grid):
        sl = tuple(slice(o, min(o + c, s))
                   for o, c, s in zip(origin, cshape, shape))
        block = np.zeros(cshape, dtype=arr.dtype)
        trim = tuple(slice(0, s.stop - s.start) for s in sl)
        block[trim] = arr[sl]
        raw = block.tobytes()
        if level is not None:
            raw = zlib.compress(raw, level)
        addr = w.alloc(raw)
        entries.append((list(origin), addr, len(raw)))
    ndims = len(cshape) + 1
    key_sz = 8 + 8 * ndims
    node = bytearray(b"TREE" + bytes([1, 0]) + struct.pack("<H", len(entries))
                     + struct.pack("<QQ", _UNDEF, _UNDEF))
    for origin, addr, nbytes in entries:
        node += struct.pack("<II", nbytes, 0)
        for o in origin:
            node += struct.pack("<Q", o)
        node += struct.pack("<Q", 0)  # element-offset dim
        node += struct.pack("<Q", addr)
    # final key: one past the end of the dataset
    node += struct.pack("<II", 0, 0)
    for s in shape:
        node += struct.pack("<Q", s)
    node += struct.pack("<Q", 0)
    return w.alloc(bytes(node))


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

NC_GRID_CELL_SCHEMA = "path string, x int, y int, value double, mask double"


def hdf5_grid_cells(
    files_df,
    value_var: str,
    mask_var: str | None = None,
    x_dim: str = "x",
    y_dim: str = "y",
    mask_min: float | None = None,
    on_error: str = "raise",
):
    """S2 on NetCDF-4/HDF5 granules — the same scan → mapInPandas
    fan-out and in-kernel mask predicate as `netcdf3.netcdf_grid_cells`
    (odin_gdal/src/lib.rs:431-472 masked read), decoding through
    `parse_hdf5`. scale_factor/add_offset attributes (the GOES-R int16
    packing) are applied inside the kernel when present."""
    return _grid_cells(files_df, parse_hdf5, value_var, mask_var,
                       x_dim, y_dim, mask_min, on_error)


def nc_grid_cells_any(
    files_df,
    value_var: str,
    mask_var: str | None = None,
    x_dim: str = "x",
    y_dim: str = "y",
    mask_min: float | None = None,
    on_error: str = "raise",
):
    """Magic-sniffing dispatcher over a mixed granule lake: CDF-1/2
    classic bytes decode through `parse_netcdf3`, ``\\x89HDF`` bytes
    through `parse_hdf5` — one binaryFile scan handles both container
    generations (GDAL's driver dispatch, done in the kernel)."""

    def sniff(buf: bytes) -> dict:
        from odin_rs_spark.sources.netcdf3 import parse_netcdf3

        if buf[:3] == b"CDF":
            return parse_netcdf3(buf)
        if buf[:8] == _SIG:
            return parse_hdf5(buf)
        raise ValueError("neither NetCDF classic nor HDF5 magic")

    return _grid_cells(files_df, sniff, value_var, mask_var, x_dim, y_dim,
                       mask_min, on_error)


def _grid_cells(files_df, parser, value_var, mask_var, x_dim, y_dim,
                mask_min, on_error):
    import pandas as pd

    from odin_rs_spark.deploy import ensure_shipped

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    ensure_shipped(files_df.sparkSession)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    nc = parser(bytes(content))
                    if value_var not in nc["vars"]:
                        raise ValueError(
                            f"variable {value_var!r} not in granule"
                        )
                    if mask_var is not None and mask_var not in nc["vars"]:
                        raise ValueError(
                            f"mask variable {mask_var!r} not in granule"
                        )
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                v = nc["vars"][value_var]
                if v["dims"] != [y_dim, x_dim]:
                    raise ValueError(
                        f"{value_var} dims {v['dims']} != [{y_dim}, {x_dim}]"
                    )
                val = np.asarray(v["data"], dtype=np.float64)
                # GOES-R style packed integers: unpack in-kernel
                scale = v["attrs"].get("scale_factor")
                offset = v["attrs"].get("add_offset")
                if scale is not None:
                    val = val * float(scale)
                if offset is not None:
                    val = val + float(offset)
                h, wd = val.shape
                if mask_var is not None:
                    msk = np.asarray(nc["vars"][mask_var]["data"],
                                     dtype=np.float64)
                else:
                    msk = np.ones_like(val)
                yy, xx = np.mgrid[0:h, 0:wd]
                keep = (
                    np.ones(val.shape, dtype=bool)
                    if mask_min is None
                    else (msk >= mask_min)
                )
                yield pd.DataFrame(
                    {
                        "path": path,
                        "x": xx[keep].astype(np.int32),
                        "y": yy[keep].astype(np.int32),
                        "value": val[keep],
                        "mask": msk[keep],
                    }
                )

    return files_df.select("path", "content").mapInPandas(
        decode, NC_GRID_CELL_SCHEMA
    )
