"""Pure-stdlib/numpy GeoTIFF reader/writer (SURVEY §2.1/§2.10; parity:
the reference's DEM pipeline reads GeoTIFF tilesets through GDAL —
odin_dem/src/lib.rs:137-258, odin_gdal/src/lib.rs:578-624 — and its
`get_dem_heights` samples elevations from exactly these files. GDAL is
FFI the container doesn't have, but classic TIFF is a public IFD walk
and GeoTIFF georeferencing is two tags of doubles, so the DEM byte
path is real here).

Scope (errors name anything else): classic (non-Big) TIFF, both byte
orders, single-sample grayscale, bit depths 8/16 uint, 16-bit int,
32-bit float (the common DEM encodings), STRIPPED or TILED layout,
compression none / DEFLATE (8 and legacy 32946, zlib streams) / LZW
(5, the TIFF6 MSB-first early-change variant), horizontal-
differencing predictor 2 for integer samples and the TechNote-3
floating-point predictor 3 (byte-plane shuffle + byte differencing)
for f4 — i.e. the files real DEM tilesets actually ship (tiled +
DEFLATE/LZW with a predictor is what GDAL writes; the reference
reads them via GDAL VRT mosaics). Georeferencing via GeoTIFF
ModelPixelScale (33550) + ModelTiepoint (33922): pixel (i, j) →
(lon, lat) as lon = tx + i·sx, lat = ty − j·sy (north-up rasters).
Both classic TIFF and BigTIFF (magic 43, 8-byte offsets — the >4 GB
mosaic form) parse.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 8: 2, 9: 4, 11: 4, 12: 8,
              16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF6 LZW (section 13): MSB-first codes starting at 9 bits,
    ClearCode 256 / EOI 257, EARLY code-width change (width bumps when
    the next table index reaches 511/1023/2047 — one code earlier than
    vanilla LZW). `expected` bounds the output so a crafted stream is
    a ValueError, not an allocation bomb."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    nbits = 9
    bitpos = 0
    total_bits = len(data) * 8
    prev: bytes | None = None
    while bitpos + nbits <= total_bits:
        byte_idx = bitpos >> 3
        window = int.from_bytes(
            data[byte_idx : byte_idx + 3].ljust(3, b"\x00"), "big"
        )
        code = (window >> (24 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            del table[258:]
            nbits = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("lzw: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"lzw: code {code} beyond table")
        out += entry
        if len(out) > expected:
            raise ValueError("lzw: output exceeds the declared segment size")
        prev = entry
        # EARLY change (TIFF6 / ISO 32000 EarlyChange=1): the encoder
        # widens as soon as it ADDS entry 511/1023/2047 — one code
        # before a 9/10/11-bit code actually overflows. The decoder's
        # table trails the encoder's by exactly one add, so it widens
        # after ITS add makes len(table) = 511/1023/2047 (last added
        # index 510/1022/2046) — the tifffile/libtiff-compatible rule.
        if len(table) in (511, 1023, 2047) and nbits < 12:
            nbits += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Fixture twin of `_lzw_decode` (same early-change schedule)."""
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal acc, accbits
        acc = (acc << nbits) | code
        accbits += nbits
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    emit(_LZW_CLEAR, nbits)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], nbits)
        table[wc] = next_code
        next_code += 1
        # early change: widen right after ADDING entry 511/1023/2047
        if next_code in (512, 1024, 2048):
            nbits += 1
        elif next_code == 4094:  # table nearly full: reset (libtiff does)
            emit(_LZW_CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
        w = c
    if w:
        emit(table[w], nbits)
    emit(_LZW_EOI, nbits)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def parse_geotiff(buf: bytes) -> dict:
    """GeoTIFF bytes → {"values" (nj, ni) float64, "ni", "nj", "lat0",
    "lon0", "dlat", "dlon", "nodata" | None}. lat0/lon0 reference the
    FIRST (top-left) pixel center offset by the tiepoint; dlat is
    negative for north-up rasters (the grib2 grid convention, so the
    same cell fan-out code consumes both)."""
    try:
        return _parse_geotiff(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt TIFF file: {exc}") from exc


def _parse_geotiff(buf: bytes) -> dict:
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack(bo + "H", buf[2:4])
    if magic == 42:
        big = False
        (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    elif magic == 43:
        # BigTIFF: 8-byte offsets everywhere (what >4 GB mosaics use)
        big = True
        osize, zero = struct.unpack(bo + "HH", buf[4:8])
        if osize != 8 or zero != 0:
            raise ValueError(f"BigTIFF offset size {osize} unsupported")
        (ifd_off,) = struct.unpack(bo + "Q", buf[8:16])
    else:
        raise ValueError(f"bad TIFF magic {magic}")
    inline = 8 if big else 4  # bytes of in-entry value storage
    entry_sz = 20 if big else 12
    cnt_sz = 8 if big else 2

    def read_entry(pos: int):
        tag, typ = struct.unpack(bo + "HH", buf[pos : pos + 4])
        if big:
            (cnt,) = struct.unpack(bo + "Q", buf[pos + 4 : pos + 12])
        else:
            (cnt,) = struct.unpack(bo + "I", buf[pos + 4 : pos + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            return tag, None
        total = size * cnt
        vpos = pos + (12 if big else 8)
        if total <= inline:
            raw = buf[vpos : vpos + total]
        else:
            (off,) = struct.unpack(
                bo + ("Q" if big else "I"), buf[vpos : vpos + inline]
            )
            if off + total > len(buf):
                raise ValueError(f"tag {tag} data runs past the file")
            raw = buf[off : off + total]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            return tag, raw
        return tag, list(struct.unpack(bo + fmt * cnt, raw))

    if ifd_off + cnt_sz > len(buf):
        raise ValueError("IFD offset past the file")
    (n_entries,) = struct.unpack(
        bo + ("Q" if big else "H"), buf[ifd_off : ifd_off + cnt_sz]
    )
    if n_entries > (1 << 16) or ifd_off + cnt_sz + entry_sz * n_entries > len(buf):
        raise ValueError("IFD runs past the file")
    tags: dict[int, list] = {}
    for e in range(n_entries):
        tag, val = read_entry(ifd_off + cnt_sz + entry_sz * e)
        if val is not None:
            tags[tag] = val

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    ni, nj = one(256), one(257)
    if ni is None or nj is None:
        raise ValueError("missing ImageWidth/ImageLength")
    comp = one(259, 1)
    if comp not in (1, 5, 8, 32946):
        raise ValueError(
            f"compression {comp} unsupported (none/LZW/DEFLATE only)"
        )
    spp = one(277, 1)
    if spp != 1:
        raise ValueError(f"{spp} samples/pixel unsupported (grayscale only)")
    bits = one(258, 8)
    sfmt = one(339, 1)  # 1 uint, 2 int, 3 float
    np_dtype = {
        (8, 1): bo + "u1",
        (16, 1): bo + "u2",
        (16, 2): bo + "i2",
        (32, 2): bo + "i4",
        (32, 3): bo + "f4",
    }.get((bits, sfmt))
    if np_dtype is None:
        raise ValueError(f"sample format bits={bits} fmt={sfmt} unsupported")
    predictor = one(317, 1)
    if predictor not in (1, 2, 3):
        raise ValueError(
            f"predictor {predictor} unsupported (none/horizontal/float)"
        )
    if predictor == 2 and sfmt == 3:
        raise ValueError(
            "horizontal predictor on float samples unsupported "
            "(predictor 3 is the float form)"
        )
    if predictor == 3 and sfmt != 3:
        raise ValueError("floating-point predictor needs float samples")
    bps = bits // 8
    if ni <= 0 or nj <= 0 or ni * nj > (1 << 28):
        raise ValueError(f"raster {nj}x{ni} out of bounds")

    def decomp(seg: bytes, expected: int) -> bytes:
        if comp == 1:
            data = seg
        elif comp in (8, 32946):  # DEFLATE (zlib stream)
            try:
                # max_length caps the allocation: a crafted bomb
                # segment yields a short-read ValueError, not an OOM
                data = zlib.decompressobj().decompress(seg, expected)
            except zlib.error as exc:
                raise ValueError(f"corrupt deflate segment: {exc}") from exc
        else:  # 5 — LZW
            data = _lzw_decode(seg, expected)
        if len(data) < expected:
            raise ValueError(
                f"segment decodes to {len(data)} bytes, expected {expected}"
            )
        return data[:expected]

    def unpredict(a: np.ndarray) -> np.ndarray:
        if predictor != 2:
            return a
        # horizontal differencing: each sample stored as the delta to
        # its left neighbour; undo with a modular row cumsum (wraps in
        # the sample's own unsigned width, per TIFF6 §14)
        u = a.view(a.dtype.str.replace("i", "u"))
        out = np.cumsum(u, axis=1, dtype=u.dtype)
        return out.view(a.dtype)

    def segment_array(data: bytes, rows: int, width: int) -> np.ndarray:
        if predictor == 3:
            # floating-point predictor (TIFF TechNote 3 / libtiff
            # fpAcc): per row, bytes were shuffled into big-endian
            # significance PLANES then byte-differenced — undo with a
            # modular byte cumsum, de-shuffle, read as big-endian floats
            b = np.frombuffer(data, np.uint8).reshape(rows, width * bps)
            b = np.cumsum(b, axis=1, dtype=np.uint8)
            planes = b.reshape(rows, bps, width)
            sample_bytes = np.ascontiguousarray(planes.transpose(0, 2, 1))
            return np.frombuffer(
                sample_bytes.tobytes(), ">f4"
            ).reshape(rows, width)
        a = np.frombuffer(data, dtype=np_dtype).reshape(rows, width)
        return unpredict(a)

    def segment(off: int, cnt: int) -> bytes:
        if off < 0 or cnt < 0 or off + cnt > len(buf):
            raise ValueError("segment runs past the file")
        return bytes(buf[off : off + cnt])

    if 322 in tags or 323 in tags:
        tw, th = one(322), one(323)
        toffs, tcnts = tags.get(324), tags.get(325)
        if not tw or not th or tw <= 0 or th <= 0:
            raise ValueError("bad TileWidth/TileLength")
        if not toffs or not tcnts or len(toffs) != len(tcnts):
            raise ValueError("missing/mismatched tile offsets and byte counts")
        across = -(-ni // tw)
        down = -(-nj // th)
        if len(toffs) != across * down:
            raise ValueError(
                f"{len(toffs)} tiles != {across}x{down} tile grid"
            )
        # bound the PADDED mosaic too: crafted 60000x60000 tile dims on
        # a 1x1 image pass the ni*nj guard but would allocate tens of
        # GB here (fuzzer class — bound before any allocation)
        if down * th * across * tw > (1 << 28):
            raise ValueError(
                f"tile grid {down * th}x{across * tw} out of bounds"
            )
        full = np.zeros((down * th, across * tw), dtype=np.float64)
        for idx, (off, cnt) in enumerate(zip(toffs, tcnts)):
            data = decomp(segment(off, cnt), tw * th * bps)
            r, c = idx // across, idx % across
            full[r * th : (r + 1) * th, c * tw : (c + 1) * tw] = (
                segment_array(data, th, tw)
            )
        vals = full[:nj, :ni]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("missing/mismatched strip offsets and byte counts")
        rps = one(278, nj) or nj
        if rps <= 0:
            raise ValueError("bad RowsPerStrip")
        n_strips = -(-nj // rps)
        if len(offsets) != n_strips:
            raise ValueError(
                f"{len(offsets)} strips != ceil({nj}/{rps}) expected"
            )
        rows = []
        for k, (off, cnt) in enumerate(zip(offsets, counts)):
            r0, r1 = k * rps, min(nj, (k + 1) * rps)
            data = decomp(segment(off, cnt), (r1 - r0) * ni * bps)
            rows.append(segment_array(data, r1 - r0, ni))
        vals = np.vstack(rows).astype(np.float64)

    scale = tags.get(33550)
    tie = tags.get(33922)
    if scale is None or tie is None or len(scale) < 2 or len(tie) < 6:
        raise ValueError("missing GeoTIFF ModelPixelScale/ModelTiepoint tags")
    sx, sy = float(scale[0]), float(scale[1])
    # tiepoint: raster (I, J, K) -> model (X, Y, Z); standard files pin
    # the top-left corner (0, 0)
    ti, tj, tx, ty = float(tie[0]), float(tie[1]), float(tie[3]), float(tie[4])
    lon0 = tx - ti * sx
    lat0 = ty + tj * sy
    nodata = None
    if 42113 in tags:  # GDAL_NODATA, ASCII
        try:
            nodata = float(bytes(tags[42113]).split(b"\x00")[0])
        except (ValueError, TypeError):
            nodata = None
    out = {
        "values": vals,
        "ni": int(ni),
        "nj": int(nj),
        "lon0": lon0,
        "lat0": lat0,
        "dlon": sx,
        "dlat": -sy,  # north-up: row j moves south
        "nodata": nodata,
    }
    if nodata is not None:
        out["values"] = np.where(vals == nodata, np.nan, vals)
    return out


def write_geotiff(
    path: str,
    values: np.ndarray,
    lat0: float,
    lon0: float,
    dlat: float,
    dlon: float,
    dtype: str = "f4",
    nodata: float | None = None,
    compression: str = "none",
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    bigtiff: bool = False,
) -> None:
    """Little-endian GeoTIFF writer — the fixture twin of
    `parse_geotiff` (grayscale; stripped by default, tiled when `tile`
    = (tw, th); compression none/deflate/lzw; horizontal predictor 2
    for integer dtypes). `lat0` is the top row's latitude; `dlat`
    should be negative for north-up, and ModelPixelScale stores
    |dlat|. NaN cells encode as `nodata` (which becomes the
    GDAL_NODATA ASCII tag)."""
    nj, ni = values.shape
    np_dtype = {"u1": "<u1", "u2": "<u2", "i2": "<i2", "f4": "<f4"}.get(dtype)
    if np_dtype is None:
        raise ValueError(f"dtype {dtype!r} unsupported (u1/u2/i2/f4)")
    comp_id = {"none": 1, "lzw": 5, "deflate": 8}.get(compression)
    if comp_id is None:
        raise ValueError(f"compression {compression!r} unsupported")
    if predictor not in (1, 2, 3):
        raise ValueError(f"predictor {predictor} unsupported")
    if predictor == 2 and dtype == "f4":
        raise ValueError("horizontal predictor needs an integer dtype")
    if predictor == 3 and dtype != "f4":
        raise ValueError("floating-point predictor needs dtype f4")
    bits = int(np_dtype[-1]) * 8
    sfmt = {"u": 1, "i": 2, "f": 3}[np_dtype[1]]
    v = np.asarray(values, dtype=np.float64)
    if nodata is not None:
        v = np.where(np.isnan(v), nodata, v)
    elif np.isnan(v).any():
        raise ValueError("NaN values need an explicit nodata")
    arr = v.astype(np_dtype)

    def predict(a: np.ndarray) -> np.ndarray:
        if predictor != 2:
            return a
        u = a.view(a.dtype.str.replace("i", "u")).copy()
        u[:, 1:] = u[:, 1:] - u[:, :-1]  # modular per-row differencing
        return u.view(a.dtype)

    def row_bytes(a: np.ndarray) -> bytes:
        if predictor == 3:
            # fpDiff: big-endian sample bytes shuffled into per-row
            # significance planes, then byte-differenced
            rows, width = a.shape
            be = np.ascontiguousarray(a, dtype=">f4")
            b = np.frombuffer(be.tobytes(), np.uint8).reshape(
                rows, width, 4
            )
            planes = np.ascontiguousarray(
                b.transpose(0, 2, 1)
            ).reshape(rows, width * 4).copy()
            planes[:, 1:] = planes[:, 1:] - planes[:, :-1]
            return planes.tobytes()
        return predict(a).tobytes()

    def pack(a: np.ndarray) -> bytes:
        raw = row_bytes(a)
        if comp_id == 8:
            return zlib.compress(raw, 9)
        if comp_id == 5:
            return _lzw_encode(raw)
        return raw

    segments: list[bytes] = []
    if tile is not None:
        tw, th = tile
        across, down = -(-ni // tw), -(-nj // th)
        padded = np.zeros((down * th, across * tw), dtype=np_dtype)
        padded[:nj, :ni] = arr
        for r in range(down):
            for c in range(across):
                segments.append(
                    pack(padded[r * th : (r + 1) * th, c * tw : (c + 1) * tw])
                )
    else:
        segments.append(pack(arr))

    entries: list[tuple[int, int, int, bytes]] = []

    def add(tag: int, typ: int, vals_list: list):
        fmt = _TYPE_FMT[typ]
        payload = struct.pack("<" + fmt * len(vals_list), *vals_list)
        entries.append((tag, typ, len(vals_list), payload))

    add(256, 4, [ni])
    add(257, 4, [nj])
    add(258, 3, [bits])
    add(259, 3, [comp_id])
    add(262, 3, [1])
    add(277, 3, [1])
    if predictor != 1:
        add(317, 3, [predictor])
    add(339, 3, [sfmt])
    add(33550, 12, [abs(dlon), abs(dlat), 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, lon0, lat0, 0.0])
    if nodata is not None:
        nd = f"{nodata}".encode("ascii") + b"\x00"
        entries.append((42113, 2, len(nd), nd))
    n_seg = len(segments)
    if tile is not None:
        add(322, 4, [tile[0]])
        add(323, 4, [tile[1]])
        add(324, 4, [0] * n_seg)  # patched below
        add(325, 4, [len(s) for s in segments])
        off_tag = 324
    else:
        add(278, 4, [nj])
        add(273, 4, [0] * n_seg)  # patched below
        add(279, 4, [len(s) for s in segments])
        off_tag = 273

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    inline = 8 if bigtiff else 4
    if bigtiff:
        ifd_off = 16
        data_area_off = ifd_off + 8 + 20 * n + 8
    else:
        ifd_off = 8
        data_area_off = ifd_off + 2 + 12 * n + 4
    # first pass: lay out tag-overflow payloads after the IFD
    cursor = data_area_off
    encoded = []
    off_fmt = "<Q" if bigtiff else "<I"
    for tag, typ, cnt, payload in entries:
        if len(payload) <= inline:
            encoded.append(
                (tag, typ, cnt, payload.ljust(inline, b"\x00"), None)
            )
        else:
            encoded.append(
                (tag, typ, cnt, struct.pack(off_fmt, cursor), payload)
            )
            cursor += len(payload)
    # segments start after the overflow area; patch the offsets array
    seg_offs = []
    seg_cursor = cursor
    for s in segments:
        seg_offs.append(seg_cursor)
        seg_cursor += len(s)
    off_payload = struct.pack("<" + "I" * n_seg, *seg_offs)
    final = []
    for tag, typ, cnt, val4, blob in encoded:
        if tag == off_tag:
            if blob is None:
                val4 = off_payload.ljust(inline, b"\x00")
            else:
                blob = off_payload
        final.append((tag, typ, cnt, val4, blob))

    if bigtiff:
        out = bytearray(b"II+\x00" + struct.pack("<HHQ", 8, 0, ifd_off))
        out += struct.pack("<Q", n)
        for tag, typ, cnt, val4, _ in final:
            out += struct.pack("<HHQ", tag, typ, cnt) + val4
        out += struct.pack("<Q", 0)  # next IFD
    else:
        out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
        out += struct.pack("<H", n)
        for tag, typ, cnt, val4, _ in final:
            out += struct.pack("<HHI", tag, typ, cnt) + val4
        out += struct.pack("<I", 0)  # next IFD
    for _, _, _, _, blob in final:
        if blob is not None:
            out += blob
    assert len(out) == cursor
    for s in segments:
        out += s
    with open(path, "wb") as f:
        f.write(bytes(out))


def geotiff_grid_cells(files_df, value_min: float | None = None, on_error: str = "raise"):
    """GeoTIFF granules → cell DataFrame with georeferenced lat/lon —
    the DEM scan (S-layer twin of grib2_grid_cells; the reference's
    get_dem_heights samples exactly these rasters). `value_min` runs
    in-kernel; nodata cells never become rows."""
    import pandas as pd

    from odin_rs_spark.deploy import ensure_shipped

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    ensure_shipped(files_df.sparkSession)

    from typing import Iterator

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    g = parse_geotiff(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                v = g["values"]
                nj, ni = v.shape
                yy, xx = np.mgrid[0:nj, 0:ni]
                keep = ~np.isnan(v)
                if value_min is not None:
                    keep &= v >= value_min
                yield pd.DataFrame(
                    {
                        "path": path,
                        "x": xx[keep].astype(np.int32),
                        "y": yy[keep].astype(np.int32),
                        "lat": g["lat0"] + yy[keep] * g["dlat"],
                        "lon": g["lon0"] + xx[keep] * g["dlon"],
                        "value": v[keep],
                    }
                )

    return files_df.select("path", "content").mapInPandas(
        decode, "path string, x int, y int, lat double, lon double, value double"
    )
