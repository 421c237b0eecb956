"""Pure-stdlib/numpy GeoTIFF reader/writer (SURVEY §2.1/§2.10; parity:
the reference's DEM pipeline reads GeoTIFF tilesets through GDAL —
odin_dem/src/lib.rs:137-258, odin_gdal/src/lib.rs:578-624 — and its
`get_dem_heights` samples elevations from exactly these files. GDAL is
FFI the container doesn't have, but classic TIFF is a public IFD walk
and GeoTIFF georeferencing is two tags of doubles, so the DEM byte
path is real here).

Scope (errors name anything else): classic (non-Big) TIFF, both byte
orders, single-sample grayscale, uncompressed strips, bit depths 8/16
uint, 16-bit int, 32-bit float (the common DEM encodings), with the
GeoTIFF ModelPixelScale (33550) + ModelTiepoint (33922) tags mapping
pixel (i, j) to (lon, lat) as lon = tx + i·sx, lat = ty − j·sy
(north-up rasters). Tiled TIFFs and compression raise — the
documented GDAL seam.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 8: 2, 9: 4, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}


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
    if magic == 43:
        raise ValueError("BigTIFF unsupported (classic TIFF only)")
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])

    def read_entry(pos: int):
        tag, typ, cnt = struct.unpack(bo + "HHI", buf[pos : pos + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            return tag, None
        total = size * cnt
        if total <= 4:
            raw = buf[pos + 8 : pos + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", buf[pos + 8 : pos + 12])
            if off + total > len(buf):
                raise ValueError(f"tag {tag} data runs past the file")
            raw = buf[off : off + total]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            return tag, raw
        return tag, list(struct.unpack(bo + fmt * cnt, raw))

    if ifd_off + 2 > len(buf):
        raise ValueError("IFD offset past the file")
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    if ifd_off + 2 + 12 * n_entries > len(buf):
        raise ValueError("IFD runs past the file")
    tags: dict[int, list] = {}
    for e in range(n_entries):
        tag, val = read_entry(ifd_off + 2 + 12 * e)
        if val is not None:
            tags[tag] = val

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    ni, nj = one(256), one(257)
    if ni is None or nj is None:
        raise ValueError("missing ImageWidth/ImageLength")
    comp = one(259, 1)
    if comp != 1:
        raise ValueError(f"compression {comp} unsupported (uncompressed only)")
    spp = one(277, 1)
    if spp != 1:
        raise ValueError(f"{spp} samples/pixel unsupported (grayscale only)")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (stripped only)")
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
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("missing/mismatched strip offsets and byte counts")
    # strip sizes are raw 4-byte fields: bound total against the file
    # BEFORE any allocation (fuzzer class)
    need = nj * ni * (bits // 8)
    total_declared = sum(counts)
    if total_declared > len(buf) or total_declared < need:
        raise ValueError(
            f"strip bytes {total_declared} inconsistent with "
            f"{nj}x{ni}x{bits // 8} raster"
        )
    parts = []
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(buf):
            raise ValueError("strip runs past the file")
        parts.append(buf[off : off + cnt])
    raw = b"".join(parts)[:need]
    vals = (
        np.frombuffer(raw, dtype=np_dtype).astype(np.float64).reshape(nj, ni)
    )

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
) -> None:
    """Minimal little-endian GeoTIFF writer — the fixture twin of
    `parse_geotiff` (one strip, uncompressed, grayscale). `lat0` is the
    top row's latitude; `dlat` should be negative for north-up, and
    ModelPixelScale stores |dlat|. NaN cells encode as `nodata` (which
    becomes the GDAL_NODATA ASCII tag)."""
    nj, ni = values.shape
    np_dtype = {"u1": "<u1", "u2": "<u2", "i2": "<i2", "f4": "<f4"}.get(dtype)
    if np_dtype is None:
        raise ValueError(f"dtype {dtype!r} unsupported (u1/u2/i2/f4)")
    bits = int(np_dtype[-1]) * 8
    sfmt = {"u": 1, "i": 2, "f": 3}[np_dtype[1]]
    v = np.asarray(values, dtype=np.float64)
    if nodata is not None:
        v = np.where(np.isnan(v), nodata, v)
    elif np.isnan(v).any():
        raise ValueError("NaN values need an explicit nodata")
    data = v.astype(np_dtype).tobytes()

    entries: list[tuple[int, int, int, bytes]] = []
    extra = bytearray()
    header_size = 8
    # layout: header | IFD | extra data | strip
    def add(tag: int, typ: int, vals_list: list):
        fmt = _TYPE_FMT[typ]
        payload = struct.pack("<" + fmt * len(vals_list), *vals_list)
        entries.append((tag, typ, len(vals_list), payload))

    add(256, 4, [ni])
    add(257, 4, [nj])
    add(258, 3, [bits])
    add(259, 3, [1])
    add(262, 3, [1])
    add(277, 3, [1])
    add(278, 4, [nj])
    add(279, 4, [len(data)])
    add(339, 3, [sfmt])
    add(33550, 12, [abs(dlon), abs(dlat), 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, lon0, lat0, 0.0])
    if nodata is not None:
        nd = f"{nodata}".encode("ascii") + b"\x00"
        entries.append((42113, 2, len(nd), nd))
    add(273, 4, [0])  # placeholder, patched below

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = header_size
    data_area_off = ifd_off + 2 + 12 * n + 4
    # assign overflow offsets
    blobs: list[bytes] = []
    cursor = data_area_off
    encoded = []
    for tag, typ, cnt, payload in entries:
        if len(payload) <= 4:
            encoded.append((tag, typ, cnt, payload.ljust(4, b"\x00"), None))
        else:
            encoded.append((tag, typ, cnt, struct.pack("<I", cursor), payload))
            cursor += len(payload)
    strip_off = cursor
    # patch StripOffsets (tag 273) value
    final = []
    for tag, typ, cnt, val4, blob in encoded:
        if tag == 273:
            val4 = struct.pack("<I", strip_off)
        final.append((tag, typ, cnt, val4, blob))

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, val4, _ in final:
        out += struct.pack("<HHI", tag, typ, cnt) + val4
    out += struct.pack("<I", 0)  # next IFD
    for _, _, _, _, blob in final:
        if blob is not None:
            out += blob
    assert len(out) == strip_off
    out += data
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
