"""Pure-Python GRIB2 reader/writer for simple packing (SURVEY §2.1 S11;
parity: the reference's HRRR forecast reader decodes GRIB2 fields via
external tooling, odin_hrrr/src/lib.rs:262-307).

GRIB2 (WMO FM 92) is a public sectioned binary format. This module
implements the subset that covers regular forecast products:

- Section 0/1/8 framing, single-message files;
- Section 3 grid template **3.0** (regular lat/lon): Ni×Nj axes with
  microdegree first-point/increments (sign-magnitude negatives per
  spec);
- Section 5 data template **5.0** (simple packing): value = (R + X·2^E)
  · 10^-D with X an `nbits`-wide big-endian integer stream;
- Section 6 bitmap indicator 255 (no bitmap) or 0 (embedded bitmap:
  missing points carry no packed value).

Complex/JPEG2000 packing (templates 5.2/5.40) genuinely needs external
codecs and remains the documented seam — same policy as JPEG in
imagecodec.py. The byte-range FETCH side of S11 (the reference's .idx
scheme) stays scoped out per SURVEY §7.3; this closes the DECODE side.

Scale shape (`grib2_grid_cells`): binaryFile scan → mapInPandas decode
per message → cell rows (x, y, lat, lon, value); one forecast granule
per task, embarrassingly parallel across granules, optional value
predicate applied in-kernel on the numpy array.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


def _sm16(v: int) -> int:
    """GRIB sign-magnitude int16 → python int."""
    return -(v & 0x7FFF) if v & 0x8000 else v


def _sm16_enc(v: int) -> int:
    return (0x8000 | (-v)) if v < 0 else v


def _sm32(v: int) -> int:
    return -(v & 0x7FFFFFFF) if v & 0x80000000 else v


def _sm32_enc(v: int) -> int:
    return (0x80000000 | (-v)) if v < 0 else v


def parse_grib2(buf: bytes) -> dict:
    """Single-message GRIB2 → {"ni","nj","lat0","lon0","dlat","dlon",
    "values" (nj, ni) float64, "param" (discipline, category, number),
    "missing" bool mask or None}.

    Error contract: every malformed input raises ValueError (struct /
    index / reshape errors are wrapped) — one catchable type per
    corrupt granule (see `grib2_grid_cells` on_error="skip")."""
    try:
        return _parse_grib2(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError, reshape…
        raise ValueError(f"corrupt GRIB2 file: {exc}") from exc


def _parse_grib2(buf: bytes) -> dict:
    if buf[:4] != b"GRIB":
        raise ValueError("not a GRIB file (bad magic)")
    if buf[7] != 2:
        raise ValueError(f"GRIB edition {buf[7]} unsupported (GRIB2 only)")
    discipline = buf[6]
    (total_len,) = struct.unpack(">Q", buf[8:16])
    pos = 16
    grid = pack = None
    bitmap = None
    category = number = None
    values = None
    while pos < total_len - 4:
        if buf[pos : pos + 4] == b"7777":
            break
        (sec_len,) = struct.unpack(">I", buf[pos : pos + 4])
        if sec_len < 5:
            # a zero/short section length would never advance `pos` —
            # an INFINITE LOOP on corrupt input (found by the mutation
            # fuzzer), not just a bad parse
            raise ValueError(f"corrupt GRIB2: section length {sec_len} < 5")
        sec_num = buf[pos + 4]
        body = buf[pos : pos + sec_len]
        if sec_num == 3:
            (tmpl,) = struct.unpack(">H", body[12:14])
            if tmpl != 0:
                raise ValueError(f"grid template 3.{tmpl} unsupported (3.0 only)")
            ni, nj = struct.unpack(">II", body[30:38])
            la1, lo1 = struct.unpack(">II", body[46:54])
            la2, lo2 = struct.unpack(">II", body[55:63])
            di, dj = struct.unpack(">II", body[63:71])
            scan = body[71]
            # Di/Dj are unsigned magnitudes; the DIRECTION comes from
            # the scanning-mode flags (spec table 3.4): bit 0x80 set →
            # -i (west), bit 0x40 set → +j (south→north). Real products
            # (GFS/HRRR) use 0x00: rows run NORTH→SOUTH, so dlat must
            # come out negative or every cell gets a wrong latitude.
            dlon = _sm32(di) / 1e6
            dlat = _sm32(dj) / 1e6
            if scan & 0x80:
                dlon = -abs(dlon)
            if not (scan & 0x40):
                dlat = -abs(dlat)
            if scan & 0x20:
                raise ValueError("column-major (consecutive-j) scanning unsupported")
            grid = {
                "ni": ni,
                "nj": nj,
                "lat0": _sm32(la1) / 1e6,
                "lon0": _sm32(lo1) / 1e6,
                "dlat": dlat,
                "dlon": dlon,
                "scan": scan,
            }
        elif sec_num == 4:
            category, number = body[9], body[10]
        elif sec_num == 5:
            (tmpl,) = struct.unpack(">H", body[9:11])
            if tmpl != 0:
                raise ValueError(f"data template 5.{tmpl} unsupported (5.0 only)")
            (r_ref,) = struct.unpack(">f", body[11:15])
            (e_raw, d_raw) = struct.unpack(">HH", body[15:19])
            pack = {
                "R": float(r_ref),
                "E": _sm16(e_raw),
                "D": _sm16(d_raw),
                "nbits": body[19],
            }
        elif sec_num == 6:
            ind = body[5]
            if ind == 0:
                bitmap = np.unpackbits(
                    np.frombuffer(body, dtype=np.uint8, offset=6)
                ).astype(bool)
            elif ind != 255:
                raise ValueError(f"bitmap indicator {ind} unsupported")
        elif sec_num == 7:
            values = body[5:]
        pos += sec_len
    if grid is None or pack is None or values is None:
        raise ValueError("GRIB2 message missing section 3, 5 or 7")
    n = grid["ni"] * grid["nj"]
    n_packed = n if bitmap is None else int(bitmap[:n].sum())
    bits = np.unpackbits(np.frombuffer(values, dtype=np.uint8))
    nb = pack["nbits"]
    if nb == 0:
        x = np.zeros(n_packed, dtype=np.int64)
    else:
        bits = bits[: n_packed * nb].reshape(n_packed, nb)
        x = (bits.astype(np.int64) * (1 << np.arange(nb - 1, -1, -1))).sum(axis=1)
    vals = (pack["R"] + x * (2.0 ** pack["E"])) * (10.0 ** -pack["D"])
    if bitmap is not None:
        full = np.full(n, np.nan)
        full[bitmap[:n]] = vals
        vals = full
    out = vals.reshape(grid["nj"], grid["ni"])
    return {
        **grid,
        "param": (discipline, category, number),
        "values": out,
        "missing": None if bitmap is None else ~bitmap[:n].reshape(grid["nj"], grid["ni"]),
    }


def write_grib2(
    path: str,
    values: np.ndarray,
    lat0: float,
    lon0: float,
    dlat: float,
    dlon: float,
    e_scale: int = 0,
    d_scale: int = 0,
    r_ref: float = 0.0,
    nbits: int = 12,
    discipline: int = 0,
    category: int = 2,
    number: int = 2,
) -> None:
    """Minimal GRIB2 writer (template 3.0 + 5.0, no bitmap) — the
    fixture generator and the reader's roundtrip twin. Values must
    satisfy X = (v·10^D − R)·2^−E being integers in [0, 2^nbits)."""
    nj, ni = values.shape
    x = (values * (10.0 ** d_scale) - r_ref) * (2.0 ** -e_scale)
    xi = np.round(x).astype(np.int64)
    if not np.allclose(x, xi, rtol=0, atol=1e-9):
        raise ValueError("values not representable under the given scales")
    if xi.min() < 0 or xi.max() >= (1 << nbits):
        raise ValueError("packed integers out of nbits range")

    sec0 = b"GRIB\x00\x00" + bytes([discipline, 2])  # + total length later
    sec1 = (
        struct.pack(">IB", 21, 1)
        + struct.pack(">HHBBB", 0, 0, 2, 1, 1)
        + struct.pack(">HBBBBB", 2024, 1, 1, 0, 0, 0)
        + bytes([0, 1])
    )
    t30 = (
        bytes([0])  # source of grid definition
        + struct.pack(">I", ni * nj)
        + bytes([0, 0])
        + struct.pack(">H", 0)  # template 3.0
        + bytes(14)  # shape of earth + radii (octets 15-28, unused here)
        + b"\x00\x00"  # pad to octet 30
        + struct.pack(">II", ni, nj)
        + bytes(8)  # basic angle + subdivisions (octets 39-46)
        + struct.pack(">II", _sm32_enc(round(lat0 * 1e6)), _sm32_enc(round(lon0 * 1e6)))
        + bytes([0x30])  # resolution/component flags (octet 55)
        + struct.pack(
            ">II",
            _sm32_enc(round((lat0 + dlat * (nj - 1)) * 1e6)),
            _sm32_enc(round((lon0 + dlon * (ni - 1)) * 1e6)),
        )
        # Di/Dj carry MAGNITUDES; direction goes in the scanning-mode
        # flags (−i → 0x80, +j → 0x40), matching the reader
        + struct.pack(">II", round(abs(dlon) * 1e6), round(abs(dlat) * 1e6))
        + bytes([(0x80 if dlon < 0 else 0) | (0x40 if dlat > 0 else 0)])
    )
    sec3 = struct.pack(">IB", 5 + len(t30), 3) + t30
    sec4 = (
        struct.pack(">IBH", 34, 4, 0)
        + struct.pack(">H", 0)  # template 4.0
        + bytes([category, number])
        + bytes(23)
    )
    sec5 = (
        struct.pack(">IBI", 21, 5, ni * nj)
        + struct.pack(">H", 0)  # template 5.0
        + struct.pack(">f", r_ref)
        + struct.pack(">HH", _sm16_enc(e_scale), _sm16_enc(d_scale))
        + bytes([nbits, 0])
    )
    sec6 = struct.pack(">IBB", 6, 6, 255)
    flat = xi.reshape(-1)
    bits = ((flat[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.uint8)
    packed = np.packbits(bits.reshape(-1)).tobytes()
    sec7 = struct.pack(">IB", 5 + len(packed), 7) + packed
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    with open(path, "wb") as f:
        f.write(sec0 + struct.pack(">Q", total) + body + b"7777")


GRIB_CELL_SCHEMA = (
    "path string, x int, y int, lat double, lon double, value double"
)


def grib2_decode_errors(files_df):
    """Dead-letter audit: one (path, error) row per unparseable granule
    (same contract as netcdf3.netcdf_decode_errors)."""
    import pandas as pd

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            paths, errs = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    parse_grib2(bytes(content))
                except ValueError as exc:
                    paths.append(path)
                    errs.append(str(exc)[:500])
            yield pd.DataFrame({"path": paths, "error": errs})

    return files_df.select("path", "content").mapInPandas(
        probe, "path string, error string"
    )


def grib2_grid_cells(
    files_df, value_min: float | None = None, on_error: str = "raise"
):
    """S11 decode — binary GRIB2 granules → cell DataFrame with decoded
    lat/lon axes. `value_min` is the in-kernel predicate (numpy mask
    before any Spark row exists), mirroring netcdf_grid_cells;
    `on_error="skip"` drops corrupt granules (pair with
    `grib2_decode_errors`)."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    g = parse_grib2(bytes(content))
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

    return files_df.select("path", "content").mapInPandas(decode, GRIB_CELL_SCHEMA)
