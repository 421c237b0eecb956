"""Pure-Python GRIB2 reader/writer for simple AND complex packing
(SURVEY §2.1 S11; parity: the reference's HRRR forecast reader decodes
GRIB2 fields via external tooling, odin_hrrr/src/lib.rs:262-307).

GRIB2 (WMO FM 92) is a public sectioned binary format. This module
implements the subset that covers regular forecast products:

- Section 0/1/8 framing, single-message files;
- Section 3 grid template **3.0** (regular lat/lon): Ni×Nj axes with
  microdegree first-point/increments (sign-magnitude negatives per
  spec);
- Section 5 data template **5.0** (simple packing): value = (R + X·2^E)
  · 10^-D with X an `nbits`-wide big-endian integer stream;
- Section 5 data templates **5.2 / 5.3** (complex packing, optionally
  with first/second-order spatial differencing) — what production HRRR
  granules actually carry: octet-aligned extra descriptors (ival1
  [, ival2], gmin in sign-magnitude), general group splitting (group
  references / widths / scaled lengths, each field zero-padded to an
  octet boundary), per-group bit-packed deviations, then the inverse
  difference recurrence restated as cumulative sums (vectorized);
- Section 6 bitmap indicator 255 (no bitmap) or 0 (embedded bitmap:
  missing points carry no packed value).

- Section 5 data template **5.40** (JPEG 2000 packing, lossless AND
  lossy): section 7 carries a raw J2K codestream of the scaled
  integer field, decoded by the pure-Python EBCOT codec in
  `sources/j2kcodec.py` — 5/3 reversible (compression type 0, the
  r10 seam) or 9/7 irreversible with scalar quantization
  (compression type 1, flipped r11 — the profile real HRRR/MRMS
  granules also ship).

Missing-value management within complex packing (DRT
octet 23 ≠ 0) is rejected explicitly: the granules this engine targets
signal missing data via the section-6 bitmap. The byte-range FETCH side
of S11 (the reference's .idx scheme) stays scoped out per SURVEY §7.3;
this closes the DECODE side.

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


def _sm_bytes(b: bytes) -> int:
    """Arbitrary-width sign-magnitude big-endian int (the GRIB2 'extra
    descriptor' encoding: first bit = sign, rest = magnitude)."""
    v = int.from_bytes(b, "big")
    sign_bit = 1 << (len(b) * 8 - 1)
    return -(v & (sign_bit - 1)) if v & sign_bit else v


def _sm_bytes_enc(v: int, octets: int) -> bytes:
    sign_bit = 1 << (octets * 8 - 1)
    mag = -v if v < 0 else v
    if mag >= sign_bit:
        raise ValueError(f"{v} does not fit sign-magnitude in {octets} octets")
    return ((sign_bit | mag) if v < 0 else mag).to_bytes(octets, "big")


def _take_uints(bits: np.ndarray, pos: int, n: int, width: int):
    """Read `n` consecutive big-endian unsigned ints of `width` bits
    from the unpacked bit array starting at `pos`; returns (values,
    new_pos). Bounds-checked: corrupt counts raise instead of reshaping
    garbage (the unbounded-loop/fuzzer class)."""
    if width == 0:
        return np.zeros(n, dtype=np.int64), pos
    if width > 32:
        raise ValueError(f"bit width {width} > 32 unsupported")
    end = pos + n * width
    if end > len(bits):
        raise ValueError("packed field runs past the data section")
    seg = bits[pos:end].reshape(n, width)
    vals = (seg.astype(np.int64) * (1 << np.arange(width - 1, -1, -1))).sum(axis=1)
    return vals, end


def _pad8(pos: int) -> int:
    return (pos + 7) // 8 * 8


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


def parse_grib2_messages(buf: bytes) -> list[dict]:
    """Multi-message GRIB2 file → one parsed dict per message. Real
    granules (HRRR/GFS wgrib2 output) CONCATENATE hundreds of messages
    back-to-back — each its own GRIB...7777 envelope with independent
    grid/packing sections (the reference's .idx scheme byte-range
    fetches exactly one such envelope per field,
    odin_hrrr/src/lib.rs:262-307; this is the whole-file decode path).
    Strict framing: every message must start with the magic, declare a
    length that fits the buffer, and end with '7777' — a corrupt
    envelope names its byte offset."""
    msgs: list[dict] = []
    pos = 0
    while pos < len(buf):
        if buf[pos : pos + 4] != b"GRIB":
            raise ValueError(
                f"expected GRIB magic at byte {pos} (message {len(msgs)})"
            )
        if pos + 16 > len(buf):
            raise ValueError(f"truncated GRIB2 header at byte {pos}")
        (total_len,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
        if total_len < 20 or pos + total_len > len(buf):
            raise ValueError(
                f"message {len(msgs)} length {total_len} runs past the file"
            )
        if buf[pos + total_len - 4 : pos + total_len] != b"7777":
            raise ValueError(f"message {len(msgs)} missing 7777 terminator")
        msgs.append(parse_grib2(buf[pos : pos + total_len]))
        pos += total_len
    if not msgs:
        raise ValueError("empty GRIB2 file")
    return msgs


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
            if tmpl not in (0, 2, 3, 40):
                raise ValueError(
                    f"data template 5.{tmpl} unsupported (5.0/5.2/5.3/5.40 only)"
                )
            (r_ref,) = struct.unpack(">f", body[11:15])
            (e_raw, d_raw) = struct.unpack(">HH", body[15:19])
            pack = {
                "tmpl": tmpl,
                "R": float(r_ref),
                "E": _sm16(e_raw),
                "D": _sm16(d_raw),
                "nbits": body[19],
            }
            if tmpl == 40:
                # DRT 5.40 octets 22-23: compression type (0 =
                # lossless 5/3, 1 = lossy 9/7 — both decode through
                # sources/j2kcodec; the codestream's own COD/QCD
                # markers carry the wavelet + quantization choice)
                ctype = body[21]
                if ctype not in (0, 1):
                    raise ValueError(
                        f"JPEG 2000 compression type {ctype} unsupported"
                    )
            if tmpl in (2, 3):
                # DRT 5.2 octets 22-47 (general group splitting); 5.3
                # appends octets 48-49 (differencing order, descriptor
                # octet count)
                if body[21] != 1:
                    raise ValueError(
                        f"group splitting method {body[21]} unsupported "
                        "(general group splitting only)"
                    )
                mvm = body[22]
                if mvm not in (0, 1):
                    raise ValueError(
                        f"missing value management {mvm} unsupported "
                        "(0 = none, 1 = primary only)"
                    )
                # octets 24-27: primary missing substitute, typed by the
                # original-field-type octet 21 (0 = IEEE float)
                if mvm:
                    mv1 = (
                        float(struct.unpack(">f", body[23:27])[0])
                        if body[20] == 0
                        else int(struct.unpack(">I", body[23:27])[0])
                    )
                else:
                    mv1 = None
                pack.update(
                    mvm=mvm,
                    mv1=mv1,
                    ng=struct.unpack(">I", body[31:35])[0],
                    wref=body[35],
                    wbits=body[36],
                    lref=struct.unpack(">I", body[37:41])[0],
                    linc=body[41],
                    last_len=struct.unpack(">I", body[42:46])[0],
                    lbits=body[46],
                )
                if tmpl == 3:
                    order, ods = body[47], body[48]
                    if order not in (1, 2):
                        raise ValueError(
                            f"spatial differencing order {order} unsupported"
                        )
                    if ods == 0 or ods > 8:
                        raise ValueError(f"bad descriptor octet count {ods}")
                    pack.update(order=order, ods=ods)
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
    emb_miss = None
    if pack["tmpl"] == 0:
        bits = np.unpackbits(np.frombuffer(values, dtype=np.uint8))
        nb = pack["nbits"]
        if nb == 0:
            x = np.zeros(n_packed, dtype=np.int64)
        else:
            bits = bits[: n_packed * nb].reshape(n_packed, nb)
            x = (bits.astype(np.int64) * (1 << np.arange(nb - 1, -1, -1))).sum(
                axis=1
            )
    elif pack["tmpl"] == 40:
        # DRT 5.40: section 7 is a raw J2K codestream of the scaled
        # integer field (pure-Python Tier-1/Tier-2 decode,
        # sources/j2kcodec — the last reference-domain seam, flipped)
        from odin_rs_spark.sources.j2kcodec import decode_j2k

        img = decode_j2k(bytes(values))
        if img.size != n_packed:
            raise ValueError(
                f"JPEG 2000 field has {img.size} samples, expected {n_packed}"
            )
        x = img.reshape(-1).astype(np.int64)
    else:
        x, emb_miss = _unpack_complex(values, pack, n_packed)
    vals = (pack["R"] + x * (2.0 ** pack["E"])) * (10.0 ** -pack["D"])
    if emb_miss is not None:
        # embedded (in-packing) primary missing values: NaN in the
        # decoded grid, same contract as bitmap-excluded cells; the
        # encoder's substitute value rides out in "missing_value"
        vals = vals.copy()
        vals[emb_miss] = np.nan
    miss_flat = np.zeros(n, dtype=bool)
    if bitmap is not None:
        full = np.full(n, np.nan)
        full[bitmap[:n]] = vals
        vals = full
        miss_flat = ~bitmap[:n]
        if emb_miss is not None:
            idx = np.nonzero(bitmap[:n])[0]
            miss_flat[idx[emb_miss]] = True
    elif emb_miss is not None:
        miss_flat = emb_miss
    out = vals.reshape(grid["nj"], grid["ni"])
    has_missing = bitmap is not None or emb_miss is not None
    return {
        **grid,
        "param": (discipline, category, number),
        "values": out,
        "missing": miss_flat.reshape(grid["nj"], grid["ni"]) if has_missing else None,
        "missing_value": pack.get("mv1"),
    }


def _unpack_complex(
    data: bytes, pack: dict, n_packed: int
) -> tuple[np.ndarray, np.ndarray | None]:
    """Data templates 7.2/7.3: general group splitting, optional
    spatial differencing, optional PRIMARY missing-value management
    (octet 23 = 1). Returns (X, miss): the reconstructed integer field
    of length n_packed (Y = (R + X·2^E)·10^-D applied by the caller)
    and a boolean missing mask (None when management is off).

    Missing encoding (spec 7.2 note 6 / how wgrib2 packs it): with
    management on, a group of width w > 0 marks a missing point with
    the all-ones code 2^w − 1 (real deviations stay ≤ 2^w − 2), and an
    ALL-missing group is a width-0 group whose reference is the
    all-ones 2^nbits − 1. With spatial differencing the difference
    sequence runs over the PRESENT values only — the inverse cumsums
    reconstruct the compacted present subsequence, which then scatters
    back to its grid positions.

    Vectorization: groups are unpacked per DISTINCT bit width (≤ 32
    classes), each class as one fancy-indexed reshape over the global
    bit array — no per-group Python loop, so a real granule with tens
    of thousands of groups costs a handful of numpy passes. The inverse
    spatial-difference recurrence is restated as cumulative sums
    (order 1: one cumsum; order 2: two), not a scalar loop."""
    pos = 0
    order = pack.get("order", 0)
    if order:
        ods = pack["ods"]
        need = (order + 1) * ods
        if len(data) < need:
            raise ValueError("truncated spatial-differencing descriptors")
        ivals = [
            _sm_bytes(data[i * ods : (i + 1) * ods]) for i in range(order)
        ]
        gmin = _sm_bytes(data[order * ods : need])
        pos = need * 8

    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    ng = pack["ng"]
    mvm = pack.get("mvm", 0)
    if ng == 0:
        if n_packed:
            raise ValueError("zero groups but nonzero data points")
        return np.zeros(0, dtype=np.int64), None
    # ng is a raw 4-byte field: bound it BEFORE the first O(ng)
    # allocation (a ~100-byte corrupt file with ng=2^31 and zero-width
    # descriptors would otherwise demand multi-GB zeros() arrays).
    # Groups partition the n_packed points (every group holds >= 1
    # point under general group splitting), and the three descriptor
    # fields must fit in the section-7 payload.
    if ng > n_packed:
        raise ValueError(f"{ng} groups exceed {n_packed} data points")
    desc_bits = ng * (pack["nbits"] + pack["wbits"] + pack["lbits"])
    if pos + desc_bits > len(bits):
        raise ValueError("group descriptors run past the data section")
    # each of the three group-descriptor fields is zero-padded to an
    # octet boundary (spec 7.2 notes 1-3)
    refs, pos = _take_uints(bits, pos, ng, pack["nbits"])
    pos = _pad8(pos)
    widths, pos = _take_uints(bits, pos, ng, pack["wbits"])
    pos = _pad8(pos)
    lens_scaled, pos = _take_uints(bits, pos, ng, pack["lbits"])
    pos = _pad8(pos)
    widths = widths + pack["wref"]
    if widths.max() > 32:
        raise ValueError(f"group width {int(widths.max())} > 32 unsupported")
    lengths = lens_scaled * pack["linc"] + pack["lref"]
    lengths[-1] = pack["last_len"]
    total = int(lengths.sum())
    if total != n_packed:
        raise ValueError(
            f"group lengths sum to {total}, expected {n_packed} data points"
        )

    # deviations, grouped by distinct width (one vector pass per class)
    starts = pos + np.concatenate(([0], np.cumsum(lengths * widths)[:-1]))
    end = int(pos + (lengths * widths).sum())
    if end > len(bits):
        raise ValueError("packed group data runs past the data section")
    elem_group = np.repeat(np.arange(ng), lengths)
    elem_idx = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(lengths)[:-1])), lengths
    )
    x = np.repeat(refs, lengths)  # width-0 groups: all elements = ref
    miss = np.zeros(total, dtype=bool) if mvm else None
    if mvm and pack["nbits"] > 0:
        # all-missing groups: width 0, reference all-ones
        allones = (1 << pack["nbits"]) - 1
        miss |= ((widths == 0) & (refs == allones))[elem_group]
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = widths[elem_group] == w
        bit0 = starts[elem_group[sel]] + elem_idx[sel] * w
        seg = bits[bit0[:, None] + np.arange(w)]
        dev = (seg.astype(np.int64) * (1 << np.arange(w - 1, -1, -1))).sum(axis=1)
        if mvm:
            miss[sel] |= dev == (1 << int(w)) - 1
        x[sel] += dev

    def _inverse_diff(xs: np.ndarray) -> np.ndarray:
        # 7.3: xs holds (spatial differences − gmin) for k ≥ order; the
        # first `order` original values arrive via the descriptors
        m = len(xs)
        if m <= order:
            return np.array(ivals[:m], dtype=np.int64)
        if order == 1:
            out = np.empty(m, dtype=np.int64)
            out[0] = ivals[0]
            out[1:] = ivals[0] + np.cumsum(xs[1:] + gmin)
            return out
        sd = xs[2:] + gmin  # second differences, k ≥ 2
        d1 = (ivals[1] - ivals[0]) + np.concatenate(
            ([0], np.cumsum(sd))
        )  # first differences d1[k] = f[k+1] − f[k]
        out = np.empty(m, dtype=np.int64)
        out[0] = ivals[0]
        out[1:] = ivals[0] + np.cumsum(d1)
        return out

    if miss is not None and miss.any():
        # differencing (when on) ran over the PRESENT subsequence only
        present = ~miss
        recon = _inverse_diff(x[present]) if order else x[present]
        x = np.zeros(total, dtype=np.int64)
        x[present] = recon
        return x, miss
    if order:
        x = _inverse_diff(x)
    return x, miss


def _sections_0134(
    ni: int,
    nj: int,
    lat0: float,
    lon0: float,
    dlat: float,
    dlon: float,
    discipline: int,
    category: int,
    number: int,
) -> tuple[bytes, bytes, bytes, bytes]:
    """Shared writer framing: sections 0 (sans total length), 1, 3
    (grid template 3.0) and 4 (product template 4.0)."""
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
    return sec0, sec1, sec3, sec4


def _pack_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """Big-endian bit explosion: (n,) ints → (n·width,) uint8 bits."""
    if width == 0:
        return np.zeros(0, dtype=np.uint8)
    return (
        ((vals[:, None] >> np.arange(width - 1, -1, -1)) & 1)
        .astype(np.uint8)
        .reshape(-1)
    )


def write_grib2_complex(
    path: str,
    values: np.ndarray,
    lat0: float,
    lon0: float,
    dlat: float,
    dlon: float,
    e_scale: int = 0,
    d_scale: int = 0,
    r_ref: float = 0.0,
    order: int = 2,
    group_len: int = 8,
    discipline: int = 0,
    category: int = 2,
    number: int = 2,
) -> None:
    """GRIB2 writer for complex packing (template 5.2 when order=0,
    5.3 with first/second-order spatial differencing otherwise) — the
    encode twin of `_unpack_complex` and the q129 fixture generator.
    Fixed-size general group splitting: every group is `group_len`
    points (last group shorter), per-group reference = group min,
    per-group width = bits of the max deviation; group lengths ride the
    reference/last-length fields with zero scaled-length bits.

    NaN cells encode as PRIMARY missing values (octet 23 = 1): the
    difference sequence runs over present values only, a missing point
    carries the all-ones code of its group's width (real deviations are
    kept ≤ 2^w − 2), and an all-missing group is width 0 with the
    all-ones reference — the exact layout `_unpack_complex` reverses."""
    if order not in (0, 1, 2):
        raise ValueError(f"order must be 0, 1 or 2, got {order}")
    nj, ni = values.shape
    flat_vals = values.reshape(-1)
    present = ~np.isnan(flat_vals)
    mvm = 0 if present.all() else 1
    n = flat_vals.size
    x = (flat_vals[present] * (10.0 ** d_scale) - r_ref) * (2.0 ** -e_scale)
    pv = np.round(x).astype(np.int64)
    if not np.allclose(x, pv, rtol=0, atol=1e-9):
        raise ValueError("values not representable under the given scales")
    if pv.size <= order:
        raise ValueError("too few present points for the differencing order")

    extra = b""
    if order == 1:
        sd = pv[1:] - pv[:-1]
        gmin = int(sd.min())
        fieldp = np.concatenate(([0], sd - gmin))
        ivals = [int(pv[0])]
    elif order == 2:
        sd = pv[2:] - 2 * pv[1:-1] + pv[:-2]
        gmin = int(sd.min())
        fieldp = np.concatenate(([0, 0], sd - gmin))
        ivals = [int(pv[0]), int(pv[1])]
    else:
        fieldp = pv
        if fieldp.size and fieldp.min() < 0:
            raise ValueError("template 5.2 packs non-negative integers only")
        gmin, ivals = 0, []
    if order:
        ods = max(
            (abs(v).bit_length() + 8) // 8 for v in ivals + [gmin, 1]
        )  # +1 sign bit, min 1 octet
        extra = b"".join(_sm_bytes_enc(v, ods) for v in ivals)
        extra += _sm_bytes_enc(gmin, ods)

    field = np.zeros(n, dtype=np.int64)
    field[present] = fieldp
    ng = (n + group_len - 1) // group_len
    g_of = np.arange(n) // group_len
    lengths = np.bincount(g_of, minlength=ng)
    refs = np.zeros(ng, dtype=np.int64)
    widths = np.zeros(ng, dtype=np.int64)
    all_missing = np.zeros(ng, dtype=bool)
    for i in range(ng):
        sl = slice(i * group_len, i * group_len + int(lengths[i]))
        p = present[sl]
        if not p.any():
            all_missing[i] = True  # ref patched to all-ones after nbits
            continue
        gfield = field[sl][p]
        refs[i] = int(gfield.min())
        dmax = int((gfield - refs[i]).max())
        w = dmax.bit_length()
        if mvm:
            # reserve the all-ones code in EVERY group (decoder
            # convention); a constant group with a missing member
            # widens from 0 to 1 bit
            while dmax >= (1 << w) - 1:
                w += 1
        widths[i] = w
    nbits = max(int(refs.max()).bit_length(), 1)
    if mvm:
        while int(refs.max()) >= (1 << nbits) - 1:
            nbits += 1  # all-ones reference must stay unambiguous
        refs[all_missing] = (1 << nbits) - 1
    wref = int(widths.min())
    wbits = max(int((widths - wref).max()).bit_length(), 1)

    dev = field - np.where(all_missing, 0, refs)[g_of]
    if mvm:
        # missing slots carry their group's all-ones marker
        marker = (1 << widths)[g_of] - 1
        dev = np.where(present, dev, marker)
    group_devs = [
        _pack_bits(dev[g_of == i], int(widths[i]))
        for i in range(ng)
        if widths[i] > 0
    ]
    stream = np.concatenate(
        [
            _pad_to_octet(_pack_bits(refs, nbits)),
            _pad_to_octet(_pack_bits(widths - wref, wbits)),
            # lbits = 0: lengths come entirely from lref/last_len
            np.concatenate(group_devs)
            if group_devs
            else np.zeros(0, dtype=np.uint8),
        ]
    )
    packed = extra + np.packbits(stream).tobytes()

    sec0, sec1, sec3, sec4 = _sections_0134(
        ni, nj, lat0, lon0, dlat, dlon, discipline, category, number
    )
    tmpl = 3 if order else 2
    subs = (
        struct.pack(">f", 9.999e20) + bytes(4)  # primary substitute
        if mvm
        else bytes(8)
    )
    t5 = (
        struct.pack(">f", r_ref)
        + struct.pack(">HH", _sm16_enc(e_scale), _sm16_enc(d_scale))
        + bytes([nbits, 0])  # bits per group ref, original field type
        + bytes([1, mvm])  # general group splitting, missing mgmt
        + subs  # primary/secondary missing substitutes
        + struct.pack(">I", ng)
        + bytes([wref, wbits])
        + struct.pack(">I", group_len)  # group length reference
        + bytes([1])  # length increment
        + struct.pack(">I", int(lengths[-1]))
        + bytes([0])  # bits for scaled group lengths
    )
    if order:
        t5 += bytes([order, ods])
    sec5 = struct.pack(">IBI", 11 + len(t5), 5, n) + struct.pack(">H", tmpl) + t5
    sec6 = struct.pack(">IBB", 6, 6, 255)
    sec7 = struct.pack(">IB", 5 + len(packed), 7) + packed
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    with open(path, "wb") as f:
        f.write(sec0 + struct.pack(">Q", total) + body + b"7777")


def _pad_to_octet(bits: np.ndarray) -> np.ndarray:
    pad = (-len(bits)) % 8
    return np.concatenate([bits, np.zeros(pad, dtype=np.uint8)]) if pad else bits


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

    sec0, sec1, sec3, sec4 = _sections_0134(
        ni, nj, lat0, lon0, dlat, dlon, discipline, category, number
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


def write_grib2_jpeg2000(
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
    levels: int = 3,
    lossy: bool = False,
    qstep: float = 0.5,
) -> None:
    """GRIB2 writer for JPEG 2000 packing (template 5.40 + 7.40) — the
    fixture twin of the DRT 5.40 read path: the scaled integer field
    goes through the pure-Python J2K encoder
    (sources/j2kcodec.encode_j2k), exactly the payload wgrib2/JasPer
    ship for NOAA HRRR granules. `lossy=True` packs with the 9/7
    irreversible wavelet + scalar quantization (compression type 1 in
    DRT 5.40 octet 22) — the profile real HRRR/MRMS granules also
    use."""
    from odin_rs_spark.sources.j2kcodec import encode_j2k

    nj, ni = values.shape
    x = (values * (10.0 ** d_scale) - r_ref) * (2.0 ** -e_scale)
    xi = np.round(x).astype(np.int64)
    if not np.allclose(x, xi, rtol=0, atol=1e-9):
        raise ValueError("values not representable under the given scales")
    if xi.min() < 0 or xi.max() >= (1 << nbits):
        raise ValueError("packed integers out of nbits range")

    sec0, sec1, sec3, sec4 = _sections_0134(
        ni, nj, lat0, lon0, dlat, dlon, discipline, category, number
    )
    sec5 = (
        struct.pack(">IBI", 23, 5, ni * nj)
        + struct.pack(">H", 40)  # template 5.40
        + struct.pack(">f", r_ref)
        + struct.pack(">HH", _sm16_enc(e_scale), _sm16_enc(d_scale))
        + bytes([nbits, 0])  # depth, original field type 0 (float)
        + (bytes([1, 20]) if lossy else bytes([0, 255]))  # ctype, ratio
    )
    sec6 = struct.pack(">IBB", 6, 6, 255)
    codestream = encode_j2k(
        xi, levels=levels,
        wavelet="9/7" if lossy else "5/3", qstep=qstep,
    )
    sec7 = struct.pack(">IB", 5 + len(codestream), 7) + codestream
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    with open(path, "wb") as f:
        f.write(sec0 + struct.pack(">Q", total) + body + b"7777")


GRIB_CELL_SCHEMA = (
    "path string, msg int, x int, y int, lat double, lon double, value double"
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
                    parse_grib2_messages(bytes(content))
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
    lat/lon axes. Handles MULTI-MESSAGE files (one row-set per message,
    indexed by `msg` — real granules concatenate hundreds of fields).
    `value_min` is the in-kernel predicate (numpy mask before any Spark
    row exists), mirroring netcdf_grid_cells; `on_error="skip"` drops
    corrupt granules (pair with `grib2_decode_errors`)."""
    import pandas as pd

    from odin_rs_spark.deploy import ensure_shipped

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    # the decode closure references module-level parsers (pickled by
    # reference): ship the package so binaryFile-only pipelines work on
    # external-cwd harnesses that never touched load_table
    ensure_shipped(files_df.sparkSession)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    msgs = parse_grib2_messages(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for mi, g in enumerate(msgs):
                    v = g["values"]
                    nj, ni = v.shape
                    yy, xx = np.mgrid[0:nj, 0:ni]
                    keep = ~np.isnan(v)
                    if value_min is not None:
                        keep &= v >= value_min
                    yield pd.DataFrame(
                        {
                            "path": path,
                            "msg": np.int32(mi),
                            "x": xx[keep].astype(np.int32),
                            "y": yy[keep].astype(np.int32),
                            "lat": g["lat0"] + yy[keep] * g["dlat"],
                            "lon": g["lon0"] + xx[keep] * g["dlon"],
                            "value": v[keep],
                        }
                    )

    return files_df.select("path", "content").mapInPandas(decode, GRIB_CELL_SCHEMA)
