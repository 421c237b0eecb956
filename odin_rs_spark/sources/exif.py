"""EXIF metadata extraction + scrubbing for JPEG media (CIPA DC-008 /
the TIFF 6.0 IFD structure inside the JPEG APP1 segment) — the
image-side PII pass of a multimodal corpus pipeline: camera
identifiers and GPS POSITIONS ride inside most phone photos, and a
responsible training-data build AUDITS them (exif_stats) and STRIPS
them (strip_app_segments) before distribution. Orientation (tag
0x0112) also feeds correct decode-time rotation.

Built like the repo's other wire codecs: pure stdlib, spec-driven,
fixture-twinned (`encode_exif_app1` builds real APP1 segments —
both byte orders — that `parse_exif` must walk back exactly).

Scope (errors name anything else): APP1/Exif with IFD0 + Exif IFD +
GPS IFD, value types ASCII/SHORT/LONG/RATIONAL; thumbnails (IFD1)
and MakerNotes are skipped by construction (never parsed — they are
the classic EXIF-parser attack surface).
"""

from __future__ import annotations

import struct

# IFD0 / Exif tags
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
# GPS IFD tags
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _walk_ifd(tiff: bytes, bo: str, off: int) -> dict[int, object]:
    """One IFD at `off` → {tag: decoded value} for the supported
    types (ASCII NUL-stripped str, SHORT/LONG int or tuple,
    RATIONAL tuple of (num, den) pairs)."""
    if off + 2 > len(tiff):
        raise ValueError("EXIF: IFD offset past the segment")
    (n,) = struct.unpack(bo + "H", tiff[off : off + 2])
    if off + 2 + 12 * n > len(tiff):
        raise ValueError("EXIF: IFD runs past the segment")
    out: dict[int, object] = {}
    for e in range(n):
        p = off + 2 + 12 * e
        tag, typ, cnt = struct.unpack(bo + "HHI", tiff[p : p + 8])
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip, do not fail the record
        size = _TYPE_SIZE[typ] * cnt
        # size bound BEFORE any allocation: cnt is a raw 4-byte field,
        # and struct format strings scale with it (a corrupt
        # cnt=2^32 would try to build a multi-GB "H"*cnt string)
        if size > len(tiff):
            raise ValueError("EXIF: entry value larger than the segment")
        if size <= 4:
            data = tiff[p + 8 : p + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", tiff[p + 8 : p + 12])
            if voff + size > len(tiff):
                raise ValueError("EXIF: value offset past the segment")
            data = tiff[voff : voff + size]
        if typ == 2:  # ASCII
            out[tag] = data.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ in (1, 3, 4):
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            vals = struct.unpack(bo + fmt * cnt, data)
            out[tag] = vals[0] if cnt == 1 else vals
        elif typ == 5:  # RATIONAL
            vals = struct.unpack(bo + "II" * cnt, data)
            out[tag] = tuple(
                (vals[2 * i], vals[2 * i + 1]) for i in range(cnt)
            )
    return out


def _iter_segments(jpeg: bytes):
    """(marker, start, end) for each JPEG segment before the scan."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (no SOI)")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = jpeg[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / start of scan: done
            return
        (ln,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        yield marker, pos, pos + 2 + ln
        pos += 2 + ln


def parse_exif(jpeg: bytes) -> dict:
    """JPEG bytes → {make, model, orientation, datetime, lat, lon}
    (missing fields None; lat/lon signed decimal degrees from the GPS
    rationals and N/S/E/W refs). Returns all-None when no APP1/Exif
    segment exists — absence is data, not an error. ValueError-only
    error contract for corrupt segments."""
    try:
        return _parse_exif(jpeg)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt EXIF segment: {exc}") from exc


def _parse_exif(jpeg: bytes) -> dict:
    out = {
        "make": None, "model": None, "orientation": None,
        "datetime": None, "lat": None, "lon": None,
    }
    tiff = None
    for marker, start, end in _iter_segments(jpeg):
        if marker == 0xE1 and jpeg[start + 4 : start + 10] == b"Exif\x00\x00":
            tiff = jpeg[start + 10 : end]
            break
    if tiff is None:
        return out
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("EXIF: bad TIFF byte-order mark")
    (magic,) = struct.unpack(bo + "H", tiff[2:4])
    if magic != 42:
        raise ValueError("EXIF: bad TIFF magic")
    (ifd0_off,) = struct.unpack(bo + "I", tiff[4:8])
    ifd0 = _walk_ifd(tiff, bo, ifd0_off)

    def scalar(v, want):
        # a corrupt entry with count>1 (or a RATIONAL where a SHORT
        # belongs) delivers a tuple where a scalar belongs — the type
        # field is data too (ADVICE r8): take the first element, then
        # gate on the expected Python type so the int/str-typed schema
        # columns downstream (exif_stats mapInPandas) never see a
        # tuple that Arrow cannot convert
        if isinstance(v, tuple):
            v = v[0] if v else None
        return v if isinstance(v, want) else None

    out["make"] = scalar(ifd0.get(TAG_MAKE), str)
    out["model"] = scalar(ifd0.get(TAG_MODEL), str)
    out["orientation"] = scalar(ifd0.get(TAG_ORIENTATION), int)
    out["datetime"] = scalar(ifd0.get(TAG_DATETIME), str)
    gps_off = ifd0.get(TAG_GPS_IFD)
    if isinstance(gps_off, int):
        gps = _walk_ifd(tiff, bo, gps_off)

        def dms(rats, ref, neg) -> float | None:
            # structural guard: a corrupt IFD can deliver SHORT/LONG
            # values where RATIONALs belong (type field is data too)
            if (
                not isinstance(rats, tuple)
                or len(rats) != 3
                or not all(isinstance(r, tuple) and len(r) == 2 for r in rats)
            ):
                return None
            (d, dd), (m, md), (s, sd) = rats
            if 0 in (dd, md, sd):
                return None
            v = d / dd + m / md / 60.0 + s / sd / 3600.0
            return -v if ref in neg else v

        out["lat"] = dms(gps.get(GPS_LAT), gps.get(GPS_LAT_REF), ("S",))
        out["lon"] = dms(gps.get(GPS_LON), gps.get(GPS_LON_REF), ("W",))
    return out


def strip_app_segments(jpeg: bytes, markers: tuple[int, ...] = (0xE1,)) -> bytes:
    """PII scrub: drop the given APPn segments (default APP1 = EXIF,
    incl. the GPS IFD) and pass every other byte through unchanged —
    the pixel data is untouched, so decode(strip(x)) == decode(x)."""
    drops = []
    for marker, start, end in _iter_segments(jpeg):
        if marker in markers:
            drops.append((start, end))
    out = bytearray()
    pos = 0
    for start, end in drops:
        out += jpeg[pos:start]
        pos = end
    out += jpeg[pos:]
    return bytes(out)


def encode_exif_app1(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "<",
) -> bytes:
    """Fixture twin: a real APP1/Exif segment (either byte order)
    holding IFD0 (+ a GPS IFD when `gps` is given, lat/lon as the
    standard degree/minute/second-times-100 rationals)."""
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")

    entries: list[tuple[int, int, int, bytes]] = []  # tag, typ, cnt, payload

    def add_ascii(tag: int, s: str) -> None:
        b = s.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(b), b))

    def add_short(tag: int, v: int) -> None:
        entries.append((tag, 3, 1, struct.pack(bo + "H", v)))

    if make is not None:
        add_ascii(TAG_MAKE, make)
    if model is not None:
        add_ascii(TAG_MODEL, model)
    if orientation is not None:
        add_short(TAG_ORIENTATION, orientation)
    if datetime is not None:
        add_ascii(TAG_DATETIME, datetime)

    def ifd_bytes(ents: list, base: int) -> bytes:
        """One IFD (entry table + overflow area) laid out at absolute
        TIFF offset `base`."""
        n = len(ents)
        data_off = base + 2 + 12 * n + 4
        body = bytearray()
        table = bytearray(struct.pack(bo + "H", n))
        for tag, typ, cnt, payload in sorted(ents):
            rec = struct.pack(bo + "HHI", tag, typ, cnt)
            if len(payload) <= 4:
                rec += payload.ljust(4, b"\x00")
            else:
                rec += struct.pack(bo + "I", data_off + len(body))
                body += payload
            table += rec
        table += struct.pack(bo + "I", 0)  # no next IFD (no thumbnail)
        return bytes(table) + bytes(body)

    gentries: list = []
    if gps is not None:
        lat, lon = gps

        def rats(v: float) -> tuple:
            v = abs(v)
            d = int(v)
            # epsilon guards the exact-minute boundary: (v-d)*60 for
            # v = d + m/60 can land a few ulps BELOW the integer m
            m = int((v - d) * 60 + 1e-9)
            s100 = round(((v - d) * 60 - m) * 60 * 100)
            return (d, 1, m, 1, s100, 100)

        gentries = [
            (GPS_LAT_REF, 2, 2, (b"S" if lat < 0 else b"N") + b"\x00"),
            (GPS_LAT, 5, 3, struct.pack(bo + "II" * 3, *rats(lat))),
            (GPS_LON_REF, 2, 2, (b"W" if lon < 0 else b"E") + b"\x00"),
            (GPS_LON, 5, 3, struct.pack(bo + "II" * 3, *rats(lon))),
        ]
        # GPS-IFD pointer: the GPS IFD lands right after IFD0's bytes;
        # two-pass layout (size first with a placeholder, then patch)
        entries.append((TAG_GPS_IFD, 4, 1, struct.pack(bo + "I", 0)))

    ifd0_off = 8
    ifd0 = ifd_bytes(entries, ifd0_off)
    tiff = bytearray(
        (b"II" if bo == "<" else b"MM")
        + struct.pack(bo + "H", 42)
        + struct.pack(bo + "I", ifd0_off)
        + ifd0
    )
    if gps is not None:
        gps_off = len(tiff)
        for i in range(len(entries)):
            p = ifd0_off + 2 + 12 * i
            (tag,) = struct.unpack(bo + "H", bytes(tiff[p : p + 2]))
            if tag == TAG_GPS_IFD:
                tiff[p + 8 : p + 12] = struct.pack(bo + "I", gps_off)
        tiff += ifd_bytes(gentries, gps_off)
    seg = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (before APP0/JFIF is
    also legal; after keeps the JFIF-first convention)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (no SOI)")
    # after the APP0 segment when present, else right after SOI
    pos = 2
    for marker, start, end in _iter_segments(jpeg):
        if marker == 0xE0:
            pos = end
        break
    return jpeg[:pos] + app1 + jpeg[pos:]


def apply_orientation(a, orientation: int | None):
    """Apply the EXIF orientation (tag 0x0112, values 1-8) to a numpy
    image so pixels are in DISPLAY order — the normalize step a
    vision corpus runs before training (phone photos are routinely
    stored rotated with only the tag carrying the true orientation).
    1=identity, 2=flip-H, 3=rot180, 4=flip-V, 5=transpose,
    6=rot90 CW, 7=transverse, 8=rot270 CW; None/absent = identity."""
    if orientation in (None, 1):
        return a
    if orientation == 2:
        return a[:, ::-1]
    if orientation == 3:
        return a[::-1, ::-1]
    if orientation == 4:
        return a[::-1, :]
    if orientation == 5:
        return a.swapaxes(0, 1)
    if orientation == 6:
        return a.swapaxes(0, 1)[:, ::-1]
    if orientation == 7:
        return a.swapaxes(0, 1)[::-1, ::-1]
    if orientation == 8:
        return a.swapaxes(0, 1)[::-1, :]
    raise ValueError(f"EXIF: orientation {orientation} out of range 1-8")
