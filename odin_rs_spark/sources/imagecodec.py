"""Pure-Python image codec: PNG (8/16-bit gray/RGB/GA/RGBA,
sequential AND Adam7-interlaced) and binary PNM (P5/P6) — the R9 decode path made real (SURVEY §2.10 R9,
§2.12; parity: odin_image/src/lib.rs:149-246 load/stats/resize).

The container has no PIL/cv2, but PNG is zlib (stdlib) + a fully public
chunk/filter spec, and PNM is a trivial header + raw bytes — so like the
NetCDF-3 reader (sources/netcdf3.py) this turns an "env-blocked decode
kernel" into an executable byte path. JPEG decodes too
(sources/jpegcodec — pure-Python T.81, baseline AND progressive SOF2
with 4:2:0 subsampling, dispatched here by SOI magic); video frames
stay behind the documented backend seam
(operators/multimodal._decode_backend), where a real deployment
genuinely swaps in PIL/ffmpeg.

Decoder compliance notes:
- all five PNG scanline filters (None/Sub/Up/Average/Paeth) implemented
  and unit-tested against hand-built scanlines;
- chunk CRCs verified (zlib.crc32);
- bit depths 8 and 16 (16-bit big-endian — the reference's luma16
  DEM/radiance path), color types 0/2/4/6, interlace 0 AND 1 (Adam7,
  r7 — seven independently-filtered pass streams scattered on the
  spec grid); anything else raises with a precise reason.

Spark-side ops live in operators/multimodal.py (`image_pixel_stats`,
`image_dhash`): binary column → mapInPandas decode → stats/perceptual
hash. Everything here is per-row pure Python on executors — no driver
round-trip, no shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter_rows(byte_rows, bpp: int, filter_mode: str) -> bytearray:
    """Spec scanline filtering over a (rows, stride) byte matrix —
    shared by the sequential and each Adam7 pass stream (prev resets
    per pass, as the spec requires)."""
    raw = bytearray()
    n, stride = byte_rows.shape
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(n):
        line = byte_rows[y].reshape(-1)
        ft = (y % 5) if filter_mode == "cycle" else 0
        if ft == 0:
            out = line
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            out = (line.astype(np.int16) - left).astype(np.uint8)
        elif ft == 2:  # Up
            out = (line.astype(np.int16) - prev).astype(np.uint8)
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            out = (
                line.astype(np.int16)
                - ((left.astype(np.int16) + prev.astype(np.int16)) // 2)
            ).astype(np.uint8)
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            out = (line.astype(np.int16) - _paeth(left, prev, ul)).astype(np.uint8)
        raw.append(ft)
        raw.extend(out.tobytes())
        prev = line
    return raw


def encode_png(
    arr: np.ndarray, filter_mode: str = "cycle", interlace: bool = False
) -> bytes:
    """PNG from a (H,W) gray or (H,W,C) C∈{2,3,4} array. uint8 input
    writes depth 8; uint16 input writes depth 16 (big-endian per spec
    — the reference's luma16 DEM/radiance path, odin_image
    to_luma16/create_luma16_image). `filter_mode="cycle"` applies
    scanline filters 0..4 round-robin — spec-valid output that forces
    a decoder through every unfilter path; "none" writes filter 0
    only. Filters operate on BYTES with bpp = channels x bytes-per-
    sample, exactly as the spec defines for 16-bit. `interlace=True`
    writes Adam7: seven pass streams, each independently filtered —
    the fixture twin of the decoder's interlace path."""
    a = np.asarray(arr)
    depth = 16 if a.dtype == np.uint16 else 8
    a = a.astype(np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        h, w, ch, color = a.shape[0], a.shape[1], 1, 0
        a = a[:, :, None]
    else:
        h, w, ch = a.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0)
    bpp = ch * (depth // 8)  # filter step in BYTES

    def rows_of(sub):
        hh = sub.shape[0]
        if depth == 16:
            return sub.astype(">u2").reshape(hh, -1).view(np.uint8)
        return sub.reshape(hh, -1)

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _filter_rows(rows_of(sub), bpp, filter_mode)
    else:
        raw = _filter_rows(rows_of(a), bpp, filter_mode)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H,W) for gray, (H,W,C) otherwise.
    Verifies chunk CRCs; depth 8/16, color 0/2/4/6, interlace 0/1.

    Error contract: every malformed input raises ValueError (zlib /
    struct / index errors are wrapped) — one catchable type per corrupt
    image (see multimodal image ops' on_error="skip")."""
    try:
        return _decode_png(buf)
    except ValueError:
        raise
    except Exception as exc:  # zlib.error, struct.error, IndexError…
        raise ValueError(f"corrupt PNG: {exc}") from exc


def _decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", buf[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16) or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace}); "
            "only 8/16-bit, interlace 0/1 supported"
        )
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    bpp = ch * (depth // 8)  # filter step in BYTES (spec: per byte)

    def to_px(mat, hh, ww):
        if depth == 16:
            return mat.reshape(-1).view(">u2").astype(np.uint16).reshape(hh, ww, ch)
        return mat.reshape(hh, ww, ch)

    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG IDAT size mismatch")
        img = to_px(_unfilter_rows(raw, 0, h, stride, bpp)[0], h, w)
    else:  # Adam7: seven independently-filtered pass streams
        img = np.zeros(
            (h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8
        )
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            hp = (h - y0 + dy - 1) // dy
            wp = (w - x0 + dx - 1) // dx
            if hp <= 0 or wp <= 0:
                continue
            stride = wp * bpp
            mat, off = _unfilter_rows(raw, off, hp, stride, bpp)
            img[y0::dy, x0::dx] = to_px(mat, hp, wp)
        if off != len(raw):
            raise ValueError("PNG IDAT size mismatch (interlaced)")
    return img[:, :, 0] if ch == 1 else img


def _unfilter_rows(raw: bytes, off: int, n: int, stride: int, bpp: int):
    """Undo spec scanline filters for `n` rows of `stride` bytes
    starting at `off` (prev row = zeros — the start-of-image / start-
    of-Adam7-pass rule). Returns ((n, stride) byte matrix, new off)."""
    if off + n * (stride + 1) > len(raw):
        raise ValueError("PNG IDAT size mismatch")
    out = np.empty((n, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(n):
        ft = raw[off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).copy()
        off += stride + 1
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub — sequential in pixel steps
            cur = line
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ft == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            cur = line
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out, off


def encode_pnm(arr: np.ndarray) -> bytes:
    """Binary PNM: P5 for (H,W) gray, P6 for (H,W,3) RGB, maxval 255."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        head = f"P5\n{a.shape[1]} {a.shape[0]}\n255\n"
    elif a.ndim == 3 and a.shape[2] == 3:
        head = f"P6\n{a.shape[1]} {a.shape[0]}\n255\n"
    else:
        raise ValueError("PNM supports (H,W) gray or (H,W,3) RGB")
    return head.encode("ascii") + a.tobytes()


def decode_pnm(buf: bytes) -> np.ndarray:
    """Binary P5/P6 (with comment and whitespace handling per spec).
    Error contract: malformed input raises ValueError only."""
    try:
        return _decode_pnm(buf)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt PNM: {exc}") from exc


def _decode_pnm(buf: bytes) -> np.ndarray:
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM (P5/P6)")
    rgb = buf[:2] == b"P6"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    ch = 3 if rgb else 1
    data = np.frombuffer(buf, dtype=np.uint8, count=h * w * ch, offset=pos)
    img = data.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-sniffing dispatch — the `_decode_backend` entry point."""
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:2] in (b"P5", b"P6"):
        return decode_pnm(buf)
    if buf[:2] == b"\xff\xd8":
        from odin_rs_spark.sources.jpegcodec import decode_jpeg

        return decode_jpeg(buf)
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        from odin_rs_spark.sources.gifcodec import decode_gif

        return decode_gif(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(buf)
    raise ValueError(
        "unrecognized image format (PNG, PNM, baseline JPEG, GIF, BMP "
        "and baseline TIFF supported)"
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample with floor index mapping
    (src = (dst * src_len) // dst_len) — integer-exact, so an external
    engine replays it verbatim (the q124 oracle does)."""
    h, w = img.shape[:2]
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    return img[np.ix_(ys, xs)]  # trailing channel dims broadcast


def luma(img: np.ndarray) -> np.ndarray:
    """Gray plane: pass-through for 2-D and gray+alpha (channel 0),
    integer BT.601-ish average ((r+2g+b)//4 — exact, oracle-replayable)
    for RGB/RGBA (alpha ignored)."""
    if img.ndim == 2:
        return img
    if img.shape[2] < 3:  # gray or gray+alpha
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    return ((r + 2 * g + b) // 4).astype(np.uint8)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): gray → 9x8 nearest-neighbor
    resample → bit(j,i) = p[j,i] > p[j,i+1], packed row-major LSB-first.
    Integer-exact end to end."""
    g = resize_nearest(luma(img), 9, 8).astype(np.int16)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64).reshape(-1)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def resize_catmullrom(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Separable Catmull-Rom (cubic, a = -1/2) resample — the filter
    the reference uses for every image fit (FilterType::CatmullRom,
    odin_onnx/src/lib.rs:59-95, odin_image fractal_dim). Center-aligned
    sampling (src = (dst + 0.5)·scale − 0.5), kernel support widened by
    the scale factor when MINIFYING (anti-aliasing, the standard
    resampling construction), edge clamp, per-tap weight normalization,
    round-half-up back to the input dtype range."""
    if out_w < 1 or out_h < 1:
        raise ValueError("output dimensions must be positive")

    def kernel(t: np.ndarray) -> np.ndarray:
        t = np.abs(t)
        return np.where(
            t < 1.0,
            1.5 * t**3 - 2.5 * t**2 + 1.0,
            np.where(t < 2.0, -0.5 * t**3 + 2.5 * t**2 - 4.0 * t + 2.0, 0.0),
        )

    def axis_resize(a: np.ndarray, out_len: int, axis: int) -> np.ndarray:
        src_len = a.shape[axis]
        scale = src_len / out_len
        fscale = max(scale, 1.0)
        support = 2.0 * fscale
        moved = np.moveaxis(a, axis, 0)
        out = np.empty((out_len,) + moved.shape[1:], dtype=np.float64)
        for i in range(out_len):
            center = (i + 0.5) * scale - 0.5
            lo = int(np.floor(center - support)) + 1
            hi = int(np.floor(center + support))
            taps = np.arange(lo, hi + 1)
            w = kernel((center - taps) / fscale)
            s = w.sum()
            if s <= 0:
                raise ValueError("degenerate resample window")
            w = w / s
            idx = np.clip(taps, 0, src_len - 1)
            out[i] = np.tensordot(w, moved[idx], axes=(0, 0))
        return np.moveaxis(out, 0, axis)

    x = img.astype(np.float64)
    x = axis_resize(x, out_h, 0)
    x = axis_resize(x, out_w, 1)
    hi = 65535 if img.dtype == np.uint16 else 255
    return np.clip(np.floor(x + 0.5), 0, hi).astype(img.dtype)


def encode_bmp(arr: np.ndarray) -> bytes:
    """BMP (BITMAPINFOHEADER, compression 0) from (H,W) gray — written
    as 8-bit palette with the identity gray palette — or (H,W,3) RGB
    — written as 24-bit BGR. Bottom-up rows, 4-byte row padding, per
    the spec; the fixture twin of `decode_bmp`."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        bpp = 8
        palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
        rows = a
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        bpp = 24
        palette = b""
        rows = a[:, :, ::-1].reshape(h, -1)  # RGB → BGR
    else:
        raise ValueError("BMP writer supports (H,W) gray or (H,W,3) RGB")
    stride = (w * (bpp // 8) + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        line = rows[y].tobytes()
        body += line + b"\x00" * (stride - len(line))
    offset = 14 + 40 + len(palette)
    header = (
        b"BM"
        + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h, 1, bpp, 0, len(body), 2835, 2835,
            256 if bpp == 8 else 0, 0,
        )
    )
    return header + palette + body


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed BMP → (H,W) gray (8-bit gray palette) or (H,W,3)
    RGB. Supports BITMAPINFOHEADER(+), bpp 8 (palette) and 24,
    compression 0, bottom-up and top-down rows. ValueError-only
    error contract like the other codecs."""
    try:
        return _decode_bmp(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt BMP: {exc}") from exc


def _decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    (offset,) = struct.unpack("<I", buf[10:14])
    (hsize,) = struct.unpack("<I", buf[14:18])
    if hsize < 40:
        raise ValueError(f"unsupported BMP header size {hsize}")
    w, h, planes, bpp, comp = struct.unpack("<iiHHI", buf[18:34])
    if comp != 0 or bpp not in (8, 24) or planes != 1:
        raise ValueError(
            f"unsupported BMP (bpp={bpp} compression={comp}); "
            "only uncompressed 8/24-bit supported"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    stride = (w * (bpp // 8) + 3) & ~3
    if offset + stride * h > len(buf):
        raise ValueError("BMP pixel data runs past the file")
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        return np.ascontiguousarray(px)
    # 8-bit palette: entries are BGRA quads between the header and data
    pal_n = (offset - 14 - hsize) // 4
    if pal_n <= 0:
        raise ValueError("8-bit BMP without a palette")
    pal = np.frombuffer(
        buf, dtype=np.uint8, count=pal_n * 4, offset=14 + hsize
    ).reshape(pal_n, 4)
    idx = rows[:, :w]
    if int(idx.max(initial=0)) >= pal_n:
        raise ValueError("BMP palette index out of range")
    bgr = pal[idx][:, :, :3]
    rgb = bgr[:, :, ::-1]
    if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (
        rgb[:, :, 1] == rgb[:, :, 2]
    ).all():
        return np.ascontiguousarray(rgb[:, :, 0])  # gray palette → (H,W)
    return np.ascontiguousarray(rgb)


# -- TIFF (baseline TIFF 6.0 subset) ------------------------------------------
#
# The scanned-document format: fax archives, legal/medical corpora and
# book scans ship baseline TIFF, not PNG. Subset per the public TIFF
# 6.0 specification: both byte orders (II/MM), single IFD, strip
# layout (RowsPerStrip < height ⇒ multiple strips), Compression 1
# (none) and 32773 (PackBits), PhotometricInterpretation 0
# (WhiteIsZero — inverted back at decode), 1 (BlackIsZero) and 2
# (RGB), 8 bits per sample, chunky planar config. Tiled TIFFs, LZW/
# CCITT/JPEG compressions and higher bit depths raise a named
# ValueError (the geotiff.py module handles the 16/32-bit DEM side).

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): n in 0..127 → copy n+1 literal
    bytes; n in -127..-1 → repeat next byte 1-n times; -128 → no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("PackBits run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Run-favoring PackBits encoder (the fixture twin): runs of ≥3
    identical bytes become repeat packets, everything else literal."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch: up to the next ≥3-run or 128 bytes
        j = i
        while j < n and j - i < 128:
            run = 1
            while j + run < n and data[j + run] == data[j] and run < 128:
                run += 1
            if run >= 3:
                break
            j += run
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def decode_tiff(buf: bytes) -> np.ndarray:
    """Baseline TIFF → (H,W) gray or (H,W,3) RGB uint8. ValueError-only
    error contract like the other codecs."""
    try:
        return _decode_tiff(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt TIFF: {exc}") from exc


def _decode_tiff(buf: bytes) -> np.ndarray:
    if buf[:4] == b"II*\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        tag, typ, count = struct.unpack(bo + "HHI", buf[off:off + 8])
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue  # RATIONAL/ASCII metadata tags — not needed here
        total = size * count
        # allocation bound: a tag's value block cannot exceed the file
        # (a corrupt count of ~2^32 would otherwise build a multi-GB
        # struct format string — the EXIF allocation-bound lesson)
        if total > len(buf):
            raise ValueError(f"TIFF tag {tag} count {count} runs past the file")
        if total <= 4:
            raw = buf[off + 8:off + 8 + total]
        else:
            (voff,) = struct.unpack(bo + "I", buf[off + 8:off + 12])
            raw = buf[voff:voff + total]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(bo + fmt * count, raw))

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w, h = one(256), one(257)
    if w <= 0 or h <= 0 or w * h > len(buf) * 256:
        # no supported layout packs a pixel into less than 1/256 byte
        raise ValueError(f"TIFF dimensions {w}x{h} implausible for file size")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    rps = one(278, h)
    planar = one(284, 1)
    if any(b != 8 for b in bits) or planar != 1:
        raise ValueError(
            f"unsupported TIFF (bits={bits} planar={planar}); "
            "8-bit chunky only"
        )
    if comp not in (1, 32773):
        raise ValueError(
            f"TIFF compression {comp} unsupported "
            "(uncompressed and PackBits only)"
        )
    if photo not in (0, 1, 2) or (photo == 2) != (spp == 3):
        raise ValueError(
            f"unsupported TIFF photometric={photo} samples={spp}"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or mismatched")
    raw = bytearray()
    rows_done = 0
    for k, (so, sc) in enumerate(zip(offsets, counts)):
        strip_rows = min(rps, h - rows_done)
        expected = strip_rows * w * spp
        chunk = bytes(buf[so:so + sc])
        if len(chunk) != sc:
            raise ValueError("TIFF strip runs past the file")
        if comp == 32773:
            chunk = packbits_decode(chunk, expected)
        elif len(chunk) < expected:
            raise ValueError(f"TIFF strip {k} short: {len(chunk)}")
        raw += chunk[:expected]
        rows_done += strip_rows
    if rows_done < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    px = np.frombuffer(bytes(raw), dtype=np.uint8)
    if spp == 3:
        return np.ascontiguousarray(px.reshape(h, w, 3))
    img = px.reshape(h, w)
    if photo == 0:  # WhiteIsZero: 0 is white — invert to BlackIsZero
        img = 255 - img
    return np.ascontiguousarray(img)


def encode_tiff(
    img: np.ndarray,
    packbits: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    white_is_zero: bool = False,
) -> bytes:
    """Fixture twin for `decode_tiff`: gray (H,W) or RGB (H,W,3) uint8
    → baseline TIFF. Every decoder seam is parameterized — byte
    order, PackBits, multi-strip layout, WhiteIsZero inversion."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_tiff takes (H,W) gray or (H,W,3) RGB")
    if white_is_zero and not gray:
        raise ValueError("WhiteIsZero applies to gray images only")
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    rps = rows_per_strip or h
    bo = ">" if big_endian else "<"
    plane = (255 - img) if white_is_zero else img
    strips = []
    for y0 in range(0, h, rps):
        data = plane[y0:y0 + rps].tobytes()
        strips.append(packbits_encode(data) if packbits else data)

    entries: list[tuple[int, int, list[int]]] = []  # (tag, type, values)
    entries.append((256, 4, [w]))
    entries.append((257, 4, [h]))
    entries.append((258, 3, [8] * spp))
    entries.append((259, 3, [32773 if packbits else 1]))
    entries.append((262, 3, [0 if white_is_zero else (2 if spp == 3 else 1)]))
    entries.append((273, 4, [0] * len(strips)))  # patched below
    entries.append((277, 3, [spp]))
    entries.append((278, 4, [rps]))
    entries.append((279, 4, [len(s) for s in strips]))
    entries.append((284, 3, [1]))
    entries.sort()

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    ifd_size = 2 + len(entries) * 12 + 4
    # overflow area for values wider than 4 bytes
    overflow_at = 8 + ifd_size
    overflow = bytearray()
    strip_at = None

    def value_bytes(typ: int, vals: list[int]) -> bytes:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return struct.pack(bo + fmt * len(vals), *vals)

    # two passes: first compute where strips land, then emit
    fixed: list[bytes] = []
    for tag, typ, vals in entries:
        vb = value_bytes(typ, vals)
        if len(vb) > 4:
            overflow += vb
    strip_at = overflow_at + len(overflow)
    offs = []
    at = strip_at
    for s in strips:
        offs.append(at)
        at += len(s)
    overflow = bytearray()
    for tag, typ, vals in entries:
        if tag == 273:
            vals = offs
        vb = value_bytes(typ, vals)
        if len(vb) <= 4:
            fixed.append(
                struct.pack(bo + "HHI", tag, typ, len(vals))
                + vb.ljust(4, b"\x00")
            )
        else:
            fixed.append(
                struct.pack(
                    bo + "HHII", tag, typ, len(vals),
                    overflow_at + len(overflow),
                )
            )
            overflow += vb
    ifd = (
        struct.pack(bo + "H", len(entries))
        + b"".join(fixed)
        + struct.pack(bo + "I", 0)
    )
    return header + ifd + bytes(overflow) + b"".join(strips)
