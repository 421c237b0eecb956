"""Pure-stdlib GIF codec (GIF87a/89a — CompuServe spec, W3C
GIF89a specification): palette images with LZW-compressed index
streams, optional 4-pass interlace, multi-frame (animation) blocks.
GIF is ubiquitous in web crawls, so a multimodal corpus scan needs at
least index/first-frame decode; built like the repo's other wire
codecs (png/jpeg/wav/avi/warc): spec-driven, fixture-twinned
(`encode_gif` writes what `decode_gif` reads), every malformed
structure a named ValueError.

Scope: 8-bit palette frames, global or local color tables,
interlace 0/1, multiple image blocks (frames), extensions skipped
(GCE transparency/disposal not applied — corpus feature extraction
reads raw frame pixels). LZW is the standard variable-width (3..12
bit) dictionary coder with CLEAR/EOI codes.
"""

from __future__ import annotations

import struct

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Variable-width LZW over palette indices (GIF flavor: emits an
    initial CLEAR, grows code width at dict size 2^w, caps at 12 bits
    and re-CLEARs, ends with EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out_bits = []  # (code, width) pairs

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    out_bits.append((clear, width))
    w = b""
    for idx in indices:
        k = w + bytes([int(idx)])
        if k in table:
            w = k
            continue
        out_bits.append((table[w], width))
        table[k] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                out_bits.append((clear, width))
                table, next_code, width = fresh()
        w = bytes([int(idx)])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((eoi, width))

    # LSB-first bit packing
    acc = n = 0
    data = bytearray()
    for code, wd in out_bits:
        acc |= code << n
        n += wd
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def fresh():
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    acc = n = pos = 0
    prev = None
    while True:
        while n < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended before EOI")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in table:
                raise ValueError(f"LZW first code {code} not in table")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if prev is not None:
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            if next_code >= (1 << width) and width < 12:
                width += 1
        prev = code
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the frame holds")
    if len(out) != n_expected:
        raise ValueError(
            f"LZW produced {len(out)} pixels, frame holds {n_expected}"
        )
    return out


def _deinterlace(rows, height: int):
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    out = [None] * height
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def encode_gif(
    img,
    interlace: bool = False,
    version: bytes = b"GIF89a",
) -> bytes:
    """(H, W) palette-index array + implicit GRAY palette, or
    (H, W, 3) RGB uint8 with ≤256 distinct colors → GIF bytes. The
    fixture twin of `decode_gif`: gray input uses the identity gray
    palette (index i → (i,i,i)); RGB input builds a sorted palette of
    its distinct colors."""
    import numpy as np

    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        idx = a
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        pal_bits = 8
    else:
        h, w, _ = a.shape
        flat = a.reshape(-1, 3)
        colors, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} distinct colors > 256")
        pal_bits = max(1, int(len(colors) - 1).bit_length())
        palette = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        idx = inv.reshape(h, w).astype(np.uint8)
    h, w = idx.shape

    out = bytearray()
    out += version
    packed = 0x80 | ((pal_bits - 1) & 7)  # GCT present, size 2^pal_bits
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += palette.tobytes()

    # image descriptor
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    rows = [idx[r] for r in range(h)]
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        rows = [idx[r] for r in order]
    stream = b"".join(bytes(r.tobytes()) for r in rows)
    mcs = max(2, pal_bits)
    out += bytes([mcs])
    lzw = _lzw_encode(stream, mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_frames(buf: bytes):
    """GIF bytes → list of (H, W, 3) RGB uint8 frames (palette
    applied, interlace resolved, extensions skipped). Raises
    ValueError with the offending structure named."""
    try:
        return _gif_frames(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt GIF file: {exc}") from exc


def _gif_frames(buf: bytes):
    import numpy as np

    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    frames = []
    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected block 0x{b0:02x} at byte {pos - 1}")
        fx, fy, fw, fh, fp = struct.unpack("<HHHHB", buf[pos : pos + 9])
        pos += 9
        ct = gct
        if fp & 0x80:
            n = 2 << (fp & 7)
            ct = np.frombuffer(
                buf[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("frame has no color table")
        mcs = buf[pos]
        pos += 1
        data = bytearray()
        while buf[pos]:
            ln = buf[pos]
            data += buf[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            bytes(_lzw_decode(bytes(data), mcs, fw * fh)), dtype=np.uint8
        ).reshape(fh, fw)
        if fp & 0x40:
            rows = _deinterlace(list(idx), fh)
            idx = np.stack(rows)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("palette index out of range")
        frames.append(ct[idx])
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames


def decode_gif(buf: bytes):
    """First frame as (H, W, 3) RGB uint8 (the corpus feature-extract
    contract — `gif_frames` returns the full animation)."""
    return gif_frames(buf)[0]
