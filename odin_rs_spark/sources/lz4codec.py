"""Pure-Python LZ4 BLOCK decoder (the lz4.org block format spec) plus
the Hadoop chunk framing parquet's legacy LZ4 codec wraps around it —
the last common parquet page codec with no decode path (pyarrow's
compression='lz4' writes codec id 5 = the Hadoop framing; modern
writers use LZ4_RAW = the bare block). The encoder twin emits
all-literal blocks (valid LZ4, no match search) so roundtrip and fuzz
tests stay self-hosted; pyarrow's writer is the independent referee
for real compressor output with matches.

Error contract: ValueError-only; `expected` bounds every allocation.
"""

from __future__ import annotations

import struct


def lz4_block_decompress(data: bytes, expected: int) -> bytes:
    """One LZ4 block → bytes (exactly `expected` long)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4 literal length past end")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4 literals past end")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if len(out) > expected:
            raise ValueError("lz4 output exceeds declared size")
        if pos >= n:
            break  # last sequence carries no match
        if pos + 2 > n:
            raise ValueError("lz4 match offset past end")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4 match offset {offset} out of range")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4 match length past end")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if len(out) + match_len > expected:
            raise ValueError("lz4 output exceeds declared size")
        start = len(out) - offset
        for i in range(match_len):  # overlapping copies are the point
            out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(
            f"lz4 block decodes to {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def lz4_block_compress_stored(data: bytes) -> bytes:
    """Fixture twin: ONE all-literal sequence (only the final sequence
    of a block may omit its match, so stored data must not be split)."""
    out = bytearray()
    ln = len(data)
    if ln < 15:
        out.append(ln << 4)
    else:
        out.append(0xF0)
        rest = ln - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data
    return bytes(out)


def lz4_hadoop_decompress(data: bytes, expected: int) -> bytes:
    """Parquet legacy LZ4 (codec id 5): Hadoop chunk framing —
    repeated [BE32 decompressed size][BE32 compressed size][one LZ4
    block] (the one-block-per-chunk form parquet-cpp/arrow write).
    Falls back to a bare block when the framing doesn't parse — the
    ecosystem's documented lz4 ambiguity; arrow's reader does the
    same."""
    try:
        out = bytearray()
        pos = 0
        while pos < len(data):
            if pos + 8 > len(data):
                raise ValueError("lz4 hadoop chunk header past end")
            dsize, csize = struct.unpack_from(">II", data, pos)
            pos += 8
            if pos + csize > len(data) or dsize > expected - len(out):
                raise ValueError("lz4 hadoop chunk sizes out of bounds")
            out += lz4_block_decompress(data[pos : pos + csize], dsize)
            pos += csize
        if len(out) != expected:
            raise ValueError("lz4 hadoop frame size mismatch")
        return bytes(out)
    except ValueError:
        # bare-block writers exist under the same codec id
        return lz4_block_decompress(data, expected)
