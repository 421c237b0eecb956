"""Snappy raw-format decoder (hand-rolled from Google's public
`format_description.txt` — no snappy library exists in this
container). Snappy is the de-facto codec of the parquet ecosystem
(pyarrow's and Spark's default), so decoding it in pure Python is what
lets the engine open real data pages, not just footers. `encode_snappy`
is the fixture twin (all-literal emission — valid snappy, no
compression); the INDEPENDENT referee for the decode path is
parquet-cpp's real compressor via the committed parquet fixtures
(tests decode pages that pyarrow's snappy wrote and compare values
against DuckDB's read of the same file).

Format: varint uncompressed length, then a tag stream —
  tag & 3 == 0: literal; length = (tag>>2)+1, values 60..63 mean the
                length is in the next 1..4 little-endian bytes (+1)
  tag & 3 == 1: copy, 1-byte offset; len = ((tag>>2) & 7) + 4,
                offset = ((tag>>5) << 8) | next byte
  tag & 3 == 2: copy, 2-byte LE offset; len = (tag>>2) + 1
  tag & 3 == 3: copy, 4-byte LE offset; len = (tag>>2) + 1
Copies may overlap forward (RLE-style). Error contract:
ValueError-only.
"""

from __future__ import annotations


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy varint runs past end")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy length varint too long")


def snappy_decompress(buf: bytes, max_output: int = 1 << 28) -> bytes:
    """Raw snappy block → bytes (bounded by max_output)."""
    n, pos = _uvarint(buf, 0)
    if n > max_output:
        raise ValueError(f"snappy declared length {n} exceeds bound")
    out = bytearray()
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(buf):
                    raise ValueError("snappy literal length bytes past end")
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(buf):
                raise ValueError("snappy literal runs past end")
            out += buf[pos : pos + ln]
            pos += ln
        else:
            if kind == 1:
                ln = ((tag >> 2) & 7) + 4
                if pos >= len(buf):
                    raise ValueError("snappy copy1 offset past end")
                off = ((tag >> 5) << 8) | buf[pos]
                pos += 1
            elif kind == 2:
                ln = (tag >> 2) + 1
                if pos + 2 > len(buf):
                    raise ValueError("snappy copy2 offset past end")
                off = int.from_bytes(buf[pos : pos + 2], "little")
                pos += 2
            else:
                ln = (tag >> 2) + 1
                if pos + 4 > len(buf):
                    raise ValueError("snappy copy4 offset past end")
                off = int.from_bytes(buf[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise ValueError(f"snappy copy offset {off} out of window")
            if len(out) + ln > n:
                raise ValueError("snappy copy overruns declared length")
            # overlapping forward copy: byte-at-a-time when off < ln
            start = len(out) - off
            if off >= ln:
                out += out[start : start + ln]
            else:
                for i in range(ln):
                    out.append(out[start + i])
    if len(out) != n:
        raise ValueError(
            f"snappy declared {n} bytes but produced {len(out)}"
        )
    return bytes(out)


def encode_snappy(data: bytes) -> bytes:
    """Fixture twin: all-literal snappy (valid, uncompressed)."""
    out = bytearray()
    n = len(data)
    u = n
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | 0x80 if u else b)
        if not u:
            break
    pos = 0
    while pos < n:
        chunk = min(n - pos, 1 << 16)
        ln = chunk - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nb = (ln.bit_length() + 7) // 8
            out.append((59 + nb) << 2)
            out += ln.to_bytes(nb, "little")
        out += data[pos : pos + chunk]
        pos += chunk
    return bytes(out)
