"""MessagePack stream reader (hand-rolled from the public msgpack
spec — no msgpack library in this container; `encode_msgpack` is the
fixture twin, the avro/tar discipline). Why it matters: Fluentd's
forward protocol and Redis dumps — the log/event side-channels a
crawl fleet actually emits — ship as CONCATENATED msgpack objects, so
a corpus engine needs to scan them like it scans .avro.

Scope (documented): nil, bool, all int forms (positive/negative
fixint, uint8-64, int8-64), float32/64, str (fixstr/str8/16/32),
bin8/16/32, arrays and maps (fix + 16/32) with string keys on the
map-decode path. Extension types (fixext/ext) are rejected BY NAME —
timestamps-as-ext96 are the one real-world loss, counted by skip-mode
pipelines. Error contract: ValueError-only.
"""

from __future__ import annotations

import struct


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise ValueError("msgpack value runs past end of buffer")


def decode_one(buf: bytes, pos: int) -> tuple[object, int]:
    """One msgpack object starting at pos → (value, new_pos)."""
    _need(buf, pos, 1)
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 256, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        _need(buf, pos, n)
        return buf[pos : pos + n].decode("utf-8", "replace"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4 or b == 0xC5 or b == 0xC6:  # bin 8/16/32
        w = 1 << (b - 0xC4)
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        pos += w
        _need(buf, pos, n)
        return bytes(buf[pos : pos + n]), pos + n
    if b in (0xC7, 0xC8, 0xC9) or 0xD4 <= b <= 0xD8:
        raise ValueError("unsupported msgpack extension type")
    if b == 0xCA:
        _need(buf, pos, 4)
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        _need(buf, pos, 8)
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if 0xCC <= b <= 0xCF:  # uint 8/16/32/64
        w = 1 << (b - 0xCC)
        _need(buf, pos, w)
        return int.from_bytes(buf[pos : pos + w], "big"), pos + w
    if 0xD0 <= b <= 0xD3:  # int 8/16/32/64
        w = 1 << (b - 0xD0)
        _need(buf, pos, w)
        return int.from_bytes(buf[pos : pos + w], "big", signed=True), pos + w
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        w = 1 << (b - 0xD9)
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        pos += w
        _need(buf, pos, n)
        return buf[pos : pos + n].decode("utf-8", "replace"), pos + n
    if b in (0xDC, 0xDD):  # array 16/32
        w = 2 if b == 0xDC else 4
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        return _array(buf, pos + w, n)
    if b in (0xDE, 0xDF):  # map 16/32
        w = 2 if b == 0xDE else 4
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        return _map(buf, pos + w, n)
    if b == 0xC1:
        raise ValueError("msgpack 0xc1 is never used (spec)")
    raise ValueError(f"unhandled msgpack type byte {b:#x}")


def _array(buf: bytes, pos: int, n: int) -> tuple[list, int]:
    if n > len(buf):
        raise ValueError("msgpack array count exceeds input")
    out = []
    for _ in range(n):
        v, pos = decode_one(buf, pos)
        out.append(v)
    return out, pos


def _map(buf: bytes, pos: int, n: int) -> tuple[dict, int]:
    if n > len(buf):
        raise ValueError("msgpack map count exceeds input")
    out = {}
    for _ in range(n):
        k, pos = decode_one(buf, pos)
        if not isinstance(k, str):
            raise ValueError("msgpack map key is not a string")
        v, pos = decode_one(buf, pos)
        out[k] = v
    return out, pos


def parse_msgpack_stream(buf: bytes) -> list:
    """Concatenated msgpack objects (the Fluentd/file-dump layout) →
    list of decoded values."""
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = decode_one(buf, pos)
        out.append(v)
    return out


def encode_msgpack(v) -> bytes:
    """Fixture twin (canonical smallest-form encodings)."""
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for w, tag in ((1, 0xCC), (2, 0xCD), (4, 0xCE), (8, 0xCF)):
                if v < 1 << (8 * w):
                    return bytes([tag]) + v.to_bytes(w, "big")
            raise ValueError("int too large for msgpack uint64")
        for w, tag in ((1, 0xD0), (2, 0xD1), (4, 0xD2), (8, 0xD3)):
            if -(1 << (8 * w - 1)) <= v:
                return bytes([tag]) + v.to_bytes(w, "big", signed=True)
        raise ValueError("int too small for msgpack int64")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        n = len(raw)
        if n <= 31:
            return bytes([0xA0 | n]) + raw
        for w, tag in ((1, 0xD9), (2, 0xDA), (4, 0xDB)):
            if n < 1 << (8 * w):
                return bytes([tag]) + n.to_bytes(w, "big") + raw
        raise ValueError("string too long")
    if isinstance(v, (bytes, bytearray)):
        n = len(v)
        for w, tag in ((1, 0xC4), (2, 0xC5), (4, 0xC6)):
            if n < 1 << (8 * w):
                return bytes([tag]) + n.to_bytes(w, "big") + bytes(v)
        raise ValueError("binary too long")
    if isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < 1 << 16:
            head = b"\xdc" + n.to_bytes(2, "big")
        else:
            head = b"\xdd" + n.to_bytes(4, "big")
        return head + b"".join(encode_msgpack(x) for x in v)
    if isinstance(v, dict):
        n = len(v)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n < 1 << 16:
            head = b"\xde" + n.to_bytes(2, "big")
        else:
            head = b"\xdf" + n.to_bytes(4, "big")
        parts = []
        for k, val in v.items():
            if not isinstance(k, str):
                raise ValueError("encoder supports string map keys only")
            parts.append(encode_msgpack(k))
            parts.append(encode_msgpack(val))
        return head + b"".join(parts)
    raise ValueError(f"encoder does not support {type(v).__name__}")


def msgpack_records(files_df, fields: dict[str, str], on_error: str = "raise"):
    """`binaryFile` rows over concatenated-msgpack dumps → one row per
    top-level map object, projecting `fields` (the avro_records walker
    shape). Non-map top-level objects are a decode error."""
    import os as _os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    names = list(fields)
    schema = "file string, rec bigint, " + ", ".join(
        f"{n} {t}" for n, t in fields.items()
    )

    def fn(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "rec": [], **{n: [] for n in names},
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    objs = parse_msgpack_stream(bytes(content))
                    recs = []
                    for o in objs:
                        if not isinstance(o, dict):
                            raise ValueError(
                                "msgpack stream record is not a map"
                            )
                        recs.append(o)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = _os.path.basename(path)
                for ri, rec in enumerate(recs):
                    rows["file"].append(base)
                    rows["rec"].append(ri)
                    for n in names:
                        rows[n].append(rec.get(n))
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, schema)
