"""Pure-Python ORC reader (Apache ORC v1 spec, orc.apache.org —
hand-rolled protobuf walker, no ORC library): the OTHER major lake
columnar format next to parquet. A 100 TB lake migration routinely
has ORC eras in its history; reading them in-kernel keeps that data
on the same binaryFile-scan path as every other source here.

Scope (errors name anything else):
- root STRUCT of scalar columns: LONG/INT/SHORT (RLEv1 + RLEv2 with
  all four sub-encodings: short-repeat, direct, patched-base, delta),
  DOUBLE/FLOAT (IEEE LE streams), STRING (DIRECT and DICTIONARY,
  both v1 and v2 encodings), BOOLEAN (byte-RLE bit stream), nullable
  via PRESENT streams;
- compression NONE / ZLIB / SNAPPY / LZ4 / ZSTD — the chunked
  (length<<1 | original) framing over the in-repo codecs;
- single or multiple stripes.

pyarrow's ORC writer is the independent referee in tests; the
fixture queries replay formula data. Error contract: ValueError-only
(the jpegcodec discipline).
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# protobuf wire walker (field → list of raw values; repeated-safe)
# ---------------------------------------------------------------------------


def _pb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("protobuf varint past end")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("protobuf varint too long")


def _pb(buf: bytes) -> dict[int, list]:
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _pb_varint(buf, pos)
        fid, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _pb_varint(buf, pos)
        elif wt == 1:
            if pos + 8 > len(buf):
                raise ValueError("protobuf fixed64 past end")
            v = buf[pos : pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _pb_varint(buf, pos)
            if ln < 0 or pos + ln > len(buf):
                raise ValueError("protobuf length-delimited past end")
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > len(buf):
                raise ValueError("protobuf fixed32 past end")
            v = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"protobuf wire type {wt} unsupported")
        fields.setdefault(fid, []).append(v)
    return fields


def _one(fields: dict, fid: int, default=None):
    v = fields.get(fid)
    return v[0] if v else default


def _pb_ints(fields: dict, fid: int) -> list[int]:
    """Repeated uint field: handles both the one-per-entry form and
    proto3's PACKED form (a single length-delimited varint blob)."""
    out: list[int] = []
    for v in fields.get(fid, []):
        if isinstance(v, int):
            out.append(v)
        else:
            pos = 0
            while pos < len(v):
                x, pos = _pb_varint(v, pos)
                out.append(x)
    return out


# ---------------------------------------------------------------------------
# compression framing: 3-byte LE header (len << 1 | isOriginal)
# ---------------------------------------------------------------------------

_COMPRESSION = {0: "none", 1: "zlib", 2: "snappy", 4: "lz4", 5: "zstd"}


def _decomp_chunk(chunk: bytes, kind: str) -> bytes:
    if kind == "zlib":
        try:
            return zlib.decompress(chunk, wbits=-15)
        except zlib.error as exc:
            raise ValueError(f"corrupt ORC zlib chunk: {exc}") from exc
    if kind == "snappy":
        from odin_rs_spark.sources.snappycodec import snappy_decompress

        return snappy_decompress(chunk)
    if kind == "zstd":
        from odin_rs_spark.sources.zstdcodec import zstd_decompress

        return zstd_decompress(chunk)
    if kind == "lz4":
        # ORC lz4 chunks don't carry the decompressed size; bound by
        # the format's max block size
        from odin_rs_spark.sources.lz4codec import lz4_block_decompress

        for guess in (1 << 18, 1 << 20, 1 << 23):
            try:
                out = _lz4_any(chunk, guess)
                return out
            except ValueError:
                continue
        raise ValueError("corrupt ORC lz4 chunk")
    raise ValueError(f"ORC compression {kind!r} unsupported")


def _lz4_any(data: bytes, cap: int) -> bytes:
    """LZ4 block decode without a known exact size (ORC's framing
    already bounds the chunk): like lz4_block_decompress but accepts
    any output length up to cap."""
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
        if len(out) > cap:
            raise ValueError("lz4 output exceeds cap")
        if pos >= n:
            break
        if pos + 2 > n:
            raise ValueError("lz4 match offset past end")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4 match offset out of range")
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
        if len(out) + match_len > cap:
            raise ValueError("lz4 output exceeds cap")
        start = len(out) - offset
        for i in range(match_len):
            out.append(out[start + i])
    return bytes(out)


def _decomp_stream(data: bytes, kind: str) -> bytes:
    """Whole ORC stream → bytes, applying the chunk framing (absent
    when compression is none)."""
    if kind == "none":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data):
        if pos + 3 > len(data):
            raise ValueError("ORC chunk header past end")
        hdr = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        ln = hdr >> 1
        if pos + ln > len(data):
            raise ValueError("ORC chunk past end")
        chunk = data[pos : pos + ln]
        pos += ln
        out += chunk if hdr & 1 else _decomp_chunk(chunk, kind)
    return bytes(out)


# ---------------------------------------------------------------------------
# integer run-length codings
# ---------------------------------------------------------------------------

_WIDTH_TABLE = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


def _decode_width(enc: int, delta: bool) -> int:
    if enc == 0 and delta:
        return 0
    return _WIDTH_TABLE[enc]


def _unpack_be(data: bytes, pos: int, width: int, count: int) -> tuple[list[int], int]:
    """ORC big-endian bit packing: values MSB-first across bytes."""
    nbits = width * count
    nbytes = (nbits + 7) // 8
    if pos + nbytes > len(data):
        raise ValueError("ORC bit-packed run past end")
    bits = int.from_bytes(data[pos : pos + nbytes], "big")
    total = nbytes * 8
    out = []
    for i in range(count):
        shift = total - (i + 1) * width
        out.append((bits >> shift) & ((1 << width) - 1))
    return out, pos + nbytes


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    return _pb_varint(data, pos)


def _rle_v2(data: bytes, signed: bool, count: int) -> list[int]:
    """ORC RLEv2: short-repeat / direct / patched-base / delta."""
    out: list[int] = []
    pos = 0
    while len(out) < count:
        if pos >= len(data):
            raise ValueError("ORC RLEv2 exhausted early")
        hdr = data[pos]
        pos += 1
        enc = hdr >> 6
        if enc == 0:  # short repeat
            w = ((hdr >> 3) & 0x7) + 1
            rep = (hdr & 0x7) + 3
            if pos + w > len(data):
                raise ValueError("ORC short-repeat value past end")
            v = int.from_bytes(data[pos : pos + w], "big")
            pos += w
            if signed:
                v = _zigzag_dec(v)
            out.extend([v] * rep)
        elif enc == 1:  # direct
            w = _decode_width((hdr >> 1) & 0x1F, delta=False)
            if pos >= len(data):
                raise ValueError("ORC direct length past end")
            ln = ((hdr & 1) << 8 | data[pos]) + 1
            pos += 1
            vals, pos = _unpack_be(data, pos, w, ln)
            if signed:
                vals = [_zigzag_dec(v) for v in vals]
            out.extend(vals)
        elif enc == 2:  # patched base
            w = _decode_width((hdr >> 1) & 0x1F, delta=False)
            if pos + 3 > len(data):
                raise ValueError("ORC patched-base header past end")
            ln = ((hdr & 1) << 8 | data[pos]) + 1
            bw = ((data[pos + 1] >> 5) & 0x7) + 1
            pw = _decode_width(data[pos + 1] & 0x1F, delta=False)
            pgw = ((data[pos + 2] >> 5) & 0x7) + 1
            pll = data[pos + 2] & 0x1F
            pos += 3
            if pos + bw > len(data):
                raise ValueError("ORC patched base value past end")
            base = int.from_bytes(data[pos : pos + bw], "big")
            pos += bw
            sign_mask = 1 << (bw * 8 - 1)
            if base & sign_mask:  # sign-magnitude base
                base = -(base & (sign_mask - 1))
            vals, pos = _unpack_be(data, pos, w, ln)
            if pll:
                patch_bits = pgw + pw
                patches, pos = _unpack_be(data, pos, patch_bits, pll)
                idx = 0
                for p in patches:
                    gap = p >> pw
                    patch = p & ((1 << pw) - 1)
                    idx += gap
                    if idx >= ln:
                        raise ValueError("ORC patch index out of range")
                    vals[idx] |= patch << w
            out.extend(base + v for v in vals)
        else:  # delta
            wenc = (hdr >> 1) & 0x1F
            w = _decode_width(wenc, delta=True)
            if pos >= len(data):
                raise ValueError("ORC delta length past end")
            ln = ((hdr & 1) << 8 | data[pos]) + 1
            pos += 1
            b0, pos = _varint(data, pos)
            base = _zigzag_dec(b0) if signed else b0
            d0, pos = _varint(data, pos)
            delta0 = _zigzag_dec(d0)
            seq = [base]
            if ln > 1:
                seq.append(base + delta0)
            if ln > 2:
                if w == 0:
                    for _ in range(ln - 2):
                        seq.append(seq[-1] + delta0)
                else:
                    ds, pos = _unpack_be(data, pos, w, ln - 2)
                    sign = 1 if delta0 >= 0 else -1
                    for d in ds:
                        seq.append(seq[-1] + sign * d)
            out.extend(seq)
    if len(out) != count:
        raise ValueError(
            f"ORC RLEv2 decoded {len(out)} values, expected {count}"
        )
    return out


def _rle_v1(data: bytes, signed: bool, count: int) -> list[int]:
    """ORC RLEv1: runs of (count+3) with a per-run byte delta, or
    literal varint groups."""
    out: list[int] = []
    pos = 0
    while len(out) < count:
        if pos >= len(data):
            raise ValueError("ORC RLEv1 exhausted early")
        h = data[pos]
        pos += 1
        if h < 128:  # run
            run = h + 3
            if pos >= len(data):
                raise ValueError("ORC RLEv1 delta past end")
            delta = data[pos]
            if delta >= 128:
                delta -= 256
            pos += 1
            v, pos = _varint(data, pos)
            if signed:
                v = _zigzag_dec(v)
            for i in range(run):
                out.append(v + i * delta)
        else:  # literals
            lit = 256 - h
            for _ in range(lit):
                v, pos = _varint(data, pos)
                out.append(_zigzag_dec(v) if signed else v)
    if len(out) != count:
        raise ValueError("ORC RLEv1 count mismatch")
    return out


def _byte_rle(data: bytes, count: int) -> bytes:
    """ORC byte-level RLE (PRESENT/boolean byte stream)."""
    out = bytearray()
    pos = 0
    while len(out) < count:
        if pos >= len(data):
            raise ValueError("ORC byte RLE exhausted early")
        h = data[pos]
        pos += 1
        if h < 128:
            run = h + 3
            if pos >= len(data):
                raise ValueError("ORC byte RLE value past end")
            out += bytes([data[pos]]) * run
            pos += 1
        else:
            lit = 256 - h
            if pos + lit > len(data):
                raise ValueError("ORC byte RLE literals past end")
            out += data[pos : pos + lit]
            pos += lit
    return bytes(out[:count])


def _bool_stream(data: bytes, count: int) -> list[bool]:
    nbytes = (count + 7) // 8
    raw = _byte_rle(data, nbytes)
    out = []
    for i in range(count):
        out.append(bool(raw[i // 8] & (0x80 >> (i % 8))))
    return out


# ---------------------------------------------------------------------------
# file walk
# ---------------------------------------------------------------------------

_KIND_NAMES = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long",
    5: "float", 6: "double", 7: "string", 8: "binary", 9: "timestamp",
    10: "list", 11: "map", 12: "struct", 13: "union", 14: "decimal",
    15: "date", 16: "varchar", 17: "char",
}
_INT_KINDS = {2, 3, 4}
_SUPPORTED = {0, 2, 3, 4, 5, 6, 7}

# stream kinds
_S_PRESENT, _S_DATA, _S_LENGTH, _S_DICT = 0, 1, 2, 3


def parse_orc(buf: bytes) -> dict:
    """ORC bytes → {"columns": {name: [values...]}, "n_rows": int,
    "compression": str}. Nulls come back as None."""
    try:
        return _parse_orc(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct/index on truncation
        raise ValueError(f"corrupt ORC file: {exc}") from exc


def _parse_orc(buf: bytes) -> dict:
    if len(buf) < 16 or buf[:3] != b"ORC":
        raise ValueError("not an ORC file (missing magic)")
    psl = buf[-1]
    if psl == 0 or 1 + psl > len(buf):
        raise ValueError("ORC postscript length invalid")
    ps = _pb(buf[len(buf) - 1 - psl : len(buf) - 1])
    footer_len = _one(ps, 1)
    comp_id = _one(ps, 2, 0)
    if not isinstance(footer_len, int):
        raise ValueError("ORC postscript missing footer length")
    comp = _COMPRESSION.get(comp_id)
    if comp is None:
        raise ValueError(f"ORC compression id {comp_id} unsupported")
    fstart = len(buf) - 1 - psl - footer_len
    if fstart < 0:
        raise ValueError("ORC footer length exceeds file")
    footer = _pb(_decomp_stream(buf[fstart : fstart + footer_len], comp))
    types = [_pb(t) for t in footer.get(4, [])]
    if not types:
        raise ValueError("ORC footer has no types")
    root = types[0]
    if _one(root, 1, 0) != 12:
        raise ValueError("ORC root type must be a struct")
    sub_ids = _pb_ints(root, 2)
    names = [n.decode("utf-8", "replace") for n in root.get(3, [])]
    if len(sub_ids) != len(names):
        raise ValueError("ORC struct field names/subtypes mismatch")
    kinds = {}
    for cid in sub_ids:
        if cid >= len(types):
            raise ValueError("ORC subtype id out of range")
        kind = _one(types[cid], 1, 0)
        if kind not in _SUPPORTED:
            raise ValueError(
                f"ORC column kind {_KIND_NAMES.get(kind, kind)} unsupported"
            )
        kinds[cid] = kind

    columns: dict[str, list] = {name: [] for name in names}
    total_rows = 0
    for stripe_raw in footer.get(3, []):
        si = _pb(stripe_raw)
        s_off = _one(si, 1, 0)
        s_index = _one(si, 2, 0)
        s_data = _one(si, 3, 0)
        s_flen = _one(si, 4, 0)
        n_rows = _one(si, 5, 0)
        total_rows += n_rows
        sf_start = s_off + s_index + s_data
        if sf_start + s_flen > len(buf):
            raise ValueError("ORC stripe footer past end")
        sfooter = _pb(
            _decomp_stream(buf[sf_start : sf_start + s_flen], comp)
        )
        streams = [_pb(s) for s in sfooter.get(1, [])]
        encodings = [_pb(e) for e in sfooter.get(2, [])]
        # stream byte ranges are cumulative from the stripe start
        cursor = s_off
        per_col: dict[int, dict[int, bytes]] = {}
        for st in streams:
            kind = _one(st, 1, 0)
            col = _one(st, 2, 0)
            ln = _one(st, 3, 0)
            if cursor + ln > len(buf):
                raise ValueError("ORC stream past end")
            raw = buf[cursor : cursor + ln]
            cursor += ln
            if kind in (_S_PRESENT, _S_DATA, _S_LENGTH, _S_DICT):
                per_col.setdefault(col, {})[kind] = raw
        for cid, name in zip(sub_ids, names):
            enc = _one(encodings[cid], 1, 0) if cid < len(encodings) else 0
            dict_size = _one(encodings[cid], 2, 0) if cid < len(encodings) else 0
            colstreams = per_col.get(cid, {})
            present = None
            if _S_PRESENT in colstreams:
                present = _bool_stream(
                    _decomp_stream(colstreams[_S_PRESENT], comp), n_rows
                )
            n_present = sum(present) if present is not None else n_rows
            kind = kinds[cid]
            vals = _decode_column(
                kind, enc, dict_size, colstreams, comp, n_present
            )
            if present is None:
                columns[name].extend(vals)
            else:
                it = iter(vals)
                columns[name].extend(
                    next(it) if p else None for p in present
                )
    return {
        "columns": columns,
        "n_rows": total_rows,
        "compression": comp,
    }


def _int_rle(data: bytes, enc: int, signed: bool, count: int) -> list[int]:
    if enc in (0, 1):  # DIRECT / DICTIONARY (v1)
        return _rle_v1(data, signed, count)
    return _rle_v2(data, signed, count)


def _decode_column(
    kind: int, enc: int, dict_size: int, colstreams: dict, comp: str,
    count: int,
) -> list:
    data = _decomp_stream(colstreams.get(_S_DATA, b""), comp)
    if kind in _INT_KINDS:
        return _int_rle(data, enc, signed=True, count=count)
    if kind == 0:  # boolean
        return _bool_stream(colstreams_data_raw(colstreams, comp), count)
    if kind == 6:  # double
        if len(data) < 8 * count:
            raise ValueError("ORC double stream short")
        return list(struct.unpack_from(f"<{count}d", data, 0))
    if kind == 5:  # float
        if len(data) < 4 * count:
            raise ValueError("ORC float stream short")
        return [float(v) for v in struct.unpack_from(f"<{count}f", data, 0)]
    if kind == 7:  # string
        lengths_raw = _decomp_stream(colstreams.get(_S_LENGTH, b""), comp)
        if enc in (1, 3):  # DICTIONARY / DICTIONARY_V2
            dict_raw = _decomp_stream(colstreams.get(_S_DICT, b""), comp)
            lens = _int_rle(lengths_raw, enc, signed=False, count=dict_size)
            words = []
            pos = 0
            for ln in lens:
                if ln < 0 or pos + ln > len(dict_raw):
                    raise ValueError("ORC dictionary entry past end")
                words.append(dict_raw[pos : pos + ln].decode("utf-8", "replace"))
                pos += ln
            idx = _int_rle(data, enc, signed=False, count=count)
            try:
                return [words[i] for i in idx]
            except IndexError:
                raise ValueError("ORC dictionary index out of range") from None
        lens = _int_rle(lengths_raw, enc, signed=False, count=count)
        out = []
        pos = 0
        for ln in lens:
            if ln < 0 or pos + ln > len(data):
                raise ValueError("ORC string data past end")
            out.append(data[pos : pos + ln].decode("utf-8", "replace"))
            pos += ln
        return out
    raise ValueError(f"ORC kind {kind} decode unsupported")


def colstreams_data_raw(colstreams: dict, comp: str) -> bytes:
    return _decomp_stream(colstreams.get(_S_DATA, b""), comp)


# ---------------------------------------------------------------------------
# Spark walker
# ---------------------------------------------------------------------------


def orc_records(files_df, fields: dict[str, str], on_error: str = "raise"):
    """`binaryFile` rows over .orc files → one row per record,
    projecting `fields` ({column: spark_type}) plus file/compression
    provenance — the avro_records shape for the ORC era of a lake."""
    import os as _os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    names = list(fields)
    schema = "file string, compression string, " + ", ".join(
        f"{n} {t}" for n, t in fields.items()
    )

    def fn(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "compression": [], **{n: [] for n in names},
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    parsed = parse_orc(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = _os.path.basename(path)
                cols = parsed["columns"]
                for n in names:
                    if n not in cols:
                        raise ValueError(f"ORC file missing column {n!r}")
                for i in range(parsed["n_rows"]):
                    rows["file"].append(base)
                    rows["compression"].append(parsed["compression"])
                    for n in names:
                        rows[n].append(cols[n][i])
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, schema)
