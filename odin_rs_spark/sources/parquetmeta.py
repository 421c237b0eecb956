"""Parquet footer metadata reader (Apache Thrift Compact Protocol,
hand-rolled from the public `parquet.thrift` / thrift compact-protocol
specs — no parquet library in the loop). This is the LAKE-MANAGEMENT
primitive every 100 TB deployment runs constantly: row-group min/max
statistics drive file skipping, compaction planning (q254) and layout
audits (q238/q248) without touching a single data page. The parser
reads ONLY the footer slice (`[-8-footer_len : -8]`), so at scale the
walker's input can be a ranged GET of the last ~64 KiB per object —
the whole audit is metadata work over the file inventory, no data
pages are ever decompressed.

Verification story: DuckDB ships an INDEPENDENT footer reader exposed
as `parquet_metadata(path)` — the q290 oracle compares this parser's
per-(row-group, column) statistics, offsets and sizes against DuckDB's
on the same committed fixture, byte-derived field for byte-derived
field. Reference parity: the reference's lake inventory walks GDAL/
Arrow metadata natively; this re-expresses the same capability as a
distributed binaryFile scan (SURVEY §2.1 S-family walker shape).

Error contract: ValueError-only (the jpegcodec discipline).
"""

from __future__ import annotations

import struct as _struct_mod

# ---------------------------------------------------------------------------
# Thrift Compact Protocol primitives
# ---------------------------------------------------------------------------

_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("thrift varint runs past end of footer")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("thrift varint longer than 64 bits")


def _zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _varint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def _value(buf: bytes, pos: int, ctype: int):
    """Decode one compact-protocol value of wire type `ctype`."""
    if ctype == _CT_TRUE:
        return True, pos
    if ctype == _CT_FALSE:
        return False, pos
    if ctype == _CT_BYTE:
        if pos >= len(buf):
            raise ValueError("thrift byte past end")
        v = buf[pos]
        return (v - 256 if v >= 128 else v), pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        return _zigzag(buf, pos)
    if ctype == _CT_DOUBLE:
        if pos + 8 > len(buf):
            raise ValueError("thrift double past end")
        # compact protocol doubles are little-endian (THRIFT-2188)
        return _struct_mod.unpack_from("<d", buf, pos)[0], pos + 8
    if ctype == _CT_BINARY:
        n, pos = _varint(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("thrift binary length out of bounds")
        return bytes(buf[pos : pos + n]), pos + n
    if ctype in (_CT_LIST, _CT_SET):
        return _list(buf, pos)
    if ctype == _CT_MAP:
        return _map(buf, pos)
    if ctype == _CT_STRUCT:
        return _struct(buf, pos)
    raise ValueError(f"unknown thrift compact type {ctype}")


def _list(buf: bytes, pos: int) -> tuple[list, int]:
    if pos >= len(buf):
        raise ValueError("thrift list header past end")
    hdr = buf[pos]
    pos += 1
    size = hdr >> 4
    etype = hdr & 0x0F
    if size == 15:
        size, pos = _varint(buf, pos)
    if size > len(buf):  # cheap sanity bound: one element needs >= 1 byte
        raise ValueError("thrift list size exceeds footer bytes")
    out = []
    for _ in range(size):
        # booleans inside lists are one byte each, not header-encoded
        if etype in (_CT_TRUE, _CT_FALSE):
            if pos >= len(buf):
                raise ValueError("thrift bool element past end")
            out.append(buf[pos] == 1)
            pos += 1
        else:
            v, pos = _value(buf, pos, etype)
            out.append(v)
    return out, pos


def _map(buf: bytes, pos: int) -> tuple[dict, int]:
    size, pos = _varint(buf, pos)
    if size == 0:
        return {}, pos
    if pos >= len(buf):
        raise ValueError("thrift map header past end")
    kv = buf[pos]
    pos += 1
    ktype, vtype = kv >> 4, kv & 0x0F
    out = {}
    for _ in range(size):
        k, pos = _value(buf, pos, ktype)
        v, pos = _value(buf, pos, vtype)
        out[k] = v
    return out, pos


def _struct(buf: bytes, pos: int) -> tuple[dict, int]:
    """Struct → {field_id: value}. Nested structs recurse; unknown
    fields are kept (they're just ids), so schema evolution in
    parquet.thrift never breaks the walk."""
    fields: dict[int, object] = {}
    fid = 0
    while True:
        if pos >= len(buf):
            raise ValueError("thrift struct missing STOP")
        hdr = buf[pos]
        pos += 1
        if hdr == _CT_STOP:
            return fields, pos
        delta = hdr >> 4
        ctype = hdr & 0x0F
        if delta:
            fid += delta
        else:  # long form: explicit zigzag field id
            fid, pos = _zigzag(buf, pos)
        v, pos = _value(buf, pos, ctype)
        fields[fid] = v
    # unreachable


# ---------------------------------------------------------------------------
# parquet.thrift field maps (only what the audit consumes)
# ---------------------------------------------------------------------------

PHYSICAL_TYPES = {
    0: "BOOLEAN",
    1: "INT32",
    2: "INT64",
    3: "INT96",
    4: "FLOAT",
    5: "DOUBLE",
    6: "BYTE_ARRAY",
    7: "FIXED_LEN_BYTE_ARRAY",
}

CODECS = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}


def _decode_stat(raw: bytes | None, ptype: str):
    """Plain-encoded statistics value → (numeric, string) pair; exactly
    one side is non-None for a present stat (numeric for numeric
    physical types, text for BYTE_ARRAY)."""
    if raw is None:
        return None, None
    if ptype == "INT32":
        if len(raw) != 4:
            raise ValueError(f"INT32 stat must be 4 bytes, got {len(raw)}")
        return float(_struct_mod.unpack("<i", raw)[0]), None
    if ptype == "INT64":
        if len(raw) != 8:
            raise ValueError(f"INT64 stat must be 8 bytes, got {len(raw)}")
        return float(_struct_mod.unpack("<q", raw)[0]), None
    if ptype == "FLOAT":
        if len(raw) != 4:
            raise ValueError(f"FLOAT stat must be 4 bytes, got {len(raw)}")
        return float(_struct_mod.unpack("<f", raw)[0]), None
    if ptype == "DOUBLE":
        if len(raw) != 8:
            raise ValueError(f"DOUBLE stat must be 8 bytes, got {len(raw)}")
        return _struct_mod.unpack("<d", raw)[0], None
    if ptype == "BOOLEAN":
        if len(raw) != 1:
            raise ValueError("BOOLEAN stat must be 1 byte")
        return float(raw[0]), None
    # BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY: UTF-8 text stats
    return None, raw.decode("utf-8", "replace")


def _int_or_none(v, what):
    if v is None or isinstance(v, bool) or not isinstance(v, int):
        if v is None:
            return None
        raise ValueError(f"parquet footer field {what} is not an integer")
    return v


def _want(v, typ, what):
    """Wire-type guard: a bit flip can re-type any thrift field, so
    every structural access validates shape and fails as ValueError
    (the decode contract), never AttributeError/TypeError."""
    if not isinstance(v, typ):
        raise ValueError(f"parquet footer field {what} has wrong wire type")
    return v


def parse_parquet_footer(buf: bytes) -> dict:
    """Whole-file (or tail-slice) bytes → FileMetaData dict.

    Accepts either the full file or any suffix that still contains the
    footer (the ranged-GET path at scale). Head magic is NOT checked —
    it is unverifiable from a suffix slice, and a slice of exactly
    footer_len+12 bytes is indistinguishable from a minimal full file;
    the tail magic + thrift parse carry the integrity check.
    """
    if len(buf) < 12:
        raise ValueError("parquet file shorter than minimal footer")
    if buf[-4:] != b"PAR1":
        raise ValueError("parquet tail magic missing (not a parquet file)")
    footer_len = _struct_mod.unpack("<I", buf[-8:-4])[0]
    if footer_len + 8 > len(buf):
        raise ValueError(
            f"parquet footer length {footer_len} exceeds provided bytes"
        )
    # head magic is deliberately NOT verified: a ranged-GET tail slice
    # whose length happens to equal footer_len+12 is indistinguishable
    # from a minimal full file, and rejecting it would break the
    # documented suffix-slice contract. Integrity rests on the tail
    # magic plus the thrift footer parse (r11 review).
    thrift = buf[len(buf) - 8 - footer_len : len(buf) - 8]
    fm, _ = _struct(thrift, 0)
    schema = [
        {
            "type": PHYSICAL_TYPES.get(s.get(1), None),
            # FieldRepetitionType (parquet.thrift SchemaElement field 3):
            # 0=REQUIRED, 1=OPTIONAL, 2=REPEATED — REQUIRED flat columns
            # carry NO definition levels in v1 data pages
            "repetition": s.get(3),
            "name": _want(s.get(4) or b"", bytes, "schema.name").decode(
                "utf-8", "replace"
            ),
            "num_children": s.get(5, 0),
        }
        for s in _want(fm.get(2, []), list, "schema")
        if _want(s, dict, "SchemaElement")
    ]
    row_groups = []
    for rg in _want(fm.get(4, []), list, "row_groups"):
        _want(rg, dict, "RowGroup")
        cols = []
        for cc in _want(rg.get(1, []), list, "columns"):
            md = _want(cc, dict, "ColumnChunk").get(3)
            if md is None:
                raise ValueError("column chunk missing ColumnMetaData")
            _want(md, dict, "ColumnMetaData")
            ptype = PHYSICAL_TYPES.get(md.get(1))
            if ptype is None:
                raise ValueError(f"unknown parquet physical type {md.get(1)}")
            stats = _want(md.get(12) or {}, dict, "Statistics")
            # modern min_value/max_value (5/6) win over legacy min/max (2/1)
            min_raw = stats.get(6, stats.get(2))
            max_raw = stats.get(5, stats.get(1))
            if min_raw is not None:
                _want(min_raw, bytes, "Statistics.min")
            if max_raw is not None:
                _want(max_raw, bytes, "Statistics.max")
            min_num, min_str = _decode_stat(min_raw, ptype)
            max_num, max_str = _decode_stat(max_raw, ptype)
            cols.append(
                {
                    "path": ".".join(
                        _want(p, bytes, "path_in_schema").decode(
                            "utf-8", "replace"
                        )
                        for p in _want(md.get(3, []), list, "path_in_schema")
                    ),
                    "type": ptype,
                    "codec": CODECS.get(md.get(4), f"CODEC_{md.get(4)}"),
                    "num_values": _int_or_none(md.get(5), "num_values"),
                    "total_uncompressed_size": _int_or_none(
                        md.get(6), "total_uncompressed_size"
                    ),
                    "total_compressed_size": _int_or_none(
                        md.get(7), "total_compressed_size"
                    ),
                    "data_page_offset": _int_or_none(
                        md.get(9), "data_page_offset"
                    ),
                    "dictionary_page_offset": _int_or_none(
                        md.get(11), "dictionary_page_offset"
                    ),
                    "null_count": _int_or_none(stats.get(3), "null_count"),
                    "min_num": min_num,
                    "max_num": max_num,
                    "min_str": min_str,
                    "max_str": max_str,
                }
            )
        row_groups.append(
            {
                "total_byte_size": _int_or_none(rg.get(2), "total_byte_size"),
                "num_rows": _int_or_none(rg.get(3), "rg.num_rows"),
                "columns": cols,
            }
        )
    return {
        "version": _int_or_none(fm.get(1), "version"),
        "num_rows": _int_or_none(fm.get(3), "num_rows"),
        "created_by": _want(
            fm.get(6) or b"", bytes, "created_by"
        ).decode("utf-8", "replace"),
        "schema": schema,
        "row_groups": row_groups,
    }


# ---------------------------------------------------------------------------
# Spark walker — one row per (row group, column chunk)
# ---------------------------------------------------------------------------

ROWGROUP_SCHEMA = (
    "file string, rg bigint, rg_rows bigint, rg_bytes bigint, "
    "col_name string, ptype string, codec string, num_values bigint, "
    "null_count bigint, data_page_offset bigint, "
    "dictionary_page_offset bigint, total_compressed_size bigint, "
    "total_uncompressed_size bigint, min_num double, max_num double, "
    "min_str string, max_str string"
)


def parquet_rowgroup_stats(files_df, on_error: str = "raise"):
    """`binaryFile` rows over .parquet objects → one row per
    (row group, column chunk) with decoded min/max/null statistics.
    Footer bytes are sliced per file; data pages are never touched, so
    the per-file work is O(footer), not O(file) — the property that
    lets a 100 TB inventory audit run as a metadata job."""
    import os as _os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "rg": [], "rg_rows": [], "rg_bytes": [],
                "col_name": [], "ptype": [], "codec": [], "num_values": [],
                "null_count": [], "data_page_offset": [],
                "dictionary_page_offset": [], "total_compressed_size": [],
                "total_uncompressed_size": [], "min_num": [], "max_num": [],
                "min_str": [], "max_str": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    meta = parse_parquet_footer(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = _os.path.basename(path)
                for gi, rg in enumerate(meta["row_groups"]):
                    for c in rg["columns"]:
                        rows["file"].append(base)
                        rows["rg"].append(gi)
                        rows["rg_rows"].append(rg["num_rows"])
                        rows["rg_bytes"].append(rg["total_byte_size"])
                        rows["col_name"].append(c["path"])
                        rows["ptype"].append(c["type"])
                        rows["codec"].append(c["codec"])
                        rows["num_values"].append(c["num_values"])
                        rows["null_count"].append(c["null_count"])
                        rows["data_page_offset"].append(c["data_page_offset"])
                        rows["dictionary_page_offset"].append(
                            c["dictionary_page_offset"]
                        )
                        rows["total_compressed_size"].append(
                            c["total_compressed_size"]
                        )
                        rows["total_uncompressed_size"].append(
                            c["total_uncompressed_size"]
                        )
                        rows["min_num"].append(c["min_num"])
                        rows["max_num"].append(c["max_num"])
                        rows["min_str"].append(c["min_str"])
                        rows["max_str"].append(c["max_str"])
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, ROWGROUP_SCHEMA)


# ---------------------------------------------------------------------------
# data-page decode (the trust-but-verify layer: q290 reads the footer
# STATS; this decodes the PAGES those stats describe, so an audit can
# prove min/max/null_count against actual values — the check a lake
# runs before it lets file-skipping elide a petabyte). Scope: data
# pages v1 AND v2 (r11: v2's uncompressed level blocks without the
# 4-byte prefix), PLAIN and RLE_DICTIONARY encodings, RLE/bit-packed hybrid
# definition levels, flat optional columns; codecs UNCOMPRESSED /
# SNAPPY (sources/snappycodec) / GZIP (zlib) / ZSTD (sources/
# zstdcodec). Everything else raises BY NAME.
# ---------------------------------------------------------------------------

_ENC_PLAIN = 0
_ENC_PLAIN_DICT = 2
_ENC_RLE = 3
_ENC_RLE_DICT = 8


def _rle_hybrid(data: bytes, pos: int, bitwidth: int, count: int) -> tuple[list[int], int]:
    """parquet RLE/bit-packed hybrid → `count` ints."""
    vals: list[int] = []
    byw = (bitwidth + 7) // 8
    while len(vals) < count:
        header, pos = _varint(data, pos)
        if header & 1:  # bit-packed groups of 8
            groups = header >> 1
            nbytes = groups * bitwidth
            if pos + nbytes > len(data):
                raise ValueError("rle bit-packed run past end")
            bits = int.from_bytes(data[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << bitwidth) - 1
            for i in range(groups * 8):
                vals.append((bits >> (i * bitwidth)) & mask)
        else:  # rle run
            run = header >> 1
            if pos + byw > len(data):
                raise ValueError("rle run value past end")
            v = int.from_bytes(data[pos : pos + byw], "little")
            pos += byw
            vals.extend([v] * run)
        if len(vals) > count + 8:
            # bit-packed runs round up to 8; more than that is corrupt
            raise ValueError("rle hybrid produced too many values")
    return vals[:count], pos


def _plain_values(data: bytes, pos: int, ptype: str, n: int) -> tuple[list, int]:
    if ptype in ("INT32", "FLOAT"):
        need = 4 * n
        fmt = "<%d%s" % (n, "i" if ptype == "INT32" else "f")
    elif ptype in ("INT64", "DOUBLE"):
        need = 8 * n
        fmt = "<%d%s" % (n, "q" if ptype == "INT64" else "d")
    elif ptype == "BYTE_ARRAY":
        out = []
        for _ in range(n):
            if pos + 4 > len(data):
                raise ValueError("byte_array length past end")
            ln = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            if pos + ln > len(data):
                raise ValueError("byte_array value past end")
            out.append(data[pos : pos + ln].decode("utf-8", "replace"))
            pos += ln
        return out, pos
    else:
        raise ValueError(f"plain decode unsupported for {ptype}")
    if pos + need > len(data):
        raise ValueError(f"{ptype} plain values past end")
    return list(_struct_mod.unpack_from(fmt, data, pos)), pos + need


def _delta_binary_packed(data: bytes, pos: int) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (parquet encodings.md): header
    <block_size> <miniblocks/block> <total_count> <first zigzag>,
    then per block <min_delta zigzag> <bitwidth byte/miniblock>
    <LSB-first bit-packed deltas>. Reads exactly one encoded run."""
    block_size, pos = _varint(data, pos)
    n_mini, pos = _varint(data, pos)
    total, pos = _varint(data, pos)
    if total == 0:
        return [], pos
    first, pos = _zigzag(data, pos)
    if (
        block_size <= 0 or n_mini <= 0 or block_size % 128
        or block_size % n_mini or total > len(data) * 65
    ):
        raise ValueError("delta-binary-packed header invalid")
    per_mini = block_size // n_mini
    # spec: each miniblock holds a multiple of 32 values, so
    # per_mini*w is always whole bytes — anything else would make the
    # '// 8' below TRUNCATE and silently decode wrong values
    if per_mini % 32:
        raise ValueError(
            f"delta miniblock size {per_mini} not a multiple of 32"
        )
    vals = [first]
    while len(vals) < total:
        min_delta, pos = _zigzag(data, pos)
        if pos + n_mini > len(data):
            raise ValueError("delta miniblock widths past end")
        widths = data[pos : pos + n_mini]
        pos += n_mini
        for w in widths:
            if len(vals) >= total:
                break  # trailing miniblocks are omitted by writers
            if w > 66:
                raise ValueError(f"delta bit width {w} invalid")
            nbytes = per_mini * w // 8
            if pos + nbytes > len(data):
                raise ValueError("delta miniblock past end")
            if w == 0:
                deltas = [0] * per_mini
            else:
                bits = int.from_bytes(data[pos : pos + nbytes], "little")
                mask = (1 << w) - 1
                deltas = [
                    (bits >> (i * w)) & mask for i in range(per_mini)
                ]
            pos += nbytes
            for d in deltas:
                if len(vals) >= total:
                    break
                vals.append(vals[-1] + min_delta + d)
    return vals, pos


def _delta_length_byte_array(
    data: bytes, pos: int
) -> tuple[list[bytes], int]:
    """DELTA_LENGTH_BYTE_ARRAY: DBP lengths + concatenated bytes.
    Prefix/suffix math is BYTE-level, so raw bytes come back; the
    caller decodes UTF-8 at the end."""
    lengths, pos = _delta_binary_packed(data, pos)
    out = []
    for ln in lengths:
        if ln < 0 or pos + ln > len(data):
            raise ValueError("delta-length payload past end")
        out.append(data[pos : pos + ln])
        pos += ln
    return out, pos


def _delta_byte_array(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """DELTA_BYTE_ARRAY (incremental/front coding): DBP prefix
    lengths + DELTA_LENGTH_BYTE_ARRAY suffixes."""
    prefixes, pos = _delta_binary_packed(data, pos)
    suffixes, pos = _delta_length_byte_array(data, pos)
    if len(prefixes) != len(suffixes):
        raise ValueError("delta-byte-array prefix/suffix count mismatch")
    out: list[bytes] = []
    prev = b""
    for pfx, sfx in zip(prefixes, suffixes):
        if pfx < 0 or pfx > len(prev):
            raise ValueError("delta-byte-array prefix out of range")
        prev = prev[:pfx] + sfx
        out.append(prev)
    return out, pos


def _decompress_page(payload: bytes, codec: str, usize: int) -> bytes:
    if codec == "UNCOMPRESSED":
        out = payload
    elif codec == "SNAPPY":
        from odin_rs_spark.sources.snappycodec import snappy_decompress

        out = snappy_decompress(payload)
    elif codec == "GZIP":
        import zlib

        try:
            out = zlib.decompress(payload, wbits=31)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip page: {exc}") from exc
    elif codec == "ZSTD":
        from odin_rs_spark.sources.zstdcodec import zstd_decompress

        out = zstd_decompress(payload)
    elif codec == "LZ4":  # legacy Hadoop framing (pyarrow's 'lz4')
        from odin_rs_spark.sources.lz4codec import lz4_hadoop_decompress

        out = lz4_hadoop_decompress(payload, usize)
    elif codec == "LZ4_RAW":  # bare block (the modern codec id)
        from odin_rs_spark.sources.lz4codec import lz4_block_decompress

        out = lz4_block_decompress(payload, usize)
    elif codec == "BROTLI":
        from odin_rs_spark.sources.brotlidec import (
            brotli_available,
            brotli_decompress,
        )

        if not brotli_available():
            raise ValueError(
                "brotli pages need the system libbrotlidec (absent)"
            )
        try:
            out = brotli_decompress(payload, max_output=usize + 1)
        except RuntimeError as exc:
            raise ValueError(f"corrupt brotli page: {exc}") from exc
    else:
        raise ValueError(f"unsupported parquet page codec: {codec}")
    if len(out) != usize:
        raise ValueError(
            f"page decompressed to {len(out)} bytes, header said {usize}"
        )
    return out


def parquet_column_values(buf: bytes, rg_index: int, col_path: str) -> list:
    """Decode one column chunk's values (None for nulls) straight from
    the pages — no parquet library. Flat REQUIRED/OPTIONAL columns,
    data pages v1 and v2, PLAIN / RLE_DICTIONARY."""
    meta = parse_parquet_footer(buf)
    try:
        rg = meta["row_groups"][rg_index]
    except IndexError:
        raise ValueError(f"row group {rg_index} out of range") from None
    col = next((c for c in rg["columns"] if c["path"] == col_path), None)
    if col is None:
        raise ValueError(f"column {col_path!r} not in row group")
    # REQUIRED flat columns (repetition 0) omit definition levels
    # entirely in v1 data pages; REPEATED (2) needs rep levels — out
    # of the flat-column scope, rejected by name
    sch = next(
        (s for s in meta["schema"][1:] if s["name"] == col_path), None
    )
    repetition = sch["repetition"] if sch is not None else 1
    if repetition == 2:
        raise ValueError("repeated (nested) columns unsupported")
    start = col["data_page_offset"]
    size = col["total_compressed_size"]
    if not isinstance(start, int) or not isinstance(size, int):
        raise ValueError("column chunk offsets/size missing from footer")
    if isinstance(col["dictionary_page_offset"], int):
        start = min(start, col["dictionary_page_offset"])
    pos = start
    end = start + size
    if end > len(buf):
        raise ValueError("column chunk extends past file")
    dictionary: list | None = None
    out: list = []
    target = col["num_values"]
    while len(out) < target:
        if pos >= end:
            raise ValueError("column chunk pages exhausted early")
        hdr, pos = _struct(buf[:end], pos)
        ptype_pg = _int_or_none(hdr.get(1), "page.type")
        usize = _int_or_none(hdr.get(2), "page.uncompressed_size")
        csize = _int_or_none(hdr.get(3), "page.compressed_size")
        if usize is None or csize is None or pos + csize > end:
            raise ValueError("page sizes out of bounds")
        raw = bytes(buf[pos : pos + csize])
        pos += csize
        if ptype_pg == 2:  # dictionary page
            payload = _decompress_page(raw, col["codec"], usize)
            dh = _want(hdr.get(7) or {}, dict, "dictionary_page_header")
            nvals = _int_or_none(dh.get(1), "dict.num_values") or 0
            dictionary, _ = _plain_values(payload, 0, col["type"], nvals)
            continue
        if ptype_pg == 3:
            # DATA PAGE V2 (DataPageHeaderV2, header field 8): rep/def
            # levels sit UNCOMPRESSED before the (optionally compressed)
            # values, RLE WITHOUT the v1 4-byte length prefix — their
            # byte lengths come from the header itself
            dph = _want(hdr.get(8) or {}, dict, "data_page_header_v2")
            nvals = _int_or_none(dph.get(1), "page.num_values")
            nnulls = _int_or_none(dph.get(2), "page.num_nulls")
            enc = _int_or_none(dph.get(4), "page.encoding")
            dlen = _int_or_none(dph.get(5), "page.def_levels_len") or 0
            rlen = _int_or_none(dph.get(6), "page.rep_levels_len") or 0
            is_comp = dph.get(7, True)
            if nvals is None or nnulls is None:
                raise ValueError("data page v2 missing num_values/num_nulls")
            if rlen:
                raise ValueError("repeated (nested) columns unsupported")
            if dlen > len(raw):
                raise ValueError("v2 def levels past end")
            if dlen:
                defs, _ = _rle_hybrid(raw[:dlen], 0, 1, nvals)
            else:
                defs = [1] * nvals
            vals_raw = raw[dlen:]
            payload = (
                _decompress_page(vals_raw, col["codec"], usize - dlen)
                if is_comp else vals_raw
            )
            p = 0
            n_present = nvals - nnulls
            if sum(defs) != n_present:
                raise ValueError("v2 def levels disagree with num_nulls")
        elif ptype_pg != 0:
            raise ValueError(f"unsupported page type {ptype_pg}")
        else:
            payload = _decompress_page(raw, col["codec"], usize)
            dph = _want(hdr.get(5) or {}, dict, "data_page_header")
            nvals = _int_or_none(dph.get(1), "page.num_values")
            enc = _int_or_none(dph.get(2), "page.encoding")
            if nvals is None:
                raise ValueError("data page missing num_values")
            p = 0
            if repetition == 0:
                # REQUIRED column: max definition level 0 — the
                # def-level block is absent and every slot holds a value
                defs = [1] * nvals
            else:
                # definition levels: optional flat column -> bitwidth 1,
                # 4-byte length prefix, RLE (parquet spec default)
                if p + 4 > len(payload):
                    raise ValueError("def-level length past end")
                dlen = int.from_bytes(payload[p : p + 4], "little")
                p += 4
                if p + dlen > len(payload):
                    raise ValueError("def levels past end")
                defs, _ = _rle_hybrid(payload[: p + dlen], p, 1, nvals)
                p += dlen
            n_present = sum(defs)
        if enc == _ENC_PLAIN:
            vals, p = _plain_values(payload, p, col["type"], n_present)
        elif enc in (_ENC_RLE_DICT, _ENC_PLAIN_DICT):
            if dictionary is None:
                raise ValueError("dictionary-encoded page before dictionary")
            if p >= len(payload):
                raise ValueError("dict indices past end")
            bw = payload[p]
            p += 1
            if bw > 32:
                raise ValueError(f"dict index bit width {bw} invalid")
            idx, p = _rle_hybrid(payload, p, bw, n_present) if bw else ([0] * n_present, p)
            try:
                vals = [dictionary[i] for i in idx]
            except IndexError:
                raise ValueError("dict index out of range") from None
        elif enc == 5:  # DELTA_BINARY_PACKED (parquet-mr v2 ints)
            if col["type"] not in ("INT32", "INT64"):
                raise ValueError("delta-binary-packed on non-int column")
            vals, p = _delta_binary_packed(payload, p)
        elif enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
            if col["type"] != "BYTE_ARRAY":
                raise ValueError("delta-length on non-byte-array column")
            raws, p = _delta_length_byte_array(payload, p)
            vals = [r.decode("utf-8", "replace") for r in raws]
        elif enc == 7:  # DELTA_BYTE_ARRAY (front coding)
            if col["type"] != "BYTE_ARRAY":
                raise ValueError("delta-byte-array on non-byte-array column")
            raws, p = _delta_byte_array(payload, p)
            vals = [r.decode("utf-8", "replace") for r in raws]
        else:
            raise ValueError(f"unsupported data page encoding {enc}")
        if enc in (5, 6, 7) and len(vals) != n_present:
            raise ValueError(
                f"delta encoding carries {len(vals)} values, page "
                f"declares {n_present}"
            )
        it = iter(vals)
        for d in defs:
            out.append(next(it) if d else None)
    return out


PAGE_AUDIT_SCHEMA = (
    "file string, rg bigint, col_name string, n_values bigint, "
    "n_nulls bigint, stats_nulls_ok boolean, stats_min_ok boolean, "
    "stats_max_ok boolean, sum_num double"
)


def parquet_page_audit(files_df, columns: list[str], on_error: str = "raise"):
    """Decode every row group's pages for `columns` and verify the
    footer statistics against the DECODED values — the trust-but-
    verify audit that has to pass before file skipping is allowed to
    elide data. One row per (file, row group, column)."""
    import os as _os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "rg": [], "col_name": [], "n_values": [],
                "n_nulls": [], "stats_nulls_ok": [], "stats_min_ok": [],
                "stats_max_ok": [], "sum_num": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    buf = bytes(content)
                    meta = parse_parquet_footer(buf)
                    base = _os.path.basename(path)
                    for gi, rg in enumerate(meta["row_groups"]):
                        for c in rg["columns"]:
                            if c["path"] not in columns:
                                continue
                            vals = parquet_column_values(buf, gi, c["path"])
                            present = [v for v in vals if v is not None]
                            nn = len(vals) - len(present)
                            numeric = c["type"] in (
                                "INT32", "INT64", "FLOAT", "DOUBLE"
                            )
                            lo = min(present) if present else None
                            hi = max(present) if present else None
                            if numeric:
                                ok_min = (
                                    c["min_num"] is not None
                                    and float(lo) == c["min_num"]
                                )
                                ok_max = (
                                    c["max_num"] is not None
                                    and float(hi) == c["max_num"]
                                )
                                s = float(sum(float(v) for v in present))
                            else:
                                ok_min = c["min_str"] == lo
                                ok_max = c["max_str"] == hi
                                s = None
                            rows["file"].append(base)
                            rows["rg"].append(gi)
                            rows["col_name"].append(c["path"])
                            rows["n_values"].append(len(vals))
                            rows["n_nulls"].append(nn)
                            rows["stats_nulls_ok"].append(
                                c["null_count"] == nn
                            )
                            rows["stats_min_ok"].append(bool(ok_min))
                            rows["stats_max_ok"].append(bool(ok_max))
                            rows["sum_num"].append(s)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, PAGE_AUDIT_SCHEMA)
