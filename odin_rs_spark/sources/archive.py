"""TAR archive walking (POSIX.1-1988 ustar format — the container
training corpora actually ship in: Pile shards, WebDataset .tar image
bundles, HF dataset dumps). Hand-rolled from the public ustar layout
in the repo's codec style: 512-byte headers with octal fields and a
space-initialized checksum, data rounded to 512-byte blocks, two zero
blocks at the end; `encode_tar` is the fixture twin and the stdlib
`tarfile` module serves as the independent test referee (the mail.py
discipline).

Scope: regular files, directories, symlinks (typeflags '0'/'\\0', '5',
'2'), ustar magic verification, checksum verification, prefix field
for long paths. Out of scope, documented: GNU long-name extensions
(typeflag 'L'), PAX extended headers (typeflag 'x' — rejected loudly),
sparse files. ValueError-only error contract.
"""

from __future__ import annotations

import os

_BLOCK = 512


def _octal(field: bytes, name: str) -> int:
    s = field.split(b"\x00")[0].strip(b" \x00")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"bad octal in tar {name}: {field!r}") from exc


def _parse_pax(data: bytes) -> dict[str, str]:
    """PAX extended-header payload → {keyword: value}. Records are
    '<decimal len> <keyword>=<value>\\n' where len counts the whole
    record including itself (POSIX.1-2001 pax §interchange format)."""
    kv: dict[str, str] = {}
    i = 0
    while i < len(data):
        sp = data.find(b" ", i)
        if sp < 0:
            raise ValueError("pax record missing length separator")
        try:
            ln = int(data[i:sp])
        except ValueError as exc:
            raise ValueError(f"bad pax record length: {data[i:sp]!r}") from exc
        if ln <= sp - i or i + ln > len(data) or data[i + ln - 1 : i + ln] != b"\n":
            raise ValueError("pax record length out of bounds")
        rec = data[sp + 1 : i + ln - 1]
        eq = rec.find(b"=")
        if eq < 0:
            raise ValueError("pax record missing '='")
        kv[rec[:eq].decode("utf-8", "replace")] = rec[eq + 1 :].decode(
            "utf-8", "replace"
        )
        i += ln
    return kv


def parse_tar(buf: bytes) -> list[dict]:
    """TAR bytes → member dicts (name, size, mtime, typeflag, data for
    regular files, None otherwise) in archive order.  Verifies the
    ustar magic and every header checksum.

    PAX extended headers (typeflag 'x' per-member, 'g' global) and GNU
    long-name/long-link blocks ('L'/'K') are consumed and applied:
    pax `path`/`size`/`mtime` override the following member's header
    fields (GNU 'L' overrides the name), which is how >100-char paths
    travel in Pile-style shards.  Data blocks are consumed for EVERY
    nonzero-size member regardless of typeflag (POSIX: unrecognized
    typeflags read as regular files), but `data` is surfaced only for
    regular members ('0'/NUL/'7' contiguous)."""
    out: list[dict] = []
    i = 0
    pax_global: dict[str, str] = {}
    pax_next: dict[str, str] = {}
    gnu_longname: str | None = None
    while i + _BLOCK <= len(buf):
        hdr = buf[i : i + _BLOCK]
        if hdr == b"\x00" * _BLOCK:  # first of the two end blocks
            return out
        magic = hdr[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise ValueError(f"bad ustar magic at offset {i}: {magic!r}")
        stored = _octal(hdr[148:156], "chksum")
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != calc:
            raise ValueError(f"tar checksum mismatch at offset {i}")
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        size = _octal(hdr[124:136], "size")
        mtime = _octal(hdr[136:148], "mtime")
        i += _BLOCK
        if i + size > len(buf):
            raise ValueError("tar member data truncated")
        body = buf[i : i + size]
        i += ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        if typeflag == "g":
            pax_global.update(_parse_pax(body))
            continue
        if typeflag == "x":
            pax_next = _parse_pax(body)
            continue
        if typeflag == "L":  # GNU longname: body names the NEXT member
            gnu_longname = body.split(b"\x00")[0].decode("utf-8", "replace")
            continue
        if typeflag == "K":  # GNU longlink: consumed, not surfaced
            continue
        merged = {**pax_global, **pax_next}
        pax_next = {}
        if gnu_longname is not None:
            name = gnu_longname
            gnu_longname = None
        if "path" in merged:
            name = merged["path"]
        if "size" in merged and int(merged["size"]) != size:
            # pax size overrides exist for >8 GiB members whose octal
            # header field cannot hold the real size — the block walk
            # above already consumed per the header field, so a
            # differing override means we cannot resync
            raise ValueError("pax size override unsupported (>8GiB member)")
        if "mtime" in merged:
            mtime = int(float(merged["mtime"]))
        regular = typeflag in ("0", "\x00", "7")
        out.append(
            {
                "name": name,
                "size": size,
                "mtime": mtime,
                "typeflag": "0" if typeflag == "\x00" else typeflag,
                "data": body if regular else None,
            }
        )
    raise ValueError("tar ended without terminator blocks")


def encode_pax_payload(kv: dict[str, str]) -> bytes:
    """Fixture twin of `_parse_pax`: '<len> <k>=<v>\\n' records where
    len counts the whole record (computed by fixpoint on digit width)."""
    out = bytearray()
    for k, v in kv.items():
        body = f" {k}={v}\n".encode()
        ln = len(body) + 1
        while len(str(ln)) + len(body) != ln:
            ln = len(str(ln)) + len(body)
        out += str(ln).encode() + body
    return bytes(out)


def encode_tar(
    members: list[tuple[str, bytes | None, str, int]], pax: bool = True
) -> bytes:
    """Fixture twin of `parse_tar`: members are (name, data, typeflag,
    mtime); data is None for non-regular members.  Writes ustar magic,
    octal fields, the space-seeded checksum and the two terminator
    blocks — every seam `parse_tar` checks.  A name too long for the
    ustar name+prefix fields is carried in a preceding PAX 'x' header
    (`path=` record) when `pax` is true, else rejected."""
    def ustar_split(nb: bytes) -> tuple[bytes, bytes] | None:
        """(prefix, name) if nb fits the ustar 155+100 fields, else None."""
        if len(nb) <= 100:
            return b"", nb
        cut = nb[: len(nb) - 100].rfind(b"/")
        if cut < 0:
            return None
        prefix, rest = nb[:cut], nb[cut + 1 :]
        if len(rest) > 100 or len(prefix) > 155:
            return None
        return prefix, rest

    out = bytearray()
    expanded: list[tuple[str, bytes | None, str, int]] = []
    for name, data, typeflag, mtime in members:
        nb = name.encode("utf-8")
        if ustar_split(nb) is None and pax:
            payload = encode_pax_payload({"path": name})
            ph = "PaxHeaders/" + nb[:80].decode("utf-8", "ignore")
            expanded.append((ph, payload, "x", mtime))
            # byte-safe placeholder; parse_tar applies the pax path
            name = nb[:100].decode("utf-8", "ignore")
        expanded.append((name, data, typeflag, mtime))
    for name, data, typeflag, mtime in expanded:
        split = ustar_split(name.encode("utf-8"))
        if split is None:
            # a >100-byte basename cannot be stored in ustar; writing it
            # anyway would silently overwrite the mode/uid fields
            raise ValueError(f"tar name does not fit ustar fields: {name!r}")
        prefix, nb = split
        hdr = bytearray(_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        size = len(data) if data is not None else 0
        hdr[124:136] = b"%011o\x00" % size
        hdr[136:148] = b"%011o\x00" % mtime
        hdr[148:156] = b" " * 8
        hdr[156] = ord(typeflag)
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[345 : 345 + len(prefix)] = prefix
        chk = sum(hdr)
        hdr[148:156] = b"%06o\x00 " % chk
        out += hdr
        if data is not None:
            out += data
            pad = (-len(data)) % _BLOCK
            out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


TAR_SCHEMA = (
    "file string, member string, typeflag string, size int, mtime bigint,"
    " text string, n_chars int, data binary"
)


def tar_members(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per TAR member (regular-file
    payloads decoded as UTF-8 text, replacement on damage) — the
    warc/eml walker shape for the shard-container modality.  Archive
    bytes never shuffle."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        import gzip

        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "member": [], "typeflag": [], "size": [],
                "mtime": [], "text": [], "n_chars": [], "data": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    buf = bytes(content)
                    # transparent .tar.gz / .tar.zst containers
                    if buf[:2] == b"\x1f\x8b":
                        try:
                            buf = gzip.decompress(buf)
                        except Exception as exc:
                            raise ValueError(f"corrupt gzip: {exc}") from exc
                    elif buf[:4] == b"\x28\xb5\x2f\xfd":
                        from odin_rs_spark.sources.zstdcodec import (
                            zstd_decompress,
                        )

                        buf = zstd_decompress(buf)
                    members = parse_tar(buf)
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                for m in members:
                    text = (
                        m["data"].decode("utf-8", "replace")
                        if m["data"] is not None
                        else None
                    )
                    rows["file"].append(base)
                    rows["member"].append(m["name"])
                    rows["typeflag"].append(m["typeflag"])
                    rows["size"].append(m["size"])
                    rows["mtime"].append(m["mtime"])
                    rows["text"].append(text)
                    rows["n_chars"].append(
                        len(text) if text is not None else None
                    )
                    rows["data"].append(m["data"])
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, TAR_SCHEMA)


# ---------------------------------------------------------------------------
# ZIP members (stdlib zipfile, the officedoc.py pattern — ZIP needs no
# hand-rolled parser; the VALUE here is the walker shape + the named
# rejections for archive formats this engine does NOT decode).
# ---------------------------------------------------------------------------

_ARCHIVE_MAGICS: tuple[tuple[bytes, str], ...] = (
    # zstd left this list in r10: sources/zstdcodec decodes it for the
    # .warc.zst / .tar.zst container paths
    (b"7z\xbc\xaf\x27\x1c", "7z"),
    (b"Rar!\x1a\x07", "rar"),
    (b"\x42\x5a\x68", "bzip2"),
    (b"\xfd7zXZ\x00", "xz"),
)


def sniff_unsupported_archive(buf: bytes) -> None:
    """Raise a NAMED rejection when the bytes are an archive format
    this engine does not decode (the grib2 JPEG2000 discipline: a
    specific error names the format so an on_error='skip' pipeline
    can COUNT what it lost instead of mislabeling it corrupt)."""
    for magic, name in _ARCHIVE_MAGICS:
        if buf[: len(magic)] == magic:
            raise ValueError(f"unsupported archive format: {name}")


ZIP_SCHEMA = (
    "file string, member string, size int, compressed int, method string,"
    " text string, n_chars int"
)


# APPNOTE 4.4.5 method ids: store/deflate/bzip2/lzma decode through
# the stdlib zipfile; zstd (93) and xz (95) — the modern methods
# zipfiles increasingly carry — decode from the raw member stream via
# the in-repo RFC 8878 codec and stdlib lzma (r11). Other methods
# (imploded=6, deflate64=9, …) reject by number.
_ZIP_METHODS = {0: "store", 8: "deflate", 12: "bzip2", 14: "lzma",
                93: "zstd", 95: "xz"}
_ZIP_RAW_METHODS = (93, 95)


def _zip_raw_member(buf: bytes, info) -> bytes:
    """Raw compressed bytes of one member via its local header (the
    stdlib decompressor table has no zstd/xz entries)."""
    import struct as _struct

    off = info.header_offset
    if buf[off : off + 4] != b"PK\x03\x04":
        raise ValueError(f"bad local header for {info.filename!r}")
    name_len, extra_len = _struct.unpack_from("<HH", buf, off + 26)
    start = off + 30 + name_len + extra_len
    end = start + info.compress_size
    if end > len(buf):
        raise ValueError(f"member {info.filename!r} runs past the file")
    return buf[start:end]


def zip_members(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per ZIP member (text decoded as
    UTF-8 with replacement). Store/deflate/bzip2/lzma members on-path
    with the method labeled by APPNOTE number; other method ids reject
    by number; unsupported sibling formats (7z/rar/zstd/bzip2/xz)
    reject by name BEFORE zipfile sees them."""
    import io
    import zipfile

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "member": [], "size": [], "compressed": [],
                "method": [], "text": [], "n_chars": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                try:
                    sniff_unsupported_archive(buf)
                    zf = zipfile.ZipFile(io.BytesIO(buf))
                    infos = zf.infolist()
                    # encrypted members reject BY NAME (the pdf /Encrypt
                    # discipline) — zipfile would raise a RuntimeError
                    # that the generic wrap below would mislabel corrupt
                    for i in infos:
                        if i.flag_bits & 0x1:
                            raise ValueError(
                                f"encrypted ZIP member: {i.filename!r}"
                            )
                    # methods beyond what zipfile decodes reject by
                    # NUMBER (APPNOTE 4.4.5) instead of surfacing a
                    # zipfile RuntimeError mislabeled as corruption
                    for i in infos:
                        if not i.is_dir() and i.compress_type not in _ZIP_METHODS:
                            raise ValueError(
                                f"unsupported ZIP compression method "
                                f"{i.compress_type} in {i.filename!r}"
                            )
                    members = []
                    for i in infos:
                        if i.is_dir():
                            continue
                        if i.compress_type == 93:
                            from odin_rs_spark.sources.zstdcodec import (
                                zstd_decompress,
                            )

                            data = zstd_decompress(_zip_raw_member(buf, i))
                        elif i.compress_type == 95:
                            import lzma as _lzma

                            try:
                                data = _lzma.decompress(
                                    _zip_raw_member(buf, i)
                                )
                            except _lzma.LZMAError as exc:
                                raise ValueError(
                                    f"corrupt xz member: {exc}"
                                ) from exc
                        else:
                            data = zf.read(i.filename)
                        if len(data) != i.file_size:
                            raise ValueError(
                                f"member {i.filename!r} decodes to "
                                f"{len(data)} bytes, directory says "
                                f"{i.file_size}"
                            )
                        if i.compress_type in _ZIP_RAW_METHODS:
                            # zipfile's own read() checks CRC; the raw
                            # paths must too
                            import zlib as _zlib

                            if _zlib.crc32(data) != i.CRC:
                                raise ValueError(
                                    f"member {i.filename!r} CRC mismatch"
                                )
                        members.append((i, data))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                except Exception as exc:  # BadZipFile, zlib.error...
                    if on_error == "skip":
                        continue
                    raise ValueError(f"corrupt ZIP: {exc}") from exc
                base = os.path.basename(path)
                for info, data in members:
                    text = data.decode("utf-8", "replace")
                    rows["file"].append(base)
                    rows["member"].append(info.filename)
                    rows["size"].append(info.file_size)
                    rows["compressed"].append(info.compress_size)
                    rows["method"].append(_ZIP_METHODS[info.compress_type])
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, ZIP_SCHEMA)
