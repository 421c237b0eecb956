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


def parse_tar(buf: bytes) -> list[dict]:
    """TAR bytes → member dicts (name, size, mtime, typeflag, data for
    regular files, None otherwise) in archive order.  Verifies the
    ustar magic and every header checksum."""
    out: list[dict] = []
    i = 0
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
        if typeflag == "x" or typeflag == "g":
            raise ValueError("PAX extended headers unsupported")
        if typeflag == "L":
            raise ValueError("GNU long-name extension unsupported")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        size = _octal(hdr[124:136], "size")
        mtime = _octal(hdr[136:148], "mtime")
        i += _BLOCK
        data = None
        if typeflag in ("0", "\x00"):
            if i + size > len(buf):
                raise ValueError("tar member data truncated")
            data = buf[i : i + size]
            i += ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        out.append(
            {
                "name": name,
                "size": size,
                "mtime": mtime,
                "typeflag": "0" if typeflag == "\x00" else typeflag,
                "data": data,
            }
        )
    raise ValueError("tar ended without terminator blocks")


def encode_tar(members: list[tuple[str, bytes | None, str, int]]) -> bytes:
    """Fixture twin of `parse_tar`: members are (name, data, typeflag,
    mtime); data is None for non-regular members.  Writes ustar magic,
    octal fields, the space-seeded checksum and the two terminator
    blocks — every seam `parse_tar` checks."""
    out = bytearray()
    for name, data, typeflag, mtime in members:
        nb = name.encode("utf-8")
        prefix = b""
        if len(nb) > 100:
            cut = nb[: len(nb) - 100].rfind(b"/")
            if cut < 0:
                raise ValueError(f"tar name too long to split: {name!r}")
            prefix, nb = nb[:cut], nb[cut + 1 :]
        if len(nb) > 100 or len(prefix) > 155:
            # a >100-byte basename cannot be stored in ustar; writing it
            # anyway would silently overwrite the mode/uid fields
            raise ValueError(f"tar name does not fit ustar fields: {name!r}")
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
        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "member": [], "typeflag": [], "size": [],
                "mtime": [], "text": [], "n_chars": [], "data": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    members = parse_tar(bytes(content))
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
    (b"7z\xbc\xaf\x27\x1c", "7z"),
    (b"Rar!\x1a\x07", "rar"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
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


def zip_members(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per ZIP member (text decoded as
    UTF-8 with replacement). Stored and deflated members both on-path;
    unsupported sibling formats (7z/rar/zstd/bzip2/xz) reject by name
    BEFORE zipfile sees them."""
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
                    members = [
                        (i, zf.read(i.filename)) for i in infos
                        if not i.is_dir()
                    ]
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
                    rows["method"].append(
                        "deflate" if info.compress_type == 8 else "store"
                    )
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, ZIP_SCHEMA)
