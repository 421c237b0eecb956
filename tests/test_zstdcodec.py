"""Pure-Python zstd decoder (RFC 8878): pinned against REAL reference-
encoder output (committed fixtures produced by the zstd CLI — Huffman
with FSE-compressed weights, custom FSE sequence tables, 4-stream
literals, repeat offsets), the store-mode encoder twin, xxhash64 known
vectors, and the fuzz discipline. When the reference CLI is present,
an extra property sweep cross-checks live at several levels."""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import sys

import pytest

import odin_rs_spark
from odin_rs_spark.sources.zstdcodec import (
    xxh64,
    zstd_compress_store,
    zstd_decompress,
)

FIX = os.path.join(
    os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
    "sources", "fixtures",
)
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(odin_rs_spark.__file__))),
    "tools",
))

_ZSTD_CLI = shutil.which("zstd") or (
    "/root/miniconda/bin/zstd"
    if os.path.exists("/root/miniconda/bin/zstd")
    else None
)


def test_xxh64_known_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # >32 bytes exercises the 4-lane path
    assert xxh64(b"a" * 101) == xxh64(b"a" * 101)  # determinism
    assert xxh64(b"a" * 101) != xxh64(b"a" * 100)


def test_store_mode_roundtrip_and_checksum():
    for payload in (b"", b"x", b"hello" * 1000, bytes(range(256)) * 600):
        frame = zstd_compress_store(payload)
        assert zstd_decompress(frame) == payload
    # checksum verification is real: corrupt the payload byte
    frame = bytearray(zstd_compress_store(b"checksum me"))
    frame[-6] ^= 0x01  # inside the raw block
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(frame))


def test_committed_reference_fixture_decodes():
    """Level-19 CLI output: FSE-compressed Huffman weights, custom
    sequence tables, 4-stream literals, repeat offsets — every entropy
    path, pinned against the reference encoder not our own twin."""
    from gen_zstd_fixtures import formula_text

    comp = open(os.path.join(FIX, "formula_text_l19.zst"), "rb").read()
    assert zstd_decompress(comp) == formula_text()


def test_warc_zst_container_with_skippable_frame():
    from odin_rs_spark.sources.warc import parse_warc

    buf = open(os.path.join(FIX, "records.warc.zst"), "rb").read()
    assert struct.unpack("<I", buf[:4])[0] == 0x184D2A5D  # skippable lead
    recs = parse_warc(buf)
    assert len(recs) == 31
    assert recs[0]["headers"]["warc-type"] == "warcinfo"
    assert recs[1]["headers"]["warc-target-uri"] == "https://zs0.example.org/d/0"


def test_multiframe_and_dictionary_rejection():
    a = zstd_compress_store(b"one ")
    b = zstd_compress_store(b"two")
    assert zstd_decompress(a + b) == b"one two"
    # dictionary frames reject by id: descriptor (single segment,
    # dict-id flag 1) + dict id 9 + 1-byte FCS + raw last block
    raw = (struct.pack("<I", 0xFD2FB528)
           + bytes([0x20 | 0x01]) + bytes([9]) + bytes([1])
           + (1 | (0 << 1) | (1 << 3)).to_bytes(3, "little") + b"z")
    with pytest.raises(ValueError, match="dictionary"):
        zstd_decompress(raw)


def test_window_and_output_bounds():
    frame = zstd_compress_store(b"payload " * 100)
    with pytest.raises(ValueError, match="max_output"):
        zstd_decompress(frame, max_output=10)
    # non-single-segment window beyond cap rejects
    hdr = struct.pack("<I", 0xFD2FB528) + bytes([0x00]) + bytes([0xF8])
    with pytest.raises(ValueError, match="max_window"):
        zstd_decompress(hdr + b"\x00" * 8, max_window=1 << 20)


def test_truncation_and_mutation_fuzz_valueerror_only():
    comp = open(os.path.join(FIX, "formula_text_l19.zst"), "rb").read()
    for cut in range(0, len(comp), 17):
        try:
            zstd_decompress(comp[:cut])
        except ValueError:
            pass
    for pos in range(0, len(comp), 7):
        mb = bytearray(comp)
        mb[pos] ^= 0xFF
        try:
            zstd_decompress(bytes(mb))
        except ValueError:
            pass


@pytest.mark.skipif(_ZSTD_CLI is None, reason="no reference zstd CLI")
def test_live_cli_property_sweep():
    """When the reference encoder is available, decode its output at
    several levels over text/binary/repetitive payloads."""
    payloads = [
        b"the quick brown fox jumps over the lazy dog " * 80,
        bytes(range(256)) * 64,
        b"ababababab" * 1000 + b"unique tail",
        open(os.path.join(FIX, "..", "..", "..", "SURVEY.md"), "rb").read(),
    ]
    for lvl in (1, 5, 19):
        for t in payloads:
            comp = subprocess.run(
                [_ZSTD_CLI, f"-{lvl}", "-c"], input=t, capture_output=True,
                check=True,
            ).stdout
            assert zstd_decompress(comp) == t
    # --no-check variant (no content checksum)
    nc = subprocess.run(
        [_ZSTD_CLI, "-3", "--no-check", "-c"], input=b"xyz" * 500,
        capture_output=True, check=True,
    ).stdout
    assert zstd_decompress(nc) == b"xyz" * 500


def test_tar_zst_container(spark, tmp_path):
    """.tar.zst shards decode transparently through tar_members."""
    from odin_rs_spark.sources.archive import encode_tar, tar_members

    tar = encode_tar([
        ("docs/a.txt", b"hello zstd tar", "0", 1000),
        ("docs/b.txt", b"second member", "0", 1001),
    ])
    p = tmp_path / "shard.tar.zst"
    p.write_bytes(zstd_compress_store(tar))
    rows = tar_members(
        spark.read.format("binaryFile").load(str(p))
    ).collect()
    got = {r.member: r.text for r in rows}
    assert got == {"docs/a.txt": "hello zstd tar",
                   "docs/b.txt": "second member"}


def test_literal_expansion_respects_max_output():
    """RLE/raw literals alone must not blow past max_output (the
    3-byte-header-to-1MiB expansion class)."""
    frame = zstd_compress_store(b"A" * 50000, with_checksum=False)
    with pytest.raises(ValueError, match="max_output"):
        zstd_decompress(frame, max_output=100)
