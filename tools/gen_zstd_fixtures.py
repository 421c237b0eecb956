"""Generate the committed zstd fixtures with the REFERENCE encoder
(`zstd` CLI), so sources/zstdcodec.py is pinned against real encoder
output — Huffman with FSE-compressed weights, custom FSE sequence
tables, 4-stream literals, repeat offsets — not against itself.

Run from the repo root:  python tools/gen_zstd_fixtures.py
Deterministic: the payloads are formula text; re-running with the same
zstd version reproduces the same bytes (version drift only changes the
compressed form, which the tests never pin — they pin the DECODED
text against the formula)."""

from __future__ import annotations

import os
import struct
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark", "sources", "fixtures",
)
ZSTD = os.environ.get("ZSTD_BIN", "/root/miniconda/bin/zstd")


def formula_text(n_lines: int = 400) -> bytes:
    """The deterministic payload both the generator and the tests
    regenerate."""
    lines = []
    for i in range(n_lines):
        words = [f"w{(i * 17 + j * 5) % 97}" for j in range(6 + i % 9)]
        lines.append(f"line {i:04d}: " + " ".join(words))
    return ("\n".join(lines) + "\n").encode()


def warc_payload() -> bytes:
    from odin_rs_spark.sources.warc import encode_http_response, encode_warc

    recs = [{"warc_type": "warcinfo", "block": b"software: zst-fixture\r\n"}]
    for g in range(30):
        body = " ".join(f"zs{(g * 7 + j) % 23}" for j in range(4 + g % 5))
        recs.append(
            {
                "warc_type": "response",
                "target_uri": f"https://zs{g % 3}.example.org/d/{g}",
                "content_type": "application/http; msgtype=response",
                "block": encode_http_response(body.encode()),
            }
        )
    return encode_warc(recs, gzip_members=False)


def compress(data: bytes, level: int) -> bytes:
    p = subprocess.run([ZSTD, f"-{level}", "-c"], input=data,
                       capture_output=True, check=True)
    return p.stdout


def main() -> None:
    text = formula_text()
    open(os.path.join(FIX, "formula_text_l19.zst"), "wb").write(
        compress(text, 19)
    )
    # .warc.zst with a leading SKIPPABLE frame (the iipc dictionary
    # slot, here carrying junk the decoder must step over)
    skippable = struct.pack("<II", 0x184D2A5D, 12) + b"not-a-dict!!"
    open(os.path.join(FIX, "records.warc.zst"), "wb").write(
        skippable + compress(warc_payload(), 9)
    )
    print("fixtures written to", FIX)


if __name__ == "__main__":
    main()
