"""Pure-stdlib AVI (RIFF) video CONTAINER codec (SURVEY §2.12
multimodal — the video twin of `sources/audiocodec.py`/`imagecodec.py`:
frame DECODE needs codecs this container doesn't have, but the RIFF
container layout is a public spec and a struct walk, so the frame
INDEX — count, byte offsets, sizes, keyframe flags, fps, dimensions —
is real. That index is exactly what a video training pipeline needs
before any decode: frame sampling (every Nth / keyframes only) becomes
byte-range slicing, and the per-frame payload hands off to the
`_decode_backend` seam).

Layout walked: RIFF 'AVI ' → LIST 'hdrl' {avih main header, LIST
'strl' {strh stream header, strf format}} → LIST 'movi' {##dc/##db
frame chunks} → 'idx1' index (ckid, flags, offset-relative-to-movi,
size). Word alignment honored (odd chunks carry a pad byte). Anything
malformed raises ValueError with the offending chunk named.
"""

from __future__ import annotations

import struct

AVIIF_KEYFRAME = 0x10


def encode_avi(
    frame_sizes: list[int] | None = None,
    width: int = 320,
    height: int = 240,
    fps: int = 25,
    keyframe_every: int = 5,
    payloads: list[bytes] | None = None,
) -> bytes:
    """Minimal single-video-stream AVI with fake (deterministic) frame
    payloads of the given sizes — the fixture twin of
    `parse_avi_index`. Frame i's payload is bytes (i*7+j) % 256; every
    `keyframe_every`-th frame is flagged AVIIF_KEYFRAME in idx1.
    Passing `payloads` instead embeds REAL frame bytes (e.g. baseline
    JPEGs from sources/jpegcodec → a true MJPG clip that
    `video_decode_frames` can decode end to end)."""
    if (frame_sizes is None) == (payloads is None):
        raise ValueError("pass exactly one of frame_sizes / payloads")
    if frame_sizes is None:
        frame_sizes = [len(p) for p in payloads]
    n = len(frame_sizes)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        inner = kind + body
        return b"LIST" + struct.pack("<I", len(inner)) + inner + (
            b"\x00" if len(inner) % 2 else b""
        )

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    frames = []
    for i, sz in enumerate(frame_sizes):
        payload = (
            payloads[i]
            if payloads is not None
            else bytes((i * 7 + j) % 256 for j in range(sz))
        )
        frames.append(chunk(b"00dc", payload))
    movi_body = b"".join(frames)
    movi = lst(b"movi", movi_body)

    # idx1 offsets are relative to the position of the 'movi' fourcc
    idx_entries = []
    off = 4  # first chunk starts right after the 'movi' kind fourcc
    for i, sz in enumerate(frame_sizes):
        flags = AVIIF_KEYFRAME if i % keyframe_every == 0 else 0
        idx_entries.append(b"00dc" + struct.pack("<III", flags, off, sz))
        off += 8 + sz + (sz & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_index(buf: bytes) -> dict:
    """AVI bytes → {"width", "height", "fps_micro" (µs per frame),
    "total_frames", "frames": [(frame_no, offset_abs, size, keyframe)]}
    where offset_abs is the absolute byte offset of the frame chunk
    HEADER in the file — slice buf[offset+8 : offset+8+size] for the
    payload. Raises ValueError on malformed structure."""
    try:
        return _parse_avi_index(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt AVI file: {exc}") from exc


def _parse_avi_index(buf: bytes) -> dict:
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_len,) = struct.unpack("<I", buf[4:8])
    end = min(len(buf), 8 + riff_len)

    avih = None
    movi_pos = None  # absolute offset of the 'movi' fourcc
    idx1 = None
    pos = 12
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if pos + 8 + ln > end:
            raise ValueError(f"chunk {tag!r} runs past the file")
        if tag == b"LIST":
            kind = buf[pos + 8 : pos + 12]
            if kind == b"movi":
                movi_pos = pos + 8
            elif kind == b"hdrl":
                # walk the header list for avih
                hp = pos + 12
                hend = pos + 8 + ln
                while hp + 8 <= hend:
                    htag = buf[hp : hp + 4]
                    (hln,) = struct.unpack("<I", buf[hp + 4 : hp + 8])
                    if htag == b"avih":
                        if hln < 40:
                            raise ValueError("avih header too short")
                        avih = struct.unpack(
                            "<10I", buf[hp + 8 : hp + 48]
                        )
                    hp += 8 + hln + (hln & 1)
        elif tag == b"idx1":
            idx1 = buf[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)

    if avih is None:
        raise ValueError("missing avih main header")
    if movi_pos is None:
        raise ValueError("missing movi list")
    if idx1 is None:
        raise ValueError("missing idx1 index (unindexed AVI unsupported)")

    frames = []
    fno = 0
    for i in range(0, len(idx1) - 15, 16):
        ckid = idx1[i : i + 4]
        flags, off, size = struct.unpack("<III", idx1[i + 4 : i + 16])
        if ckid[2:4] not in (b"dc", b"db"):
            continue  # audio/other stream entries
        abs_off = movi_pos + off
        if abs_off + 8 + size > len(buf):
            raise ValueError(f"idx1 entry {fno} points past the file")
        if buf[abs_off : abs_off + 4] != ckid:
            raise ValueError(f"idx1 entry {fno} ckid mismatch at {abs_off}")
        frames.append((fno, abs_off, size, bool(flags & AVIIF_KEYFRAME)))
        fno += 1
    return {
        "fps_micro": avih[0],
        "total_frames": avih[4],
        "width": avih[8],
        "height": avih[9],
        "frames": frames,
    }
