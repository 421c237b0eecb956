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
    audio=None,
    audio_rate: int = 8000,
    audio_chunks: int = 4,
) -> bytes:
    """Minimal AVI with fake (deterministic) frame payloads of the
    given sizes — the fixture twin of `parse_avi_index`. Frame i's
    payload is bytes (i*7+j) % 256; every `keyframe_every`-th frame is
    flagged AVIIF_KEYFRAME in idx1. Passing `payloads` instead embeds
    REAL frame bytes (e.g. baseline JPEGs from sources/jpegcodec → a
    true MJPG clip that `video_decode_frames` can decode end to end).
    Passing `audio` (int16 samples, (n,) or (n, ch)) adds a second
    stream — 'auds' strh + WAVEFORMATEX strf, PCM16 '01wb' chunks
    interleaved among the frames in `audio_chunks` slices — the
    fixture twin of `parse_avi_audio`."""
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

    a = None
    if audio is not None:
        import numpy as np

        a = np.asarray(audio, dtype="<i2")
        if a.ndim == 1:
            a = a[:, None]

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        2 if a is not None else 1,  # dwStreams
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
    strls = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    if a is not None:
        n_samp, ch = a.shape
        astrh = (
            b"auds" + b"\x00\x00\x00\x00"
            + struct.pack(
                "<IHHIIIIIIII", 0, 0, 0, 0, 1, audio_rate, 0, n_samp, 0, 0, 0
            )
            + struct.pack("<hhhh", 0, 0, 0, 0)
        )
        astrf = struct.pack(  # WAVEFORMATEX, PCM16
            "<HHIIHH", 1, ch, audio_rate, audio_rate * ch * 2, ch * 2, 16
        )
        strls += lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)

    # movi chunk sequence: video frames with audio slices interleaved
    seq = []  # (ckid, payload, flags)
    slices = []
    if a is not None:
        k = max(1, min(audio_chunks, len(a)))
        bounds = [len(a) * i // k for i in range(k + 1)]
        slices = [
            a[bounds[i] : bounds[i + 1]].reshape(-1).tobytes()
            for i in range(k)
        ]
    every = max(1, (n + len(slices)) // (len(slices) + 1)) if slices else 0
    si = 0
    for i, sz in enumerate(frame_sizes):
        payload = (
            payloads[i]
            if payloads is not None
            else bytes((i * 7 + j) % 256 for j in range(sz))
        )
        flags = AVIIF_KEYFRAME if i % keyframe_every == 0 else 0
        seq.append((b"00dc", payload, flags))
        if slices and si < len(slices) and (i + 1) % every == 0:
            seq.append((b"01wb", slices[si], 0))
            si += 1
    while si < len(slices):  # whatever interleaving left over, append
        seq.append((b"01wb", slices[si], 0))
        si += 1

    movi_body = b"".join(chunk(t, p) for t, p, _ in seq)
    movi = lst(b"movi", movi_body)

    # idx1 offsets are relative to the position of the 'movi' fourcc
    idx_entries = []
    off = 4  # first chunk starts right after the 'movi' kind fourcc
    for t, p, flags in seq:
        idx_entries.append(t + struct.pack("<III", flags, off, len(p)))
        off += 8 + len(p) + (len(p) & 1)
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


def parse_avi_audio(buf: bytes):
    """AVI bytes → (rate, channels, int16 samples (n, ch)) demuxed
    from the first 'auds' stream (PCM16 only — WAVEFORMATEX tag 1,
    16 bits): walk hdrl for the audio strh/strf, then gather that
    stream's '##wb' chunks in idx1 order. Raises ValueError when the
    file has no audio stream or a non-PCM16 one."""
    try:
        return _parse_avi_audio(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError…
        raise ValueError(f"corrupt AVI file: {exc}") from exc


def _parse_avi_audio(buf: bytes):
    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_len,) = struct.unpack("<I", buf[4:8])
    end = min(len(buf), 8 + riff_len)

    movi_pos = None
    idx1 = None
    streams = []  # (fccType, strf bytes) in stream order
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
                hp, hend = pos + 12, pos + 8 + ln
                while hp + 8 <= hend:
                    htag = buf[hp : hp + 4]
                    (hln,) = struct.unpack("<I", buf[hp + 4 : hp + 8])
                    if htag == b"LIST" and buf[hp + 8 : hp + 12] == b"strl":
                        fcc = None
                        strf = None
                        sp, send = hp + 12, hp + 8 + hln
                        while sp + 8 <= send:
                            stag = buf[sp : sp + 4]
                            (sln,) = struct.unpack("<I", buf[sp + 4 : sp + 8])
                            if stag == b"strh":
                                fcc = buf[sp + 8 : sp + 12]
                            elif stag == b"strf":
                                strf = buf[sp + 8 : sp + 8 + sln]
                            sp += 8 + sln + (sln & 1)
                        streams.append((fcc, strf))
                    hp += 8 + hln + (hln & 1)
        elif tag == b"idx1":
            idx1 = buf[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)

    aud = [(i, s) for i, (t, s) in enumerate(streams) if t == b"auds"]
    if not aud:
        raise ValueError("no audio stream in AVI")
    sno, strf = aud[0]
    if strf is None or len(strf) < 16:
        raise ValueError("audio stream missing WAVEFORMATEX strf")
    wtag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", strf[:16])
    if wtag != 1 or bits != 16:
        raise ValueError(f"unsupported audio format tag={wtag} bits={bits}")
    if movi_pos is None or idx1 is None:
        raise ValueError("missing movi list or idx1 index")

    ck = f"{sno:02d}".encode() + b"wb"
    parts = []
    for i in range(0, len(idx1) - 15, 16):
        if idx1[i : i + 4] != ck:
            continue
        _fl, off, size = struct.unpack("<III", idx1[i + 4 : i + 16])
        abs_off = movi_pos + off
        if abs_off + 8 + size > len(buf):
            raise ValueError("audio idx1 entry points past the file")
        parts.append(buf[abs_off + 8 : abs_off + 8 + size])
    raw = b"".join(parts)
    if len(raw) % (2 * ch):
        raise ValueError("audio byte stream not a whole number of samples")
    return rate, ch, np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
