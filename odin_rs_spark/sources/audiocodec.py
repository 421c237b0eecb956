"""Pure-stdlib WAV (RIFF PCM) audio codec (SURVEY §2.12 multimodal —
the audio twin of `sources/imagecodec.py`: the container has no
soundfile/librosa, but RIFF PCM is a public spec and a struct walk, so
the byte path is REAL and the multimodal audio operators run on actual
samples; lossy codecs (MP3/AAC/Opus) remain the documented
`_decode_backend` seam).

Format scope: RIFF/WAVE with a PCM `fmt ` chunk (format tag 1),
8-bit unsigned or 16-bit signed little-endian samples, any channel
count and rate. Chunk walking honors the spec's word alignment (odd
chunk sizes consume a pad byte). Everything else raises ValueError
with the offending tag/field named — one catchable type per corrupt
clip (the image/grib decode contract).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 samples → WAV bytes (PCM16-LE). The encode
    twin of `decode_wav` — fixture generation + an export sink."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 array (n_samples, channels)).
    8-bit unsigned clips map to (v - 128) * 256 so full-scale 8-bit and
    16-bit audio lands on one int16 scale. Raises ValueError on any
    malformed structure."""
    try:
        return _decode_wav(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError, reshape…
        raise ValueError(f"corrupt WAV file: {exc}") from exc


def _decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", buf[4:8])
    end = min(len(buf), 8 + riff_len)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError(f"chunk {tag!r} runs past the file")
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        # word alignment: odd-sized chunks carry one pad byte (RIFF spec)
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"WAV format tag {audio_fmt} unsupported (PCM only)")
    if ch < 1:
        raise ValueError("zero channels")
    if bits == 16:
        n = len(data) // (2 * ch)
        a = np.frombuffer(data[: n * 2 * ch], dtype="<i2").reshape(n, ch)
        a = a.astype(np.int16)
    elif bits == 8:
        n = len(data) // ch
        raw = np.frombuffer(data[: n * ch], dtype=np.uint8).reshape(n, ch)
        a = ((raw.astype(np.int16) - 128) * 256).astype(np.int16)
    else:
        raise ValueError(f"{bits}-bit PCM unsupported (8/16 only)")
    return int(rate), a
