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


def _mulaw_expand_table() -> np.ndarray:
    """G.711 §4.1 mu-law decoder table (256 → int16): u = ~code;
    magnitude = ((mantissa·8 + 0x84) << exponent) − 0x84 — the exact
    integer formula, so every expanded sample is SQL-replayable with
    bit arithmetic (the q172 oracle recomputes it)."""
    codes = np.arange(256, dtype=np.int64)
    u = ~codes & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant * 8 + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


MULAW_TABLE = _mulaw_expand_table()


def _alaw_expand_table() -> np.ndarray:
    """G.711 A-law decoder table (256 -> int16, canonical alaw2linear):
    a = code XOR 0x55; seg = (a >> 4) & 7; t = (a & 0xF) << 4;
    magnitude = t+8 (seg 0), t+0x108 (seg 1), (t+0x108) << (seg-1)
    otherwise; the sign bit (a & 0x80) marks POSITIVE in A-law. All
    integer arithmetic, SQL-replayable (the q173 oracle recomputes
    it)."""
    codes = np.arange(256, dtype=np.int64)
    a = codes ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    mag = np.where(
        seg == 0, t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where((a & 0x80) != 0, mag, -mag).astype(np.int16)


ALAW_TABLE = _alaw_expand_table()

# A-law magnitudes are all nonzero, so the 256 table values are
# distinct and the codec is exactly invertible on its own outputs
_ALAW_INVERSE = {int(v): c for c, v in enumerate(ALAW_TABLE)}


def alaw_compress(samples: np.ndarray) -> np.ndarray:
    """Exact inverse of ALAW_TABLE on codec outputs (fixture twin —
    fixtures synthesize from table values; anything else raises)."""
    out = np.empty(len(samples), dtype=np.uint8)
    for i, v in enumerate(np.asarray(samples, dtype=np.int64)):
        try:
            out[i] = _ALAW_INVERSE[int(v)]
        except KeyError:
            raise ValueError(f"{v} is not an A-law codec output value")
    return out


def encode_wav_alaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n,) or (n, ch) int16 A-law table values -> A-law (format tag
    6) WAV bytes — the fixture twin of decode_wav's A-law path."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = alaw_compress(a.reshape(-1)).tobytes()
    fmt = struct.pack("<HHIIHH", 6, ch, rate, rate * ch, ch, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def mulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 → mu-law bytes (G.711 encoder twin — fixture generation):
    clamp to ±8158-ish per spec (±32635 input, bias 0x84), find the
    exponent segment, pack sign/exponent/mantissa, complement."""
    x = np.asarray(samples, dtype=np.int64)
    sign = (x < 0).astype(np.int64)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    code = (sign << 7) | (exp << 4) | mant
    return (~code & 0xFF).astype(np.uint8)


def encode_wav_mulaw(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n,) or (n, ch) int16 → mu-law (format tag 7) WAV bytes — the
    fixture twin of decode_wav's mu-law path."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = mulaw_compress(a.reshape(-1)).tobytes()
    fmt = struct.pack("<HHIIHH", 7, ch, rate, rate * ch, ch, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 array (n_samples, channels)).
    8-bit unsigned PCM maps to (v - 128) * 256 so full-scale 8-bit and
    16-bit audio lands on one int16 scale; G.711 mu-law (format tag 7)
    expands through the exact spec table. Raises ValueError on any
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
    if audio_fmt not in (1, 6, 7):
        raise ValueError(
            f"WAV format tag {audio_fmt} unsupported (PCM=1 / A-law=6 / mu-law=7)"
        )
    if ch < 1:
        raise ValueError("zero channels")
    if audio_fmt in (6, 7):  # G.711: 8-bit companded telephony speech
        if bits != 8:
            raise ValueError(f"G.711 requires 8-bit samples, got {bits}")
        n = len(data) // ch
        raw = np.frombuffer(data[: n * ch], dtype=np.uint8).reshape(n, ch)
        a = (ALAW_TABLE if audio_fmt == 6 else MULAW_TABLE)[raw]
    elif bits == 16:
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
