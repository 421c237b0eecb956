"""WAV codec (sources/audiocodec.py) + audio multimodal operators:
hand-packed RIFF bytes pin the wire layout; roundtrips, 8-bit scaling,
chunk-walk padding, corruption contract, and the Spark stats/silence
kernels on planted signals."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from odin_rs_spark.sources.audiocodec import decode_wav, encode_wav


def test_hand_packed_wav_bytes():
    """Derive a minimal 16-bit mono WAV byte-by-byte from the RIFF spec
    and decode it — no encoder involved."""
    samples = struct.pack("<4h", 100, -200, 300, 0)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 8) + samples
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, a = decode_wav(buf)
    assert rate == 8000
    assert a.shape == (4, 1)
    assert a[:, 0].tolist() == [100, -200, 300, 0]


def test_roundtrip_mono_stereo():
    mono = (np.arange(100, dtype=np.int16) * 31 - 1500).astype(np.int16)
    rate, a = decode_wav(encode_wav(mono, rate=22050))
    assert rate == 22050 and np.array_equal(a[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, b = decode_wav(encode_wav(stereo, rate=44100))
    assert rate == 44100 and b.shape == (100, 2)
    assert np.array_equal(b, stereo)


def test_8bit_centered_to_int16_scale():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    body = b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 3) + data + b"\x00"  # odd -> pad
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    _, a = decode_wav(buf)
    assert a[:, 0].tolist() == [-32768, 0, 32512]  # (v-128)*256


def test_unknown_chunks_skipped_with_padding():
    """An odd-sized LIST chunk before fmt/data must be skipped with its
    pad byte, or the walk desynchronizes."""
    inner = encode_wav(np.array([5, -5, 7], dtype=np.int16))
    # rebuild with a 3-byte junk chunk injected after 'WAVE'
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    body = junk + inner[12:]
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    _, a = decode_wav(buf)
    assert a[:, 0].tolist() == [5, -5, 7]


def test_corrupt_raises_valueerror():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOPE" + b"\x00" * 40)
    good = encode_wav(np.zeros(8, dtype=np.int16))
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(good[:12])  # header only
    # non-PCM format tag
    bad = bytearray(good)
    bad[20] = 3  # fmt tag -> IEEE float
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(bad))
    # truncated data chunk: declared length past the file
    trunc = bytearray(good)
    struct.pack_into("<I", trunc, 40, 10_000)
    with pytest.raises(ValueError, match="runs past"):
        decode_wav(bytes(trunc))


def test_audio_stats_exact(spark):
    from odin_rs_spark.operators import multimodal as mm

    s = np.array([10, -10, 10, -10, 0, 0, 300], dtype=np.int16)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, rate=16000)))],
        "media_id long, content binary",
    )
    r = mm.audio_stats(media).collect()[0]
    assert (r.rate, r.channels, r.n_samples, r.peak) == (16000, 1, 7, 300)
    assert r.mean_abs == (10 * 4 + 300) / 7
    # nonzero signs: + - + - + -> 4 changes; zeros don't double-count
    assert r.zero_crossings == 4


def test_audio_silence_windows_planted(spark):
    from odin_rs_spark.operators import multimodal as mm

    s = np.concatenate(
        [np.full(256, 500), np.zeros(256), np.full(256, -2000), np.full(100, 9)]
    ).astype(np.int16)
    media = spark.createDataFrame(
        [(7, bytearray(encode_wav(s)))], "media_id long, content binary"
    )
    rows = {r.win: r for r in
            mm.audio_silence_windows(media, window=256, threshold=100.0).collect()}
    assert set(rows) == {0, 1, 2}  # trailing partial frame dropped
    assert rows[0].is_silent == 0 and rows[0].mean_abs == 500.0
    assert rows[1].is_silent == 1 and rows[1].mean_abs == 0.0
    assert rows[2].is_silent == 0 and rows[2].mean_abs == 2000.0


def test_audio_fingerprint_gain_invariance_and_grouping(spark):
    """The energy-delta signature must survive positive gain scaling
    (volume-normalized duplicates collide) and must differ once the
    energy ORDER changes; unequal window counts never collide."""
    from odin_rs_spark.operators import multimodal as mm

    base = np.concatenate(
        [np.full(256, 100), np.full(256, 300), np.full(256, 200)]
    ).astype(np.int16)
    louder = (base * 2).astype(np.int16)  # exact integer gain
    reordered = np.concatenate(
        [np.full(256, 300), np.full(256, 100), np.full(256, 200)]
    ).astype(np.int16)
    longer = np.concatenate([base, np.full(256, 50)]).astype(np.int16)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(base))),
            (2, bytearray(encode_wav(louder))),
            (3, bytearray(encode_wav(reordered))),
            (4, bytearray(encode_wav(longer))),
        ],
        "media_id long, content binary",
    )
    fps = {r.media_id: (r.fingerprint, r.n_windows)
           for r in mm.audio_fingerprint(media, window=256).collect()}
    assert fps[1] == fps[2]          # gain-invariant duplicate
    assert fps[1][0] != fps[3][0]    # different energy order
    assert fps[1][1] != fps[4][1]    # length rides the key
    groups = mm.audio_near_dup_groups(
        mm.audio_fingerprint(media, window=256)
    ).collect()
    dup = [g for g in groups if g.n_clips == 2]
    assert len(dup) == 1 and dup[0].keeper_id == 1


def test_audio_resample_linear_semantics(spark):
    """Identity at the same rate, pure decimation at 2:1, exact linear
    midpoints at 1:2 upsampling — the rational-position contract."""
    from odin_rs_spark.operators import multimodal as mm

    s = np.array([0, 100, 50, -50, 200, 0, 10, 30], dtype=np.int16)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, rate=8000)))], "media_id long, content binary"
    )

    def resampled(dst):
        r = mm.audio_resample_linear(media, dst_rate=dst).collect()[0]
        rate, a = decode_wav(bytes(r.content))
        return rate, a[:, 0].tolist()

    rate, same = resampled(8000)
    # identity round-trips ALL n samples (ADVICE r6: the old
    # (n-2)-based bound dropped the last one)
    assert rate == 8000 and same == s.tolist()
    _, half = resampled(4000)
    assert half == s[::2][: len(half)].tolist()  # decimation hits source samples
    _, dbl = resampled(16000)
    # even j hit source samples, odd j are exact midpoints (floor(x+.5));
    # the last dst sample lands exactly ON the last source sample
    assert dbl[0] == 0 and dbl[1] == 50 and dbl[2] == 100 and dbl[3] == 75
    assert len(dbl) == 15 and dbl[-1] == s[-1]


def test_mulaw_table_matches_g711_reference():
    """G.711 mu-law expand: canonical g711.c values (code 0x00 →
    −32124, 0x80 → +32124, 0x7F/0xFF → 0) and exhaustive equality
    against the reference ulaw2linear formula."""
    from odin_rs_spark.sources.audiocodec import MULAW_TABLE, mulaw_compress

    def ref(u):
        u = ~u & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    for code in range(256):
        assert MULAW_TABLE[code] == ref(code), code
    # compress∘expand is identity on codec fixed points
    codes = np.arange(256, dtype=np.uint8)
    expanded = MULAW_TABLE[codes]
    assert np.array_equal(MULAW_TABLE[mulaw_compress(expanded)], expanded)


def test_mulaw_wav_roundtrip_and_pipeline(spark):
    from odin_rs_spark.operators import multimodal as mm
    from odin_rs_spark.sources.audiocodec import (
        MULAW_TABLE,
        decode_wav,
        encode_wav_mulaw,
    )

    s = MULAW_TABLE[(np.arange(400) * 29) % 256].astype(np.int16)
    buf = encode_wav_mulaw(s, rate=8000)
    rate, a = decode_wav(buf)
    assert rate == 8000 and np.array_equal(a[:, 0], s)
    # the existing audio operators accept mu-law clips unchanged
    media = spark.createDataFrame(
        [(1, bytearray(buf))], "media_id long, content binary"
    )
    st = mm.audio_stats(media).first()
    assert st.n_samples == 400 and st.peak == int(np.abs(s).max())
    # stereo + error contract
    st2 = np.stack([s[:100], -s[:100]], axis=1)
    r2, a2 = decode_wav(encode_wav_mulaw(st2, rate=16000))
    assert (r2, a2.shape) == (16000, (100, 2)) and np.array_equal(a2, st2)
    import struct as _struct

    bad = bytearray(encode_wav_mulaw(s))
    # force bits=16 in the fmt chunk of a mu-law file
    bad[34:36] = _struct.pack("<H", 16)
    with pytest.raises(ValueError, match="G.711 requires 8-bit"):
        decode_wav(bytes(bad))


def test_alaw_table_matches_g711_reference(spark):
    from odin_rs_spark.operators import multimodal as mm
    from odin_rs_spark.sources.audiocodec import (
        ALAW_TABLE,
        decode_wav,
        encode_wav_alaw,
    )

    def ref(code):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a >> 4) & 7
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    for c in range(256):
        assert ALAW_TABLE[c] == ref(c), c
    # all 256 values distinct -> the codec is exactly invertible
    assert len({int(v) for v in ALAW_TABLE}) == 256

    s = ALAW_TABLE[(np.arange(350) * 23) % 256].astype(np.int16)
    rate, a = decode_wav(encode_wav_alaw(s, rate=8000))
    assert rate == 8000 and np.array_equal(a[:, 0], s)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav_alaw(s)))], "media_id long, content binary"
    )
    st = mm.audio_stats(media).first()
    assert st.n_samples == 350 and st.peak == int(np.abs(s).max())
