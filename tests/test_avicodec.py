"""AVI container codec (sources/avicodec.py) + video frame-index
operator: layout roundtrip, idx1 cross-validation, corruption
contract, odd-size padding, and the Spark index walk."""

from __future__ import annotations

import struct

import pytest

from odin_rs_spark.sources.avicodec import encode_avi, parse_avi_index


def test_roundtrip_index_and_payloads():
    sizes = [100, 33, 250, 7, 64]
    buf = encode_avi(sizes, width=64, height=48, fps=30, keyframe_every=3)
    g = parse_avi_index(buf)
    assert (g["width"], g["height"], g["fps_micro"], g["total_frames"]) == (
        64, 48, 33333, 5,
    )
    assert [f[2] for f in g["frames"]] == sizes
    assert [f[3] for f in g["frames"]] == [True, False, False, True, False]
    # payload slicing: offset points at the chunk header; +8 is data
    fno, off, size, _ = g["frames"][2]
    assert buf[off + 8 : off + 8 + size] == bytes(
        (2 * 7 + j) % 256 for j in range(250)
    )


def test_odd_frame_sizes_pad_correctly():
    """Odd chunk sizes carry a pad byte in movi AND in the idx1 offset
    arithmetic — a walker that forgets either desynchronizes."""
    sizes = [7, 9, 11, 8]
    g = parse_avi_index(encode_avi(sizes))
    assert [f[2] for f in g["frames"]] == sizes


def test_corrupt_raises():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_index(b"RIFF\x00\x00\x00\x00WAVE")
    buf = bytearray(encode_avi([10, 10]))
    # break the second idx1 entry's offset -> ckid mismatch at target
    idx_pos = bytes(buf).rfind(b"idx1")
    struct.pack_into("<I", buf, idx_pos + 8 + 16 + 8, 2)
    with pytest.raises(ValueError, match="ckid mismatch|points past"):
        parse_avi_index(bytes(buf))
    # truncated file: movi list declared longer than the buffer
    with pytest.raises(ValueError, match="runs past|corrupt"):
        parse_avi_index(bytes(encode_avi([10, 10]))[:-12])


def test_video_frame_index_spark(spark):
    from odin_rs_spark.operators import multimodal as mm

    buf1 = encode_avi([20, 30, 40], width=32, height=24, keyframe_every=2)
    buf2 = encode_avi([5, 5], width=16, height=16, keyframe_every=1)
    media = spark.createDataFrame(
        [(1, bytearray(buf1)), (2, bytearray(buf2))],
        "media_id long, content binary",
    )
    rows = mm.video_frame_index(media).collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append((r.frame_no, r.size, r.keyframe))
    assert per[1] == [(0, 20, 1), (1, 30, 0), (2, 40, 1)]
    assert per[2] == [(0, 5, 1), (1, 5, 1)]
    assert all(r.width == 32 for r in rows if r.media_id == 1)

    # corrupt clip with on_error="skip" drops, not kills
    bad = spark.createDataFrame(
        [(3, bytearray(b"RIFF\x04\x00\x00\x00AVI ")), (4, bytearray(buf2))],
        "media_id long, content binary",
    )
    kept = mm.video_frame_index(bad, on_error="skip").collect()
    assert {r.media_id for r in kept} == {4}


def _mjpg_clip(seed: int, nf: int = 4, w: int = 32, h: int = 24) -> bytes:
    """Real MJPG AVI: nf DC-exact gray JPEG frames (constant even-value
    8x8 blocks, for which the lossy codec round-trips exactly)."""
    import numpy as np

    from odin_rs_spark.sources.jpegcodec import encode_jpeg

    frames = []
    for f in range(nf):
        byy, bxx = np.mgrid[0 : h // 8, 0 : w // 8]
        vals = 2 * ((seed * 5 + f * 17 + bxx * 7 + byy * 11) % 100) + 14
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
        frames.append(encode_jpeg(img))
    return encode_avi(
        payloads=frames, width=w, height=h, fps=12, keyframe_every=2
    )


def test_encode_avi_payloads_roundtrip():
    frames = [b"abc", b"defgh"]
    buf = encode_avi(payloads=frames, width=8, height=8)
    g = parse_avi_index(buf)
    got = [buf[off + 8 : off + 8 + size] for _, off, size, _ in g["frames"]]
    assert got == frames
    with pytest.raises(ValueError, match="exactly one"):
        encode_avi([3], payloads=[b"x"])
    with pytest.raises(ValueError, match="exactly one"):
        encode_avi()


def test_video_decode_frames(spark):
    import numpy as np

    from odin_rs_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(0, bytearray(_mjpg_clip(0))), (1, bytearray(_mjpg_clip(7, nf=3)))],
        "media_id long, content binary",
    )
    rows = mm.video_decode_frames(media).collect()
    assert len(rows) == 7
    for r in rows:
        seed = [0, 7][r.media_id]
        byy, bxx = np.mgrid[0:3, 0:4]
        vals = 2 * ((seed * 5 + r.frame_no * 17 + bxx * 7 + byy * 11) % 100) + 14
        assert r.n_px == 32 * 24
        assert r.n_channels == 1
        assert r.sum_channels == int(vals.sum()) * 64
        assert r.mean_luma == pytest.approx(vals.mean(), abs=0)
        assert (r.width, r.height) == (32, 24)

    # frame selection happens before decode: every_n + keyframes_only
    sel = mm.video_decode_frames(media, every_n=2).collect()
    assert sorted((r.media_id, r.frame_no) for r in sel) == [
        (0, 0), (0, 2), (1, 0), (1, 2)]
    kf = mm.video_decode_frames(media, keyframes_only=True, max_frames=1).collect()
    assert sorted((r.media_id, r.frame_no) for r in kf) == [(0, 0), (1, 0)]


def test_video_frame_fingerprints_dedup(spark):
    from odin_rs_spark.operators import multimodal as mm

    # media 0 and 2 share seed -> all frames collide; media 1 differs
    media = spark.createDataFrame(
        [
            (0, bytearray(_mjpg_clip(3))),
            (1, bytearray(_mjpg_clip(4))),
            (2, bytearray(_mjpg_clip(3))),
        ],
        "media_id long, content binary",
    )
    fps = mm.video_frame_fingerprints(media).collect()
    by_frame = {}
    for r in fps:
        by_frame.setdefault((r.media_id, r.frame_no), r.fp)
    for f in range(4):
        assert by_frame[(0, f)] == by_frame[(2, f)]
        assert by_frame[(0, f)] != by_frame[(1, f)]
    # fingerprint is the md5 of the row-major integer tile-sum string
    import hashlib

    import numpy as np

    byy, bxx = np.mgrid[0:3, 0:4]
    vals = 2 * ((3 * 5 + 0 * 17 + bxx * 7 + byy * 11) % 100) + 14
    key = ",".join(str(int(v) * 64) for v in vals.ravel())
    assert by_frame[(0, 0)] == hashlib.md5(key.encode()).hexdigest()


def test_video_demux_audio_composes_with_audio_stats(spark):
    import numpy as np

    from odin_rs_spark.operators import multimodal as mm

    s0 = ((np.arange(200) * 31) % 997 - 498).astype(np.int16)
    s1 = ((np.arange(120) * 17) % 601 - 300).astype(np.int16)
    with_audio0 = encode_avi([10, 12], audio=s0, audio_rate=8000, audio_chunks=3)
    with_audio1 = encode_avi([8], audio=s1, audio_rate=16000, audio_chunks=2)
    silent = encode_avi([6, 6])
    media = spark.createDataFrame(
        [(0, bytearray(with_audio0)), (1, bytearray(with_audio1)),
         (2, bytearray(silent))],
        "media_id long, content binary",
    )
    with pytest.raises(Exception):
        mm.video_demux_audio(media).collect()
    wavs = mm.video_demux_audio(media, on_error="skip")
    got = {r.media_id: r for r in wavs.collect()}
    assert set(got) == {0, 1}
    assert (got[0].rate, got[0].channels, got[0].n_samples) == (8000, 1, 200)
    assert (got[1].rate, got[1].n_samples) == (16000, 120)

    # the demuxed WAV flows through the existing audio pipeline
    stats = {r.media_id: r for r in mm.audio_stats(wavs).collect()}
    for mid, src in ((0, s0), (1, s1)):
        assert stats[mid].peak == int(np.abs(src).max())
        assert stats[mid].n_samples == len(src)
