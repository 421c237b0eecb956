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
