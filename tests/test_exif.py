"""EXIF APP1 parse/encode/scrub (sources/exif) — both TIFF byte
orders, GPS DMS round-trip, strip leaves pixels untouched."""

from __future__ import annotations

import numpy as np
import pytest

from odin_rs_spark.sources.exif import (
    encode_exif_app1,
    insert_app1,
    parse_exif,
    strip_app_segments,
)
from odin_rs_spark.sources.jpegcodec import decode_jpeg, encode_jpeg

BASE = encode_jpeg(np.full((16, 16), 100, np.uint8))


@pytest.mark.parametrize("bo", ["<", ">"])
def test_roundtrip_both_byte_orders(bo):
    app1 = encode_exif_app1(
        make="CamX", model="M3", orientation=6,
        datetime="2026:08:15 12:00:00",
        gps=(37.50125, -122.25625), byte_order=bo,
    )
    j = insert_app1(BASE, app1)
    e = parse_exif(j)
    assert (e["make"], e["model"], e["orientation"]) == ("CamX", "M3", 6)
    assert e["datetime"] == "2026:08:15 12:00:00"
    # 37.50125 = 37 deg 30 min 4.50 sec -> exact through the d/m/s*100
    # rationals
    assert e["lat"] == pytest.approx(37.50125, abs=2e-6)
    assert e["lon"] == pytest.approx(-122.25625, abs=2e-6)


def test_gps_minute_boundary():
    """Exact-minute values (s=0) must not lose a minute to float
    truncation (the int((v-d)*60) ulp hazard)."""
    for lat in (10 + 1 / 60, 45 + 59 / 60, 0 + 1 / 60):
        app1 = encode_exif_app1(gps=(lat, 0.0))
        e = parse_exif(insert_app1(BASE, app1))
        assert e["lat"] == pytest.approx(lat, abs=2e-6), lat


def test_strip_scrubs_and_preserves_pixels():
    app1 = encode_exif_app1(make="X", gps=(1.5, 2.5))
    j = insert_app1(BASE, app1)
    s = strip_app_segments(j)
    e = parse_exif(s)
    assert all(v is None for v in e.values())
    assert np.array_equal(decode_jpeg(s), decode_jpeg(BASE))
    # idempotent; no-exif input passes through semantically
    assert parse_exif(strip_app_segments(s)) == e


def test_absence_and_errors():
    e = parse_exif(BASE)
    assert all(v is None for v in e.values())
    with pytest.raises(ValueError, match="no SOI"):
        parse_exif(b"nope")
    # corrupt TIFF mark inside an APP1/Exif payload raises by name
    app1 = bytearray(encode_exif_app1(make="X"))
    app1[10:12] = b"ZZ"
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(insert_app1(BASE, bytes(app1)))


def test_apply_orientation_all_eight():
    """Pixel-level ground truth for every orientation value: round-trip
    through a JPEG-free array and check against the canonical numpy
    transforms (this is what pins the q190 oracle's quadrant map)."""
    from odin_rs_spark.sources.exif import apply_orientation

    a = np.arange(24).reshape(4, 6)
    want = {
        1: a,
        2: np.fliplr(a),
        3: np.rot90(a, 2),
        4: np.flipud(a),
        5: a.T,
        6: np.rot90(a, -1),
        7: np.rot90(np.fliplr(a), -1),
        8: np.rot90(a, 1),
    }
    for o, w in want.items():
        got = apply_orientation(a, o)
        assert np.array_equal(got, w), o
    assert apply_orientation(a, None) is a
    with pytest.raises(ValueError, match="out of range"):
        apply_orientation(a, 9)


def test_image_oriented_stats_matches_numpy(spark):
    """Operator quadrant sums == numpy-transformed ground truth for a
    rotated (o=6) and a transposed (o=5) DC-exact JPEG."""
    from odin_rs_spark.operators.multimodal import image_oriented_stats
    from odin_rs_spark.sources.exif import apply_orientation

    byy, bxx = np.mgrid[0:4, 0:4]
    vals = 2 * ((3 * bxx + 7 * byy + 5) % 100) + 14
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    rows = []
    for mid, o in ((1, 6), (2, 5)):
        j = insert_app1(
            encode_jpeg(img), encode_exif_app1(orientation=o)
        )
        rows.append((mid, bytearray(j), o))
    media = spark.createDataFrame(
        [(m, c) for m, c, _ in rows], "media_id long, content binary"
    )
    got = {
        (r.media_id, r.tile_x, r.tile_y): r.sum_v
        for r in image_oriented_stats(media).collect()
    }
    for mid, _, o in rows:
        t = apply_orientation(img.astype(np.int64), o)
        for ty in range(2):
            for tx in range(2):
                want = int(t[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16].sum())
                assert got[(mid, tx, ty)] == want, (mid, o, tx, ty)


def test_exif_stats_spark(spark):
    from odin_rs_spark.operators.multimodal import exif_stats

    j1 = insert_app1(BASE, encode_exif_app1(make="A", gps=(3.25, -4.5)))
    j2 = insert_app1(BASE, encode_exif_app1(make="B", orientation=8))
    media = spark.createDataFrame(
        [(1, bytearray(j1)), (2, bytearray(j2)), (3, bytearray(BASE))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in exif_stats(media).collect()}
    assert rows[1].make == "A" and rows[1].gps_present == 1
    assert rows[1].gps_after_strip == 0
    assert rows[2].orientation == 8 and rows[2].gps_present == 0
    assert rows[3].make is None and rows[3].gps_present == 0


def test_scalar_tag_coercion_on_corrupt_counts():
    """ADVICE r8: a corrupt orientation entry with count>1 must coerce
    to its first value (and non-int/str shapes to None) instead of
    escaping as a tuple into the int-typed 'orientation' schema column
    — an Arrow conversion crash inside mapInPandas even with
    on_error='skip'."""
    import struct

    app1 = bytearray(encode_exif_app1(orientation=3))
    # tiff starts at app1[10]; single IFD0 entry at tiff offset 10:
    # tag(2) typ(2) cnt(4) payload(4)
    tiff = 10
    tag, typ, cnt = struct.unpack("<HHI", app1[tiff + 10 : tiff + 18])
    assert (tag, typ, cnt) == (0x0112, 3, 1)
    app1[tiff + 14 : tiff + 18] = struct.pack("<I", 2)  # count 1 -> 2
    app1[tiff + 18 : tiff + 22] = struct.pack("<HH", 3, 0)  # two SHORTs
    e = parse_exif(insert_app1(BASE, bytes(app1)))
    assert e["orientation"] == 3  # first value, still an int
    # a RATIONAL-typed orientation (payload is an offset) coerces to
    # None — never a tuple
    app1 = bytearray(encode_exif_app1(orientation=3))
    app1[tiff + 12 : tiff + 14] = struct.pack("<H", 5)  # SHORT -> RATIONAL
    e = parse_exif(insert_app1(BASE, bytes(app1)))
    assert e["orientation"] is None
