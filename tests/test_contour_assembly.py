"""Contour polyline assembly (R3b): segments → iso-lines with
attributes, ordered vertex walks, and the K5 LineString product.
Value-level assembly is oracle-checked by q121; these tests pin the
chain-walk invariants the SQL oracle cannot express (vertex order)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from odin_rs_spark.operators import raster as raster_ops

INTERVAL = 2.2352


def _field(spark, w=40, h=30):
    lat = raster_ops.affine_lattice(spark, w, h)
    u = F.sin(F.col("x") * 0.37) * F.cos(F.col("y") * 0.23) * 10.0
    v = F.cos(F.col("x") * 0.11) * 5.0 + F.sin(F.col("y") * 0.31) * 3.0
    return lat.select("x", "y", raster_ops.windspeed(u, v).alias("value"))


def _cone(spark, w=21, h=21):
    """Radial cone: every contour is one closed ring around the center."""
    lat = raster_ops.affine_lattice(spark, w, h)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    r = F.sqrt((F.col("x") - cx) ** 2 + (F.col("y") - cy) ** 2)
    return lat.select("x", "y", (F.lit(10.0) - r).alias("value"))


def test_cone_rings_closed(spark):
    segs = raster_ops.contour_segments(_cone(spark), interval=2.0, tile_size=8)
    lines = raster_ops.contour_lines(segs, interval=2.0).collect()
    interior = [r for r in lines if r["level"] > 0]
    assert len(interior) > 1
    # every POSITIVE iso-line of the cone (radius < 10, fully inside
    # the 21x21 grid) is one closed ring; negative levels are clipped
    # by the grid boundary and legitimately open
    for r in interior:
        assert r["closed"], r
        assert r["n_segments"] >= 4
        assert r["length"] > 0
    assert any(not r["closed"] for r in lines if r["level"] < 0)


def test_lines_partition_segments(spark):
    """Each segment belongs to exactly one line: per-level segment sums
    must match the raw segment counts (after dropping degenerate
    zero-length segments)."""
    segs = raster_ops.contour_segments(_field(spark), interval=INTERVAL, tile_size=16)
    lines = raster_ops.contour_lines(segs, interval=INTERVAL)
    per_level = {
        r["level"]: r["n"]
        for r in lines.groupBy("level")
        .agg(F.sum("n_segments").alias("n"))
        .collect()
    }
    raw = {
        r["level"]: r["n"]
        for r in segs.filter(
            (F.round(F.col("x1") * 1e6) != F.round(F.col("x2") * 1e6))
            | (F.round(F.col("y1") * 1e6) != F.round(F.col("y2") * 1e6))
        )
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_level == raw


def test_polyline_walk_order(spark):
    """The vertex walk is a real chain: consecutive vertices are
    endpoints of an actual segment, open chains have n_segments+1
    vertices, rings repeat their first vertex."""
    segs = raster_ops.contour_segments(_field(spark), interval=INTERVAL, tile_size=16)
    lines = {
        (r["level"], r["line_id"]): r
        for r in raster_ops.contour_lines(segs, interval=INTERVAL).collect()
    }
    polys = raster_ops.contour_polylines(segs, interval=INTERVAL).collect()
    seg_set = set()
    for s in segs.collect():
        a = (s["level"], round(s["x1"] * 1e6), round(s["y1"] * 1e6))
        b = (s["level"], round(s["x2"] * 1e6), round(s["y2"] * 1e6))
        seg_set.add((a, b))
        seg_set.add((b, a))
    by_line: dict[tuple, list] = {}
    for r in polys:
        by_line.setdefault((r["level"], r["line_id"]), []).append(r)
    assert set(by_line) == set(lines)
    for key, rows in by_line.items():
        rows.sort(key=lambda r: r["seq"])
        attrs = lines[key]
        if attrs["closed"]:
            assert rows[0]["x"] == rows[-1]["x"] and rows[0]["y"] == rows[-1]["y"]
            assert len(rows) == attrs["n_segments"] + 1
        else:
            assert len(rows) == attrs["n_segments"] + 1
        lvl = key[0]
        for p, q in zip(rows, rows[1:]):
            a = (lvl, round(p["x"] * 1e6), round(p["y"] * 1e6))
            b = (lvl, round(q["x"] * 1e6), round(q["y"] * 1e6))
            assert (a, b) in seg_set, (key, p, q)


def test_linestring_geojson_product(spark, tmp_path):
    from odin_rs_spark.sinks.products import (
        contour_linestring_features,
        write_geojson_features,
    )

    segs = raster_ops.contour_segments(_cone(spark), interval=2.0, tile_size=8)
    polys = raster_ops.contour_polylines(
        segs.filter(F.col("level") > 0), interval=2.0
    )
    feats = contour_linestring_features(polys)
    out = str(tmp_path / "contours")
    write_geojson_features(feats, "feature", out)
    lines = []
    import glob

    for p in glob.glob(out + "/part-*"):
        with open(p) as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]
    assert lines
    for feat in lines:
        assert feat["type"] == "Feature"
        assert feat["geometry"]["type"] == "LineString"
        coords = feat["geometry"]["coordinates"]
        assert len(coords) >= 4 and all(len(c) == 2 for c in coords)
        assert feat["properties"]["closed"] is True
        # ring closure survives the JSON roundtrip
        assert coords[0] == coords[-1]
