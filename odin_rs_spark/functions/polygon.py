"""Polygon / line column functions (SURVEY §2.9 "Polygon ops", F6).

Parity targets (behavior only, independent implementation):
  point_in_polygon  ~ GeoPolygon::contains   odin_common/src/geo.rs:409
  polygon_area_deg2 ~ area                   odin_common/src/geo.rs:232,325
  is_clockwise      ~ is_clockwise           odin_common/src/geo.rs:442
  centroid          ~ centroid               odin_common/src/cartographic.rs:221
  bbox              ~ bounds                 odin_common/src/geo.rs:416
  closest_point_on_segment ~ closest_point   odin_common/src/geo.rs:179

Two representations, both scale-safe:

1. **Array-per-row** (`array<struct<lon,lat>>` column): higher-order
   functions (`aggregate` over an index `sequence`) keep the math
   JVM-side — one row per (point, polygon) pair, no explode, bounded
   vertex counts (the reference's polygons are small rings).
2. **Vertices-as-rows** (`(poly_id, seq, lon, lat)`): window lead() +
   groupBy shoelace — the representation that scales to huge polygon
   sets because vertices distribute across partitions.

At 100 TB the F6 pattern is: cheap bbox conjunctive prefilter (pushdown-
friendly) THEN exact ray-cast — mirroring the reference's cheap-checks-
first order (odin_orbital/src/overpass.rs:463).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from odin_rs_spark.functions.geo import _col


def _edges(poly: Column) -> Column:
    """Index sequence 1..n-1: edge i is (poly[i], poly[i+1]) 1-indexed."""
    return F.sequence(F.lit(1), F.size(poly) - 1)


def point_in_polygon(px: Column | str, py: Column | str, poly: Column) -> Column:
    """Ray-casting point-in-polygon test (odd crossings = inside).

    `poly` is `array<struct<lon:double,lat:double>>`, open or closed ring
    (the wrap edge is included explicitly). Boundary points follow the
    half-open convention of the crossing rule. Pure higher-order-function
    expression: no UDF, vectorizes inside codegen.
    """
    px, py = _col(px), _col(py)
    # count crossings over explicit edge list incl. wrap edge (last→first)
    closed = F.concat(poly, F.array(F.element_at(poly, 1)))
    crossings = F.aggregate(
        _edges(closed),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (
                (F.element_at(closed, i)["lat"] > py)
                != (F.element_at(closed, i + 1)["lat"] > py)
            )
            & (
                px
                < (F.element_at(closed, i + 1)["lon"] - F.element_at(closed, i)["lon"])
                * (py - F.element_at(closed, i)["lat"])
                / (F.element_at(closed, i + 1)["lat"] - F.element_at(closed, i)["lat"])
                + F.element_at(closed, i)["lon"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def shoelace_sum(poly: Column) -> Column:
    """Σ (x_i·y_{i+1} − x_{i+1}·y_i) over the closed ring (signed ×2 area,
    planar degree coordinates). Positive = counter-clockwise."""
    closed = F.concat(poly, F.array(F.element_at(poly, 1)))
    return F.aggregate(
        _edges(closed),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(closed, i)["lon"] * F.element_at(closed, i + 1)["lat"]
        - F.element_at(closed, i + 1)["lon"] * F.element_at(closed, i)["lat"],
    )


def polygon_area_deg2(poly: Column) -> Column:
    """Unsigned planar shoelace area in degree² (reference computes planar
    area on projected coords; callers scale by cos(lat) for metric area)."""
    return F.abs(shoelace_sum(poly)) / F.lit(2.0)


def is_clockwise(poly: Column) -> Column:
    """True when the ring winds clockwise (negative shoelace sum)."""
    return shoelace_sum(poly) < 0


def centroid(poly: Column) -> Column:
    """Vertex-mean centroid struct(lon, lat) (matches the reference's
    vertex averaging, cartographic.rs:221-247)."""
    n = F.size(poly).cast("double")
    return F.struct(
        (
            F.aggregate(poly, F.lit(0.0), lambda acc, v: acc + v["lon"]) / n
        ).alias("lon"),
        (
            F.aggregate(poly, F.lit(0.0), lambda acc, v: acc + v["lat"]) / n
        ).alias("lat"),
    )


def bbox(poly: Column) -> Column:
    """Bounding box struct(west, south, east, north) of the vertex set.

    This is the cheap prefilter column for F6 at scale: persist it per
    polygon, join on bbox-overlap (range predicates Catalyst can use),
    then run the exact `point_in_polygon` on survivors only.
    """
    return F.struct(
        F.array_min(F.transform(poly, lambda v: v["lon"])).alias("west"),
        F.array_min(F.transform(poly, lambda v: v["lat"])).alias("south"),
        F.array_max(F.transform(poly, lambda v: v["lon"])).alias("east"),
        F.array_max(F.transform(poly, lambda v: v["lat"])).alias("north"),
    )


def closest_point_on_segment(
    px: Column | str,
    py: Column | str,
    x1: Column | str,
    y1: Column | str,
    x2: Column | str,
    y2: Column | str,
) -> Column:
    """Planar closest point struct(x, y, t) on segment (x1,y1)-(x2,y2)
    to point (px,py); t∈[0,1] clamped parameter."""
    px, py, x1, y1, x2, y2 = (_col(c) for c in (px, py, x1, y1, x2, y2))
    dx, dy = x2 - x1, y2 - y1
    len2 = dx * dx + dy * dy
    t_raw = F.when(len2 > 0, ((px - x1) * dx + (py - y1) * dy) / len2).otherwise(
        F.lit(0.0)
    )
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    return F.struct((x1 + t * dx).alias("x"), (y1 + t * dy).alias("y"), t.alias("t"))


def is_convex(poly: Column) -> Column:
    """True when every consecutive edge pair turns the same way
    (cross-product z-signs all ≥0 or all ≤0; GeoPolygon::is_convex,
    odin_common/src/geo.rs:437)."""
    closed = F.concat(poly, F.slice(poly, 1, 2))  # wrap 2 vertices
    n = F.size(poly)
    crosses = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (
            (F.element_at(closed, i + 1)["lon"] - F.element_at(closed, i)["lon"])
            * (F.element_at(closed, i + 2)["lat"] - F.element_at(closed, i + 1)["lat"])
            - (F.element_at(closed, i + 1)["lat"] - F.element_at(closed, i)["lat"])
            * (F.element_at(closed, i + 2)["lon"] - F.element_at(closed, i + 1)["lon"])
        ),
    )
    has_pos = F.exists(crosses, lambda c: c > 0)
    has_neg = F.exists(crosses, lambda c: c < 0)
    return ~(has_pos & has_neg)


def expand_on_centroid(poly: Column, factor: float) -> Column:
    """Scale each vertex away from the vertex-mean centroid
    (expand_on_centroid, odin_common/src/cartographic.rs:249)."""
    c = centroid(poly)
    return F.transform(
        poly,
        lambda v: F.struct(
            (c["lon"] + (v["lon"] - c["lon"]) * F.lit(factor)).alias("lon"),
            (c["lat"] + (v["lat"] - c["lat"]) * F.lit(factor)).alias("lat"),
        ),
    )


# --------------------------------------------------------------------------
# Vertices-as-rows (relational) polygon metrics — the 100 TB representation
# --------------------------------------------------------------------------


def polygon_metrics_from_vertices(
    df: DataFrame,
    poly_id: str = "poly_id",
    seq: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-polygon shoelace metrics from an exploded vertex table.

    One shuffle on poly_id; lead() supplies the next vertex, the wrap
    edge is closed with first_value(). Output: poly_id, n_vertices,
    area_deg2, clockwise, centroid_lon/lat, bbox west/south/east/north.
    """
    w = Window.partitionBy(poly_id).orderBy(seq)
    nxt_lon = F.coalesce(F.lead(lon).over(w), F.first(lon).over(w))
    nxt_lat = F.coalesce(F.lead(lat).over(w), F.first(lat).over(w))
    cross = F.col(lon) * nxt_lat - nxt_lon * F.col(lat)
    return (
        df.select(poly_id, lon, lat, cross.alias("__cross"))
        .groupBy(poly_id)
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            (F.abs(F.sum("__cross")) / 2.0).alias("area_deg2"),
            (F.sum("__cross") < 0).alias("clockwise"),
            F.avg(lon).alias("centroid_lon"),
            F.avg(lat).alias("centroid_lat"),
            F.min(lon).alias("west"),
            F.min(lat).alias("south"),
            F.max(lon).alias("east"),
            F.max(lat).alias("north"),
        )
    )
