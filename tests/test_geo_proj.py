"""Pinned-fixture tests for the geodesy/projection/polygon column library
(SURVEY §7.4.2: "get signs/radians right once ... with pinned fixtures").

Test vectors are from public sources:
- GOES-R PUG Vol.3 §5.1.2.8.1 worked example (scan angle → lon/lat);
- well-known UTM coordinates (NYC reference point, central-meridian and
  equator invariants);
- hand-checkable polygons (unit squares, triangles).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from odin_rs_spark.functions import geo, polygon, proj


def one(df):
    return df.collect()[0]


# --------------------------------------------------------------------------
# UTM
# --------------------------------------------------------------------------


def test_utm_nyc_pinned(spark):
    # 40.7128N 74.0060W (NYC) → zone 18T, E≈583 960, N≈4 507 351
    # (N cross-checked by hand: meridian arc M(40.7128°)≈4 508 681 m,
    # ×k0 + N·tanφ·A²/2 ≈ 4 507 352)
    r = one(
        spark.range(1).select(
            proj.utm_zone(F.lit(-74.0060)).alias("zone"),
            proj.utm_band(F.lit(40.7128)).alias("band"),
            proj.utm_easting(F.lit(-74.0060), F.lit(40.7128)).alias("e"),
            proj.utm_northing(F.lit(-74.0060), F.lit(40.7128)).alias("n"),
        )
    )
    assert r.zone == 18 and r.band == "T"
    assert abs(r.e - 583960.0) < 30
    assert abs(r.n - 4507351.0) < 30


def test_utm_invariants(spark):
    # central meridian of zone 31 (3°E) → easting exactly 500 000;
    # equator (northern convention) → northing 0
    r = one(
        spark.range(1).select(
            proj.utm_easting(F.lit(3.0), F.lit(45.0)).alias("e_cm"),
            proj.utm_northing(F.lit(3.0), F.lit(0.0)).alias("n_eq"),
            proj.utm_northing(F.lit(3.0), F.lit(-0.0001)).alias("n_south"),
        )
    )
    assert abs(r.e_cm - 500000.0) < 1e-6
    assert abs(r.n_eq) < 1e-6
    assert r.n_south > 9_990_000  # southern false northing applied


def test_utm_roundtrip(spark):
    pts = spark.createDataFrame(
        [Row(lon=-122.4194, lat=37.7749), Row(lon=151.2093, lat=-33.8688),
         Row(lon=8.5417, lat=47.3769), Row(lon=-58.3816, lat=-34.6037)]
    )
    rt = pts.select(
        "lon",
        "lat",
        proj.utm_to_lonlat(
            proj.utm_easting("lon", "lat"),
            proj.utm_northing("lon", "lat"),
            proj.utm_zone("lon"),
            F.col("lat") < 0,
        ).alias("back"),
    ).collect()
    for r in rt:
        assert abs(r.back.lon - r.lon) < 1e-6
        assert abs(r.back.lat - r.lat) < 1e-6


def test_utm_band_edges(spark):
    rows = one(
        spark.range(1).select(
            proj.utm_band(F.lit(-79.9)).alias("c"),
            proj.utm_band(F.lit(0.1)).alias("n"),
            proj.utm_band(F.lit(55.0)).alias("u"),
            proj.utm_band(F.lit(79.9)).alias("x"),
        )
    )
    assert (rows.c, rows.n, rows.u, rows.x) == ("C", "N", "U", "X")


# --------------------------------------------------------------------------
# GOES fixed grid
# --------------------------------------------------------------------------


def test_goes_pug_worked_example(spark):
    # PUG Vol.3 §5.1.2.8.1: x=-0.024052 rad, y=0.095340 rad, GOES-East
    # (lon0=-75°) → 33.846162°N, 84.690932°W
    r = one(
        spark.range(1).select(
            proj.goes_to_lonlat(F.lit(-0.024052), F.lit(0.095340), -75.0).alias("g")
        )
    )
    assert abs(r.g.lat - 33.846162) < 1e-4
    assert abs(r.g.lon - (-84.690932)) < 1e-4


def test_goes_roundtrip_and_subpoint(spark):
    # satellite sub-point: scan angle (0,0) → (lon0, 0)
    r = one(
        spark.range(1).select(
            proj.goes_to_lonlat(F.lit(0.0), F.lit(0.0), -75.0).alias("sub"),
            proj.lonlat_to_goes(F.lit(-84.690932), F.lit(33.846162), -75.0).alias("ang"),
        )
    )
    assert abs(r.sub.lon - (-75.0)) < 1e-9 and abs(r.sub.lat) < 1e-9
    assert abs(r.ang.x - (-0.024052)) < 1e-5
    assert abs(r.ang.y - 0.095340) < 1e-5


def test_goes_off_earth_null(spark):
    # scan angle far beyond the Earth limb (~±0.151 rad) → NULL
    r = one(
        spark.range(1).select(
            proj.goes_to_lonlat(F.lit(0.2), F.lit(0.0), -75.0).alias("g")
        )
    )
    assert r.g.lon is None and r.g.lat is None


# --------------------------------------------------------------------------
# haversine / ECEF sanity (existing fns, pinned values)
# --------------------------------------------------------------------------


def test_haversine_paris_london(spark):
    # Paris (2.3522, 48.8566) ↔ London (-0.1276, 51.5072) ≈ 343.5 km
    r = one(
        spark.range(1).select(
            geo.haversine_km(
                F.lit(2.3522), F.lit(48.8566), F.lit(-0.1276), F.lit(51.5072)
            ).alias("km")
        )
    )
    assert abs(r.km - 343.5) < 1.0


def test_ecef_equator_prime_meridian(spark):
    r = one(
        spark.range(1).select(
            geo.ecef_x(F.lit(0.0), F.lit(0.0)).alias("x"),
            geo.ecef_y(F.lit(0.0), F.lit(0.0)).alias("y"),
            geo.ecef_z(F.lit(0.0), F.lit(0.0)).alias("z"),
            geo.ecef_z(F.lit(0.0), F.lit(90.0)).alias("zp"),
        )
    )
    assert abs(r.x - 6378137.0) < 1e-6 and abs(r.y) < 1e-6 and abs(r.z) < 1e-6
    assert abs(r.zp - 6356752.314245) < 1e-3  # polar semi-minor axis


def test_ecef_geodetic_roundtrip_property(spark):
    """§2.9 round 3: the ECEF→geodetic inverse (Bowring) must invert the
    forward trio to sub-mm / micro-degree accuracy across latitudes,
    longitudes, and altitudes from -5 km through LEO. One Spark job for
    the whole sample grid (hypothesis's per-example model would pay
    ~1s of job latency each, so the grid is explicit)."""
    lons = [-179.9, -120.0, -60.0, -0.1, 0.0, 45.5, 90.0, 135.25, 179.9]
    lats = [-89.99, -85.0, -45.0, -0.001, 0.0, 23.4567, 45.0, 66.5, 89.99]
    alts = [-5000.0, 0.0, 8848.0, 400_000.0, 2_000_000.0]
    rows = [
        (lon, lat, alt) for lon in lons for lat in lats for alt in alts
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, alt double")
    got = (
        df.select(
            "lon",
            "lat",
            "alt",
            geo.ecef_x("lon", "lat", "alt").alias("x"),
            geo.ecef_y("lon", "lat", "alt").alias("y"),
            geo.ecef_z("lon", "lat", "alt").alias("z"),
        )
        .select(
            "lon",
            "lat",
            "alt",
            geo.ecef_lon("x", "y").alias("lon2"),
            geo.ecef_lat("x", "y", "z").alias("lat2"),
            geo.ecef_alt("x", "y", "z").alias("alt2"),
        )
        .collect()
    )
    for r in got:
        assert abs(r.lat2 - r.lat) < 1e-9, r
        assert abs(r.alt2 - r.alt) < 1e-3, r
        # longitude is undefined on the polar axis itself; everywhere
        # else it must come back exactly
        dlon = abs(r.lon2 - r.lon)
        assert min(dlon, 360.0 - dlon) < 1e-9, r


def test_ecef_inverse_pole_and_axis(spark):
    """Polar-axis degeneracy: p≈0 must not NaN — lat snaps to ±90 and
    alt falls back to |z| − b."""
    b = 6356752.314245
    r = one(
        spark.createDataFrame(
            [(0.0, 0.0, b + 1000.0)], "x double, y double, z double"
        ).select(
            geo.ecef_lat("x", "y", "z").alias("lat"),
            geo.ecef_alt("x", "y", "z").alias("alt"),
        )
    )
    assert abs(r.lat - 90.0) < 1e-6
    assert abs(r.alt - 1000.0) < 1e-3


# --------------------------------------------------------------------------
# polygons
# --------------------------------------------------------------------------

SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]  # CCW


def _poly_lit(pts):
    return F.array(
        *[
            F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat"))
            for x, y in pts
        ]
    )


@pytest.mark.parametrize(
    "px,py,expected",
    [(2.0, 2.0, True), (5.0, 2.0, False), (-1.0, -1.0, False), (3.9, 0.1, True)],
)
def test_point_in_polygon(spark, px, py, expected):
    r = one(
        spark.range(1).select(
            polygon.point_in_polygon(F.lit(px), F.lit(py), _poly_lit(SQUARE)).alias("i")
        )
    )
    assert r.i == expected


def test_polygon_metrics_array(spark):
    r = one(
        spark.range(1).select(
            polygon.polygon_area_deg2(_poly_lit(SQUARE)).alias("area"),
            polygon.is_clockwise(_poly_lit(SQUARE)).alias("cw"),
            polygon.is_clockwise(_poly_lit(list(reversed(SQUARE)))).alias("cw_rev"),
            polygon.centroid(_poly_lit(SQUARE)).alias("c"),
            polygon.bbox(_poly_lit(SQUARE)).alias("b"),
        )
    )
    assert abs(r.area - 16.0) < 1e-12
    assert r.cw is False and r.cw_rev is True
    assert abs(r.c.lon - 2.0) < 1e-12 and abs(r.c.lat - 2.0) < 1e-12
    assert (r.b.west, r.b.south, r.b.east, r.b.north) == (0.0, 0.0, 4.0, 4.0)


def test_polygon_metrics_relational_matches_array(spark):
    rows = [
        Row(poly_id=1, seq=i, lon=x, lat=y) for i, (x, y) in enumerate(SQUARE)
    ] + [
        Row(poly_id=2, seq=i, lon=x, lat=y)
        for i, (x, y) in enumerate([(0.0, 0.0), (2.0, 0.0), (1.0, 3.0)])
    ]
    out = {
        r.poly_id: r
        for r in polygon.polygon_metrics_from_vertices(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert abs(out[1].area_deg2 - 16.0) < 1e-12 and not out[1].clockwise
    assert abs(out[2].area_deg2 - 3.0) < 1e-12  # ½·base2·height3
    assert out[2].n_vertices == 3


def test_closest_point_on_segment(spark):
    r = one(
        spark.range(1).select(
            polygon.closest_point_on_segment(
                F.lit(2.0), F.lit(5.0), F.lit(0.0), F.lit(0.0), F.lit(4.0), F.lit(0.0)
            ).alias("p"),
            polygon.closest_point_on_segment(
                F.lit(-3.0), F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(4.0), F.lit(0.0)
            ).alias("clamped"),
        )
    )
    assert (r.p.x, r.p.y, r.p.t) == (2.0, 0.0, 0.5)
    assert (r.clamped.x, r.clamped.t) == (0.0, 0.0)


def test_utm_sql_mirror_matches_duckdb(spark):
    """The *_SQL emitters must evaluate (in DuckDB) to the same values the
    Spark expressions produce — this is what makes the catalog oracle a
    genuine cross-engine check."""
    import duckdb

    lon, lat = -74.0060, 40.7128
    d = duckdb.sql(
        f"SELECT {proj.utm_easting_sql(str(lon), str(lat))} AS e,"
        f" {proj.utm_northing_sql(str(lon), str(lat))} AS n,"
        f" {proj.goes_lat_sql('-0.024052', '0.095340')} AS glat,"
        f" {proj.goes_lon_sql('-0.024052', '0.095340', -75.0)} AS glon"
    ).fetchone()
    s = one(
        spark.range(1).select(
            proj.utm_easting(F.lit(lon), F.lit(lat)).alias("e"),
            proj.utm_northing(F.lit(lon), F.lit(lat)).alias("n"),
            proj.goes_to_lonlat(F.lit(-0.024052), F.lit(0.095340), -75.0).alias("g"),
        )
    )
    assert abs(d[0] - s.e) < 1e-6
    assert abs(d[1] - s.n) < 1e-6
    assert abs(d[2] - s.g.lat) < 1e-9
    assert abs(d[3] - s.g.lon) < 1e-9


class TestGeohash:
    def test_canonical_vector(self, spark):
        from pyspark.sql import functions as F

        from odin_rs_spark.functions.geo import geohash_cells

        df = spark.createDataFrame(
            [(57.64911, 10.40744)], "lat double, lon double"
        )
        for p, want in ((5, "u4pru"), (9, "u4pruydqq"), (11, "u4pruydqqvj")):
            gh, _, _ = geohash_cells(F.col("lat"), F.col("lon"), p)
            assert df.select(gh.alias("g")).collect()[0].g == want

    def test_known_city_cells(self, spark):
        from pyspark.sql import functions as F

        from odin_rs_spark.functions.geo import geohash_cells

        # classic published prefixes: London ~ gcpv, NYC ~ dr5r
        df = spark.createDataFrame(
            [(51.50642, -0.12721), (40.7484, -73.9857)],
            "lat double, lon double",
        )
        gh, _, _ = geohash_cells(F.col("lat"), F.col("lon"), 4)
        got = {r.g for r in df.select(gh.alias("g")).collect()}
        assert got == {"gcpv", "dr5r"}

    def test_edge_clamp_and_bounds(self, spark):
        from pyspark.sql import functions as F

        from odin_rs_spark.functions.geo import geohash_cells

        df = spark.createDataFrame(
            [(90.0, 180.0), (-90.0, -180.0)], "lat double, lon double"
        )
        gh, xc, yc = geohash_cells(F.col("lat"), F.col("lon"), 5)
        rows = df.select(gh.alias("g"), xc.alias("x"), yc.alias("y")).collect()
        assert rows[0].g == "zzzzz" and rows[0].x == 8191 and rows[0].y == 4095
        assert rows[1].g == "00000" and rows[1].x == 0 and rows[1].y == 0

    def test_precision_validation(self):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from odin_rs_spark.functions.geo import geohash_cells

        with _pytest.raises(ValueError):
            geohash_cells(F.lit(0.0), F.lit(0.0), 13)
