"""Geodesy column functions (SURVEY §2.9).

Every formula in the reference's geo library is closed-form
(odin_common/src/geo.rs, cartographic.rs, cartesian3.rs), so all of these
compile to JVM column expressions inside whole-stage codegen — no Python
UDFs, no serialization, scale-free.

Semantics parity targets (behavior only, independent implementation):
  haversine_km  ~ haversine_distance       odin_common/src/geo.rs:167
  bearing_deg   ~ GeoPoint::bearing_from   odin_common/src/geo.rs:102
  ecef_*        ~ geo↔ECEF                 odin_common/src/geo.rs:69-91
  quantize_cell ~ DEM cell lookup keys     odin_dem/src/lib.rs:260-299
  unit convs    ~ ft↔m, knots              odin_adsb/src/lib.rs:189-229
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # mean Earth radius (IUGG)
WGS84_A = 6378137.0  # semi-major axis, meters
WGS84_E2 = 6.69437999014e-3  # first eccentricity squared

FT_PER_M = 3.28083989501312  # exact 1/0.3048
MPS_PER_KNOT = 0.514444444444


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def haversine_km(
    lon1: Column | str, lat1: Column | str, lon2: Column | str, lat2: Column | str
) -> Column:
    """Great-circle distance in km between two lon/lat degree pairs."""
    lon1, lat1, lon2, lat2 = (_col(c) for c in (lon1, lat1, lon2, lat2))
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def bearing_deg(
    lon1: Column | str, lat1: Column | str, lon2: Column | str, lat2: Column | str
) -> Column:
    """Initial great-circle bearing (degrees, [0, 360)) from point 1 to 2."""
    lon1, lat1, lon2, lat2 = (_col(c) for c in (lon1, lat1, lon2, lat2))
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(phi2)
    x = F.cos(phi1) * F.sin(phi2) - F.sin(phi1) * F.cos(phi2) * F.cos(dlon)
    return (F.degrees(F.atan2(y, x)) + F.lit(360.0)) % F.lit(360.0)


def _prime_vertical_radius(lat_rad: Column) -> Column:
    return F.lit(WGS84_A) / F.sqrt(F.lit(1.0) - F.lit(WGS84_E2) * F.sin(lat_rad) ** 2)


def ecef_x(lon: Column | str, lat: Column | str, alt_m: Column | str | float = 0.0) -> Column:
    """WGS84 geodetic → ECEF X (meters)."""
    lon, lat = _col(lon), _col(lat)
    alt = F.lit(alt_m) if isinstance(alt_m, (int, float)) else _col(alt_m)
    lat_r, lon_r = F.radians(lat), F.radians(lon)
    n = _prime_vertical_radius(lat_r)
    return (n + alt) * F.cos(lat_r) * F.cos(lon_r)


def ecef_y(lon: Column | str, lat: Column | str, alt_m: Column | str | float = 0.0) -> Column:
    lon, lat = _col(lon), _col(lat)
    alt = F.lit(alt_m) if isinstance(alt_m, (int, float)) else _col(alt_m)
    lat_r, lon_r = F.radians(lat), F.radians(lon)
    n = _prime_vertical_radius(lat_r)
    return (n + alt) * F.cos(lat_r) * F.sin(lon_r)


def ecef_z(lon: Column | str, lat: Column | str, alt_m: Column | str | float = 0.0) -> Column:
    lat = _col(lat)
    alt = F.lit(alt_m) if isinstance(alt_m, (int, float)) else _col(alt_m)
    lat_r = F.radians(lat)
    n = _prime_vertical_radius(lat_r)
    return (n * F.lit(1.0 - WGS84_E2) + alt) * F.sin(lat_r)


def ecef_lon(x: Column | str, y: Column | str) -> Column:
    """ECEF → geodetic longitude (degrees). Inverse of ecef_x/ecef_y
    (parity: the reference's cartesian→geodetic direction,
    odin_common/src/geo.rs:91)."""
    return F.degrees(F.atan2(_col(y), _col(x)))


def _bowring_lat_rad(x: Column, y: Column, z: Column) -> Column:
    """Geodetic latitude (radians) from ECEF via Bowring's closed form
    (Bowring 1976, the standard survey-review formulation), refined with
    one fixed-point pass: θ' = atan((b/a)·tan(lat₁)) re-entered into the
    same formula. Two passes give sub-mm accuracy through LEO altitudes.
    Pure JVM expressions — no UDF in this path."""
    a = F.lit(WGS84_A)
    b = F.lit(WGS84_A * (1.0 - WGS84_E2) ** 0.5)
    e2 = F.lit(WGS84_E2)
    ep2 = F.lit(WGS84_E2 / (1.0 - WGS84_E2))
    p = F.sqrt(x * x + y * y)

    def step(theta: Column) -> Column:
        return F.atan2(
            z + ep2 * b * F.sin(theta) ** 3,
            p - e2 * a * F.cos(theta) ** 3,
        )

    lat1 = step(F.atan2(z * a, p * b))  # seed: parametric-latitude guess
    # refinement pass: parametric angle recomputed from the first result
    return step(F.atan2(b * F.sin(lat1), a * F.cos(lat1)))


def ecef_lat(x: Column | str, y: Column | str, z: Column | str) -> Column:
    """ECEF → geodetic latitude (degrees)."""
    return F.degrees(_bowring_lat_rad(_col(x), _col(y), _col(z)))


def ecef_alt(x: Column | str, y: Column | str, z: Column | str) -> Column:
    """ECEF → height above the WGS84 ellipsoid (meters). Near the poles
    (p → 0) the p/cos(lat) form degenerates, so the |z|-axis expression
    takes over there."""
    x, y, z = _col(x), _col(y), _col(z)
    b = F.lit(WGS84_A * (1.0 - WGS84_E2) ** 0.5)
    p = F.sqrt(x * x + y * y)
    lat = _bowring_lat_rad(x, y, z)
    n = _prime_vertical_radius(lat)
    return F.when(
        p > F.lit(1.0),  # > 1 m from the polar axis: stable general form
        p / F.cos(lat) - n,
    ).otherwise(F.abs(z) - b)


def quantize_cell(coord: Column | str, resolution_deg: float) -> Column:
    """Quantize a degree coordinate to an integer cell index.

    This is the key that turns spatial point lookups (DEM enrichment J1,
    raster align J7) into plain equi-joins Catalyst can hash/broadcast —
    the scale-critical trick replacing per-point raster sampling.
    """
    return F.floor(_col(coord) / F.lit(resolution_deg)).cast("int")


def feet_to_meters(c: Column | str) -> Column:
    return _col(c) / F.lit(FT_PER_M)


def meters_to_feet(c: Column | str) -> Column:
    return _col(c) * F.lit(FT_PER_M)


def knots_to_mps(c: Column | str) -> Column:
    return _col(c) * F.lit(MPS_PER_KNOT)


GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cells(
    lat: Column, lon: Column, precision: int = 5
) -> tuple[Column, Column, Column]:
    """Geohash encode (public Niemeyer 2008 scheme: quantize lon/lat,
    MSB-first bit interleave starting with LONGITUDE, base32 without
    a/i/l/o) as PURE column math — the industry-standard spatial
    STRING key, interoperable with every external geo system, unlike
    the engine-internal Morton keys of operators/layout. Returns
    (geohash, lon_cell, lat_cell); the integer cell indices are the
    ±1-neighbor join keys a radius search blocks on. precision <= 12
    (5·p bits must stay under 63 for ANSI-safe shifts)."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    total = 5 * precision
    nlon = (total + 1) // 2
    nlat = total // 2
    lon_q = F.least(
        F.floor((lon + 180.0) / 360.0 * float(1 << nlon)).cast("bigint"),
        F.lit((1 << nlon) - 1),
    )
    lat_q = F.least(
        F.floor((lat + 90.0) / 180.0 * float(1 << nlat)).cast("bigint"),
        F.lit((1 << nlat) - 1),
    )
    z = F.lit(0).cast("bigint")
    for k in range(total):
        if k % 2 == 0:
            bit = F.shiftright(lon_q, nlon - 1 - k // 2).bitwiseAND(F.lit(1))
        else:
            bit = F.shiftright(lat_q, nlat - 1 - (k - 1) // 2).bitwiseAND(
                F.lit(1)
            )
        z = z.bitwiseOR(F.shiftleft(bit, total - 1 - k))
    gh = F.concat(
        *[
            F.substring(
                F.lit(GEOHASH_B32),
                (
                    F.shiftright(z, 5 * (precision - 1 - g)).bitwiseAND(
                        F.lit(31)
                    )
                    + 1
                ).cast("int"),
                1,
            )
            for g in range(precision)
        ]
    )
    return gh, lon_q, lat_q
