"""Map-projection column functions (SURVEY §2.9 "CRS conversion").

Semantics parity targets (behavior only, independent implementation from
public formulae — Snyder, *Map Projections: A Working Manual* (USGS PP
1395) for transverse Mercator; the GOES-R Product Definition and User's
Guide (PUG) Vol. 3 §5.1.2.8 for the ABI fixed-grid projection):

  utm_*            ~ geo↔UTM            odin_common/src/utm.rs:141-241
  utm_zone/band    ~ UtmZone helpers    odin_common/src/utm.rs:87-121
  goes_*           ~ fixed-grid→lon/lat odin_goesr/src/geo.rs:90-117

Everything is closed-form column math → whole-stage codegen, no UDFs.
``*_SQL`` helpers emit the identical formula as ANSI SQL text so DuckDB
can serve as a cross-engine oracle for the catalog queries.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from odin_rs_spark.functions.geo import WGS84_A, _col

# WGS84 derived constants (flattening 1/298.257223563)
_F = 1.0 / 298.257223563
E2 = _F * (2.0 - _F)  # first eccentricity squared
EP2 = E2 / (1.0 - E2)  # second eccentricity squared
K0 = 0.9996  # UTM scale factor at central meridian

# Meridional-arc series coefficients (Snyder eq. 3-21)
_M0 = 1.0 - E2 / 4.0 - 3.0 * E2**2 / 64.0 - 5.0 * E2**3 / 256.0
_M2 = 3.0 * E2 / 8.0 + 3.0 * E2**2 / 32.0 + 45.0 * E2**3 / 1024.0
_M4 = 15.0 * E2**2 / 256.0 + 45.0 * E2**3 / 1024.0
_M6 = 35.0 * E2**3 / 3072.0

_BANDS = "CDEFGHJKLMNPQRSTUVWX"


def utm_zone(lon: Column | str) -> Column:
    """UTM longitudinal zone 1..60 (6° slices from 180°W).

    Matches the reference's naive zone computation (utm.rs:87-99); the
    Norway/Svalbard exceptions are intentionally not applied, mirroring
    the reference.
    """
    return (F.floor((_col(lon) + F.lit(180.0)) / F.lit(6.0)).cast("int") % 60) + 1


def utm_band(lat: Column | str) -> Column:
    """MGRS latitude band letter C..X (8° slices from 80°S; no I/O)."""
    lat = _col(lat)
    idx = F.floor((lat + F.lit(80.0)) / F.lit(8.0)).cast("int")
    idx = F.least(F.greatest(idx, F.lit(0)), F.lit(len(_BANDS) - 1))
    return F.element_at(F.lit(list(_BANDS)), idx + 1)


def _central_meridian(zone: Column) -> Column:
    return zone.cast("double") * F.lit(6.0) - F.lit(183.0)


def utm_easting(lon: Column | str, lat: Column | str) -> Column:
    """WGS84 geodetic → UTM easting (m), zone chosen from lon.

    Transverse Mercator series, Snyder eq. 8-9..8-13.
    """
    lon, lat = _col(lon), _col(lat)
    phi = F.radians(lat)
    lam_d = lon - _central_meridian(utm_zone(lon))
    t = F.tan(phi) ** 2
    c = F.lit(EP2) * F.cos(phi) ** 2
    a = F.radians(lam_d) * F.cos(phi)
    n = F.lit(WGS84_A) / F.sqrt(F.lit(1.0) - F.lit(E2) * F.sin(phi) ** 2)
    return (
        F.lit(K0)
        * n
        * (
            a
            + (F.lit(1.0) - t + c) * a**3 / F.lit(6.0)
            + (F.lit(5.0) - F.lit(18.0) * t + t**2 + F.lit(72.0) * c - F.lit(58.0 * EP2))
            * a**5
            / F.lit(120.0)
        )
        + F.lit(500000.0)
    )


def _meridional_arc(phi: Column) -> Column:
    return F.lit(WGS84_A) * (
        F.lit(_M0) * phi
        - F.lit(_M2) * F.sin(2.0 * phi)
        + F.lit(_M4) * F.sin(4.0 * phi)
        - F.lit(_M6) * F.sin(6.0 * phi)
    )


def utm_northing(lon: Column | str, lat: Column | str) -> Column:
    """WGS84 geodetic → UTM northing (m); +10 000 000 in the south."""
    lon, lat = _col(lon), _col(lat)
    phi = F.radians(lat)
    lam_d = lon - _central_meridian(utm_zone(lon))
    t = F.tan(phi) ** 2
    c = F.lit(EP2) * F.cos(phi) ** 2
    a = F.radians(lam_d) * F.cos(phi)
    n = F.lit(WGS84_A) / F.sqrt(F.lit(1.0) - F.lit(E2) * F.sin(phi) ** 2)
    northing = F.lit(K0) * (
        _meridional_arc(phi)
        + n
        * F.tan(phi)
        * (
            a**2 / F.lit(2.0)
            + (F.lit(5.0) - t + F.lit(9.0) * c + F.lit(4.0) * c**2) * a**4 / F.lit(24.0)
            + (
                F.lit(61.0)
                - F.lit(58.0) * t
                + t**2
                + F.lit(600.0) * c
                - F.lit(330.0 * EP2)
            )
            * a**6
            / F.lit(720.0)
        )
    )
    return F.when(lat < 0, northing + F.lit(10000000.0)).otherwise(northing)


# Footpoint-latitude series (Snyder eq. 3-26), e1 = (1-√(1-e²))/(1+√(1-e²))
_E1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
_P2 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_P4 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_P6 = 151.0 * _E1**3 / 96.0
_P8 = 1097.0 * _E1**4 / 512.0


def utm_to_lonlat(
    easting: Column | str,
    northing: Column | str,
    zone: Column | str | int,
    southern: Column | bool = False,
) -> Column:
    """UTM → WGS84 geodetic; returns struct(lon, lat) in degrees.

    Inverse transverse Mercator series (Snyder eq. 8-17..8-25).
    Round-trips utm_easting/utm_northing to <1e-6° (see tests).
    """
    e = _col(easting)
    nthg = _col(northing)
    z = F.lit(zone) if isinstance(zone, int) else _col(zone)
    south = F.lit(southern) if isinstance(southern, bool) else southern
    y = F.when(south, nthg - F.lit(10000000.0)).otherwise(nthg)
    x = e - F.lit(500000.0)

    m = y / F.lit(K0)
    mu = m / F.lit(WGS84_A * _M0)
    phi1 = (
        mu
        + F.lit(_P2) * F.sin(2.0 * mu)
        + F.lit(_P4) * F.sin(4.0 * mu)
        + F.lit(_P6) * F.sin(6.0 * mu)
        + F.lit(_P8) * F.sin(8.0 * mu)
    )
    sin1, cos1, tan1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    c1 = F.lit(EP2) * cos1**2
    t1 = tan1**2
    n1 = F.lit(WGS84_A) / F.sqrt(F.lit(1.0) - F.lit(E2) * sin1**2)
    r1 = F.lit(WGS84_A * (1.0 - E2)) / F.pow(F.lit(1.0) - F.lit(E2) * sin1**2, 1.5)
    d = x / (n1 * F.lit(K0))

    lat = F.degrees(
        phi1
        - (n1 * tan1 / r1)
        * (
            d**2 / F.lit(2.0)
            - (
                F.lit(5.0)
                + F.lit(3.0) * t1
                + F.lit(10.0) * c1
                - F.lit(4.0) * c1**2
                - F.lit(9.0 * EP2)
            )
            * d**4
            / F.lit(24.0)
            + (
                F.lit(61.0)
                + F.lit(90.0) * t1
                + F.lit(298.0) * c1
                + F.lit(45.0) * t1**2
                - F.lit(252.0 * EP2)
                - F.lit(3.0) * c1**2
            )
            * d**6
            / F.lit(720.0)
        )
    )
    lon = (z.cast("double") * F.lit(6.0) - F.lit(183.0)) + F.degrees(
        (
            d
            - (F.lit(1.0) + F.lit(2.0) * t1 + c1) * d**3 / F.lit(6.0)
            + (
                F.lit(5.0)
                - F.lit(2.0) * c1
                + F.lit(28.0) * t1
                - F.lit(3.0) * c1**2
                + F.lit(8.0 * EP2)
                + F.lit(24.0) * t1**2
            )
            * d**5
            / F.lit(120.0)
        )
        / cos1
    )
    return F.struct(lon.alias("lon"), lat.alias("lat"))


# --------------------------------------------------------------------------
# GOES-R ABI fixed-grid projection (PUG Vol.3 §5.1.2.8; parity target
# odin_goesr/src/geo.rs:66-117)
# --------------------------------------------------------------------------

GOES_REQ = 6378137.0  # GRS80 semi-major (m)
GOES_RPOL = 6356752.31414  # GRS80 semi-minor (m)
GOES_H = 42164160.0  # perspective point distance from Earth center (m)
_REQ2_RPOL2 = GOES_REQ**2 / GOES_RPOL**2
_GOES_E2 = 1.0 - GOES_RPOL**2 / GOES_REQ**2


def goes_to_lonlat(
    x: Column | str, y: Column | str, lon0_deg: float
) -> Column:
    """ABI fixed-grid scan angles (radians; x=E/W, y=N/S) → geodetic
    struct(lon, lat) degrees. `lon0_deg` is the satellite sub-point
    longitude (-75 GOES-East, -137 GOES-West).

    Off-Earth scan angles (negative discriminant) yield NULL lon/lat —
    same cells the reference drops during its mask scan.
    """
    x, y = _col(x), _col(y)
    sinx, cosx, siny, cosy = F.sin(x), F.cos(x), F.sin(y), F.cos(y)
    a = sinx**2 + cosx**2 * (cosy**2 + F.lit(_REQ2_RPOL2) * siny**2)
    b = F.lit(-2.0 * GOES_H) * cosx * cosy
    c = F.lit(GOES_H**2 - GOES_REQ**2)
    disc = b**2 - F.lit(4.0) * a * c
    rs = (-b - F.sqrt(disc)) / (F.lit(2.0) * a)
    sx = rs * cosx * cosy
    sy = -rs * sinx
    sz = rs * cosx * siny
    lat = F.degrees(
        F.atan(F.lit(_REQ2_RPOL2) * sz / F.sqrt((F.lit(GOES_H) - sx) ** 2 + sy**2))
    )
    lon = F.lit(lon0_deg) - F.degrees(F.atan(sy / (F.lit(GOES_H) - sx)))
    valid = disc >= 0
    return F.struct(
        F.when(valid, lon).alias("lon"), F.when(valid, lat).alias("lat")
    )


def lonlat_to_goes(
    lon: Column | str, lat: Column | str, lon0_deg: float
) -> Column:
    """Geodetic degrees → ABI fixed-grid scan angles struct(x, y) radians
    (PUG inverse transform). Points not visible from the satellite
    (behind the limb) still produce angles; visibility filtering is the
    caller's concern, as in the reference."""
    lon, lat = _col(lon), _col(lat)
    phi_c = F.atan(F.lit(GOES_RPOL**2 / GOES_REQ**2) * F.tan(F.radians(lat)))
    rc = F.lit(GOES_RPOL) / F.sqrt(
        F.lit(1.0) - F.lit(_GOES_E2) * F.cos(phi_c) ** 2
    )
    dlon = F.radians(lon - F.lit(lon0_deg))
    sx = F.lit(GOES_H) - rc * F.cos(phi_c) * F.cos(dlon)
    sy = -rc * F.cos(phi_c) * F.sin(dlon)
    sz = rc * F.sin(phi_c)
    x = F.asin(-sy / F.sqrt(sx**2 + sy**2 + sz**2))
    y = F.atan(sz / sx)
    return F.struct(x.alias("x"), y.alias("y"))


# --------------------------------------------------------------------------
# SQL mirrors — identical formula emitted as ANSI SQL text, so the DuckDB
# oracle evaluates the same math with its own engine/libm (cross-engine
# parity check for the catalog queries).
# --------------------------------------------------------------------------


def utm_zone_sql(lon: str) -> str:
    return f"(CAST(floor(({lon} + 180.0) / 6.0) AS INT) % 60) + 1"


def utm_easting_sql(lon: str, lat: str) -> str:
    zone = utm_zone_sql(lon)
    return f"""(
  0.9996 * ({WGS84_A!r} / sqrt(1.0 - {E2!r} * sin(radians({lat}))^2)) * (
    (radians({lon} - ({zone}) * 6.0 + 183.0) * cos(radians({lat})))
    + (1.0 - tan(radians({lat}))^2 + {EP2!r} * cos(radians({lat}))^2)
      * (radians({lon} - ({zone}) * 6.0 + 183.0) * cos(radians({lat})))^3 / 6.0
    + (5.0 - 18.0 * tan(radians({lat}))^2 + tan(radians({lat}))^4
       + 72.0 * {EP2!r} * cos(radians({lat}))^2 - 58.0 * {EP2!r})
      * (radians({lon} - ({zone}) * 6.0 + 183.0) * cos(radians({lat})))^5 / 120.0
  ) + 500000.0
)"""


def utm_northing_sql(lon: str, lat: str) -> str:
    zone = utm_zone_sql(lon)
    aexp = f"(radians({lon} - ({zone}) * 6.0 + 183.0) * cos(radians({lat})))"
    t = f"tan(radians({lat}))^2"
    c = f"({EP2!r} * cos(radians({lat}))^2)"
    n = f"({WGS84_A!r} / sqrt(1.0 - {E2!r} * sin(radians({lat}))^2))"
    m = (
        f"({WGS84_A!r} * ({_M0!r} * radians({lat}) - {_M2!r} * sin(2.0 * radians({lat}))"
        f" + {_M4!r} * sin(4.0 * radians({lat})) - {_M6!r} * sin(6.0 * radians({lat}))))"
    )
    core = f"""(0.9996 * ({m} + {n} * tan(radians({lat})) * (
      {aexp}^2 / 2.0
      + (5.0 - {t} + 9.0 * {c} + 4.0 * {c}^2) * {aexp}^4 / 24.0
      + (61.0 - 58.0 * {t} + {t}^2 + 600.0 * {c} - 330.0 * {EP2!r}) * {aexp}^6 / 720.0
    )))"""
    return f"(CASE WHEN {lat} < 0 THEN {core} + 10000000.0 ELSE {core} END)"


def goes_lat_sql(x: str, y: str) -> str:
    rs = _goes_rs_sql(x, y)
    sx = f"({rs} * cos({x}) * cos({y}))"
    sy = f"(-{rs} * sin({x}))"
    sz = f"({rs} * cos({x}) * sin({y}))"
    return f"degrees(atan({_REQ2_RPOL2!r} * {sz} / sqrt(({GOES_H!r} - {sx})^2 + {sy}^2)))"


def goes_lon_sql(x: str, y: str, lon0_deg: float) -> str:
    rs = _goes_rs_sql(x, y)
    sx = f"({rs} * cos({x}) * cos({y}))"
    sy = f"(-{rs} * sin({x}))"
    return f"({lon0_deg!r} - degrees(atan({sy} / ({GOES_H!r} - {sx}))))"


def _goes_rs_sql(x: str, y: str) -> str:
    a = f"(sin({x})^2 + cos({x})^2 * (cos({y})^2 + {_REQ2_RPOL2!r} * sin({y})^2))"
    b = f"({-2.0 * GOES_H!r} * cos({x}) * cos({y}))"
    c = f"{GOES_H**2 - GOES_REQ**2!r}"
    return f"((-{b} - sqrt({b}^2 - 4.0 * {a} * {c})) / (2.0 * {a}))"
