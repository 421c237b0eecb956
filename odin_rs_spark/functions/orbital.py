"""Orbital-geometry column functions (SURVEY §2.9 "Orbital"; parity
targets: swath half-width from scan angle odin_orbital/src/
overpass.rs:535, inclination helpers overpass.rs:539-546).

Closed-form spherical geometry only (public textbook formulas). Full
SGP4 propagation is an external concern (the reference wraps the sgp4
crate); the engine consumes propagated ground tracks as ordinary
(ts, lon, lat) rows — see nearest_join (J8) and interval_join (J3) for
the overpass queries they feed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from odin_rs_spark.functions.geo import EARTH_RADIUS_KM, _col


def swath_half_width_km(scan_angle_rad: Column | str | float, altitude_km: Column | str | float) -> Column:
    """Ground half-width of a side-scanning sensor: Earth-central angle
    λ = asin((Re+h)/Re · sin(scan)) − scan, arc = Re·λ. (Standard
    spherical look-angle geometry; e.g. VIIRS scan 56.28°, h 833 km →
    ≈1550 km half, 3060 km swath.)"""
    scan = F.lit(scan_angle_rad) if isinstance(scan_angle_rad, (int, float)) else _col(scan_angle_rad)
    h = F.lit(altitude_km) if isinstance(altitude_km, (int, float)) else _col(altitude_km)
    ratio = (F.lit(EARTH_RADIUS_KM) + h) / F.lit(EARTH_RADIUS_KM)
    lam = F.asin(F.least(ratio * F.sin(scan), F.lit(1.0))) - scan
    return F.lit(EARTH_RADIUS_KM) * lam


def max_reachable_latitude_deg(inclination_deg: Column | str | float) -> Column:
    """Highest geodetic latitude a ground track reaches: the inclination
    itself for prograde (< 90°), its supplement for retrograde orbits
    (sun-synchronous ~98° → 82°)."""
    inc = F.lit(inclination_deg) if isinstance(inclination_deg, (int, float)) else _col(inclination_deg)
    return F.least(inc, F.lit(180.0) - inc)


def orbital_period_min(altitude_km: Column | str | float) -> Column:
    """Circular-orbit period in minutes: 2π√(a³/μ), a = Re+h,
    μ = 398600.4418 km³/s²."""
    h = F.lit(altitude_km) if isinstance(altitude_km, (int, float)) else _col(altitude_km)
    a = F.lit(EARTH_RADIUS_KM) + h
    return F.lit(2.0 * 3.141592653589793) * F.sqrt(F.pow(a, 3) / F.lit(398600.4418)) / F.lit(60.0)
