"""3-vector column math on struct(x,y,z) columns (SURVEY §2.9 "Vector
math"; parity target odin_common/src/cartesian3.rs:91-155).

All closed-form column expressions; combine with functions.geo.ecef_*
to run ECEF geometry (angles between ground tracks, surface normals)
fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec3(x: Column | float, y: Column | float, z: Column | float) -> Column:
    c = lambda v: F.lit(v) if isinstance(v, (int, float)) else v  # noqa: E731
    return F.struct(c(x).alias("x"), c(y).alias("y"), c(z).alias("z"))


def dot3(a: Column, b: Column) -> Column:
    return a["x"] * b["x"] + a["y"] * b["y"] + a["z"] * b["z"]


def cross3(a: Column, b: Column) -> Column:
    return F.struct(
        (a["y"] * b["z"] - a["z"] * b["y"]).alias("x"),
        (a["z"] * b["x"] - a["x"] * b["z"]).alias("y"),
        (a["x"] * b["y"] - a["y"] * b["x"]).alias("z"),
    )


def norm3(a: Column) -> Column:
    return F.sqrt(dot3(a, a))


def unit3(a: Column) -> Column:
    n = norm3(a)
    return F.struct(
        (a["x"] / n).alias("x"), (a["y"] / n).alias("y"), (a["z"] / n).alias("z")
    )


def angle_between(a: Column, b: Column) -> Column:
    """Angle in radians, numerically clamped (acos of a ratio that can
    drift past ±1 in the last ulp)."""
    cosv = dot3(a, b) / (norm3(a) * norm3(b))
    return F.acos(F.least(F.greatest(cosv, F.lit(-1.0)), F.lit(1.0)))


def scale3(a: Column, s: Column | float) -> Column:
    sc = F.lit(s) if isinstance(s, (int, float)) else s
    return F.struct(
        (a["x"] * sc).alias("x"), (a["y"] * sc).alias("y"), (a["z"] * sc).alias("z")
    )
