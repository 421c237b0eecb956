"""Join operators (SURVEY §2.4, J1-J8).

The reference has no relational join executor — its "joins" are explicit
store lookups. Here each becomes a declarative DataFrame join that
Catalyst can broadcast / sort-merge / AQE-skew-split. The scale-critical
design rules:

- as-of joins: union + window (one shuffle, no N×M explosion);
- interval joins: coarse time-bucket equi-key first so Catalyst gets an
  equi-join instead of a pure-theta nested loop;
- spatial point lookups: quantized-cell equi-join keys (J1/J7);
- small dimensions: explicit broadcast (J5/J6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from odin_rs_spark.functions.geo import EARTH_RADIUS_KM, quantize_cell


def _contains_map(dt) -> bool:
    """True if the data type is (or transitively contains) a MapType —
    Spark's analysis-time orderability rule: such types can't appear
    anywhere inside a sort key, even in a position comparison would
    never reach."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_r",
    right_order: str | None = None,
) -> DataFrame:
    """J2 — as-of join: for each left row, the latest right row with
    right.ts <= left.ts (direction='backward'; 'forward' = earliest
    right.ts >= left.ts), per key. Left join semantics (unmatched → null).

    Semantics target: get_closest_record_idx / get_position_at
    (odin_sentinel/src/lib.rs:781-846), restated as the classic
    union+window as-of algorithm: tag both sides, union on (key, ts),
    carry the latest right payload across the ordered frame, keep left
    rows. ONE shuffle on the key — no range explosion, so this survives
    100× scale-up where a theta-join (O(N·M) per key) would not.

    Deterministic tie-breaks: right rows at exactly left.ts DO match;
    among right rows with equal ts, the max(right_order) wins for
    backward / min(right_order) for forward (pass e.g. an id column).

    Output: all left columns + right payload columns (suffixed on name
    collision) + the matched right timestamp as f"{ts}{suffix}".
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = left.columns
    rcols = [c for c in right.columns if c not in (on, ts)]
    r_out = [f"{c}{suffix}" if c in lcols else c for c in rcols]

    rtypes = dict(right.dtypes)
    rstruct = "struct<" + ",".join(f"`{c}`:{rtypes[c]}" for c in rcols) + ">"
    ltypes = dict(left.dtypes)
    lstruct = "struct<" + ",".join(f"`{c}`:{ltypes[c]}" for c in lcols) + ">"

    # the lhs NULL tiebreak must carry the SAME type as the right-side
    # order column — a hardcoded long fails unionByName analysis for
    # string/timestamp orders (or lexicographic-coerces numeric strings)
    tb_type = dict(right.dtypes)[right_order] if right_order else "long"
    tb = (F.col(right_order) if right_order else F.lit(None).cast("long")).alias("__tb")
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        F.lit(None).cast(rstruct).alias("__rrow"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(0).alias("__side"),
        tb,
        F.lit(None).cast(lstruct).alias("__lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("__rrow"),
    )
    unioned = lhs.unionByName(rhs)
    r_match = F.when(
        F.col("__side") == 0, F.struct(F.col("__t").alias("__rts"), F.col("__rrow"))
    )

    if direction == "backward":
        # at equal ts: right (side 0) sorts first → visible to left (<=);
        # equal-ts right rows: last() picks max __tb.
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = unioned.withColumn("__match", F.last(r_match, ignorenulls=True).over(w))
    else:
        # at equal ts: left (side 1) sorts first → sees right (>=);
        # equal-ts right rows: first() picks min __tb.
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__side").desc(), F.col("__tb").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        matched = unioned.withColumn("__match", F.first(r_match, ignorenulls=True).over(w))

    out = matched.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        delta = (
            F.abs(F.unix_micros(F.col("__match.__rts")) - F.unix_micros(F.col("__t")))
            / F.lit(1e6)
        )
        out = out.withColumn(
            "__match", F.when(delta <= F.lit(tolerance_sec), F.col("__match"))
        )

    sel = [F.col(f"__lrow.`{c}`").alias(c) for c in lcols]
    sel.append(F.col("__match.__rts").alias(f"{ts}{suffix}"))
    sel += [F.col(f"__match.__rrow.`{src}`").alias(dst) for src, dst in zip(rcols, r_out)]
    return out.select(*sel)


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    extra_key: tuple[str, str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """J3 — assign each fact row to the interval(s) covering its timestamp
    (find_covering_overpass, odin_orbital/src/firms.rs:499-533).

    Scale design: explode each interval into the hour buckets it overlaps
    and equi-join on (bucket [, extra_key]); the exact range predicate
    applies after the hash join. A raw `ts BETWEEN start AND end` join is
    a nested loop — O(N·M) at 100 TB. Works best when intervals span
    a bounded number of hours (the reference's overpasses span minutes).
    Each fact has exactly one bucket → no dup matches per interval.
    """
    # end < start (clock skew, corrupt upstream row) would throw inside
    # F.sequence and kill the job; an inverted interval matches nothing,
    # so drop it — the skippable-corruption contract the decode ops use
    intervals = intervals.filter(F.col(end) >= F.col(start))
    binned = intervals.withColumn(
        "__bucket",
        F.explode_outer(
            F.sequence(
                F.date_trunc("hour", F.col(start)),
                F.date_trunc("hour", F.col(end)),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    fact_b = fact.withColumn("__bucket", F.date_trunc("hour", F.col(ts)))
    cond = (fact_b["__bucket"] == binned["__bucket"]) & fact_b[ts].between(
        binned[start], binned[end]
    )
    if extra_key is not None:
        cond = cond & (fact_b[extra_key[0]] == binned[extra_key[1]])
    return fact_b.join(binned, cond, how).drop("__bucket")


def quantized_point_join(
    points: DataFrame,
    cells: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_x: str = "x",
    cell_y: str = "y",
    resolution_deg: float = 1.0 / 120.0,
    how: str = "left",
    broadcast_cells: bool = True,
) -> DataFrame:
    """J1/J7 — spatial point lookup as a quantized-coordinate equi-join
    (DEM altitude enrichment, odin_goesr/src/lib.rs:227-245 +
    odin_dem/src/lib.rs:260-299).

    The raster side is keyed by integer cell indices; points quantize
    lon/lat to the same lattice and hash-join. DEM tiles are small
    relative to fact data → broadcast by default.
    """
    pts = points.withColumn("__cx", quantize_cell(lon, resolution_deg)).withColumn(
        "__cy", quantize_cell(lat, resolution_deg)
    )
    # rename the raster key columns BEFORE the join: DataFrame.drop by
    # NAME would otherwise also delete same-named columns from the
    # points side (x/y is the universal cell convention, so collisions
    # are the norm, not the exception)
    rhs = cells.withColumnRenamed(cell_x, "__rx").withColumnRenamed(cell_y, "__ry")
    rhs = F.broadcast(rhs) if broadcast_cells else rhs
    out = pts.join(
        rhs, (F.col("__cx") == F.col("__rx")) & (F.col("__cy") == F.col("__ry")), how
    )
    return out.drop("__cx", "__cy", "__rx", "__ry")


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """J5/J6 — explicit broadcast of a small dimension (satellite info,
    station metadata: odin_orbital/src/lib.rs:76-126, odin_fems/src/lib.rs:710-783)."""
    return fact.join(F.broadcast(dim), on, how)


def evidence_join(
    records: DataFrame,
    refs_col: str,
    store: DataFrame,
    store_id: str = "id",
    how: str = "left",
) -> DataFrame:
    """J4 — resolve an array of record-id refs against the record store
    (alarm evidences, odin_sentinel/src/alarm.rs:276-338): explode + equi-join.

    With how='left', records whose refs array is empty or NULL are KEPT
    (one row, NULL evidence columns) — plain explode would silently drop
    them before the join ever saw the left-ness."""
    exploder = F.explode_outer if how == "left" else F.explode
    exploded = records.withColumn("__ref", exploder(F.col(refs_col)))
    renamed = store.select(
        F.col(store_id).alias("__store_id"),
        *[F.col(c).alias(f"ev_{c}") for c in store.columns if c != store_id],
    )
    return exploded.join(renamed, F.col("__ref") == F.col("__store_id"), how).drop("__store_id")


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    distance: Column,
    left_key: str,
    k: int = 1,
    coarse_key: tuple[Column, Column] | None = None,
    tiebreak: list[str] | None = None,
    payload: list[str] | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """J8 — k-nearest join (closest ground-track point,
    odin_orbital/src/overpass.rs:148-171): cross/coarse join + per-left-key
    rank on distance.

    For scale supply `coarse_key` (e.g. quantized spatial buckets on both
    sides) to turn the cross join into an equi-join; without it this is a
    broadcast NLJ suitable only when one side is small.

    `payload` restricts the output columns (besides left_key and __dist)
    — on the k=1 fast path every joined row materializes a struct, so
    packing only the columns the caller needs (e.g. just the matched
    right key) measurably cuts the per-row allocation on |L|×|R| rows.

    `parallelism` round-robin-repartitions the left side before the
    join: the distance stage does |L|×|R| math, so it must run at full
    width even when the upstream scan arrives in few/skewed partitions
    (a local single-row-group parquet file is ONE task otherwise — the
    tiny |L|-row shuffle buys back every core).
    """
    if parallelism:
        left = left.repartition(parallelism)
    if coarse_key is not None:
        joined = left.join(right, coarse_key[0] == coarse_key[1])
    else:
        joined = left.crossJoin(F.broadcast(right))
    joined = joined.withColumn("__dist", distance)
    # Ordering key for every path is (dist, tiebreaks, __sid) — NEVER the
    # payload: a __sid surrogate makes the ordering total, so ties past
    # the caller's declared tiebreaks are broken arbitrarily instead of
    # by silently comparing payload content, and non-orderable payload
    # types (MapType) stay out of sort keys entirely. `payload=[]` is
    # honored as "key + distance only" (`None` means all columns) —
    # `payload or [...]` used to swallow the explicit empty list.
    joined = joined.withColumn("__sid", F.monotonically_increasing_id())
    sort_key = F.struct(
        F.col("__dist").alias("d"),
        *[F.col(c).alias(f"t{i}") for i, c in enumerate(tiebreak or [])],
        F.col("__sid").alias("s"),
    )
    if k == 1:
        # min/min_by fast path: lexicographic aggregations get map-side
        # partial aggregation, so only |left| rows shuffle — the
        # window-rank path shuffles the FULL |left|×|right| product
        # (measured 5× on the ground-track query). min_by carries the
        # payload struct without requiring it to be orderable. Requires
        # left_key to identify left rows (duplicates collapse to one
        # winner).
        if payload is None:
            payload = [c for c in joined.columns if c not in ("__dist", "__sid")]
        pay = [c for c in payload if c != left_key]
        aggs = [F.min(sort_key).alias("__m")]
        if pay:
            aggs.append(
                F.min_by(F.struct(*[F.col(c) for c in pay]), sort_key).alias("__row")
            )
        m = joined.groupBy(left_key).agg(*aggs)
        return m.select(
            F.col(left_key),
            *([F.col("__row.*")] if pay else []),
            F.col("__m.d").alias("__dist"),
        )
    if payload is None:
        payload = [c for c in joined.columns if c not in (left_key, "__dist", "__sid")]
    if any(_contains_map(joined.schema[c].dataType) for c in payload):
        # Map-typed payloads can't ride inside a sorted struct even as a
        # trailing field (orderability is an analysis-time property of
        # the whole element type) — fall back to the window-rank plan,
        # which sorts only (dist, tiebreaks, sid) and carries payload as
        # plain columns. Costs a full |L|×|R| shuffle; correct for any
        # payload type.
        w = Window.partitionBy(left_key).orderBy(
            F.col("__dist").asc(),
            *[F.col(c).asc() for c in (tiebreak or [])],
            F.col("__sid").asc(),
        )
        return (
            joined.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .select(left_key, *payload, "__dist")
        )
    # k>1: aggregate a NARROW struct per candidate and take the k
    # smallest per left key with slice(array_sort(...)). The former
    # window-rank plan shuffled the FULL |L|×|R| joined rows; this
    # shuffles |L|×|R| minimal (__dist, tiebreaks, payload) structs —
    # same row count but a fraction of the bytes when the joined row is
    # wide — and the sort runs per-group in the aggregate, not as a
    # global partition sort. Per-group state is |R| minimal structs,
    # bounded by the broadcast-size right side this operator targets.
    cand = F.struct(
        F.col("__dist").alias("d"),
        *[F.col(c).alias(f"t{i}") for i, c in enumerate(tiebreak or [])],
        F.col("__sid").alias("s"),
        *(
            [F.struct(*[F.col(c) for c in payload]).alias("row")]
            if payload
            else []
        ),
    )
    topk = joined.groupBy(left_key).agg(
        F.slice(F.array_sort(F.collect_list(cand)), 1, k).alias("__top")
    )
    return topk.select(
        F.col(left_key), F.explode("__top").alias("__m")
    ).select(
        left_key,
        *([F.col("__m.row.*")] if payload else []),
        F.col("__m.d").alias("__dist"),
    )


def nearest_inline_join(
    left: DataFrame,
    right: DataFrame,
    dist_fn,
    tiebreak: list[str] | None = None,
    payload: list[str] | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """J8 fast shape for k=1 with a SMALL right side: pack the right
    table into one array-of-structs row, broadcast it, and take the
    per-left-row argmin with array_min — a pure map-side reduction.

    Compared to cross-join + aggregate this materializes no |L|×|R|
    rows, shuffles nothing (beyond a 1-row broadcast), and needs no
    aggregation state: the ideal plan when |R| fits a broadcast (the
    ground-track case: |R|=100). dist_fn maps a right-row struct to a
    distance Column (it may reference left columns via F.col).

    Output: all left columns + matched right `payload` columns + __dist.
    """
    if parallelism:
        left = left.repartition(parallelism)
    rcols = right.columns
    packed = right.select(F.struct(*rcols).alias("__r")).agg(
        F.collect_list("__r").alias("__rarr")
    )
    tb = tiebreak or []
    pay = payload if payload is not None else rcols
    # struct comparison falls through field by field, so two guards
    # keep the argmin honest: NULL distances sort LAST (coalesce to
    # +inf — a NULL-dist right row must never win), and the payload
    # fields are fenced off behind a unique per-row index `i` so ties
    # never compare payload content (which may be unorderable — maps —
    # or simply not a documented tiebreak)
    fields = lambda t, i: (  # noqa: E731
        [F.coalesce(dist_fn(t), F.lit(float("inf"))).alias("d")]
        + [t[c].alias(f"t{j}") for j, c in enumerate(tb)]
        + [i.alias("__ri")]
        + [t[c].alias(f"p_{c}") for c in pay]
    )
    best = F.array_min(
        F.transform(F.col("__rarr"), lambda t, i: F.struct(*fields(t, i)))
    )
    out_cols = [c for c in left.columns]
    return (
        left.crossJoin(F.broadcast(packed))
        .withColumn("__best", best)
        .select(
            *out_cols,
            *[F.col(f"__best.p_{c}").alias(c) for c in pay],
            F.col("__best.d").alias("__dist"),
        )
    )


def haversine_nearest_join(
    left: DataFrame,
    right: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    r_lon: str = "t_lon",
    r_lat: str = "t_lat",
    r_key: str = "track_idx",
    round_to: int = 6,
    parallelism: int | None = None,
) -> DataFrame:
    """J8 vectorized shape: k=1 great-circle nearest against a
    driver-small right side (the ground-track case, |R|≈100).

    `nearest_inline_join` with a haversine dist_fn evaluates ~|R|
    interpreted HOF-lambda trig expressions per left row (higher-order
    functions don't enter whole-stage codegen). Here the whole |batch|×|R|
    distance matrix is ONE numpy pass per Arrow batch; the right side is
    collected (small by contract) and rides in the UDF closure with its
    cos(lat) precomputed. Distances round HALF_UP to `round_to` before
    the argmin — floor(x·10^r + 0.5), matching SQL round() — and ties go
    to the lowest r_key (rows are key-sorted, argmin takes the first).

    Output: all left columns + r_key + __dist (the rounded distance).
    """
    if parallelism:
        left = left.repartition(parallelism)
    rows = sorted(right.select(r_key, r_lon, r_lat).collect(), key=lambda r: r[0])
    if not rows:
        # argmin over a zero-width axis would raise inside every
        # executor task — fail fast at the driver with the actual cause
        raise ValueError(
            "haversine_nearest_join: right side is empty — nothing to "
            "match against"
        )
    keys = np.asarray([r[0] for r in rows], dtype=np.int64)
    tlon = np.asarray([float(r[1]) for r in rows])
    tlat = np.asarray([float(r[2]) for r in rows])
    tlat_cos = np.cos(np.radians(tlat))
    scale = 10.0**round_to
    radius2 = 2.0 * EARTH_RADIUS_KM

    @pandas_udf(f"struct<{r_key}: bigint, __dist: double>")
    def _nn(lo: pd.Series, la: pd.Series) -> pd.DataFrame:
        lo_ = lo.to_numpy(dtype=np.float64)
        la_ = la.to_numpy(dtype=np.float64)
        if len(lo_) == 0:
            return pd.DataFrame(
                {r_key: pd.Series([], dtype="int64"), "__dist": pd.Series([], dtype="float64")}
            )
        dphi = np.radians(tlat[None, :] - la_[:, None]) / 2.0
        dlmb = np.radians(tlon[None, :] - lo_[:, None]) / 2.0
        a = (
            np.sin(dphi) ** 2
            + np.cos(np.radians(la_))[:, None] * tlat_cos[None, :] * np.sin(dlmb) ** 2
        )
        d = radius2 * np.arcsin(np.sqrt(a))
        dr = np.floor(d * scale + 0.5) / scale
        j = dr.argmin(axis=1)
        return pd.DataFrame({r_key: keys[j], "__dist": dr[np.arange(len(j)), j]})

    res = left.withColumn("__nn", _nn(F.col(lon), F.col(lat)))
    return res.select(*left.columns, f"__nn.{r_key}", "__nn.__dist")
