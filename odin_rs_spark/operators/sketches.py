"""Portable, SQL-replayable sketches: HyperLogLog cardinality and
Count-Min frequency. Together with the Bloom membership screen
(`dedup.bloom_build/bloom_probe`), MinHash signatures (`dedup`), and
winnowing fingerprints (`text`), these complete the classic sketch
family a 100 TB pipeline leans on when exact answers would shuffle the
world: HLL = cardinality, CMS = frequency, Bloom = membership,
MinHash = similarity, winnowing = containment.

All hash streams derive from `portable_hash60` (md5), so every sketch
is bit-for-bit reproducible in any engine — the DuckDB oracle replays
build AND probe — and a persisted sketch survives engine migrations.
The engine-hash (xxhash64) variant is the obvious swap when
cross-engine stability is not needed.

Reference basis: the reference keeps bounded approximate state per key
(ring buffers, odin_goesr/src/lib.rs:250-287) but has no sketches;
these extend SURVEY §2.5's aggregation family per the north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from odin_rs_spark.operators.dedup import portable_hash60

# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007). Portable register statistic: the
# TRAILING-zero rank of the (60-p)-bit suffix — same geometric law as
# the classic leading-zero rank, and computable in pure integer ops in
# both engines: tz(w) = bit_count((w & -w) - 1).
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Build HLL registers: one row per (group, bucket) with the max
    rank. m = 2^p buckets; rank = trailing-zero count of the hash
    suffix + 1 (capped by the suffix width when the suffix is 0).

    Scale: ONE map-side-combinable aggregation — at most m rows per
    group survive the partial agg, so the shuffle is O(groups * m)
    regardless of input size. This is the entire pitch vs
    count(DISTINCT): no distinct-shuffle of the key universe.
    """
    m = 1 << p
    suffix_bits = 60 - p
    h = portable_hash60(F.col(key_col).cast("string"))
    bucket = (h % m).cast("int")
    w = F.shiftright(h, p)
    # tz(w) + 1; w == 0 -> max rank (suffix_bits + 1)
    rank = F.when(
        w == 0, F.lit(suffix_bits + 1)
    ).otherwise(F.bit_count((w.bitwiseAND(-w)) - 1) + 1)
    g = [F.col(c) for c in (group_cols or [])]
    return (
        df.select(*g, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*g, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 10,
    round_to: int = 2,
) -> DataFrame:
    """Estimate cardinality from registers (with the standard
    small-range linear-counting correction). Zero-valued buckets are
    implicit (registers holds only observed buckets), so V = m - rows
    and the raw sum adds (m - rows) * 2^0 for them."""
    m = 1 << p
    alpha = _hll_alpha(m)
    g = [F.col(c) for c in (group_cols or [])]
    agg = registers.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("__s"),
    )
    raw = F.lit(alpha * m * m) / (F.col("__s") + (F.lit(m) - F.col("__nonzero")))
    v = F.lit(m) - F.col("__nonzero")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        *(group_cols or []), F.round(est, round_to).alias("hll_estimate")
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
    round_to: int = 2,
) -> DataFrame:
    """HLL approximate count-distinct per group, one call."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, p), group_cols, p, round_to
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): d x w counter grid,
# est(key) = min over rows of cell counts. Always >= true count;
# overshoot <= e/w * N with prob 1 - e^-d.
# ---------------------------------------------------------------------------


def _cms_positions(h: Column, width: int, depth: int) -> list[Column]:
    """Row positions by double hashing (same scheme as the Bloom filter:
    h2 forced odd so probes never degenerate)."""
    h1 = h % width
    h2 = (F.shiftright(h, 30) % width) * 2 + 1
    return [((h1 + F.lit(i) * h2) % width).cast("int") for i in range(depth)]


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the counter grid: rows (row int, col int, cnt long), at
    most depth*width of them — broadcastable no matter the input size.
    One map-side-combinable aggregation; the shuffle moves O(d*w) cells,
    never the key stream.

    `weight_col` counts each key row that many times — the fast path for
    token streams: pre-aggregate to (key, count) first, then the md5
    hash and the depth-way cell explode run once per DISTINCT key
    instead of once per occurrence (measured ~4 s -> ~1 s at sf0.1 where
    the stream is 50x the vocabulary; the grid is bit-identical)."""
    h = portable_hash60(F.col(key_col).cast("string"))
    cells = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("row"), pos.alias("col"))
                for i, pos in enumerate(_cms_positions(h, width, depth))
            ]
        )
    ).alias("__c")
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        # NULL keys hash to NULL cell positions → (col=NULL) rows that
        # crash the query's dense fill; a NULL key has no frequency
        # semantics, so drop it here
        df.filter(F.col(key_col).isNotNull())
        .select(cells, w.cast("long").alias("__w"))
        .select(F.col("__c.row").alias("row"), F.col("__c.col").alias("col"), "__w")
        .groupBy("row", "col")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_query(
    keys: DataFrame,
    key_col: str,
    cms: DataFrame,
    width: int = 1024,
    depth: int = 4,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for each key row: min over the depth cells.
    The grid is a VALUE (<= depth*width rows by construction) — same
    contract as the Bloom bitmap — so it collects once into a literal
    array and the probe is a pure projection: zero joins, zero shuffles.
    """
    dense = [0] * (width * depth)
    for r in cms.collect():  # bounded by depth*width rows
        row, col = int(r["row"]), int(r["col"])
        if row >= depth or col >= width:
            # a sketch built with LARGER dims than the query's would
            # otherwise read wrong cells (or IndexError) — the probe
            # positions are a function of (width, depth), so the two
            # sides must agree exactly
            raise ValueError(
                f"cms cell (row={row}, col={col}) outside the queried "
                f"{depth}x{width} grid — width/depth must match cms_build"
            )
        dense[row * width + col] = int(r["cnt"])
    # ONE array Literal, not CreateArray(4096 literal children): the
    # element tree would otherwise be re-walked by every optimizer rule
    # (and duplicated under each of the depth element_at probes) —
    # measured 9.8 s -> sub-second for the whole query at sf0.1
    grid = F.lit([int(c) for c in dense])

    h = portable_hash60(F.col(key_col).cast("string"))
    cells = [
        F.element_at(grid, (F.lit(i * width) + pos + 1))
        for i, pos in enumerate(_cms_positions(h, width, depth))
    ]
    return keys.withColumn(est_col, F.least(*cells))


# ---------------------------------------------------------------------------
# DDSketch (Masson, Lee & Rim, VLDB 2019): relative-error quantiles
# from a MERGEABLE bucket map — the quantile sketch built for exactly
# the 100 TB shape: each partition reduces its values to γ-log bucket
# counts map-side, the exchange carries buckets (≤ a few hundred per
# group), merge = add counts, and any q-quantile read off the merged
# histogram is within relative α of the true value by construction.
# (Spark's approx_percentile is KLL-based and rank-accurate; DDSketch
# is VALUE-relative-accurate, the guarantee SLO latency/size metrics
# want. q102's AES-sampled quantiles are the third point in the
# space: exact on a sample.)
# ---------------------------------------------------------------------------

DD_ALPHA = 0.01


def dd_gamma(alpha: float = DD_ALPHA) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(x: Column, inv_ln_gamma: float) -> Column:
    """γ-log bucket index: ceil(ln(x)·(1/ln γ)).  1/ln γ is passed as
    a PRE-COMPUTED double literal (inlined identically into the
    DuckDB oracle) and the product is rounded to 6 decimals before
    ceil, so a 1-ulp ln() difference between libm and java.lang.Math
    cannot flip a bucket at the boundary (the q147 float-band class)."""
    return F.ceil(F.round(F.log(x) * F.lit(inv_ln_gamma), 6)).cast("int")


def ddsketch_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Per-group DDSketch: (group…, bucket, cnt) rows — the mergeable
    representation (merge of two sketches = UNION ALL + re-sum).
    Non-positive and NULL values are out of the γ-log domain and
    rejected loudly rather than binned wrong (a NULL would otherwise
    slip a `x <= 0` gate — three-valued logic — and land in a NULL
    bucket whose NULLS FIRST/LAST ordering differs between engines;
    ADVICE r9)."""
    import math

    inv = 1.0 / math.log(dd_gamma(alpha))
    x = F.col(value_col).cast("double")
    bad = df.where(x.isNull() | (x <= 0)).limit(1).count()
    if bad:
        raise ValueError(
            "DDSketch requires positive non-null values; filter first"
        )
    return (
        df.groupBy(*group_cols, dd_bucket(x, inv).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    quantiles: list[tuple[int, int]],
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Read q-quantiles off per-group sketches: k = ceil(q·n) by
    integer math (q given as num/den), the answer bucket is the
    smallest with cumulative count ≥ k, and the value estimate is the
    bucket midpoint 2γ^b/(γ+1).  One window over the per-group bucket
    rows (already tiny) — the heavy lifting happened map-side in
    ddsketch_build."""
    gamma = dd_gamma(alpha)
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = sketch.select(
        *group_cols, "bucket", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*group_cols)
        ).alias("n"),
    )
    qlit = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(num).alias("qn"), F.lit(den).alias("qd"),
                    F.lit(100 * num // den).alias("q_pct"),
                )
                for num, den in quantiles
            ]
        )
    ).alias("q")
    qq = cum.select(*group_cols, "bucket", "cum", "n", qlit).select(
        *group_cols, "bucket", "cum", "n",
        F.col("q.qn").alias("qn"), F.col("q.qd").alias("qd"),
        F.col("q.q_pct").alias("q_pct"),
    )
    k = F.floor((F.col("qn") * F.col("n") + F.col("qd") - 1) / F.col("qd"))
    hit = qq.where(F.col("cum") >= k).groupBy(*group_cols, "q_pct", "n").agg(
        F.min("bucket").alias("bucket")
    )
    est = 2.0 * F.pow(F.lit(gamma), F.col("bucket")) / (gamma + 1.0)
    return hit.select(
        *group_cols, "q_pct", "n", "bucket",
        F.round(est, 6).alias("est"),
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta et al., "Theta
# sketches", 2016). The INTERSECTION-capable member of the family: HLL
# unions beautifully (q252) but intersects only by inclusion-exclusion
# with compounding error; a KMV sketch — the k smallest distinct
# hashes — supports direct set algebra: cut both sketches at the
# shared threshold theta = min(kth_a, kth_b), intersect the surviving
# hash SETS, and scale by 1/theta. Deterministic given the hash (no
# partitioning/order sensitivity), so the DuckDB oracle replays every
# register. Scale shape: the only wide exchange is distinct(group, h)
# — already-reduced keys; the per-group sort runs over distinct hashes
# only, and an epoch pipeline pre-filters h < theta_prev before the
# sort, capping window input at ~k rows per group.
# ---------------------------------------------------------------------------

KMV_SPACE = 1 << 60  # portable_hash60 range


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch rows: (group_cols..., rank, h) with the k
    smallest distinct 60-bit portable hashes of `key_col`, rank 1..k.
    A group with fewer than k distinct keys keeps them ALL (its sketch
    is the exact set and estimates become exact)."""
    if k < 2:
        raise ValueError("kmv k must be >= 2")
    h = portable_hash60(F.col(key_col).cast("string"))
    dist = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate per group: exact count when the sketch
    holds the whole set (n_sk < k), else (k-1) / (kth_min / 2^60)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("kth")
    )
    est = F.when(F.col("n_sk") < k, F.col("n_sk").cast("double")).otherwise(
        (k - 1) * float(KMV_SPACE) / F.col("kth")
    )
    return agg.select(*group_cols, "n_sk", "kth", F.round(est, 6).alias("est"))


def kmv_intersect(
    sketch: DataFrame, group_cols: list[str], group_col: str, k: int
) -> DataFrame:
    """Pairwise theta-sketch intersection estimates across the values
    of `group_col` (sketch built by kmv_sketch on that single group
    column). Returns one row per unordered pair (ta < tb): the shared
    theta threshold, surviving-common count, and the scaled estimate.
    theta for a side with a complete sketch (n_sk < k) is the full
    space, so exact sides degrade gracefully to exact intersections."""
    if group_cols != [group_col]:
        raise ValueError("kmv_intersect expects the single grouping column")
    kth = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("kth")
    )
    side = kth.select(
        F.col(group_col).alias("g"),
        "n_sk",
        F.when(F.col("n_sk") < k, F.lit(KMV_SPACE)).otherwise(
            F.col("kth")
        ).alias("theta"),
    )
    pairs = (
        side.alias("a")
        .join(side.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(
            F.col("a.g").alias("ta"),
            F.col("b.g").alias("tb"),
            F.col("a.n_sk").alias("nsk_a"),
            F.col("b.n_sk").alias("nsk_b"),
            F.least("a.theta", "b.theta").alias("theta"),
        )
    )
    sa = sketch.select(F.col(group_col).alias("ta"), F.col("h").alias("ha"))
    sb = sketch.select(F.col(group_col).alias("tb"), F.col("h").alias("ha"))
    common = (
        pairs.join(sa, "ta")
        .where(F.col("ha") < F.col("theta"))
        .join(sb, ["tb", "ha"])
    )
    counts = common.groupBy("ta", "tb", "theta").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common")
    )
    out = pairs.join(counts, ["ta", "tb", "theta"], "left").na.fill(
        {"n_common": 0}
    )
    est = F.col("n_common") * float(KMV_SPACE) / F.col("theta")
    return out.select(
        "ta", "tb", "nsk_a", "nsk_b", "theta", "n_common",
        F.round(est, 6).alias("est_inter"),
    )
