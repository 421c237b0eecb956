"""Aggregation operators (SURVEY §2.5, A1-A8).

All built-in hash aggregations → map-side partial aggregation + one
shuffle on the group keys; no UDAFs needed anywhere in the reference's
inventory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_counts(
    df: DataFrame, keys: list[str], classes: dict[str, Column]
) -> DataFrame:
    """A1 — per-group conditional counts (n_good/n_high/... per hotspot
    batch, odin_goesr/src/lib.rs:190-218): sum(when(cond,1)) per class,
    one pass."""
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(name)
        for name, cond in classes.items()
    ]
    aggs.append(F.count(F.lit(1)).alias("n_total"))
    return df.groupBy(*keys).agg(*aggs)


def hourly_minute_histogram(df: DataFrame, ts: str) -> DataFrame:
    """A2 — arrival-minute histogram used to learn availability schedules
    (get_hourly_schedule_histogram, odin_common/src/schedule.rs:35-95)."""
    return (
        df.groupBy(F.minute(F.col(ts)).alias("minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("minute")
    )


def schedule_stats(df: DataFrame, ts: str, step_key: str) -> DataFrame:
    """A3 — per-step avg/max arrival minute (HRRR learned schedules,
    odin_hrrr/src/schedule.rs:75-171)."""
    m = F.minute(F.col(ts))
    return df.groupBy(step_key).agg(
        F.avg(m).alias("avg_minute"),
        F.max(m).alias("max_minute"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def running_stats(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """A4/A5 — streaming-style mean/min/max/stddev accumulation
    (odin_image/src/lib.rs:53-98 Stats::add). Batch form: one hash agg;
    in streaming the same expression runs incrementally per micro-batch.
    """
    v = F.col(value)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.avg(v).alias("mean"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.stddev_samp(v).alias("stddev"),
    )


def histogram(df: DataFrame, value: str, bin_width: float, lo: float = 0.0) -> DataFrame:
    """A7 — fixed-width binning (256-bin luminance histogram,
    odin_image/src/lib.rs:149-172)."""
    bin_idx = F.floor((F.col(value) - F.lit(lo)) / F.lit(bin_width)).cast("long")
    return df.groupBy(bin_idx.alias("bin")).agg(F.count(F.lit(1)).alias("n")).orderBy("bin")


def histogram_distance(h1: DataFrame, h2: DataFrame, bin_col: str = "bin") -> DataFrame:
    """A8 — histogram compare metric (odin_image/src/lib.rs:241-246):
    normalized L1 distance over aligned bins (outer join, missing=0)."""
    a = h1.select(F.col(bin_col), F.col("n").alias("n1"))
    b = h2.select(F.col(bin_col), F.col("n").alias("n2"))
    joined = a.join(b, bin_col, "full").fillna(0, subset=["n1", "n2"])
    return joined.agg(
        (
            F.sum(F.abs(F.col("n1") - F.col("n2")))
            / F.greatest(F.sum("n1") + F.sum("n2"), F.lit(1))
        ).alias("l1_distance")
    )


def group_percentiles(
    df: DataFrame,
    keys: list[str],
    value: str,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    round_to: int = 6,
) -> DataFrame:
    """Exact linear-interpolation percentiles per group (the definition
    both Spark `percentile` and DuckDB `quantile_cont` implement, so the
    oracle matches bit-for-bit after rounding).

    Exact percentile is a sort-based aggregate — fine at dashboard-level
    group counts; for high-cardinality keys at 100 TB switch to
    `approx_percentile` (t-digest, no per-group sort) and drop the
    oracle to tolerance."""
    aggs = [
        F.round(F.percentile(F.col(value), F.lit(p)), round_to).alias(
            f"p{int(p * 100)}"
        )
        for p in percentiles
    ]
    return df.groupBy(*keys).agg(*aggs)


def approx_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct-count per group (`approx_count_distinct`).

    The scale path for cardinality: constant memory per group vs the
    exact count's per-key state, mergeable map-side. Not oracle-checked
    (engines' HLL implementations differ by design); tests pin the
    relative error against the exact count instead.
    """
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value, rsd).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def profile_columns(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """Deequ-style single-pass column profiling — the ANALYZE/data-
    quality primitive a 100 TB ingest runs before anything else:
    per column, row count, null count/fraction, exact distinct count,
    and min/max (numeric columns as doubles, timestamps as epoch
    micros; strings carry NULL bounds). ``cols`` maps column name →
    'numeric' | 'timestamp' | 'string'.

    Scale shape: ONE aggregation pass over the table computes every
    metric (count_distinct over several columns plans as a single
    expand + partial agg), then the single result row explodes into
    per-column rows driver-side — the output is a dim, the input is
    scanned once."""
    aggs = [F.count(F.lit(1)).alias("__N")]
    for c, kind in cols.items():
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
        if kind == "numeric":
            v = F.col(c).cast("double")
        elif kind == "timestamp":
            v = F.unix_micros(F.col(c)).cast("double")
        else:
            v = F.lit(None).cast("double")
        aggs.append(F.min(v).alias(f"__lo_{c}"))
        aggs.append(F.max(v).alias(f"__hi_{c}"))
    row = df.agg(*aggs)
    # one exploded struct array, NOT a union of per-column selects — a
    # union re-plans the aggregation per branch (measured: 6 parquet
    # scans for 6 columns; exchange reuse does not rescue it), which
    # silently breaks the single-pass contract this operator exists for
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__N").alias("n_rows"),
                (F.col("__N") - F.col(f"__n_{c}")).alias("n_null"),
                F.round(
                    (F.col("__N") - F.col(f"__n_{c}")) / F.col("__N"), 6
                ).alias("null_frac"),
                F.col(f"__d_{c}").alias("n_distinct"),
                F.col(f"__lo_{c}").alias("min_num"),
                F.col(f"__hi_{c}").alias("max_num"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(structs).alias("s")).select("s.*")
