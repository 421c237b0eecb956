"""Data-layout ordering and file-skipping audit — the 100 TB lever the
query operators sit on top of.  A Spark/parquet lakehouse prunes files
by per-file column min/max statistics; WHICH rows share a file decides
whether a selective 2-D predicate reads 1% of the data or all of it.
Z-ordering (Morton interleave, Orenstein & Merrett 1984; the technique
Delta Lake's OPTIMIZE ZORDER and Databricks data-skipping popularized)
makes file bounding boxes compact in EVERY interleaved dimension at
once, where a linear sort is compact in the leading key only.

Everything here is integer column math (shifts/masks — zero UDF, zero
Python in-plan) so the oracle replays each bit verbatim:

- ``z_order_key``  — Morton-interleave N quantized dimensions.
- ``prefix_chunks``— assign rows to layout cells by key PREFIX (the
  top bits of the z-key are exactly the quadtree cell the row would be
  written into — no global sort, no window, embarrassingly parallel;
  this is how a distributed writer lays out files: range-partition by
  key, one file per range).
- ``chunk_minmax`` — the per-file column statistics a parquet footer
  would carry (one small-key shuffle).
- ``pruning_audit``— given a conjunctive range predicate, how many
  chunks a min/max-pruning reader must open and how many rows it
  scans vs how many actually match.

Scale shape: the audit's only shuffle is the groupBy on chunk ids
(cardinality = file count, not row count); at a real 100 TB write the
chunk id IS the repartition key, so layout costs one exchange — the
same exchange the write needed anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def z_order_key(cols: Sequence[Column], bits: int = 10) -> Column:
    """Morton-interleave ``cols`` (each an integer in [0, 2**bits)) into
    one BIGINT sort key: bit b of column i lands at position
    ``b * len(cols) + i``.  len(cols) * bits must stay < 63 (ANSI mode
    throws on overflow rather than wrapping — by design)."""
    n = len(cols)
    if n * bits >= 63:
        raise ValueError(f"z-key would need {n * bits} bits (max 62)")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def prefix_chunks(key: Column, drop_bits: int) -> Column:
    """Layout cell id = the key with its ``drop_bits`` low bits dropped
    — for a z-key this is the Morton/quadtree cell (each dimension
    loses ``drop_bits // n_dims`` low bits), for a linear key a range
    bucket, for a row id an arrival-order file.  Pure projection."""
    return F.shiftright(key.cast("bigint"), drop_bits)


def chunk_minmax(
    df: DataFrame, chunk: Column, dims: dict[str, Column]
) -> DataFrame:
    """Per-chunk footer statistics: min/max of every pruning dimension
    plus the row count.  One shuffle keyed on the chunk id (cardinality
    = number of files, not rows); partial aggregation does the heavy
    lifting map-side."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, c in dims.items():
        aggs.append(F.min(c).alias(f"min_{name}"))
        aggs.append(F.max(c).alias(f"max_{name}"))
    return df.groupBy(chunk.alias("chunk")).agg(*aggs)


def pruning_audit(
    stats: DataFrame, probe: dict[str, tuple[int, int]]
) -> DataFrame:
    """Against per-chunk min/max stats, which chunks survive min/max
    pruning for the conjunctive range predicate ``probe`` (dim →
    [lo, hi] inclusive)?  Returns one row: total chunks, chunks a
    pruning reader opens, and the rows those chunks contain (the I/O
    actually paid).  A chunk survives when every dimension's
    [min, max] intersects its probe range — exactly the parquet
    row-group pruning rule."""
    keep = F.lit(True)
    for name, (lo, hi) in probe.items():
        keep = (
            keep
            & (F.col(f"min_{name}") <= F.lit(hi))
            & (F.col(f"max_{name}") >= F.lit(lo))
        )
    return stats.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(keep.cast("bigint")).alias("n_chunks_scanned"),
        F.sum(F.when(keep, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_scanned"),
    )


def layout_audit(
    df: DataFrame,
    dims: dict[str, Column],
    layouts: dict[str, Column],
    probe: dict[str, tuple[int, int]],
    drop_bits: int,
) -> DataFrame:
    """Compare file layouts on the same rows and the same predicate:
    for each named layout key, chunk by key prefix, compute footer
    stats, audit pruning, and attach the exact match count.  Output one
    row per layout — the table a layout planner reads before deciding
    how a 100 TB table is written."""
    matched = F.lit(True)
    for name, (lo, hi) in probe.items():
        matched = matched & dims[name].between(lo, hi)
    n_match = df.select(
        F.sum(matched.cast("bigint")).alias("n_rows_matched")
    )
    out = None
    for label, key in layouts.items():
        audit = pruning_audit(
            chunk_minmax(df, prefix_chunks(key, drop_bits), dims), probe
        ).select(F.lit(label).alias("layout"), "*")
        out = audit if out is None else out.unionByName(audit)
    return out.crossJoin(n_match)


def hilbert_append(
    df: DataFrame, x: Column, y: Column, bits: int = 10, out: str = "hkey"
) -> DataFrame:
    """2-D Hilbert curve index (the xy→d walk from the public
    Hilbert-curve literature, top bit down with quadrant rotation) —
    the locality-preserving alternative to the Morton key: a Hilbert
    cell is always one CONNECTED run of the curve, so per-file
    bounding boxes are never split across diagonal jumps the way
    z-order's are.

    API note: appends a COLUMN via ``bits`` chained projections rather
    than returning one Column expression — each rotation level reads
    the previous level's (hx, hy, d) MULTIPLE times, so a nested
    Column expression grows ~4^bits nodes and OOMs the driver during
    plan construction; named intermediate columns keep the tree
    linear (Catalyst's CollapseProject declines to inline non-cheap
    expressions referenced more than once, so the plan stays linear
    after optimization too).  Still pure column math, zero UDF,
    replayed stage-for-stage by the oracle."""
    cur = df.select(
        "*",
        x.cast("bigint").alias("__hx"),
        y.cast("bigint").alias("__hy"),
        F.lit(0).cast("bigint").alias("__hd"),
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(
            F.col("__hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        ry = F.when(
            F.col("__hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        cur = cur.select(
            "*", rx.alias("__rx"), ry.alias("__ry")
        ).select(
            *[c for c in cur.columns if c not in ("__hx", "__hy", "__hd")],
            (
                F.col("__hd")
                + F.lit(s * s) * (3 * F.col("__rx")).bitwiseXOR(F.col("__ry"))
            ).alias("__hd"),
            F.when(
                F.col("__ry") == 0,
                F.when(
                    F.col("__rx") == 1, F.lit(s - 1) - F.col("__hy")
                ).otherwise(F.col("__hy")),
            )
            .otherwise(F.col("__hx"))
            .alias("__hx"),
            F.when(
                F.col("__ry") == 0,
                F.when(
                    F.col("__rx") == 1, F.lit(s - 1) - F.col("__hx")
                ).otherwise(F.col("__hx")),
            )
            .otherwise(F.col("__hy"))
            .alias("__hy"),
        )
    return cur.select(
        *[c for c in df.columns], F.col("__hd").alias(out)
    )


def compaction_plan(
    files: DataFrame,
    partition_cols: Sequence[str],
    size_col: str,
    target_bytes: int,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Small-files compaction planning (the lakehouse OPTIMIZE
    bin-packing rule: within each table partition, walk files largest-
    first and cut a new compaction job every time the running total
    crosses ``target_bytes`` — a job may overshoot by at most one
    file, the documented greedy behavior real compactors share).
    Adds ``job`` (0-based per partition).

    Scale shape: one window over the FILE INVENTORY (a dim — even a
    100 TB table is ~10^6 files), partitioned by the table partition;
    the data itself is never read — compaction planning is a metadata
    operation."""
    w = Window.partitionBy(*partition_cols).orderBy(
        F.col(size_col).desc(), *[F.col(c) for c in order_cols]
    )
    cum_before = F.sum(size_col).over(w) - F.col(size_col)
    return files.withColumn(
        "job", F.floor(cum_before / F.lit(target_bytes)).cast("int")
    )
