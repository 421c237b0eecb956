"""Skew and co-location tools for 100 TB operation (SURVEY §7.0 scale
rules; the reference is single-process, so ALL of this is new design
surface the Spark engine provides — §4.2).

Hot-key reality in this domain: one fire = thousands of hotspots per
(region, hour); one busy airport = a dense icao24 neighborhood. AQE's
skew-join splitting handles the join case at runtime; these helpers
cover the two cases AQE does not: skewed AGGREGATION keys, and
map-side-combinable rollups you want shuffled pre-reduced.

  salted_count_agg   two-stage aggregation through a salted key
  salted_join        replicate-broadcast salting for a skewed join key
  partitioned_layout bronze layout partitioned (source, date, hour) —
                     the reference's S3 prefix scheme as partition dirs
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation via a random salt column: stage 1 reduces
    (key, salt) partials — splitting a hot key over `salt_buckets`
    reducers — stage 2 merges partials per key.

    `aggs` maps output column name → SUM-mergeable expression (counts,
    sums; avg = sum/count composed by the caller). For algebraic
    aggregates Spark's map-side partial aggregation often suffices; use
    this when a single key dominates entire partitions (the one-fire
    case) and stage-1 partials must themselves be distributed.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed fact side, replicate the dim
    side once per salt bucket (explode), join on (key, salt). Use when
    the dim side is too big to broadcast but the fact key is hot;
    otherwise prefer broadcast() or AQE's skew-join.

    Dim replication cost: |dim| × salt_buckets rows through one shuffle —
    bounded and chosen explicitly, unlike the straggler task it removes.

    Only inner/left joins are supported: under right/full-outer, every
    UNMATCHED dim key would survive once per salt replica — silent
    salt_buckets× row multiplication.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): an "
            "outer join would emit one row per salt replica for every "
            "unmatched dim key"
        )
    fact = skewed.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = fact.join(dim_rep, [key, "__salt"], how)
    return out.drop("__salt")


def partitioned_layout(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    source_col: Column | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write the canonical bronze layout: partitioned by
    (source, date, hour) — the directory shape of the reference's S3
    prefixes (source/yyyy/ddd/hh, odin_goesr/src/lib.rs:381-389), which
    turns every time/source predicate into partition pruning for both
    batch scans and file-stream sources."""
    out = df.withColumn("p_date", F.to_date(F.col(ts_col))).withColumn(
        "p_hour", F.hour(F.col(ts_col))
    )
    parts = ["p_date", "p_hour"]
    if source_col is not None:
        c = F.col(source_col) if isinstance(source_col, str) else source_col
        out = out.withColumn("p_source", c)
        parts = ["p_source", "p_date", "p_hour"]
    out.write.mode(mode).partitionBy(*parts).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32, sort: bool = True
) -> None:
    """Persist a table bucketed (and sorted) on the join key: two tables
    bucketed identically join with NO shuffle on either side — the
    co-located join for repeated big-big joins (orders ⋈ lineitem every
    round; hotspot ⋈ DEM-cell at fixed quantization)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative cell coordinates
    into one locality-preserving sort key: bit i of x lands at 2i, bit i
    of y at 2i+1.

    Why it matters at 100 TB: range-partitioning + sorting a spatial
    cell table by this key gives parquet row groups whose (x, y) min/max
    boxes are compact, so a bbox predicate prunes most row groups at
    scan time — the DataFrame-native equivalent of a spatial index (and
    of Z-ordered data layout in lakehouse table formats). Pure integer
    expression: 2·bits getbit/shift terms, whole-stage-codegen friendly.
    """
    # same bit layout as the N-ary operators/layout.z_order_key (x on
    # even bits, y on odd) — delegate so there is one Morton kernel
    from odin_rs_spark.operators.layout import z_order_key

    return z_order_key([x, y], bits=bits)


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Write a cell table range-partitioned and sorted by the Morton key
    so bbox scans prune row groups via parquet min/max statistics."""
    (
        df.withColumn("__z", zorder_key(F.col(x), F.col(y), bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    nodes: list[str],
    out_col: str = "node",
) -> DataFrame:
    """Rendezvous / highest-random-weight hashing (Thaler & Ravishankar
    1998) — the stable work partitioner a crawl fleet runs on: each key
    (a host, a shard, a queue) scores every node by a portable hash of
    (key, node) and is owned by the highest score. Unlike `hash(key) %
    n`, removing one node reassigns ONLY the keys that node owned
    (1/n of them) — every other key's argmax is untouched — so a
    fetcher dying mid-crawl does not reshuffle the whole frontier's
    politeness state.

    Weight = md5(key || '|' || node): equal-length lowercase hex
    compares identically as a string in every engine, so the argmax is
    portable and the oracle replays it verbatim. Zero shuffle, zero
    UDF: one array_max over a transformed literal node array per row —
    O(n_nodes) comparisons, the same cost the real router pays."""
    arr = F.array(*[F.lit(n) for n in nodes])
    best = F.array_max(
        F.transform(
            arr,
            lambda n: F.struct(
                F.md5(F.concat(F.col(key_col), F.lit("|"), n)).alias("w"),
                n.alias("node"),
            ),
        )
    )
    return df.withColumn(out_col, best["node"])
