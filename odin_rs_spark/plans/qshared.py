"""Shared base for the split query catalog (r11): imports, the
QuerySpec record and the cross-family helpers. The determinism
rules and the registry live in plans/catalog.py; the query
families live in catalog_core / catalog_media / catalog_web /
catalog_lake, chained by wildcard re-export."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from odin_rs_spark.operators import aggregations as agg_ops
from odin_rs_spark.operators import dedup as dedup_ops
from odin_rs_spark.operators import filters as filter_ops
from odin_rs_spark.operators import joins as join_ops
from odin_rs_spark.operators import raster as raster_ops
from odin_rs_spark.operators import setops
from odin_rs_spark.operators import similarity as sim_ops
from odin_rs_spark.operators import text as text_ops
from odin_rs_spark.operators import windows as window_ops
from odin_rs_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check
    tags: str  # SURVEY §2 operator ids this query exercises


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _wide(
    spark: SparkSession,
    df: DataFrame,
    rows_per_task: int = 160,
    n_rows: int | None = None,
) -> DataFrame:
    """Spread a per-row-HEAVY narrow pipeline (regex/HOF text kernels,
    in-kernel decoders) across the session when the scan carries fewer
    partitions than the data warrants: the sf fixture tables are
    single-row-group parquet files, so Spark plans them as ONE task and
    a multi-second regex projection runs on one core of 32 (q169
    measured 5.0 s -> 1.9 s at sf0.1 from this alone). Scale-adaptive
    by construction: the target caps at defaultParallelism and the
    repartition is skipped whenever the scan already carries that many
    partitions — at 100 TB (thousands of row groups) this is a no-op,
    so it only ever widens the starved small end, mirroring
    `scaled_parallelism`. rows_per_task defaults lower than the dedup
    family's 512 because these kernels cost ~0.5-1 ms/row."""
    from odin_rs_spark.operators.dedup import scaled_parallelism

    # gate on the partition count FIRST (VERDICT r11 #5): the target is
    # capped at defaultParallelism, so when the scan already carries
    # that many partitions the repartition can never fire — return
    # before paying the count() action at all. At 100 TB (thousands of
    # row groups) this makes the whole helper metadata-only; the count
    # is paid only on the starved small end, where it is a cheap
    # single-row-group footer job (callers whose input is a DERIVED
    # pipeline must pass n_rows so the pipeline is not executed twice).
    cur = df.rdd.getNumPartitions()
    if cur >= spark.sparkContext.defaultParallelism:
        return df
    n = df.count() if n_rows is None else n_rows
    target = scaled_parallelism(spark, n, rows_per_task=rows_per_task)
    if cur >= target:
        return df
    return df.repartition(target)


def _doc_par(
    spark: SparkSession, df: DataFrame, n_rows: int | None = None
) -> int:
    """Repartition width for the doc-corpus dedup family, scaled to the
    corpus size instead of the session default (q81 drift, VERDICT r5):
    the count is parquet-metadata-cheap, small fixtures stop paying 32
    partitions of fixed task latency per shuffle, and at 100 TB the
    value is capped at defaultParallelism — identical to before.
    Callers whose frame is a DERIVED pipeline pass n_rows so the width
    probe does not execute the pipeline (the _wide rule, VERDICT r11
    #5); the value only steers the partition count, never a result."""
    from odin_rs_spark.operators.dedup import scaled_parallelism

    return scaled_parallelism(spark, df.count() if n_rows is None else n_rows)

# re-export EVERYTHING (incl. underscore helpers) down the part chain
__all__ = [n for n in dir() if not n.startswith("__")]
