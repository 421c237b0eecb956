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


def _doc_par(spark: SparkSession, df: DataFrame) -> int:
    """Repartition width for the doc-corpus dedup family, scaled to the
    corpus size instead of the session default (q81 drift, VERDICT r5):
    the count is parquet-metadata-cheap, small fixtures stop paying 32
    partitions of fixed task latency per shuffle, and at 100 TB the
    value is capped at defaultParallelism — identical to before."""
    from odin_rs_spark.operators.dedup import scaled_parallelism

    return scaled_parallelism(spark, df.count())

# re-export EVERYTHING (incl. underscore helpers) down the part chain
__all__ = [n for n in dir() if not n.startswith("__")]
