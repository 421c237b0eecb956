"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full catalog from
``odin_rs_spark.plans.catalog`` — one entry per implemented operator of
SURVEY.md §2, each oracle-checked against DuckDB where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from odin_rs_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's canonical hotspot flow
    end-to-end (mask filter → quality recode → GOES fixed-grid →
    quantized DEM join → class counts → newest-N retention)."""
    return _catalog.q56_hotspot_slice(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
