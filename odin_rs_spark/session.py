"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the config below is chosen so the same code
deploys to a 1000-executor cluster unchanged:

- AQE on (runtime coalescing, skew-join splitting) so shuffle partition
  counts self-tune with data volume.
- UTC session timezone so event-time semantics match the reference
  (DateTime<Utc> everywhere, odin_common/src/datetime.rs) and the DuckDB
  oracle (UTC-naive timestamps).
- Arrow enabled for the few Pandas-UDF operators (vectorized transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "odin_rs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master``/``shuffle_partitions`` default from the environment so tests,
    bench.py, and the driver share one code path: SPARK_GRAFT_CPUS sets the
    local parallelism; on a real cluster ``master`` is left to spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver's parquet stores ts with isAdjustedToUTC=0; without this
        # Spark 4 infers TIMESTAMP_NTZ, which unix_micros/withWatermark/cast
        # reject. Session TZ is pinned UTC so LTZ values are identical to the
        # stored instants and DuckDB-oracle parity holds.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Driver/executor memory only applies at JVM launch (harmless later).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Ship the package zip to Python workers up front: any Pandas-UDF
    # closure referencing module-level helpers unpickles on workers that
    # cannot otherwise import odin_rs_spark when the driver runs from a
    # cwd off the repo (the --py-files path on a real cluster). Operator
    # call sites still call ensure_shipped for sessions built elsewhere.
    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(spark)
    return spark
