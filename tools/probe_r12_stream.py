"""Round-12 streaming-engine knob A/B (VERDICT r11 #3): time a set of
streaming catalog queries under (a) the default HDFS-backed state store,
(b) RocksDB state store, (c) a long state-store maintenance interval —
semantics untouched (same triggers, same watermarks, same batch counts;
the state-store provider only changes how state is persisted locally).

Usage:
    python tools/probe_r12_stream.py base|rocksdb|maint|state4 [queries...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), OPT_REPEAT (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

DEFAULT_QUERIES = [
    "q96_stream_windowed",
    "q103_stream_ttl_latest",
    "q257_stream_late_drop",
    "q117_stream_sessions",
    "q287_stream_dedup_ttl",
]

MODES = {
    "base": {},
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider"
        ),
    },
    "maint": {
        "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
    },
}


def main() -> None:
    from odin_rs_spark.plans.catalog import CATALOG
    from odin_rs_spark.session import get_spark

    mode = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("OPT_REPEAT", "3"))
    spark = get_spark(app_name=f"odin-probe-stream-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in MODES[mode].items():
        spark.conf.set(k, v)

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(100000).repartition(64).select(F.sum(_w(F.col("id")))).collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    out: dict[str, float] = {}
    for name in names:
        spec = CATALOG[name]
        best = float("inf")
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"probe:{mode}:{name}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[name] = round(best, 3)
        print(f"TIMED {mode} {name} {best:.3f}s", flush=True)
    print(json.dumps({"mode": mode, **out}))


if __name__ == "__main__":
    main()
