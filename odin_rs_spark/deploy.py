"""Ship the engine package to Python workers.

The driver harness builds its own vanilla SparkSession from an arbitrary
working directory; Pandas-UDF closures that reference module-level
helpers (multimodal stubs, contour kernels) then unpickle on workers
that can't import `odin_rs_spark`. Zipping the package once per session
and `addPyFile`-ing it makes every executor self-sufficient — the same
mechanism `--py-files` uses on a real cluster, so local tests and
cluster deploys share one code path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_shipped(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), f"odin_rs_spark_pkg_{os.getpid()}")
    zip_path = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="odin_rs_spark"
    )
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. Connect sessions without an SC; workers may already import
    _SHIPPED.add(app_id)
