"""Streaming sources (SURVEY §2.1 S1/S6 file streams, T1/T2 triggers,
T11 replay).

The reference's importer pattern — poll a feed, pick up only objects
newer than the last seen key (odin_goesr/src/lib.rs:421-447) — is
exactly Spark's file-stream source: checkpointed listing, each file
processed once, `maxFilesPerTrigger` as the backpressure bound
(mirroring the bounded actor mailbox, odin_actor/src/lib.rs:30).

Replay (T11, odin_common/src/sim_clock.rs:52): split a historical table
into time-ordered chunk files and stream them back with
maxFilesPerTrigger=1 — event-time processing makes the replay
equivalent to the live run, no settable clock needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental file listing source (S1/S6 semantics). At 100 TB the
    listing cost is bounded by partition-path layout (source/yyyy/ddd/hh
    in the reference, =partition dirs here) — pass a glob that prunes."""
    try:
        # parquet isAdjustedToUTC=0 must stream as TIMESTAMP (LTZ), not NTZ:
        # withWatermark and window() require TIMESTAMP (session TZ is UTC so
        # the instants are unchanged)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    reader = spark.readStream.schema(schema)
    opts = dict(options or {})
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    for k, v in opts.items():
        reader = reader.option(k, v)
    from odin_rs_spark.sources.tables import normalize_ntz

    return normalize_ntz(reader.format(fmt).load(path))


def split_for_replay(
    df: DataFrame, out_dir: str, n_chunks: int, order_col: str
) -> list[str]:
    """Materialize a batch table as `n_chunks` time-ordered parquet chunk
    files for replay through `file_stream` (T11). Chunk i holds the i-th
    time slice, so maxFilesPerTrigger=1 replays history in event order —
    the micro-batch analog of the reference's Initialize/Update seam
    (odin_goesr/src/live_importer.rs:108-134).

    Driver-side ntile assignment only computes chunk boundaries; rows
    never collect to the driver.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Window

    w = Window.orderBy(F.col(order_col).asc())
    chunked = df.withColumn("__chunk", F.ntile(n_chunks).over(w))
    # persist across the n_chunks filtered writes: without it every
    # chunk write re-runs the source scan + global sort (measured ~40%
    # of several streaming queries' wall at sf0.1)
    chunked.persist()
    try:
        # materialize ONCE before fanning out: concurrent first actions
        # on an unmaterialized persist would each recompute the scan+sort
        chunked.count()

        def _write(i: int) -> str:
            p = os.path.join(out_dir, f"chunk_{i:04d}")
            chunked.filter(F.col("__chunk") == i).drop("__chunk").coalesce(
                1
            ).write.mode("overwrite").parquet(p)
            return p

        # overlap the independent single-task chunk writes (guide §2.6):
        # serially each small job's dispatch+commit latency added up to
        # ~0.1-0.2 s x n_chunks x 2 sides per streaming query. Each write
        # filters the SAME materialized frame, so file CONTENTS (rows and
        # row order) are bit-identical to the serial path.
        with ThreadPoolExecutor(max_workers=min(4, n_chunks)) as pool:
            paths = list(pool.map(_write, range(1, n_chunks + 1)))
        # pin replay order explicitly: the file-stream source orders new
        # files by modification time, which the serial writes implied and
        # the concurrent writes would leave to scheduling — stamp strictly
        # increasing mtimes by chunk index so batch composition is exactly
        # the serial path's, by construction rather than by latency. The
        # stamps sit strictly in the PAST (now - n_chunks .. now - 1 s):
        # callers append files AFTER this returns and rely on them
        # sorting last (q120's update file), which future-dated chunk
        # stamps would silently break
        base = time.time() - n_chunks
        for i, p in enumerate(paths):
            for name in os.listdir(p):
                fp = os.path.join(p, name)
                os.utime(fp, (base + i, base + i))
        return paths
    finally:
        chunked.unpersist()


def replay_stream(
    spark: SparkSession,
    chunk_root: str,
    schema,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Stream previously split chunks back in order (glob over chunk dirs)."""
    return file_stream(
        spark,
        os.path.join(chunk_root, "chunk_*"),
        schema,
        max_files_per_trigger=files_per_trigger,
    )
