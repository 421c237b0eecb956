"""Streaming health monitoring (T10; parity target: heartbeat/ping
infrastructure odin_actor/src/lib.rs:230-264, tokio_rt.rs:790-826).

Spark's StreamingQueryListener is the idiomatic replacement for actor
heartbeats: per-micro-batch progress events carry rates, durations and
state-store metrics for every running query, with no polling."""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener


class HealthListener(StreamingQueryListener):
    """Collects per-query liveness: last progress wall-time, batch rates,
    rows/sec. `stale_queries()` is the inactive-source sweep (T4) applied
    to the engine's own pipelines."""

    def __init__(self):
        self.progress: dict[str, dict] = {}
        self.terminated: dict[str, str | None] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.progress[str(event.id)] = {"started_at": time.time(), "batches": 0}

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = self.progress.setdefault(str(p.id), {"batches": 0})
        rec.update(
            last_progress_at=time.time(),
            batches=rec.get("batches", 0) + 1,
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            input_rows_per_second=p.inputRowsPerSecond,
            processed_rows_per_second=p.processedRowsPerSecond,
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated[str(event.id)] = event.exception

    def onQueryIdle(self, event) -> None:
        rec = self.progress.setdefault(str(event.id), {"batches": 0})
        rec["last_progress_at"] = time.time()

    # -- health API ---------------------------------------------------------
    def stale_queries(self, max_silent_sec: float) -> list[str]:
        now = time.time()
        return [
            qid
            for qid, rec in self.progress.items()
            if qid not in self.terminated
            and now - rec.get("last_progress_at", rec.get("started_at", now))
            > max_silent_sec
        ]


def attach_health_listener(spark: SparkSession) -> HealthListener:
    listener = HealthListener()
    spark.streams.addListener(listener)
    return listener
