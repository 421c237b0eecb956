"""Tests for T10 health monitoring, T12 region subscription lifecycle,
and orbital geometry helpers."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row, functions as F

from odin_rs_spark.functions import orbital
from odin_rs_spark.sinks.products import SharedStore
from odin_rs_spark.streaming import monitor, pipelines, regions, sources


def test_health_listener_records_progress(spark, tmp_path):
    listener = monitor.attach_health_listener(spark)
    try:
        df = spark.createDataFrame(
            [Row(key="a", ts=dt.datetime(2024, 1, 1), value=1.0)]
        )
        root = str(tmp_path / "chunks")
        sources.split_for_replay(df, root, 1, "ts")
        stream = sources.replay_stream(spark, root, df.schema)
        pipelines.run_available_now(
            stream, lambda d, b: None, str(tmp_path / "ckpt"), output_mode="append"
        )
        import time

        deadline = time.time() + 30
        while time.time() < deadline and not listener.terminated:
            time.sleep(0.5)
        assert listener.progress, "no progress events recorded"
        rec = next(iter(listener.progress.values()))
        assert rec["batches"] >= 1
        assert listener.terminated  # availableNow query ended
        assert listener.stale_queries(max_silent_sec=3600) == []
    finally:
        spark.streams.removeListener(listener)


class _FakeQuery:
    def __init__(self):
        self.stopped = False

    def stop(self):
        self.stopped = True


def test_region_manager_lifecycle(tmp_path):
    started: list[str] = []
    queries: dict[str, _FakeQuery] = {}

    def factory(region, conf):
        started.append(region)
        q = _FakeQuery()
        queries[region] = q
        return q

    store = SharedStore(str(tmp_path / "regions.json"))
    changes = []
    store.subscribe(changes.append)
    mgr = regions.RegionManager(factory, store)

    mgr.add_client("r1", "clientA", {"bbox": [0, 0, 1, 1]})
    mgr.add_client("r1", "clientB")  # refcount only — no second query
    mgr.add_client("r2", "clientA")
    assert started == ["r1", "r2"]
    assert mgr.active_regions() == ["r1", "r2"]

    mgr.remove_client("r1", "clientA")
    assert not queries["r1"].stopped  # clientB still subscribed
    mgr.remove_client("r1", "clientB")
    assert queries["r1"].stopped  # last client left → query stopped
    assert mgr.active_regions() == ["r2"]
    assert [c["op"] for c in changes] == ["set", "set", "remove"]
    assert list(store.query("region/")) == ["region/r2"]

    mgr.shutdown()
    assert queries["r2"].stopped and mgr.active_regions() == []


def test_orbital_geometry(spark):
    r = spark.range(1).select(
        orbital.swath_half_width_km(math.radians(56.28), 833.0).alias("half"),
        orbital.max_reachable_latitude_deg(98.7).alias("maxlat"),
        orbital.orbital_period_min(833.0).alias("period"),
    ).collect()[0]
    # VIIRS: ~3060 km full swath → half ≈ 1530 km (±50 km tolerance)
    assert abs(r.half - 1530.0) < 50.0
    # sun-synchronous 98.7° inclination reaches ~81.3° latitude
    assert abs(r.maxlat - 81.3) < 1e-9
    # ~101-minute orbit at 833 km
    assert abs(r.period - 101.5) < 1.0
