"""Product writers and side-effect sinks (SURVEY §2.2).

  write_json_product   ~ K3 JSON store/state save
                         (odin_goesr/src/lib.rs:220-287)
  write_csv_grid       ~ K4 wind grid / vector CSV products
                         (odin_wind/src/lib.rs:400-540)
  geojson_features     ~ K5 contour GeoJSON product shape
                         (odin_wind/src/lib.rs:542-559)
  lru_purge            ~ K6 LRU cache bound by age + total size
                         (odin_common/src/fs.rs:349-509)
  messenger_sink       ~ K7 alarm notification fan-out
                         (odin_sentinel/src/alarm.rs:77-95,451-463)
  SharedStore          ~ K8 shared KV store with change feed
                         (odin_share/src/lib.rs:66-275, actor.rs:107-150)

The snapshot+delta dual output (K1/K2) lives in
odin_rs_spark.streaming.pipelines.snapshot_delta_sink.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_json_product(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K3 — line-delimited JSON product (distributed write; no driver
    collect). Partition count is left to AQE."""
    df.write.mode(mode).json(path)


def write_csv_grid(
    df: DataFrame, path: str, columns: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """K4 — CSV grid product with header, mirroring the h,u,v,w,spd
    layout idea (column order fixed by `columns`)."""
    out = df.select(*columns) if columns else df
    out.write.mode(mode).option("header", "true").csv(path)


def geojson_feature(geometry_type: str, coordinates: Column, properties: Column) -> Column:
    """Build one GeoJSON Feature as a JSON string column (K5 product
    rows). `coordinates` is an (arbitrarily nested) array column;
    `properties` a struct column."""
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit(geometry_type).alias("type"),
                coordinates.alias("coordinates"),
            ).alias("geometry"),
            properties.alias("properties"),
        )
    )


def contour_linestring_features(polylines: DataFrame) -> DataFrame:
    """K5 — assembled iso-lines as GeoJSON LineString features, the
    product shape the reference serves (odin_wind/src/lib.rs:542-559:
    contour LINES with level attributes, not raw segments). Input is
    `operators.raster.contour_polylines` output (level, line_id, closed,
    seq, x, y); vertices aggregate per line and sort by walk order
    inside the array (array_sort on the seq-led struct — no extra
    shuffle beyond the one groupBy)."""
    pts = polylines.groupBy("level", "line_id", "closed").agg(
        F.array_sort(F.collect_list(F.struct("seq", "x", "y"))).alias("__pts")
    )
    coords = F.transform(F.col("__pts"), lambda p: F.array(p["x"], p["y"]))
    props = F.struct(F.col("level"), F.col("line_id"), F.col("closed"))
    return pts.select(
        geojson_feature("LineString", coords, props).alias("feature")
    )


def write_geojson_features(
    df: DataFrame, feature_col: str, path: str, mode: str = "overwrite"
) -> None:
    """K5 — write feature rows as line-delimited GeoJSON (one Feature per
    line; consumers wrap in a FeatureCollection — streaming-friendly,
    unlike a single monolithic document)."""
    df.select(F.col(feature_col).alias("value")).write.mode(mode).text(path)


def lru_purge(
    dir_path: str, max_age_sec: float | None = None, max_total_bytes: int | None = None
) -> list[str]:
    """K6 — bound an on-disk cache: drop files older than `max_age_sec`,
    then oldest-first until under `max_total_bytes`. Driver-side
    filesystem utility (cache hygiene, not a query operator)."""
    entries = []
    for root, _, files in os.walk(dir_path):
        for fn in files:
            p = os.path.join(root, fn)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
    entries.sort()  # oldest first
    removed = []
    now = time.time()
    if max_age_sec is not None:
        for mtime, _, p in list(entries):
            if now - mtime > max_age_sec:
                os.remove(p)
                removed.append(p)
        entries = [e for e in entries if e[2] not in set(removed)]
    if max_total_bytes is not None:
        total = sum(s for _, s, _ in entries)
        for _, size, p in list(entries):
            if total <= max_total_bytes:
                break
            os.remove(p)
            removed.append(p)
            total -= size
    return removed


def console_messenger(alarm: dict) -> None:
    print(f"ALARM {alarm}")


def messenger_sink(messengers: list | None = None, max_per_batch: int = 1000):
    """K7 — foreachBatch side-effect sink fanning each alarm row out to
    every configured messenger (console by default; Slack/SMTP/Signal
    adapters plug in as callables — network creds are deployment
    concerns, so only the console messenger ships enabled).

    `max_per_batch` bounds the driver-side collect: alarm streams are
    tiny by construction (post-dedup T5); the limit is a guard, not a
    throughput path.
    """
    ms = messengers if messengers is not None else [console_messenger]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.limit(max_per_batch).collect()
        for r in rows:
            d = r.asDict(recursive=True)
            for m in ms:
                m(d)

    return sink


class SharedStore:
    """K8 — small shared KV store with persistence + change feed.

    Semantics of odin_share: typed values under string keys, set/remove
    ops notify subscribers, full snapshot on join. Here: a driver-side
    dict persisted as JSON, change feed as an append log; `to_df` exposes
    the snapshot for broadcast joins (the store is small by design —
    shared annotations, not data)."""

    def __init__(self, path: str):
        self._path = path
        self._changes_path = path + ".changes"
        self._data: dict[str, object] = {}
        self._subscribers: list = []
        if os.path.exists(path):
            with open(path) as f:
                self._data = json.load(f)

    def set(self, key: str, value) -> None:
        self._data[key] = value
        self._emit({"op": "set", "key": key, "value": value})

    def remove(self, key: str) -> None:
        if key in self._data:
            del self._data[key]
            self._emit({"op": "remove", "key": key})

    def query(self, prefix: str = "") -> dict[str, object]:
        return {k: v for k, v in self._data.items() if k.startswith(prefix)}

    def subscribe(self, fn) -> None:
        self._subscribers.append(fn)

    def _emit(self, change: dict) -> None:
        change["ts"] = time.time()
        # tmp + atomic replace: a crash mid-dump must not truncate the
        # persistent snapshot (the RestPoller state file uses the same
        # pattern)
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=2, sort_keys=True)
        os.replace(tmp, self._path)
        with open(self._changes_path, "a") as f:
            f.write(json.dumps(change) + "\n")
        for fn in self._subscribers:
            fn(change)

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [(k, json.dumps(v)) for k, v in sorted(self._data.items())]
        return spark.createDataFrame(rows or [("", "")], "key string, value_json string").filter(
            F.col("key") != ""
        )
