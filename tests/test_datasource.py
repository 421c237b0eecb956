"""The odin_rest Python Data Source (S9/S10 in-engine form): offset
lifecycle, exactly-once across restarts, deterministic replay of the
crash window — the engine-level twin of test_poller.py's bridge tests.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import StructType

from odin_rs_spark.streaming.datasource import (
    _order_key,
    _RestFeedReader,
    drain_polling_source,
    register_rest_source,
)

DDL = "id BIGINT, event_type STRING, value DOUBLE"


def _write_feed(path: str, lo: int, hi: int, mode: str = "w") -> None:
    with open(path, mode) as f:
        for i in range(lo, hi + 1):
            f.write(
                json.dumps({"id": i, "event_type": f"t{i % 3}", "value": i * 0.5})
                + "\n"
            )


def _start_run(spark, feed: str, root: str, batch_limit: int = 30):
    return (
        spark.readStream.format("odin_rest")
        .schema(DDL)
        .option("path", feed)
        .option("batch_limit", str(batch_limit))
        .load()
        .writeStream.format("parquet")
        .option("path", root + "/out")
        .option("checkpointLocation", root + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )


def test_drain_exactly_once_multibatch(spark, tmp_path):
    root = str(tmp_path)
    feed = os.path.join(root, "feed.jsonl")
    _write_feed(feed, 1, 100)
    register_rest_source(spark)
    total = drain_polling_source(lambda: _start_run(spark, feed, root, 30))
    assert total == 100  # 30+30+30+10, then one empty pass
    out = spark.read.parquet(root + "/out")
    assert out.count() == 100
    assert out.select("id").distinct().count() == 100


def test_drain_expected_rows_skips_empty_pass(spark, tmp_path):
    """With a known feed size the drain stops once the checkpointed
    offsets cover it — no trailing empty-poll query lifecycle — and
    ingests exactly the same rows."""
    root = str(tmp_path)
    feed = os.path.join(root, "feed.jsonl")
    _write_feed(feed, 1, 100)
    register_rest_source(spark)
    runs = []

    def start_run():
        q = _start_run(spark, feed, root, 30)
        runs.append(q)
        return q

    total = drain_polling_source(start_run, expected_rows=100)
    assert total == 100
    assert len(runs) == 4  # 30+30+30+10 — and NO fifth empty pass
    out = spark.read.parquet(root + "/out")
    assert out.count() == 100
    assert out.select("id").distinct().count() == 100
    # over-estimating the budget degrades to the empty-poll stop
    total2 = drain_polling_source(start_run, expected_rows=10_000)
    assert total2 == 0


def test_drain_expected_rows_zero_still_runs_one_pass(spark, tmp_path):
    """expected_rows=0 (an empty bounded feed) must still run ONE empty
    poll: the pass creates the file sink's directory, which callers like
    q118 read directly after the drain (ADVICE r11 — the pre-pass early
    return left nothing on disk and the read threw)."""
    root = str(tmp_path)
    feed = os.path.join(root, "feed.jsonl")
    open(feed, "w").close()  # zero records
    register_rest_source(spark)
    runs = []

    def start_run():
        q = _start_run(spark, feed, root, 30)
        runs.append(q)
        return q

    total = drain_polling_source(start_run, expected_rows=0)
    assert total == 0
    assert len(runs) == 1  # exactly the single confirming empty pass
    assert os.path.exists(root + "/out")  # sink dir exists for readers


def test_restart_resumes_from_spark_checkpoint(spark, tmp_path):
    """The cursor lives in Spark's offset log: a new query object over
    the same checkpoint picks up past the already-ingested range, and
    appended feed records land exactly once."""
    root = str(tmp_path)
    feed = os.path.join(root, "feed.jsonl")
    _write_feed(feed, 1, 50)
    register_rest_source(spark)
    drain_polling_source(lambda: _start_run(spark, feed, root, 20))
    # "live" records arrive while the query is down
    _write_feed(feed, 51, 80, mode="a")
    total2 = drain_polling_source(lambda: _start_run(spark, feed, root, 20))
    assert total2 == 30  # only the new range — no re-ingest of 1..50
    out = spark.read.parquet(root + "/out")
    assert out.count() == 80
    assert out.select("id").distinct().count() == 80


def test_read_between_offsets_replays_exact_range(tmp_path):
    """readBetweenOffsets(start, end) must return exactly (start, end]
    regardless of what has since been appended — this is the engine's
    failure-recovery call and the reason the bridge poller's
    crash-window reasoning becomes an offset-log guarantee here."""
    feed = str(tmp_path / "feed.jsonl")
    _write_feed(feed, 1, 100)
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(DDL)
    assert isinstance(schema, StructType)
    reader = _RestFeedReader(
        schema, {"path": feed, "batch_limit": "25", "id_field": "id"}
    )
    it, end = reader.read({"last_id": None})
    first = list(it)
    assert len(first) == 25 and end == {"last_id": 25}
    # more data lands; replay of the committed window is unaffected
    _write_feed(feed, 101, 120, mode="a")
    replay = list(reader.readBetweenOffsets({"last_id": None}, {"last_id": 25}))
    assert replay == first
    mid = list(reader.readBetweenOffsets({"last_id": 10}, {"last_id": 40}))
    assert [t[0] for t in mid] == list(range(11, 41))


def test_empty_poll_keeps_offset(tmp_path):
    feed = str(tmp_path / "feed.jsonl")
    _write_feed(feed, 1, 5)
    from pyspark.sql.types import _parse_datatype_string

    reader = _RestFeedReader(
        _parse_datatype_string(DDL), {"path": feed, "batch_limit": "100"}
    )
    it, end = reader.read({"last_id": None})
    assert len(list(it)) == 5 and end == {"last_id": 5}
    it2, end2 = reader.read(end)
    assert list(it2) == [] and end2 == end  # no spurious offset advance


def test_missing_feed_is_empty_poll(tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    reader = _RestFeedReader(
        _parse_datatype_string(DDL), {"path": str(tmp_path / "nope.jsonl")}
    )
    it, end = reader.read({"last_id": None})
    assert list(it) == [] and end == {"last_id": None}


def test_options_validation():
    from pyspark.sql.types import _parse_datatype_string

    with pytest.raises(ValueError, match="odin_rest source needs"):
        _RestFeedReader(_parse_datatype_string(DDL), {})


def test_order_key_total_order():
    # ints numeric, strings lexicographic, cross-type stable (ints first)
    assert _order_key(2) < _order_key(10)
    assert _order_key("10") < _order_key("2")
    assert _order_key(999) < _order_key("0")
    assert sorted([_order_key(x) for x in [3, "b", 1, "a"]]) == [
        _order_key(1),
        _order_key(3),
        _order_key("a"),
        _order_key("b"),
    ]


def test_injected_fetcher(spark, tmp_path):
    """The register_rest_source(fetch_since=...) seam: an in-process
    callable (the transport a live HTTP/WS bridge would wrap) drives the
    same offset lifecycle."""
    root = str(tmp_path)
    data = [{"id": i, "event_type": "x", "value": float(i)} for i in range(1, 41)]

    def fetch_since(last):
        if last is None:
            return data
        return [r for r in data if r["id"] > last]

    token = register_rest_source(spark, fetch_since=fetch_since)
    total = drain_polling_source(
        lambda: (
            spark.readStream.format("odin_rest")
            .schema(DDL)
            .option("fetcher", token)
            .option("batch_limit", "15")
            .load()
            .writeStream.format("parquet")
            .option("path", root + "/out")
            .option("checkpointLocation", root + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    )
    assert total == 40
    assert spark.read.parquet(root + "/out").select("id").distinct().count() == 40
