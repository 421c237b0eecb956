"""Regression pins for the round-4 operator-review fixes: batch/stream
semantic parity, numerical hygiene, NULL/blank edge cases, parameter
validation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from odin_rs_spark.operators import corpus as corpus_ops
from odin_rs_spark.operators import windows as window_ops


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_track_trace_keeps_latest_of_dense_run(spark):
    """Reference semantics (Aircraft::push_position): a sub-gap update
    REPLACES the stored point, so the batch collapse must keep the LAST
    of each dense run — the same retention the streaming twin has."""
    rows = [(1, _ts(t), float(t), 0.0) for t in (0.0, 0.3, 0.6, 2.0, 2.5, 4.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, lon double, lat double")
    kept = sorted(
        r["lon"]
        for r in window_ops.track_trace(df, "k", "ts", min_gap_sec=0.8).collect()
    )
    # runs: {0, 0.3, 0.6} (gaps 0.3) → keep 0.6; {2.0, 2.5} → keep 2.5;
    # {4.0} → keep 4.0
    assert kept == [0.6, 2.5, 4.0]


def test_sessionize_boundary_matches_session_window(spark):
    """Two events exactly one gap apart must be TWO sessions — Spark's
    session_window [t, t+gap) is end-exclusive and the batch twin now
    uses the same >= rule (q117's streaming oracle pins it)."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(1800)), (1, _ts(1800 + 10))],
        "user_id long, ts timestamp",
    )
    out = window_ops.sessionize(df, gap_minutes=30.0).collect()
    seqs = sorted(r["session_seq"] for r in out)
    assert seqs == [1, 2, 2]


def test_loess_survives_epoch_magnitude_x(spark):
    """y = 2x + 5 sampled at epoch-seconds magnitude: the anchored
    moments must recover slope 2 (the naive E[x²]−E[x]² form returns
    slope 0 from cancellation at this magnitude)."""
    x0 = 1.7e9
    rows = [(1, x0 + i, 2.0 * (x0 + i) + 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, x double, y double")
    out = window_ops.loess_smooth(df, "k", "x", "y", bandwidth_rows=3).collect()
    for r in out:
        assert abs(r["y_smooth"] - r["y"]) < 1e-3, r


def test_contamination_blank_docs_not_flagged(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real shared benchmark trigram here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, ""), (11, "shared benchmark trigram")],
        "doc_id long, text string",
    )
    hits = corpus_ops.contamination(docs, bench, min_hits=1).collect()
    flagged = {r["doc_id"] for r in hits}
    assert flagged == {3}  # blank-vs-blank must NOT match


def test_temperature_mix_keeps_null_source_group(spark):
    rows = [(i, "a") for i in range(40)] + [(100 + i, None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus_ops.temperature_mix(df, alpha=0.5)
    srcs = {r["source"] for r in out.collect()}
    # equal-sized groups → rate 1.0 for both; NULL rows must survive
    assert srcs == {"a", None}
    assert out.count() == 80


def test_chunk_documents_validates_stride(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        corpus_ops.chunk_documents(df, chunk_size=32, stride=40)
    with pytest.raises(ValueError, match="stride"):
        corpus_ops.chunk_documents(df, chunk_size=32, stride=0)


def test_cumulative_cdf_ties_share_value(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 5), (2, 20)], "bin long, n long"
    )
    out = {  # tied bin rows must report the SAME cum (RANGE frame)
        (r["bin"], r["n"]): r["cum"]
        for r in window_ops.cumulative_cdf(df, "bin").collect()
    }
    assert out[(1, 10)] == out[(1, 5)] == 15
    assert out[(2, 20)] == 35


def test_cms_query_rejects_dim_mismatch(spark, sf_dir):
    from odin_rs_spark.operators import sketches
    from odin_rs_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    cms = sketches.cms_build(ev, "event_type", width=2048, depth=4)
    keys = ev.select("event_type").distinct()
    with pytest.raises(ValueError, match="width/depth must match"):
        sketches.cms_query(keys, "event_type", cms, width=1024, depth=4)


def test_pack_sequences_integer_chunking(spark):
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60), (4, 500)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r["chunk_id"] for r in
           corpus_ops.pack_sequences(df, max_tokens=100).collect()}
    # runs (capped at 100): 60, 120, 180, 280 → chunks 0, 1, 1, 2
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}
