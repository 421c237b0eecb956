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


def test_cosine_guards_zero_norm_and_nan(spark):
    """Zero-norm and NaN embeddings must neither kill the job (ANSI
    DIVIDE_BY_ZERO) nor rank first (Spark orders NaN above all reals) —
    they drop out of rankings as NULL scores."""
    from odin_rs_spark.operators import similarity as sim_ops

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),          # zero-norm (failed encoder)
        (4, [float("nan"), 1.0, 0.0, 0.0]),  # NaN component
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    out = sim_ops.cosine_topk(corpus, queries, k=4).collect()
    ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # real vectors first, broken vectors last with NULL scores
    assert ranked[:2] == [1, 2]
    scores = {r["vec_id"]: r["cos_sim"] for r in out}
    assert scores[3] is None and scores[4] is None


def test_null_embedding_survives_lsh_pipeline(spark):
    from odin_rs_spark.operators import similarity as sim_ops

    rows = [(1, [1.0] * 64), (2, [0.9] * 64), (3, None)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, [1.0] * 64)], "query_id long, embedding array<double>"
    )
    out = sim_ops.ann_lsh_topk(corpus, queries, k=2).collect()
    assert {r["vec_id"] for r in out} == {1, 2}  # NULL row dropped, no crash


def test_bpe_stats_empty_doc_no_crash(spark):
    from odin_rs_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "hello world code"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    row = text_ops.bpe_token_stats(df).collect()[0]
    assert row["n_docs"] == 3  # empty docs counted, not crashing the agg


def test_pmi_mass_from_unfiltered_bigrams(spark):
    """c12/Nb must be a probability: Nb is the TOTAL bigram mass, not
    the post-min_count survivor mass."""
    from odin_rs_spark.operators import text as text_ops
    import math

    # "a b" x3 (kept), plus 6 distinct singleton bigrams (filtered out)
    docs = [("a b",)] * 3 + [(f"x{i} y{i}",) for i in range(6)]
    df = spark.createDataFrame(docs, "text string")
    out = text_ops.pmi_collocations(df, min_count=3, k=5).collect()
    assert len(out) == 1 and out[0]["w1"] == "a"
    # N=18 unigrams, Nb=9 bigrams (NOT 3), c1=c2=c12=3
    want = round(math.log(3 * 18.0 * 18.0 / (9.0 * 3 * 3)), 6)
    assert out[0]["pmi"] == want


def test_bloom_probe_null_key_definitely_absent(spark):
    from odin_rs_spark.operators import dedup as dedup_ops

    base = spark.createDataFrame([("x",), ("y",)], "k string")
    bloom = dedup_ops.bloom_build(base, "k")
    probe = spark.createDataFrame([("x",), ("zz",), (None,)], "k string")
    out = {r["k"]: r["maybe_member"] for r in
           dedup_ops.bloom_probe(probe, "k", bloom).collect()}
    assert out["x"] is True
    assert out[None] is False  # defined, not NULL-vanishing


def test_evidence_join_keeps_refless_records(spark):
    from odin_rs_spark.operators import joins as join_ops

    records = spark.createDataFrame(
        [(1, [10, 11]), (2, []), (3, None)],
        "rec_id long, refs array<long>",
    )
    store = spark.createDataFrame([(10, "a"), (11, "b")], "id long, v string")
    out = join_ops.evidence_join(records, "refs", store)
    by_rec = {}
    for r in out.collect():
        by_rec.setdefault(r["rec_id"], []).append(r["ev_v"])
    # left semantics: refcount-zero records survive with NULL evidence
    assert sorted(by_rec[1]) == ["a", "b"]
    assert by_rec[2] == [None] and by_rec[3] == [None]


def test_interval_join_skips_inverted_intervals(spark):
    from odin_rs_spark.operators import joins as join_ops

    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(3600)), (2, _ts(7200), _ts(3600))],  # 2 inverted
        "iv_id long, start timestamp, end timestamp",
    )
    fact = spark.createDataFrame([(100, _ts(100))], "f_id long, ts timestamp")
    out = join_ops.interval_join(fact, iv, "ts", "start", "end").collect()
    # no crash from F.sequence; only the valid interval matches
    assert len(out) == 1 and out[0]["iv_id"] == 1


def test_quantized_point_join_preserves_point_xy(spark):
    from odin_rs_spark.operators import joins as join_ops

    pts = spark.createDataFrame(
        [(7, 8, 0.5, 0.5)], "x long, y long, lon double, lat double"
    )
    cells = spark.createDataFrame(
        [(60, 60, 123.0)], "x int, y int, height double"
    )
    out = join_ops.quantized_point_join(pts, cells).collect()[0]
    # the points' own x/y must survive the join (previously dropped)
    assert out["x"] == 7 and out["y"] == 8 and out["height"] == 123.0


def test_asof_join_string_order_column(spark):
    from odin_rs_spark.operators import joins as join_ops

    left = spark.createDataFrame([(1, _ts(100))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(50), "rec9", 1.0), (1, _ts(50), "rec10", 2.0)],
        "k long, ts timestamp, rid string, v double",
    )
    out = join_ops.asof_join(left, right, on="k", ts="ts", right_order="rid").collect()
    # analyzes fine with a string order column; max(rid) wins the tie
    assert len(out) == 1 and out[0]["v"] == 1.0  # 'rec9' > 'rec10' lexicographically


def test_salted_join_rejects_outer(spark):
    from odin_rs_spark.operators import skew

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="salted_join supports"):
        skew.salted_join(df, df, "k", how="full")


def test_contour_all_nan_tile_no_crash(spark):
    from odin_rs_spark.operators import raster as raster_ops

    lat = raster_ops.affine_lattice(spark, 8, 8)
    cells = lat.select("x", "y", F.lit(None).cast("double").alias("value"))
    assert raster_ops.contour_segments(cells, interval=1.0, tile_size=4).count() == 0


def test_contour_node_range_validated(spark):
    from odin_rs_spark.operators import raster as raster_ops

    segs = spark.createDataFrame(
        [(1.0, 1.0e7, 0.0, 1.0e7, 1.0)],  # coord far past the packable range
        "level double, x1 double, y1 double, x2 double, y2 double",
    )
    with pytest.raises(Exception, match="packable range"):
        raster_ops.contour_lines(segs, interval=1.0).collect()


def test_epoch_millis_floors_pre_epoch(spark):
    from odin_rs_spark.functions import datetimes

    df = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 23, 59, 59, 999500),)], "ts timestamp"
    )
    ms = df.select(datetimes.epoch_millis("ts").alias("ms")).collect()[0]["ms"]
    assert ms == -1  # chrono floors; truncation would give 0


def test_parse_sbs_malformed_line_yields_null_ts(spark):
    """One garbage line must not kill the job (ANSI to_timestamp throws);
    it parses to a NULL ts row instead."""
    from odin_rs_spark.sources.formats import parse_sbs

    lines = spark.createDataFrame(
        [("MSG,3,1,1,ABC123,1,BADDATE,BADTIME,2024/01/01,00:00:00.000,,"
          "1000,,,52.0,4.0,,,,,,0",)],
        "value string",
    )
    rows = parse_sbs(lines).collect()
    assert len(rows) == 1 and rows[0]["ts"] is None


def test_parse_firms_malformed_date_yields_null(spark, tmp_path):
    from odin_rs_spark.sources.formats import parse_firms_csv

    p = str(tmp_path / "firms.csv")
    head = ("latitude,longitude,bright_ti4,scan,track,acq_date,acq_time,"
            "satellite,instrument,confidence,version,bright_ti5,frp,daynight")
    with open(p, "w") as f:
        f.write(head + "\n")
        f.write("1.0,2.0,300.0,0.4,0.4,2024-01-01,0130,N,VIIRS,h,2,290.0,5.0,N\n")
        f.write("3.0,4.0,300.0,0.4,0.4,BAD,xx,N,VIIRS,l,2,290.0,5.0,N\n")
    rows = {r["latitude"]: r["acq_ts"] for r in parse_firms_csv(spark, p).collect()}
    assert rows[1.0] is not None and rows[3.0] is None


def test_track_state_late_record_does_not_overwrite_newest(spark, tmp_path):
    """A record an hour LATE must sorted-insert (T6), not replace the
    newest stored position via the unbounded sub-gap test."""
    import datetime as dtm

    from odin_rs_spark.streaming.sources import file_stream
    from odin_rs_spark.streaming.state import track_trace_state
    from odin_rs_spark.streaming.pipelines import run_available_now

    root = str(tmp_path)
    base = dtm.datetime(2024, 1, 1, 10, 0, 0)
    chunk1 = spark.createDataFrame(
        [("a", base, 10.0, 0.0)], "key string, ts timestamp, lon double, lat double"
    )
    chunk2 = spark.createDataFrame(  # one hour OLDER than the stored point
        [("a", base - dtm.timedelta(hours=1), 99.0, 0.0)],
        "key string, ts timestamp, lon double, lat double",
    )
    chunk1.coalesce(1).write.parquet(root + "/chunks/chunk_0001")
    chunk2.coalesce(1).write.parquet(root + "/chunks/chunk_0002")
    stream = file_stream(
        spark, root + "/chunks/chunk_*", chunk1.schema, max_files_per_trigger=1
    )
    grouped = stream.groupBy("key")
    out = track_trace_state(
        grouped.applyInPandasWithState.__self__.applyInPandasWithState
        if False
        else grouped,
    )
    rows = []

    def keep(batch_df, bid):
        rows.extend(batch_df.collect())

    run_available_now(out, keep, root + "/ckpt", output_mode="update")
    final = rows[-1]
    assert final["last_lon"] == 10.0  # newest position survives
    assert final["n_points"] == 2  # late point inserted, not dropped


def test_upsert_sorted_capped_in_batch_dup_deterministic(spark):
    from odin_rs_spark.streaming.state import upsert_sorted_capped
    import datetime as dtm

    t0 = dtm.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [(1, 9, t0, 1.0), (1, 9, t0 + dtm.timedelta(minutes=5), 2.0)],
        "k long, rid long, ts timestamp, v double",
    )
    for _ in range(3):  # stable across replans
        out = upsert_sorted_capped(None, batch, "rid", ["k"], "ts", max_len=5).collect()
        assert len(out) == 1 and out[0]["v"] == 2.0  # newest ts wins


def test_incremental_seg_dedup_retry_idempotent(spark, tmp_path):
    """Replaying a batch (foreachBatch retry) must neither double-append
    stats nor flag the batch's own first-attempt hashes as dups."""
    from odin_rs_spark.streaming.pipelines import incremental_segment_dedup_sink

    store, stats = str(tmp_path / "store"), str(tmp_path / "stats")
    sink = incremental_segment_dedup_sink(store, stats, seg_words=3)
    b0 = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    sink(b0, 0)
    sink(b0, 0)  # retry of the SAME batch
    rows = spark.read.parquet(stats).collect()
    assert len(rows) == 1  # no duplicate stats rows
    assert rows[0]["n_dup_segs"] == 0  # own first attempt not seen as dup
    b1 = spark.createDataFrame([(2, "alpha beta gamma")], "doc_id long, text string")
    sink(b1, 1)
    by_doc = {r["doc_id"]: r["n_dup_segs"] for r in spark.read.parquet(stats).collect()}
    assert by_doc == {1: 0, 2: 1}  # later batch still sees batch 0's hash


def test_dem_slope_horn_semantics(spark):
    """Horn slope on a hand-checkable ramp: constant gradient planes
    give the exact analytic gx/gy, cells bordering a hole or the edge
    emit nothing, and the plan is one broadcast fan-out + one shuffle."""
    import numpy as np

    from odin_rs_spark.operators.raster import dem_slope_cells

    # z = 2*x + 3*y on a 5x5 grid, one hole at (1, 1)
    rows = [
        (x, y, float(2 * x + 3 * y))
        for y in range(5)
        for x in range(5)
        if (x, y) != (1, 1)
    ]
    cells = spark.createDataFrame(rows, "x int, y int, value double")
    out = {(r.x, r.y): r for r in dem_slope_cells(cells).collect()}
    # interior cells are (1..3, 1..3); those whose 3x3 neighborhood
    # touches the hole at (1, 1) drop out: (1,1),(2,1),(1,2),(2,2)
    expect = {(3, 1), (3, 2), (1, 3), (2, 3), (3, 3)}
    assert set(out) == expect, set(out)
    for k, r in out.items():
        # Horn on a plane z = 2x + 3y: gx = 2, gy = 3 exactly
        assert r.gx == 2.0 and r.gy == 3.0, (k, r)
        assert abs(r.slope_pct - 100.0 * (13 ** 0.5)) < 1e-3


def test_dem_slope_multi_raster_keyed(spark):
    """ADVICE r6 (medium): cells from TWO rasters sharing pixel coords
    must not sum across rasters — the raster key (path/msg) rides
    through the scatter and the groupBy, and each raster's slopes
    equal its single-raster result."""
    from odin_rs_spark.operators.raster import dem_slope_cells

    def plane(a, b):
        return [
            (x, y, float(a * x + b * y)) for y in range(5) for x in range(5)
        ]

    one = spark.createDataFrame(plane(2, 3), "x int, y int, value double")
    two = spark.createDataFrame(plane(5, 1), "x int, y int, value double")
    both = one.withColumn("path", F.lit("a.tif")).unionByName(
        two.withColumn("path", F.lit("b.tif"))
    )
    out = dem_slope_cells(both).collect()
    assert {r.path for r in out} == {"a.tif", "b.tif"}
    by_key = {(r.path, r.x, r.y): r for r in out}
    # 3x3-complete interior of a full 5x5 grid: x,y in 1..3, per raster
    assert len(by_key) == 18
    for (p, x, y), r in by_key.items():
        gx, gy = (2.0, 3.0) if p == "a.tif" else (5.0, 1.0)
        assert (r.gx, r.gy) == (gx, gy), (p, x, y, r)
    # explicit key_cols + keyless input both still work
    keyless = dem_slope_cells(one)
    assert "path" not in keyless.columns and keyless.count() == 9


def test_audio_resample_exact_last_sample_upsample(spark):
    """ADVICE r6: a dst sample landing exactly on the LAST source
    sample (frac == 0, k == n-1) is kept, not dropped."""
    import numpy as np

    from odin_rs_spark.operators import multimodal as mm
    from odin_rs_spark.sources.audiocodec import decode_wav, encode_wav

    s = np.array([10, -20, 30, 40], dtype=np.int16)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, rate=4000)))],
        "media_id long, content binary",
    )
    r = mm.audio_resample_linear(media, dst_rate=8000).collect()[0]
    _, a = decode_wav(bytes(r.content))
    out = a[:, 0].tolist()
    # n_out = floor((n-1)*dst/src) + 1 = 7; j=6 sits exactly on s[3]
    assert r.n_samples == 7 and len(out) == 7
    assert out == [10, -5, -20, 5, 30, 35, 40]


def test_bpe_segment_words_separator_guard(spark):
    """ADVICE r6: words containing the separator char '·' are excluded
    (mirroring the training-side guard) instead of silently yielding a
    corrupted token count."""
    from odin_rs_spark.operators.text import bpe_segment_words

    words = spark.createDataFrame(
        [("lower",), ("a·b",), ("low",)], "w string"
    )
    out = {r.w: r.n_tokens for r in
           bpe_segment_words(words, [("l", "o"), ("lo", "w")]).collect()}
    assert out == {"lower": 3, "low": 1}  # 'a·b' excluded


def test_kcenter_string_ids_and_flagged_selection(spark):
    """ADVICE r6: greedy_kcenter_select works with STRING ids (result
    schema derives from the input, no hardcoded long), and selection
    state is a flag column, not a growing isin list."""
    from odin_rs_spark.operators.similarity import greedy_kcenter_select

    emb = spark.createDataFrame(
        [
            ("a", [0.0, 0.0]),
            ("b", [10.0, 0.0]),
            ("c", [0.1, 0.0]),
            ("d", [5.0, 5.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    sel = greedy_kcenter_select(emb, k=3).collect()
    assert [r.vec_id for r in sel] == ["a", "b", "d"]
    assert sel[0].dist == 0.0 and sel[1].dist == 100.0 and sel[2].dist == 50.0
    assert dict(greedy_kcenter_select(emb, k=3).dtypes)["vec_id"] == "string"


def test_iterative_ops_do_not_mutate_session_conf(spark, monkeypatch):
    """ADVICE r6: connected_components and bpe_train_merges scope their
    iteration parallelism via explicit repartition — the session-global
    spark.sql.shuffle.partitions is never touched (a concurrent query
    on the same session would silently inherit it)."""
    from pyspark.sql.conf import RuntimeConfig

    from odin_rs_spark.operators.dedup import connected_components
    from odin_rs_spark.operators.text import bpe_train_merges

    real_set = RuntimeConfig.set

    def guarded(self, key, value):
        assert key != "spark.sql.shuffle.partitions", (
            "operator mutated session-global shuffle.partitions"
        )
        return real_set(self, key, value)

    monkeypatch.setattr(RuntimeConfig, "set", guarded)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    comp = {
        r.node: r.component
        for r in connected_components(edges, driver_threshold=None).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low lowest low")], "doc_id long, text string"
    )
    merges = bpe_train_merges(docs, num_merges=2).collect()
    assert [(m.lhs, m.rhs) for m in merges] == [("l", "o"), ("lo", "w")]
