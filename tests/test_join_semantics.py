"""Randomized equivalence tests for the as-of / interval / nearest join
helpers against plain-Python reference implementations (seeded, fixed
datasets — each case is one Spark job, so examples are few and fat),
plus an ANN recall measurement against exact brute force."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from odin_rs_spark.operators import joins, similarity


def _mk_events(seed: int, n_keys=4, n_left=60, n_right=40):
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    left = [
        Row(
            k=f"k{rng.randrange(n_keys)}",
            ts=t0 + dt.timedelta(seconds=rng.randrange(0, 3600)),
            lid=i,
        )
        for i in range(n_left)
    ]
    right = [
        Row(
            k=f"k{rng.randrange(n_keys)}",
            ts=t0 + dt.timedelta(seconds=rng.randrange(0, 3600)),
            rid=i,
            payload=float(i) * 1.5,
        )
        for i in range(n_right)
    ]
    return left, right


def _ref_asof(left, right, direction, tolerance_sec=None):
    """Per-left-row scan reference: latest right ≤ ts (backward) /
    earliest right ≥ ts (forward), ties broken by max/min rid."""
    out = {}
    for l in left:  # noqa: E741
        cands = [r for r in right if r.k == l.k]
        if direction == "backward":
            cands = [r for r in cands if r.ts <= l.ts]
            key = lambda r: (r.ts, r.rid)  # noqa: E731
            best = max(cands, key=key, default=None)
        else:
            cands = [r for r in cands if r.ts >= l.ts]
            best = min(cands, key=lambda r: (r.ts, -r.rid), default=None)
        if best is not None and tolerance_sec is not None:
            if abs((best.ts - l.ts).total_seconds()) > tolerance_sec:
                best = None
        out[l.lid] = best.rid if best is not None else None
    return out


def test_asof_backward_forward_tolerance(spark):
    for seed in (7, 42, 1234):
        left_rows, right_rows = _mk_events(seed)
        left = spark.createDataFrame(left_rows)
        right = spark.createDataFrame(right_rows)
        for direction in ("backward", "forward"):
            for tol in (None, 300.0):
                got = {
                    r.lid: r.rid
                    for r in joins.asof_join(
                        left,
                        right,
                        on="k",
                        ts="ts",
                        direction=direction,
                        tolerance_sec=tol,
                        right_order="rid",
                    ).collect()
                }
                want = _ref_asof(left_rows, right_rows, direction, tol)
                assert got == want, f"seed={seed} {direction} tol={tol}"


def test_interval_join_matches_reference(spark):
    rng = random.Random(99)
    t0 = dt.datetime(2024, 1, 1)
    pts = [
        Row(pid=i, ts=t0 + dt.timedelta(seconds=rng.randrange(0, 2000)))
        for i in range(80)
    ]
    ivs = []
    for i in range(25):
        s = rng.randrange(0, 1800)
        ivs.append(
            Row(
                iid=i,
                start=t0 + dt.timedelta(seconds=s),
                end=t0 + dt.timedelta(seconds=s + rng.randrange(60, 400)),
            )
        )
    got = {
        (r.pid, r.iid)
        for r in joins.interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(ivs),
            ts="ts",
            start="start",
            end="end",
        ).collect()
    }
    want = {
        (p.pid, iv.iid) for p in pts for iv in ivs if iv.start <= p.ts <= iv.end
    }
    assert got == want


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5)
    approx = similarity.ann_lsh_topk(emb, queries, k=5, num_planes=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 4 hyperplanes → 16 buckets; deterministic signatures. Pinned floor:
    # measured ~0.8 on the seeded sf0.001/sf0.01 embeddings.
    assert recall >= 0.5, f"ANN recall degraded: {recall:.3f}"


def test_nearest_join_empty_payload_and_map_payload(spark):
    """Round-3 ADVICE regressions: (a) an explicit payload=[] means
    'key + distance only' (it used to be swallowed by `payload or ...`
    into all-columns), for both k=1 and k>1; (b) a MapType payload —
    non-orderable, so it can never ride inside a sort key — still works
    on the k>1 path via the window fallback."""
    left = spark.createDataFrame([Row(pid=i, x=float(i)) for i in range(4)])
    right = spark.createDataFrame(
        [Row(rid=j, rx=float(3 * j), props={"tag": str(j)}) for j in range(3)]
    )
    dist = F.abs(F.col("x") - F.col("rx"))
    for k in (1, 2):
        slim = joins.nearest_join(left, right, dist, "pid", k=k, payload=[])
        assert set(slim.columns) == {"pid", "__dist"}
        assert slim.count() == 4 * min(k, 3)
    got = joins.nearest_join(
        left, right, dist, "pid", k=2, tiebreak=["rid"], payload=["rid", "props"]
    ).collect()
    assert {type(r.props) for r in got} == {dict}
    exp = {
        l: sorted(((abs(float(l) - 3 * j), j) for j in range(3)))[:2]
        for l in range(4)
    }
    for r in got:
        assert (r["__dist"], r.rid) in exp[r.pid]
    # k=1 with map payload rides min_by (no sort-key orderability issue)
    one = joins.nearest_join(left, right, dist, "pid", k=1, payload=["rid", "props"])
    assert one.count() == 4 and "props" in one.columns


def test_ivf_sampled_kmeans_recall_vs_exact(spark, sf_dir):
    """`ivf_topk` (driver-side sampled-kmeans centroids) lost its catalog
    slot to the oracle-replayable Lloyd variant in round 3 — this pins its
    behavior directly: k results per query, exact cosine scores, and
    recall vs brute force above the measured floor."""
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(
        emb, queries, k=5, num_centroids=8, nprobe=3, train_fraction=1.0
    )
    a_rows = approx.collect()
    per_q = {}
    for r in a_rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 5 for v in per_q.values())
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in a_rows}
    recall = len(e & a) / len(e)
    # 8 cells, 3 probed: measured ~0.9+ on the seeded embeddings
    assert recall >= 0.5, f"IVF recall degraded: {recall:.3f}"


def test_ivf_lloyd_matches_fixed_seed_tail(spark, sf_dir):
    """ivf_lloyd_topk with zero iterations must equal ivf_fixed_topk on
    the same seeds (the Lloyd loop is a pure refinement of the shared
    assign/probe/re-rank tail)."""
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    seeds = [11, 23, 37, 41, 53, 67, 79, 97]
    fixed = similarity.ivf_fixed_topk(emb, queries, seeds, k=5, nprobe=3)
    lloyd0 = similarity.ivf_lloyd_topk(emb, queries, seeds, iters=0, k=5, nprobe=3)
    fr = {(r.query_id, r.vec_id, r.rank) for r in fixed.collect()}
    lr = {(r.query_id, r.vec_id, r.rank) for r in lloyd0.collect()}
    assert fr == lr


def test_nearest_join_topk_matches_bruteforce(spark):
    """k>1 nearest: the top-k aggregation path must equal a brute-force
    per-key sort, including deterministic tie-breaking."""
    random.seed(7)
    lrows = [Row(pid=i, x=random.uniform(0, 100)) for i in range(40)]
    rrows = [Row(rid=j, rx=random.uniform(0, 100)) for j in range(25)]
    left, right = spark.createDataFrame(lrows), spark.createDataFrame(rrows)
    dist = F.abs(F.col("x") - F.col("rx"))
    got = joins.nearest_join(
        left, right, dist, "pid", k=3, tiebreak=["rid"], payload=["rid"]
    ).collect()
    by_pid = {}
    for row in got:
        by_pid.setdefault(row.pid, []).append((row["__dist"], row.rid))
    exp = {
        l.pid: sorted(((abs(l.x - r.rx), r.rid) for r in rrows))[:3] for l in lrows
    }
    assert set(by_pid) == set(exp)
    for pid, pairs in by_pid.items():
        assert sorted(pairs) == [(d, rid) for d, rid in exp[pid]], pid
