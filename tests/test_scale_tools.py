"""Scale-tooling tests: salted aggregation/join equivalence, partition
pruning of the bronze layout, shuffle-free bucketed joins. These verify
the PLANS (pruning, exchange counts), not just the values — the 100 TB
behavior is the thing under test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odin_rs_spark.operators import skew
from odin_rs_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, "events", sf_dir)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_count_agg_matches_plain(spark, events):
    plain = {
        (r.event_type,): (r.n, round(r.sv, 4))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, round(r.sv, 4))
        for r in skew.salted_count_agg(
            events,
            ["event_type"],
            {"n": F.count(F.lit(1)), "sv": F.sum("value")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, events):
    dim = events.select("user_id").distinct().withColumn(
        "segment", (F.col("user_id") % 5).cast("int")
    )
    plain = events.join(dim, "user_id").groupBy("segment").count()
    salted = skew.salted_join(events, dim, "user_id", salt_buckets=4).groupBy(
        "segment"
    ).count()
    assert {(r.segment, r["count"]) for r in plain.collect()} == {
        (r.segment, r["count"]) for r in salted.collect()
    }


def test_partitioned_layout_prunes(spark, events, tmp_path):
    path = str(tmp_path / "bronze")
    skew.partitioned_layout(events, path, "ts", source_col=F.lit("events"))
    back = spark.read.parquet(path)
    some_date = back.select("p_date").limit(1).collect()[0].p_date
    q = back.filter((F.col("p_date") == some_date) & (F.col("p_hour") == 3))
    plan = _plan(q)
    # partition filters reached the scan → directory pruning at 100 TB
    assert "PartitionFilters" in plan
    assert q.count() == events.filter(
        (F.to_date("ts") == some_date) & (F.hour("ts") == 3)
    ).count()


def test_bucketed_join_has_no_shuffle(spark, events, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS users_bucketed")
    skew.write_bucketed(
        events.select("event_id", "user_id", "value"), "ev_bucketed", "user_id", 8
    )
    skew.write_bucketed(
        events.select("user_id").distinct().withColumn("seg", F.col("user_id") % 3),
        "users_bucketed",
        "user_id",
        8,
    )
    a = spark.table("ev_bucketed")
    b = spark.table("users_bucketed")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == a.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS users_bucketed")


def test_zorder_key_matches_reference(spark):
    from odin_rs_spark.operators.skew import zorder_key

    def ref(x: int, y: int, bits: int = 16) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.range(500).select(
        (F.col("id") % 40).cast("int").alias("x"),
        ((F.col("id") / 40).cast("int") * 3 % 30).cast("int").alias("y"),
    )
    got = df.withColumn("z", zorder_key(F.col("x"), F.col("y"))).collect()
    for r in got:
        assert r.z == ref(r.x, r.y), (r.x, r.y)


def test_zordered_layout_prunes_bbox_scan(spark, tmp_path):
    from odin_rs_spark.operators.skew import write_zordered, zorder_key

    cells = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
        (F.col("id") * 1.5).alias("v"),
    )
    path = str(tmp_path / "zcells")
    write_zordered(cells, path, "x", "y", bits=6, num_files=8)
    back = spark.read.parquet(path)
    # a bbox restated as a z-range prefilter + exact bbox predicate:
    # the z-range is a sargable parquet filter (row-group min/max prune),
    # the bbox check keeps exactness
    zlo, zhi = 0, 4095  # z-range covering the x,y < 64 quadrant subset
    q = back.filter(
        (F.col("__z") >= zlo) & (F.col("__z") <= zhi)
        & F.col("x").between(0, 15) & F.col("y").between(0, 15)
    )
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    assert "__z" in pushed
    want = {(r.x, r.y) for r in cells.filter(
        F.col("x").between(0, 15) & F.col("y").between(0, 15)).collect()}
    # z-range [0, 4095] contains the whole 16x16 quadrant (bits interleave
    # to < 2^12) so the prefilter loses nothing
    assert {(r.x, r.y) for r in q.collect()} == want


def test_approx_distinct_within_rsd(spark, events):
    from odin_rs_spark.operators.aggregations import approx_distinct

    got = {
        r.event_type: r.approx_distinct
        for r in approx_distinct(events, ["event_type"], "user_id").collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(3, 0.15 * n), (k, got[k], n)


class TestKmvThetaSketch:
    def test_small_set_is_exact(self, spark):
        from odin_rs_spark.operators.sketches import kmv_estimate, kmv_sketch

        df = spark.range(40).select(
            (F.col("id") % 2).cast("string").alias("g"),
            (F.col("id") % 10).alias("k"),
        )
        sk = kmv_sketch(df, "k", ["g"], k=64)
        est = {r.g: r for r in kmv_estimate(sk, ["g"], 64).collect()}
        # group 0 = even ids -> 5 distinct keys < k=64: sketch holds
        # the whole set, estimate is exact
        assert est["0"].n_sk == 5 and est["0"].est == 5.0

    def test_estimate_within_theory_bound(self, spark):
        from odin_rs_spark.operators.sketches import kmv_estimate, kmv_sketch

        n, k = 5000, 128
        df = spark.range(n).select(
            F.lit("a").alias("g"), F.col("id").alias("k")
        )
        est = kmv_estimate(kmv_sketch(df, "k", ["g"], k=k), ["g"], k).collect()[0]
        # KMV rse ~ 1/sqrt(k-2) ~ 8.9%; allow 4 sigma
        assert abs(est.est - n) / n < 4 / (k - 2) ** 0.5

    def test_sketch_is_partitioning_invariant(self, spark):
        from odin_rs_spark.operators.sketches import kmv_sketch

        df = spark.range(1000).select(
            F.lit("a").alias("g"), F.col("id").alias("k")
        )
        a = sorted(r.h for r in kmv_sketch(df, "k", ["g"], k=32).collect())
        b = sorted(
            r.h
            for r in kmv_sketch(df.repartition(13), "k", ["g"], k=32).collect()
        )
        assert a == b and len(a) == 32

    def test_intersection_exact_when_sets_small(self, spark):
        from odin_rs_spark.operators.sketches import kmv_intersect, kmv_sketch

        rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 25)]
        df = spark.createDataFrame(rows, "g string, k long")
        sk = kmv_sketch(df, "k", ["g"], k=64)
        out = kmv_intersect(sk, ["g"], "g", k=64).collect()[0]
        # both sides complete -> theta = full space -> exact overlap 10
        assert out.n_common == 10 and out.est_inter == 10.0

    def test_intersect_rejects_multi_group(self, spark):
        from odin_rs_spark.operators.sketches import kmv_intersect, kmv_sketch
        import pytest as _pytest

        df = spark.createDataFrame([("a", 1)], "g string, k long")
        sk = kmv_sketch(df, "k", ["g"], k=4)
        with _pytest.raises(ValueError):
            kmv_intersect(sk, ["g", "x"], "g", k=4)
