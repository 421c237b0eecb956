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
