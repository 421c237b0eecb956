"""Tests for vector math, convexity/expansion, datetime helpers, and the
driver-side schedule compaction (SURVEY §2.9, A2/T2)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F

from odin_rs_spark.functions import datetimes, polygon, vectors
from odin_rs_spark.streaming import schedule


def one(df):
    return df.collect()[0]


def test_vector_ops(spark):
    r = one(
        spark.range(1).select(
            vectors.cross3(vectors.vec3(1.0, 0.0, 0.0), vectors.vec3(0.0, 1.0, 0.0)).alias("cr"),
            vectors.dot3(vectors.vec3(1.0, 2.0, 3.0), vectors.vec3(4.0, 5.0, 6.0)).alias("dt"),
            vectors.norm3(vectors.vec3(3.0, 4.0, 0.0)).alias("nm"),
            vectors.unit3(vectors.vec3(0.0, 0.0, 5.0)).alias("un"),
            vectors.angle_between(vectors.vec3(1.0, 0.0, 0.0), vectors.vec3(0.0, 2.0, 0.0)).alias("ang"),
            vectors.scale3(vectors.vec3(1.0, -2.0, 3.0), 2.0).alias("sc"),
        )
    )
    assert (r.cr.x, r.cr.y, r.cr.z) == (0.0, 0.0, 1.0)
    assert r.dt == 32.0
    assert r.nm == 5.0
    assert (r.un.x, r.un.y, r.un.z) == (0.0, 0.0, 1.0)
    assert abs(r.ang - math.pi / 2) < 1e-12
    assert (r.sc.x, r.sc.y, r.sc.z) == (2.0, -4.0, 6.0)


def _poly_lit(pts):
    return F.array(
        *[F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat")) for x, y in pts]
    )


def test_is_convex(spark):
    square = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    dart = [(0.0, 0.0), (4.0, 0.0), (1.0, 1.0), (0.0, 4.0)]  # reflex vertex
    r = one(
        spark.range(1).select(
            polygon.is_convex(_poly_lit(square)).alias("sq"),
            polygon.is_convex(_poly_lit(list(reversed(square)))).alias("sq_cw"),
            polygon.is_convex(_poly_lit(dart)).alias("dart"),
        )
    )
    assert r.sq is True and r.sq_cw is True and r.dart is False


def test_expand_on_centroid(spark):
    square = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    r = one(
        spark.range(1).select(
            polygon.expand_on_centroid(_poly_lit(square), 2.0).alias("p")
        )
    )
    assert (r.p[0].lon, r.p[0].lat) == (-2.0, -2.0)
    assert (r.p[2].lon, r.p[2].lat) == (6.0, 6.0)


def test_datetime_helpers(spark):
    r = one(
        spark.sql(
            "SELECT TIMESTAMP '2024-03-05 17:42:13.250' AS ts,"
            " TIMESTAMP '2024-03-05 18:00:00' AS later"
        ).select(
            datetimes.with_hms("ts", 6, 30, 0).alias("hms"),
            datetimes.elapsed_seconds("ts", "later").alias("el"),
            datetimes.epoch_millis("ts").alias("ms"),
        )
    )
    assert str(r.hms) == "2024-03-05 06:30:00"
    assert abs(r.el - 1066.75) < 1e-9
    assert r.ms == 1709660533250


def test_parse_flexible(spark):
    df = spark.createDataFrame(
        [
            ("2024-03-05T17:42:13+00:00",),
            ("2024/03/05 17:42:13",),
            ("2024-03-05",),
            ("not a date",),
        ],
        ["s"],
    )
    got = [str(r.t) if r.t else None for r in df.select(datetimes.parse_flexible("s").alias("t")).collect()]
    assert got == [
        "2024-03-05 17:42:13",
        "2024-03-05 17:42:13",
        "2024-03-05 00:00:00",
        None,
    ]


def test_schedule_compaction_and_next_event():
    hist = {2: 5, 3: 4, 17: 6, 18: 1, 47: 3, 59: 1}
    sched = schedule.schedule_from_histogram(hist, min_count=2, merge_within=2)
    assert sched == [2, 17, 47]  # 3 merged into 2; 18 below min_count; 59 too
    now = dt.datetime(2024, 1, 1, 10, 20, 0)
    assert schedule.next_event(now, sched) == dt.datetime(2024, 1, 1, 10, 47)
    assert schedule.next_event(
        dt.datetime(2024, 1, 1, 10, 50), sched
    ) == dt.datetime(2024, 1, 1, 11, 2)
    assert schedule.next_event(now, sched, slack_sec=30) == dt.datetime(
        2024, 1, 1, 10, 47, 30
    )


def test_script_stats_counts_and_flags(spark):
    from odin_rs_spark.operators.text import script_stats

    rows = [
        (1, "hello world 123"),
        (2, "Привет мир"),
        (3, "hello Привет world мирок"),  # 10 latin + 10 cyrillic
        (4, "中文语料库测试"),
        (5, "مرحبا بالعالم"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in script_stats(df).collect()}
    assert (out[1].n_latin, out[1].n_digit, out[1].dominant_script) == (
        10, 3, "latin")
    assert out[1].mixed_script == 0
    assert (out[2].n_cyrillic, out[2].dominant_script) == (9, "cyrillic")
    assert out[3].mixed_script == 1 and out[3].n_latin == 10
    assert out[4].dominant_script == "cjk" and out[4].n_cjk == 7
    assert out[5].dominant_script == "arabic" and out[5].n_arabic > 0


def test_char_entropy_known_values(spark):
    import math

    from odin_rs_spark.operators.text import char_entropy

    rows = [
        (1, "aaaa"),        # one symbol -> 0 bits
        (2, "abab"),        # two equiprobable -> 1 bit
        (3, "abcd"),        # four equiprobable -> 2 bits
        (4, "aab"),         # 2/3,1/3
        (5, ""),            # empty -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[1].entropy_bits == 0.0
    assert out[2].entropy_bits == pytest.approx(1.0)
    assert out[3].entropy_bits == pytest.approx(2.0)
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert out[4].entropy_bits == pytest.approx(want)
    assert out[5].entropy_bits is None and out[5].n_chars_ent == 0
    # zero-shuffle, zero-Python plan
    plan = char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan[:500]


class TestBenfordStatistic:
    def test_log_uniform_series_conforms(self, spark):
        """A genuinely multiplicative (log-uniform) series must PASS
        the q302 screen: chi2 far below the 3000 gate, while the
        synthetic TPC-H columns sit ~20000 (pinned by the oracle)."""
        import math

        from pyspark.sql import functions as F

        vals = [(10.0 ** (i / 997.0 * 3.0),) for i in range(997)]
        df = spark.createDataFrame(vals, "v double")
        s = F.substring(
            F.regexp_replace(F.abs(F.col("v")).cast("string"),
                             r"[^1-9].*$|^0+", ""), 1, 1)
        d1 = F.when(s != "", s).cast("int")
        obs = (df.select(d1.alias("d")).where(F.col("d").isNotNull())
               .groupBy("d").count().collect())
        n = sum(r["count"] for r in obs)
        chi = sum(
            (r["count"] - math.log10(1 + 1 / r.d) * n) ** 2
            / (math.log10(1 + 1 / r.d) * n)
            for r in obs
        )
        assert chi < 30.0, chi

    def test_uniform_series_fails(self, spark):
        import math

        from pyspark.sql import functions as F

        df = spark.range(1000).select((F.col("id") % 50 + 1.0).alias("v"))
        s = F.substring(
            F.regexp_replace(F.abs(F.col("v")).cast("string"),
                             r"[^1-9].*$|^0+", ""), 1, 1)
        obs = (df.select(F.when(s != "", s).cast("int").alias("d"))
               .groupBy("d").count().collect())
        n = sum(r["count"] for r in obs)
        chi = sum(
            (r["count"] - math.log10(1 + 1 / r.d) * n) ** 2
            / (math.log10(1 + 1 / r.d) * n)
            for r in obs
        )
        assert chi > 300.0, chi


class TestClampedBalanceReflection:
    def test_window_form_equals_sequential_state_machine(self, spark):
        """q311's closed form b_t = c_t - min(0, running_min(c)_t) must
        equal the sequential clamp b_t = max(0, b_{t-1} + f_t), with
        lost sales = -min(0, min(c))."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        flows = [5, -8, 3, -1, -4, 10, -2, -20, 7]
        df = spark.createDataFrame(
            [(i, f) for i, f in enumerate(flows)], "i int, flow long"
        )
        w = (
            Window.partitionBy(F.lit(1))
            .orderBy("i")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = (
            df.withColumn("c", F.sum("flow").over(w))
            .withColumn("m", F.min("c").over(w))
            .withColumn(
                "balance",
                F.col("c") - F.least(F.lit(0).cast("bigint"), F.col("m")),
            )
            .orderBy("i")
            .collect()
        )
        b, lost = 0, 0
        for r, f in zip(out, flows):
            nxt = b + f
            if nxt < 0:
                lost += -nxt
                nxt = 0
            b = nxt
            assert r.balance == b, (r.i, r.balance, b)
        assert -min(0, min(r.c for r in out)) == lost
