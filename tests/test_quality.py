"""Trained quality classifier (functions/quality): the Spark column
features and the Python trainer twin must agree bit-for-bit, the
committed model must separate obvious good/spam text, and routing
thresholds compare on the rounded logit."""

from __future__ import annotations

import pytest

from odin_rs_spark.functions.quality import (
    FEATURES,
    load_quality_model,
    quality_features_py,
    quality_logit_py,
    quality_route,
)

DOCS = [
    "The quick brown fox jumps over the lazy dog and runs to the river.",
    "BUY NOW!!! 100% FREE $$$ 4437-9921 CLICK win win win win",
    "the the the the the the",
    "A quiet morning walk by the park, with fresh bread in a basket.",
    "0118 999 881 999 119 7253",
]


class TestTwins:
    def test_spark_features_match_python_twin(self, spark):
        from pyspark.sql import functions as F

        from odin_rs_spark.functions.quality import quality_features

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(DOCS)], "i int, text string"
        )
        feats = quality_features(F.col("text"))
        rows = df.select(
            "i", *[feats[n].alias(n) for n in FEATURES]
        ).collect()
        for r in rows:
            ref = quality_features_py(DOCS[r.i])
            for n in FEATURES:
                assert getattr(r, n) == ref[n], (r.i, n)

    def test_empty_text_twins_agree_per_feature(self, spark):
        # ADVICE r10 + r11 review: empty text must degrade the SAME
        # way per feature in both twins — word ratios compute (split
        # ('') = ['']), char ratios are NULL/NaN — and the logit goes
        # NULL/NaN on both sides
        import math

        from pyspark.sql import functions as F

        from odin_rs_spark.functions.quality import (
            quality_features,
            quality_logit,
        )

        py = quality_features_py("")
        assert py["mean_word_len"] == 0.0
        assert py["stopword_ratio"] == 0.0
        assert py["distinct_ratio"] == 1.0
        assert all(math.isnan(py[k]) for k in
                   ("punct_ratio", "digit_ratio", "caps_ratio"))
        df = spark.createDataFrame([("",)], "text string")
        feats = quality_features(F.col("text"))
        row = df.select(
            *[feats[n].alias(n) for n in FEATURES]
        ).collect()[0]
        for n in FEATURES:
            sv, pv = getattr(row, n), py[n]
            if sv is None:
                assert math.isnan(pv), n
            else:
                assert sv == pv, n
        m = load_quality_model()
        assert math.isnan(quality_logit_py("", m))
        z = df.select(quality_logit(F.col("text"), m).alias("z")).collect()[0].z
        assert z is None or (isinstance(z, float) and math.isnan(z))

    def test_spark_logit_matches_python_twin(self, spark):
        from pyspark.sql import functions as F

        from odin_rs_spark.functions.quality import quality_logit

        m = load_quality_model()
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(DOCS)], "i int, text string"
        )
        rows = df.select(
            "i", quality_logit(F.col("text"), m).alias("z")
        ).collect()
        for r in rows:
            assert r.z == quality_logit_py(DOCS[r.i], m)


class TestModel:
    def test_fixture_has_all_weights(self):
        m = load_quality_model()
        assert set(m) == set(FEATURES) | {"__bias__"}

    def test_separates_good_from_spam(self):
        m = load_quality_model()
        assert quality_logit_py(DOCS[0], m) > 1.0
        assert quality_logit_py(DOCS[3], m) > 1.0
        assert quality_logit_py(DOCS[1], m) < -1.0
        assert quality_logit_py(DOCS[4], m) < -1.0
        # degenerate repetition is not 'keep' despite being all stopwords
        assert quality_logit_py(DOCS[2], m) < 1.0


class TestRouting:
    def test_buckets_follow_rounded_thresholds(self, spark):
        df = spark.createDataFrame([(t,) for t in DOCS], "text string")
        out = quality_route(df).collect()
        for r in out:
            if r.logit >= 1.0:
                assert r.bucket == "keep"
            elif r.logit < -1.0:
                assert r.bucket == "drop"
            else:
                assert r.bucket == "review"

    def test_custom_thresholds(self, spark):
        df = spark.createDataFrame([(DOCS[0],)], "text string")
        out = quality_route(df, keep_at=1e9).collect()[0]
        assert out.bucket == "review"
