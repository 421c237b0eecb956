"""Trained char-trigram language ID (functions/langid) — model
fixture provenance, scorer semantics, and accuracy on held-out word
salads."""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F

from odin_rs_spark.functions.langid import (
    LANGID_FIXTURE,
    langid_trigram,
    load_langid_model,
)


def test_fixture_matches_trainer():
    """The committed model IS tools/train_langid.py's output — the
    provenance pin (re-run the trainer, byte-compare)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_langid",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "train_langid.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import io
    import math
    from collections import Counter

    rows = []
    for lang, corpus in sorted(mod.CORPORA.items()):
        counts = Counter(mod.trigrams(corpus))
        for ng, c in sorted(counts.most_common(mod.TOP_K)):
            rows.append((ng, lang, round(100.0 * math.log(c + 1))))
    with open(LANGID_FIXTURE, newline="", encoding="utf-8") as f:
        got = [(r["ngram"], r["lang"], int(r["score"])) for r in csv.DictReader(f)]
    assert got == rows


def test_scorer_accuracy_and_und(spark):
    """Word salads in each of the six languages predict their true
    language (model quality pin); out-of-model text predicts 'und'."""
    samples = {
        "en": "the children walk to school every morning and the teachers read",
        "de": "die kinder gehen jeden morgen zur schule und die lehrer lesen",
        "fr": "les enfants marchent vers l'école chaque matin et les professeurs",
        "es": "los niños caminan a la escuela cada mañana y los maestros leen",
        "it": "i bambini camminano verso la scuola ogni mattina e gli insegnanti",
        "pt": "as crianças caminham para a escola todas as manhãs e os professores",
    }
    df = spark.createDataFrame(
        [(lang, text) for lang, text in samples.items()] + [("und", "0x9 0z8 0q7")],
        "doc_id string, text string",
    )
    out = langid_trigram(df, load_langid_model(spark), keys=["doc_id"])
    got = {r.doc_id: r.pred_lang for r in out.collect()}
    for lang in samples:
        assert got[lang] == lang, (lang, got[lang])
    assert got["und"] == "und"


def test_integer_scores_and_plan_shape(spark):
    """Scores are exact integer sums (no float argmax hazard) and the
    model join is a broadcast hash join — the 100 TB shape."""
    model = load_langid_model(spark)
    assert dict(model.dtypes)["score"] == "int"
    df = spark.createDataFrame([(1, "the water flows")], "doc_id long, text string")
    out = langid_trigram(df, model, keys=["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    r = out.collect()[0]
    assert isinstance(r.best_score, int) and r.pred_lang == "en"
