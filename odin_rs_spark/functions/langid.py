"""Trained char-trigram language identification (VERDICT r8 stretch —
the model-based upgrade of `operators/text.lang_id`'s marker
heuristic). Public method: Cavnar & Trenkle 1994 n-gram text
categorization / fastText-style char n-grams scored as multinomial NB.

The MODEL is a committed fixture (`fixtures/langid_trigrams.csv`,
trained by `tools/train_langid.py` — the q130 .onnx pattern: training
happens offline, the artifact ships, the engine only scores). Scores
are INTEGERS centered against each language's unseen-trigram floor
(round(100·log(count+1)) — log-odds vs the floor), so a missing
(ngram, lang) pair contributes exactly ZERO: the scorer INNER-joins
and drops unmatched trigrams with no bias (a raw log-prob sum would
favor the language matching FEWEST trigrams), distributed sums are
exact, and Spark and the DuckDB oracle agree bit-for-bit.

Scale shape (the 100 TB plan): normalize → one higher-order trigram
explode (rows = chars per doc) → broadcast hash join against the
~2k-row model dim → two-level integer aggregation keyed by (doc,
lang) then doc. Zero Python in the scoring path; the model dim is
broadcast once per stage. Reference parity: odin-rs has no language
ID — this is LLM-pipeline surface beyond the reference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGID_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sources", "fixtures", "langid_trigrams.csv",
)


def load_langid_model(spark: SparkSession) -> DataFrame:
    """The trained trigram model as a (ngram, lang, score:int) dim —
    small enough to broadcast (TOP_K per language, ~2k rows)."""
    return (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(LANGID_FIXTURE)
        .select(
            F.col("ngram"),
            F.col("lang"),
            F.col("score").cast("int").alias("score"),
        )
    )


def langid_scores(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-(row, language) integer score frame — the shared front of
    `langid_trigram` (argmax) and `langid_route` (confidence-margin
    routing): normalize, trigram-explode, broadcast-join the model,
    integer-sum per (keys…, lang)."""
    keys = keys or ["doc_id"]
    norm = F.concat(
        F.lit(" "),
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "),
        F.lit(" "),
    )
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - 2, F.lit(0))),
        lambda i: norm.substr(i, F.lit(3)),
    )
    exploded = df.select(*keys, F.explode(tri).alias("ngram"))
    return (
        exploded.join(F.broadcast(model), "ngram")
        .groupBy(*keys, "lang")
        .agg(F.sum("score").alias("score"), F.count(F.lit(1)).alias("n_hits"))
    )


def langid_trigram(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-row trained language ID: (keys…, pred_lang, best_score,
    n_hits). Rows whose text matches NO model trigram predict 'und'
    with NULL score. Tie-break is deterministic: highest score, then
    the LAST language in lexicographic order (row_number over
    (score DESC, lang DESC) — replayed identically in SQL)."""
    keys = keys or ["doc_id"]
    scores = langid_scores(df, model, text_col, keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col("score").desc(), F.col("lang").desc()
    )
    best = (
        scores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *keys,
            F.col("lang").alias("pred_lang"),
            F.col("score").alias("best_score"),
            F.col("n_hits").alias("n_hits"),
        )
    )
    # rows with zero model hits (empty / out-of-model text) → 'und'
    return (
        df.select(*keys)
        .join(best, keys, "left")
        .select(
            *keys,
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            "best_score",
            "n_hits",
        )
    )


def langid_route(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    keys: list[str] | None = None,
    min_margin: int = 0,
) -> DataFrame:
    """Confidence-gated language routing (the fastText-style
    threshold a real corpus splitter runs: a doc only enters a
    language bucket when the top score CLEARS the runner-up by
    `min_margin` — near-ties between close languages like es/pt are
    exactly where blind argmax mis-routes): adds `margin` =
    best − second (second = 0 when only one language matched) and
    `routed_lang` = pred when margin ≥ min_margin else 'und'.
    Same scale shape as `langid_trigram`; the top-2 is one window
    over the 6-rows-per-doc score frame."""
    keys = keys or ["doc_id"]
    scores = langid_scores(df, model, text_col, keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col("score").desc(), F.col("lang").desc()
    )
    ranked = scores.withColumn("__rn", F.row_number().over(w))
    top = ranked.filter(F.col("__rn") == 1).select(
        *keys,
        F.col("lang").alias("pred_lang"),
        F.col("score").alias("best_score"),
    )
    second = ranked.filter(F.col("__rn") == 2).select(
        *keys, F.col("score").alias("second_score")
    )
    out = (
        df.select(*keys)
        .join(top, keys, "left")
        .join(second, keys, "left")
        .select(
            *keys,
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            "best_score",
            (
                F.col("best_score") - F.coalesce("second_score", F.lit(0))
            ).alias("margin"),
        )
    )
    return out.withColumn(
        "routed_lang",
        F.when(
            F.col("margin") >= min_margin, F.col("pred_lang")
        ).otherwise(F.lit("und")),
    )
