"""Model-based document quality scoring (the DCLM / fineweb-edu
pattern: rule filters like Gopher/C4 are recall tools; the KEEP
decision at corpus scale is a trained classifier scored over simple
text features). The model is a committed fixture
(`fixtures/quality_lr.csv`, trained offline by
`tools/train_quality.py` — the langid/q130 discipline: training
happens offline, the artifact ships, the engine only scores).

Scoring is PURE COLUMN MATH: six ratio features (each a single
division of two counts, so Spark and DuckDB produce the identical
IEEE double) dotted with fixture weights in a FIXED evaluation order —
w1*f1 + w2*f2 + ... left to right — so the logit is bit-identical in
any engine and the DuckDB oracle replays it with zero tolerance. The
logit (not the sigmoid) is the routed value: monotone in the
probability, free of libm exp() divergence.

`quality_features_py` is the trainer/test twin of the Spark
expressions; `tests/test_quality.py` pins them equal character for
character of the same semantics.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUALITY_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sources", "fixtures", "quality_lr.csv",
)

# fixed feature order — the dot product evaluates in THIS order
FEATURES = [
    "mean_word_len",
    "stopword_ratio",
    "punct_ratio",
    "digit_ratio",
    "caps_ratio",
    "distinct_ratio",
]

# small closed-class list; lowercase membership
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "it", "on", "for", "with", "as", "at", "by", "that", "this",
]


def load_quality_model() -> dict[str, float]:
    """fixture CSV → {feature: weight} + '__bias__' (driver-side: the
    model is a handful of floats, inlined as literals — no join)."""
    out: dict[str, float] = {}
    with open(QUALITY_FIXTURE, newline="") as f:
        for row in csv.DictReader(f):
            out[row["feature"]] = float(row["weight"])
    missing = [k for k in FEATURES + ["__bias__"] if k not in out]
    if missing:
        raise ValueError(f"quality model fixture missing {missing}")
    return out


def quality_features(text: Column) -> dict[str, Column]:
    """The six feature columns (all double; NULL-free for non-empty
    text). Counts come from length-difference of character-class
    removals — portable across regex engines."""
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    n_chars = F.length(text)
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(
        F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))
    )
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    n_caps = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    n_distinct = F.size(F.array_distinct(F.transform(words, F.lower)))
    # empty text: n_chars = 0 — NULLIF turns the ANSI-mode
    # divide-by-zero error into NULL ratios, matching the Python
    # twin's NaN degradation (n_words is never 0: split('') = [''])
    safe_chars = F.nullif(n_chars, F.lit(0))
    return {
        "mean_word_len": nonspace / n_words,
        "stopword_ratio": n_stop / n_words,
        "punct_ratio": n_punct / safe_chars,
        "digit_ratio": n_digit / safe_chars,
        "caps_ratio": n_caps / safe_chars,
        "distinct_ratio": n_distinct / n_words,
    }


def quality_logit(text: Column, model: dict[str, float]) -> Column:
    """bias + Σ w_i · f_i in the FIXED FEATURES order."""
    feats = quality_features(text)
    z: Column = F.lit(model["__bias__"])
    for name in FEATURES:
        z = z + F.lit(model[name]) * feats[name]
    return z


def quality_route(
    df: DataFrame, text_col: str = "text", keep_at: float = 1.0,
    drop_below: float = -1.0,
) -> DataFrame:
    """Adds `logit` (rounded 6dp) and `bucket` (keep / review / drop);
    thresholds compare against the ROUNDED value (the q147 float-band
    discipline)."""
    z = F.round(quality_logit(F.col(text_col), load_quality_model()), 6)
    bucket = (
        F.when(z >= keep_at, F.lit("keep"))
        .when(z < drop_below, F.lit("drop"))
        .otherwise(F.lit("review"))
    )
    return df.withColumn("logit", z).withColumn("bucket", bucket)


# ---------------------------------------------------------------------------
# trainer / test twin (plain Python, same semantics as the columns)
# ---------------------------------------------------------------------------

def quality_features_py(text: str) -> dict[str, float]:
    import re

    words = re.split(r"\s+", text.strip()) if text.strip() else [""]
    n_words = len(words)
    n_chars = len(text)
    if n_chars == 0:
        # mirror the Spark columns FEATURE BY FEATURE: split('') =
        # [''] makes n_words 1, so the word ratios compute normally
        # (0, 0 and 1), while the three char-ratios divide by the
        # NULLIF'd zero — NULL in Spark, NaN here (r11 review: an
        # all-NaN short-circuit diverged on the word-ratio features)
        return {
            "mean_word_len": 0.0,
            "stopword_ratio": 0.0,
            "punct_ratio": float("nan"),
            "digit_ratio": float("nan"),
            "caps_ratio": float("nan"),
            "distinct_ratio": 1.0,
        }
    nonspace = len(re.sub(r"\s", "", text))
    stops = set(STOPWORDS)
    n_stop = sum(1 for w in words if w.lower() in stops)
    n_punct = n_chars - len(re.sub(r"[.,;:!?]", "", text))
    n_digit = n_chars - len(re.sub(r"[0-9]", "", text))
    n_caps = n_chars - len(re.sub(r"[A-Z]", "", text))
    n_distinct = len({w.lower() for w in words})
    return {
        "mean_word_len": nonspace / n_words,
        "stopword_ratio": n_stop / n_words,
        "punct_ratio": n_punct / n_chars,
        "digit_ratio": n_digit / n_chars,
        "caps_ratio": n_caps / n_chars,
        "distinct_ratio": n_distinct / n_words,
    }


def quality_logit_py(text: str, model: dict[str, float]) -> float:
    feats = quality_features_py(text)
    z = model["__bias__"]
    for name in FEATURES:
        z = z + model[name] * feats[name]
    return z
