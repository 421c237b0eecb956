"""Text column functions for the training-data pipeline operators.

All native Spark expressions (regexp/split/transform) so they vectorize
JVM-side; the dedup/similarity/language-ID operators in
odin_rs_spark.operators.text build on these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word-ish tokens: letter/digit runs, keeps apostrophe contractions (BPE-ish
# pre-tokenization boundary, similar to the GPT-2 pattern's word classes).
TOKEN_PATTERN = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def norm_text(c: Column | str) -> Column:
    """Lowercase + collapse whitespace — canonical form for exact dedup."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Array of word/number/punct tokens (regexp-based, BPE-ish boundaries)."""
    return F.regexp_extract_all(_col(c), F.lit(TOKEN_PATTERN), 0)


def token_count(c: Column | str) -> Column:
    """Whitespace-token count (fast path; regexp_count of token pattern for
    the BPE-ish count)."""
    text = F.trim(_col(c))
    return F.when(text == "", F.lit(0)).otherwise(F.size(F.split(text, r"\s+"))).cast("long")


def char_ngrams(c: Column | str, n: int = 5) -> Column:
    """Array of character n-grams (shingles) of the normalized text."""
    s = norm_text(c)
    # sequence over char offsets → substring slices; JVM-side, no UDF.
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - F.lit(n - 1), F.lit(1))),
        lambda i: s.substr(i, F.lit(n)),
    )


def quality_features(c: Column | str) -> dict[str, Column]:
    """Document quality heuristics (length / punctuation / word stats).

    Returns named columns; operators/text.py combines them into a score.
    """
    text = _col(c)
    n_chars = F.length(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", "")).cast("double")
    n_space = F.length(F.regexp_replace(text, r"[^ \t\n]", "")).cast("double")
    n_words = token_count(text).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "alpha_ratio": n_alpha / safe_chars,
        "digit_ratio": n_digit / safe_chars,
        "punct_ratio": n_punct / safe_chars,
        "space_ratio": n_space / safe_chars,
        "mean_word_len": F.when(n_words > 0, (n_chars - n_space) / n_words).otherwise(F.lit(0.0)),
    }
