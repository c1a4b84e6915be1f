"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Pure Spark built-ins (codegen, no Python) — these run per-row on the
scan with zero shuffles, so they cost one pass over the corpus at any
scale and their predicates can push down when used as filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "pt": ["o", "de", "que"],
}


def _count_token(text: Column, token: str) -> Column:
    """Occurrences of ' token ' in ' '||text||' ' via length arithmetic
    (portable to any SQL engine; no regex)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {token} "
    # overlapping occurrences of " t " can't overlap since needle
    # starts/ends with the same separator; replace-based count is exact
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def language_id(
    docs: DataFrame, text_col: str = "text", result: str = "lang_pred"
) -> DataFrame:
    """Argmax of marker-word hit counts; 'und' when nothing matches.
    Ties break by language code order (deterministic)."""
    scores = [
        F.struct(
            sum(_count_token(F.col(text_col), t) for t in toks).alias("score"),
            F.lit(code).alias("lang"),
        )
        for code, toks in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return docs.withColumn(
        result,
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", result: str = "quality"
) -> DataFrame:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    stopword presence (the usual pretraining-corpus gates)."""
    t = F.col(text_col)
    n = F.length(t)
    n_space = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    words = n_space + 1
    avg_word_len = (n - n_space) / words
    stop_hits = sum(_count_token(t, w) for w in ["the", "a", "of", "and", "to"])
    len_ok = (n >= 100) & (n <= 20000)
    alpha_ratio = n_alpha / n
    score = (
        len_ok.cast("double") * F.lit(0.4)
        + F.least(alpha_ratio / F.lit(0.7), F.lit(1.0)) * F.lit(0.3)
        + F.least(stop_hits.cast("double") / F.lit(5.0), F.lit(1.0)) * F.lit(0.2)
        + ((avg_word_len >= 3) & (avg_word_len <= 10)).cast("double") * F.lit(0.1)
    )
    return docs.withColumn(result, score)


# GPT-2-style coarse token pattern: alpha runs, digit runs, punct runs
# (each with an optional leading space).  Classes are disjoint, so the
# match set is identical under Java regex (Spark) and RE2 (DuckDB).
BPE_TOKEN_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def token_count(
    docs: DataFrame, text_col: str = "text", result: str = "n_tokens"
) -> DataFrame:
    """Whitespace token count, a BPE-ish regex token count
    (GPT-2-style word/number/punct runs), and the chars/4 subword
    estimate used by tokenizer cost models.  All pure codegen."""
    t = F.trim(F.col(text_col))
    ws = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " +"))
    )
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
    return (
        docs.withColumn(result, ws.cast("long"))
        .withColumn(f"{result}_bpe", bpe.cast("long"))
        .withColumn(
            f"{result}_bpe_est", F.ceil(F.length(t) / F.lit(4)).cast("long")
        )
    )


def document_fingerprint(
    docs: DataFrame, text_col: str = "text", result: str = "fingerprint"
) -> DataFrame:
    """Deterministic content fingerprint: md5 of the text bytes plus a
    winnowing-style robust fingerprint (min md5 over 16-char windows,
    stride 4) that survives small edits."""
    t = F.col(text_col)
    n = F.greatest(F.length(t) - F.lit(15), F.lit(1))
    windows = F.transform(
        F.sequence(F.lit(1), n, F.lit(4)), lambda i: F.md5(t.substr(i, F.lit(16)).cast("binary"))
    )
    return docs.withColumn(result, F.md5(t.cast("binary"))).withColumn(
        f"{result}_robust", F.array_min(windows)
    )
