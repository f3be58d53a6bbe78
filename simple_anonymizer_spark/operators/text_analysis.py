"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting — all native column expressions.

Determinism contract: every score is either integer math or a division of
exact integers, so the DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import textops as T

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Frozen: contents and order are part of the operator spec.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "and", "is", "of", "to", "in", "that"],
    "es": ["el", "la", "los", "y", "es", "de", "que", "un"],
    "fr": ["le", "la", "les", "et", "est", "de", "que", "un"],
}

ENGLISH_STOPWORDS: list[str] = LANG_STOPWORDS["en"]


def token_count(col: Column | str) -> Column:
    return F.size(T.tokens(col))


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document stats: chars, tokens, distinct tokens, mean token
    length (exact ints divided -> double)."""
    tok = T.tokens(F.col(text_col))
    total_len = F.aggregate(
        tok, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
    )
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(tok).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("long").alias("n_distinct_tokens"),
        (total_len.cast("double") / F.size(tok).cast("double")).alias("mean_token_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality signals: stopword ratio, type-token ratio, and a
    compression-ish repetition proxy (distinct shingles / shingles)."""
    tok = T.tokens(F.col(text_col))
    stop_lit = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    stop_hits = F.size(F.filter(tok, lambda t: F.array_contains(stop_lit, t)))
    grams_all = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - F.lit(4), F.lit(1))),
        lambda i: F.substring(F.col(text_col), i, 5),
    )
    return df.select(
        F.col(id_col),
        (stop_hits.cast("double") / F.size(tok).cast("double")).alias("stopword_ratio"),
        (F.size(F.array_distinct(tok)).cast("double") / F.size(tok).cast("double")
         ).alias("type_token_ratio"),
        (F.size(F.array_distinct(grams_all)).cast("double")
         / F.size(grams_all).cast("double")).alias("shingle_diversity"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-hit language ID: score each language by token hits against
    its list; argmax with ties broken by language code (then 'und' when no
    hits at all). Output: ``doc id, predicted_lang, lang_hits``."""
    tok = T.tokens(F.col(text_col))

    def hit_filter(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scores = [
        (lang, F.size(F.filter(tok, hit_filter(words))))
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    # Deterministic argmax: fold over languages in code order, strict >.
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return df.select(
        F.col(id_col),
        best_lang.alias("predicted_lang"),
        best_score.cast("long").alias("lang_hits"),
    )
