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
    # Zero-token documents: emit NULL, not NaN — Spark's 0.0/0.0 is NaN but
    # DuckDB's is NULL, so the explicit guard keeps cross-engine parity.
    mean_len = F.when(F.size(tok) == 0, F.lit(None).cast("double")).otherwise(
        total_len.cast("double") / F.size(tok).cast("double")
    )
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(tok).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tok)).cast("long").alias("n_distinct_tokens"),
        mean_len.alias("mean_token_len"),
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
    # Zero-token guard (NULL, not NaN — parity with DuckDB's x/0 -> NULL);
    # grams_all always has >= 1 element so shingle_diversity needs none.
    def _ratio(num: Column) -> Column:
        return F.when(F.size(tok) == 0, F.lit(None).cast("double")).otherwise(
            num.cast("double") / F.size(tok).cast("double")
        )

    return df.select(
        F.col(id_col),
        _ratio(stop_hits).alias("stopword_ratio"),
        _ratio(F.size(F.array_distinct(tok))).alias("type_token_ratio"),
        (F.size(F.array_distinct(grams_all)).cast("double")
         / F.size(grams_all).cast("double")).alias("shingle_diversity"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-hit language ID: score each language by DISTINCT token hits
    against its list (``array_intersect`` — lambda-free so the whole scorer
    stays in codegen with subexpression elimination; per-row lambda filters
    measured ~6x slower here); argmax with ties broken by language code,
    'und' when no hits. Output: ``doc id, predicted_lang, lang_hits``."""
    tok_distinct = F.array_distinct(T.tokens(F.col(text_col)))
    langs = sorted(LANG_STOPWORDS)
    scores = {
        lang: F.size(F.array_intersect(
            tok_distinct, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        ))
        for lang in langs
    }
    best_score = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    predicted = F.when(best_score <= 0, F.lit("und"))
    for lang in langs[:-1]:
        predicted = predicted.when(scores[lang] == best_score, F.lit(lang))
    predicted = predicted.otherwise(F.lit(langs[-1]))
    return df.select(
        F.col(id_col),
        predicted.alias("predicted_lang"),
        best_score.cast("long").alias("lang_hits"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k rarest-weighted terms per document.

    Classic TF-IDF shape — term frequency joined against corpus document
    frequency — with the score defined as the exact rational ``tf / df``
    (both exact integers; a single IEEE double division) instead of
    ``tf * ln(N/df)``: the ranking signal is the same (monotone in tf,
    anti-monotone in df) but transcendental ``ln`` is NOT guaranteed
    bit-identical across engines, so it stays out of the determinism
    contract. Ties break by term text, then the per-doc rank is capped
    at k.

    Scale (100 TB): explode -> two partial-aggregations (per-doc tf, corpus
    df) -> equi-join on term -> per-doc top-k window. The df table is one
    row per distinct term — orders of magnitude smaller than the corpus —
    and the join key (term) is the natural partitioner; a hot stopword term
    is bounded by the per-doc distinct-term count, not the corpus.
    """
    toks = df.select(
        F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    from pyspark.sql import Window

    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df").cast("double")).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def top_tokens(
    df: DataFrame, n: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus heavy hitters: the n most frequent tokens with exact counts
    (ties broken by token text). Explode -> map-side-combinable count ->
    global top-n (TakeOrderedAndProject — no full sort materialization).
    The exact answer needs the full count pass; swap in a count-min sketch
    only when a bounded-error answer is acceptable."""
    counts = (
        df.select(F.explode(T.tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    return counts.orderBy(
        F.desc("n_occurrences"), F.asc("token")
    ).limit(n)
