"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting — all native column expressions.

Determinism contract: every score is either integer math or a division of
exact integers, so the DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import textops as T


def _spread(df):
    from .dedup import ensure_parallelism

    return ensure_parallelism(df)

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
    df = _spread(df)
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


# Gopher rule constants (Rae et al. 2021, arXiv:2112.11446 §A1.1).
# Frozen: the lists and thresholds are part of the operator spec.
GOPHER_STOPWORDS: list[str] = ["the", "be", "to", "of", "and", "that",
                               "have", "with"]
GOPHER_BULLETS: list[str] = ["•", "-", "*"]


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, public
    arXiv:2112.11446 §A1.1) as one native-expression pass — the standard
    named pre-training quality gate, emitted as per-rule booleans plus
    the overall ``keep`` so downstream stages can audit WHICH rule fired,
    not just that one did.

    Rules (flag TRUE = rule passes): word count in [50, 100000]; mean
    word length in [3, 10]; '#' and ellipsis symbol-to-word ratios each
    <= 0.1; >= 80% of words contain an alphabetic character; <= 90% of
    lines start with a bullet; <= 30% of lines end with an ellipsis;
    >= ``min_stopwords`` of the 8 Gopher stop words present (default 2,
    the paper's threshold — Rae et al. tune it per corpus; synthetic or
    non-English corpora gate on 1). ``keep`` is the AND of all seven.

    Every threshold compares exact integers cross-multiplied (``10 *
    hash_count <= n_words``), never a float ratio — the flags can't
    drift between engines. The stopword-presence count is a lambda-free
    ``array_intersect`` (the lang_id CSE lesson). Single scan, no
    shuffle, no joins: at 100 TB this is a map-only filter that fuses
    into whatever reads the corpus next.
    """
    df = _spread(df)
    t = F.col(text_col)
    tok = T.tokens(t)
    n_words = F.size(tok).cast("long")
    total_len = F.aggregate(
        tok, F.lit(0).cast("long"), lambda a, w: a + F.length(w).cast("long")
    )
    hash_cnt = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
                ).cast("long")
    ell3 = ((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
            / F.lit(3)).cast("long")
    ell1 = (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
            ).cast("long")
    ellipsis_cnt = ell3 + ell1
    alpha_words = F.size(F.filter(tok, lambda w: w.rlike("[a-z]"))
                         ).cast("long")
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")
    trimmed = F.transform(lines, F.ltrim)
    bullet_lines = F.size(F.filter(
        trimmed,
        lambda ln: F.substring(ln, 1, 1).isin(GOPHER_BULLETS),
    )).cast("long")
    ellipsis_lines = F.size(F.filter(
        lines,
        lambda ln: F.rtrim(ln).endswith("...") | F.rtrim(ln).endswith("…"),
    )).cast("long")
    stop_lit = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_present = F.size(
        F.array_intersect(F.array_distinct(tok), stop_lit)
    ).cast("long")

    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        ((n_words >= 50) & (n_words <= 100000)).alias("wordcount_ok"),
        ((total_len >= 3 * n_words) & (total_len <= 10 * n_words))
        .alias("mean_wordlen_ok"),
        ((10 * hash_cnt <= n_words) & (10 * ellipsis_cnt <= n_words))
        .alias("symbol_ratio_ok"),
        (5 * alpha_words >= 4 * n_words).alias("alpha_words_ok"),
        (10 * bullet_lines <= 9 * n_lines).alias("bullet_lines_ok"),
        (10 * ellipsis_lines <= 3 * n_lines).alias("ellipsis_lines_ok"),
        (stop_present >= min_stopwords).alias("stopwords_ok"),
        (
            (n_words >= 50) & (n_words <= 100000)
            & (total_len >= 3 * n_words) & (total_len <= 10 * n_words)
            & (10 * hash_cnt <= n_words) & (10 * ellipsis_cnt <= n_words)
            & (5 * alpha_words >= 4 * n_words)
            & (10 * bullet_lines <= 9 * n_lines)
            & (10 * ellipsis_lines <= 3 * n_lines)
            & (stop_present >= min_stopwords)
        ).alias("keep"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 repetition filters, public arXiv:2112.11446): duplicate-token
    fraction, the hottest token bigram's coverage, and the duplicate-bigram
    fraction. Documents dominated by a few repeated n-grams are boilerplate
    or spam — the standard pre-training quality gate.

    Output per document: ``doc id, n_tokens, dup_token_frac, top_bigram_n,
    top_bigram_frac, dup_bigram_frac``. All fractions are single divisions
    of exact integers (NULL when the denominator is 0, matching DuckDB's
    x/0); ``top_bigram_frac = 2 * top_count / n_tokens`` can exceed 1.0 for
    overlapping runs ("a a a") by design — it is a signal, not a ratio.

    Scale (100 TB): bigram counting goes through explode -> two map-side-
    combinable aggregations keyed by (doc, bigram) then doc — never a
    per-row in-memory frequency map, so a pathological document costs
    rows, not driver/executor memory. The token-level stats ride the scan.
    """
    df = _spread(df)
    tok = T.tokens(F.col(text_col))
    # r13: the tokenize split is bound ONCE as a lambda leaf — the naive
    # form re-evaluated it 5x per row inside the bigram zip_with (the
    # T.adjacent_pairs trap) plus twice for the size stats; every
    # derived value now rides one struct over one evaluation.
    base = df.select(
        F.col(id_col),
        F.transform(
            F.array(tok),
            lambda t: F.struct(
                F.size(t).cast("long").alias("n_tokens"),
                F.size(F.array_distinct(t)).cast("long").alias("nd"),
                F.when(
                    F.size(t) >= 2,
                    F.zip_with(
                        F.slice(t, 1, F.size(t) - 1),
                        F.slice(t, 2, F.size(t) - 1),
                        lambda x, y: F.concat_ws(" ", x, y),
                    ),
                ).otherwise(F.array().cast("array<string>")).alias("bg"),
            ),
        )[0].alias("__st"),
    ).select(
        id_col,
        F.col("__st.n_tokens").alias("n_tokens"),
        F.col("__st.nd").alias("__n_distinct"),
        F.col("__st.bg").alias("__bg"),
    )
    per_bigram = (
        base.select(id_col, F.explode("__bg").alias("__bigram"))
        .groupBy(id_col, "__bigram")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    per_doc = per_bigram.groupBy(id_col).agg(
        F.max("__c").cast("long").alias("__top_n"),
        F.sum("__c").cast("long").alias("__n_bg"),
        F.count(F.lit(1)).cast("long").alias("__n_bg_distinct"),
    )

    def _frac(num: Column, den: Column) -> Column:
        return F.when(den == 0, F.lit(None).cast("double")).otherwise(
            num.cast("double") / den.cast("double")
        )

    joined = base.drop("__bg").join(per_doc, id_col, "left")
    top_n = F.coalesce(F.col("__top_n"), F.lit(0).cast("long"))
    n_bg = F.coalesce(F.col("__n_bg"), F.lit(0).cast("long"))
    return joined.select(
        F.col(id_col),
        "n_tokens",
        _frac(F.col("n_tokens") - F.col("__n_distinct"), F.col("n_tokens")).alias(
            "dup_token_frac"
        ),
        top_n.alias("top_bigram_n"),
        _frac(F.lit(2).cast("long") * top_n, F.col("n_tokens")).alias(
            "top_bigram_frac"
        ),
        _frac(n_bg - F.coalesce(F.col("__n_bg_distinct"), F.lit(0).cast("long")),
              n_bg).alias("dup_bigram_frac"),
    )


def duplicate_spans(
    df: DataFrame, k: int = 30, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document duplicated-span detection: the fraction of each
    document's character ``k``-gram positions whose gram also appears in at
    least one OTHER document — the distributed approximation of exact
    substring dedup (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better", public arXiv:2107.06499; suffix arrays don't
    distribute, rolling k-gram membership does).

    Output: ``doc id, n_grams, n_shared_grams, shared_frac`` where
    ``n_grams`` counts positions (with multiplicity) and ``shared_frac``
    is their shared fraction (single division of exact integers;
    ``n_grams >= 1`` always — a short text is its own single gram).

    Scale (100 TB): explode-by-position multiplies rows by document length
    — that is the honest cost of substring-level dedup. Both aggregations
    are map-side combinable; the gram join key is the natural partitioner.
    At trillion-gram scale, shuffle the 64-bit ``xxhash64(gram)`` instead
    of the 30-char string (declared collision tolerance ~n²/2⁶⁴) — kept
    exact here for bit-parity with the oracle.
    """
    df = _spread(df)
    n = F.length(F.col(text_col))
    grams_all = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.substring(F.col(text_col), i, k),
    )
    g = df.select(F.col(id_col), F.explode(grams_all).alias("__gram"))
    shared = (
        g.groupBy("__gram")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__gram", F.lit(1).alias("__shared"))
    )
    per_doc = (
        g.join(shared, "__gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count("__shared").cast("long").alias("n_shared_grams"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        "n_grams",
        "n_shared_grams",
        (F.col("n_shared_grams").cast("double")
         / F.col("n_grams").cast("double")).alias("shared_frac"),
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
        _spread(df).select(F.explode(T.tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    return counts.orderBy(
        F.desc("n_occurrences"), F.asc("token")
    ).limit(n)


def bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-level bigram language-model table: count(w1 w2) and the
    empirical conditional P(w2 | w1) — the count table a KenLM-style
    n-gram LM is estimated from.

    The context total is the sum of bigram counts per ``w1`` (occurrences
    of ``w1`` in non-final position), so probabilities per context sum to
    exactly 1; the division is integer-over-integer (cross-engine exact).

    Output: ``w1, w2, n_bigram, n_context, p_cond``.

    Scale (100 TB): in-row zip_with builds adjacent pairs without a
    positional self-join; then two map-side-combinable aggregations keyed
    by (w1, w2) and w1 — the same shape as corpus token counting. The
    output is bounded by the distinct-bigram vocabulary, not corpus size.
    """
    df = _spread(df)
    # tokenize split bound once per row (r13, T.adjacent_pairs)
    pairs = T.adjacent_pairs(
        T.tokens(F.col(text_col)),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        "array<struct<w1:string,w2:string>>",
    )
    exploded = df.select(F.explode(pairs).alias("__p")).select(
        F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2")
    )
    counts = exploded.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigram")
    )
    contexts = counts.groupBy("w1").agg(
        F.sum("n_bigram").cast("long").alias("n_context")
    )
    return (
        counts.join(contexts, "w1")
        .where(F.col("n_bigram") >= min_count)
        .select(
            "w1",
            "w2",
            "n_bigram",
            "n_context",
            (F.col("n_bigram").cast("double") / F.col("n_context").cast("double"))
            .alias("p_cond"),
        )
    )


def doc_surprisal(
    df: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document language-model surprisal in WHOLE BITS — the
    deterministic stand-in for CCNet-style perplexity filtering.

    True perplexity needs ``log``, whose last-bit rounding differs
    across engines; instead each bigram costs
    ``bits(n_context) - bits(n_bigram)`` where ``bits(n) =
    length(bin(n)) = floor(log2 n) + 1`` — an EXACT integer within one
    bit of ``-log2 P(w2|w1)``, computed identically everywhere. Unseen
    bigrams (scoring fresh docs against a trained ``lm``) cost
    ``bits(total_bigrams)`` — the ~zero-probability penalty.

    ``lm=None`` trains the bigram table on ``df`` itself (the corpus
    self-scoring setup, where every bigram is in-vocabulary).

    Output: ``<id_col>, n_bigrams (int64), total_bits (int64),
    mean_bits (double — one IEEE division; NULL for docs under two
    tokens)``. High mean-bits docs are the incoherent/outlier tail the
    perplexity filter drops.

    Scale (100 TB): pair explode is in-row (zip_with, no positional
    join); the LM join is keyed by the bigram — vocabulary-bounded, not
    corpus-bounded; the total is a broadcast single-row aggregate.
    """
    if lm is None:
        # Trained inline, the LM table feeds TWO consumers (the total
        # aggregate + the scoring join) — without the checkpoint each
        # re-derived the full corpus bigram explode+aggregate (r13, the
        # exchange-reuse lesson). The table is vocabulary²-bounded.
        lm = bigram_lm(
            df, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
    df = _spread(df)
    # tokenize split bound once per row (r13, T.adjacent_pairs)
    pairs = T.adjacent_pairs(
        T.tokens(F.col(text_col)),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        "array<struct<w1:string,w2:string>>",
    )
    doc_pairs = df.select(
        F.col(id_col), F.explode(pairs).alias("__p")
    ).select(id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    total = lm.agg(
        F.sum("n_bigram").cast("long").alias("__total")
    )

    def bits(c):
        return F.length(F.expr(f"bin({c})")).cast("long")

    scored = (
        doc_pairs.join(lm.select("w1", "w2", "n_bigram", "n_context"),
                       ["w1", "w2"], "left_outer")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.when(
                F.col("n_bigram").isNotNull(),
                bits("n_context") - bits("n_bigram"),
            ).otherwise(bits("__total")).alias("__bits"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__bits").cast("long").alias("total_bits"),
    )
    base = df.select(F.col(id_col))
    return base.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long"))
        .alias("n_bigrams"),
        F.coalesce(F.col("total_bits"), F.lit(0).cast("long"))
        .alias("total_bits"),
        (F.col("total_bits").cast("double")
         / F.col("n_bigrams").cast("double")).alias("mean_bits"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the classic
    corpus-linguistics pass for fixed phrases (Church & Hanks 1990),
    used in training pipelines to mine multi-word vocabulary units and
    to audit which bigrams an n-gram screen should treat as one token.

    ``PMI = log2( P(ab) / (P(a) P(b)) )`` needs ``log``; per the
    doc_surprisal rule every log2 is the exact integer binary length, so
    ``pmi_bits = bits(n_ab) + 2*bits(N_uni) - bits(N_bi) - bits(n_a)
    - bits(n_b)`` — within a few bits of true PMI, every operand an
    individually int64-safe count (no ``n * N`` products, which overflow
    at corpus scale). ``min_count`` prunes hapax pairs — the standard
    PMI-vs-rare-pair correction.

    Output: top-k ``w1, w2, n_pair, pmi_bits`` under the deterministic
    ``(pmi_bits DESC, n_pair DESC, w1, w2)`` order — plans as
    TakeOrderedAndProject. Count tables are vocabulary-bounded.
    """

    def bits(c) -> Column:
        col = F.col(c) if isinstance(c, str) else c
        return F.length(F.call_function("bin", col)).cast("long")

    tok = T.tokens(F.col(text_col))
    # tokenize split bound once per row (r13, T.adjacent_pairs); the
    # vocabulary-sized count tables checkpoint once — pair_counts feeds
    # the min_count filter AND the corpus bigram total, uni feeds the
    # unigram total AND both metric joins, so the corpus explodes run
    # exactly twice (pairs, tokens) instead of three-plus times.
    pairs = T.adjacent_pairs(
        tok,
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        "array<struct<w1:string,w2:string>>",
    )
    pair_counts = (
        df.select(F.explode(pairs).alias("__p"))
        .select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .localCheckpoint(eager=True)
    )
    bi = pair_counts.where(F.col("n_pair") >= min_count)
    uni = (
        df.select(F.explode(tok).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
        .localCheckpoint(eager=True)
    )
    totals = uni.agg(
        F.sum("n_w").cast("long").alias("__nu")
    ).crossJoin(
        F.broadcast(
            pair_counts.agg(
                F.sum("n_pair").cast("long").alias("__nb")
            )
        )
    )
    return (
        bi.join(uni.withColumnRenamed("w", "w1")
                .withColumnRenamed("n_w", "__na"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
              .withColumnRenamed("n_w", "__nbw"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "n_pair",
            (bits("n_pair") + F.lit(2) * bits("__nu")
             - bits("__nb") - bits("__na") - bits("__nbw"))
            .cast("long").alias("pmi_bits"),
        )
        .orderBy(F.col("pmi_bits").desc(), F.col("n_pair").desc(),
                 "w1", "w2")
        .limit(k)
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease features per document — a standard cheap
    quality-filter signal (alongside the Gopher rules): word, sentence,
    and syllable counts plus the Flesch score.

    Counts are exact integers computed in-row: sentences = non-empty
    ``[.!?]+`` splits (floored at 1 for unpunctuated text), syllables =
    vowel-group runs per token summed in ONE array fold. The Flesch
    formula is literal-double multiply/subtract on two divisions of
    already-identical integers — IEEE-identical cross-engine (no
    pow/ln). Empty documents emit NULL score.

    Output: ``<id_col>, n_words, n_sentences, n_syllables (int64),
    flesch (double)``.
    """
    tok = T.tokens(F.col(text_col))
    sentences = F.greatest(
        F.size(F.filter(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.trim(s) != F.lit(""),
        )),
        F.lit(1),
    ).cast("long")
    syllables = F.aggregate(
        tok,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.size(
            F.call_function("regexp_extract_all", t, F.lit("[aeiouy]+"),
                            F.lit(0))
        ).cast("long"),
    )
    out = df.select(
        F.col(id_col),
        F.size(tok).cast("long").alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
    )
    return out.select(
        "*",
        F.when(
            F.col("n_words") > 0,
            F.lit(206.835)
            - F.lit(1.015) * (F.col("n_words").cast("double")
                              / F.col("n_sentences").cast("double"))
            - F.lit(84.6) * (F.col("n_syllables").cast("double")
                             / F.col("n_words").cast("double")),
        ).alias("flesch"),
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group token-distribution divergence from the whole corpus in
    whole bits — the domain-shift census of a multi-source curation
    run: a source whose unigram distribution sits far from the corpus
    mix dominates remix decisions and deserves its own quality pass.
    ``KL(P_s || P) = sum_t P(t|s) * log2(P(t|s) / P(t))``; per the
    doc_surprisal rule every log2 is the exact integer binary length,
    and — the pmi_collocations overflow lesson — the ratio decomposes
    into SUMS of individually int64-safe lengths, never ``n * N``
    products::

        contrib(s, t) = n_ts * (bits(n_ts) + bits(N)
                                - bits(N_s) - bits(n_t))

    summed exactly per group (whole-bits is within a few bits of true
    KL and can go negative for a group made of corpus-common tokens —
    expected of the approximation, deterministic in both engines).

    Output: one row per group — ``<group_col>, n_tokens, n_terms
    (int64), kl_bits_total (int64), mean_kl_bits (double — one
    division of exact integers)``.

    Scale (100 TB): two token aggregations (group x term and term —
    both map-side combinable, term-keyed shuffles), the group totals
    are a domain-bounded broadcast, and the contribution join is keyed
    on the term. Nothing funnels through a single task.
    """

    def bits(c) -> Column:
        col = F.col(c) if isinstance(c, str) else c
        return F.length(F.call_function("bin", col)).cast("long")

    tok = _spread(df).select(
        F.col(group_col).alias("__g"),
        F.explode(T.tokens(F.col(text_col))).alias("__w"),
    )
    ts = tok.groupBy("__g", "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__nts"))
    tcorp = tok.groupBy("__w").agg(
        F.count(F.lit(1)).cast("long").alias("__nt"))
    gtot = ts.groupBy("__g").agg(
        F.sum("__nts").cast("long").alias("__ns"),
        F.count(F.lit(1)).cast("long").alias("__nterms"),
    )
    total = tok.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    contrib = (
        ts.join(tcorp, "__w")
        .join(F.broadcast(gtot), "__g")
        .crossJoin(F.broadcast(total))
        .select(
            "__g", "__ns", "__nterms",
            (F.col("__nts")
             * (bits("__nts") + bits("__n") - bits("__ns") - bits("__nt")))
            .cast("long").alias("__c"),
        )
    )
    return (
        contrib.groupBy(
            F.col("__g").alias(group_col),
            F.col("__ns").alias("n_tokens"),
            F.col("__nterms").alias("n_terms"),
        )
        .agg(F.sum("__c").cast("long").alias("kl_bits_total"))
        .select(
            group_col, "n_tokens", "n_terms", "kl_bits_total",
            (F.col("kl_bits_total").cast("double")
             / F.col("n_tokens").cast("double")).alias("mean_kl_bits"),
        )
    )
