"""Lexical retrieval: BM25 scoring over a tokenized document corpus.

Complements the embedding-side retrieval stack (`operators/similarity.py`
ANN + `pipeline_retrieval`) with the sparse half of a hybrid RAG pipeline:
corpus statistics (document frequency, length normalization) joined back
against per-document term frequencies.

Determinism contract: BM25's usual ``ln``-based IDF is transcendental and
NOT guaranteed bit-identical across engines, so — like
``text_analysis.tfidf_top_terms`` — the score keeps the same monotone
structure but stays inside exactly-specified IEEE arithmetic:

* the TF saturation term ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
  with k1=1.2, b=0.75 is multiplied through by ``10 * total_len`` so both
  numerator and denominator are exact int64 products::

      tf_part = (22*tf*total_len) / (10*tf*total_len + 3*total_len + 9*dl*N)

* IDF becomes the exact rational ``(2N - 2df + 1) / (2df + 1)`` — the
  Robertson-Sparck-Jones odds with the +0.5 smoothing cleared of its
  halves (monotone-equivalent to ``ln`` of it);
* each per-term score is two correctly-rounded divisions and one multiply
  (bit-identical everywhere), and the per-document sum goes through
  2^20 fixed-point so the accumulation is an exact integer sum, immune to
  float addition order.

int64 bounds: ``22 * tf * total_len`` must stay below 2^63 — fine up to
corpora of ~4e16 token-occurrences per shard of the stats join; beyond
that, compute corpus stats per partition-group.

Scale (100 TB): one explode pass feeds two map-side-combinable aggregates
(per-doc tf, per-doc length); df is an aggregate of tf keyed by term;
corpus scalars (N, total_len) broadcast via a one-row cross join; the
scored join is keyed on the query's terms (a broadcast list). Global
top-k is orderBy+limit = TakeOrderedAndProject, never a single-partition
window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textops as T

FP_SCALE = 1 << 20  # fixed-point scale for the per-document score sum


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 against a bag of query terms.

    Output: ``id_col, score_fp (int64 fixed point), score (double),
    n_terms_hit, rank`` — rank ties broken by the document id.
    """
    return bm25_from_index(
        build_term_index(df, text_col, id_col), query_terms, top_k, id_col
    )


def build_term_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The persisted inverted-index shape for BM25: one posting row per
    ``(term, doc)`` carrying everything scoring needs — ``term, <id>,
    tf, dl, df, n_docs, total_len``. Build once per corpus version,
    write partitioned/bucketed by ``term``, and serve every query from
    it (``bm25_from_index``) — the index-once / query-many production
    split, exactly like ``dedup.minhash_band_index`` for LSH.

    The corpus scalars are denormalized into every row: 16 bytes/row
    that parquet RLE-compresses to ~nothing, in exchange for a
    self-contained single-table index (no stats sidecar to version).

    Scale (100 TB): one explode pass feeds two map-side-combinable
    aggregates; df is an aggregate of tf keyed by term; scalars
    broadcast via a one-row cross join. Query-time cost against the
    stored index is the postings of the query's terms only — a
    pushed-down ``term IN (...)`` filter that partition-prunes a
    term-bucketed layout."""
    toks = df.select(
        F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    corpus = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).crossJoin(
        toks.agg(F.count(F.lit(1)).cast("long").alias("total_len"))
    )
    return (
        tf.join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .select("term", id_col, "tf", "dl", "df", "n_docs", "total_len")
    )


def bm25_from_index(
    index: DataFrame,
    query_terms: list[str],
    top_k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a term bag against a prebuilt ``build_term_index`` table.
    Identical output to ``bm25_scores`` (which delegates here) — same
    integer rationals, same 2^20 fixed-point accumulation, same
    deterministic rank order."""
    hits = index.where(F.col("term").isin(*query_terms))
    tf_part = (
        (F.lit(22).cast("long") * F.col("tf") * F.col("total_len")).cast("double")
        / (
            F.lit(10).cast("long") * F.col("tf") * F.col("total_len")
            + F.lit(3).cast("long") * F.col("total_len")
            + F.lit(9).cast("long") * F.col("dl") * F.col("n_docs")
        ).cast("double")
    )
    idf_part = (
        (F.lit(2).cast("long") * F.col("n_docs")
         - F.lit(2).cast("long") * F.col("df") + F.lit(1)).cast("double")
        / (F.lit(2).cast("long") * F.col("df") + F.lit(1)).cast("double")
    )
    term_score_fp = F.floor(tf_part * idf_part * F.lit(float(FP_SCALE)))

    scored = (
        hits.select(F.col(id_col), term_score_fp.alias("__fp"))
        .groupBy(id_col)
        .agg(
            F.sum("__fp").cast("long").alias("score_fp"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score_fp"), F.asc(id_col))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("score_fp"), F.asc(id_col))
    return scored.select(
        id_col,
        "score_fp",
        (F.col("score_fp").cast("double") / F.lit(float(FP_SCALE))).alias("score"),
        "n_terms_hit",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def rm3_expansion(
    df: DataFrame,
    query_terms: list[str],
    fb_docs: int = 10,
    fb_terms: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RM3-style pseudo-relevance-feedback expansion terms (Lavrenko &
    Croft relevance models): retrieve the BM25 top-``fb_docs``, weight
    each feedback-document term by ``tf(t,d)/dl(d)`` times the
    document's retrieval score, and emit the top-``fb_terms`` NEW terms
    (the original query terms are excluded — interpolation back into
    the query is the caller's mixing step). The standard query-expansion
    move of a lexical retrieval pipeline.

    Determinism contract (the bm25_scores pattern): the per-(term, doc)
    contribution is the exact integer ``(tf * score_fp) div dl`` —
    ``score_fp`` already carries BM25's 2^20 fixed-point scale, so the
    truncation loses < 1 fp-unit per posting and both engines compute
    the identical int64. Weights sum exactly; ties break on the term.
    int64 bound: ``tf * score_fp`` per posting — safe while
    ``tf * n_query_terms * 2.2 * idf_max * 2^20 < 2^63`` (orders of
    magnitude of headroom at any realistic shard size).

    Scale (100 TB): the feedback set is ``fb_docs`` rows (broadcast);
    only feedback documents are re-tokenized (semi-join before the
    explode), so expansion cost is O(fb_docs * doclen) regardless of
    corpus size; the final top-``fb_terms`` is TakeOrderedAndProject
    plus a window bounded by the limit. Output: ``term, weight_fp
    (int64), weight (double), n_fb_docs (int64), rank (int64)``.
    """
    fb = F.broadcast(
        bm25_scores(df, query_terms, top_k=fb_docs, text_col=text_col,
                    id_col=id_col).select(id_col, "score_fp")
    )
    fb_text = df.join(fb, id_col).select(
        F.col(id_col), F.col("score_fp"), F.col(text_col)
    )
    toks = fb_text.select(
        id_col, "score_fp",
        F.explode(T.tokens(F.col(text_col))).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("__dl"))
    tf = toks.groupBy(id_col, "term", "score_fp").agg(
        F.count(F.lit(1)).cast("long").alias("__tf"))
    contrib = (
        tf.join(F.broadcast(dl), id_col)
        .where(~F.col("term").isin(*query_terms))
        .select(
            "term",
            F.expr("(__tf * score_fp) div __dl").cast("long").alias("__c"),
        )
    )
    scored = (
        contrib.groupBy("term")
        .agg(
            F.sum("__c").cast("long").alias("weight_fp"),
            F.count(F.lit(1)).cast("long").alias("n_fb_docs"),
        )
        .orderBy(F.desc("weight_fp"), F.asc("term"))
        .limit(fb_terms)
    )
    w = Window.orderBy(F.desc("weight_fp"), F.asc("term"))
    return scored.select(
        "term",
        "weight_fp",
        (F.col("weight_fp").cast("double") / F.lit(float(FP_SCALE)))
        .alias("weight"),
        "n_fb_docs",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def mmr_rerank(
    corpus: DataFrame,
    query_id: int,
    n_candidates: int = 20,
    select_k: int = 8,
    lam_tenths: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pool: int = 1024,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998) of a query's top-n retrieval: greedily pick the candidate
    maximizing ``lambda*rel - (1-lambda)*max_sim_to_selected`` — the
    standard rerank that stops a RAG context window filling with
    near-duplicate passages.

    Arithmetic is exact int64 fixed point end to end: vectors quantize
    to ``floor(x * 2^24)`` (the kmeans rule), relevance and pairwise
    similarity are integer inner products (<= 2^54 for 64 dims), and
    the MMR score is ``lam_tenths*rel - (10-lam_tenths)*maxsim`` with
    ``maxsim = 0`` for the empty selection — so the greedy order is
    bit-reproducible in any engine. Ties break on the candidate id.

    Scale shape: the corpus scan computes relevance map-only against
    the broadcast query vector and top-n's as TakeOrderedAndProject;
    the n x n similarity matrix lives UNDER that Limit (bounded by
    construction, n_candidates^2 rows), and only it is collected for
    the inherently sequential greedy loop (the BPE/kmeans bounded-
    collect pattern: select_k steps of integer arithmetic on the
    driver). The bound is ENFORCED, not assumed: ``n_candidates`` above
    ``max_pool`` raises (the jpeg.py amplification-guard contract), so
    no caller can quietly turn the n^2 driver matrix into an unbounded
    collect. Output: ``rank (1-based), <id_col>, rel_fp, mmr_fp``.
    """
    if n_candidates > max_pool:
        raise ValueError(
            f"mmr_rerank candidate pool {n_candidates} exceeds max_pool "
            f"{max_pool}: the n^2 driver-side similarity matrix is only "
            "bounded if the pool is; rerank a pre-limited candidate set "
            "or raise max_pool deliberately"
        )
    spark = corpus.sparkSession
    q = F.broadcast(
        corpus.where(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("__qvec"))
    )

    def qdot(a, b):
        return F.aggregate(
            F.zip_with(
                a, b,
                lambda x, y: F.floor(x.cast("double") * F.lit(16777216.0))
                * F.floor(y.cast("double") * F.lit(16777216.0)),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v.cast("long"),
        )

    cand = (
        corpus.where(F.col(id_col) != query_id)
        .crossJoin(q)
        .select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            qdot(F.col(vec_col), F.col("__qvec")).alias("__rel"),
        )
        .orderBy(F.col("__rel").desc(), F.col("__id"))
        .limit(n_candidates)
    )
    pairs = (
        cand.select(F.col("__id").alias("__ida"), F.col("__vec").alias("__va"))
        .crossJoin(cand.select(F.col("__id").alias("__idb"),
                               F.col("__vec").alias("__vb")))
        .where(F.col("__ida") != F.col("__idb"))
        .select("__ida", "__idb", qdot(F.col("__va"), F.col("__vb"))
                .alias("__dot"))
    )
    rel = {r["__id"]: r["__rel"] for r in cand.select("__id", "__rel").collect()}
    dot = {(r["__ida"], r["__idb"]): r["__dot"] for r in pairs.collect()}

    lam, inv = lam_tenths, 10 - lam_tenths
    selected: list[tuple[int, int, int]] = []  # (id, rel, mmr)
    chosen: set[int] = set()
    for _ in range(min(select_k, len(rel))):
        best = None
        for cid, r in rel.items():
            if cid in chosen:
                continue
            maxsim = max((dot[(cid, s)] for s, _, _ in selected), default=0)
            score = lam * r - inv * maxsim
            if best is None or (-score, cid) < (-best[2], best[0]):
                best = (cid, r, score)
        selected.append(best)
        chosen.add(best[0])
    rows = [(i + 1, cid, r, m) for i, (cid, r, m) in enumerate(selected)]
    return spark.createDataFrame(
        rows, f"rank long, {id_col} long, rel_fp long, mmr_fp long"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    top_k: int = 20,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N bounded rank lists — the standard hybrid-retrieval combiner
    (lexical BM25 + semantic ANN) that needs no score calibration
    because it consumes only RANKS::

        rrf(d) = sum over lists L of 1 / (k_const + rank_L(d))

    with absent lists contributing exactly 0. Every contribution is one
    correctly-rounded IEEE division of exact integers (bit-identical in
    any engine) and the sum is an explicit left-to-right chain in list
    order, so fused scores — and therefore the fused ranking, with its
    ``id`` tie-break — are deterministic cross-engine without any
    fixed-point detour.

    Inputs MUST already be top-n bounded (each a ``Limit``/top-k
    subtree, the natural output of ``bm25_from_index`` /
    ``similarity.brute_force_topk``): the fuse is a chain of full-outer
    joins over at most ``sum(n_i)`` rows, and the final global window
    ranks that bounded union — never a corpus (the house rule against
    unbounded single-task windows is satisfied by construction, like
    ``mmr_rerank``'s candidate matrix). At 100 TB the expensive part is
    producing the input lists; the fusion itself is constant-size.

    Output: ``<id_col>, n_lists_hit (long), rrf (double),
    rank (long, 1-based)`` — the fused top ``top_k``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused: DataFrame | None = None
    for i, r in enumerate(rankings):
        part = r.select(F.col(id_col), F.col(rank_col).alias(f"__r{i}"))
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    contribs = [
        F.coalesce(
            F.lit(1).cast("double")
            / (F.lit(k_const).cast("long")
               + F.col(f"__r{i}").cast("long")).cast("double"),
            F.lit(0.0),
        )
        for i in range(len(rankings))
    ]
    rrf = contribs[0]
    for c in contribs[1:]:
        rrf = rrf + c
    hits = sum(
        (F.col(f"__r{i}").isNotNull().cast("long")
         for i in range(len(rankings))),
        F.lit(0).cast("long"),
    )
    scored = fused.select(
        id_col, hits.alias("n_lists_hit"), rrf.alias("rrf")
    )
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
    )
