"""Train/test contamination detection: token n-gram overlap between two
corpus splits.

The standard eval-hygiene check for a training pipeline — how much of each
held-out document's content literally appears in the training corpus
(RefinedWeb/GPT-3-style 13-gram screens; n is a parameter). No reference
counterpart (SURVEY §2.12 extension surface).

Determinism: n-grams are space-joined lowercased whitespace tokens; all
counts are exact integers; the contamination ratio is one double division
of exact ints (NULL for docs with no n-grams).

Scale (100 TB): the training side reduces to ONE ROW PER DISTINCT N-GRAM
(a combinable distinct), and the overlap is a left-semi equi-join on the
n-gram string — Spark's hash partitioning spreads grams evenly, no key
skew (a single gram is unique in the distinct set). Per-doc gram counts
come from a second combinable aggregation. Nothing is collected; swap the
exact distinct for a Bloom filter broadcast when the training gram set
must fit a memory budget (documented recall trade: false positives only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textops as T


def token_ngrams(text: Column, n: int) -> Column:
    """Distinct space-joined token n-grams; empty array when the document
    has fewer than n tokens (guarded — Spark's ``sequence(1, 0)`` would
    DESCEND, not return empty)."""
    toks = T.tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_threshold_pct: int = 20,
) -> DataFrame:
    """Per-test-document contamination: how many of its distinct n-grams
    appear anywhere in the training corpus.

    Distinctness lives in ``token_ngrams`` itself (``array_distinct``
    before the explode), so BOTH the ``n_contaminated`` numerator and the
    ``n_grams`` denominator range over the document's distinct gram set —
    a gram repeated in the text counts once in each.

    Output: ``id, n_grams, n_contaminated, contamination_ratio`` (NULL
    when the doc has no n-grams) and ``flagged`` — ratio-at-or-above
    ``flag_threshold_pct`` percent, compared in exact integers
    (``100 * hits >= pct * grams``) so the flag never depends on float
    rounding.
    """
    from .dedup import ensure_parallelism

    train = ensure_parallelism(train)
    test = ensure_parallelism(test)
    train_grams = (
        train.select(F.explode(token_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    test_grams = test.select(
        F.col(id_col), F.explode(token_ngrams(F.col(text_col), n)).alias("gram")
    )
    hits = (
        test_grams.join(train_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )
    totals = test.select(
        F.col(id_col),
        F.size(token_ngrams(F.col(text_col), n)).cast("long").alias("n_grams"),
    )
    joined = totals.join(hits, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
        .alias("n_contaminated"),
    )
    return joined.select(
        id_col,
        "n_grams",
        "n_contaminated",
        F.when(
            F.col("n_grams") > 0,
            F.col("n_contaminated").cast("double")
            / F.col("n_grams").cast("double"),
        ).alias("contamination_ratio"),
        (
            (F.col("n_grams") > 0)
            & (100 * F.col("n_contaminated")
               >= flag_threshold_pct * F.col("n_grams"))
        ).alias("flagged"),
    )


def semantic_contamination(
    pool: DataFrame,
    bench: DataFrame,
    n_clusters: int | None = None,
    iters: int = 2,
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    cache_owner: list | None = None,
) -> DataFrame:
    """Embedding-space contamination screen — the SEMANTIC sibling of the
    n-gram overlap report above: a pool document counts as contaminated
    when some benchmark item sits within ``cosine >= threshold`` of it,
    catching paraphrased or lightly-edited benchmark leakage the literal
    13-gram screen cannot see.

    Same per-cell confinement as ``kmeans.semantic_dedup`` (Abbas et al.
    2023): a shared coarse quantizer is trained over pool + bench (pass
    ``centroids=`` to reuse a trained model), both sides assign map-side
    against broadcast-literal centroids, and cosine runs only WITHIN a
    cell — cost is ``sum_c |pool_c| * |bench_c|`` instead of
    ``|pool| * |bench|``, with the documented SemDeDup approximation
    (cross-cell leaks are missed; ``n_clusters`` is the recall knob).

    Scale hardening (the semantic_dedup lesson): an equi-join keyed
    only on cell has at most n_clusters non-empty shuffle buckets, so a
    shuffle-join draw serializes the whole pair grid onto n_clusters
    tasks. The pool side carries a deterministic hash salt and the
    (small) bench side replicates once per salt value, so parallelism
    is n_clusters * n_salt under ANY join strategy; per-vector norms
    are hoisted out of the pair predicate (bit-identical IEEE ops —
    sqrt of the same stored double, same product); the pool assignment
    feeds two plan branches and is cached (``cache_owner`` contract).

    Output: one row per pool vector — ``<id_col>, cell int,
    n_bench_hits long, max_cosine double (NULL when no hit),
    contaminated long 0/1``. Deterministic end-to-end (the trainer's
    fixed-point rules), so fully oracle-gated.
    """
    from .kmeans import default_n_clusters, kmeans_fit
    from .similarity import _dot, _norm_sq, ivf_assign_cell

    if centroids is not None:
        n_clusters = len(centroids)
    elif n_clusters is None:
        # scale-aware default, same rationale as kmeans.default_n_clusters:
        # fixed k grows sum|cell|^2 quadratically with the corpus
        n_clusters = default_n_clusters(
            pool.unionByName(bench).count())
    if centroids is None:
        centroids = kmeans_fit(
            pool.unionByName(bench), n_clusters, iters, id_col, vec_col
        )
    parallelism = pool.sparkSession.sparkContext.defaultParallelism
    n_salt = max(1, min(64, (parallelism * 4) // max(n_clusters, 1)))
    p = pool.select(
        F.col(id_col),
        F.col(vec_col).alias("__vp"),
        ivf_assign_cell(F.col(vec_col), centroids).alias("cell"),
        F.sqrt(_norm_sq(F.col(vec_col))).alias("__np"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
        .cast("int").alias("__salt"),
    ).cache()
    if cache_owner is not None:
        cache_owner.append(p)
    b = bench.select(
        F.col(vec_col).alias("__vb"),
        ivf_assign_cell(F.col(vec_col), centroids).alias("cell"),
        F.sqrt(_norm_sq(F.col(vec_col))).alias("__nb"),
    ).withColumn("__salt", F.explode(F.lit(list(range(n_salt)))))
    pair_cos = (
        _dot(F.col("__vp"), F.col("__vb"))
        / (F.col("__np") * F.col("__nb"))
    )
    hits = (
        p.join(b, ["cell", "__salt"])
        .where(pair_cos >= threshold)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
            F.max(pair_cos).alias("max_cosine"),
        )
    )
    return (
        p.join(hits, id_col, "left_outer")
        .select(
            id_col,
            "cell",
            F.coalesce(F.col("n_bench_hits"), F.lit(0)).cast("long")
            .alias("n_bench_hits"),
            F.col("max_cosine"),
            F.when(F.col("n_bench_hits").isNull(), F.lit(0))
            .otherwise(F.lit(1)).cast("long").alias("contaminated"),
        )
    )
