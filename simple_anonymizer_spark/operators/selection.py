"""Training-data SELECTION operators: DSIR importance resampling and a
Naive Bayes quality/language classifier.

Both are standard corpus-curation tools a 100 TB pretraining pipeline
runs between dedup and tokenization:

* ``dsir_scores`` / ``dsir_select`` — Data Selection via Importance
  Resampling (Xie et al. 2023): score every raw document by how much
  more likely its hashed n-gram features are under a small TARGET
  corpus than under the raw pool, then keep the top-k. The published
  method is exactly this shape — hashed n-gram bucket counts on both
  corpora, per-bucket log-likelihood ratios, per-document sums.
* ``nb_classify`` — multinomial Naive Bayes with add-one smoothing,
  trained on a labeled seed split and applied to the rest: the
  fastText-style quality/language classifier stand-in (same count
  tables, same argmax-of-log-posteriors decision rule).

Float determinism: both operators need ``log``, whose last-bit rounding
differs across engines, so — like ``text_analysis.doc_surprisal`` —
every log2 is the EXACT integer ``bits(n) = length(bin(n)) =
floor(log2 n) + 1``, within one bit of the real value and computed
identically in Spark and DuckDB. Scores are therefore exact int64
"whole bits" and rankings are reproducible bit-for-bit anywhere.

Scale (100 TB): feature extraction is in-row (zip_with bigrams, no
positional join); DSIR's count tables are bounded by ``num_buckets``
(a parameter, not the corpus) and carry their scalar totals folded in,
so the scoring join is a broadcast of B rows against a map-only feature
explode; NB's count tables are vocabulary-bounded, not corpus-bounded,
and the per-document argmin window partitions by document with exactly
``n_classes`` rows per partition. Selection top-k plans as
TakeOrderedAndProject. No Python runs on any path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textops as T


def _bits(c) -> F.Column:
    """Exact ``floor(log2 n) + 1`` for positive int64 — the binary-string
    length, identical in Spark and DuckDB (``length(bin(n))``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.length(F.call_function("bin", col)).cast("long")


def _doc_features(text_col) -> F.Column:
    """Unigram + adjacent-bigram feature stream (occurrences, not
    distinct) — the DSIR paper's hashed n-gram feature space. Bigrams via
    sliced ``zip_with`` (in-row; never ``sequence(1, n)`` which DESCENDS
    for n < 1)."""
    # tokenize split bound once per row (r13): the naive bigram form
    # referenced it 5x inside the zip_with plus once in the concat.
    return F.transform(
        F.array(T.tokens(text_col)),
        lambda t: F.concat(
            t,
            F.when(
                F.size(t) >= 2,
                F.zip_with(
                    F.slice(t, 1, F.size(t) - 1),
                    F.slice(t, 2, F.size(t) - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
    )[0]


DSIR_SALT = "__dsir|"


def _bucket(feature: F.Column, num_buckets: int) -> F.Column:
    return F.pmod(T.salted_hash(feature, DSIR_SALT), F.lit(num_buckets))


def dsir_bucket_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = 1024,
) -> DataFrame:
    """Per-bucket importance weight in whole bits:
    ``w_b = bits(t_b + 1) - bits(r_b + 1) + bits(R + B) - bits(T + B)``
    — the integer-bits form of ``log2 p_target(b) - log2 p_raw(b)`` with
    add-one smoothing over the ``B = num_buckets`` feature buckets.

    Output: ``bucket, weight_bits`` — at most B rows with the scalar
    totals already folded in, so callers can broadcast-join it against
    an arbitrarily large corpus.
    """

    def bucket_counts(df: DataFrame, alias: str) -> DataFrame:
        feats = df.select(F.explode(_doc_features(F.col(text_col))).alias("__f"))
        return (
            feats.select(_bucket(F.col("__f"), num_buckets).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(alias))
        )

    t = bucket_counts(target, "__t")
    r = bucket_counts(raw, "__r")
    joined = t.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("__t", F.lit(0)).cast("long").alias("__t"),
        F.coalesce("__r", F.lit(0)).cast("long").alias("__r"),
    )
    totals = joined.agg(
        (F.sum("__t") + F.lit(num_buckets)).cast("long").alias("__tb"),
        (F.sum("__r") + F.lit(num_buckets)).cast("long").alias("__rb"),
    )
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            _bits(F.col("__t") + 1) - _bits(F.col("__r") + 1)
            + _bits("__rb") - _bits("__tb")
        ).cast("long").alias("weight_bits"),
    )


def dsir_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR importance score: the sum of bucket weights over
    the document's feature OCCURRENCES (unigrams + bigrams). Featureless
    documents score 0 with ``n_features = 0``.

    Output: ``<id_col>, n_features (int64), score_bits (int64)``.
    """
    feats = df.select(
        F.col(id_col),
        F.explode(_doc_features(F.col(text_col))).alias("__f"),
    ).select(id_col, _bucket(F.col("__f"), num_buckets).alias("bucket"))
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("weight_bits").cast("long").alias("score_bits"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left_outer").select(
        id_col,
        F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
        F.coalesce("score_bits", F.lit(0)).cast("long").alias("score_bits"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
) -> DataFrame:
    """Top-k raw documents by target-likeness (DSIR selection): bucket
    weights from ``dsir_bucket_weights``, per-document sums from
    ``dsir_scores``, then the global top-k under the deterministic
    ``(score_bits DESC, id ASC)`` total order — a TakeOrderedAndProject,
    never a global sort."""
    weights = dsir_bucket_weights(raw, target, text_col, num_buckets)
    scores = dsir_scores(raw, weights, text_col, id_col, num_buckets)
    return scores.orderBy(F.col("score_bits").desc(), F.col(id_col)).limit(k)


NB_BROADCAST_MAX_CELLS = 8_000_000


def _nb_probe(
    score_tok: DataFrame,
    dense: DataFrame,
    n_cells: int,
    broadcast_max_cells: int,
    id_col: str,
    parallelism: int,
) -> DataFrame:
    """The size-guarded dense-table probe (see ``nb_classify``):
    broadcast left-outer while the dense cell count fits, salted
    shuffle left-outer beyond it. Both branches emit identical rows."""
    if n_cells <= broadcast_max_cells:
        return score_tok.join(F.broadcast(dense), "__w", "left_outer")
    n_salt = max(1, min(32, parallelism))
    salted_tok = score_tok.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("int"),
    )
    salted_dense = dense.withColumn(
        "__salt", F.explode(F.lit(list(range(n_salt))))
    )
    return salted_tok.join(
        salted_dense, ["__w", "__salt"], "left_outer"
    ).drop("__salt")


def nb_classify(
    train: DataFrame,
    score: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_max_cells: int = NB_BROADCAST_MAX_CELLS,
) -> DataFrame:
    """Multinomial Naive Bayes with add-one smoothing, integer-bits
    scoring. Cost of class c for a document =
    ``bits(N) - bits(n_docs_c)`` (prior) plus, per token occurrence,
    ``bits(T_c + V) - bits(n(w,c) + 1)`` — out-of-vocabulary tokens cost
    ``bits(T_c + V)`` (the smoothed-zero penalty). Prediction is the
    bit-cost argmin with the class name as tie-break.

    Output: ``<id_col>, <label_col>, pred_<label_col>, total_bits
    (int64), is_correct`` — one row per scored document.

    Scale: the dense (token x class) cost table is vocabulary-bounded;
    the argmin window partitions by document with exactly ``n_classes``
    rows, never an unbounded membership. "Vocabulary-bounded" is not
    "small" — a token vocabulary grows with the training corpus (Heaps'
    law) — so the scoring probe broadcasts ``dense`` only while its
    |vocab| x |classes| cell count (measured from the checkpointed
    counts table, one cheap model-sized job) stays under
    ``broadcast_max_cells``; above that it falls back to a salted
    shuffle join (the kmeans/contamination pattern, guide §3.3:
    deterministic hash salt on the token stream, dense replicated per
    salt value) so the Zipf-hot token key can never funnel one hot
    token's occurrences through a single task NOR overflow the 8 GB
    broadcast-relation cap.
    """
    train_tok = train.select(
        F.col(label_col).alias("__cls"),
        F.explode(T.tokens(F.col(text_col))).alias("__w"),
    )
    # ONE tokenize pass over the training corpus: the (class, token)
    # count table is vocabulary-bounded and every other training
    # statistic is exactly derivable from it (V = its distinct tokens,
    # T_c = its per-class count sum) — the corpus previously paid three
    # explode+aggregate passes for the same numbers (guide §2.2).
    counts = train_tok.groupBy("__cls", "__w").agg(
        F.count(F.lit(1)).cast("long").alias("__n_wc")
    ).localCheckpoint(eager=True)
    vocab = counts.select("__w").distinct()
    ndc = train.groupBy(F.col(label_col).alias("__cls")).agg(
        F.count(F.lit(1)).cast("long").alias("__ndc")
    )
    scalars = counts.agg(
        F.countDistinct("__w").cast("long").alias("__v")
    ).crossJoin(
        F.broadcast(ndc.agg(F.sum("__ndc").cast("long").alias("__n")))
    )
    class_stats = (
        counts.groupBy("__cls")
        .agg(F.sum("__n_wc").cast("long").alias("__tc"))
        .join(ndc, "__cls")
        .crossJoin(F.broadcast(scalars))
        .select(
            "__cls",
            (_bits("__n") - _bits("__ndc")).cast("long").alias("__prior_bits"),
            (F.col("__tc") + F.col("__v")).cast("long").alias("__tcv"),
        )
    )
    # Dense vocabulary x class cost table (zero counts included) so the
    # scoring join fans each in-vocabulary token to every class.
    dense = (
        vocab.crossJoin(F.broadcast(class_stats))
        .join(counts, ["__cls", "__w"], "left_outer")
        .select(
            "__w",
            "__cls",
            (_bits("__tcv") - _bits(F.coalesce("__n_wc", F.lit(0)) + 1))
            .cast("long").alias("__cost_bits"),
        )
    )
    score_tok = score.select(
        F.col(id_col), F.explode(T.tokens(F.col(text_col))).alias("__w")
    )
    # ONE tokenize+probe pass over the scored corpus: a left-outer join
    # against the dense table classifies every token occurrence in the
    # same probe that costs it (in-vocabulary rows fan out per class,
    # OOV rows surface as the NULL-class group), where the old
    # inner-join + anti-join pair scanned and tokenized the corpus
    # twice. dense covers vocab x classes, so "no match" == OOV exactly.
    # Probe strategy is size-guarded (r13, VERDICT r12 #3): broadcast
    # while the dense cell count fits (the token stream never shuffles;
    # the checkpointed source has no size stats, so Spark would
    # otherwise draw a SortMergeJoin on the Zipf-hot token key —
    # measured 20.6 s vs 3.7 s at sf0.1 in r12); salted shuffle join
    # beyond it. Both branches produce identical rows: an in-vocab
    # token matches exactly one salt replica per class, an OOV token
    # matches none and still surfaces as the NULL-class group.
    vc = counts.agg(
        F.countDistinct("__w").alias("v"),
        F.countDistinct("__cls").alias("c"),
    ).first()
    n_cells = int(vc["v"] or 0) * int(vc["c"] or 0)
    probed = _nb_probe(
        score_tok, dense, n_cells, broadcast_max_cells, id_col,
        train.sparkSession.sparkContext.defaultParallelism,
    )
    scored_groups = (
        probed
        .groupBy(id_col, "__cls")
        .agg(
            F.sum("__cost_bits").cast("long").alias("__m_bits"),
            F.count(F.lit(1)).cast("long").alias("__cnt"),
        )
        .localCheckpoint(eager=True)
    )
    matched = scored_groups.where(F.col("__cls").isNotNull()).select(
        id_col, "__cls", "__m_bits"
    )
    oov = scored_groups.where(F.col("__cls").isNull()).select(
        id_col, F.col("__cnt").alias("__n_oov")
    )
    base = score.select(id_col, label_col).crossJoin(
        F.broadcast(class_stats)
    )
    totals = (
        base.join(matched, [id_col, "__cls"], "left_outer")
        .join(oov, id_col, "left_outer")
        .select(
            id_col,
            label_col,
            F.col("__cls"),
            (
                F.col("__prior_bits")
                + F.coalesce("__m_bits", F.lit(0))
                + F.coalesce("__n_oov", F.lit(0)) * _bits("__tcv")
            ).cast("long").alias("total_bits"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("total_bits"), F.col("__cls"))
    return (
        totals.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            id_col,
            label_col,
            F.col("__cls").alias(f"pred_{label_col}"),
            "total_bits",
            (F.col("__cls") == F.col(label_col)).alias("is_correct"),
        )
    )


# ---------------------------------------------------------------------------
# Hashed-feature logistic regression (the GPT-3 quality-classifier shape:
# "logistic regression over hashed features of the tokenizer output")
# ---------------------------------------------------------------------------

LR_SALT = "__lr|"
LR_ONE = 1 << 24          # fixed-point 1.0 (the engine's 2^-24 rule)
LR_HALF = 1 << 23


def _trunc_div(a: int, n: int) -> int:
    """Python mirror of SQL integer division: truncation toward zero
    (Python's ``//`` FLOORS — it would disagree with Spark ``div`` and
    DuckDB ``//`` on negative gradients)."""
    q = abs(a) // n
    return -q if a < 0 else q


def lr_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Per-document hashed feature counts, long format:
    ``__id, __b int, __x long`` — the unigram+bigram occurrence stream of
    ``_doc_features`` hashed into ``num_buckets`` buckets (HashingTF)."""
    feats = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_doc_features(F.col(text_col))).alias("__f"),
    )
    return (
        feats.select(
            "__id",
            F.pmod(T.salted_hash(F.col("__f"), LR_SALT), F.lit(num_buckets))
            .cast("int").alias("__b"),
        )
        .groupBy("__id", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__x"))
    )


def _lr_margin(fx: DataFrame, labels: DataFrame, weights: list[int],
               bias: int) -> DataFrame:
    """``__id, __y, __m`` — fixed-point margin ``b + w . x`` per labeled
    row; featureless documents carry the bias alone. The weight vector
    rides as a constant-size literal array (never a join): assignment is
    map-side, exactly like the k-means centroid broadcast."""
    warr = F.array(*[F.lit(int(v)).cast("long") for v in weights])
    dots = fx.groupBy("__id").agg(
        F.sum(F.element_at(warr, F.col("__b") + 1) * F.col("__x"))
        .cast("long").alias("__dot")
    )
    return labels.join(dots, "__id", "left_outer").select(
        "__id", "__y",
        (F.coalesce("__dot", F.lit(0)) + F.lit(int(bias)).cast("long"))
        .cast("long").alias("__m"),
    )


def _hard_sigmoid(m) -> F.Column:
    """Piecewise-linear sigmoid ``clamp(1/2 + m/4, 0, 1)`` in 2^-24 fixed
    point. The true sigmoid needs ``exp``, whose last-ulp rounding
    differs across engines; the hard variant is shift-and-clamp — exact
    integers everywhere (both engines' ``>>`` is arithmetic on
    negatives, verified)."""
    col = F.col(m) if isinstance(m, str) else m
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(LR_ONE).cast("long"),
                F.lit(LR_HALF) + F.shiftright(col, 2)),
    ).cast("long")


def lr_train(
    train: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    iters: int = 3,
    lr_shift: int = 3,
) -> tuple[list[int], int]:
    """Full-batch gradient descent for binary logistic regression over
    hashed bag-of-features — the GPT-3/WebText data-quality classifier
    shape (Brown et al. 2020 train an LR on hashed tokenizer features to
    score CommonCrawl against a curated target), trained entirely as
    DataFrame aggregations.

    Deterministic end to end, so the whole trainer is DuckDB-mirrorable:
    weights live in 2^-24 fixed point; the hard-sigmoid error is
    shift-and-clamp; the update is ``w -= (sum_grad div n) >> lr_shift``
    (truncating division — both engines truncate; Python's ``//`` floors
    and is NOT used). Per iteration: one margin aggregation + one
    gradient aggregation, and a bounded collect of at most
    ``num_buckets + 1`` rows — the k-means/BPE driver-loop pattern; the
    corpus itself never moves.

    Returns ``(weights, bias)`` as fixed-point ints
    (``len(weights) == num_buckets``).
    """
    if iters < 1 or num_buckets < 1:
        raise ValueError("iters and num_buckets must be >= 1")
    # Pin the feature and label tables once: every iteration runs its
    # gradient job over them — without the pin each job re-explodes
    # and re-hashes the corpus, and the 2*iters re-executions dominated
    # the sweep (11 s -> ~3 s at sf0.1). Bounded: |docs| x num_buckets.
    labels = train.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("long").alias("__y"),
    ).localCheckpoint(eager=True)
    n = labels.count()
    if n == 0:
        raise ValueError("empty training set")
    w = [0] * num_buckets
    b = 0
    # Bias rides as pseudo-bucket -1 with x = 1 (exactly the oracle's
    # UNION ALL -1 row), so each iteration is ONE gradient job + collect.
    # r12: ONE materialization — the margin pass reads the feature rows
    # back out of fxb (__b >= 0) instead of pinning a separate fx copy
    # (2 eager checkpoint jobs -> 1, same rows scanned either way).
    fxb = lr_features(train, text_col, id_col, num_buckets).unionByName(
        labels.select(
            "__id",
            F.lit(-1).cast("int").alias("__b"),
            F.lit(1).cast("long").alias("__x"),
        )
    ).localCheckpoint(eager=True)
    fx = fxb.where(F.col("__b") >= 0)
    for _ in range(iters):
        m = _lr_margin(fx, labels, w, b)
        errs = m.select(
            "__id",
            (_hard_sigmoid("__m") - F.col("__y") * F.lit(LR_ONE))
            .cast("long").alias("__e"),
        )
        grads = (
            fxb.join(errs, "__id")
            .groupBy("__b")
            .agg(F.sum(F.col("__e") * F.col("__x")).cast("long").alias("__g"))
        ).collect()
        for r in grads:
            upd = _trunc_div(int(r["__g"]), n) >> lr_shift
            if r["__b"] < 0:
                b -= upd
            else:
                w[r["__b"]] -= upd
    return w, b


def lr_scores(
    df: DataFrame,
    weights: list[int],
    bias: int,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Score documents under a trained model. Output: ``<id_col>,
    <label_col> (long 0/1), margin_fp long, prob_fp long (hard-sigmoid,
    2^-24 fixed point), pred long 0/1, is_correct boolean`` — one map-
    side pass plus the per-doc feature aggregation; the model is a
    constant-size literal, nothing broadcasts or collects."""
    fx = lr_features(df, text_col, id_col, num_buckets)
    labels = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("long").alias("__y"),
    )
    m = _lr_margin(fx, labels, weights, bias)
    return m.select(
        F.col("__id").alias(id_col),
        F.col("__y").alias(label_col),
        F.col("__m").alias("margin_fp"),
        _hard_sigmoid("__m").alias("prob_fp"),
        (F.col("__m") >= 0).cast("long").alias("pred"),
        ((F.col("__m") >= 0).cast("long") == F.col("__y")).alias("is_correct"),
    )
