"""Distributed Lloyd's k-means (spherical / cosine variant) — the trained
coarse quantizer behind IVF ANN (``similarity.ivf_topk``'s stand-in
``ivf_centroids`` is exactly iteration zero of this loop).

Each iteration is the canonical scale shape:

* **assign** — argmax-cosine over broadcast-literal centroids, a pure
  map-side codegen expression (``similarity.ivf_assign_cell``): the corpus
  never shuffles for assignment;
* **update** — one ``groupBy(cell)`` shuffle whose payload is
  map-combined per-dimension sums: at most ``n_clusters`` rows ever reach
  the driver (the model is broadcast state, not data — same philosophy as
  the bounded collects in ``plans/propagation.py``).

Cost per iteration at 100 TB: one corpus scan + one ``n_clusters``-row
shuffle; the driver round-trip is ``n_clusters * dim`` floats. Iterations
are driver-looped because Lloyd's is inherently sequential in its
centroid state — exactly the iterative-algorithm slot the round contract
reserves for non-SQL expression, EXCEPT that this implementation is fully
deterministic (lowest-id init, decimal-exact dimension sums, double
division on identical operands, lowest-cell tie-breaks), so a fixed
iteration count IS mirrored in DuckDB SQL and the whole trainer is
oracle-gated, not rows-only.

Cross-engine float rule: per-dimension sums accumulate as EXACT 2^-24
fixed-point integers — ``sum(floor(x * 2^24))`` — not DECIMAL, because
float->DECIMAL casts disagree across engines (Spark routes through
``BigDecimal.valueOf``'s shortest-string double representation, DuckDB
converts the exact binary value). Power-of-two scaling only shifts the
exponent (IEEE-exact), ``floor`` is bit-identical everywhere, the long
sums stay far under 2^53 so the DOUBLE conversion back is exact, and the
mean is two divisions on identical operands. The 6e-8 quantization is
noise at float32 input precision.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import ivf_assign_cell

_QUANT = float(1 << 24)


def _sum_fixed_point_expr(d: int) -> Column:
    """``sum(floor(element_at(__v, d+1) * 2^24))`` as one JVM-parsed expr
    string. Identical analyzed plan to the Column-builder form (cast to
    double, multiply by the exact power-of-two literal, floor, sum) —
    but 64 builder columns cost ~0.66 s of py4j driver time on every
    fresh plan, one per k-means iteration; 64 expr() parses cost ~40 ms
    (r12 measurement)."""
    return F.expr(
        f"sum(floor(CAST(element_at(__v, {d + 1}) AS DOUBLE) * 16777216.0D))"
    ).alias(f"__s{d}")


def default_n_clusters(n_rows: int) -> int:
    """Scale-aware cluster count when the caller doesn't pick one:
    ``k ~= sqrt(N)``, FAISS's coarse-quantizer sizing guideline, capped
    at ``N // 39`` so every centroid keeps >= ~39 training points (the
    FAISS minimum before centroids go unsupported), floor 1.

    Why sqrt and not a constant: SemDeDup's pair cost is
    ``sum_c |cell_c|^2 ~= N^2 / k``. A FIXED k makes that term grow
    quadratically with the corpus — measured: 0.5M -> 450M within-cell
    pairs over a 30x data increase at k=8, while k ~ sqrt(N) held the
    sf3 end-to-end at 52.7 s vs 140 s fixed (SCALE.md rounds 7-8). With
    k = sqrt(N) the pair term is N^1.5 and per-cell size stays sqrt(N)
    — the shape that survives a 100 TB corpus, where k simply grows
    into the tens of thousands of cells an IVF index would use anyway.
    """
    if n_rows < 1:
        return 1
    return max(1, min(math.isqrt(n_rows), max(1, n_rows // 39)))


def kmeans_fit(
    corpus: DataFrame,
    n_clusters: int | None = None,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train centroids; returns the model as ``n_clusters`` double vectors
    (broadcastable state). Init is the ``n_clusters`` lowest-id vectors —
    deterministic, the property the oracle mirror depends on. Clusters
    that lose every member keep their previous centroid (standard Lloyd
    degeneracy handling, mirrored in SQL with a coalescing left join).

    ``n_clusters=None`` (the default) sizes k from the corpus via
    ``default_n_clusters`` (~sqrt(N), FAISS-style) — one extra count()
    job. The oracle-gated registry queries pass an explicit k=8 for
    cross-engine parity; callers who know their corpus should pick k."""
    if n_clusters is None:
        n_clusters = default_n_clusters(corpus.count())
    if n_clusters < 1 or iters < 0:
        raise ValueError("n_clusters must be >= 1 and iters >= 0")
    init_rows = (
        corpus.orderBy(F.col(id_col).asc()).limit(n_clusters)
        .select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]
    # dim from the init collect — the separate size() job it replaces
    # was one full scheduling round-trip per fit call (r12).
    dim = len(centroids[0]) if centroids else 0

    for _ in range(iters):
        assigned = corpus.select(
            F.col(vec_col).alias("__v"),
            ivf_assign_cell(F.col(vec_col), centroids).alias("__cell"),
        )
        stats = (
            assigned.groupBy("__cell")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[_sum_fixed_point_expr(d) for d in range(dim)],
            )
            .collect()  # bounded: n_clusters rows
        )
        new_centroids = list(centroids)  # empty cells keep previous
        for r in stats:
            n = r["__n"]
            # same IEEE ops, same order, as the SQL mirror:
            # (sum_as_double / 2^24) / n
            new_centroids[r["__cell"]] = [
                (float(r[f"__s{d}"]) / _QUANT) / n for d in range(dim)
            ]
        centroids = new_centroids
    return centroids


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-side assignment of every vector to its trained cell.
    Output: ``<id_col>, cell int``."""
    return corpus.select(
        F.col(id_col),
        ivf_assign_cell(F.col(vec_col), centroids).alias("cell"),
    )


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int | None = None,
    iters: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_owner: list | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with the deterministic k-means trainer, compare
    cosine similarity only WITHIN each cluster, and keep the lowest-id
    representative of every near-duplicate pair.

    Output: one row per input vector — ``<id_col>, cell (int),
    kept (int64 0/1)`` where ``kept = 0`` marks a vector some lower-id
    same-cell vector covers at ``cosine >= threshold``.

    Scale (100 TB): this is the whole point of the clustering step — the
    quadratic pair comparison is confined to each cell, so cost is
    ``sum_c |cell_c|^2`` instead of n^2; ``n_clusters`` is the knob that
    trades recall (duplicates straddling a cell boundary are missed —
    SemDeDup's documented approximation) against per-cell join size.
    When the caller doesn't pass it, k is sized from the corpus
    (``default_n_clusters``, ~sqrt(N)): a FIXED k grows the pair term
    quadratically with data (measured 0.5M -> 450M pairs over 30x at
    k=8 — SCALE.md), so the scale-safe sizing is the DEFAULT and the
    oracle-gated registry queries opt into k=8 for parity. The
    pair join is a plain equi-join on the cell id, so AQE's skew handling
    applies to an oversized cell. Assignment itself never shuffles
    (broadcast-literal centroids), and every float op follows the
    engine's cross-engine rules, so the trained pipeline is oracle-gated
    end-to-end, not rows-only.

    The assigned projection feeds THREE plan branches (both join sides
    and the final survivor join); assignment is the O(n * k * dim)
    interpreted higher-order fold, so it is cached rather than
    recomputed per branch — measured 231 -> 50 s end-to-end at sf3
    with n_clusters scaled to the corpus (SCALE.md round-8). Same
    ``cache_owner`` contract as ``stats.global_ranks`` (pass a list,
    unpersist after consuming; None = LRU/session lifetime, fine for
    run-once queries).
    """
    from .similarity import _dot, _norm_sq

    if n_clusters is None:
        n_clusters = default_n_clusters(corpus.count())
    centroids = kmeans_fit(corpus, n_clusters, iters, id_col, vec_col)
    # the per-vector norm is computed ONCE here and reused across every
    # pair the vector joins into: cosine(a,b) = dot / (sqrt(nsq_a) *
    # sqrt(nsq_b)), and sqrt of the SAME stored double times the same
    # product is bit-identical to inlining the norms in the pair
    # predicate — but drops the per-pair work from three 64-element
    # folds to one.
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        ivf_assign_cell(F.col(vec_col), centroids).alias("cell"),
        F.sqrt(_norm_sq(F.col(vec_col))).alias("__nrm"),
    ).cache()
    if cache_owner is not None:
        cache_owner.append(assigned)
    # Salted self-join: an equi-join keyed ONLY on cell has at most
    # n_clusters non-empty shuffle buckets — with few cells the whole
    # quadratic pair grid funnels through a handful of tasks (measured:
    # the sf3 k=8 join ran 8-wide on 32 cores, 2.7x the salted time).
    # Side a carries a deterministic hash salt; side b replicates once
    # per salt value, so every (i, j) pair meets in exactly one
    # (cell, salt) bucket and parallelism is n_clusters * n_salt.
    # The salt shrinks to 1 as n_clusters outgrows the cluster — at
    # scaled k (the 100 TB shape) the replication cost vanishes.
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    n_salt = max(1, min(64, (parallelism * 4) // max(n_clusters, 1)))
    a = assigned.select(
        F.col(id_col).alias("__id_a"), F.col(vec_col).alias("__va"),
        F.col("__nrm").alias("__na"), "cell",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
        .cast("int").alias("__salt"),
    )
    b = assigned.select(
        F.col(id_col).alias("__id_b"), F.col(vec_col).alias("__vb"),
        F.col("__nrm").alias("__nb"), "cell",
    ).withColumn("__salt", F.explode(F.lit(list(range(n_salt)))))
    pair_cos = (
        _dot(F.col("__va"), F.col("__vb"))
        / (F.col("__na") * F.col("__nb"))
    )
    dups = (
        a.join(b, ["cell", "__salt"])
        .where(F.col("__id_a") < F.col("__id_b"))
        .where(pair_cos >= threshold)
        .select(F.col("__id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return (
        assigned.join(dups, id_col, "left_outer")
        .select(
            id_col,
            "cell",
            F.when(F.col("__dup").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kept"),
        )
    )


def kmeans_cluster_profile(
    corpus: DataFrame,
    n_clusters: int | None = None,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train + assign + summarize in one call: per-cell member counts and
    the first centroid component (a cross-engine float sentinel — if any
    iteration diverged between engines, this double diverges with it).
    Output: ``cell int, n_members long, centroid_d1 double``.
    ``n_clusters=None`` sizes k ~sqrt(N) via ``default_n_clusters``."""
    centroids = kmeans_fit(corpus, n_clusters, iters, id_col, vec_col)
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(c, vec[0]) for c, vec in enumerate(centroids)],
        "cell int, centroid_d1 double",
    )
    counts = (
        kmeans_assign(corpus, centroids, id_col, vec_col)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    )
    return (
        cent_df.join(counts, "cell", "left")
        .select(
            "cell",
            F.coalesce(F.col("n_members"), F.lit(0)).cast("long")
            .alias("n_members"),
            "centroid_d1",
        )
    )
