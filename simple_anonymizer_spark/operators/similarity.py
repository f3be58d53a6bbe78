"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: a broadcast of the (small)
query set against a full scan of the corpus — one shuffle for the per-query
top-k. The scale path is LSH bucketing (random-hyperplane signs derived
from the deterministic hash kernel, so results are reproducible and
oracle-checkable) which prunes the candidate set before exact scoring —
the same structure as an IVF probe.

Dot products run through ``F.zip_with`` + ``F.aggregate`` with explicit
casts to double and sequential left-to-right accumulation, so DuckDB can
reproduce the exact IEEE sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.textops import salted_hash


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_sq(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_norm_sq(a)) * F.sqrt(_norm_sq(b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (queries excluded from their own
    neighbor lists). Deterministic tie-break on neighbor id. Output:
    ``query_id, neighbor_id, rank``.

    The query side is explicitly broadcast: at 100 TB the corpus scan
    dominates and must never shuffle; per-query top-k runs as a window over
    the (tiny) query×k result.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
        .crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__cos", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_bucket(vec: Column, planes: int = 8, dim: int | None = None) -> Column:
    """Sign-LSH bucket id: bit ``p`` is the sign of a pseudo-random
    projection whose weights derive from the deterministic hash kernel
    (``stable_hash(f"{p}_{i}") / INT_MAX - 0.5``). Reproducible across
    engines and runs — no RNG state."""
    def weight_fn(p: int):
        return lambda v, i: v.cast("double") * (
            salted_hash(i.cast("string"), f"_pl{p}").cast("double")
            / F.lit(float(0x7FFFFFFF))
            - F.lit(0.5)
        )

    proj_bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), weight_fn(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        proj_bits.append(
            F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        )
    out = proj_bits[0]
    for b in proj_bits[1:]:
        out = out + b
    return out


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space near-duplicate pairs: exact cosine verification
    restricted to hyperplane-LSH buckets (same-bucket candidates only —
    near-identical vectors land in the same bucket with high probability).
    Output: ``id_a, id_b, cosine`` with ``id_a < id_b``.

    At 100 TB the bucket column becomes the corpus partitioning key so the
    within-bucket pair generation never crosses partitions."""
    bucketed = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    left = bucketed.select(
        F.col("__bucket"), F.col("__id").alias("id_a"), F.col("__vec").alias("__va")
    )
    right = bucketed.select(
        F.col("__bucket").alias("__bucket_r"), F.col("__id").alias("id_b"),
        F.col("__vec").alias("__vb"),
    )
    pairs = left.join(
        right,
        (left["__bucket"] == right["__bucket_r"]) & (left["id_a"] < right["id_b"]),
    )
    return (
        pairs.withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact scoring restricted to the query's LSH
    bucket. Recall depends on ``planes``; at scale the bucket column is the
    partition/bucketing key so a query touches one bucket's files only."""
    bucketed = corpus.withColumn("__bucket", hyperplane_bucket(F.col(vec_col), planes))
    q = bucketed.join(
        queries.select(id_col), on=id_col, how="left_semi"
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.col("__bucket").alias("__qbucket"),
    )
    scored = (
        bucketed.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cvec"),
            F.col("__bucket"),
        )
        .join(F.broadcast(q), F.col("__bucket") == F.col("__qbucket"))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__cos", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
