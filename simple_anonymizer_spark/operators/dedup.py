"""Deduplication operators for large-scale training-data pipelines.

Exact dedup is a hash-groupBy; near-dup detection is MinHash+LSH
(shingle → signature → band → bucket-join → Jaccard verify), SimHash, and
n-gram Jaccard. All hot paths are native column expressions over the
engine's MD5 hash kernel — no Python UDFs — so the only shuffles are the
ones the algorithms fundamentally require (the group-by-band and the
candidate join).

Scale notes (100 TB): LSH banding bounds the candidate-pair explosion —
the self-join happens per (band, bucket) group, never all-pairs. Bucket
skew (a viral duplicate cluster) is handled by AQE skew-join splitting;
signatures and shingle sets travel through the shuffle once each. For
trillion-row corpora the band join keys should be bucketed to disk
(``bucketBy``) so repeated dedup runs reuse the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import textops as T
from ..functions.hashing import stable_hash


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the source
    has fewer splits (small parquet files arrive as 1-3 row-group splits and
    would serialize CPU-heavy hash projections onto a few cores). At real
    scale inputs already have >= cores splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts; emit one keeper per group with the duplicate
    count. Output: ``keeper_id, dup_count`` (groups of size 1 included —
    dup_count 1)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_key"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keeper_id", "dup_count")
    )


def distinct_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The deduplicated corpus: keep the min-id row per distinct text."""
    w_keeper = exact_duplicates(df, text_col, id_col).select("keeper_id")
    return df.join(
        w_keeper, F.col(id_col) == F.col("keeper_id"), "left_semi"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact Jaccard verify.

    ``num_hashes`` must be divisible by ``bands``; rows-per-band
    ``r = num_hashes/bands`` gives the S-curve threshold ``(1/bands)^(1/r)``.
    Output: ``id_a, id_b, jaccard`` with ``id_a < id_b``, deduplicated
    across bands.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    src = ensure_parallelism(df.select(F.col(id_col).alias("__id"),
                                       F.col(text_col).alias("__text")))
    docs = (
        src.withColumn("__shingles", T.char_shingles(F.col("__text"), shingle_k))
        # One MD5 pass per shingle; signatures are integer permutations of it.
        .withColumn("__hashes", T.element_hashes(F.col("__shingles")))
        .withColumn("__sig", T.minhash_signature(F.col("__hashes"), num_hashes))
    )

    # Explode into (band, band_key) buckets; band key joins the r signature
    # values of that band.
    band_entries = docs.select(
        "__id",
        F.posexplode(
            F.array(*[
                F.concat_ws(
                    "|",
                    *[
                        F.element_at("__sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
                for b in range(bands)
            ])
        ).alias("__band", "__key"),
    )

    # Candidate pairs per bucket via ONE groupBy (the signature pass runs
    # exactly once): collect each bucket's sorted ids and emit ordered
    # combinations with array combinatorics — no self-join, no caching.
    # Bucket-size quadratic blowup is inherent to LSH; at extreme scale cap
    # pathological buckets upstream (viral exact-dups belong to exact dedup).
    buckets = (
        band_entries.groupBy("__band", "__key")
        .agg(F.array_sort(F.collect_set("__id")).alias("__ids"))
        .where(F.size("__ids") > 1)
    )
    pair_array = F.flatten(
        F.transform(
            F.col("__ids"),
            lambda x, i: F.transform(
                F.slice(F.col("__ids"), i + F.lit(2), F.size(F.col("__ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_array).alias("__p"))
        .select("__p.id_a", "__p.id_b")
        .distinct()
    )

    # Verify candidates against freshly-shingled text. Shingling is
    # MD5-free (substring ops over the scan), so recomputing it per join
    # side is cheap; what must NOT recompute is the signature pass — and
    # it appears in exactly one plan branch (`candidates`). (A candidate-id
    # semi-join here sounds like an optimization but instantiates the
    # candidates subtree two extra times — measured 2x slower.)
    sh = src.select(
        "__id", T.char_shingles(F.col("__text"), shingle_k).alias("__shingles")
    )
    verified = (
        candidates.join(sh.withColumnRenamed("__id", "id_a")
                        .withColumnRenamed("__shingles", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b")
              .withColumnRenamed("__shingles", "__sh_b"), "id_b")
        .withColumn("jaccard", T.jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Per-document SimHash fingerprint (near-dup candidates share values
    within small Hamming distance). Output: ``doc id, simhash``."""
    return ensure_parallelism(df).select(
        F.col(id_col),
        T.simhash(T.element_hashes(T.tokens(F.col(text_col))), bits).alias("simhash"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
) -> DataFrame:
    """Exact n-gram Jaccard for caller-supplied candidate pairs
    (``id_a, id_b`` columns). Used standalone when candidates come from
    another source (same URL, same length bucket, ...)."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        T.char_shingles(F.col(text_col), shingle_k).alias("__sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("__id", "id_a")
                   .withColumnRenamed("__sh", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b")
              .withColumnRenamed("__sh", "__sh_b"), "id_b")
        .select("id_a", "id_b", T.jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"))
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Document fingerprint: min k-gram hash (winnowing-style content
    signature) plus a whole-content stable hash. Output:
    ``doc id, fingerprint, content_hash``."""
    sh = T.char_shingles(F.col(text_col), k)
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.array_min(F.transform(sh, lambda s: T.salted_hash(s, "_fp"))).alias("fingerprint"),
        stable_hash(F.col(text_col)).alias("content_hash"),
    )
