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
    has fewer files than cores (small parquet inputs arrive as 1-3 splits
    and would serialize CPU-heavy hash projections onto a few cores). Gated
    on driver-side file metadata — no RDD conversion, no job. At real scale
    inputs have >> cores files and this is a no-op (a blind repartition
    would shuffle the full corpus)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
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


def _band_entries(
    src: DataFrame, num_hashes: int, bands: int, shingle_k: int
) -> DataFrame:
    """``(__id, __band, __key)`` LSH band entries: shingle -> one MD5 per
    shingle -> integer-permutation signature -> per-band key joining the
    band's r signature values. Expects ``(__id, __text)`` input."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    docs = (
        src.withColumn("__shingles", T.char_shingles(F.col("__text"), shingle_k))
        # One MD5 pass per shingle; signatures are integer permutations of it.
        .withColumn("__hashes", T.element_hashes(F.col("__shingles")))
        .withColumn("__sig", T.minhash_signature(F.col("__hashes"), num_hashes))
    )
    return docs.select(
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


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Bucket-size distribution for the exact banding ``minhash_lsh_pairs``
    would use — the dropped-work metric for its ``max_bucket_size`` cap.
    Output: one row per band with ``band, n_buckets, max_bucket,
    oversize_buckets, oversize_docs`` (docs in over-cap buckets are the
    recall loss; route them through ``exact_duplicates`` instead)."""
    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    sizes = (
        _band_entries(src, num_hashes, bands, shingle_k)
        .groupBy("__band", "__key")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
    )
    cap = F.lit(max_bucket_size if max_bucket_size is not None else 2**31 - 1)
    return (
        sizes.groupBy(F.col("__band").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("__n").alias("max_bucket"),
            F.sum(F.when(F.col("__n") > cap, 1).otherwise(0)).alias("oversize_buckets"),
            F.sum(F.when(F.col("__n") > cap, F.col("__n")).otherwise(0)).alias("oversize_docs"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 500,
    hash_shingles: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact Jaccard verify.

    ``num_hashes`` must be divisible by ``bands``; rows-per-band
    ``r = num_hashes/bands`` gives the S-curve threshold ``(1/bands)^(1/r)``.
    Output: ``id_a, id_b, jaccard`` with ``id_a < id_b``, deduplicated
    across bands.

    ``max_bucket_size`` caps the per-(band, bucket) membership: a bucket of
    size m emits m^2/2 candidate pairs inside ONE reducer row, so a
    pathological bucket (viral duplicate cluster, degenerate band) is an
    OOM at scale, not a slowdown — AQE skew splitting does not apply to
    ``groupBy().agg(collect_set)``. Oversized buckets are dropped, which is
    RECALL-AFFECTING by design: an over-cap bucket is dominated by
    exact/near-exact duplicates that exact dedup (``exact_duplicates``)
    already catches at linear cost. Measure what was dropped with
    ``lsh_bucket_stats`` before tuning the cap; ``None`` disables it.

    ``hash_shingles=True`` (the DEFAULT) verifies over
    ``xxhash64(shingle)`` int64 arrays instead of shingle text — the
    verify join ships BOTH sides' shingle sets to every candidate pair,
    so on a duplicate-dense corpus that payload is the whole shuffle
    (measured: the sf10 100-way-family corpus spilled past this box's
    disk on text shingles — ``[SPILL_OUT_OF_MEMORY]`` — and completes
    hashed in 322 s; SCALE.md rounds 8-9). Results are identical up to
    declared ~n_shingles^2/2^64 collision tolerance (pair identity
    pinned on the fixtures, tests/test_dedup_scale.py). Pass
    ``hash_shingles=False`` only where bit-exact text Jaccard is
    contractually required — the oracle-gated registry queries do,
    because xxhash64 has no DuckDB mirror; that oracle split is the
    ONLY sanctioned use of the text payload at scale.
    """
    src = ensure_parallelism(df.select(F.col(id_col).alias("__id"),
                                       F.col(text_col).alias("__text")))
    band_entries = _band_entries(src, num_hashes, bands, shingle_k)

    # Candidate pairs per bucket via ONE groupBy (the signature pass runs
    # exactly once): collect each bucket's sorted ids and emit ordered
    # combinations with array combinatorics — no self-join, no caching.
    # The bucket-size cap bounds the quadratic in-row blowup (see docstring).
    buckets = (
        band_entries.groupBy("__band", "__key")
        .agg(F.array_sort(F.collect_set("__id")).alias("__ids"))
        .where(F.size("__ids") > 1)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("__ids") <= max_bucket_size)
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
    shingles = T.char_shingles(F.col("__text"), shingle_k)
    if hash_shingles:
        shingles = F.array_distinct(
            F.transform(shingles, lambda s: F.xxhash64(s))
        )
    sh = src.select("__id", shingles.alias("__shingles"))
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
    within small Hamming distance). Output: ``doc id, simhash``.

    ``ensure_parallelism`` stays: the 32-wide zip_with fold is CPU-bound
    per row, and isolated measurement at sf0.1 (single-file input) shows
    the repartition 3x faster than scanning in place (0.29 s vs 0.82 s,
    AQE on — explicit numPartitions is never AQE-coalesced). The round-3
    bench reading 0.86 s that implicated the shuffle was adjacent-query
    noise, not this plan."""
    return ensure_parallelism(df).select(
        F.col(id_col),
        T.simhash(T.element_hashes(T.tokens(F.col(text_col))), bits).alias("simhash"),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    blocks: int | None = None,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance via pigeonhole
    blocking (the public Manku/Jarvelin-style web-dedup design): split
    the ``bits``-bit signature into ``blocks`` contiguous blocks — any
    pair within Hamming distance ``max_hamming`` differs in at most
    ``max_hamming`` blocks, so with ``blocks > max_hamming`` it agrees
    EXACTLY on at least one block. Candidates therefore come from an
    equi-join on (block index, block value) with perfect recall (up to
    the bucket cap), and verification is a single
    ``bit_count(sim_a XOR sim_b)`` — the signatures travel with the
    pair, so unlike the Jaccard verify there is no second text scan at
    all. Output: ``id_a, id_b, hamming`` with ``id_a < id_b``.

    Structure follows ``minhash_lsh_pairs``: ONE signature pass feeds a
    single groupBy on (block, value); in-bucket ordered pairs form
    in-row from the sorted member array (no self-join — a self-join
    would run the CPU-heavy signature fold twice), and
    ``max_bucket_size`` bounds the quadratic in-row blowup exactly as
    there (over-cap buckets are near-identical clusters that exact
    dedup already catches at linear cost).
    """
    if blocks is None:
        blocks = max_hamming + 1
    if blocks <= max_hamming:
        raise ValueError(
            f"blocks ({blocks}) must exceed max_hamming ({max_hamming}) "
            f"for the pigeonhole guarantee"
        )
    if bits % blocks:
        raise ValueError(f"bits ({bits}) not divisible by blocks ({blocks})")
    width = bits // blocks
    mask = (1 << width) - 1

    sig = simhash_signatures(df, text_col, id_col, bits)
    entries = sig.select(
        F.col(id_col).alias("__id"),
        F.col("simhash").alias("__sim"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask)).alias("val"),
            )
            for i in range(blocks)
        ])).alias("__b"),
    ).select("__id", "__sim", "__b.block", "__b.val")

    buckets = (
        entries.groupBy("block", "val")
        .agg(F.array_sort(F.collect_set(
            F.struct(F.col("__id").alias("id"), F.col("__sim").alias("sim"))
        )).alias("__mem"))
        .where(F.size("__mem") > 1)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("__mem") <= max_bucket_size)
    pair_array = F.flatten(
        F.transform(
            F.col("__mem"),
            lambda x, i: F.transform(
                F.slice(F.col("__mem"), i + F.lit(2), F.size(F.col("__mem"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"), y["id"].alias("id_b"),
                    x["sim"].alias("sim_a"), y["sim"].alias("sim_b"),
                ),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_array).alias("__p"))
        .select("__p.id_a", "__p.id_b", "__p.sim_a", "__p.sim_b")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("sim_a").bitwiseXOR(F.col("sim_b"))
    ).cast("long")
    return (
        candidates.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
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
    another source (same URL, same length bucket, ...).

    The shingle projection routes through ``ensure_parallelism`` (no-op
    on multi-split inputs at real scale): it feeds BOTH join branches, so
    a single-split input would otherwise serialize the CPU-heavy shingle
    build onto one task twice."""
    sh = ensure_parallelism(df).select(
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


def ngram_containment_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
) -> DataFrame:
    """Exact n-gram CONTAINMENT for caller-supplied candidate pairs —
    the doc-in-doc signal Jaccard misses: a short document quoted
    verbatim inside a long one has low Jaccard (union is large) but
    containment ``|A ∩ B| / |A|`` near 1. The standard screen for
    quote/excerpt/boilerplate relationships between near-dup candidates
    (Broder's containment coefficient alongside resemblance).

    Same plan shape as ``ngram_jaccard_pairs`` (one shingle projection
    feeding both join branches through ``ensure_parallelism``, in-row
    ``array_intersect`` — lambda-free, stays in codegen). Output:
    ``id_a, id_b, containment_ab (|A∩B|/|A|), containment_ba
    (|A∩B|/|B|)`` — both divisions single IEEE ops on exact integer
    set sizes. Empty shingle sets emit NULL (no 0/0)."""
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        T.char_shingles(F.col(text_col), shingle_k).alias("__sh"),
    )
    inter = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    size_a = F.size(F.col("__sh_a"))
    size_b = F.size(F.col("__sh_b"))

    def ratio(den):
        return F.when(
            den > 0, inter.cast("long").cast("double")
            / den.cast("long").cast("double"))

    return (
        pairs.join(sh.withColumnRenamed("__id", "id_a")
                   .withColumnRenamed("__sh", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b")
              .withColumnRenamed("__sh", "__sh_b"), "id_b")
        .select("id_a", "id_b",
                ratio(size_a).alias("containment_ab"),
                ratio(size_b).alias("containment_ba"))
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


def levenshtein_adjacent_pairs(
    df: DataFrame,
    prefix_len: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Edit-distance screening over adjacent-id candidate pairs.

    Levenshtein is O(len_a * len_b) per pair — far too hot for full
    documents at scale — so the screen runs on a fixed-length prefix
    (``prefix_len`` chars), the standard cheap pre-filter before an exact
    verify stage. Candidates here are consecutive doc ids (the simplest
    deterministic pairing; swap in LSH-bucket candidates for real
    workloads via ``minhash_lsh_pairs``). Distance and both lengths are
    exact integers; ``prefix_similarity`` is one double division of exact
    integers, with the empty/empty pair pinned to 1.0.
    """
    pref = df.select(
        F.col(id_col).alias("id_a"),
        F.substring(F.col(text_col), 1, prefix_len).alias("__pa"),
    )
    nxt = df.select(
        (F.col(id_col) - 1).alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.substring(F.col(text_col), 1, prefix_len).alias("__pb"),
    )
    joined = pref.join(nxt, "id_a")
    dist = F.levenshtein(F.col("__pa"), F.col("__pb")).cast("long")
    maxlen = F.greatest(F.length("__pa"), F.length("__pb")).cast("long")
    sim = F.when(maxlen == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - dist.cast("double") / maxlen.cast("double")
    )
    return joined.select(
        "id_a",
        "id_b",
        dist.alias("edit_distance"),
        sim.alias("prefix_similarity"),
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """The standing LSH index for incremental dedup: one ``(doc_id, band,
    key)`` row per band per document — exactly the entries
    ``minhash_lsh_pairs`` computes internally, exposed so a corpus can pay
    its signature pass ONCE and persist the result (bucket it on
    ``(band, key)`` via ``skew.write_bucketed`` so every future ingest
    join is co-located and shuffle-free on the corpus side)."""
    src = ensure_parallelism(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    )
    return _band_entries(src, num_hashes, bands, shingle_k).select(
        F.col("__id").alias(id_col), F.col("__band").alias("band"),
        F.col("__key").alias("key"),
    )


def minhash_lsh_ingest(
    corpus_index: DataFrame,
    corpus: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    hash_shingles: bool = True,
) -> DataFrame:
    """Near-duplicate screen for an INCOMING batch against a standing
    corpus — the production ingest shape: signatures are computed for the
    new batch only; the corpus side contributes its prebuilt
    ``minhash_band_index`` (typically read back from a bucketed table), so
    ingest cost is O(batch), not O(corpus).

    Candidates come from an equi-join on ``(band, key)`` between the new
    batch's band entries and the index; verification recomputes shingles
    for the matched candidate ids ONLY — the corpus scan is semi-joined
    against the candidate id set before any shingle is computed, so the
    verify stage is O(candidates), not O(corpus) (candidates << corpus;
    AQE broadcasts the id set). Re-deriving the candidate subtree for the
    semi-join is cheap here, unlike inside ``minhash_lsh_pairs`` — it is
    a read of the persisted index plus an O(batch) signature pass, not a
    second full-corpus signature pass. Output: ``new_id, corpus_id,
    jaccard`` — every standing document each new document would
    near-duplicate at the threshold.

    ``hash_shingles`` is the same verify-payload switch as
    ``minhash_lsh_pairs`` and shares its default (True — int64 hashed
    shingle sets instead of text; identical output up to declared
    collision tolerance): on a duplicate-dense candidate set the text
    payload dominates the shuffle. ``False`` is for the oracle-gated
    registry queries only (DuckDB bit-parity; no xxhash64 mirror).
    """
    new_src = ensure_parallelism(new_docs.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    ))
    new_entries = _band_entries(new_src, num_hashes, bands, shingle_k).select(
        F.col("__id").alias("new_id"), F.col("__band").alias("band"),
        F.col("__key").alias("key"),
    )
    idx = corpus_index.select(
        F.col(id_col).alias("corpus_id"), "band", "key"
    )
    # Candidate pairs are O(batch-duplicates) — tiny next to either
    # signature pass — and the pair set feeds TWO consumers (the verify
    # join and the corpus semi-join's id set). Without the eager
    # checkpoint both consumers re-derive it, and when the caller built
    # the index inline (the registry gate) that re-derivation is a FULL
    # second corpus signature pass: measured 13.4 -> 5.6 s at sf0.1
    # (r13; declared plan 6 -> 3 parquet scans). With a persisted index
    # it still saves the O(batch) signature pass + band join.
    candidates = (
        new_entries.join(idx, ["band", "key"])
        .where(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    def _sh(col):
        s = T.char_shingles(col, shingle_k)
        if hash_shingles:
            s = F.array_distinct(F.transform(s, lambda x: F.xxhash64(x)))
        return s

    sh_new = new_docs.select(
        F.col(id_col).alias("new_id"),
        _sh(F.col(text_col)).alias("__sh_a"),
    )
    cand_ids = candidates.select(
        F.col("corpus_id").alias(id_col)
    ).distinct()
    sh_corpus = corpus.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col).alias("corpus_id"),
        _sh(F.col(text_col)).alias("__sh_b"),
    )
    return (
        candidates.join(sh_new, "new_id")
        .join(sh_corpus, "corpus_id")
        .withColumn("jaccard", T.jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def minhash_recall_report(
    df: DataFrame,
    thresholds: tuple[float, ...] = (0.3, 0.7, 0.9),
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Measured recall of the banded MinHash screen against exact
    all-pairs shingle Jaccard, at several similarity thresholds — the
    text-dedup mirror of ``similarity.ann_recall_report`` and an
    EMPIRICAL S-curve: with the default 4 bands x 4 rows the banding's
    midpoint is ``(1/4)^(1/4) = 0.707``, so recall is near-total above
    0.9, partial at 0.7, and small at 0.3 (measured 0.195 on the
    fixture sample) — exactly what the theory predicts, and exactly
    the number to check before trusting a threshold choice.

    Found pairs are exact-verified on the same metric, so they are a
    SUBSET of truth at every threshold and recall is the only number.
    Output: one row per threshold — ``threshold (double), n_truth,
    n_found, n_missed (int64), recall (double; NULL when the sample has
    no qualifying pair)``.

    Scale: the truth side is a quadratic MEASUREMENT TOOL — pass a
    hash-sampled slice of the corpus (the registry query keeps
    ``id % 4 = 0``), never the full table; the LSH side runs the same
    slice so the comparison is apples-to-apples. Both sides compute
    their pair Jaccards once; per-threshold counts are conditional sums
    in one aggregation each.
    """
    lo = min(thresholds)
    # Text-exact verify on purpose: the truth side below measures TEXT
    # shingle Jaccard, and the found-is-a-subset-of-truth property is
    # exact only when both sides score the identical metric. This is a
    # sampled measurement tool (quadratic truth side), so the text
    # payload never reaches corpus scale here.
    found_pairs = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_k,
        lo, max_bucket_size, hash_shingles=False,
    )
    found = found_pairs.agg(*[
        F.coalesce(
            F.sum((F.col("jaccard") >= F.lit(t)).cast("long")), F.lit(0)
        ).cast("long").alias(f"__f{k}")
        for k, t in enumerate(thresholds)
    ])
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        T.char_shingles(F.col(text_col), shingle_k).alias("__sh"),
    )
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sb"))
    jacc = T.jaccard(F.col("__sa"), F.col("__sb"))
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(jacc.alias("__j"))
        .where(F.col("__j") >= F.lit(lo))
        .agg(*[
            F.coalesce(
                F.sum((F.col("__j") >= F.lit(t)).cast("long")), F.lit(0)
            ).cast("long").alias(f"__t{k}")
            for k, t in enumerate(thresholds)
        ])
    )
    rows = truth.crossJoin(F.broadcast(found))
    entries = [
        F.struct(
            F.lit(t).alias("threshold"),
            F.col(f"__t{k}").alias("n_truth"),
            F.col(f"__f{k}").alias("n_found"),
        )
        for k, t in enumerate(thresholds)
    ]
    return (
        rows.select(F.explode(F.array(*entries)).alias("kv"))
        .select(
            F.col("kv.threshold").alias("threshold"),
            F.col("kv.n_truth").alias("n_truth"),
            F.col("kv.n_found").alias("n_found"),
            (F.col("kv.n_truth") - F.col("kv.n_found")).cast("long")
            .alias("n_missed"),
            F.when(
                F.col("kv.n_truth") > 0,
                F.col("kv.n_found").cast("double")
                / F.col("kv.n_truth").cast("double"),
            ).alias("recall"),
        )
    )


def content_hash_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The standing EXACT-dedup index: one ``(doc_id, content_hash)`` row
    per document — the exact sibling of ``minhash_band_index``. Persist
    it bucketed on ``content_hash`` so every future ingest join is
    co-located; the index carries hashes, never text, so it is a few
    bytes per document at any corpus size."""
    return ensure_parallelism(df).select(
        F.col(id_col),
        stable_hash(F.col(text_col)).alias("content_hash"),
    )


def exact_ingest(
    corpus_index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-duplicate screen for an INCOMING batch against a standing
    corpus — the O(batch) ingest shape for byte-identical dedup: the
    batch is hashed (one map pass), the corpus index is semi-joined
    against the batch's distinct hashes BEFORE any aggregation (AQE
    broadcasts the batch side, so the index never shuffles), and
    batch-internal duplicates resolve to the first id within the batch.

    Output: ``new_id, status, match_id`` where status is
    ``dup_of_corpus`` (match_id = smallest standing doc with the same
    content), ``dup_in_batch`` (match_id = smallest earlier batch id), or
    ``unique`` (match_id NULL). Deterministic: ties break on min id."""
    batch = ensure_parallelism(new_docs).select(
        F.col(id_col).alias("new_id"),
        stable_hash(F.col(text_col)).alias("content_hash"),
    )
    corpus_match = (
        corpus_index
        .join(batch.select("content_hash").distinct(),
              "content_hash", "left_semi")
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("__corpus_match"))
    )
    batch_first = batch.groupBy("content_hash").agg(
        F.min("new_id").alias("__batch_first")
    )
    hit = F.col("__corpus_match").isNotNull()
    in_batch = F.col("__batch_first") < F.col("new_id")
    return (
        batch.join(corpus_match, "content_hash", "left")
        .join(batch_first, "content_hash")
        .select(
            "new_id",
            F.when(hit, F.lit("dup_of_corpus"))
            .when(in_batch, F.lit("dup_in_batch"))
            .otherwise(F.lit("unique")).alias("status"),
            F.when(hit, F.col("__corpus_match"))
            .when(in_batch, F.col("__batch_first")).alias("match_id"),
        )
    )
