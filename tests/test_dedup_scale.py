"""Scale-hardening tests for MinHash LSH: the max_bucket_size cap bounds
the quadratic in-row pair blowup (VERDICT r1 finding #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_anonymizer_spark.operators import dedup

BASE = "the quick brown fox jumps over the lazy dog again and again "
NEAR = BASE + "with a small tail"


def _hot_corpus(spark, cluster_size: int):
    """`cluster_size` identical docs (one hot bucket in every band) plus one
    genuine near-dup pair on unrelated text."""
    rows = [(i, "viral duplicate chain letter " * 4) for i in range(cluster_size)]
    rows += [(10_000, BASE * 2), (10_001, BASE + NEAR)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_bucket_dropped_and_pairs_bounded(spark):
    df = _hot_corpus(spark, cluster_size=60)

    uncapped = dedup.minhash_lsh_pairs(
        df, jaccard_threshold=0.3, max_bucket_size=None
    ).collect()
    capped = dedup.minhash_lsh_pairs(
        df, jaccard_threshold=0.3, max_bucket_size=10
    ).collect()

    # Uncapped: the 60-doc cluster alone contributes 60*59/2 pairs.
    assert len(uncapped) >= 60 * 59 // 2
    # Capped: the hot bucket is dropped entirely; surviving buckets have
    # <= 10 members so the output is bounded far below the blowup.
    assert len(capped) <= 10 * 9 // 2
    # The genuine near-dup pair outside the hot cluster survives the cap.
    assert any(r.id_a == 10_000 and r.id_b == 10_001 for r in capped)
    # No pair from the dropped cluster leaks through.
    assert not any(r.id_a < 10_000 and r.id_b < 10_000 for r in capped)


def test_bucket_stats_reports_oversize(spark):
    df = _hot_corpus(spark, cluster_size=60)
    stats = dedup.lsh_bucket_stats(df, max_bucket_size=10).collect()
    assert len(stats) == 4  # one row per band
    for r in stats:
        assert r.max_bucket >= 60
        assert r.oversize_buckets >= 1
        assert r.oversize_docs >= 60
    # With no cap nothing is oversize.
    for r in dedup.lsh_bucket_stats(df, max_bucket_size=None).collect():
        assert r.oversize_buckets == 0 and r.oversize_docs == 0


def test_cap_is_identity_on_fixture_corpus(spark, sf_dir):
    """The default cap must not change results on non-pathological data:
    the oracle-gated query stays hash-identical (CORRECTNESS contract)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = lambda rows: sorted((r.id_a, r.id_b, round(r.jaccard, 12)) for r in rows)
    capped = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.3).collect()
    uncapped = dedup.minhash_lsh_pairs(
        docs, jaccard_threshold=0.3, max_bucket_size=None
    ).collect()
    assert key(capped) == key(uncapped)


def test_hashed_shingle_verify_identical_pairs(spark, sf_dir):
    """hash_shingles=True (the payload-shrinking scale path for the
    verify join, and since round 9 the DEFAULT) must emit the identical
    pair set and jaccard values as the text-exact oracle path —
    xxhash64 collisions are the only allowed divergence and are absent
    at any realistic shingle count."""
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators import dedup
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    text = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in dedup.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, hash_shingles=False).collect()
    )
    hashed = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 12))
        for r in dedup.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, hash_shingles=True).collect()
    )
    assert text == hashed and len(text) > 0


def test_scale_safe_payload_is_the_default():
    """The plan a caller gets WITHOUT flags must be the one that
    survives sf10 (SCALE.md: text payload died on spill, hashed
    completed) — pin the signature defaults so a refactor can't
    silently flip them back."""
    import inspect

    from simple_anonymizer_spark.operators import dedup

    for fn in (dedup.minhash_lsh_pairs, dedup.minhash_lsh_ingest):
        assert (
            inspect.signature(fn).parameters["hash_shingles"].default is True
        ), fn.__name__


def test_hashed_shingle_ingest_identical(spark, sf_dir):
    from simple_anonymizer_spark.operators import dedup
    from simple_anonymizer_spark.sources.parquet import read_sf_table
    from pyspark.sql import functions as F

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    idx = dedup.minhash_band_index(corpus)

    def pairs(**kw):
        return sorted(
            (r.new_id, r.corpus_id, round(r.jaccard, 12))
            for r in dedup.minhash_lsh_ingest(
                idx, corpus, batch, jaccard_threshold=0.3, **kw).collect()
        )

    text, hashed = pairs(hash_shingles=False), pairs(hash_shingles=True)
    assert text == hashed and len(text) > 0
