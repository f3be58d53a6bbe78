

def test_lsh_ingest_matches_full_run_cross_pairs(spark, sf_dir):
    """The incremental ingest screen must find exactly the (new, corpus)
    pairs the full-corpus run finds — no recall loss from indexing — and
    the index must survive a parquet round trip (the pay-the-signature-
    pass-once story)."""
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators import dedup
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)

    full = dedup.minhash_lsh_pairs(docs, max_bucket_size=None)
    cross_full = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in full.collect()
        if (r.id_a % 10 == 0) != (r.id_b % 10 == 0)
    }

    index = dedup.minhash_band_index(corpus)
    direct = {
        tuple(sorted((r.new_id, r.corpus_id)))
        for r in dedup.minhash_lsh_ingest(index, corpus, new).collect()
    }
    assert direct == cross_full

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        index.write.mode("overwrite").parquet(d + "/idx")
        reread = spark.read.parquet(d + "/idx")
        roundtrip = {
            tuple(sorted((r.new_id, r.corpus_id)))
            for r in dedup.minhash_lsh_ingest(reread, corpus, new).collect()
        }
    assert roundtrip == cross_full


def test_simhash_neardup_matches_bruteforce(spark, sf_dir):
    """Pigeonhole exactness: with blocks > max_hamming and no bucket cap,
    the banded join must find EXACTLY the pairs a brute-force Hamming
    cross product finds — the recall guarantee the operator's scale story
    rests on."""
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators import dedup
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 120
    )
    sigs = {r.doc_id: r.simhash
            for r in dedup.simhash_signatures(docs).collect()}
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_neardup_pairs(
            docs, max_bucket_size=None
        ).collect()
    }
    assert got == want and len(want) > 0


def test_simhash_neardup_bucket_cap_drops_not_errors(spark, sf_dir):
    """A tiny cap must shrink (never grow) the pair set and keep the
    hamming bound intact — the OOM guard is recall-affecting by design."""
    from simple_anonymizer_spark.operators import dedup
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    full = {(r.id_a, r.id_b)
            for r in dedup.simhash_neardup_pairs(
                docs, max_bucket_size=None).collect()}
    capped_rows = dedup.simhash_neardup_pairs(docs, max_bucket_size=4).collect()
    capped = {(r.id_a, r.id_b) for r in capped_rows}
    assert capped <= full
    assert all(r.hamming <= 3 for r in capped_rows)


def test_simhash_neardup_parameter_guards(spark):
    import pytest as _pytest

    from simple_anonymizer_spark.operators import dedup

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_neardup_pairs(df, max_hamming=4, blocks=4)
    with _pytest.raises(ValueError, match="divisible"):
        dedup.simhash_neardup_pairs(df, bits=32, blocks=5)


def test_exact_ingest_statuses(spark):
    from simple_anonymizer_spark.operators.dedup import (
        content_hash_index, exact_ingest)

    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha"),   # dup of corpus (min corpus id 1)
         (11, "gamma"),   # unique
         (12, "gamma"),   # dup in batch (first = 11)
         (13, "beta")],   # dup of corpus (2)
        "doc_id long, text string")
    out = {r.new_id: (r.status, r.match_id) for r in exact_ingest(
        content_hash_index(corpus), batch).collect()}
    assert out == {
        10: ("dup_of_corpus", 1),
        11: ("unique", None),
        12: ("dup_in_batch", 11),
        13: ("dup_of_corpus", 2),
    }


def test_exact_ingest_corpus_precedence_over_batch(spark):
    # content in BOTH corpus and earlier batch rows: corpus wins
    from simple_anonymizer_spark.operators.dedup import (
        content_hash_index, exact_ingest)

    corpus = spark.createDataFrame([(5, "x")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, "x"), (2, "x")], "doc_id long, text string")
    out = {r.new_id: (r.status, r.match_id) for r in exact_ingest(
        content_hash_index(corpus), batch).collect()}
    assert out == {1: ("dup_of_corpus", 5), 2: ("dup_of_corpus", 5)}
