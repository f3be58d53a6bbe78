

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
