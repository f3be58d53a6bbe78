"""Property tests for pmi_collocations, readability, and mmr_rerank —
the semantic contracts the cross-engine oracle gate can't express."""

from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.retrieval import mmr_rerank
from simple_anonymizer_spark.operators.text_analysis import (
    pmi_collocations, readability,
)


def test_pmi_ranks_true_collocation_first(spark):
    """A pair that ALWAYS co-occurs must out-rank pairs of independent
    frequent words, and hapax pairs must be pruned by min_count."""
    docs = [(i, "new york " + ("alpha beta gamma " * 3)) for i in range(6)]
    docs.append((99, "rare pair"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_collocations(df, min_count=3, k=10).collect()
    assert rows[0]["w1"] == "new" and rows[0]["w2"] == "york"
    assert all((r["w1"], r["w2"]) != ("rare", "pair") for r in rows)


def test_readability_counts_are_exact(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. On a mat!"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    r = rows[1]
    # tokens: the cat sat. on a mat! -> 6 words; 2 sentences;
    # vowel groups: e,a,a,o,a,a -> 6 syllables
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    assert r["n_syllables"] == 6
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r["flesch"] - expected) < 1e-12
    assert rows[2]["n_words"] == 0 and rows[2]["flesch"] is None


def test_mmr_skips_near_duplicate_of_rank1(spark):
    """Two near-identical top-relevance vectors: plain top-k would take
    both; MMR must demote the duplicate below a less relevant but
    diverse candidate."""
    q = [1.0] + [0.0] * 63
    a = [0.9, 0.4] + [0.0] * 62            # most relevant
    a2 = [0.89, 0.41] + [0.0] * 62         # near-duplicate of a
    b = [0.89] + [0.0] * 49 + [0.6] + [0.0] * 13  # equally relevant, diverse
    rows = [(0, q), (1, a), (2, a2), (3, b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["rank"]: r["vec_id"]
           for r in mmr_rerank(df, query_id=0, n_candidates=3,
                               select_k=3, lam_tenths=5).collect()}
    assert out[1] == 1          # seed = argmax relevance
    assert out[2] == 3, out     # diversity beats the near-duplicate
    assert out[3] == 2


def test_mmr_rank1_is_relevance_argmax_on_fixture(spark, sf_dir):
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    e = read_sf_table(spark, sf_dir, "embeddings")
    out = mmr_rerank(e, query_id=0, n_candidates=10, select_k=4)
    rows = sorted(((r["rank"], r["vec_id"], r["rel_fp"])
                   for r in out.collect()))
    assert len(rows) == 4
    assert rows[0][2] == max(r[2] for r in rows)  # seed has max relevance
    assert len({r[1] for r in rows}) == 4          # no repeats


def test_mmr_oversized_pool_raises_before_any_job(spark):
    """The n^2 driver-side matrix bound is enforced, not assumed
    (jpeg.py amplification-guard contract): an oversized candidate
    pool must raise BEFORE any Spark job runs, and an explicit
    max_pool override must lift the guard deliberately."""
    import pytest

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="max_pool"):
        mmr_rerank(df, query_id=0, n_candidates=2048, select_k=2)
    out = mmr_rerank(df, query_id=0, n_candidates=2048, select_k=2,
                     max_pool=4096)
    assert out.count() == 2
