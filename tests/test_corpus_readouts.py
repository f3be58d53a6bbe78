"""Semantic property tests for the round-7 corpus readouts — contracts
the cross-engine oracle gate can't express (it proves Spark == DuckDB,
not that either computes the RIGHT thing)."""

from pyspark.sql import functions as F

from simple_anonymizer_spark.queries import QUERIES


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _run(spark, name, df, tmp_path):
    """Run a registry query against a crafted documents table by writing
    it as the fixture layout."""
    out = str(tmp_path / "sfX")
    df.coalesce(1).write.mode("overwrite").parquet(out + "/documents.parquet")
    return QUERIES[name](spark, out)


def test_zipf_slope_is_negative_and_sums_exact(spark, tmp_path):
    """A corpus with a geometric-ish frequency falloff must fit a
    negative slope, and the integer regression sums must match a
    hand computation on the rank/freq table."""
    rows = []
    # token "a" 64x, "b" 16x, "c" 4x, "d" 1x -> bits 7,5,3,1 over ranks
    text = " ".join(["a"] * 64 + ["b"] * 16 + ["c"] * 4 + ["d"])
    rows.append((text, "en", "web"))
    out = _run(spark, "zipf_fit_tokens", _docs(spark, rows), tmp_path)
    r = out.collect()[0]
    assert r["n_fit"] == 4
    # ranks 1..4 -> bits(rank) = 1,2,2,3 ; freqs 64,16,4,1 -> bits 7,5,3,1
    assert r["sum_x"] == 1 + 2 + 2 + 3
    assert r["sum_y"] == 7 + 5 + 3 + 1
    assert r["sum_xy"] == 1 * 7 + 2 * 5 + 2 * 3 + 3 * 1
    assert r["zipf_slope"] < 0


def test_vocab_coverage_is_monotone_and_saturates(spark, tmp_path):
    rows = [("alpha alpha alpha beta beta gamma", "en", "web")]
    out = _run(spark, "vocab_coverage_curve", _docs(spark, rows), tmp_path)
    got = {r["k"]: r for r in out.collect()}
    assert got[1]["coverage"] == 3 / 6
    assert got[2]["coverage"] == 5 / 6
    assert got[4]["coverage"] == 1.0 and got[4]["n_vocab_used"] == 3
    covs = [got[k]["coverage"] for k in sorted(got)]
    assert covs == sorted(covs)          # monotone in k
    assert all(r["total_tokens"] == 6 for r in got.values())


def test_url_canonical_collapses_tracking_variants(spark, tmp_path):
    """Docs sharing (source, doc_id % 50) collapse to one canonical URL
    with the MIN doc id surviving, regardless of utm/ref/fragment."""
    rows = [("t", "en", "web")] * 3   # doc_ids 0,1,2
    df = _docs(spark, rows).withColumn("doc_id", F.col("doc_id") * 50)
    out = _run(spark, "dedup_url_canonical", df, tmp_path)
    rws = out.collect()
    assert len(rws) == 1               # 0, 50, 100 share doc_id % 50 == 0
    assert rws[0]["doc_id"] == 0 and rws[0]["n_dups"] == 3
    assert "utm" not in rws[0]["url_canonical"]
    assert "#" not in rws[0]["url_canonical"]


def test_kappa_is_zero_for_independent_and_one_for_perfect(spark, tmp_path):
    """kappa == 1 when the identifier is always right; ~0 when the label
    is independent of the prediction."""
    # 'the a of' are English stopwords -> predicted en; label en ->
    # perfect single-class agreement: pe == 1 makes kappa 0/0, which the
    # query emits as NULL by convention (both engines).
    rows = [("the a of and to", "en", "web")] * 8
    out = _run(spark, "lang_id_kappa", _docs(spark, rows), tmp_path)
    r = out.collect()[0]
    assert r["n_agree"] == r["n_docs"] == 8
    assert r["pe"] == 1.0 and r["kappa"] is None
    # a mix where agreement equals chance exactly: half labeled en, half
    # de, all predicted en -> kappa == 0.
    rows = [("the a of and to", "en", "web")] * 4 \
        + [("the a of and to", "de", "web")] * 4
    out = _run(spark, "lang_id_kappa", _docs(spark, rows), tmp_path)
    r = out.collect()[0]
    assert r["n_docs"] == 8 and r["n_agree"] == 4
    assert r["po"] == 0.5 and r["pe"] == 0.5 and r["kappa"] == 0.0


def test_cluster_sizes_histogram_counts_families(spark, tmp_path):
    rows = [("same text", "en", "a"), ("same text", "en", "b"),
            ("same text", "en", "c"), ("twice", "en", "a"),
            ("twice", "en", "b"), ("once", "en", "a")]
    out = _run(spark, "dedup_cluster_sizes", _docs(spark, rows), tmp_path)
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
           for r in out.collect()}
    assert got == {3: (1, 3), 2: (1, 2), 1: (1, 1)}


def test_source_lang_mix_tie_breaks_lexicographically(spark, tmp_path):
    rows = [("x", "en", "web"), ("x", "de", "web"),
            ("x", "fr", "books"), ("x", "fr", "books"), ("x", "en", "books")]
    out = _run(spark, "source_lang_mix", _docs(spark, rows), tmp_path)
    got = {r["source"]: r for r in out.collect()}
    assert got["web"]["top_lang"] == "de"      # 1-1 tie -> lexicographic
    assert got["web"]["n_langs"] == 2 and got["web"]["top_share"] == 0.5
    assert got["books"]["top_lang"] == "fr"
    assert got["books"]["top_share"] == 2 / 3


def test_gini_known_distributions(spark):
    """gini == 0 for a uniform distribution, (n-1)/n when one entity
    holds everything, and the result is invariant to the partition
    count (the two-pass global rank is layout-independent)."""
    from simple_anonymizer_spark.operators.stats import gini_exact

    uniform = spark.createDataFrame(
        [(i, 5) for i in range(8)], "k long, x long")
    assert gini_exact(uniform, "x", "k").collect()[0]["gini"] == 0.0

    concentrated = spark.createDataFrame(
        [(0, 100)] + [(i, 0) for i in range(1, 10)], "k long, x long")
    r = gini_exact(concentrated, "x", "k").collect()[0]
    assert r["gini"] == (10 - 1) / 10 and r["total"] == 100

    skewed = spark.createDataFrame(
        [(i, i) for i in range(1, 101)], "k long, x long")
    a = gini_exact(skewed, "x", "k", partitions=1).collect()[0]["gini"]
    b = gini_exact(skewed, "x", "k", partitions=7).collect()[0]["gini"]
    c = gini_exact(skewed.repartition(13), "x", "k").collect()[0]["gini"]
    assert a == b == c
    # degenerate inputs emit NULL, never a division error
    single = spark.createDataFrame([(0, 3)], "k long, x long")
    assert gini_exact(single, "x", "k").collect()[0]["gini"] is None
    zeros = spark.createDataFrame([(0, 0), (1, 0)], "k long, x long")
    assert gini_exact(zeros, "x", "k").collect()[0]["gini"] is None


def test_source_kl_flags_divergent_source(spark):
    """A source speaking the corpus-common vocabulary sits near zero
    whole-bits KL; a source of tokens found nowhere else diverges
    positively and strictly more; exact totals are partition-invariant."""
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.text_analysis import (
        source_kl_divergence,
    )

    rows = []
    for i in range(20):
        rows.append(Row(doc_id=i, source="common",
                        text="the quick brown fox jumps"))
    for i in range(20, 24):
        rows.append(Row(doc_id=i, source="mixed",
                        text="the quick brown fox jumps"))
    for i in range(24, 28):
        rows.append(Row(doc_id=i, source="weird",
                        text="zxqv wvut qqqp zxqv zxqv"))
    df = spark.createDataFrame(rows)
    out = {r.source: r for r in source_kl_divergence(df).collect()}
    assert set(out) == {"common", "mixed", "weird"}
    # the divergent source dominates both common-vocabulary sources
    assert out["weird"].mean_kl_bits > out["common"].mean_kl_bits
    assert out["weird"].mean_kl_bits > out["mixed"].mean_kl_bits
    assert out["weird"].kl_bits_total > 0
    assert out["weird"].n_tokens == 20 and out["weird"].n_terms == 3

    a = sorted(tuple(r) for r in source_kl_divergence(
        df.repartition(1)).collect())
    b = sorted(tuple(r) for r in source_kl_divergence(
        df.repartition(7)).collect())
    assert a == b
