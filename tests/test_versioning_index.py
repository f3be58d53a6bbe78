"""Tests for corpus_diff, the persisted BM25 inverted index, and
ivf_cell_stats — contracts beyond the cross-engine oracle gate."""

from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.quality_audit import corpus_diff
from simple_anonymizer_spark.operators.retrieval import (
    bm25_from_index, bm25_scores, build_term_index,
)
from simple_anonymizer_spark.operators.similarity import ivf_cell_stats
from simple_anonymizer_spark.sources.parquet import read_sf_table


def test_corpus_diff_statuses_and_silence(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert set(rows) == {2, 3, 4}  # unchanged doc 1 emits NO row
    assert rows[2]["status"] == "changed"
    assert rows[2]["old_hash"] is not None and rows[2]["new_hash"] is not None
    assert rows[3]["status"] == "removed" and rows[3]["new_hash"] is None
    assert rows[4]["status"] == "added" and rows[4]["old_hash"] is None


def test_bm25_index_round_trip_equals_direct(spark, sf_dir, tmp_path):
    """The index-once/query-many path must reproduce the direct scorer
    EXACTLY through a parquet persistence cycle."""
    d = read_sf_table(spark, sf_dir, "documents")
    terms = ["spark", "window", "hash"]
    direct = sorted(map(tuple, bm25_scores(d, terms, top_k=50).collect()))
    path = str(tmp_path / "bm25_index")
    build_term_index(d).write.mode("overwrite").parquet(path)
    reread = spark.read.parquet(path)
    indexed = sorted(map(tuple,
                         bm25_from_index(reread, terms, top_k=50).collect()))
    assert direct == indexed and len(direct) == 50


def test_ivf_cell_stats_sums_and_empty_cells(spark):
    """Occupancies must sum to the corpus, and cells nothing maps to
    must still appear with n_vecs = 0 (wasted-capacity visibility)."""
    dim = 8
    # two tight clusters -> of 4 seed cells only 2 attract the corpus
    rows = []
    for i in range(20):
        base = [1.0] + [0.0] * (dim - 1) if i % 2 == 0 \
            else [0.0] * (dim - 1) + [1.0]
        rows.append((i, [v + (0.001 * (i % 3)) * v for v in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["cell"]: r for r in ivf_cell_stats(df, n_cells=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert sum(r["n_vecs"] for r in out.values()) == 20
    assert any(r["n_vecs"] == 0 for r in out.values())
    total_load = sum(r["load_factor"] for r in out.values())
    assert abs(total_load - 4.0) < 1e-9  # load factors average to 1


def test_ivf_cell_stats_fixture_total(spark, sf_dir):
    e = read_sf_table(spark, sf_dir, "embeddings")
    out = ivf_cell_stats(e, n_cells=8)
    assert out.count() == 8
    assert out.agg(F.sum("n_vecs")).first()[0] == e.count()


def test_release_manifest_reconciles(spark):
    from simple_anonymizer_spark.operators.quality_audit import (
        release_manifest,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d")], "doc_id long, text string")
    m = release_manifest(old, new).first()
    assert (m["n_old"], m["n_new"]) == (3, 3)
    assert (m["n_added"], m["n_removed"], m["n_changed"]) == (1, 1, 1)
    assert m["n_unchanged"] == 1
    assert m["n_new"] == m["n_old"] + m["n_added"] - m["n_removed"]
    assert m["old_checksum"] != m["new_checksum"]
    same = release_manifest(old, old).first()
    assert same["old_checksum"] == same["new_checksum"]
    assert (same["n_added"], same["n_removed"], same["n_changed"]) == (0, 0, 0)
