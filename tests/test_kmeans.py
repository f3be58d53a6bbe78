"""Distributed k-means (operators/kmeans.py): Lloyd's invariants —
monotone non-increasing inertia, determinism across runs, empty-cluster
carry-over, membership conservation — and the trained-quantizer plug-in
path into ivf_topk."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from simple_anonymizer_spark.operators import kmeans, similarity
from simple_anonymizer_spark.sources.parquet import read_sf_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_sf_table(spark, sf_dir, "embeddings").cache()


def _inertia(emb, centroids):
    """Mean cosine distance (1 - cos) to the assigned centroid."""
    assigned = emb.select(
        F.col("embedding").alias("__v"),
        kmeans.ivf_assign_cell(F.col("embedding"), centroids).alias("__cell"),
    )
    cos_arr = F.array(*[
        similarity.cosine(
            F.col("__v"), F.array(*[F.lit(x) for x in c])
        )
        for c in centroids
    ])
    return (
        assigned.select(
            (1.0 - F.element_at(cos_arr, F.col("__cell") + 1)).alias("d")
        ).agg(F.avg("d")).first()[0]
    )


def test_inertia_non_increasing_over_iterations(spark, emb):
    inertias = [
        _inertia(emb, kmeans.kmeans_fit(emb, n_clusters=8, iters=it))
        for it in range(4)
    ]
    for prev, cur in zip(inertias, inertias[1:]):
        assert cur <= prev + 1e-12, inertias
    assert inertias[-1] < inertias[0]  # training actually moved something


def test_deterministic_across_runs(spark, emb):
    a = kmeans.kmeans_fit(emb, n_clusters=8, iters=2)
    b = kmeans.kmeans_fit(emb, n_clusters=8, iters=2)
    assert a == b  # exact float equality — the whole pipeline is pinned


def test_membership_conserved(spark, emb):
    prof = kmeans.kmeans_cluster_profile(emb, n_clusters=8, iters=2)
    rows = prof.collect()
    assert len(rows) == 8
    assert sum(r.n_members for r in rows) == emb.count()


def test_empty_cluster_keeps_centroid(spark):
    # 3 requested clusters, only 2 real groups far apart: one init centroid
    # loses all members and must survive unchanged (no NaNs, no crash).
    rows = [Row(vec_id=i, embedding=[1.0, 0.0]) for i in range(3)]
    rows += [Row(vec_id=10 + i, embedding=[0.0, 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows)
    cents = kmeans.kmeans_fit(df, n_clusters=3, iters=2, vec_col="embedding")
    assert len(cents) == 3
    assert all(all(not math.isnan(x) for x in c) for c in cents)


def test_trained_centroids_plug_into_ivf(spark, emb):
    cents = kmeans.kmeans_fit(emb, n_clusters=8, iters=2)
    queries = emb.where(F.col("vec_id") < 5)
    out = similarity.ivf_topk(emb, queries, k=3, nprobe=2, centroids=cents)
    got = out.collect()
    assert {r.query_id for r in got} == {0, 1, 2, 3, 4}
    for r in got:
        assert 1 <= r.rank <= 3


def test_validation(spark, emb):
    with pytest.raises(ValueError, match=">= 1"):
        kmeans.kmeans_fit(emb, n_clusters=0)


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_semantic_dedup_drops_higher_id_duplicate(spark):
    # ids 1/2 seed the two cells (lowest-id init); 3 is a near-dup of 1
    # landing in 1's cell, 4 is distinct in 2's cell.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 0.001, 0.0]),   # near-dup of 1
        (4, [0.0, 0.7, 0.7]),
    ]
    out = {r.vec_id: r.kept for r in
           kmeans.semantic_dedup(_vecs(spark, rows), n_clusters=2,
                                 iters=1, threshold=0.99).collect()}
    assert out[1] == 1 and out[3] == 0      # lowest id survives
    assert out[2] == 1 and out[4] == 1
    assert len(out) == 4                    # one row per input vector


def test_semantic_dedup_all_distinct_keeps_everything(spark):
    rows = [(i, [1.0 if j == i else 0.0 for j in range(5)])
            for i in range(5)]
    out = kmeans.semantic_dedup(_vecs(spark, rows), n_clusters=2,
                                iters=1, threshold=0.9).collect()
    assert all(r.kept == 1 for r in out)


def test_semantic_dedup_threshold_monotone(spark, emb):
    strict = kmeans.semantic_dedup(emb, n_clusters=4, iters=1,
                                   threshold=0.99)
    loose = kmeans.semantic_dedup(emb, n_clusters=4, iters=1,
                                  threshold=0.8)
    kept_strict = {r.vec_id for r in strict.collect() if r.kept}
    kept_loose = {r.vec_id for r in loose.collect() if r.kept}
    assert kept_loose <= kept_strict      # lower threshold drops more


def test_semantic_dedup_duplicate_chain_keeps_exactly_one(spark):
    # Three mutually-identical vectors: only the lowest id survives.
    rows = [(i, [3.0, 4.0]) for i in (7, 8, 9)] + [(1, [4.0, -3.0])]
    out = {r.vec_id: r.kept for r in
           kmeans.semantic_dedup(_vecs(spark, rows), n_clusters=2,
                                 iters=1, threshold=0.999).collect()}
    assert out == {7: 1, 8: 0, 9: 0, 1: 1}


# ---------------------------------------------------------------------------
# Semantic contamination (contamination.semantic_contamination)
# ---------------------------------------------------------------------------


def test_semantic_contamination_planted_leak(spark):
    """A pool vector colinear with a benchmark vector is flagged with
    max_cosine ~1; orthogonal pool vectors are not."""
    from simple_anonymizer_spark.operators.contamination import (
        semantic_contamination,
    )

    pool = _vecs(spark, [(1, [3.0, 4.0]), (2, [-4.0, 3.0]), (3, [6.0, 8.0])])
    bench = _vecs(spark, [(100, [0.3, 0.4])])
    out = {r.vec_id: r for r in semantic_contamination(
        pool, bench, n_clusters=2, iters=1, threshold=0.99
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].contaminated == 1 and out[1].max_cosine > 0.999
    assert out[3].contaminated == 1
    assert out[2].contaminated == 0 and out[2].max_cosine is None
    assert out[1].n_bench_hits == 1


def test_semantic_contamination_same_quantizer_as_split_training(spark):
    """Training on pool+bench inside the operator equals passing the
    full-table model via centroids= (the registry-query shape)."""
    from simple_anonymizer_spark.operators.contamination import (
        semantic_contamination,
    )

    # +0.25 keeps every norm nonzero (cosine shares semantic_dedup's
    # nonzero-vector contract)
    rows = [(i, [(i * 7) % 5 - 2 + 0.25, float((i * 3) % 4 - 1)])
            for i in range(24)]
    allv = _vecs(spark, rows)
    pool = allv.where(F.col("vec_id") % 3 != 0)
    bench = allv.where(F.col("vec_id") % 3 == 0)
    cents = kmeans.kmeans_fit(allv, n_clusters=3, iters=2)
    a = semantic_contamination(pool, bench, n_clusters=3, iters=2,
                               threshold=0.9).collect()
    b = semantic_contamination(pool, bench, threshold=0.9,
                               centroids=cents).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# Scale-aware default k (VERDICT r8 #2): fixed k=8 grows the SemDeDup
# pair term sum|cell|^2 quadratically with the corpus (measured 0.5M ->
# 450M pairs over 30x — SCALE.md); k ~ sqrt(N) is the default.


def test_default_n_clusters_formula():
    assert kmeans.default_n_clusters(0) == 1
    assert kmeans.default_n_clusters(1) == 1
    assert kmeans.default_n_clusters(38) == 1          # N//39 support floor
    assert kmeans.default_n_clusters(500) == 12        # capped by N//39
    assert kmeans.default_n_clusters(2000) == 44       # sqrt regime
    assert kmeans.default_n_clusters(10**6) == 1000
    assert kmeans.default_n_clusters(10**12) == 10**6  # 100 TB-ish: IVF-size k


def test_semantic_dedup_default_k_equals_explicit(spark, emb):
    n = emb.count()
    k = kmeans.default_n_clusters(n)
    a = sorted(map(tuple, kmeans.semantic_dedup(emb).collect()))
    b = sorted(map(tuple,
                   kmeans.semantic_dedup(emb, n_clusters=k).collect()))
    assert a == b and len(a) == n


def _pair_budget(corpus, k):
    cents = kmeans.kmeans_fit(corpus, n_clusters=k, iters=2)
    counts = (
        kmeans.kmeans_assign(corpus, cents)
        .groupBy("cell").count().collect()
    )
    return sum(r["count"] ** 2 for r in counts)


def test_default_k_pair_budget_subquadratic(spark, emb):
    """The SCALE.md knee reproduced in-code: replicate the fixture 8x
    (ids offset; identical points, so the fixed-k trainer provably
    reproduces its centroids and every cell scales exactly 8x). Fixed
    k=8 must show the quadratic signature (sum|cell|^2 ~ 64x); the
    scale-aware default must stay well under half of it."""
    stride = emb.agg(F.max("vec_id")).first()[0] + 1
    n1 = emb.count()
    rep8 = emb
    for i in range(1, 8):
        rep8 = rep8.unionByName(
            emb.select((F.col("vec_id") + i * stride).alias("vec_id"),
                       "embedding", "label"))
    rep8 = rep8.cache()
    n8 = rep8.count()
    assert n8 == 8 * n1

    b1_fixed = _pair_budget(emb, 8)
    b8_fixed = _pair_budget(rep8, 8)
    assert b8_fixed == 64 * b1_fixed  # the quadratic signature, exactly

    b1_def = _pair_budget(emb, kmeans.default_n_clusters(n1))
    b8_def = _pair_budget(rep8, kmeans.default_n_clusters(n8))
    # sub-quadratic: sqrt-scaled k targets ~8^1.5 = 22.6x; allow cell
    # imbalance but reject anything in the quadratic regime
    assert b8_def / b1_def < 40
    assert b8_def < b8_fixed / 2
    rep8.unpersist()
