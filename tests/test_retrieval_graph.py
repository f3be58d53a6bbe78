"""Behavioral tests for the round-4 pipeline operators: BM25 retrieval,
bigram LM, Markov transitions, blocked linkage, integer PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.graph import (
    RANK_SCALE,
    nation_trade_edges,
    pagerank,
)
from simple_anonymizer_spark.operators.linkage import blocked_levenshtein_link
from simple_anonymizer_spark.operators.retrieval import bm25_scores
from simple_anonymizer_spark.operators.sequences import markov_transitions
from simple_anonymizer_spark.operators.text_analysis import bigram_lm


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_rare_term_outranks_common(spark):
    # 'zebra' appears in one doc, 'the' in all: equal-tf hit on the rare
    # term must score strictly higher.
    docs = _docs(spark, [
        (1, "the zebra runs"),
        (2, "the cat sits"),
        (3, "the dog barks"),
        (4, "the bird sings"),
    ])
    out = bm25_scores(docs, ["zebra"], top_k=10).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].score > 0
    both = {r.doc_id: r.score_fp
            for r in bm25_scores(docs, ["zebra", "the"], top_k=10).collect()}
    assert both[1] > both[2]  # zebra+the beats the-only


def test_bm25_length_normalization(spark):
    # Same tf for the query term; the shorter document must rank first.
    docs = _docs(spark, [
        (1, "zebra fast"),
        (2, "zebra " + "filler " * 30),
        (3, "other words entirely"),
    ])
    out = bm25_scores(docs, ["zebra"], top_k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].score_fp > out[1].score_fp
    assert [r.rank for r in out] == [1, 2]


def test_bm25_partition_invariance(spark):
    docs = _docs(spark, [
        (i, f"alpha beta gamma_{i % 7} delta word{i % 3}") for i in range(40)
    ])
    a = bm25_scores(docs.repartition(1), ["alpha", "word1"], top_k=15).collect()
    b = bm25_scores(docs.repartition(13), ["alpha", "word1"], top_k=15).collect()
    key = lambda rows: sorted((r.doc_id, r.score_fp, r.rank) for r in rows)
    assert key(a) == key(b)


def test_bm25_top_k_cap(spark):
    docs = _docs(spark, [(i, "common term here") for i in range(30)])
    assert bm25_scores(docs, ["common"], top_k=5).count() == 5


# ---------------------------------------------------------------------------
# Bigram LM
# ---------------------------------------------------------------------------


def test_bigram_lm_counts_and_probs(spark):
    docs = _docs(spark, [
        (1, "a b a b"),
        (2, "a b c"),
        (3, "x"),          # too short: contributes nothing
    ])
    rows = {(r.w1, r.w2): r for r in bigram_lm(docs).collect()}
    # bigrams: doc1 -> (a b), (b a), (a b); doc2 -> (a b), (b c)
    assert rows[("a", "b")].n_bigram == 3
    assert rows[("b", "a")].n_bigram == 1
    assert rows[("b", "c")].n_bigram == 1
    assert rows[("a", "b")].n_context == 3
    assert rows[("a", "b")].p_cond == 1.0
    assert rows[("b", "a")].p_cond == 0.5


def test_bigram_lm_probs_sum_to_one_per_context(spark):
    docs = _docs(spark, [
        (i, f"w{i % 3} w{(i + 1) % 4} w{i % 5} w{(i + 2) % 3}")
        for i in range(30)
    ])
    sums = (
        bigram_lm(docs)
        .groupBy("w1")
        .agg(F.sum("p_cond").alias("s"))
        .collect()
    )
    for r in sums:
        assert r.s == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# Markov transitions
# ---------------------------------------------------------------------------


def test_markov_transitions_tiny_sequence(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "view"),
            (2, 10, 4, "view"), (2, 20, 5, "click"), (2, 30, 6, "buy"),
        ],
        "user_id long, ts_us long, event_id long, event_type string",
    )
    rows = {(r.prev_type, r.next_type): r for r in markov_transitions(ev).collect()}
    assert rows[("view", "click")].n_trans == 2
    assert rows[("click", "view")].n_trans == 1
    assert rows[("click", "buy")].n_trans == 1
    assert rows[("click", "view")].p_cond == 0.5
    assert rows[("view", "click")].p_cond == 1.0


def test_markov_tie_break_on_event_id(spark):
    # Same timestamp: event_id orders the pair deterministically.
    ev = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 10, 2, "b")],
        "user_id long, ts_us long, event_id long, event_type string",
    )
    rows = markov_transitions(ev).collect()
    assert len(rows) == 1
    assert (rows[0].prev_type, rows[0].next_type) == ("a", "b")


# ---------------------------------------------------------------------------
# Blocked linkage
# ---------------------------------------------------------------------------


def test_blocked_linkage_matches_within_block_only(spark):
    left = spark.createDataFrame(
        [(1, "Customer#0042"), (2, "Customer#0099")],
        "c_id long, c_name string",
    )
    right = spark.createDataFrame(
        [(10, "Supplier#0042"), (11, "Supplier#0042x"), (12, "Xustomer#0099")],
        "s_id long, s_name string",
    )
    out = blocked_levenshtein_link(
        left, right,
        F.expr("right(c_name, 4)"), F.expr("right(s_name, 4)"),
        "c_name", "s_name", max_distance=5,
    ).collect()
    pairs = {(r.c_id, r.s_id): r.distance for r in out}
    assert pairs == {(1, 10): 5, (2, 12): 1}
    # 11 shares no block key ('042x'); never compared despite distance 6.


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight long")


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # 3-cycle with equal weights: every node keeps rank 1/3 exactly.
    pr = pagerank(_edges(spark, [(0, 1, 5), (1, 2, 5), (2, 0, 5)]),
                  iterations=3).collect()
    vals = {r.node: r.rank_fp for r in pr}
    assert len(set(vals.values())) == 1
    # floor losses only: total <= SCALE, within 3 units of exact thirds
    assert abs(vals[0] - RANK_SCALE // 3) <= 3


def test_pagerank_sink_heavy_node_ranks_highest(spark):
    # Star into node 0: it outranks everything; node 1 (sole target of
    # 0's out-edge) beats the teleport-only leaves 2 and 3.
    pr = pagerank(
        _edges(spark, [(1, 0, 1), (2, 0, 1), (3, 0, 1), (0, 1, 1)]),
        iterations=3,
    ).collect()
    vals = {r.node: r.rank_fp for r in pr}
    assert vals[0] > vals[1] > vals[2] == vals[3]


def test_pagerank_mass_conservation_bound(spark):
    edges = _edges(spark, [
        (i, (i * 7 + 3) % 10, 1 + i % 4) for i in range(10)
    ])
    pr = pagerank(edges, iterations=3).collect()
    total = sum(r.rank_fp for r in pr)
    assert total <= RANK_SCALE
    # floor drops are tiny: within 1e-5 of full mass for this graph
    assert total >= RANK_SCALE - 10**7


def test_pagerank_partition_invariance(spark):
    rows = [(i % 13, (i * 5 + 2) % 13, 1 + i % 3) for i in range(60)]
    base = _edges(spark, rows).groupBy("src", "dst").agg(
        F.sum("weight").alias("weight")
    )
    a = pagerank(base.repartition(1), iterations=3).collect()
    b = pagerank(base.repartition(7), iterations=3).collect()
    assert sorted((r.node, r.rank_fp) for r in a) == \
        sorted((r.node, r.rank_fp) for r in b)


def test_nation_trade_edges_weights(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    edges = nation_trade_edges(li, o, c, s)
    total = edges.agg(F.sum("weight")).collect()[0][0]
    assert total == li.count()  # every lineitem lands in exactly one edge


# ---------------------------------------------------------------------------
# Triangle counting / clustering coefficient
# ---------------------------------------------------------------------------


def _tri(spark, pairs):
    from simple_anonymizer_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r.node: (r.degree, r.tri_count, r.lcc)
            for r in triangle_stats(df).collect()}


def test_triangles_k4_complete(spark):
    # K4: every node has degree 3, sits in 3 triangles, lcc = 1.0.
    pairs = [(i, j) for i in range(4) for j in range(4) if i != j]
    out = _tri(spark, pairs)
    assert out == {n: (3, 3, 1.0) for n in range(4)}


def test_triangles_path_has_none(spark):
    out = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert all(t == 0 and lcc == 0.0 for (_, t, lcc) in out.values())
    assert out[0][0] == 1 and out[1][0] == 2


def test_triangles_bowtie_center_counts_both(spark):
    # Two triangles sharing node 2: center sees 2, wings see 1 each.
    out = _tri(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)])
    assert out[2] == (4, 2, 2 * 2 / (4 * 3))
    for n in (0, 1, 3, 4):
        assert out[n] == (2, 1, 1.0)


def test_triangles_ignore_loops_direction_and_duplicates(spark):
    # Self-loops, reversed duplicates, and parallel edges must not
    # change the canonical count.
    noisy = [(0, 0), (0, 1), (1, 0), (1, 2), (1, 2), (2, 0), (2, 2)]
    out = _tri(spark, noisy)
    assert out == {n: (2, 1, 1.0) for n in range(3)}


def test_triangles_partition_invariance(spark):
    from simple_anonymizer_spark.operators.graph import triangle_stats

    rows = [(i % 17, (i * 11 + 5) % 17) for i in range(200)]
    df = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(map(tuple, triangle_stats(df.repartition(1)).collect()))
    b = sorted(map(tuple, triangle_stats(df.repartition(9)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Top event paths
# ---------------------------------------------------------------------------


def test_top_paths_counts_and_order(spark):
    from simple_anonymizer_spark.operators.sequences import top_paths

    rows = []
    # user 1: a b c a b c -> paths a>b>c (x2), b>c>a, c>a>b
    for i, t in enumerate(["a", "b", "c", "a", "b", "c"]):
        rows.append((1, t, i, i * 1000))
    # user 2: a b c -> a>b>c once more
    for i, t in enumerate(["a", "b", "c"]):
        rows.append((2, t, 100 + i, i * 1000))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, ts_us long"
    )
    out = top_paths(ev, n=3, k=10).collect()
    assert (out[0].path, out[0].n_occurrences) == ("a>b>c", 3)
    rest = {(r.path, r.n_occurrences) for r in out[1:]}
    assert rest == {("b>c>a", 1), ("c>a>b", 1)}


def test_top_paths_never_crosses_users(spark):
    from simple_anonymizer_spark.operators.sequences import top_paths

    ev = spark.createDataFrame(
        [(1, "a", 0, 0), (1, "b", 1, 1), (2, "c", 2, 2), (2, "d", 3, 3)],
        "user_id long, event_type string, event_id long, ts_us long",
    )
    out = top_paths(ev, n=2, k=10).collect()
    assert {(r.path, r.n_occurrences) for r in out} == \
        {("a>b", 1), ("c>d", 1)}


# ---------------------------------------------------------------------------
# Integer surprisal scoring
# ---------------------------------------------------------------------------


def test_doc_surprisal_known_bits(spark):
    from simple_anonymizer_spark.operators.text_analysis import doc_surprisal

    # lm: (a,b)x2, (a,c)x1; context a=3. bits(3)=2, bits(2)=2, bits(1)=1:
    # cost(a,b) = 0, cost(a,c) = 1.
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = {r.doc_id: (r.n_bigrams, r.total_bits, r.mean_bits)
           for r in doc_surprisal(docs).collect()}
    assert out[1] == (1, 0, 0.0)
    assert out[2] == (1, 0, 0.0)
    assert out[3] == (1, 1, 1.0)


def test_doc_surprisal_oov_against_trained_lm(spark):
    from simple_anonymizer_spark.operators.text_analysis import (
        bigram_lm,
        doc_surprisal,
    )

    train = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    lm = bigram_lm(train)
    fresh = _docs(spark, [(10, "x y"), (11, "a b")])
    out = {r.doc_id: (r.n_bigrams, r.total_bits)
           for r in doc_surprisal(fresh, lm=lm).collect()}
    # unseen bigram costs bits(total=3) = 2; known (a,b) costs 0
    assert out[10] == (1, 2)
    assert out[11] == (1, 0)


def test_doc_surprisal_short_doc_null_mean(spark):
    from simple_anonymizer_spark.operators.text_analysis import doc_surprisal

    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "a b a b")])
    out = {r.doc_id: (r.n_bigrams, r.mean_bits)
           for r in doc_surprisal(docs).collect()}
    assert out[1] == (1 - 1, None) or out[1] == (0, None)
    assert out[2] == (0, None)
    assert out[3][0] == 3


def test_doc_surprisal_flags_incoherent_tail(spark):
    from simple_anonymizer_spark.operators.text_analysis import doc_surprisal

    # 20 fluent docs sharing one common pattern + 1 scrambled doc built
    # from rare one-off bigrams: the outlier must score strictly higher.
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((99, "mat the on sat cat the"))
    out = {r.doc_id: r.mean_bits
           for r in doc_surprisal(_docs(spark, rows)).collect()}
    fluent = max(v for k, v in out.items() if k != 99)
    assert out[99] > fluent


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion
# ---------------------------------------------------------------------------


def _ranks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_doc_in_both_lists_beats_single_list_leader(spark):
    from simple_anonymizer_spark.operators.retrieval import rrf_fuse

    a = _ranks(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranks(spark, [(3, 1), (2, 2), (4, 3)])
    out = {r.doc_id: r for r in rrf_fuse([a, b], k_const=60, top_k=10).collect()}
    # doc 2 (ranks 2+2) and doc 3 (3+1) both fuse two lists; docs 1 and 4
    # appear once each — any two-list doc outranks any one-list doc here.
    assert out[2].n_lists_hit == 2 and out[1].n_lists_hit == 1
    assert out[3].rank < out[1].rank and out[2].rank < out[4].rank
    # exact contribution arithmetic: absent list contributes exactly 0
    assert out[1].rrf == 1.0 / 61.0
    assert out[3].rrf == 1.0 / 63.0 + 1.0 / 61.0


def test_rrf_tie_breaks_on_id_and_caps_topk(spark):
    from simple_anonymizer_spark.operators.retrieval import rrf_fuse

    a = _ranks(spark, [(i, i) for i in range(1, 8)])
    b = _ranks(spark, [(i + 100, i) for i in range(1, 8)])
    out = rrf_fuse([a, b], k_const=60, top_k=5).collect()
    assert len(out) == 5
    # (1, rank 1) and (101, rank 1) tie on rrf: lower id wins
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks[1] == 1 and ranks[101] == 2


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------


def test_kcore_peels_pendant_chain_cascade(spark):
    from simple_anonymizer_spark.operators.graph import kcore

    # triangle 1-2-3 with a pendant chain 3-4-5: the 2-core is the
    # triangle, reached only after the cascade (5 dies, then 4)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r.node: r.core_degree for r in kcore(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_direction_and_duplicate_insensitive(spark):
    from simple_anonymizer_spark.operators.graph import kcore

    # same triangle, edges duplicated and reversed: degree counts
    # distinct neighbors, not edge multiplicity
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 2)],
        "src long, dst long",
    )
    out = {r.node: r.core_degree for r in kcore(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k above the max degree: empty core
    assert kcore(edges, k=5).count() == 0


def test_rrf_single_list_is_identity_order_and_empty_rejects(spark):
    from simple_anonymizer_spark.operators.retrieval import rrf_fuse

    a = _ranks(spark, [(5, 1), (9, 2), (2, 3)])
    out = rrf_fuse([a], k_const=60, top_k=10).collect()
    assert [(r.doc_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] \
        == [(5, 1), (9, 2), (2, 3)]
    with pytest.raises(ValueError):
        rrf_fuse([], k_const=60)


def test_rm3_expansion_ranks_cooccurring_terms(spark):
    """Expansion terms come only from feedback (query-matching) docs,
    exclude the original query terms, and rank by the exact integer
    tf/dl x score_fp weight — the co-occurring term that dominates the
    feedback set ranks first; vocabulary from non-matching docs never
    appears."""
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.retrieval import rm3_expansion

    docs = spark.createDataFrame([
        Row(doc_id=1, text="merge alpha alpha alpha beta"),
        Row(doc_id=2, text="stream alpha beta"),
        Row(doc_id=3, text="gamma gamma gamma unrelated"),
    ])
    out = rm3_expansion(docs, ["merge", "stream"], fb_docs=5, fb_terms=10)
    rows = {r.term: r for r in out.collect()}
    assert "merge" not in rows and "stream" not in rows
    assert "gamma" not in rows and "unrelated" not in rows
    assert set(rows) == {"alpha", "beta"}
    assert rows["alpha"].rank == 1 and rows["beta"].rank == 2
    assert rows["alpha"].weight_fp > rows["beta"].weight_fp > 0
    assert rows["alpha"].n_fb_docs == 2 and rows["beta"].n_fb_docs == 2

    # partition invariance of the exact integer weights
    a = sorted(tuple(r) for r in rm3_expansion(
        docs.repartition(1), ["merge", "stream"]).collect())
    b = sorted(tuple(r) for r in rm3_expansion(
        docs.repartition(7), ["merge", "stream"]).collect())
    assert a == b
