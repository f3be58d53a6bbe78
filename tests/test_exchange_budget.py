"""Shuffle-exchange budgets for the most expensive registry queries.

Every ``Exchange hash/range/single/round`` node in the pre-execution
physical plan is a cluster-wide shuffle at 100 TB; these budgets pin the
measured counts (plus one node of slack) so a refactor that silently adds
a shuffle — a lost exchange reuse, a de-broadcast join, an extra
repartition — fails here instead of surfacing as a bench regression two
rounds later. Budgets are UPPER bounds: beating them is fine; plan-text
counts include subtrees later deduplicated by runtime exchange reuse, so
they overstate executed shuffles (simjoin's 29-node plan executes far
fewer) — the budget tracks the declared plan, the stable artifact."""

from __future__ import annotations

import re

import pytest

from simple_anonymizer_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# query -> (max shuffle exchanges, max broadcast exchanges)
BUDGETS = {
    "q1_pricing_summary": (2, 1),
    "q9_product_profit": (2, 5),
    "dedup_minhash_lsh": (3, 3),
    "dedup_lsh_ingest": (4, 5),
    # r12 connected-components rewrite: the per-round label joins now
    # run exchange-free over pre-partitioned checkpoints, at the cost of
    # a ONE-TIME singleton re-attach (union-distinct + left join) in the
    # returned plan — declared shuffles went 3 -> 6 (golden records) and
    # 1 -> 2 (pipeline corpus) while per-ROUND executed shuffles went to
    # zero; measured + 1 slack.
    "dedup_golden_records": (7, 3),
    "embedding_topk_pq": (3, 2),
    "embedding_kmeans": (2, 2),
    "semantic_dedup_embeddings": (3, 2),
    "pipeline_corpus": (3, 3),
    "bm25_docs": (6, 5),
    "simjoin_exact_jaccard": (30, 9),
    "hll_overlap_halves": (6, 4),
    "kmv_overlap_halves": (9, 6),
    # r12: the lineitem side pre-aggregates to (key, count) before the
    # hash grids (each distinct key hashed once, weighted adds) — the
    # identical pre-agg subtree is declared under all three consumers
    # (+3 plan-text exchanges) but executes once via exchange reuse.
    "join_size_sketch_orders": (10, 6),
    "attribution_linear_events": (4, 2),
    # round-6 third-session sweep: the continuation batch's costliest
    # entries plus every newly added query, measured + 1 slack.
    "dedup_minhash_recall": (3, 5),
    "contamination_semantic": (3, 2),
    "quality_lr_classifier": (3, 2),
    "anon_fpe_orders": (1, 1),
    "bpe_fertility_langs": (3, 3),
    "dsir_select_docs": (7, 3),
    "wordpiece_encode_docs": (2, 2),
    "quantile_sketch_prices": (25, 10),
    "retrieval_rrf": (10, 6),
    "dedup_lines_boilerplate": (4, 2),
    "compaction_plan_files": (6, 2),
    "graph_kcore_supply": (2, 1),
    # round-8 re-measure: build_vocab's global window became the
    # global_ranks two-pass rank (range exchange + prefix broadcast),
    # and the vocab subtree is REFERENCED three times (encode + decode
    # joins) — plan text triples it, but global_ranks caches the ranged
    # layout so the range shuffle EXECUTES once; the rest is
    # vocab-sized. Declared-plan count 19 + 1 slack.
    "tokenizer_roundtrip_docs": (20, 9),
    "embedding_hard_negatives": (7, 3),
    # round-7 batch, measured + 1 slack (lang_id_kappa is absent on
    # purpose: its returned plan is a local relation — the corpus work
    # happens in the one collected grid aggregation).
    "orc_roundtrip_docs": (1, 1),
    "dedup_url_canonical": (2, 1),
    "lang_confusion_matrix": (4, 2),
    "zipf_fit_tokens": (3, 1),
    "ngram_novelty_release": (8, 3),
    "simjoin_containment_adjacent": (5, 3),
    "remix_water_fill": (3, 1),
    "pack_efficiency_report": (6, 2),
    "vocab_coverage_curve": (7, 3),
    "dedup_cluster_sizes": (4, 1),
    "source_lang_mix": (3, 1),
    "sample_customers_fixed_k": (2, 1),
    # 5 edges x (1 fanout agg + 1 partial/final pair + 1 parent count
    # single-partition) in plan text; each shuffles a tiny summary.
    "fk_fanout_profile": (16, 6),
    "char_entropy_docs": (2, 1),
    "events_user_gini": (8, 2),
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(spark, name):
    max_shuffle, max_broadcast = BUDGETS[name]
    plan = (
        QUERIES[name](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    shuffles = len(re.findall(r"Exchange (hash|range|single|round)", plan))
    broadcasts = plan.count("BroadcastExchange")
    assert shuffles <= max_shuffle, (
        f"{name}: {shuffles} shuffle exchanges (budget {max_shuffle}) — "
        f"a new shuffle crept into the plan"
    )
    assert broadcasts <= max_broadcast, (
        f"{name}: {broadcasts} broadcast exchanges (budget {max_broadcast})"
    )
