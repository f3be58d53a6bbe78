"""Plan-shape audits: the physical plans must carry the properties that
make these operators viable at 100 TB — pushed filters, pruned scans, no
Python in native paths, broadcast joins where a side is small, no
unexpected shuffles, and no partition-less window over a data-scaling
table (the single-reducer scale killer)."""

from __future__ import annotations

import re

import pytest

from simple_anonymizer_spark.queries import QUERIES


def plan_of(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# Queries whose plans legitimately carry a partition-less window over an
# UNBOUNDED-looking subtree: the window input is a DOMAIN table (one row
# per source/segment — cardinality grows like distinct domains, not like
# the corpus), which the plan-string heuristic below cannot see. Anything
# else that trips the audit is a regression, not a candidate for this
# list: route it through stats.global_ranks (distributed two-pass rank)
# or a TakeOrderedAndProject limit first, the way build_vocab and
# vocab_coverage_curve do.
GLOBAL_WINDOW_DOMAIN_BOUNDED = frozenset({
    # water-filling waterline: three windows over the per-source token
    # count table (operators/sampling.py water_fill_budget) — one row
    # per source by construction.
    "remix_water_fill",
})


def _first_windowspec_arg(line: str) -> str:
    """First top-level argument of the first windowspecdefinition(...)."""
    inner = line[line.index("windowspecdefinition(")
                 + len("windowspecdefinition("):]
    depth, arg = 0, []
    for ch in inner:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            break
        arg.append(ch)
    return "".join(arg)


def _node_depth(line: str) -> int:
    m = re.search(r"[A-Za-z*(]", line)
    return m.start() if m else 0


def unbounded_global_windows(plan: str) -> list[str]:
    """Window nodes with NO partition spec (first windowspecdefinition
    argument is an ASC/DESC order column — partition columns print
    first, without a sort direction) whose input subtree carries no
    limiting operator. Such a node shuffles its whole input to ONE task
    ("Moving all data to a single partition") — fixture-fast, fatal on
    a table that scales with the data."""
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if not re.search(r"\bWindow(GroupLimit)?\s", ln):
            continue
        if "windowspecdefinition(" not in ln:
            continue
        arg = _first_windowspec_arg(ln)
        if " ASC" not in arg and " DESC" not in arg:
            continue  # partitioned window — fine
        depth = _node_depth(ln)
        subtree = []
        for nxt in lines[i + 1:]:
            if re.search(r"[A-Za-z]", nxt) and _node_depth(nxt) <= depth:
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        if not re.search(
            r"TakeOrderedAndProject|GlobalLimit|LocalLimit|CollectLimit"
            r"|LocalTableScan|Range \(",
            sub,
        ):
            bad.append(ln.strip()[:160])
    return bad


def assert_no_single_task_global_window(name: str, plan: str) -> None:
    if name in GLOBAL_WINDOW_DOMAIN_BOUNDED:
        return
    bad = unbounded_global_windows(plan)
    assert not bad, (
        f"{name}: partition-less window over an unbounded input — a "
        f"single-reducer sort at scale. Route through stats.global_ranks "
        f"or bound the input with a limit first. Nodes: {bad}"
    )


# ---------------------------------------------------------------------------
# Bounded-key shuffle-join audit (VERDICT r8 #7): an equi-join whose ONLY
# keys are bounded-cardinality derived columns (a kmeans cell, an LSH band,
# a language/label code) has at most |keys| non-empty shuffle buckets — a
# shuffle-join strategy draw then serializes the whole pair grid onto
# |keys| tasks regardless of cluster size (measured: the sf3 k=8 SemDeDup
# join ran 8-wide on 32 cores, 2.7x the salted time; 450M pairs on 8
# tasks). Every such join must either carry a salt key alongside the
# bounded key or broadcast one side. Name-heuristic: these are the
# repo's bounded-cardinality join-column names; extend the set when a
# new bounded key is introduced, and extend the allowlist ONLY with a
# reason that explains why the join cannot concentrate.

_BOUNDED_KEY_NAMES = {
    "cell", "__cell", "band", "__band", "label", "__label",
    "lang", "__lang", "grid", "__grid",
}

# name -> reason the bare bounded-key shuffle join is safe THERE.
BOUNDED_JOIN_ALLOWLIST: dict[str, str] = {}


def bounded_key_shuffle_joins(plan: str) -> list[str]:
    """Shuffle-join nodes (SortMergeJoin / ShuffledHashJoin — broadcast
    joins don't bucket by key) whose left key list consists ONLY of
    bounded-cardinality column names: parallelism is then capped at the
    key domain size, not the cluster."""
    bad = []
    for ln in plan.splitlines():
        m = re.search(
            r"(SortMergeJoin|ShuffledHashJoin)\S*\s+\[([^\]]*)\]", ln)
        if not m:
            continue
        keys = re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", m.group(2))
        if keys and all(k in _BOUNDED_KEY_NAMES for k in keys):
            bad.append(ln.strip()[:160])
    return bad


def assert_no_bounded_key_shuffle_join(name: str, plan: str) -> None:
    if name in BOUNDED_JOIN_ALLOWLIST:
        return
    bad = bounded_key_shuffle_joins(plan)
    assert not bad, (
        f"{name}: shuffle join keyed ONLY on bounded-cardinality "
        f"column(s) — at most |domain| tasks ever run it. Salt the key "
        f"(hash salt one side, explode-replicate the other, join on "
        f"(key, salt) — see kmeans.semantic_dedup) or broadcast a side. "
        f"Nodes: {bad}"
    )


NATIVE_QUERIES = [
    "anon_customer_pii", "anon_names", "anon_redact", "anon_stable_hash",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_pairs", "text_stats",
    "lang_id", "quality_gopher_flags", "text_normalize", "html_extract_docs",
    "url_parse_docs", "url_domain_stats", "text_cdc_chunks",
    "dedup_chunk_overlap", "corpus_report", "pipeline_web_corpus",
    "dq_table_checksum",
    "doc_fingerprint",
    "embedding_topk",
    "events_tumbling",
    "events_asof_signup", "spec_subset_chain",
    # round-2 additions: stats/funnel/corpus-term operators are pure
    # column algebra — any Python in their plans is a regression.
    "agg_median_balance", "agg_stats_moments", "agg_corr_qty_price",
    "histogram_order_prices", "rolling_user_activity",
    "funnel_signup_purchase", "tfidf_top_terms", "corpus_top_tokens",
    "fuzzy_levenshtein", "agg_quartiles_status", "skew_profile_orders",
    "cohort_retention_weekly", "scd2_user_state", "funnel_three_step",
    "window_percentiles", "events_interval_join", "sample_balanced",
    "pack_sequences_docs", "agg_string_collect", "join_full_outer",
    "q4_order_priority", "q6_forecast_revenue", "q10_returned_items",
    "q12_priority_class", "q14_promo_share", "window_running_distinct",
    "pipeline_retrieval", "contamination_screen", "dq_audit_orders",
    "anomaly_orders_3sigma", "corpus_top_bigrams",
    "winsorize_order_prices", "simjoin_exact_jaccard",
    "profile_customer", "dq_fk_audit", "drift_price_distribution",
    "cms_sketch_tokens", "cms_heavy_hitters", "contamination_bloom",
    "embedding_kmeans", "zorder_orders", "dedup_lsh_ingest",
    "sample_weighted_topk", "remix_lang_equal", "remix_lang_temperature",
    "token_budget_corpus", "remix_token_equal", "vocab_build", "encode_docs",
    "equidepth_order_prices",
    # round-4 completion: every remaining registry entry, so the invariant
    # covers the whole QUERIES surface (verified native this round —
    # including lens_json_field, whose fixture lens compiles to built-in
    # json functions).
    "lens_json_field", "spec_project_fixed", "spec_topk_orders",
    "spec_subset_region", "selfref_closure", "window_top_orders",
    "window_running_totals", "setop_except", "setop_intersect_union",
    "agg_segment_stats", "agg_rollup_region", "agg_cube_status",
    "agg_grouping_sets", "agg_grouping_flags", "pivot_segments",
    "agg_approx_distinct", "scalar_regex",
    "scalar_dates", "scalar_math", "scalar_collections", "scalar_strings",
    "sql_front_door", "config_front_door",
    "events_sliding",
    "events_sessionize", "dedup_distinct_docs", "ngram_jaccard_adjacent",
    "token_count_bpe", "text_quality", "embedding_neardup",
    "embedding_topk_lsh", "ann_recall_lsh", "join_anti_customers", "merge_upsert",
    "embedding_topk_ivf", "embedding_topk_pq", "embedding_quantize_int8",
    "range_join_shipments",
    "dedup_clusters",
    "sample_stratified", "sample_domain_cap", "sample_split_by_source",
    "sample_split", "text_scrub_pii", "text_chunks",
    "pipeline_corpus", "text_repetition", "dup_spans",
    # round-4 additions: TPC-H extension block + retrieval/sequence/
    # linkage/graph operators — all pure column algebra.
    "q2_min_cost_supplier", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "q11_important_parts", "q13_customer_distribution",
    "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty_revenue",
    "q18_large_orders", "q19_discounted_revenue", "q20_promo_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    "bm25_docs", "bigram_lm_docs", "markov_event_transitions",
    "linkage_customer_supplier", "pagerank_trade", "graph_triangles",
    "assoc_brand_pairs", "ts_daily_interpolate",
    "semantic_dedup_embeddings", "scrub_dup_spans",
    "agg_mode_disc_percentiles", "unpivot_lineitem_metrics",
    "anomaly_mad_orders", "json_props_profile", "dedup_golden_records",
    "concentration_segments", "window_rank_family", "window_value_family",
    "event_paths_top",
    "drift_ks_status", "doc_surprisal_corpus", "quantile_transform_prices",
    "bpe_train_corpus", "bpe_encode_docs",
    "unigram_train_corpus", "unigram_encode_docs",
    "anon_shift_dates", "anon_account_numbers", "anon_ip_prefix",
    "anon_fpe_orders",
    "pipeline_release_orders",
    "gdpr_cascade_delete", "rfm_customer_segments",
    "privacy_k_anonymity", "privacy_l_diversity", "privacy_dp_counts",
    "anon_generalize_k",
    # round-6 selection/projection/shuffle additions: pure column algebra.
    "dsir_select_docs", "quality_nb_classifier", "embedding_random_projection",
    "corpus_epoch_shuffle", "pmi_collocations", "readability_docs",
    "retrieval_mmr", "corpus_diff_versions", "bm25_indexed",
    "ivf_cell_stats", "release_manifest_versions", "bpe_fertility_langs",
    "corpus_scorecard_langs", "dedup_minhash_recall",
    # continuation-batch additions: sketch/classifier/privacy/tokenizer
    # operators — all pure column algebra (the LR/WordPiece/Mondrian
    # driver loops collect bounded model state, never corpus rows).
    "hll_distinct_orders", "contamination_semantic", "quality_lr_classifier",
    "ts_ewma_orders", "canary_audit_docs", "wordpiece_train_corpus",
    "wordpiece_encode_docs", "privacy_mondrian_customer",
    "privacy_dp_histogram", "quantile_sketch_prices",
    "anomaly_cusum_events",
    # round-6 batch: sketch set algebra, attribution grid, OLS sufficient
    # statistics, z-test — all pure column algebra.
    "hll_overlap_halves", "attribution_linear_events", "ols_trend_priority",
    "ab_ztest_events", "kmv_overlap_halves", "join_size_sketch_orders", "dedup_exact_ingest",
    "hll_distinct_users_by_type", "bootstrap_ci_order_price",
    "chisq_type_variant_events", "mannwhitney_value_events",
    "welch_ttest_user_value", "cuped_user_value",
    # hybrid retrieval fusion: bounded-list full-outer joins + one
    # bounded window — pure column algebra.
    "retrieval_rrf",
    # line-level boilerplate removal: explode/agg/rebuild column algebra.
    "dedup_lines_boilerplate",
    # compaction planner: pack_sequences' two-pass prefix sum over a file
    # inventory — bounded per-partition collect, no Python.
    "compaction_plan_files",
    # k-core peeling: per-iteration degree agg + semi-joins, one scalar
    # count per generation — pure column algebra.
    "graph_kcore_supply",
    # tokenizer round trip: encode/decode explode + broadcast vocab joins.
    "tokenizer_roundtrip_docs",
    # hard-negative mining: broadcast query scoring + two topk cascades.
    "embedding_hard_negatives",
    # round-7 batch: URL canonical dedup, lang-ID confusion grid,
    # integer-bits Zipf OLS, novelty anti-screen, containment pairs,
    # water-filling over the bounded domain table — all pure column
    # algebra (water_fill's budget is one single-row scalar collect);
    # orc_roundtrip reads back through Spark's native ORC scan (no
    # Python at all, unlike the avro/warc from-scratch codecs).
    "orc_roundtrip_docs", "dedup_url_canonical", "lang_confusion_matrix",
    "zipf_fit_tokens", "ngram_novelty_release",
    "simjoin_containment_adjacent", "remix_water_fill",
    # round-7 second batch: packing census (one agg over the two-pass
    # prefix-sum plan), vocab coverage grid, Cohen's kappa marginals,
    # dup-cluster histogram, per-source language census — all pure
    # column algebra over bounded grids.
    "pack_efficiency_report", "vocab_coverage_curve", "lang_id_kappa",
    "dedup_cluster_sizes", "source_lang_mix",
    # round-7 third batch: exact-k hash sample (TakeOrderedAndProject),
    # per-edge FK fan-out censuses (grouped counts + 1-row unions),
    # in-row char-histogram entropy — pure column algebra.
    "sample_customers_fixed_k", "fk_fanout_profile", "char_entropy_docs",
    # exact Gini: per-user agg + the two-pass distributed rank (one
    # bounded per-partition collect, broadcast re-base) — no Python.
    "events_user_gini",
    # round-8: maximal duplicated spans — the scrub cover merged via
    # per-doc gaps-and-islands windows, pure column algebra.
    "dup_span_islands",
    # round-8: RM3 expansion — broadcast feedback set, integer div
    # contributions, TakeOrderedAndProject top terms.
    "bm25_rm3_expansion",
    # round-8: per-source whole-bits KL census — term-keyed joins,
    # domain-bounded broadcast totals, pure column algebra.
    "source_kl_tokens",
    # round-9: byte-level BPE (GPT-2 byte encoder) — pre-token explode,
    # bounded merge-loop collects, codegen replace chains, and the
    # hex/substr byte remap — pure column algebra end-to-end.
    "byte_bpe_train_corpus", "byte_bpe_encode_docs",
    "byte_bpe_roundtrip_docs",
    # round-10: byte-level fertility scorecard — same codegen rewrite
    # chain, one doc-keyed join + one lang aggregation.
    "byte_bpe_fertility_langs",
    # round-9: iceberg metadata-tree round trip — the returned plan is
    # ONE native parquet scan over the manifest-listed files (commits
    # run eagerly at build time; no Python in the read path, unlike the
    # avro/warc codec tiers).
    "iceberg_roundtrip_docs",
    # round-10: iceberg v2 position deletes — ONE native parquet scan
    # plus a broadcast left-anti join on (_metadata.file_path,
    # _metadata.row_index) against the delete files; no Python anywhere.
    "iceberg_v2_delete_docs",
    # round-10: iceberg v2 upsert — equality-delete anti-join (null-safe
    # keys + broadcast file->seq lookup) over the same native scan.
    "iceberg_v2_upsert_docs",
    # round-10: compaction result — ONE native parquet scan, delete debt
    # physically purged so NO anti-join remains in the plan.
    "iceberg_compact_docs",
    # round-10: delta->iceberg migration + v2 delete — native scan plus
    # the broadcast position-delete anti-join.
    "iceberg_migrate_docs",
    # round-11: partition-transform write + pruned read — the bucket
    # hash is pure 64-bit-safe integer column algebra on the write path
    # and the returned plan is ONE native scan over the pruned files
    # plus the residual filter; no Python anywhere.
    "iceberg_transforms_orders",
    # round-12: decimal transforms — exact integer-cents decimal build,
    # minimal-bytes murmur3 as hex-buffer folds (lambda-leaf bound),
    # pruned native read-back plus residual; no Python anywhere.
    "iceberg_decimal_orders",
    # round-12: snapshot refs — tag-pinned native scan of the retained
    # first-generation files; no Python anywhere.
    "iceberg_tag_docs",
    # round-12: partitions metadata table — the write is native column
    # algebra and the read side is a metadata-only driver rollup
    # surfaced as a local DataFrame; no Python UDF anywhere.
    "iceberg_partitions_orders",
    # round-11: rename evolution — ONE name-mapping scan (coalesce over
    # the historical aliases) plus the position-delete anti-join; no
    # Python anywhere.
    "iceberg_rename_docs",
    # round-11: partition spec evolution — native scan over per-spec
    # pruned files plus the position-delete anti-join and residual.
    "iceberg_evolution_docs",
    # round-10: release composite — gopher gate (column algebra), hash
    # split (map-side), gram semi-join + anti-join; no Python anywhere.
    "pipeline_release_corpus",
    # multimodal_* stay OUT of this list: mapInPandas is their designed
    # (and allowed) Python slot.
]


# The multimodal queries are excluded from NATIVE_QUERIES because
# mapInPandas is their DESIGNED Python slot (codec work can't be column
# algebra). That exclusion is still an assertion, not a free pass: each
# plan must contain EXACTLY ONE MapInPandas node and no other Python —
# a second Python stage or a row-wise UDF sneaking in is a regression.
PANDAS_SLOT_QUERIES = ["multimodal_meta", "multimodal_resize",
                       "multimodal_frames", "multimodal_video_meta",
                       "multimodal_audio_features", "multimodal_image_meta",
                       "multimodal_jpeg_roundtrip", "multimodal_video_frames",
                       # container-codec round trips: the returned plan is
                       # the READ side — one decode task per file through
                       # one mapInPandas stage (the write side runs eagerly
                       # in its own single-stage job at build time)
                       "avro_roundtrip_docs", "warc_roundtrip_docs"]


@pytest.mark.parametrize("name", PANDAS_SLOT_QUERIES)
def test_multimodal_has_exactly_one_pandas_slot(spark, sf_dir, name):
    plan = plan_of(spark, name, sf_dir)
    assert plan.count("MapInPandas") == 1, f"{name}: want exactly 1 slot"
    assert "BatchEvalPython" not in plan, f"{name}: row-Python crept in"
    assert "ArrowEvalPython" not in plan, f"{name}: scalar pandas UDF crept in"
    assert_no_single_task_global_window(name, plan)
    assert_no_bounded_key_shuffle_join(name, plan)


def test_registry_is_fully_plan_covered():
    """NATIVE_QUERIES + PANDAS_SLOT_QUERIES must tile the whole registry —
    adding a query without declaring its Python posture fails here."""
    covered = set(NATIVE_QUERIES) | set(PANDAS_SLOT_QUERIES)
    missing = sorted(set(QUERIES) - covered)
    assert not missing, f"queries with undeclared plan posture: {missing}"
    assert not set(NATIVE_QUERIES) & set(PANDAS_SLOT_QUERIES)


def test_q6_filters_pushed_and_no_join(spark, sf_dir):
    # Q6 is the pushdown benchmark: date bounds reach the parquet scan.
    plan = plan_of(spark, "q6_forecast_revenue", sf_dir)
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan
    assert "Join" not in plan


def test_q10_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "q10_returned_items", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # customer dim broadcast


def test_histogram_partial_aggregation(spark, sf_dir):
    # Map-side combine before the shuffle: two HashAggregate levels.
    plan = plan_of(spark, "histogram_order_prices", sf_dir)
    assert plan.count("HashAggregate") >= 2


def test_top_tokens_is_take_ordered(spark, sf_dir):
    # Global top-n must not materialize a full sort.
    plan = plan_of(spark, "corpus_top_tokens", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_simjoin_is_equi_join_not_cartesian(spark, sf_dir):
    # Prefix filtering must plan as an equi-join on the prefix token —
    # a cartesian/BNLJ here means the pruning structure was lost.
    plan = plan_of(spark, "simjoin_exact_jaccard", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_ingest_verify_is_candidate_bounded(spark, sf_dir):
    """The ingest verify stage must shingle only candidate corpus docs:
    the corpus-side documents scan has to sit under a left-semi join on
    the candidate id set, never feed a bare full-corpus shingle
    projection — O(corpus) shingling per ingest batch breaks the
    operator's O(batch) contract at scale."""
    plan = plan_of(spark, "dedup_lsh_ingest", sf_dir)
    assert "LeftSemi" in plan, "corpus scan is not candidate-bounded"
    # the expensive shingle transform appears once per side (new batch +
    # semi-joined corpus), not as an extra unbounded projection
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["semantic_dedup_embeddings", "contamination_semantic"])
def test_cell_pair_joins_are_salted(spark, sf_dir, name):
    """The within-cell pair joins must key on (cell, __salt), never cell
    alone: an equi-join keyed only on cell has at most n_clusters
    non-empty shuffle buckets, and a shuffle-join strategy draw then
    serializes the whole quadratic pair grid onto n_clusters tasks
    (measured 2.7x at sf3 — SCALE.md round-8)."""
    plan = plan_of(spark, name, sf_dir)
    salted_join = any(
        "Join" in ln and "cell#" in ln and "__salt#" in ln
        for ln in plan.splitlines()
    )
    assert salted_join, f"{name}: cell pair join lost its salt key"


def test_bounded_join_auditor_catches_unsalted_cell_join(spark, sf_dir):
    """The auditor itself must fire on the anti-pattern it exists for: a
    self-join keyed on cell alone (what semantic_dedup would plan without
    its salt), with broadcast disabled so the shuffle-join draw happens."""
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.sources.parquet import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    cells = emb.select("vec_id", (F.col("vec_id") % 8).alias("cell"))
    a = cells.select(F.col("vec_id").alias("id_a"), "cell")
    b = cells.select(F.col("vec_id").alias("id_b"), "cell")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bare = a.join(b, "cell")
        plan = bare._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert bounded_key_shuffle_joins(plan), (
        "auditor failed to flag a bare cell-keyed shuffle join"
    )


def test_skew_profile_broadcasts_total(spark, sf_dir):
    # The single-row total must broadcast, not shuffle, into the join.
    plan = plan_of(spark, "skew_profile_orders", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", NATIVE_QUERIES)
def test_no_python_in_native_paths(spark, sf_dir, name):
    plan = plan_of(spark, name, sf_dir)
    assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
    assert "ArrowEvalPython" not in plan, f"{name} fell back to pandas UDF"
    assert "FlatMapsInPandas" not in plan
    # same plan, second invariant: no single-task global window over a
    # data-scaling table anywhere in the registry (NATIVE + PANDAS_SLOT
    # tile it; the pandas-slot test runs the same audit).
    assert_no_single_task_global_window(name, plan)
    # third invariant, same plan: no shuffle join keyed only on a
    # bounded-cardinality column (the 450M-pairs-on-8-tasks class).
    assert_no_bounded_key_shuffle_join(name, plan)


def test_filter_pushed_to_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_in_scan(spark, sf_dir):
    plan = plan_of(spark, "anon_stable_hash", sf_dir)
    # two of five customer columns read
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string>" in plan


def test_small_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q5_region_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan


def _walk_logical(node):
    yield node
    children = node.children()
    for i in range(children.length()):
        yield from _walk_logical(children.apply(i))


def _leaf_output_names(node):
    names = set()
    for n in _walk_logical(node):
        if n.children().length() == 0:
            out = n.output()
            for i in range(out.length()):
                names.add(out.apply(i).name())
    return names


# Column-name prefixes of the tables that scale with SF. region (5 rows)
# and nation (25 rows) are the only true dimensions in the schema; every
# other table grows linearly with the data volume, so a pinned broadcast
# of one would OOM executors / hit the broadcast timeout at 100 TB where
# AQE's threshold check would have chosen a shuffle join.
_SCALING_PREFIXES = ("c_", "s_", "p_", "o_", "l_")


_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "LocalLimit"}


def _is_bounded_subtree(node):
    """True if the hinted subtree passes through an Aggregate or Limit —
    its row count is then a statistic of the data (group cardinality,
    scalar, top-k), not the raw SF-scaling table size. The smell this test
    hunts is a hint over a scan/filter/project-only pipeline, whose size
    is a constant fraction of the table at every SF."""
    return any(n.getClass().getSimpleName() in _BOUNDING_NODES
               for n in _walk_logical(node))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_pinned_broadcast_on_scaling_tables(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed()
    for node in _walk_logical(analyzed):
        if node.getClass().getSimpleName() != "ResolvedHint":
            continue
        child = node.children().apply(0)
        if _is_bounded_subtree(child):
            continue
        leaves = _leaf_output_names(child)
        scaling = {c for c in leaves
                   if c.startswith(_SCALING_PREFIXES) and "_" in c[:3]}
        assert not scaling, (
            f"{name}: pinned broadcast hint over SF-scaling columns "
            f"{sorted(scaling)[:6]} — drop the hint and let AQE decide"
        )


def test_topk_plans_as_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "spec_topk_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    # map-side combine: HashAggregate appears both before and after exchange.
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    assert plan.count("HashAggregate") >= 2


def test_semi_join_used_for_subsetting(spark, sf_dir):
    plan = plan_of(spark, "spec_subset_chain", sf_dir)
    assert "LeftSemi" in plan


def test_wholestage_codegen_on_anonymizers(spark, sf_dir):
    # '*(n)' prefixes mark whole-stage-codegen spans in executedPlan text.
    # (anon_customer_pii sits under an AdaptiveSparkPlan whose pre-execution
    # text hides codegen markers, so assert on the unwrapped variant.)
    plan = plan_of(spark, "anon_stable_hash", sf_dir)
    assert "*(1)" in plan


def test_unpivot_is_expand_over_single_scan(spark, sf_dir):
    # Native UNPIVOT must plan as one Expand over one parquet scan — a
    # 4-way union of scans would read the table four times.
    plan = plan_of(spark, "unpivot_lineitem_metrics", sf_dir)
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_cms_sketch_partial_aggregation(spark, sf_dir):
    # The sketch's whole scale story is map-side combine down to the
    # depth*width grid BEFORE the shuffle: two HashAggregate levels.
    plan = plan_of(spark, "cms_sketch_tokens", sf_dir)
    assert plan.count("HashAggregate") >= 2


def test_cms_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "cms_heavy_hitters", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_bloom_probe_broadcasts_filter(spark, sf_dir):
    # The whole point of the Bloom screen: the filter side broadcasts and
    # the probe relation never shuffles into a sort-merge join.
    plan = plan_of(spark, "contamination_bloom", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_iceberg_v2_delete_antijoins_broadcast(spark, sf_dir):
    """The merge-on-read anti-joins must BROADCAST their delete side
    (the metadata-known counts at any test scale are far below the
    10M-row threshold) — a SortMergeJoin here would shuffle the whole
    table to subtract a tiny delete set."""
    for name in ("iceberg_v2_delete_docs", "iceberg_v2_upsert_docs"):
        plan = plan_of(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_iceberg_compaction_purges_antijoins_from_plan(spark, sf_dir):
    """After rewriteDataFiles the read plan is ONE bare parquet scan —
    the delete debt is physically gone, not re-filtered every read."""
    plan = plan_of(spark, "iceberg_compact_docs", sf_dir)
    assert "LeftAnti" not in plan and "Join" not in plan
