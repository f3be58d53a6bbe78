"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints TWO JSON lines — the full registry
sweep first, then the compact headline line LAST so a bounded tail
capture always retains it:
{"metric": "registry_sweep_runtimes", "sweep": {...}, "sf": ...}
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via the no-op sink (executes the whole
plan executor-side, no driver collect). A warm-up pass on a trivial query
absorbs session/JIT startup so numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from simple_anonymizer_spark.queries import QUERIES

HEADLINE = [
    "anon_customer_pii",
    "spec_subset_chain",
    "selfref_closure",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_top_orders",
    "agg_segment_stats",
    "events_tumbling",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "embedding_topk",
    "multimodal_meta",
    # Round-2/3 heavy operators — benched so a scale regression in them is
    # caught by the committed artifact, not a manual sweep. (Keeps the
    # original 18 above unchanged for round-over-round comparability.)
    "simjoin_exact_jaccard",
    "embedding_kmeans",
    "cms_sketch_tokens",
    "zorder_orders",
    "equidepth_order_prices",
    "pack_sequences_docs",
    # Round-4 operators: the heaviest of the TPC-H extension block plus
    # the new retrieval/sequence/graph operators.
    "q9_product_profit",
    "q21_waiting_suppliers",
    "pagerank_trade",
    "bm25_docs",
    "bigram_lm_docs",
    "markov_event_transitions",
    # Round-4 late additions: the explode/join-heavy new operators (span
    # scrubbing, within-cell semantic dedup, basket pairing, calendar
    # expansion) — the cheap ones (triangles, DP counts, generalization)
    # ride the oracle gate only.
    "scrub_dup_spans",
    "semantic_dedup_embeddings",
    "assoc_brand_pairs",
    "ts_daily_interpolate",
    "doc_surprisal_corpus",
    "dedup_golden_records",
    "pipeline_release_orders",
    "bpe_encode_docs",
    # The pair-Jaccard single-task serialization caught by the sf0.1 sweep
    # (fixed via ensure_parallelism) — benched so it can't silently recur.
    "ngram_jaccard_adjacent",
    # Round-4 session additions: the token-budget prefix-sum selection is
    # the only one with a two-job structure worth watching at scale.
    "token_budget_corpus",
    # Round-11 de-vacuization made the release composite do real work
    # (grouped split + 5-gram decontamination explode, ~6.9 s standalone
    # at sf0.1) — benched so a regression in the release path shows in
    # artifact-to-artifact comparisons (round-11 ask #6).
    "pipeline_release_corpus",
]

# Everything NOT in HEADLINE rides the sweep tier: one warm timed pass per
# query (vs best-of-2 for headliners), so the committed artifact carries a
# round-over-round number for the WHOLE registry — graph, privacy, GDPR,
# remix, PQ/recall included — without doubling the bench wall time.
SWEEP = [n for n in QUERIES if n not in HEADLINE]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = (
        SparkSession.builder.appName("simple-anonymizer-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up at the smallest scale factor: compiles each query's
    # whole-stage-codegen classes (cache keys on generated source, which is
    # scale-independent) so timed runs measure execution, not JIT.
    #
    # HEADLINE-ONLY here: round 6 proved that warming the whole registry
    # (231 plans) before timing the headline tier contaminates the
    # committed artifact — accumulated JVM/session state inflated
    # doc_surprisal_corpus to 10.62 s in BENCH_r06 vs 2.02 s standalone
    # best-of-3 (same box, same config), manufacturing phantom regressions
    # that grow with registry size. The headline tier is the
    # round-over-round comparability record, so it is warmed and TIMED in
    # a fresh-session-equivalent state; the sweep tier warms afterwards.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass

    # Two timed executions per query, best-of reported: single runs on a
    # shared box see ±50% noise (GC pauses, scheduler jitter); the minimum
    # is the steady-state throughput the plan actually delivers. A query
    # that THROWS records an error instead of killing the bench — round 2
    # produced no number at all because one AnalysisException crashed the
    # whole run; a partial measurement always beats none.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for attempt in range(2):
        for name in HEADLINE:
            if name in errors:
                continue
            start = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception as exc:  # noqa: BLE001 - record and continue
                errors[name] = type(exc).__name__
                timings.pop(name, None)
                continue
            elapsed = round(time.perf_counter() - start, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    # Sweep tier: warm (codegen compile at sf0.001) then one timed pass
    # for every remaining registry query. Sweep warm-up runs AFTER the
    # headline tier has been timed (see the headline warm-up note).
    for name in SWEEP:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass
    sweep: dict[str, float] = {}
    for name in SWEEP:
        if name in errors:
            continue
        start = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception as exc:  # noqa: BLE001 - record and continue
            errors[name] = type(exc).__name__
            continue
        sweep[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    # Two lines, sweep FIRST and the compact headline LAST: the driver's
    # tail capture is bounded, and round 5 proved a single giant line gets
    # its head (the headline section) truncated away ("parsed": null in
    # BENCH_r05). The last line is small and self-contained, so any
    # bounded tail always retains a parseable headline.
    sweep_out = {
        "metric": "registry_sweep_runtimes",
        "unit": "sec",
        "sweep": sweep,
        "sf": sf,
    }
    print(json.dumps(sweep_out))
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sweep_total": round(sum(sweep.values()), 3),
        "registry_covered": len(timings) + len(sweep),
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
