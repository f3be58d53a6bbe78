"""Standalone best-of-3 measurement for a handful of queries — the
repo's measurement discipline (CLAUDE.md: bench timings swing
±30-100% with session state; re-measure standalone best-of-3 in ONE
fresh session before calling a regression).

Usage: python scripts/bench_standalone.py q1 q2 ...   [default: the
three round-6 residual-slowdown queries]. Prints one JSON line.
Uses the same session config as bench.py so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from simple_anonymizer_spark.queries import QUERIES

DEFAULT = ["doc_surprisal_corpus", "dedup_golden_records", "bpe_encode_docs"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("bench-standalone")
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

    out: dict[str, float] = {}
    for name in names:
        QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite").save()
        best = float("inf")
        for _ in range(int(os.environ.get("BEST_OF", "3"))):
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.perf_counter() - start)
        out[name] = round(best, 3)
    print(json.dumps({"metric": "standalone_best_of_3", "unit": "sec",
                      "queries": out, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
