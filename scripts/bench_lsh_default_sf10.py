"""One-off scale proof: minhash_lsh_pairs with BARE DEFAULTS (the plan a
caller gets without flags) at a given sf dir — the round-9 re-run of the
SCALE.md sf10 row after hash_shingles=True became the default. Times a
noop-sink materialization (the CLAUDE.md discipline: .count() lets
Catalyst delete the work) and reports the emitted pair count.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 python scripts/bench_lsh_default_sf10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from simple_anonymizer_spark.operators import dedup


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("lsh-default-sf10")
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
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # warm codegen at tiny scale
    warm = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    dedup.minhash_lsh_pairs(warm, jaccard_threshold=0.3).write.format(
        "noop").mode("overwrite").save()

    start = time.perf_counter()
    dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.3).write.format(
        "noop").mode("overwrite").save()
    elapsed = time.perf_counter() - start
    n_pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.3).count()
    print(json.dumps({
        "metric": "minhash_lsh_pairs_default_path", "unit": "sec",
        "value": round(elapsed, 1), "n_pairs": n_pairs, "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
