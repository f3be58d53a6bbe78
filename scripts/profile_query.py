"""Phase profile for registry queries: where does the bench second go?

For each name: time (a) BUILD — the QUERIES[name]() call itself, which
includes any driver-side jobs (collects, counts, writes) the query does
while constructing its DataFrame; (b) PLAN — explain() of the returned
DataFrame (analyzer+optimizer+physical planning, no execution); (c) EXEC1
— first noop write; (d) EXEC2 — second noop write of the SAME DataFrame
(re-plans the write but reuses nothing else; difference vs EXEC1 is
session warm-up noise).

Usage: python scripts/profile_query.py name [name...]
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_WARM_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from simple_anonymizer_spark.queries import QUERIES


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile-query")
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

    for name in names:
        # warm codegen caches exactly like bench.py
        QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite").save()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(json.dumps({
            "query": name,
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec1_s": round(t3 - t2, 3),
            "exec2_s": round(t4 - t3, 3),
            "total_bench_equiv_s": round(t3 - t0, 3),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
