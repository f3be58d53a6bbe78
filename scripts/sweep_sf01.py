"""Full-registry timing sweep at sf0.1 — the committed regression tool
behind bench.py's curated HEADLINE set.

Runs every query in the registry cold on local[32] and prints one JSON
object {"times": {...}, "errors": {...}}. Cold numbers include first-run
codegen compile (3-6 s for big expressions), so compare round-over-round
cold-vs-cold, or re-run a suspect query warm (second invocation in the
same session) before calling it a regression.

Usage: python scripts/sweep_sf01.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession

from simple_anonymizer_spark.queries import QUERIES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

res, errs = {}, {}
for name, fn in QUERIES.items():
    t0 = time.time()
    try:
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        res[name] = round(time.time() - t0, 3)
    except Exception as ex:  # record and continue — a sweep must finish
        errs[name] = str(ex)[:200]
    print(f"{name}: {res.get(name, 'ERR')}", file=sys.stderr, flush=True)

print(json.dumps({"times": res, "errors": errs}))
