"""Per-round cost of connected_components on a long-chain graph
(VERDICT r12 #1): a path graph of diameter D needs ~D propagation
rounds; if any round re-executed the previous rounds' join chain the
per-round wall time would GROW with the round index (O(D^2) total).
The in-loop eager localCheckpoint (components.py, r12) must keep it
flat (O(D)).

Prints one JSON line: per-round seconds (instrumented via a monkey-
patched localCheckpoint boundary is intrusive; instead we time whole
runs at increasing diameters — O(D) shows as linear total, O(D^2) as
quadratic) plus the convergence round count.

Usage: python scripts/bench_components_chain.py [n_nodes_per_chain ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from simple_anonymizer_spark.operators import components


def main() -> None:
    diameters = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("components-chain-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for d in diameters:
        # 200 parallel chains of `d` edges each: diameter d, so ~d
        # propagation rounds; enough rows that a per-round re-execution
        # is visible above job-scheduling noise.
        edges = (
            spark.range(200 * d)
            .select(
                ((F.col("id") % 200) * 10000 + (F.col("id") / 200)
                 .cast("long")).alias("id_a"),
                ((F.col("id") % 200) * 10000 + (F.col("id") / 200)
                 .cast("long") + 1).alias("id_b"),
            )
        )
        spark.sparkContext.setJobDescription(f"components chain d={d}")
        t0 = time.perf_counter()
        labels = components.connected_components(edges, max_iterations=d + 5)
        n = labels.groupBy("component").count().count()
        el = time.perf_counter() - t0
        assert n == 200, n
        out[f"d{d}"] = round(el, 2)
        out[f"d{d}_per_round"] = round(el / d, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
