"""SparkSession factory with engine defaults.

Defaults are tuned for correctness-at-scale first: AQE on (runtime shuffle
coalescing + skew-join splitting), a shuffle-partition count that matches
local cores but would be overridden to ~2-3x total cores on a real cluster,
and Arrow enabled for the few Pandas-UDF operators (similarity/multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "simple-anonymizer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: list[str] | None = None) -> None:
    """SQL front door: register every fixture table as a temp view (the
    events timestamp normalized) and the ``anon_*`` SQL functions, so a
    SQL-only user can drive the whole engine through ``spark.sql``."""
    from .functions import anonymizers
    from .sources.parquet import read_sf_table

    for t in tables or FIXTURE_TABLES:
        read_sf_table(spark, sf_dir, t).createOrReplaceTempView(t)
    anonymizers.register_all(spark)
