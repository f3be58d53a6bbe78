"""Parquet source/sink helpers for the copier and the fixture tables.

The driver's synthetic tables live at ``$SF_DIR/{name}.parquet``. The
``events`` table carries nanosecond timestamps, which Spark's Parquet
reader rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` is set —
``read_sf_table`` sets it and exposes ``ts`` both as raw nanos
(``ts_nanos``) and as a proper timestamp column (microsecond truncation,
matching DuckDB's cast-to-TIMESTAMP semantics).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ensure_nanos_conf(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize an events-shaped frame so ``ts`` is always TIMESTAMP (tz-aware
    micros). The driver has shipped the fixture with three physical encodings
    across rounds — int64 nanos (read as bigint under ``nanosAsLong``),
    ``timestamp[us]`` read as TIMESTAMP_NTZ, and plain TIMESTAMP — so every
    reader (batch and readStream) funnels through this one helper instead of
    sniffing types at call sites."""
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = (
            df.withColumnRenamed("ts", "ts_nanos")
            # integer `div`, NOT `/`: float division loses precision on
            # int64 nanos (2^53 mantissa < 1.7e18 epoch-nanos).
            .withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))
        )
    elif dtype == "timestamp_ntz":
        # Session timezone is pinned UTC (session.py), so NTZ -> TIMESTAMP is
        # a monotonic relabel of the same micros (the blessed orders/lineitem
        # cast); unix_micros / window arithmetic then work uniformly.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes the events ``ts`` column."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def parquet_reader(spark: SparkSession, sf_dir: str) -> Callable[[str], DataFrame]:
    return lambda name: read_sf_table(spark, sf_dir, name)


def parquet_writer(spark: SparkSession, out_dir: str) -> Callable[[str, DataFrame], int]:
    """Write each table under ``out_dir/<name>``; row count comes from a
    metadata-only count of the written files (no second full scan)."""

    def write(name: str, df: DataFrame) -> int:
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    return write
