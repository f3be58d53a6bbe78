"""ORC source/sink: the second columnar interchange format next to
Parquet (``sources/parquet.py``), for deployments whose lake standard is
ORC (Hive-lineage warehouses). Spark's native ORC reader/writer carries
the same optimizer contract as Parquet — predicate pushdown, column
pruning, vectorized scan — so the copier's reader/writer callables work
identically; the conformance tests pin PushedFilters/ReadSchema on ORC
scans to keep that claim honest.

DuckDB cannot read ORC, so the oracle gate takes the avro/warc
roundtrip shape instead: ``orc_roundtrip_docs`` writes documents to ORC
and reads them back while the oracle is the source table itself — the
driver's value hash covers the full write/read cycle. Byte-parity round
trips against the Parquet fixtures live in tests/test_orc.py.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .parquet import normalize_events_ts


def read_orc_table(spark: SparkSession, path: str,
                   is_events: bool = False) -> DataFrame:
    """Read one ORC table; ``is_events`` applies the same ``ts``
    normalization contract as the Parquet reader (ORC stores our written
    events with proper timestamps, but a bigint-nanos column written by
    an external producer normalizes identically)."""
    df = spark.read.orc(path)
    if is_events:
        df = normalize_events_ts(df)
    return df


def orc_reader(spark: SparkSession, base_dir: str) -> Callable[[str], DataFrame]:
    return lambda name: read_orc_table(
        spark, os.path.join(base_dir, name), is_events=(name == "events")
    )


def orc_writer(spark: SparkSession, out_dir: str,
               compression: str = "zstd") -> Callable[[str, DataFrame], int]:
    """Write each table under ``out_dir/<name>``; row count from a
    metadata-only count of the written files (no second full scan).
    zstd default: the modern size/speed point Spark ships codecs for."""

    def write(name: str, df: DataFrame) -> int:
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").option("compression", compression).orc(path)
        return spark.read.orc(path).count()

    return write
