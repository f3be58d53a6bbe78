"""JSONL / CSV interchange source and sink.

Parquet is the engine's canonical storage (typed, compressed, predicate
pushdown); these readers cover the interchange boundary — corpus dumps,
exports to downstream tools, hand-authored fixtures. Two rules keep
them sane at scale:

* **Schema is explicit, always.** Inference scans the whole input once
  before the real read (2x I/O at 100 TB) and silently types partial
  samples; every reader here REQUIRES a schema and never infers.
* **Corrupt input is data, not an exception.** Parsing runs PERMISSIVE
  with a captured corrupt-record column, so a bad line in a
  billion-line dump lands in an auditable column instead of killing the
  job (or silently vanishing as DROPMALFORMED would).

Implementation note: rows parse via ``text`` + ``from_json`` /
``from_csv`` rather than the raw json/csv sources — Spark forbids
queries that project ONLY the corrupt column from a raw file source
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
quarantine path is exactly that query. Line-delimited text is
block-splittable, so the parse parallelizes across executors the same
as the native source, and nested-field pruning still reaches the
``from_json`` expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )


_PARSE_OPTS = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Read line-delimited JSON under an explicit schema. Malformed
    lines surface with their raw text in ``_corrupt_record`` and NULL
    data columns; well-formed rows carry NULL there. Blank lines are
    skipped (matching the native json source)."""
    full = _with_corrupt(schema)
    raw = spark.read.text(path).where(F.length(F.trim(F.col("value"))) > 0)
    return raw.select(
        F.from_json(F.col("value"), full, _PARSE_OPTS).alias("__r")
    ).select("__r.*")


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Read CSV under an explicit schema (no inference scan). With
    ``header=True`` lines equal to the schema's header are dropped
    (each written part file carries one). Malformed rows surface in
    ``_corrupt_record`` like the JSONL reader.

    Known limitation: the header drop is TEXTUAL — a legitimate data
    line that is byte-identical to the header (possible only when every
    column is a string and each value equals its own column name) is
    also dropped. Positional per-file header tracking would break the
    splittable text-scan shape this reader exists for; if that edge
    matters, read with ``header=False`` and filter the header rows by
    any non-string column failing its cast (they land in
    ``_corrupt_record``)."""
    full = _with_corrupt(schema)
    raw = spark.read.text(path).where(F.length(F.col("value")) > 0)
    if header:
        header_line = delimiter.join(f.name for f in schema.fields)
        raw = raw.where(F.col("value") != F.lit(header_line))
    opts = dict(_PARSE_OPTS, sep=delimiter)
    return raw.select(
        F.from_csv(F.col("value"), full.simpleString(), opts).alias("__r")
    ).select("__r.*")


def write_csv(
    df: DataFrame, path: str, header: bool = True, delimiter: str = ","
) -> None:
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def valid_rows(df: DataFrame) -> DataFrame:
    """Drop the corrupt-record column, keeping only clean rows."""
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_rows(df: DataFrame) -> DataFrame:
    """The quarantine side: raw text of every malformed input line."""
    return df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
