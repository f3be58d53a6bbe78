"""Structured-Streaming operators over the events stream.

Each aggregation is defined once as a DataFrame transformation usable in
BOTH batch and streaming mode (Spark's unified model): the driver harness
runs them batch-side against the DuckDB oracle, while ``stream_*`` helpers
wire the same logic into ``readStream``/``writeStream`` with watermarks
for production use. ``ts`` arrives as epoch-nanos (see sources/parquet.py);
windows are computed on the derived microsecond timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import DataStreamWriter

from simple_anonymizer_spark.sources.parquet import normalize_events_ts


def tumbling_counts(
    events: DataFrame, window_len: str = "1 hour"
) -> DataFrame:
    """Tumbling-window count + decimal-exact value sum per event_type.
    Output: ``window_start`` (epoch micros, long), ``event_type``,
    ``n_events``, ``sum_value``."""
    return (
        events.groupBy(
            F.window(F.col("ts"), window_len).alias("__w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("__sum_dec"),
        )
        .select(
            F.unix_micros(F.col("__w.start")).alias("window_start"),
            "event_type",
            "n_events",
            F.col("__sum_dec").cast("double").alias("sum_value"),
        )
    )


def sliding_user_activity(
    events: DataFrame, window_len: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window distinct-user and event counts.
    Output: ``window_start`` (epoch micros), ``n_users``, ``n_events``."""
    return (
        events.groupBy(F.window(F.col("ts"), window_len, slide).alias("__w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_micros(F.col("__w.start")).alias("window_start"),
            "n_users",
            "n_events",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based). Output: ``user_id``,
    ``session_start`` (epoch micros), ``n_events``."""
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("__w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.unix_micros(F.col("__w.start")).alias("session_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Streaming wiring (same logic, readStream/writeStream + watermark)
# ---------------------------------------------------------------------------


def stream_tumbling_counts(
    spark, source_path: str, window_len: str = "1 hour",
    watermark: str = "2 hours", schema=None,
) -> DataFrame:
    """The tumbling aggregation as a late-data-tolerant stream. Watermark
    bounds state: windows older than the watermark are finalized and
    evicted."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = normalize_events_ts(reader.parquet(source_path))
    return tumbling_counts(raw.withWatermark("ts", watermark), window_len)


def write_stream(df: DataFrame, path: str, checkpoint: str) -> DataStreamWriter:
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )


def stream_dedup(
    spark, source_path: str, key_cols: list[str] | None = None,
    watermark: str = "2 hours", schema=None,
) -> DataFrame:
    """Streaming exact dedup: emit each key's FIRST arrival, drop repeats.
    ``dropDuplicates`` keeps per-key state in the state store; the
    watermark bounds that state — a key older than the watermark is
    evicted and a very-late duplicate would pass, which is the documented
    state/recall trade (the batch path, ``dedup.exact_duplicates``, is
    the unbounded-memory exact answer). Keys default to a content hash
    over every non-timestamp column, so identical payloads dedup
    regardless of arrival time."""
    from pyspark.sql import functions as F

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = normalize_events_ts(reader.parquet(source_path))
    if key_cols is None:
        content = [c for c in raw.columns if c not in ("ts", "ts_nanos")]
        raw = raw.withColumn(
            "__content_hash", F.md5(F.to_json(F.struct(*content)))
        )
        key_cols = ["__content_hash"]
    return raw.withWatermark("ts", watermark).dropDuplicates(key_cols)


def interval_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    max_lag: str = "1 hour",
) -> DataFrame:
    """Stream-stream style interval join, defined once for batch AND
    streaming: every ``right_type`` event joined to each same-user
    ``left_type`` event it follows within ``max_lag``.

    The join is an equi-join on user_id with a time-range residual —
    exactly the condition Spark's stream-stream join requires to bound
    state (both sides watermarked in ``stream_interval_join``). Output:
    ``user_id, left_id, right_id, lag_us`` with the exact microsecond lag.
    """
    lhs = (
        events.where(F.col("event_type") == left_type)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("__lts"),
        )
    )
    rhs = (
        events.where(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("__ruid"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("__rts"),
        )
    )
    joined = lhs.join(
        rhs,
        (F.col("user_id") == F.col("__ruid"))
        & (F.col("__rts") >= F.col("__lts"))
        & (F.col("__rts") <= F.col("__lts") + F.expr(f"INTERVAL {max_lag}")),
    )
    return joined.select(
        "user_id",
        "left_id",
        "right_id",
        (F.unix_micros(F.col("__rts")) - F.unix_micros(F.col("__lts")))
        .alias("lag_us"),
    )


def stream_interval_join(
    spark, source_path: str,
    left_type: str = "click", right_type: str = "purchase",
    max_lag: str = "1 hour", watermark: str = "2 hours", schema=None,
) -> DataFrame:
    """The interval join as a true stream-stream join: both sides read
    from the stream, both watermarked, so the state store can evict a
    left event once the right watermark passes ``left.ts + max_lag``."""
    def read_side():
        reader = spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        raw = normalize_events_ts(reader.parquet(source_path))
        return raw.withWatermark("ts", watermark)

    return interval_join(read_side(), left_type, right_type, max_lag)
