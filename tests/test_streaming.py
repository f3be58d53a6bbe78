"""Structured Streaming: the tumbling aggregation must produce identical
results via readStream/writeStream (availableNow) and via batch mode."""

from __future__ import annotations

import pytest

from simple_anonymizer_spark.sources.parquet import read_sf_table
from simple_anonymizer_spark.streaming import events as SE


def test_stream_tumbling_matches_batch(spark, sf_dir, tmp_path):
    batch_events = read_sf_table(spark, sf_dir, "events")
    expected = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in SE.tumbling_counts(batch_events).collect()
    }

    # File-stream sources read directories.
    import shutil

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = SE.stream_tumbling_counts(spark, str(src_dir), schema=raw_schema)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        SE.write_stream(stream, out, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.read.parquet(out).collect()
    }
    # Append mode with watermark emits only finalized windows; every emitted
    # window must match batch, and nearly all windows must be emitted (the
    # tail window(s) within the watermark may be withheld).
    assert got, "stream produced no output"
    for k, v in got.items():
        assert expected[k] == v, f"window {k}: stream {v} != batch {expected[k]}"
    assert len(got) >= len(expected) - 4


def test_sessionize_gap_semantics(spark):
    """Pin the gap rule the DuckDB oracle mirrors: adjacent session windows
    MERGE, so an event at exactly last+gap stays in the session; only a
    strictly greater gap starts a new one."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=29, seconds=59)),   # same session
        (1, base + dt.timedelta(minutes=59, seconds=59)),   # still same (gap < 30m)
        (1, base + dt.timedelta(minutes=95)),               # gap 35m01s -> new
        (2, base),
        (3, base),
        (3, base + dt.timedelta(minutes=30)),               # EXACT gap -> merges
        (4, base),
        (4, base + dt.timedelta(minutes=30, microseconds=1)),  # just over -> splits
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r.user_id, r.n_events) for r in SE.sessionize(df).collect()
    )
    assert got == [(1, 1), (1, 3), (2, 1), (3, 2), (4, 1), (4, 1)]


def test_tumbling_hour_boundary(spark):
    """Event at exactly the hour boundary belongs to the NEW window (floor
    semantics — matches DuckDB time_bucket)."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 0, 59, 59), "a", 1.0),
        (dt.datetime(2024, 1, 1, 1, 0, 0), "a", 1.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = sorted(
        (r.window_start, r.n_events) for r in SE.tumbling_counts(df).collect()
    )
    # window starts are epoch micros in session tz; assert two distinct
    # windows of one event each rather than absolute values.
    assert [n for _, n in got] == [1, 1]
    assert got[1][0] - got[0][0] == 3_600_000_000


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """The stream-stream interval join (both sides watermarked) must emit
    exactly the batch join's pairs for an availableNow replay — inner
    joins emit as matches arrive, so no tail-window withholding applies."""
    import shutil

    batch_events = read_sf_table(spark, sf_dir, "events")
    expected = {
        (r.user_id, r.left_id, r.right_id, r.lag_us)
        for r in SE.interval_join(batch_events).collect()
    }

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    stream = SE.stream_interval_join(spark, str(src_dir), schema=raw_schema)
    assert stream.isStreaming
    out = str(tmp_path / "out")
    q = (
        SE.write_stream(stream, out, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r.user_id, r.left_id, r.right_id, r.lag_us)
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected


def test_streaming_anonymization_equals_batch(spark, sf_dir, tmp_path):
    """The anonymizers are stateless codegen expressions, so a streaming
    pass over the same files must produce byte-identical output to the
    batch pass — anonymize-on-ingest is just a readStream swap."""
    import shutil
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.functions import anonymizers as A

    src = tmp_path / "cust_src"
    src.mkdir()
    batch_df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    schema = batch_df.schema
    # Streaming file sources list FILES: copy the part files in.
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "staged"))
    for f in (tmp_path / "staged").glob("part-*.parquet"):
        shutil.copy(f, src / f.name)

    def anonymize(df):
        return df.select(
            "c_custkey",
            A.stable_hash("c_name").alias("h"),
            A.full_name("c_name").alias("nm"),
            A.email("c_name").alias("em"),
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        anonymize(spark.readStream.schema(schema).parquet(str(src)))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    streamed = sorted(map(tuple, spark.read.parquet(out).collect()))
    batch = sorted(map(tuple, anonymize(batch_df).collect()))
    assert streamed == batch and len(streamed) > 0


def test_stream_static_join_enrichment_equals_batch(spark, sf_dir, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension (the broadcast-enrichment shape) must equal the batch
    join over the same files."""
    import shutil
    from pyspark.sql import functions as F

    src = tmp_path / "ev_src"
    src.mkdir()
    batch_ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = batch_ev.schema
    batch_ev.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "staged"))
    for f in (tmp_path / "staged").glob("part-*.parquet"):
        shutil.copy(f, src / f.name)
    dim = spark.range(0, 1000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).cast("string").alias("cohort"),
    )

    def enrich(ev):
        return (
            ev.select("event_id", "user_id", "event_type")
            .join(F.broadcast(dim), "user_id")
            .groupBy("cohort", "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        enrich(spark.readStream.schema(schema).parquet(str(src)))
        .writeStream.outputMode("complete")
        .format("memory").queryName("enriched_counts")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    streamed = sorted(map(tuple, spark.sql(
        "SELECT * FROM enriched_counts").collect()))
    batch = sorted(map(tuple, enrich(batch_ev).collect()))
    assert streamed == batch and len(streamed) > 0
