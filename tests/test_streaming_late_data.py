"""Late-data / watermark contract for the streaming operators
(``streaming/events.py:80-102``).

Out-of-order events are fed through ``stream_tumbling_counts`` in three
checkpointed ``availableNow`` runs:

* run 1 establishes windows and advances the watermark;
* run 2 delivers a late-but-within-watermark event (must merge into its
  window), a TOO-late event below the checkpointed watermark (must be
  dropped), and a far event advancing the watermark;
* run 3 advances the watermark beyond everything, flushing remaining
  windows in append mode.

The final output therefore pins both halves of the contract: bounded
state (windows finalize exactly once, no duplicates across runs) and
late-data policy (≤ watermark dropped, > watermark merged).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

from simple_anonymizer_spark.streaming.events import (
    stream_tumbling_counts,
    write_stream,
)

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

DAY = datetime(2024, 3, 1, tzinfo=timezone.utc)


def ts(hour: float) -> datetime:
    return datetime(2024, 3, 1, int(hour), int((hour % 1) * 60),
                    tzinfo=timezone.utc)


def micros(hour: int) -> int:
    return int(ts(hour).timestamp()) * 1_000_000


@pytest.fixture()
def utc_session(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


def feed(spark, src_dir, rows):
    df = spark.createDataFrame(
        [(when, "click", 1.0) for when in rows], SCHEMA
    )
    df.coalesce(1).write.mode("append").parquet(str(src_dir))


def run_once(spark, src_dir, out_dir, ckpt_dir):
    stream = stream_tumbling_counts(
        spark, str(src_dir), window_len="1 hour", watermark="2 hours",
        schema=SCHEMA,
    )
    q = (
        write_stream(stream, str(out_dir), str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish"


def read_out(spark, out_dir):
    try:
        rows = spark.read.parquet(str(out_dir)).collect()
    except Exception:
        return {}
    return {r.window_start: r.n_events for r in rows}


def test_watermark_eviction_and_late_data(utc_session, tmp_path):
    spark = utc_session
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()

    # Run 1: events at 00:30, 01:30, 05:30. Final watermark = 05:30 - 2h
    # = 03:30 -> windows [00:00) and [01:00) finalize; [05:00) stays open.
    feed(spark, src, [ts(0.5), ts(1.5), ts(5.5)])
    run_once(spark, src, out, ckpt)
    emitted1 = read_out(spark, out)
    assert emitted1.get(micros(0)) == 1
    assert emitted1.get(micros(1)) == 1
    assert micros(5) not in emitted1  # still open state, not emitted

    # Run 2: 01:15 is BELOW the checkpointed watermark (03:30) -> dropped.
    # 04:30 and 05:45 are late but above it -> accepted. 09:00 advances the
    # watermark to 07:00.
    feed(spark, src, [ts(1.25), ts(4.5), ts(5.75), ts(9.0)])
    run_once(spark, src, out, ckpt)

    # Run 3: 20:00 pushes the watermark to 18:00 -> everything else flushes.
    feed(spark, src, [ts(20.0)])
    run_once(spark, src, out, ckpt)

    final = read_out(spark, out)
    assert final[micros(0)] == 1
    assert final[micros(1)] == 1      # too-late 01:15 did NOT merge
    assert final[micros(4)] == 1      # late-but-acceptable created window
    assert final[micros(5)] == 2      # 05:30 (run 1) + 05:45 (late, run 2)
    assert final[micros(9)] == 1
    assert micros(20) not in final    # newest window still open
    # finalized windows emitted exactly once across runs (append mode)
    all_rows = spark.read.parquet(str(out)).collect()
    assert len(all_rows) == len(final)


def test_batch_and_stream_agree_without_late_data(utc_session, tmp_path):
    """availableNow over a static directory == batch aggregation when no
    event is late (the unified-model invariant the round-1 suite pins at
    sf scale; re-pinned here on the synthetic fixture)."""
    from simple_anonymizer_spark.streaming.events import tumbling_counts

    spark = utc_session
    src, out, ckpt = tmp_path / "b_src", tmp_path / "b_out", tmp_path / "b_ckpt"
    src.mkdir()
    rows = [ts(h) for h in (0.1, 0.9, 1.1, 2.2, 2.8, 3.5)]
    feed(spark, src, rows)
    run_once(spark, src, out, ckpt)
    # flush remaining state with a far event, then compare the closed windows
    feed(spark, src, [ts(23.0)])
    run_once(spark, src, out, ckpt)

    batch = {
        r.window_start: r.n_events
        for r in tumbling_counts(spark.read.parquet(str(src))).collect()
    }
    streamed = read_out(spark, out)
    for w, n in streamed.items():
        assert batch[w] == n
    closed = {w: n for w, n in batch.items() if w != max(batch)}
    assert closed == {w: n for w, n in streamed.items()}


def test_stream_dedup_keeps_first_arrival(utc_session, tmp_path):
    """Across checkpointed runs, each payload is emitted exactly once;
    a duplicate arriving within the watermark is suppressed."""
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.streaming.events import stream_dedup

    spark = utc_session
    src, out, ckpt = tmp_path / "d_src", tmp_path / "d_out", tmp_path / "d_ckpt"
    src.mkdir()
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ])

    def feed_rows(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run():
        q = (
            stream_dedup(spark, str(src), watermark="2 hours", schema=schema)
            .select("ts", "payload")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(240)

    feed_rows([(ts(1.0), "A"), (ts(1.5), "B"), (ts(1.2), "A")])  # dup in batch
    run()
    feed_rows([(ts(2.0), "A"), (ts(2.5), "C")])  # dup across runs + new
    run()

    rows = spark.read.parquet(str(out)).collect()
    by_payload = {}
    for r in rows:
        by_payload.setdefault(r.payload, []).append(r.ts)
    assert sorted(by_payload) == ["A", "B", "C"]
    assert all(len(v) == 1 for v in by_payload.values()), by_payload
    # streamed dedup == batch distinct-on-payload row count
    batch = spark.read.parquet(str(src)).dropDuplicates(["payload"]).count()
    assert len(rows) == batch
