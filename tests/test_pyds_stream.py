"""Streaming Python Data Source (sources/pyds.DbApiSimpleStreamReader):
spark.readStream.format("fakepg") must drain a table incrementally by
high-watermark — first availableNow batch sees the backlog, a second
run against the same checkpoint sees ONLY rows inserted in between, and
the union equals the table (streamed == batch)."""

from __future__ import annotations

import pytest

from simple_anonymizer_spark.sources.pyds import FakePGDataSource

from test_pg_integration import source_db  # noqa: F401 (fixture)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(FakePGDataSource)
    return spark


def _drain(spark, db, out_dir, checkpoint, **opts):
    reader = (
        spark.readStream.format("fakepg")
        .option("path", db.path)
        .option("table", "orders")
        .option("offset_column", "id")
    )
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.schema(
        spark.read.format("fakepg").option("path", db.path)
        .option("table", "orders").load().schema
    ).parquet(str(out_dir))


def _insert_order(db, oid, uid):
    conn = db.connect_factory()()
    try:
        cur = conn.cursor()
        cur.execute(
            "INSERT INTO orders (id, user_id, total, status) "
            f"VALUES ({oid}, {uid}, 10.00, 'pending')"
        )
        conn.commit()
    finally:
        conn.close()


def test_stream_drains_backlog_then_only_new_rows(
    registered, source_db, tmp_path
):
    spark = registered
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    batch = (
        spark.read.format("fakepg").option("path", source_db.path)
        .option("table", "orders").load()
    )
    n0 = batch.count()

    got = _drain(spark, source_db, out, ckpt)
    assert got.count() == n0  # backlog = first micro-batch

    _insert_order(source_db, 9001, 1)
    _insert_order(source_db, 9002, 2)
    got = _drain(spark, source_db, out, ckpt)
    assert got.count() == n0 + 2  # same checkpoint -> only the delta

    streamed = sorted(map(tuple, got.collect()))
    table = sorted(map(tuple, (
        spark.read.format("fakepg").option("path", source_db.path)
        .option("table", "orders").load().collect()
    )))
    assert streamed == table  # streamed == batch, no dup, no loss


def test_stream_start_offset_skips_backfill(registered, source_db, tmp_path):
    spark = registered
    batch = (
        spark.read.format("fakepg").option("path", source_db.path)
        .option("table", "orders").load()
    )
    max_id = batch.agg({"id": "max"}).first()[0]
    out, ckpt = tmp_path / "out2", tmp_path / "ckpt2"
    got = _drain(spark, source_db, out, ckpt, start_offset=max_id)
    assert got.count() == 0  # history handed off to the batch path
    _insert_order(source_db, 9100, 1)
    got = _drain(spark, source_db, out, ckpt, start_offset=max_id)
    assert [r["id"] for r in got.collect()] == [9100]
