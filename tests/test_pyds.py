"""Spark 4 Python Data Source over the fake-PG layer (sources/pyds.py):
spark.read.format("fakepg") must match the driver-side dbapi bridge,
honor range partitioning with executor-side per-partition connections,
push WHERE text, and pin snapshots against concurrent writers."""

from __future__ import annotations

import pytest

from simple_anonymizer_spark.sources.dbapi import dbapi_reader
from simple_anonymizer_spark.sources.pyds import FakePGDataSource

from test_pg_integration import source_db  # noqa: F401 (fixture)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(FakePGDataSource)
    return spark


def _read(spark, db, table, **opts):
    r = (
        spark.read.format("fakepg")
        .option("path", db.path)
        .option("table", table)
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_full_scan_matches_dbapi_bridge(registered, source_db):
    import simple_anonymizer_spark.sources.fakepg as fakepg

    spark = registered
    df = _read(spark, source_db, "users")
    got = sorted(tuple(r) for r in df.collect())
    bridge = dbapi_reader(spark, lambda: fakepg.connect(source_db.path))
    exp = sorted(tuple(r) for r in bridge("users").collect())
    assert got == exp
    assert df.columns == ["id", "first_name", "last_name", "email"]


def test_partitioned_scan_same_rows_more_tasks(registered, source_db):
    spark = registered
    df = _read(
        spark, source_db, "orders",
        partition_column="id", lower=1, upper=15, num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    single = _read(spark, source_db, "orders")
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, single.collect()))


def test_where_pushdown(registered, source_db):
    df = _read(registered, source_db, "orders", where="status = 'completed'")
    rows = df.collect()
    assert rows and all(r.status == "completed" for r in rows)


def test_snapshot_pins_out_concurrent_writer(registered, source_db):
    import simple_anonymizer_spark.sources.fakepg as fakepg

    conn = fakepg.connect(source_db.path)
    cur = conn.cursor()
    cur.execute("SELECT pg_export_snapshot()")
    snap = cur.fetchall()[0][0]

    writer = fakepg.connect(source_db.path)
    wc = writer.cursor()
    wc.execute(
        "INSERT INTO \"public\".\"users\" (\"id\", \"first_name\", \"last_name\", \"email\") "
        "VALUES (99, 'Late', 'Writer', 'late@x.com')"
    )
    writer.commit()

    pinned = _read(registered, source_db, "users", snapshot_id=snap)
    assert sorted(r.id for r in pinned.collect()) == list(range(1, 11))
    unpinned = _read(registered, source_db, "users")
    assert 99 in {r.id for r in unpinned.collect()}
    conn.close()
    writer.close()


def test_unknown_table_raises(registered, source_db):
    with pytest.raises(Exception, match="unknown table"):
        _read(registered, source_db, "nope").schema
