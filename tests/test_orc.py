"""ORC source/sink conformance (sources/orc.py): DuckDB cannot read ORC,
so parity rests on round trips against the Parquet fixtures — same rows
both directions — plus the optimizer contract (pushdown + pruning) that
justifies offering the format at all."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.sources.orc import orc_reader, orc_writer
from simple_anonymizer_spark.sources.parquet import read_sf_table


@pytest.fixture(scope="module")
def orc_dir(spark, sf_dir):
    with tempfile.TemporaryDirectory() as d:
        write = orc_writer(spark, d)
        for name in ("customer", "orders", "events"):
            n = write(name, read_sf_table(spark, sf_dir, name))
            assert n > 0
        yield d


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ["customer", "orders"])
def test_orc_roundtrip_matches_parquet(spark, sf_dir, orc_dir, name):
    src = read_sf_table(spark, sf_dir, name)
    back = orc_reader(spark, orc_dir)(name)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_orc_events_ts_normalized(spark, sf_dir, orc_dir):
    """events written after normalization reads back with ts TIMESTAMP
    and identical micros — the ns-fixture drift guard extends to ORC."""
    src = read_sf_table(spark, sf_dir, "events")
    back = orc_reader(spark, orc_dir)("events")
    a = _sorted_rows(src.select("event_id", F.unix_micros("ts")))
    b = _sorted_rows(back.select("event_id", F.unix_micros("ts")))
    assert a == b and len(a) > 0


def test_orc_scan_pushes_filters_and_prunes_columns(spark, orc_dir):
    """The reason ORC is a first-class source: filters reach the scan and
    the projection prunes — same optimizer contract as Parquet."""
    df = (orc_reader(spark, orc_dir)("orders")
          .where(F.col("o_orderkey") < 100)
          .select("o_orderkey", "o_totalprice"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split(
        "PushedFilters")[1][:120]
    read_schema = plan.split("ReadSchema")[1][:160]
    assert "o_totalprice" in read_schema and "o_custkey" not in read_schema


def test_orc_parquet_cross_copy(spark, sf_dir, orc_dir):
    """Format conversion both directions preserves rows: ORC -> Parquet
    -> ORC on the customer table (the copier's reader/writer callables
    compose across formats)."""
    import os

    back = orc_reader(spark, orc_dir)("customer")
    with tempfile.TemporaryDirectory() as d:
        back.write.mode("overwrite").parquet(os.path.join(d, "c"))
        again = spark.read.parquet(os.path.join(d, "c"))
        w = orc_writer(spark, d)
        n = w("c2", again)
        final = spark.read.orc(os.path.join(d, "c2"))
        assert n == back.count()
        assert _sorted_rows(final) == _sorted_rows(back)


def test_compact_parquet_merges_fragments_atomically(spark, sf_dir, tmp_path):
    """A fragmented table (64 tiny files — the streaming-append shape)
    compacts to the computed file count with identical rows; sort_by
    clusters rows so file-level min/max ranges are disjoint."""
    from simple_anonymizer_spark.sources.parquet import compact_parquet

    src = read_sf_table(spark, sf_dir, "orders")
    frag = str(tmp_path / "frag")
    src.repartition(64).write.parquet(frag)

    before, after, rows = compact_parquet(spark, frag,
                                          target_file_bytes=1 << 40)
    assert before >= 64 and after == 1 and rows == src.count()
    back = spark.read.parquet(frag)
    assert _sorted_rows(back) == _sorted_rows(src)

    # sorted variant: per-file orderkey ranges must not overlap
    frag2 = str(tmp_path / "frag2")
    src.repartition(16).write.parquet(frag2)
    compact_parquet(spark, frag2, target_file_bytes=30_000,
                    sort_by=["o_orderkey"])
    per_file = (spark.read.parquet(frag2)
                .groupBy(F.input_file_name().alias("f"))
                .agg(F.min("o_orderkey").alias("lo"),
                     F.max("o_orderkey").alias("hi"))
                .collect())
    spans = sorted((r.lo, r.hi) for r in per_file)
    assert len(spans) >= 2
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


def test_checksum_invariant_under_compaction_and_format(spark, sf_dir, tmp_path):
    """The migration-certification loop: (n_rows, checksum) must be
    identical across a fragmented write, compaction, and a Parquet->ORC
    conversion — and must CHANGE when a row actually changes."""
    from simple_anonymizer_spark.operators.quality_audit import table_checksum
    from simple_anonymizer_spark.sources.parquet import compact_parquet

    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    src = read_sf_table(spark, sf_dir, "orders").select(*cols)
    base = table_checksum(src, cols).collect()[0]

    frag = str(tmp_path / "ck")
    src.repartition(32).write.parquet(frag)
    assert table_checksum(spark.read.parquet(frag), cols).collect()[0] == base
    compact_parquet(spark, frag, target_file_bytes=1 << 40)
    assert table_checksum(spark.read.parquet(frag), cols).collect()[0] == base

    orc_path = str(tmp_path / "ck_orc")
    spark.read.parquet(frag).write.orc(orc_path)
    assert table_checksum(spark.read.orc(orc_path), cols).collect()[0] == base

    mutated = src.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 1, F.lit("Z"))
        .otherwise(F.col("o_orderstatus")),
    )
    assert table_checksum(mutated, cols).collect()[0] != base
