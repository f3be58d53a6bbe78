"""Hive-partitioned layout (sources/parquet.write_partitioned): content
parity, directory structure, planning-time partition pruning, and the
small-files bound."""

import io
import contextlib
import os

from pyspark.sql import functions as F

from simple_anonymizer_spark.sources.parquet import (
    read_partitioned, read_sf_table, write_partitioned,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_round_trip_and_pruning(spark, sf_dir, tmp_path):
    d = read_sf_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(d, path, ["lang"])

    # hive directory layout, one file per partition value
    langs = sorted(e[5:] for e in os.listdir(path) if e.startswith("lang="))
    assert langs == sorted(r["lang"] for r in d.select("lang").distinct().collect())

    back = read_partitioned(spark, path)
    assert back.count() == d.count()
    a = sorted((r["doc_id"], r["lang"]) for r in d.select("doc_id", "lang").collect())
    b = sorted((r["doc_id"], r["lang"]) for r in back.select("doc_id", "lang").collect())
    assert a == b

    # predicate on the partition key prunes at PLANNING time: the scan
    # advertises a PartitionFilters entry and reads only that directory
    filtered = back.where(F.col("lang") == "en")
    plan = _plan(filtered.select("doc_id"))
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    n_en = d.where(F.col("lang") == "en").count()
    assert filtered.count() == n_en


def test_partitioned_write_bounds_files(spark, sf_dir, tmp_path):
    d = read_sf_table(spark, sf_dir, "documents").repartition(16)
    path = str(tmp_path / "docs_files")
    write_partitioned(d, path, ["lang"], max_files_per_partition=2)
    for entry in os.listdir(path):
        if not entry.startswith("lang="):
            continue
        files = [f for f in os.listdir(os.path.join(path, entry))
                 if f.endswith(".parquet")]
        assert 1 <= len(files) <= 2, (entry, files)
    # content still intact
    assert read_partitioned(spark, path).count() == d.count()
