"""Iceberg rename/drop schema evolution (sources/iceberg.py):
metadata-only commits, name-mapping resolution of pre-rename files in
one scan, field-id-keyed pruning surviving renames, v2 interplay, and
the resurrection guards."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.sources import iceberg as I


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _docs(spark, lo, hi, text_col="text"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias(text_col),
    )


def _data_files(tdir):
    return sorted(glob.glob(os.path.join(tdir, "data", "*.parquet")))


def test_rename_reads_old_and_new_files(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 20), tdir)
    before = _data_files(tdir)
    sid = I.rename_iceberg_column(tdir, "text", "body")
    assert sid == 1
    # metadata-only: no data file touched, no new snapshot
    assert _data_files(tdir) == before
    assert len(I._load_metadata(tdir)["snapshots"]) == 1
    # post-rename appends write the NEW physical name
    I.append_iceberg(_docs(spark, 20, 30, "body"), tdir)
    got = I.read_iceberg(spark, tdir)
    assert got.columns == ["doc_id", "body"]
    assert sorted((r["doc_id"], r["body"]) for r in got.collect()) == [
        (i, f"text-{i}") for i in range(30)]
    # writers must use the new name now
    with pytest.raises(I.IcebergError):
        I.append_iceberg(_docs(spark, 30, 31, "text"), tdir)


def test_rename_preserves_fieldid_bounds_pruning(spark, tdir):
    """Bounds are field-id-keyed, so predicates on the NEW name must
    still prune files through manifests written under the OLD name."""
    I.create_iceberg(_docs(spark, 0, 50), tdir)
    I.append_iceberg(_docs(spark, 50, 100), tdir)
    n_all = len(I.iceberg_plan_files(tdir))
    I.rename_iceberg_column(tdir, "doc_id", "document_id")
    pruned = I.iceberg_plan_files(
        tdir, predicates=[("document_id", ">=", 90)])
    assert 0 < len(pruned) < n_all
    got = I.read_iceberg(spark, tdir,
                         predicates=[("document_id", ">=", 90)])
    assert sorted(r["document_id"] for r in got.collect()) == list(
        range(90, 100))


def test_rename_records_name_mapping(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 5), tdir)
    I.rename_iceberg_column(tdir, "text", "body")
    meta = I._load_metadata(tdir)
    mapping = json.loads(
        meta["properties"]["schema.name-mapping.default"])
    assert {"field-id": 2, "names": ["text", "body"]} in mapping


def test_rename_guards(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 5), tdir)
    with pytest.raises(I.IcebergError):
        I.rename_iceberg_column(tdir, "nope", "x")
    with pytest.raises(I.IcebergError):
        I.rename_iceberg_column(tdir, "text", "doc_id")  # exists
    I.rename_iceberg_column(tdir, "text", "body")
    # 'text' historically named field 2 — field 1 cannot take it
    with pytest.raises(I.IcebergError):
        I.rename_iceberg_column(tdir, "doc_id", "text")
    # ...but renaming field 2 BACK to its own old name is fine
    I.rename_iceberg_column(tdir, "body", "text")
    assert I.read_iceberg(spark, tdir).columns == ["doc_id", "text"]
    # add_iceberg_column refuses recycled historical names
    with pytest.raises(I.IcebergError):
        I.add_iceberg_column(tdir, "body", "string")


def test_drop_column_and_time_travel(spark, tdir):
    s1 = I.create_iceberg(_docs(spark, 0, 10), tdir)
    I.drop_iceberg_column(tdir, "text")
    got = I.read_iceberg(spark, tdir)
    assert got.columns == ["doc_id"]
    assert got.count() == 10
    # snapshots before the drop keep their schema: time travel sees it
    old = I.read_iceberg(spark, tdir, snapshot_id=s1)
    assert old.columns == ["doc_id", "text"]
    assert old.where(F.col("text") == "text-3").count() == 1
    # writers must stop supplying the column
    with pytest.raises(I.IcebergError):
        I.append_iceberg(_docs(spark, 10, 12), tdir)
    I.append_iceberg(spark.range(10, 12).select(
        F.col("id").alias("doc_id")), tdir)
    assert I.read_iceberg(spark, tdir).count() == 12
    # the name can never come back under a new field-id
    with pytest.raises(I.IcebergError):
        I.add_iceberg_column(tdir, "text", "string")
    # guards: last column, partition source, unknown
    with pytest.raises(I.IcebergError):
        I.drop_iceberg_column(tdir, "nope")
    with pytest.raises(I.IcebergError):
        I.drop_iceberg_column(tdir, "doc_id")  # only column left


def test_drop_refuses_partition_source(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 5), tdir,
                     partition_by=[("doc_id", "bucket[2]")])
    with pytest.raises(I.IcebergError):
        I.drop_iceberg_column(tdir, "doc_id")


def test_rename_with_v2_position_deletes(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 20), tdir, format_version=2)
    I.delete_iceberg_rows(spark, tdir, "doc_id % 4 = 0")
    I.rename_iceberg_column(tdir, "text", "body")
    # deletes committed before AND after the rename both apply
    I.delete_iceberg_rows(spark, tdir, "body = 'text-7'")
    got = I.read_iceberg(spark, tdir)
    assert sorted(r["doc_id"] for r in got.collect()) == [
        i for i in range(20) if i % 4 != 0 and i != 7]


def test_rename_with_equality_deletes_both_orders(spark, tdir):
    """Equality-delete key columns resolve through the same name history
    as the data scan — whether the delete predates the rename or not."""
    I.create_iceberg(_docs(spark, 0, 10), tdir, format_version=2)
    keys = spark.createDataFrame([(3,), (4,)], "doc_id long")
    I.delete_iceberg_keys(spark, tdir, keys)
    I.rename_iceberg_column(tdir, "doc_id", "document_id")
    got = I.read_iceberg(spark, tdir)
    assert sorted(r["document_id"] for r in got.collect()) == [
        0, 1, 2, 5, 6, 7, 8, 9]
    # post-rename delete under the new key name composes
    I.delete_iceberg_keys(
        spark, tdir, spark.createDataFrame([(9,)], "document_id long"))
    got = I.read_iceberg(spark, tdir)
    assert sorted(r["document_id"] for r in got.collect()) == [
        0, 1, 2, 5, 6, 7, 8]


def test_rename_then_compact_bakes_names_then_delta(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 10), tdir, format_version=2)
    I.rename_iceberg_column(tdir, "text", "body")
    # Delta resolves by physical name: refused until compaction
    with pytest.raises(I.IcebergError):
        I.migrate_iceberg_to_delta(tdir)
    I.rewrite_iceberg_files(spark, tdir)
    # compaction bakes current names into the live files, flipping the
    # reads back to the plain single-schema scan
    plan = I.read_iceberg(spark, tdir)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "coalesce" not in plan
    I.migrate_iceberg_to_delta(tdir)
    from simple_anonymizer_spark.sources.deltalog import read_deltalog
    got = read_deltalog(spark, tdir)
    assert sorted(got.columns) == ["body", "doc_id"]
    assert got.count() == 10


def test_unrenamed_tables_keep_the_single_schema_scan(spark, tdir):
    """The fast path must stay byte-identical when no rename ever
    happened: no coalesce projection, no helper columns in the plan."""
    I.create_iceberg(_docs(spark, 0, 10), tdir)
    plan = I.read_iceberg(spark, tdir)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "coalesce" not in plan and "__sa_fp" not in plan
