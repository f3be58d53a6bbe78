"""REST-catalog-shaped metadata API (sources/icecatalog.py): the spec's
response shapes over the Hadoop layout — namespaces, table lifecycle,
metadata-location resolution, and interop with the native tier."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.sources import iceberg as I
from simple_anonymizer_spark.sources.icecatalog import RestShapedCatalog


@pytest.fixture()
def cat(tmp_path):
    return RestShapedCatalog(str(tmp_path / "wh"))


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_config_and_namespace_lifecycle(cat):
    assert cat.config()["overrides"]["warehouse"] == cat.warehouse
    got = cat.create_namespace(["analytics"], {"owner": "etl"})
    assert got == {"namespace": ["analytics"],
                   "properties": {"owner": "etl"}}
    cat.create_namespace(["analytics", "raw"])
    assert cat.list_namespaces() == {"namespaces": [["analytics"]]}
    assert cat.list_namespaces(["analytics"]) == {
        "namespaces": [["analytics", "raw"]]}
    assert cat.namespace_exists(["analytics", "raw"])
    assert not cat.namespace_exists(["nope"])
    meta = cat.load_namespace_metadata(["analytics"])
    assert meta["properties"] == {"owner": "etl"}
    upd = cat.update_namespace_properties(
        ["analytics"], removals=["owner", "ghost"],
        updates={"retention": "30d"})
    assert upd == {"removed": ["owner"], "updated": ["retention"],
                   "missing": ["ghost"]}
    # non-empty namespaces refuse to drop (the spec's 409)
    with pytest.raises(I.IcebergError):
        cat.drop_namespace(["analytics"])
    cat.drop_namespace(["analytics", "raw"])
    cat.drop_namespace(["analytics"])
    with pytest.raises(I.IcebergError):
        cat.load_namespace_metadata(["analytics"])
    with pytest.raises(I.IcebergError):
        cat.create_namespace(["../escape"])


def test_table_lifecycle_shapes(spark, cat):
    cat.create_namespace(["db"])
    df = _docs(spark, 0, 20)
    res = cat.create_table(["db"], "docs", df,
                           partition_by=[("doc_id", "bucket[2]")])
    # LoadTableResult shape: metadata-location + full metadata + config
    assert set(res) == {"metadata-location", "metadata", "config"}
    assert res["metadata-location"].endswith("v1.metadata.json")
    assert os.path.isfile(res["metadata-location"])
    assert res["metadata"]["format-version"] == 1
    [pf] = res["metadata"]["partition-specs"][0]["fields"]
    assert pf["transform"] == "bucket[2]"
    # the metadata payload is byte-equal to the file at the location
    with open(res["metadata-location"]) as fh:
        assert json.load(fh) == res["metadata"]
    assert cat.list_tables(["db"]) == {"identifiers": [
        {"namespace": ["db"], "name": "docs"}]}
    assert cat.table_exists(["db"], "docs")
    # a table is not a namespace and vice versa
    assert cat.list_namespaces(["db"]) == {"namespaces": []}
    with pytest.raises(I.IcebergError):
        cat.create_table(["db"], "docs", df)
    with pytest.raises(I.IcebergError):
        cat.create_table(["nope"], "t", df)


def test_catalog_and_native_tier_interoperate(spark, cat):
    """Tables served by the catalog ARE the native tier's tables: reads
    resolve through the catalog, commits through the native writers show
    up in the catalog's metadata-location immediately."""
    cat.create_namespace(["db"])
    df = _docs(spark, 0, 10)
    res = cat.create_table(["db"], "docs", df, format_version=2)
    tdir = os.path.dirname(os.path.dirname(res["metadata-location"]))
    I.append_iceberg(_docs(spark, 10, 15), tdir)
    I.delete_iceberg_rows(spark, tdir, "doc_id % 7 = 0")
    res2 = cat.load_table(["db"], "docs")
    assert res2["metadata-location"].endswith("v3.metadata.json")
    assert len(res2["metadata"]["snapshots"]) == 3
    got = cat.read(spark, ["db"], "docs")
    assert sorted(r["doc_id"] for r in got.collect()) == [
        i for i in range(15) if i % 7 != 0]
    # time-travel kwargs pass through
    s1 = res["metadata"]["current-snapshot-id"]
    assert cat.read(spark, ["db"], "docs", snapshot_id=s1).count() == 10


def test_rename_and_drop(spark, cat):
    cat.create_namespace(["a"])
    cat.create_namespace(["b"])
    cat.create_table(["a"], "t1", _docs(spark, 0, 5))
    cat.rename_table({"namespace": ["a"], "name": "t1"},
                     {"namespace": ["b"], "name": "t2"})
    assert not cat.table_exists(["a"], "t1")
    assert cat.read(spark, ["b"], "t2").count() == 5
    with pytest.raises(I.IcebergError):
        cat.rename_table({"namespace": ["a"], "name": "t1"},
                         {"namespace": ["b"], "name": "t3"})
    # drop without purge keeps the data files on disk
    tdir = os.path.join(cat.warehouse, "b", "t2")
    cat.drop_table(["b"], "t2")
    assert not cat.table_exists(["b"], "t2")
    assert os.path.isdir(os.path.join(tdir, "data"))
    # purge removes everything
    cat.create_table(["b"], "t4", _docs(spark, 0, 3))
    cat.drop_table(["b"], "t4", purge=True)
    assert not os.path.exists(os.path.join(cat.warehouse, "b", "t4"))
    with pytest.raises(I.IcebergError):
        cat.drop_table(["b"], "t4")
