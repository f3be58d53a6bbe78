"""Iceberg metadata-tree tier (sources/iceberg.py): snapshot-per-commit
round trips, time travel, identity-partition pruning with zero data IO,
metadata-only counts, independent Avro decoding of the manifest tree,
and hostile-input rejection."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.sources import iceberg as I
from simple_anonymizer_spark.sources.avro import read_container


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _docs(spark, lo, hi, src="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.lit(src).alias("source"),
    )


def _rows(df):
    return sorted(map(tuple, df.select("doc_id", "text", "source").collect()))


def test_create_append_overwrite_roundtrip(spark, tdir):
    s1 = I.create_iceberg(_docs(spark, 0, 10), tdir)
    s2 = I.append_iceberg(_docs(spark, 10, 15), tdir)
    assert _rows(I.read_iceberg(spark, tdir)) == _rows(_docs(spark, 0, 15))
    # time travel: snapshot 1 still sees only the original rows
    assert _rows(I.read_iceberg(spark, tdir, snapshot_id=s1)) == _rows(
        _docs(spark, 0, 10))
    s3 = I.overwrite_iceberg(_docs(spark, 100, 103), tdir)
    assert _rows(I.read_iceberg(spark, tdir)) == _rows(
        _docs(spark, 100, 103))
    # all three snapshots remain readable
    assert _rows(I.read_iceberg(spark, tdir, snapshot_id=s2)) == _rows(
        _docs(spark, 0, 15))
    hist = I.iceberg_snapshots(spark, tdir).collect()
    assert [r.snapshot_id for r in hist] == [s1, s2, s3]
    assert [r.operation for r in hist] == ["append", "append", "overwrite"]


def test_append_reuses_prior_manifests(spark, tdir):
    """The O(new files) append contract: snapshot 2's manifest list must
    reference snapshot 1's manifest FILE unchanged, not rewrite it."""
    I.create_iceberg(_docs(spark, 0, 10), tdir)
    meta1 = I._load_metadata(tdir)
    m1 = I._current_manifests(tdir, meta1)
    I.append_iceberg(_docs(spark, 10, 12), tdir)
    m2 = I._current_manifests(tdir, I._load_metadata(tdir))
    assert m1[0]["manifest_path"] in [m["manifest_path"] for m in m2]
    assert len(m2) == len(m1) + 1


def test_time_travel_by_timestamp(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 5), tdir)
    meta = I._load_metadata(tdir)
    t1 = meta["snapshots"][0]["timestamp-ms"]
    I.append_iceberg(_docs(spark, 5, 8), tdir)
    assert I.read_iceberg(spark, tdir, as_of_ms=t1).count() == 5
    with pytest.raises(I.IcebergError):
        I.read_iceberg(spark, tdir, as_of_ms=t1 - 10_000)


def test_identity_partition_prunes_before_data_io(spark, tdir):
    df = _docs(spark, 0, 20, "a").union(_docs(spark, 20, 30, "b"))
    I.create_iceberg(df, tdir, partition_by="source")
    # file inventory: every live file carries its partition value, and
    # the filter prunes to exactly the matching files — metadata only
    inv = I.iceberg_live_files(
        spark, tdir, partition_filter={"source": "b"}).collect()
    assert inv and all(
        json.loads(r.partition) == {"source": "b"} for r in inv)
    assert sum(r.record_count for r in inv) == 10
    # the pruned read returns exactly partition b's rows
    got = I.read_iceberg(spark, tdir, partition_filter={"source": "b"})
    assert _rows(got) == _rows(_docs(spark, 20, 30, "b"))
    # metadata-only count: zero data IO, exact answer
    assert I.iceberg_count(tdir) == 30
    assert I.iceberg_count(tdir, partition_filter={"source": "a"}) == 20


def test_manifest_tree_is_real_avro_with_field_ids(spark, tdir):
    """Independent decode: the manifest list and manifests must be
    self-describing Avro containers whose schemas carry the spec's
    field-id attributes (what a real Iceberg runtime keys on)."""
    I.create_iceberg(_docs(spark, 0, 7), tdir, partition_by="source")
    meta = I._load_metadata(tdir)
    snap = meta["snapshots"][-1]
    with open(os.path.join(tdir, snap["manifest-list"]), "rb") as fh:
        lschema, lrows = read_container(fh.read())
    ids = {f["name"]: f.get("field-id") for f in lschema["fields"]}
    assert ids["manifest_path"] == 500 and ids["manifest_length"] == 501
    assert len(lrows) == 1
    mpath, mlen = lrows[0][0], lrows[0][1]
    raw = open(os.path.join(tdir, mpath), "rb").read()
    assert len(raw) == mlen  # recorded length is the physical length
    mschema, mrows = read_container(raw)
    dfields = {f["name"]: f.get("field-id")
               for f in next(f for f in mschema["fields"]
                             if f["name"] == "data_file")["type"]["fields"]}
    assert dfields["file_path"] == 100 and dfields["record_count"] == 103
    assert sum(r[2]["record_count"] for r in mrows) == 7


def test_unpartitioned_manifest_has_empty_partition_record(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 3), tdir)
    meta = I._load_metadata(tdir)
    m = I._current_manifests(tdir, meta)[0]
    with open(os.path.join(tdir, m["manifest_path"]), "rb") as fh:
        _, rows = read_container(fh.read())
    assert rows[0][2]["partition"] == {}


def test_concurrent_commit_loses_cleanly(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 3), tdir)
    # simulate a racing writer that already created v2
    v2 = os.path.join(tdir, "metadata", "v2.metadata.json")
    with open(v2, "w") as fh:
        fh.write("{}")
    with pytest.raises(FileExistsError):
        I.append_iceberg(_docs(spark, 3, 5), tdir)


def test_hostile_inputs_raise_iceberg_error(spark, tmp_path, tdir):
    with pytest.raises(I.IcebergError):
        I.read_iceberg(spark, str(tmp_path / "nope"))
    I.create_iceberg(_docs(spark, 0, 3), tdir)
    with pytest.raises(I.IcebergError):
        I.read_iceberg(spark, tdir, snapshot_id=999)
    with pytest.raises(I.IcebergError):
        I.create_iceberg(_docs(spark, 0, 3), tdir)  # already exists
    # corrupt manifest -> the avro decoder's untrusted-bytes contract
    meta = I._load_metadata(tdir)
    m = I._current_manifests(tdir, meta)[0]
    with open(os.path.join(tdir, m["manifest_path"]), "r+b") as fh:
        fh.seek(0)
        fh.write(b"XXXX")
    with pytest.raises(ValueError):
        I.read_iceberg(spark, tdir)


def test_long_partition_column(spark, tdir):
    df = spark.range(0, 12).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("bucket"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    I.create_iceberg(df, tdir, partition_by="bucket")
    got = I.read_iceberg(spark, tdir, partition_filter={"bucket": 1})
    assert sorted(r.doc_id for r in got.collect()) == [1, 4, 7, 10]
