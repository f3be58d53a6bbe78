"""Iceberg metadata-tree tier (sources/iceberg.py): snapshot-per-commit
round trips, time travel, identity-partition pruning with zero data IO,
metadata-only counts, independent Avro decoding of the manifest tree,
and hostile-input rejection."""

from __future__ import annotations

import glob
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


def test_partitioned_write_is_one_spark_job(spark, tdir):
    """The 100 TB write contract: a multi-partition append must be ONE
    partitionBy job, never a per-partition-value `.where` re-scan loop
    (which would be k full input passes for k values)."""
    n_values = 6
    df = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n_values).alias("bucket"),
    )
    I.create_iceberg(df.where(F.lit(False)), tdir, partition_by="bucket")
    sc = spark.sparkContext
    sc.setJobGroup("ice-append-jobcount", "iceberg append job count")
    try:
        I.append_iceberg(df, tdir)
        jobs = sc.statusTracker().getJobIdsForGroup("ice-append-jobcount")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert 1 <= len(jobs) <= 2 < n_values, jobs
    assert I.iceberg_count(tdir) == 60
    got = I.read_iceberg(spark, tdir, partition_filter={"bucket": 3})
    assert sorted(r.doc_id for r in got.collect()) == [3, 9, 15, 21, 27,
                                                       33, 39, 45, 51, 57]


def test_null_partition_values_survive(spark, tdir):
    """NULL partition-key rows must reach data files and manifests (the
    Hive default-partition directory -> a null manifest value), not be
    silently dropped. Empty string collapses to null too — Hive layout
    can't tell them apart; that caveat is part of the contract."""
    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, F.lit(None))
         .otherwise(F.concat(F.lit("s"), F.col("id") % 2)).alias("source"),
    )
    I.create_iceberg(df, tdir, partition_by="source")
    assert I.iceberg_count(tdir) == 10
    got = I.read_iceberg(spark, tdir)
    assert sorted(r.doc_id for r in got.collect()) == list(range(10))
    nulls = I.read_iceberg(spark, tdir, partition_filter={"source": None})
    assert sorted(r.doc_id for r in nulls.collect()) == [0, 3, 6, 9]
    assert all(r.source is None for r in nulls.collect())


def test_minmax_bounds_prune_files(spark, tdir):
    """Manifest lower/upper bounds: a range predicate must plan strictly
    fewer files than the full snapshot (zero data IO in planning), and
    the read stays exact via the residual filter."""
    df = (spark.range(0, 100).repartitionByRange(4, "id")
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("t"), F.col("id")).alias("text")))
    I.create_iceberg(df, tdir)
    all_files = I.iceberg_plan_files(tdir)
    pruned = I.iceberg_plan_files(tdir, predicates=[("doc_id", ">=", 75)])
    assert len(pruned) < len(all_files)
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", ">=", 75)])
    assert sorted(r.doc_id for r in got.collect()) == list(range(75, 100))
    # equality on a string column prunes through string bounds too
    got2 = I.read_iceberg(spark, tdir, predicates=[("text", "=", "t42")])
    assert [r.doc_id for r in got2.collect()] == [42]


def test_bounds_are_spec_encoded_in_manifest_avro(spark, tdir):
    """lower_bounds/upper_bounds land in the manifest Avro as the spec's
    int-keyed k/v arrays (field-ids 125/128, keys 126/129, values
    127/130), with Appendix-D single-value binary payloads."""
    I.create_iceberg(_docs(spark, 5, 12), tdir)
    meta = I._load_metadata(tdir)
    m = I._current_manifests(tdir, meta)[0]
    with open(os.path.join(tdir, m["manifest_path"]), "rb") as fh:
        schema, rows = read_container(fh.read())
    dfields = {f["name"]: f for f in
               next(f for f in schema["fields"]
                    if f["name"] == "data_file")["type"]["fields"]}
    assert dfields["lower_bounds"]["field-id"] == 125
    assert dfields["upper_bounds"]["field-id"] == 128
    ids = {f["name"]: f["id"] for f in meta["schema"]["fields"]}
    los, his = {}, {}
    for _, _, data_file in rows:
        for e in data_file["lower_bounds"]:
            v = I._bound_value("long", e["value"]) \
                if e["key"] == ids["doc_id"] else None
            if v is not None:
                los[data_file["file_path"]] = v
        for e in data_file["upper_bounds"]:
            if e["key"] == ids["doc_id"]:
                his[data_file["file_path"]] = I._bound_value(
                    "long", e["value"])
    assert min(los.values()) == 5 and max(his.values()) == 11


def test_empty_plan_returns_empty_dataframe(spark, tdir):
    """A filter that prunes everything (or an empty table) returns an
    empty DataFrame with the table schema — real Iceberg scan
    semantics, not an error."""
    I.create_iceberg(_docs(spark, 0, 5), tdir, partition_by="source")
    got = I.read_iceberg(spark, tdir, partition_filter={"source": "zzz"})
    assert got.count() == 0
    assert got.columns == ["doc_id", "text", "source"]
    got2 = I.read_iceberg(spark, tdir,
                          predicates=[("doc_id", ">", 10_000)])
    assert got2.count() == 0
    # an empty APPEND commits a zero-file snapshot readably
    I.append_iceberg(_docs(spark, 0, 5).where(F.lit(False)), tdir)
    assert I.read_iceberg(spark, tdir).count() == 5


def test_as_of_ms_tie_breaks_to_newest_snapshot(spark):
    meta = {"snapshots": [
        {"snapshot-id": 1, "timestamp-ms": 1000},
        {"snapshot-id": 2, "timestamp-ms": 1000},
    ], "current-snapshot-id": 2}
    got = I._resolve_snapshot(meta, None, 1500)
    assert got["snapshot-id"] == 2


def test_bad_partition_type_fails_before_any_write(spark, tmp_path):
    """An unsupported identity-partition type (date) must fail BEFORE
    the metadata dir exists, so a corrected retry on the same path
    succeeds instead of hitting 'table already exists'."""
    tdir = str(tmp_path / "tbl")
    df = spark.range(0, 3).select(
        F.col("id").alias("doc_id"),
        F.to_date(F.lit("2026-01-01")).alias("d"))
    with pytest.raises(I.IcebergError):
        I.create_iceberg(df, tdir, partition_by="d")
    assert not os.path.exists(tdir)
    I.create_iceberg(df, tdir)  # retry unpartitioned: clean slate
    assert I.iceberg_count(tdir) == 3


def test_iceberg_count_opens_no_data_file(spark, tdir):
    """Metadata-only COUNT: still exact after every data file is
    deleted — proof that no parquet file is opened."""
    import glob as _glob

    I.create_iceberg(_docs(spark, 0, 50), tdir, partition_by="source")
    I.append_iceberg(_docs(spark, 50, 80, "b"), tdir)
    for p in _glob.glob(os.path.join(tdir, "data", "*.parquet")):
        os.remove(p)
    assert I.iceberg_count(tdir) == 80
    assert I.iceberg_count(tdir, partition_filter={"source": "b"}) == 30
    assert I.iceberg_plan_files(
        tdir, predicates=[("doc_id", "<", 10)])  # planning is metadata-only


def test_v2_position_deletes_merge_on_read(spark, tdir):
    """Format-version 2: delete_iceberg_rows commits a position-delete
    file + delete manifest; reads apply it merge-on-read; time travel to
    the pre-delete snapshot still sees every row; metadata-only count
    subtracts exactly."""
    s1 = I.create_iceberg(_docs(spark, 0, 20), tdir, format_version=2)
    s2 = I.delete_iceberg_rows(spark, tdir, "doc_id % 3 = 0")
    assert s2 == s1 + 1
    got = sorted(r.doc_id for r in I.read_iceberg(spark, tdir).collect())
    assert got == [i for i in range(20) if i % 3 != 0]
    assert I.iceberg_count(tdir) == len(got)
    # pre-delete snapshot is untouched
    assert I.read_iceberg(spark, tdir, snapshot_id=s1).count() == 20
    hist = I.iceberg_snapshots(spark, tdir).collect()
    assert [r.operation for r in hist] == ["append", "delete"]


def test_v2_deletes_are_idempotent_and_stack(spark, tdir):
    """Re-running the same predicate is a no-op (no overlapping delete
    rows — the exact-count invariant); a second predicate stacks; an
    append after deletes adds rows the old delete files don't touch."""
    I.create_iceberg(_docs(spark, 0, 12), tdir, format_version=2)
    s2 = I.delete_iceberg_rows(spark, tdir, "doc_id < 4")
    s3 = I.delete_iceberg_rows(spark, tdir, "doc_id < 4")  # no-op
    assert s3 == s2 and I.iceberg_count(tdir) == 8
    I.delete_iceberg_rows(spark, tdir, "doc_id >= 10")
    assert sorted(r.doc_id for r in
                  I.read_iceberg(spark, tdir).collect()) == [4, 5, 6, 7,
                                                             8, 9]
    I.append_iceberg(_docs(spark, 0, 4, "later"), tdir)
    got = sorted((r.doc_id, r.source) for r in
                 I.read_iceberg(spark, tdir).collect())
    assert got == [(0, "later"), (1, "later"), (2, "later"),
                   (3, "later"), (4, "a"), (5, "a"), (6, "a"),
                   (7, "a"), (8, "a"), (9, "a")]
    assert I.iceberg_count(tdir) == 10


def test_v2_delete_manifest_is_spec_shaped(spark, tdir):
    """The delete commit writes a content=1 manifest-list row with
    sequence numbers (field-ids 517/515/516), a content=1 data_file
    entry (field-id 134), and a (file_path, pos) parquet delete file
    sorted by path then position."""
    I.create_iceberg(_docs(spark, 0, 10), tdir, format_version=2)
    I.delete_iceberg_rows(spark, tdir, "doc_id IN (7, 2, 4)")
    meta = I._load_metadata(tdir)
    snap = meta["snapshots"][-1]
    assert snap["sequence-number"] == 2
    assert meta["last-sequence-number"] == 2
    with open(os.path.join(tdir, snap["manifest-list"]), "rb") as fh:
        lschema, lrows = read_container(fh.read())
    ids = {f["name"]: f.get("field-id") for f in lschema["fields"]}
    assert ids["content"] == 517 and ids["sequence_number"] == 515
    assert ids["min_sequence_number"] == 516
    by_content = {}
    names = [f["name"] for f in lschema["fields"]]
    for r in lrows:
        row = dict(zip(names, r))
        by_content[row["content"]] = row
    assert set(by_content) == {0, 1}
    assert by_content[1]["sequence_number"] == 2
    # the delete manifest's entry says content=1 (field-id 134)
    with open(os.path.join(tdir, by_content[1]["manifest_path"]),
              "rb") as fh:
        mschema, mrows = read_container(fh.read())
    dfields = {f["name"]: f.get("field-id")
               for f in next(f for f in mschema["fields"]
                             if f["name"] == "data_file")["type"]["fields"]}
    assert dfields["content"] == 134
    assert mrows[0][2]["content"] == 1
    # the delete file itself: (file_path, pos) sorted
    del_path = os.path.join(tdir, mrows[0][2]["file_path"])
    rows = [(r.file_path, r.pos)
            for r in spark.read.parquet(del_path).collect()]
    assert rows == sorted(rows)
    assert len(rows) == 3


def test_v2_deletes_compose_with_pruning(spark, tdir):
    """Partition pruning, min/max predicate pruning, and position
    deletes compose on one read."""
    df = _docs(spark, 0, 30, "a").union(_docs(spark, 30, 50, "b"))
    I.create_iceberg(df, tdir, partition_by="source", format_version=2)
    I.delete_iceberg_rows(spark, tdir, "doc_id % 2 = 1")
    got = sorted(r.doc_id for r in I.read_iceberg(
        spark, tdir, partition_filter={"source": "b"},
        predicates=[("doc_id", ">=", 40)]).collect())
    assert got == [40, 42, 44, 46, 48]
    # partition-filtered metadata count under deletes is honest: raises
    with pytest.raises(I.IcebergError):
        I.iceberg_count(tdir, partition_filter={"source": "b"})
    assert I.iceberg_count(tdir) == 25


def test_v1_table_rejects_row_deletes(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 5), tdir)
    with pytest.raises(I.IcebergError):
        I.delete_iceberg_rows(spark, tdir, "doc_id = 1")


def test_v2_equality_deletes_respect_sequence_rule(spark, tdir):
    """Equality deletes kill matching rows in STRICTLY OLDER data files
    only: a row appended AFTER the delete with the same key survives —
    the property that makes delete-then-append an upsert."""
    I.create_iceberg(_docs(spark, 0, 10), tdir, format_version=2)
    keys = spark.createDataFrame([(2,), (5,), (7,)], "doc_id long")
    I.delete_iceberg_keys(spark, tdir, keys)
    got = sorted(r.doc_id for r in I.read_iceberg(spark, tdir).collect())
    assert got == [0, 1, 3, 4, 6, 8, 9]
    # re-append key 5 AFTER the delete: the new row must survive
    I.append_iceberg(_docs(spark, 5, 6, "v2"), tdir)
    rows = {(r.doc_id, r.source) for r in
            I.read_iceberg(spark, tdir).collect()}
    assert (5, "v2") in rows and (5, "a") not in rows
    assert (2, "a") not in rows
    # metadata count is honest under equality deletes: raises
    with pytest.raises(I.IcebergError):
        I.iceberg_count(tdir)
    assert I.read_iceberg(spark, tdir).count() == 8


def test_v2_upsert_merges_by_key(spark, tdir):
    """upsert_iceberg = equality-delete keys + append: existing keys are
    replaced, new keys inserted, untouched keys unchanged; the
    pre-upsert snapshot still time-travels to the old values."""
    s1 = I.create_iceberg(_docs(spark, 0, 6), tdir, format_version=2)
    upd = _docs(spark, 3, 9, "new")  # 3..5 replace, 6..8 insert
    I.upsert_iceberg(spark, tdir, upd, ["doc_id"])
    got = sorted((r.doc_id, r.source) for r in
                 I.read_iceberg(spark, tdir).collect())
    assert got == [(0, "a"), (1, "a"), (2, "a"), (3, "new"), (4, "new"),
                   (5, "new"), (6, "new"), (7, "new"), (8, "new")]
    assert I.read_iceberg(spark, tdir, snapshot_id=s1).count() == 6
    # a second upsert of the same keys wins again (last write wins)
    I.upsert_iceberg(spark, tdir, _docs(spark, 4, 5, "newer"), ["doc_id"])
    rows = {(r.doc_id, r.source) for r in
            I.read_iceberg(spark, tdir).collect()}
    assert (4, "newer") in rows and (4, "new") not in rows
    assert len(rows) == 9


def test_v2_equality_delete_manifest_records_equality_ids(spark, tdir):
    """The equality-delete manifest entry carries content=2 and the
    spec's equality_ids (field-id 135) naming the key columns by
    field id."""
    I.create_iceberg(_docs(spark, 0, 5), tdir, format_version=2)
    I.delete_iceberg_keys(
        spark, tdir, spark.createDataFrame([(1,)], "doc_id long"))
    meta = I._load_metadata(tdir)
    ids = {f["name"]: f["id"] for f in meta["schema"]["fields"]}
    snap = meta["snapshots"][-1]
    mlist = I._read_manifest_list(tdir, snap["manifest-list"])
    eq_m = [m for m in mlist if m["content"] == 1]
    assert len(eq_m) == 1
    with open(os.path.join(tdir, eq_m[0]["manifest_path"]), "rb") as fh:
        mschema, mrows = read_container(fh.read())
    dfields = {f["name"]: f.get("field-id")
               for f in next(f for f in mschema["fields"]
                             if f["name"] == "data_file")["type"]["fields"]}
    assert dfields["equality_ids"] == 135
    assert mrows[0][2]["content"] == 2
    assert mrows[0][2]["equality_ids"] == [ids["doc_id"]]


def test_v2_equality_deletes_match_nulls_null_safely(spark, tdir):
    df = spark.range(0, 6).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(None))
         .otherwise(F.concat(F.lit("s"), F.col("id"))).alias("source"),
    )
    I.create_iceberg(df, tdir, format_version=2)
    I.delete_iceberg_keys(
        spark, tdir,
        spark.createDataFrame([(None,)], "source string"))
    got = sorted(r.doc_id for r in I.read_iceberg(spark, tdir).collect())
    assert got == [1, 3, 5]  # the null-source rows are gone


def test_expire_snapshots_keeps_shared_files(spark, tdir):
    """Expiry drops old snapshots and their EXCLUSIVE files only: an
    append chain shares the first manifest + data files, so expiring
    snapshot 1 while snapshot 2 survives must keep them; an expired
    overwrite's orphaned predecessors go away physically."""
    s1 = I.create_iceberg(_docs(spark, 0, 10), tdir)
    s2 = I.append_iceberg(_docs(spark, 10, 15), tdir)
    s3 = I.overwrite_iceberg(_docs(spark, 100, 103), tdir)
    n_files_before = len(
        glob.glob(os.path.join(tdir, "data", "*.parquet")))
    stats = I.expire_iceberg_snapshots(tdir, keep_last=1)
    assert stats["expired_snapshots"] == 2
    assert stats["deleted_files"] > 0
    # current snapshot reads fine; expired ids are gone from history
    assert I.read_iceberg(spark, tdir).count() == 3
    hist = I.iceberg_snapshots(spark, tdir).collect()
    assert [r.snapshot_id for r in hist] == [s3]
    with pytest.raises(I.IcebergError):
        I.read_iceberg(spark, tdir, snapshot_id=s1)
    # s1/s2's data files (unreferenced by s3) are physically gone
    n_files_after = len(
        glob.glob(os.path.join(tdir, "data", "*.parquet")))
    assert n_files_after < n_files_before
    assert I.iceberg_count(tdir) == 3
    # idempotent: nothing left to expire
    again = I.expire_iceberg_snapshots(tdir, keep_last=1)
    assert again == {"expired_snapshots": 0, "deleted_files": 0}
    # shared-file safety on an append chain
    t2 = tdir + "_chain"
    I.create_iceberg(_docs(spark, 0, 10), t2)
    I.append_iceberg(_docs(spark, 10, 12), t2)
    I.expire_iceberg_snapshots(t2, keep_last=1)
    got = sorted(r.doc_id for r in I.read_iceberg(spark, t2).collect())
    assert got == list(range(12))  # snapshot 1's shared files survive


def test_remove_orphans_cleans_unreferenced_files_only(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 8), tdir)
    # plant debris: a fake data file, a losing-commit manifest orphan
    orphan_data = os.path.join(tdir, "data", "zz-orphan.parquet")
    open(orphan_data, "wb").write(b"junk")
    orphan_manifest = os.path.join(
        tdir, "metadata", "manifest-99999-deadbeef.avro")
    open(orphan_manifest, "wb").write(b"junk")
    removed = I.remove_iceberg_orphans(tdir)
    assert sorted(removed) == [
        "data/zz-orphan.parquet",
        "metadata/manifest-99999-deadbeef.avro"]
    assert not os.path.exists(orphan_data)
    # the table is untouched
    assert I.read_iceberg(spark, tdir).count() == 8
    assert I.remove_iceberg_orphans(tdir) == []


def test_rewrite_files_purges_delete_debt_and_tightens_bounds(spark, tdir):
    """Compaction: after rewrite_iceberg_files the current snapshot has
    zero delete manifests (anti-joins gone, metadata count exact again),
    contents are unchanged, and a sort_by layout tightens bounds so
    range pruning plans fewer files than the unsorted table would."""
    I.create_iceberg(_docs(spark, 0, 100), tdir, format_version=2)
    I.delete_iceberg_rows(spark, tdir, "doc_id % 4 = 1")
    I.delete_iceberg_keys(
        spark, tdir, spark.createDataFrame([(2,), (6,)], "doc_id long"))
    want = sorted(map(tuple, I.read_iceberg(spark, tdir).collect()))
    with pytest.raises(I.IcebergError):
        I.iceberg_count(tdir)  # equality debt blocks metadata count
    s = I.rewrite_iceberg_files(spark, tdir, sort_by=["doc_id"],
                                target_partitions=4)
    meta = I._load_metadata(tdir)
    snap = I._resolve_snapshot(meta, s, None)
    assert I._live_delete_files(tdir, snap) == []
    got = sorted(map(tuple, I.read_iceberg(spark, tdir).collect()))
    assert got == want
    assert I.iceberg_count(tdir) == len(want)  # exact again
    # sorted layout: disjoint per-file ranges -> a range predicate plans
    # strictly fewer files
    all_files = I.iceberg_plan_files(tdir)
    pruned = I.iceberg_plan_files(
        tdir, predicates=[("doc_id", ">=", 90)])
    assert len(all_files) > 1 and len(pruned) < len(all_files)
    # pre-compaction snapshots still time-travel (deletes included)
    assert sorted(map(tuple, I.read_iceberg(
        spark, tdir, snapshot_id=s - 1).collect())) == want


def test_add_column_evolves_schema_without_rewrite(spark, tdir):
    """ADD COLUMN is metadata-only: old files read back null-filled, the
    pre-evolution snapshot does NOT show the column (schema-id per
    snapshot), post-add appends must supply it, and predicates on the
    new column treat old rows as null."""
    s1 = I.create_iceberg(_docs(spark, 0, 5), tdir)
    fid = I.add_iceberg_column(tdir, "score", "double")
    meta = I._load_metadata(tdir)
    assert fid == meta["last-column-id"] == 4
    assert meta["current-schema-id"] == 1 and len(meta["schemas"]) == 2
    # current read: old rows null-filled in the new column
    got = I.read_iceberg(spark, tdir)
    assert got.columns == ["doc_id", "text", "source", "score"]
    assert all(r.score is None for r in got.collect())
    # time travel to the pre-add snapshot: no score column
    old = I.read_iceberg(spark, tdir, snapshot_id=s1)
    assert old.columns == ["doc_id", "text", "source"]
    # append without the new column is rejected
    with pytest.raises(I.IcebergError):
        I.append_iceberg(_docs(spark, 5, 8), tdir)
    I.append_iceberg(
        _docs(spark, 5, 8).withColumn(
            "score", F.col("doc_id").cast("double") / 2), tdir)
    rows = {r.doc_id: r.score for r in
            I.read_iceberg(spark, tdir).collect()}
    assert rows[6] == 3.0 and rows[1] is None and len(rows) == 8
    # range predicate on the evolved column: nulls drop, bounds prune
    hit = I.read_iceberg(spark, tdir, predicates=[("score", ">=", 3.0)])
    assert sorted(r.doc_id for r in hit.collect()) == [6, 7]
    # duplicate / bogus adds rejected
    with pytest.raises(I.IcebergError):
        I.add_iceberg_column(tdir, "score", "double")
    with pytest.raises(I.IcebergError):
        I.add_iceberg_column(tdir, "x", "uuid")


def test_evolution_deletes_and_compaction_compose(spark, tdir):
    """The round-10 features interact correctly on one table: add a
    column, upsert with it, position-delete ON the evolved column over
    mixed old/new files, then compact — contents stay right at every
    step and the compacted table is delete-free with the full schema."""
    I.create_iceberg(_docs(spark, 0, 10), tdir, format_version=2)
    I.add_iceberg_column(tdir, "score", "double")
    upd = (_docs(spark, 5, 12, "upd")
           .withColumn("score", F.col("doc_id").cast("double")))
    I.upsert_iceberg(spark, tdir, upd, ["doc_id"])
    # position-delete on the EVOLVED column: old files read null there
    I.delete_iceberg_rows(spark, tdir, "score >= 10.0")
    got = {r.doc_id: (r.source, r.score) for r in
           I.read_iceberg(spark, tdir).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5, 6, 7, 8, 9}
    assert got[3] == ("a", None) and got[7] == ("upd", 7.0)
    s = I.rewrite_iceberg_files(spark, tdir)
    meta = I._load_metadata(tdir)
    snap = I._resolve_snapshot(meta, s, None)
    assert I._live_delete_files(tdir, snap) == []
    after = {r.doc_id: (r.source, r.score) for r in
             I.read_iceberg(spark, tdir).collect()}
    assert after == got
    assert I.iceberg_count(tdir) == 10


def test_pyiceberg_datasource_front_door(spark, tdir):
    """format("pyiceberg"): same rows as read_iceberg on a partitioned
    v1 table, snapshot_id time travel, position deletes applied
    per-task, schema-evolution null-fill — and honest rejections for
    writes and equality-delete tables."""
    from pyspark.errors import PySparkException

    from simple_anonymizer_spark.sources.iceberg import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    df = _docs(spark, 0, 20, "a").union(_docs(spark, 20, 30, "b"))
    s1 = I.create_iceberg(df, tdir, partition_by="source")
    s2 = I.append_iceberg(_docs(spark, 30, 35, "c"), tdir)
    got = spark.read.format("pyiceberg").load(tdir)
    assert _rows(got) == _rows(I.read_iceberg(spark, tdir))
    assert got.count() == 35
    # one input partition per data file (task-level parallelism)
    assert got.rdd.getNumPartitions() == len(I.iceberg_plan_files(tdir))
    # time travel via option
    tt = (spark.read.format("pyiceberg")
          .option("snapshot_id", s1).load(tdir))
    assert tt.count() == 30
    # v2 position deletes respected
    t2 = tdir + "_v2"
    I.create_iceberg(_docs(spark, 0, 12), t2, format_version=2)
    I.delete_iceberg_rows(spark, t2, "doc_id % 3 = 0")
    got2 = spark.read.format("pyiceberg").load(t2)
    assert sorted(r.doc_id for r in got2.collect()) == [
        i for i in range(12) if i % 3 != 0]
    # schema evolution: old files null-fill the added column
    I.add_iceberg_column(t2, "score", "double")
    got3 = spark.read.format("pyiceberg").load(t2)
    assert got3.columns == ["doc_id", "text", "source", "score"]
    assert all(r.score is None for r in got3.collect())
    # equality-delete tables are the native path's job
    I.delete_iceberg_keys(
        spark, t2, spark.createDataFrame([(1,)], "doc_id long"))
    with pytest.raises(PySparkException):
        spark.read.format("pyiceberg").load(t2).collect()
    # writes need an EXISTING table (bootstrap fixes schema/spec/fv)
    with pytest.raises(PySparkException):
        (df.write.format("pyiceberg").mode("overwrite")
         .save(tdir + "_w"))


def test_pyiceberg_datasource_write_path(spark, tdir):
    """The DSv2 write half: mode("append")/mode("overwrite") commit
    real snapshots through the same manifest machinery as
    append_iceberg — history, time travel, metadata counts, and the
    native reader all see them; partitioned tables and schema
    mismatches are refused on the driver before any task runs."""
    from pyspark.errors import PySparkException

    from simple_anonymizer_spark.sources.iceberg import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    df = _docs(spark, 0, 10)
    I.create_iceberg(df.where(F.lit(False)), tdir)
    df.write.format("pyiceberg").mode("append").save(tdir)
    assert _rows(I.read_iceberg(spark, tdir)) == _rows(df)
    _docs(spark, 10, 15).write.format("pyiceberg").mode(
        "append").save(tdir)
    assert I.iceberg_count(tdir) == 15
    _docs(spark, 100, 103).write.format("pyiceberg").mode(
        "overwrite").save(tdir)
    assert I.iceberg_count(tdir) == 3
    snaps = I._load_metadata(tdir)["snapshots"]
    assert [s["summary"]["operation"] for s in snaps] == [
        "append", "append", "append", "overwrite"]
    # pre-overwrite snapshots stay time-travelable
    assert I.read_iceberg(
        spark, tdir, snapshot_id=snaps[-2]["snapshot-id"]).count() == 15
    # the DSv2 reader sees its writer's commits
    assert spark.read.format("pyiceberg").load(tdir).count() == 3
    # empty append: no snapshot published
    spark.createDataFrame([], I.read_iceberg(spark, tdir).schema
                          ).write.format("pyiceberg").mode(
        "append").save(tdir)
    assert len(I._load_metadata(tdir)["snapshots"]) == 4
    # v2 interplay: DSv2 appends land with NEWER sequence numbers, so
    # prior position deletes never touch them
    t2 = tdir + "_v2"
    I.create_iceberg(df, t2, format_version=2)
    I.delete_iceberg_rows(spark, t2, "doc_id < 3")
    _docs(spark, 0, 2).write.format("pyiceberg").mode("append").save(t2)
    assert sorted(r.doc_id for r in I.read_iceberg(spark, t2).collect()
                  ) == [0, 1] + list(range(3, 10))
    # refusals: partitioned table, schema mismatch
    p = tdir + "_p"
    I.create_iceberg(df, p, partition_by="source")
    with pytest.raises(PySparkException):
        df.write.format("pyiceberg").mode("append").save(p)
    with pytest.raises(PySparkException):
        (df.withColumnRenamed("text", "t2").write.format("pyiceberg")
         .mode("append").save(tdir))


def test_hostile_string_partition_values_roundtrip(spark, tdir):
    """Partition values containing Hive-escaped characters ('=', '/',
    '%', ':', spaces, unicode, a literal '%41') must round-trip through
    the staging directory name exactly — write escape (Spark's
    escapePathName) and read unescape (unquote) must compose to
    identity."""
    vals = ["a=b", "x/y", "100%", "a:b", "two words", "naïve-café",
            "%41", "dot.dot", "tab\tchar"]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    I.create_iceberg(df, tdir, partition_by="source")
    assert I.iceberg_count(tdir) == len(vals)
    got = {(r.doc_id, r.source)
           for r in I.read_iceberg(spark, tdir).collect()}
    assert got == set(rows)
    for i, v in enumerate(vals):
        one = I.read_iceberg(spark, tdir, partition_filter={"source": v})
        assert [(r.doc_id, r.source) for r in one.collect()] == [(i, v)]


def test_distributed_live_files_matches_driver_walk(spark, tdir):
    """The executor-side manifest decode returns exactly the driver
    walk's rows (same pruning semantics), with task-level parallelism
    across manifests."""
    I.create_iceberg(_docs(spark, 0, 20, "a").union(
        _docs(spark, 20, 30, "b")), tdir, partition_by="source")
    I.append_iceberg(_docs(spark, 30, 40, "b"), tdir)
    for pf in (None, {"source": "b"}):
        drv = sorted(map(tuple, I.iceberg_live_files(
            spark, tdir, partition_filter=pf).collect()))
        dist = sorted(map(tuple, I.iceberg_live_files_distributed(
            spark, tdir, partition_filter=pf).collect()))
        assert dist == drv and drv


def test_migrate_delta_to_iceberg_shares_data_files(spark, tmp_path):
    """In-place migration: the Iceberg tree lands next to _delta_log
    over the SAME parquet files (none copied), contents match the Delta
    read exactly, harvested bounds prune, and (v2) deletes/appends work
    on the migrated table while the frozen Delta view still reads."""
    from simple_anonymizer_spark.plans.on_conflict import OnConflict
    from simple_anonymizer_spark.sources.deltalog import (
        merge_deltalog, read_deltalog)

    path = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"))
    # two commits with disjoint key ranges -> at least two data files
    # with disjoint doc_id bounds (what the pruning assertion needs)
    merge_deltalog(spark, df.where(F.col("doc_id") < 20), path,
                   ["doc_id"], OnConflict.do_update())
    merge_deltalog(spark, df.where(F.col("doc_id") >= 20), path,
                   ["doc_id"], OnConflict.do_update())
    n_parquet = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_parquet >= 2
    s = I.migrate_delta_to_iceberg(path, format_version=2)
    # no data files were copied or added
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == n_parquet
    assert sorted(map(tuple, I.read_iceberg(spark, path).collect())) \
        == sorted(map(tuple, read_deltalog(spark, path).collect()))
    assert I.iceberg_count(path) == 40
    # harvested footer bounds drive range pruning
    pruned = I.iceberg_plan_files(
        path, predicates=[("doc_id", ">=", 35)])
    assert len(pruned) < len(I.iceberg_plan_files(path))
    # the migrated table is fully functional: v2 delete + append
    I.delete_iceberg_rows(spark, path, "doc_id < 5")
    I.append_iceberg(
        df.where(F.col("doc_id") < 2).withColumn(
            "text", F.lit("new")), path)
    got = {r.doc_id: r.text for r in
           I.read_iceberg(spark, path).collect()}
    assert got[0] == "new" and 3 not in got and got[10] == "d10"
    # the frozen Delta view still reads its own snapshot
    assert read_deltalog(spark, path).count() == 40
    # re-migration refused
    with pytest.raises(I.IcebergError):
        I.migrate_delta_to_iceberg(path)


def test_migrate_iceberg_to_delta_reverse_handoff(spark, tmp_path):
    """Reverse migration: a Delta log lands next to metadata/ over the
    same files; contents match; delete debt is refused until compaction;
    Delta-side merges work after the handoff."""
    from simple_anonymizer_spark.plans.on_conflict import OnConflict
    from simple_anonymizer_spark.sources.deltalog import (
        merge_deltalog, read_deltalog)

    path = str(tmp_path / "t")
    df = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
        F.lit("a").alias("source"))
    I.create_iceberg(df, path, partition_by="source", format_version=2)
    I.delete_iceberg_rows(spark, path, "doc_id >= 25")
    with pytest.raises(I.IcebergError):
        I.migrate_iceberg_to_delta(path)  # delete debt -> compact first
    I.rewrite_iceberg_files(spark, path)
    v = I.migrate_iceberg_to_delta(path)
    assert v == 0
    assert sorted(map(tuple, read_deltalog(spark, path).collect())) \
        == sorted(map(tuple, I.read_iceberg(spark, path).collect()))
    assert read_deltalog(spark, path).count() == 25
    # Delta owns the files now: a Delta merge upserts on top
    upd = df.where(F.col("doc_id") == 0).withColumn(
        "text", F.lit("merged"))
    merge_deltalog(spark, upd, path, ["doc_id"], OnConflict.do_update())
    got = {r.doc_id: r.text for r in read_deltalog(spark, path).collect()}
    assert got[0] == "merged" and got[10] == "d10" and len(got) == 25
    with pytest.raises(I.IcebergError):
        I.migrate_iceberg_to_delta(path)  # already has a Delta log


def test_pyiceberg_pushdown_prunes_input_partitions(spark, tdir):
    """DSv2 filter pushdown: a range predicate on a stats-bounded column
    prunes whole input partitions (files) at planning time, and the
    residual Spark filter keeps results exact."""
    from simple_anonymizer_spark.sources.iceberg import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    df = (spark.range(0, 100).repartitionByRange(4, "id")
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("t"), F.col("id")).alias("text")))
    I.create_iceberg(df, tdir)
    conf = "spark.sql.python.filterPushdown.enabled"
    spark.conf.set(conf, "true")
    try:
        full = (spark.read.format("pyiceberg")
                .option("pushdown", "true").load(tdir))
        n_all = full.rdd.getNumPartitions()
        assert n_all == len(I.iceberg_plan_files(tdir)) > 1
        hit = (spark.read.format("pyiceberg")
               .option("pushdown", "true").load(tdir)
               .where(F.col("doc_id") >= 75))
        assert hit.rdd.getNumPartitions() < n_all  # pruned at planning
        assert sorted(r.doc_id for r in hit.collect()) == \
            list(range(75, 100))
        # a filter that prunes everything: exact empty scan
        none = (spark.read.format("pyiceberg")
                .option("pushdown", "true").load(tdir)
                .where(F.col("doc_id") > 10_000))
        assert none.count() == 0
    finally:
        spark.conf.unset(conf)
    # without the option the plain reader works even with pushdown
    # disabled session-wide (implementing pushFilters would error)
    plain = (spark.read.format("pyiceberg").load(tdir)
             .where(F.col("doc_id") >= 75))
    assert plain.rdd.getNumPartitions() == n_all
    assert plain.count() == 25


def test_pyiceberg_pushdown_projects_through_transforms(spark, tdir):
    """DSv2 pushdown is now partition-transform-aware (round-11 ask #8):
    a bucket-equality filter prunes input partitions through each
    file's OWN spec (inclusive projection) even when min/max bounds
    cannot help, and results stay exact via Spark's residual filter."""
    from simple_anonymizer_spark.sources.iceberg import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    df = (spark.range(0, 200)
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("t"), F.col("id")).alias("text")))
    spec = [("doc_id", "bucket[8]")]
    df = df.repartition(8, *I.partition_transform_columns(df, spec))
    I.create_iceberg(df, tdir, partition_by=spec)
    n_files = len(I.iceberg_plan_files(tdir))
    assert n_files == 8
    conf = "spark.sql.python.filterPushdown.enabled"
    spark.conf.set(conf, "true")
    try:
        hit = (spark.read.format("pyiceberg")
               .option("pushdown", "true").load(tdir)
               .where(F.col("doc_id") == 123))
        # bucket equality keeps exactly the one matching bucket file
        # (bounds would also prune here, so pin the stronger bound)
        assert hit.rdd.getNumPartitions() == 1
        assert [r.doc_id for r in hit.collect()] == [123]
    finally:
        spark.conf.unset(conf)
