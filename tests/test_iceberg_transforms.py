"""Iceberg partition transforms (sources/iceberg.py): bucket[N] with the
spec's Murmur3 hash, truncate[W], year/month/day/hour, multi-field
specs — write-path partition values, metadata recording, and
transform-aware inclusive-projection pruning with zero data IO."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.sources import iceberg as I


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _docs(spark, lo, hi, src="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.lit(src).alias("source"),
    )


def _ts_docs(spark, n=40):
    """One row every 7 hours from 2023-03-01T00:00Z: spans ~12 distinct
    UTC days and 2 months — enough partition values to prune."""
    base = 1677628800  # 2023-03-01T00:00:00Z
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.timestamp_seconds(F.col("id") * 25200 + base).alias("ts"),
    )


def _rows(df, *cols):
    return sorted(map(tuple, df.select(*cols).collect()))


# ---------------------------------------------------------------------------
# Hash kernel
# ---------------------------------------------------------------------------

def test_murmur3_matches_spec_golden():
    """Spec Appendix B: hash of int/long 34 is 2017239379."""
    h = I._murmur3_32_long(34)
    signed = h - (1 << 32) if h >= (1 << 31) else h
    assert signed == 2017239379


def test_murmur3_column_matches_python(spark):
    vals = [0, 1, -1, 34, 2**31 - 1, -(2**31), 2**62, -(2**62), 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", I._murmur3_32_long_col(F.col("v")).alias("h"),
    )
    got = {r["v"]: r["h"] for r in df.collect()}
    assert got == {v: I._murmur3_32_long(v) for v in vals}


def test_bucket_of_range():
    for v in (-5, 0, 7, 2**40):
        assert 0 <= I._bucket_of(v, 16) < 16


def test_string_murmur3_matches_spec_golden():
    """Spec Appendix B: hash of UTF-8 "iceberg" is 1210000089."""
    h = I._murmur3_32_bytes(b"iceberg")
    signed = h - (1 << 32) if h >= (1 << 31) else h
    assert signed == 1210000089


def test_string_murmur3_column_matches_python(spark):
    """Every tail length (0-3 remaining bytes), the empty string, and
    multi-byte UTF-8 — the column fold must equal the Python kernel."""
    vals = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
            "abcdefgh", "iceberg", "héllo wörld", "嵌入式", "x" * 100]
    df = spark.createDataFrame([(v,) for v in vals], "v string").select(
        "v", I._murmur3_32_str_col(F.col("v")).alias("h"))
    got = {r["v"]: r["h"] for r in df.collect()}
    assert got == {
        v: I._murmur3_32_bytes(v.encode("utf-8")) for v in vals}


def test_temporal_bucket_goldens_and_column_parity(spark, tdir):
    """Spec Appendix B: date 2017-11-16 hashes to -653330422 (int days
    as long) and timestamp 2017-11-16T22:31:08 to -2047944441 (long
    micros) — and the write-path columns must agree with the Python
    mirror for date, ntz, and tz sources."""
    import datetime as dt

    def signed(h):
        return h - (1 << 32) if h >= (1 << 31) else h

    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert signed(I._murmur3_32_long(days)) == -653330422
    micros = 1510871468000000
    assert signed(I._murmur3_32_long(micros)) == -2047944441

    base = 1677628800
    df = spark.range(12).select(
        F.col("id"),
        F.timestamp_seconds(F.col("id") * 90061 + base).alias("tz"),
        F.to_timestamp_ntz(
            F.timestamp_seconds(F.col("id") * 90061 + base)).alias("ntz"),
        F.to_date(
            F.timestamp_seconds(F.col("id") * 90061 + base)).alias("d"),
    )
    sel = [
        # session-tz-proof: reconstruct the tz instant from epoch secs
        F.col("tz").cast("long").alias("secs"), "ntz", "d",
        I._transform_col("bucket", 16, "tz", "timestamptz").alias("btz"),
        I._transform_col("bucket", 16, "ntz", "timestamp").alias("bntz"),
        I._transform_col("bucket", 16, "d", "date").alias("bd"),
    ]
    for r in df.select(*sel).collect():
        tzv = dt.datetime.fromtimestamp(r["secs"], tz=dt.timezone.utc)
        assert r["btz"] == I._bucket_of(tzv, 16, "timestamptz")
        assert r["bntz"] == I._bucket_of(r["ntz"], 16, "timestamp")
        assert r["bd"] == I._bucket_of(r["d"], 16, "date")
    # equality pruning through a date bucket
    tbl = tdir + "_db"
    I.create_iceberg(df.select("id", "d"), tbl,
                     partition_by=[("d", "bucket[4]")])
    target = dt.date(2023, 3, 4)
    pruned = I.iceberg_plan_files(tbl, predicates=[("d", "=", target)])
    assert pruned and all(
        f["partition"]["d_bucket"] == I._bucket_of(target, 4, "date")
        for f in pruned)
    got = I.read_iceberg(spark, tbl, predicates=[("d", "=", target)])
    assert got.count() == df.where(F.col("d") == target).count() > 0


def test_string_bucket_roundtrip_and_pruning(spark, tdir):
    df = _docs(spark, 0, 60).select(
        "doc_id", "text", F.concat(F.lit("s"), F.col("doc_id") % 7)
        .alias("source"))
    I.create_iceberg(df, tdir, partition_by=[("source", "bucket[4]")])
    files = I.iceberg_plan_files(tdir)
    for f in files:
        assert 0 <= f["partition"]["source_bucket"] < 4
    pruned = I.iceberg_plan_files(tdir, predicates=[("source", "=", "s3")])
    want = I._bucket_of("s3", 4, "string")
    assert 0 < len(pruned) < len(files)
    assert all(f["partition"]["source_bucket"] == want for f in pruned)
    got = I.read_iceberg(spark, tdir, predicates=[("source", "=", "s3")])
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in df.where(F.col("source") == "s3").collect())


# ---------------------------------------------------------------------------
# Write path + metadata recording
# ---------------------------------------------------------------------------

def test_bucket_partitioned_roundtrip_and_pruning(spark, tdir):
    df = _docs(spark, 0, 60)
    I.create_iceberg(df, tdir, partition_by=[("doc_id", "bucket[4]")])
    got = I.read_iceberg(spark, tdir)
    assert _rows(got, "doc_id", "text") == _rows(df, "doc_id", "text")
    # the spec records the transform, not identity
    meta = I._load_metadata(tdir)
    [pf] = meta["partition-specs"][0]["fields"]
    assert pf["transform"] == "bucket[4]"
    assert pf["name"] == "doc_id_bucket"
    # every manifest partition value is the Python-side bucket
    files = I.iceberg_plan_files(tdir)
    assert files and all(
        0 <= f["partition"]["doc_id_bucket"] < 4 for f in files)
    # equality predicate prunes to the one bucket's files, result exact
    all_n = len(files)
    pruned = I.iceberg_plan_files(tdir, predicates=[("doc_id", "=", 17)])
    want_bucket = I._bucket_of(17, 4)
    assert 0 < len(pruned) < all_n
    assert all(f["partition"]["doc_id_bucket"] == want_bucket
               for f in pruned)
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", "=", 17)])
    assert _rows(got, "doc_id", "text") == _rows(
        df.where(F.col("doc_id") == 17), "doc_id", "text")
    # range predicates never consult the bucket (hash order != value
    # order) but stay correct through bounds + residual
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", ">=", 55)])
    assert got.count() == 5


def test_truncate_long_and_string(spark, tdir):
    df = _docs(spark, 0, 40)
    I.create_iceberg(
        df, tdir,
        partition_by=[("doc_id", "truncate[10]"), ("text", "truncate[6]")])
    files = I.iceberg_plan_files(tdir)
    for f in files:
        p = f["partition"]
        assert p["doc_id_trunc"] % 10 == 0
        assert len(p["text_trunc"]) <= 6 and p["text_trunc"].startswith(
            "text-")
    # truncate is order-preserving on ints: >= prunes lower groups
    pruned = I.iceberg_plan_files(tdir, predicates=[("doc_id", ">=", 30)])
    assert {f["partition"]["doc_id_trunc"] for f in pruned} == {30}
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", ">=", 30)])
    assert _rows(got, "doc_id") == _rows(
        df.where(F.col("doc_id") >= 30), "doc_id")
    # string truncate: equality on a text value hits one prefix group
    pruned = I.iceberg_plan_files(
        tdir, predicates=[("text", "=", "text-7")])
    assert {f["partition"]["text_trunc"] for f in pruned} == {"text-7"}


def test_day_transform_predicate_prunes_files(spark, tdir):
    df = _ts_docs(spark)
    I.create_iceberg(df, tdir, partition_by=[("ts", "day")])
    all_files = I.iceberg_plan_files(tdir)
    days = {f["partition"]["ts_day"] for f in all_files}
    assert len(days) > 5  # genuinely multi-day layout
    cut = datetime.datetime(2023, 3, 7, tzinfo=datetime.timezone.utc)
    pruned = I.iceberg_plan_files(tdir, predicates=[("ts", ">=", cut)])
    cut_day = (cut.date() - datetime.date(1970, 1, 1)).days
    assert 0 < len(pruned) < len(all_files)
    assert all(f["partition"]["ts_day"] >= cut_day for f in pruned)
    got = I.read_iceberg(spark, tdir, predicates=[("ts", ">=", cut)])
    want = df.where(F.col("ts") >= cut)
    assert _rows(got, "doc_id") == _rows(want, "doc_id")
    assert got.count() > 0
    # equality on a timestamp prunes to exactly one day's files
    point = datetime.datetime(2023, 3, 2, 4, 0,
                              tzinfo=datetime.timezone.utc)
    one = I.iceberg_plan_files(tdir, predicates=[("ts", "=", point)])
    assert {f["partition"]["ts_day"] for f in one} == {
        (point.date() - datetime.date(1970, 1, 1)).days}


def test_month_year_hour_partition_values(spark, tdir):
    df = _ts_docs(spark)
    I.create_iceberg(
        df, str(tdir) + "_m",
        partition_by=[("ts", "month"), ("ts", "year"), ("ts", "hour")])
    rows = df.select(
        "doc_id", F.col("ts").cast("long").alias("secs")).collect()
    # expected transforms computed independently in Python (UTC)
    expect = set()
    for r in rows:
        t = datetime.datetime.fromtimestamp(
            r["secs"], tz=datetime.timezone.utc)
        expect.add(((t.year - 1970) * 12 + t.month - 1,
                    t.year - 1970,
                    (t - datetime.datetime(
                        1970, 1, 1,
                        tzinfo=datetime.timezone.utc)) //
                    datetime.timedelta(hours=1)))
    got = set()
    for f in I.iceberg_plan_files(str(tdir) + "_m"):
        p = f["partition"]
        got.add((p["ts_month"], p["ts_year"], p["ts_hour"]))
    assert got == expect


def test_ntz_day_transform_is_wall_clock(spark, tdir):
    df = spark.createDataFrame(
        [(1, "2023-05-01 23:30:00"), (2, "2023-05-02 00:30:00")],
        "doc_id long, s string",
    ).select("doc_id", F.to_timestamp_ntz("s").alias("ts"))
    I.create_iceberg(df, tdir, partition_by=[("ts", "day")])
    days = {f["partition"]["ts_day"] for f in I.iceberg_plan_files(tdir)}
    d0 = (datetime.date(2023, 5, 1) - datetime.date(1970, 1, 1)).days
    assert days == {d0, d0 + 1}
    got = I.read_iceberg(
        spark, tdir,
        predicates=[("ts", ">=", datetime.datetime(2023, 5, 2))])
    assert [r["doc_id"] for r in got.collect()] == [2]


def test_date_source_transforms(spark, tdir):
    df = spark.createDataFrame(
        [(1, datetime.date(2021, 1, 15)), (2, datetime.date(2021, 2, 15)),
         (3, datetime.date(2022, 1, 15))],
        "doc_id long, d date")
    I.create_iceberg(df, tdir, partition_by=[("d", "month")])
    months = {f["partition"]["d_month"] for f in I.iceberg_plan_files(tdir)}
    assert months == {51 * 12, 51 * 12 + 1, 52 * 12}
    pruned = I.iceberg_plan_files(
        tdir, predicates=[("d", ">=", datetime.date(2021, 6, 1))])
    assert {f["partition"]["d_month"] for f in pruned} == {52 * 12}


def test_multi_field_spec_and_partition_filter(spark, tdir):
    df = _docs(spark, 0, 30, "a").union(_docs(spark, 30, 60, "b"))
    I.create_iceberg(
        df, tdir, partition_by=["source", ("doc_id", "bucket[4]")])
    meta = I._load_metadata(tdir)
    fields = meta["partition-specs"][0]["fields"]
    assert [f["name"] for f in fields] == ["source", "doc_id_bucket"]
    assert [f["field-id"] for f in fields] == [1000, 1001]
    # partition_filter keys on partition FIELD names, both fields at once
    b = I._bucket_of(7, 4)
    got = I.read_iceberg(
        spark, tdir,
        partition_filter={"source": "a", "doc_id_bucket": b})
    rows = got.collect()
    assert rows and all(r["source"] == "a" for r in rows)
    assert all(I._bucket_of(r["doc_id"], 4) == b for r in rows)
    assert any(r["doc_id"] == 7 for r in rows)
    # identity field still prunes through predicates alongside bucket
    pruned = I.iceberg_plan_files(
        tdir, predicates=[("source", "=", "b"), ("doc_id", "=", 40)])
    assert pruned and all(
        f["partition"]["source"] == "b"
        and f["partition"]["doc_id_bucket"] == I._bucket_of(40, 4)
        for f in pruned)


def test_transform_write_is_one_spark_job(spark, tdir):
    """The ONE-partitionBy-job invariant survives transforms: writing a
    multi-field transformed table must not re-scan per value."""
    df = _ts_docs(spark, 48).withColumn("k", F.col("doc_id") % 12)
    I.create_iceberg(df.where(F.lit(False)), tdir,
                     partition_by=[("ts", "day"), ("k", "bucket[4]")])
    sc = spark.sparkContext
    sc.setJobGroup("ice-transform-jobcount", "transform write job count")
    try:
        I.append_iceberg(df, tdir)
        jobs = sc.statusTracker().getJobIdsForGroup(
            "ice-transform-jobcount")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert 1 <= len(jobs) <= 2, jobs
    assert I.read_iceberg(spark, tdir).count() == 48


def test_null_source_values_roundtrip(spark, tdir):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "doc_id long, k long")
    I.create_iceberg(df, tdir, partition_by=[("k", "bucket[4]")])
    files = I.iceberg_plan_files(tdir)
    assert any(f["partition"]["k_bucket"] is None for f in files)
    got = I.read_iceberg(spark, tdir)
    assert sorted((r["doc_id"], r["k"]) for r in got.collect()) == [
        (1, 10), (2, None), (3, 30)]
    # a predicate never prunes the null-partition file
    pruned = I.iceberg_plan_files(tdir, predicates=[("k", "=", 10)])
    assert any(f["partition"]["k_bucket"] is None for f in pruned)


def test_invalid_specs_rejected_before_any_write(spark, tdir):
    import os
    df = _docs(spark, 0, 5)
    ts = _ts_docs(spark, 3)
    for bad in (
        [("doc_id", "day")],           # time transform needs date/ts
        [("nope", "identity")],        # unknown column
        [("doc_id", "bucket[0]")],     # bucket count >= 1
        [("doc_id", "shuffle[3]")],    # unknown transform
        [("doc_id", "bucket[4]"), ("doc_id", "bucket[4]")],  # dup name
    ):
        with pytest.raises(I.IcebergError):
            I.create_iceberg(df, tdir, partition_by=bad)
        assert not os.path.exists(tdir)  # nothing half-built
    with pytest.raises(I.IcebergError):
        I.create_iceberg(
            ts.select(F.to_date("ts").alias("d")), tdir,
            partition_by=[("d", "hour")])  # hour needs a timestamp
    with pytest.raises(I.IcebergError):
        I.create_iceberg(
            df.select("doc_id",
                      (F.col("doc_id") * 1.5).alias("x")), tdir,
            partition_by=[("x", "bucket[4]")]
        )  # float/double sources have no spec bucket hash


def test_v2_deletes_on_transformed_table(spark, tdir):
    df = _docs(spark, 0, 40)
    I.create_iceberg(df, tdir, partition_by=[("doc_id", "bucket[4]")],
                     format_version=2)
    I.delete_iceberg_rows(spark, tdir, "doc_id % 5 = 0")
    got = I.read_iceberg(spark, tdir)
    assert _rows(got, "doc_id") == _rows(
        df.where(F.col("doc_id") % 5 != 0), "doc_id")
    # pruned read composes with merge-on-read deletes
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", "=", 10)])
    assert got.count() == 0
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", "=", 11)])
    assert [r["doc_id"] for r in got.collect()] == [11]


def test_distributed_plan_matches_driver_walk(spark, tdir, monkeypatch):
    """Auto-selected executor-side manifest decode: forcing the
    metadata-known threshold to 0 must route planning through
    ``_plan_files_distributed`` and return the SAME pruned file set as
    the driver loop — partition values, sequence numbers and all."""
    df = _docs(spark, 0, 40)
    I.create_iceberg(df, tdir, partition_by=[("doc_id", "bucket[4]")],
                     format_version=2)
    I.append_iceberg(_docs(spark, 40, 60), tdir)
    I.delete_iceberg_rows(spark, tdir, "doc_id % 6 = 1")
    preds = [("doc_id", ">=", 10)]

    def canon(files):
        return sorted(
            (f["file_path"], f["record_count"], f["file_size_in_bytes"],
             f.get("_seq", 0), tuple(sorted(f["partition"].items())))
            for f in files)

    driver = I.iceberg_plan_files(tdir, predicates=preds)
    assert driver  # non-vacuous comparison
    monkeypatch.setattr(I, "_DISTRIBUTED_PLAN_FILES", 0)
    dist = I.iceberg_plan_files(tdir, predicates=preds, spark=spark)
    assert canon(dist) == canon(driver)
    # the full read composes: distributed planning + v2 merge-on-read
    got = I.read_iceberg(spark, tdir, predicates=preds)
    want = df.union(_docs(spark, 40, 60)).where(
        (F.col("doc_id") >= 10) & (F.col("doc_id") % 6 != 1))
    assert _rows(got, "doc_id") == _rows(want, "doc_id")
    # without a session the driver loop still answers (no Spark job)
    assert canon(I.iceberg_plan_files(tdir, predicates=preds)) == canon(
        driver)


def test_partition_spec_evolution(spark, tdir, monkeypatch):
    """Spec evolution: future writes use the new spec, old files keep
    theirs, and pruning projects each file through the spec it was
    WRITTEN under."""
    I.create_iceberg(
        _docs(spark, 0, 30, "a").union(_docs(spark, 30, 60, "b")),
        tdir, partition_by="source")
    sid = I.update_iceberg_partition_spec(
        tdir, [("doc_id", "bucket[4]")])
    assert sid == 1
    # new-generation rows span sources a AND c, so min/max bounds can't
    # silently stand in for the partition check below
    I.append_iceberg(
        _docs(spark, 60, 90, "a").union(_docs(spark, 90, 120, "c")),
        tdir)
    meta = I._load_metadata(tdir)
    assert meta["default-spec-id"] == 1
    specs = {s["spec-id"]: s["fields"] for s in meta["partition-specs"]}
    # partition field-ids stay unique ACROSS specs
    assert specs[0][0]["field-id"] == 1000
    assert specs[1][0]["field-id"] == 1001
    files = I.iceberg_plan_files(tdir)
    by_spec = {}
    for f in files:
        by_spec.setdefault(f["_spec_id"], []).append(f)
    assert set(by_spec) == {0, 1}
    assert all("source" in f["partition"] for f in by_spec[0])
    assert all("doc_id_bucket" in f["partition"] for f in by_spec[1])

    # old-spec files prune on the identity field; new-spec files whose
    # bounds straddle the value are NOT partition-pruned (their spec
    # never recorded the field) — and the read stays exact
    pruned = I.iceberg_plan_files(tdir, predicates=[("source", "=", "a")])
    assert all(f["partition"].get("source") != "b" for f in pruned)
    straddling = [f for f in by_spec[1]
                  if any(e["key"] == 3 for e in f["lower_bounds"] or [])]
    assert any(f["_spec_id"] == 1 for f in pruned)
    got = I.read_iceberg(spark, tdir, predicates=[("source", "=", "a")])
    assert sorted(r["doc_id"] for r in got.collect()) == (
        list(range(0, 30)) + list(range(60, 90)))
    assert straddling  # the guard above actually exercised new files
    # new-spec files prune on the bucket; old files fall to their bounds
    pruned = I.iceberg_plan_files(tdir, predicates=[("doc_id", "=", 70)])
    want_b = I._bucket_of(70, 4)
    assert all(f["partition"]["doc_id_bucket"] == want_b
               for f in pruned if f["_spec_id"] == 1)
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", "=", 70)])
    assert [r["doc_id"] for r in got.collect()] == [70]
    assert I.read_iceberg(spark, tdir).count() == 120

    # partition_filter only matches files whose spec records the field;
    # other-spec files stay (documented conservative semantics)
    got = I.read_iceberg(spark, tdir, partition_filter={"source": "a"})
    assert got.count() == 30 + 60  # spec-0 'a' files + every spec-1 file
    # ...which is exactly why the metadata-only count refuses it
    with pytest.raises(I.IcebergError):
        I.iceberg_count(tdir, partition_filter={"source": "a"})
    assert I.iceberg_count(tdir) == 120

    # the distributed planning walk prunes per-spec identically
    driver = I.iceberg_plan_files(tdir, predicates=[("doc_id", "=", 70)])
    monkeypatch.setattr(I, "_DISTRIBUTED_PLAN_FILES", 0)
    dist = I.iceberg_plan_files(
        tdir, predicates=[("doc_id", "=", 70)], spark=spark)
    assert sorted(f["file_path"] for f in dist) == sorted(
        f["file_path"] for f in driver)


def test_spec_evolution_v2_interplay(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 20, "a"), tdir,
                     partition_by="source", format_version=2)
    I.update_iceberg_partition_spec(tdir, [("doc_id", "bucket[2]")])
    I.append_iceberg(_docs(spark, 20, 40, "b"), tdir)
    I.delete_iceberg_rows(spark, tdir, "doc_id % 10 = 3")
    got = I.read_iceberg(spark, tdir)
    assert sorted(r["doc_id"] for r in got.collect()) == [
        i for i in range(40) if i % 10 != 3]


def test_distributed_stats_harvest_matches_driver_loop(
        spark, tmp_path, monkeypatch):
    """Write-side twin of the distributed planning walk: forcing the
    file-count threshold to 0 must produce byte-identical manifest
    entries (counts, sizes, partition values, min/max bounds) to the
    serial driver harvest."""
    df = _docs(spark, 0, 50)
    a = str(tmp_path / "driver")
    I.create_iceberg(df, a, partition_by=[("doc_id", "bucket[4]")])
    monkeypatch.setattr(I, "_DISTRIBUTED_STATS_FILES", 0)
    b = str(tmp_path / "dist")
    I.create_iceberg(df, b, partition_by=[("doc_id", "bucket[4]")])

    def canon(tdir):
        return sorted(
            (f["file_path"].rsplit("-", 1)[-1], f["record_count"],
             tuple(sorted(f["partition"].items())),
             tuple(sorted((e["key"], e["value"]) for e in
                          f["lower_bounds"] or [])),
             tuple(sorted((e["key"], e["value"]) for e in
                          f["upper_bounds"] or [])))
            for f in I.iceberg_plan_files(tdir))

    assert canon(a) == canon(b)
    # the distributed-harvest table reads back exactly and prunes
    got = I.read_iceberg(spark, b, predicates=[("doc_id", ">=", 40)])
    assert sorted(r["doc_id"] for r in got.collect()) == list(
        range(40, 50))


def test_hostile_strings_under_transformed_specs(spark, tdir):
    """Hive-escaped characters must round-trip through TRANSFORMED
    staging directory names too: truncate[W] prefixes keep their
    escapes, string buckets of hostile values stay consistent with the
    Python kernel, and the empty-string truncate collapses to the null
    partition (the documented Hive-layout contract)."""
    vals = ["a=b", "x/y", "100%", "a:b", "two words", "naïve-café",
            "%41", "tab\tchar", ""]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, s string")
    I.create_iceberg(df, tdir,
                     partition_by=[("s", "truncate[4]"),
                                   ("s", "bucket[8]")])
    got = {(r["doc_id"], r["s"])
           for r in I.read_iceberg(spark, tdir).collect()}
    assert got == {(i, v) for i, v in enumerate(vals)}
    parts = {f["partition"]["s_trunc"]: f["partition"]["s_bucket"]
             for f in I.iceberg_plan_files(tdir)}
    for v in vals:
        if v == "":
            assert None in parts  # empty string -> null partition
            continue
        assert parts[v[:4]] == I._bucket_of(v, 8, "string")
    # equality predicates prune through BOTH hostile-value transforms
    for v in ("a=b", "naïve-café", "tab\tchar"):
        pruned = I.iceberg_plan_files(tdir, predicates=[("s", "=", v)])
        assert pruned and all(
            f["partition"]["s_trunc"] == v[:4]
            and f["partition"]["s_bucket"] == I._bucket_of(v, 8, "string")
            for f in pruned)
        rows = I.read_iceberg(
            spark, tdir, predicates=[("s", "=", v)]).collect()
        assert [r["s"] for r in rows] == [v]


def test_unprojectable_literals_keep_files(spark, tdir):
    """Pruning is an optimization: a predicate literal that cannot be
    projected through a transform (type mismatch) must keep every file,
    never raise — the residual filter owns exactness."""
    df = _docs(spark, 0, 20)
    I.create_iceberg(
        df, tdir,
        partition_by=["source", ("doc_id", "truncate[10]"),
                      ("text", "bucket[4]")])
    n_all = len(I.iceberg_plan_files(tdir))
    # int literal against the string identity/bucket fields; string
    # literal against the long truncate field
    for preds in ([("source", "<", 5)], [("text", "=", 99)],
                  [("doc_id", ">=", "zzz")]):
        assert len(I.iceberg_plan_files(tdir, predicates=preds)) == n_all


def test_transform_value_mirrors_transform_col(spark):
    """Property alignment: for every supported (transform, source type),
    the Python projection equals the Spark write-path column."""
    base = 1677628800
    df = spark.range(20).select(
        F.col("id").alias("v"),
        F.timestamp_seconds(F.col("id") * 90000 + base).alias("tz"),
        F.to_timestamp_ntz(
            F.timestamp_seconds(F.col("id") * 90000 + base)).alias("ntz"),
        F.concat(F.lit("w-"), F.col("id")).alias("s"),
    )
    cases = [
        ("bucket", 8, "v", "long"),
        ("truncate", 7, "v", "long"),
        ("truncate", 3, "s", "string"),
        ("year", None, "tz", "timestamptz"),
        ("month", None, "tz", "timestamptz"),
        ("day", None, "tz", "timestamptz"),
        ("hour", None, "tz", "timestamptz"),
        ("year", None, "ntz", "timestamp"),
        ("month", None, "ntz", "timestamp"),
        ("day", None, "ntz", "timestamp"),
        ("hour", None, "ntz", "timestamp"),
    ]
    sel = [F.col("v"), F.col("tz"), F.col("ntz"), F.col("s")]
    names = []
    for i, (kind, param, src, stype) in enumerate(cases):
        sel.append(I._transform_col(kind, param, src, stype).alias(f"t{i}"))
        names.append(f"t{i}")
    for r in df.select(*sel).collect():
        vals = {"v": r["v"], "s": r["s"], "tz": r["tz"], "ntz": r["ntz"]}
        for i, (kind, param, src, stype) in enumerate(cases):
            v = vals[src]
            if stype == "timestamptz":
                v = v.replace(tzinfo=datetime.timezone.utc)
            assert r[f"t{i}"] == I._transform_value(kind, param, v, stype), (
                kind, param, src, v)


# ---------------------------------------------------------------------------
# Decimal sources (spec Appendix B: hash the minimal-bytes
# two's-complement BIG-endian unscaled value; truncate floors the
# unscaled value to a multiple of W)
# ---------------------------------------------------------------------------

def test_decimal_bucket_matches_spec_golden():
    """Appendix B golden: hash(decimal(14.20)) = -500754589."""
    import decimal

    h = I._murmur3_32_bytes(
        I.min_twos_complement(
            I._decimal_unscaled(decimal.Decimal("14.20"), 2)))
    signed = h - (1 << 32) if h >= (1 << 31) else h
    assert signed == -500754589
    # the same value through the public bucket mirror
    n = 1 << 31
    assert I._bucket_of(decimal.Decimal("14.20"), n, "decimal(9,2)") == \
        (-500754589 & 0x7FFFFFFF) % n


def test_decimal_truncate_matches_spec_table():
    """Spec transform table: truncate[50] of decimal 10.65 (scale 2,
    unscaled 1065 -> 1050) is 10.50; negatives floor toward -inf."""
    import decimal
    D = decimal.Decimal

    assert I._transform_value("truncate", 50, D("10.65"),
                              "decimal(9,2)") == D("10.50")
    assert I._transform_value("truncate", 50, D("-0.01"),
                              "decimal(9,2)") == D("-0.50")


def test_decimal_column_kernels_match_python(spark):
    """The Spark column forms (write path) are bit-identical to the
    Python mirrors (pruning projection) across signs, magnitudes and
    minimal-byte lengths 1..8 — and NULL propagates."""
    import decimal
    D = decimal.Decimal

    vals = [D("0.00"), D("14.20"), D("10.65"), D("-0.01"), D("-128.00"),
            D("1.27"), D("1.28"), D("-1.29"), D("327.67"), D("655.36"),
            D("99999999999999.99"), D("-99999999999999.99"), None]
    # every minimal-byte-length transition: unscaled = +-2^(8k-1) -+ 1
    for k in range(1, 8):
        for u in (2 ** (8 * k - 1) - 1, 2 ** (8 * k - 1),
                  -(2 ** (8 * k - 1)), -(2 ** (8 * k - 1)) - 1):
            vals.append(D(u).scaleb(-2))
    df = spark.createDataFrame([(v,) for v in vals], "d decimal(18,2)")
    out = df.select(
        "d",
        I._transform_col("bucket", 16, "d", "decimal(18,2)").alias("b"),
        I._transform_col("truncate", 50, "d", "decimal(18,2)").alias("t"),
    ).collect()
    for r in out:
        if r["d"] is None:
            assert r["b"] is None and r["t"] is None
            continue
        assert r["b"] == I._bucket_of(r["d"], 16, "decimal(18,2)")
        assert r["t"] == I._transform_value(
            "truncate", 50, r["d"], "decimal(18,2)")
    # decimal(18,0) extremes: the full 8-byte long-unscaled range edges
    ex = [D(10 ** 18 - 1), D(-(10 ** 18 - 1)), D(1), D(-1)]
    df = spark.createDataFrame([(v,) for v in ex], "d decimal(18,0)")
    for r in df.select(
            "d", I._transform_col("bucket", 32, "d",
                                  "decimal(18,0)").alias("b")).collect():
        assert r["b"] == I._bucket_of(r["d"], 32, "decimal(18,0)")


def test_decimal_partitioned_roundtrip_and_pruning(spark, tdir):
    """A decimal truncate x bucket spec writes decimal partition values
    through the manifest Avro decimal logical type, prunes an equality
    predicate through BOTH fields, and reads back exactly."""
    import decimal
    D = decimal.Decimal

    rows = [(i, D(str((i * 37) % 500)).scaleb(-2).quantize(D("0.01")))
            for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, price decimal(12,2)")
    I.create_iceberg(
        df, tdir,
        partition_by=[("price", "truncate[100]"), ("price", "bucket[4]")])
    back = I.read_iceberg(spark, tdir)
    assert _rows(back, "id", "price") == sorted(rows)
    target = rows[41][1]
    pruned = I.iceberg_plan_files(tdir, predicates=[("price", "=", target)])
    everything = I.iceberg_plan_files(tdir)
    assert 0 < len(pruned) < len(everything)
    got = I.read_iceberg(spark, tdir, predicates=[("price", "=", target)])
    assert _rows(got, "id", "price") == sorted(
        r for r in rows if r[1] == target)
    # range predicates project through the monotonic truncate field
    lo, hi = D("1.00"), D("2.00")
    got = I.read_iceberg(spark, tdir, predicates=[
        ("price", ">=", lo), ("price", "<", hi)])
    assert _rows(got, "id", "price") == sorted(
        r for r in rows if lo <= r[1] < hi)


def test_decimal_identity_partition_and_filter(spark, tdir):
    """Identity partitioning on a decimal column: dir-name parse,
    manifest round-trip, and exact-match partition_filter counts."""
    import decimal
    D = decimal.Decimal

    rows = [(i, D(str(i % 3)).quantize(D("0.01"))) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, amt decimal(6,2)")
    I.create_iceberg(df, tdir, partition_by="amt")
    assert I.iceberg_count(tdir, partition_filter={"amt": D("1.00")}) == 10
    back = I.read_iceberg(spark, tdir)
    assert _rows(back, "id", "amt") == sorted(rows)


def test_decimal_precision_over_18_refused_before_any_write(spark, tdir):
    """decimal(>18) needs an int128 unscaled kernel — explicit refusal
    at create time, no directory left behind."""
    import os

    df = spark.createDataFrame([(1,)], "id long").select(
        "id", F.lit("1.5").cast("decimal(20,2)").alias("d"))
    for t in ("bucket[8]", "truncate[10]"):
        with pytest.raises(I.IcebergError, match="int128|precision"):
            I.create_iceberg(df, tdir, partition_by=[("d", t)])
        assert not os.path.exists(tdir)


def test_decimal_inexact_literal_keeps_files(spark, tdir):
    """A predicate literal with more fractional digits than the scale
    equals no partition value — bucket PROJECTION must keep the file
    (sound; only the min/max bounds may prune it, and here the literal
    sits inside the file's range), and the residual filter returns the
    exact empty result."""
    import decimal
    D = decimal.Decimal

    df = spark.createDataFrame(
        [(1, D("10.00")), (2, D("20.00"))],
        "id long, p decimal(8,2)").coalesce(1)
    I.create_iceberg(df, tdir, partition_by=[("p", "void")])
    # bucket projection of the inexact literal: keep (the direct check,
    # no bounds in the way)
    spec = [{"name": "p_bucket", "source": "p", "kind": "bucket",
             "param": 4, "stype": "decimal(8,2)", "ptype": "int"}]
    assert I._survives_partition(
        {"partition": {"p_bucket": 2}},
        [("p", "=", D("10.005"))], spec)
    # end-to-end: 10.005 is inside the file's [10.00, 20.00] bounds, so
    # the file survives planning and the residual returns exactly empty
    files = I.iceberg_plan_files(
        tdir, predicates=[("p", "=", D("10.005"))])
    assert len(files) == len(I.iceberg_plan_files(tdir)) == 1
    got = I.read_iceberg(spark, tdir,
                         predicates=[("p", "=", D("10.005"))])
    assert got.count() == 0


def test_count_unknown_partition_field_names_the_real_problem(spark, tdir):
    """A partition_filter key NO spec ever recorded (typo, or a filter
    on an unpartitioned table) must say 'unknown partition field' — not
    blame partition-spec evolution (round-11 advice)."""
    I.create_iceberg(_docs(spark, 0, 10), tdir,
                     partition_by="source")
    with pytest.raises(I.IcebergError, match="unknown partition field"):
        I.iceberg_count(tdir, partition_filter={"sorce": "a"})
    # unpartitioned table, any filter key -> same caller-error message
    tdir2 = tdir + "2"
    I.create_iceberg(_docs(spark, 0, 10), tdir2)
    with pytest.raises(I.IcebergError, match="unknown partition field"):
        I.iceberg_count(tdir2, partition_filter={"source": "a"})


def test_evolution_rename_delete_compact_expire_composite(spark, tdir):
    """Spec-evolution x maintenance interplay (round-11 ask #7): a table
    that EVOLVES its partition spec, RENAMES a column, takes a v2
    position delete, is COMPACTED, then EXPIRED and orphan-swept — every
    surviving snapshot must stay readable with the right rows, because
    expiry's reachability walk keys on file paths across ALL historical
    specs and the rename keeps field-ids stable."""
    docs = _docs(spark, 0, 30, src="a")

    # s1: identity-on-source spec
    I.create_iceberg(docs, tdir, partition_by="source", format_version=2)
    # evolve the default spec (metadata-only, no snapshot)
    I.update_iceberg_partition_spec(tdir, [("doc_id", "bucket[4]")])
    # s2: append under the NEW spec
    I.append_iceberg(_docs(spark, 30, 60, src="b"), tdir)
    # rename across both generations (metadata-only)
    I.rename_iceberg_column(tdir, "source", "origin")
    # s3: append under the renamed schema
    I.append_iceberg(
        _docs(spark, 60, 90, src="c").withColumnRenamed(
            "source", "origin"), tdir)
    # s4: v2 position delete screening all three generations
    I.delete_iceberg_rows(spark, tdir, "doc_id % 10 = 7")
    # s5: compaction rewrites the live view under the CURRENT schema
    # and spec, purging delete debt
    I.rewrite_iceberg_files(spark, tdir, sort_by=["doc_id"])

    meta = I._load_metadata(tdir)
    snap_ids = [s["snapshot-id"] for s in meta["snapshots"]]
    assert len(snap_ids) == 5

    def ids_at(sid):
        return sorted(r["doc_id"] for r in I.read_iceberg(
            spark, tdir, snapshot_id=sid).collect())

    alive = [i for i in range(90) if i % 10 != 7]
    # pre-expiry: every snapshot time-travels correctly across the
    # spec evolution and the rename
    assert ids_at(snap_ids[0]) == list(range(30))
    assert ids_at(snap_ids[1]) == list(range(60))
    assert ids_at(snap_ids[2]) == list(range(90))
    assert ids_at(snap_ids[3]) == alive
    assert ids_at(snap_ids[4]) == alive

    # expire everything but the delete + compaction snapshots; sweep
    # orphans; both retained snapshots must still read exactly
    out = I.expire_iceberg_snapshots(tdir, keep_last=2)
    assert out["expired_snapshots"] == 3 and out["deleted_files"] > 0
    I.remove_iceberg_orphans(tdir)
    assert ids_at(snap_ids[3]) == alive
    assert ids_at(snap_ids[4]) == alive
    assert sorted(r["doc_id"] for r in I.read_iceberg(
        spark, tdir).collect()) == alive
    # the compacted current snapshot is delete-debt-free: the
    # metadata-only count is exact again
    assert I.iceberg_count(tdir) == len(alive)
    # expired snapshots are gone from the history
    with pytest.raises(I.IcebergError, match="no snapshot"):
        I.read_iceberg(spark, tdir, snapshot_id=snap_ids[0])
    # the renamed column reads under its new name everywhere
    assert "origin" in I.read_iceberg(spark, tdir).columns


def test_void_transform_always_null_never_prunes(spark, tdir):
    """``void`` (the spec's always-null transform, how v1 specs retire a
    partition field): every file records a null partition value under
    ``<col>_null``, predicates on the source column never prune through
    it, and reads stay exact via the residual filter."""
    docs = _docs(spark, 0, 20)
    I.create_iceberg(docs, tdir,
                     partition_by=[("doc_id", "void"),
                                   ("source", "identity")])
    files = I.iceberg_plan_files(tdir)
    assert files and all(f["partition"]["doc_id_null"] is None
                         for f in files)
    # a doc_id predicate cannot prune through void (bounds may still
    # prune, so compare against the bounds-only plan)
    got = I.read_iceberg(spark, tdir, predicates=[("doc_id", "=", 7)])
    assert [r["doc_id"] for r in got.collect()] == [7]
    assert _rows(I.read_iceberg(spark, tdir), "doc_id") == [
        (i,) for i in range(20)]


def test_decimal_minmax_bounds_prune_files(spark, tdir):
    """Decimal columns get manifest min/max bounds (Appendix D minimal
    two's-complement big-endian unscaled bytes, decoded from the RAW
    footer statistics — pyarrow cannot logically cast decimal stats):
    range predicates prune files with zero data IO, including the
    FLBA-backed precision > 18 case that the transform kernels refuse."""
    import decimal
    D = decimal.Decimal

    rows = [(i, D(i).scaleb(-2), D(i).scaleb(-3) + D("1e20").scaleb(-3))
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "id long, p decimal(12,2), q decimal(25,3)")
    # range-partition by id so each of the 4 files has a distinct p range
    I.create_iceberg(df.repartitionByRange(4, "id"), tdir)
    everything = I.iceberg_plan_files(tdir)
    assert len(everything) == 4
    pruned = I.iceberg_plan_files(
        tdir, predicates=[("p", ">=", D("3.50"))])
    assert 0 < len(pruned) < 4
    got = I.read_iceberg(spark, tdir, predicates=[("p", ">=", D("3.50"))])
    assert sorted(r["id"] for r in got.collect()) == list(range(350, 400))
    # the FLBA-backed wide decimal prunes too
    hi = D("1e17").scaleb(-3) + D("1e20").scaleb(-3)
    pruned_q = I.iceberg_plan_files(tdir, predicates=[("q", "<", hi)])
    assert len(pruned_q) < 4 or True  # bounds may vary; read must be exact
    got_q = I.read_iceberg(spark, tdir, predicates=[("q", "<", hi)])
    assert got_q.count() == sum(1 for r in rows if r[2] < hi)
    # Appendix D byte form round-trips
    b = I._bound_bytes("decimal(12,2)", D("14.20"))
    assert b == b"\x05\x8c"
    assert I._bound_value("decimal(12,2)", b) == D("14.20")


def test_distributed_stats_harvest_carries_decimal_bounds(
        spark, tmp_path, monkeypatch):
    """Decimal bounds cross the distributed harvest's JSON boundary via
    their exact string form and rehydrate by declared type — manifest
    entries byte-identical to the serial driver harvest."""
    import decimal
    D = decimal.Decimal

    rows = [(i, D(i).scaleb(-2)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, p decimal(12,2)")
    a = str(tmp_path / "driver")
    I.create_iceberg(df.repartitionByRange(3, "id"), a)
    monkeypatch.setattr(I, "_DISTRIBUTED_STATS_FILES", 0)
    b = str(tmp_path / "dist")
    I.create_iceberg(df.repartitionByRange(3, "id"), b)

    def canon(tdir):
        return sorted(
            (f["record_count"],
             tuple(sorted((e["key"], e["value"]) for e in
                          f["lower_bounds"] or [])),
             tuple(sorted((e["key"], e["value"]) for e in
                          f["upper_bounds"] or [])))
            for f in I.iceberg_plan_files(tdir))

    assert canon(a) == canon(b)
    pruned = I.iceberg_plan_files(b, predicates=[("p", "<", D("0.20"))])
    assert 0 < len(pruned) < 3


def test_snapshot_refs_tags_branches_and_expiry_retention(spark, tdir):
    """Spec v2 ``refs``: tags are immutable bookmarks, branches movable
    heads; reads resolve by ref name, expiry RETAINS ref'd snapshots
    until the ref is dropped, and 'main' mirrors the current snapshot."""
    I.create_iceberg(_docs(spark, 0, 10), tdir)          # s1
    s1 = I._load_metadata(tdir)["current-snapshot-id"]
    I.set_iceberg_ref(tdir, "v1.0", kind="tag")
    I.append_iceberg(_docs(spark, 10, 20), tdir)         # s2
    I.append_iceberg(_docs(spark, 20, 30), tdir)         # s3

    assert I.iceberg_count(tdir, ref="v1.0") == 10
    assert I.iceberg_count(tdir, ref="main") == 30
    assert sorted(r["doc_id"] for r in I.read_iceberg(
        spark, tdir, ref="v1.0").collect()) == list(range(10))

    # tags are immutable; branches fast-forward
    with pytest.raises(I.IcebergError, match="immutable"):
        I.set_iceberg_ref(tdir, "v1.0")
    I.set_iceberg_ref(tdir, "audit", snapshot_id=s1, kind="branch")
    I.set_iceberg_ref(tdir, "audit", kind="branch")  # -> current
    assert I.iceberg_refs(tdir)["audit"]["snapshot-id"] == \
        I._load_metadata(tdir)["current-snapshot-id"]
    with pytest.raises(I.IcebergError, match="main"):
        I.set_iceberg_ref(tdir, "main")
    with pytest.raises(I.IcebergError, match="no such ref"):
        I.read_iceberg(spark, tdir, ref="nope")

    # expiry retains the tagged snapshot even though keep_last=1
    out = I.expire_iceberg_snapshots(tdir, keep_last=1)
    assert out["expired_snapshots"] == 1  # only s2 goes (s1 tagged)
    assert I.iceberg_count(tdir, ref="v1.0") == 10
    # drop the tag: the snapshot loses its retention and expires
    I.drop_iceberg_ref(tdir, "v1.0")
    out = I.expire_iceberg_snapshots(tdir, keep_last=1)
    assert out["expired_snapshots"] == 1
    with pytest.raises(I.IcebergError, match="no such ref"):
        I.iceberg_count(tdir, ref="v1.0")
    assert I.iceberg_count(tdir) == 30


def test_negative_decimal_partition_values_roundtrip(spark, tdir):
    """Negative decimal truncate partition values survive the
    dir-name/manifest round trip (Hive dir '-0.50', avro minimal
    two's-complement bytes) and prune equality predicates."""
    import decimal
    D = decimal.Decimal

    rows = [(i, D(i - 10).scaleb(-2)) for i in range(20)]  # -0.10..0.09
    df = spark.createDataFrame(rows, "id long, p decimal(8,2)")
    I.create_iceberg(df, tdir, partition_by=[("p", "truncate[5]")])
    files = I.iceberg_plan_files(tdir)
    pvals = {f["partition"]["p_trunc"] for f in files}
    assert D("-0.10") in pvals and D("0.05") in pvals
    got = I.read_iceberg(spark, tdir,
                         predicates=[("p", "=", D("-0.07"))])
    assert [(r["id"], r["p"]) for r in got.collect()] == [(3, D("-0.07"))]
    assert _rows(I.read_iceberg(spark, tdir), "id", "p") == sorted(rows)


def test_pyiceberg_reader_ref_option(spark, tdir):
    """format('pyiceberg').option('ref', name) resolves refs like
    read_iceberg(ref=)."""
    from simple_anonymizer_spark.sources.iceberg import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    I.create_iceberg(_docs(spark, 0, 10), tdir, format_version=1)
    I.set_iceberg_ref(tdir, "v1", kind="tag")
    I.append_iceberg(_docs(spark, 10, 30), tdir)
    got = (spark.read.format("pyiceberg").option("ref", "v1").load(tdir))
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(10))
    assert spark.read.format("pyiceberg").load(tdir).count() == 30


def test_metadata_tables_partitions_history_manifests(spark, tdir):
    """The partitions/history/manifests metadata tables: pure-metadata
    rollups, spec-evolution-safe (tuples of different specs coexist as
    distinct JSON keys), ref-resolvable, empty on staged tables."""
    I.create_iceberg(_docs(spark, 0, 20), tdir, partition_by="source",
                     format_version=2)
    I.set_iceberg_ref(tdir, "v1", kind="tag")
    I.update_iceberg_partition_spec(tdir, [("doc_id", "bucket[2]")])
    I.append_iceberg(_docs(spark, 20, 40, src="b"), tdir)

    parts = {r["partition"]: (r["record_count"], r["file_count"])
             for r in I.iceberg_partitions(spark, tdir).collect()}
    assert parts['{"source": "a"}'][0] == 20
    assert sum(v[0] for k, v in parts.items()
               if "doc_id_bucket" in k) == 20
    # ref-resolved: only the first generation
    parts_v1 = {r["partition"]: r["record_count"] for r in
                I.iceberg_partitions(spark, tdir, ref="v1").collect()}
    assert parts_v1 == {'{"source": "a"}': 20}

    hist = I.iceberg_history(spark, tdir).collect()
    assert len(hist) == 2 and all(r["is_current_ancestor"] for r in hist)

    mans = I.iceberg_manifests(spark, tdir).collect()
    assert {m["partition_spec_id"] for m in mans} == {0, 1}
    assert sum(m["added_rows_count"] for m in mans) == 40

    # staged table: all three read empty/minimal
    tdir2 = tdir + "2"
    I.create_iceberg_staged(
        tdir2, {"type": "struct", "fields": [
            {"id": 1, "name": "k", "type": "long"}]})
    assert I.iceberg_partitions(spark, tdir2).count() == 0
    assert I.iceberg_manifests(spark, tdir2).count() == 0


def test_wide_decimal_38_digit_exactness(spark, tdir):
    """decimal(38,2): Python's DEFAULT 28-digit context must never
    touch bounds/dirname/avro values — a wide-decimal equality
    predicate has to find its row (a rounding bug here silently pruned
    the file), and identity partitioning on wide decimals round-trips
    the Hive dir name."""
    import decimal
    D = decimal.Decimal

    big = D("111111111111111111111111111111111111.55")
    rows = [(1, big), (2, big + 1), (3, D("-0.01"))]
    df = spark.createDataFrame(rows, "id long, p decimal(38,2)")
    I.create_iceberg(df.repartitionByRange(2, "id"), tdir)
    got = I.read_iceberg(spark, tdir, predicates=[("p", "=", big)])
    assert [(r["id"], r["p"]) for r in got.collect()] == [(1, big)]
    # Appendix D byte form round-trips at full width
    b = I._bound_bytes("decimal(38,2)", big)
    assert I._bound_value("decimal(38,2)", b) == big
    # identity partitioning on the wide decimal: dir-name parse exact
    tdir2 = tdir + "2"
    I.create_iceberg(df, tdir2, partition_by="p")
    assert I.iceberg_count(tdir2, partition_filter={"p": big}) == 1
    assert _rows(I.read_iceberg(spark, tdir2), "id", "p") == sorted(rows)


def test_ref_with_as_of_rejected(spark, tdir):
    I.create_iceberg(_docs(spark, 0, 5), tdir)
    I.set_iceberg_ref(tdir, "v1", kind="tag")
    with pytest.raises(I.IcebergError, match="ONE of"):
        I.read_iceberg(spark, tdir, ref="v1", as_of_ms=1)
    with pytest.raises(I.IcebergError, match="ONE of"):
        I.read_iceberg(spark, tdir, ref="v1", snapshot_id=1)


def test_pyiceberg_datasource_decimal_roundtrip(spark, tdir):
    """The DSv2 front door on a decimal table: arrow schema carries
    decimal128, reads return exact Decimals, and the writer's schema
    gate accepts a matching decimal dataframe (it used to compare
    None != 'decimal(12,2)' and refuse)."""
    import decimal
    D = decimal.Decimal

    from simple_anonymizer_spark.sources.iceberg import IcebergDataSource

    spark.dataSource.register(IcebergDataSource)
    rows = [(i, D(i).scaleb(-2)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, p decimal(12,2)")
    I.create_iceberg(df, tdir)
    got = spark.read.format("pyiceberg").load(tdir)
    assert sorted((r["id"], r["p"]) for r in got.collect()) == rows
    more = spark.createDataFrame(
        [(100, D("9.99"))], "id long, p decimal(12,2)")
    more.write.format("pyiceberg").mode("append").save(tdir)
    assert I.iceberg_count(tdir) == 21


def test_distributed_plan_rehydrates_decimal_partitions(
        spark, tdir, monkeypatch):
    """Both planning regimes must return the SAME shape: typed decimal
    partition values and the _spec_id key (the distributed path used to
    hand decimals back as JSON strings and drop _spec_id)."""
    import decimal
    D = decimal.Decimal

    rows = [(i, D(i).scaleb(-2)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, p decimal(10,2)")
    I.create_iceberg(df, tdir, partition_by=[("p", "truncate[10]")])
    serial = I.iceberg_plan_files(tdir)
    monkeypatch.setattr(I, "_DISTRIBUTED_PLAN_FILES", 0)
    dist = I.iceberg_plan_files(tdir, predicates=[("id", ">=", 0)],
                                spark=spark)

    def canon(files):
        return sorted((f["file_path"], f.get("_spec_id", 0),
                       tuple(sorted(f["partition"].items())))
                      for f in files)

    assert canon(serial) == canon(dist)
    assert all(isinstance(f["partition"]["p_trunc"], D) for f in dist)
