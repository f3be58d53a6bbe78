"""WARC container conformance (sources/warc.py): record-level round
trips through the from-scratch ISO 28500 codec, per-record gzip member
layout, fixture-table parity against Parquet, the untrusted-bytes
ValueError contract, and the one-pandas-stage plan shape."""

import gzip
import os
import random

import pytest

from simple_anonymizer_spark.sources import warc as W

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _rec(uri="http://example.com/a", payload=b"hello", rtype="resource",
         extra=()):
    headers = [
        ("WARC-Type", rtype),
        ("WARC-Record-ID", W._record_id(uri, payload)),
        ("WARC-Date", "2026-01-02T03:04:05Z"),
        ("WARC-Target-URI", uri),
        ("Content-Type", "text/plain; charset=utf-8"),
        *extra,
    ]
    return W.format_record(headers, payload)


def test_single_record_roundtrip():
    payload = "héllo 世界 \x00 bytes".encode("utf-8")
    data = _rec(payload=payload, extra=[("WARC-X-Meta-lang", "zh")])
    [(headers, body)] = W.parse_records(data)
    assert body == payload
    assert headers["warc-type"] == "resource"
    assert headers["warc-target-uri"] == "http://example.com/a"
    assert headers["warc-x-meta-lang"] == "zh"
    assert int(headers["content-length"]) == len(payload)


def test_concatenated_gzip_members_roundtrip():
    # the standard crawl layout: each record its own gzip member
    recs = [_rec(uri=f"http://e.com/{i}", payload=f"doc {i}".encode())
            for i in range(5)]
    blob = b"".join(gzip.compress(r, 6, mtime=0) for r in recs)
    parsed = W.parse_records(blob)
    assert [p for _, p in parsed] == [f"doc {i}".encode() for i in range(5)]
    # plain concatenation (uncompressed .warc) parses identically
    assert W.parse_records(b"".join(recs)) == parsed


def test_record_id_and_writes_deterministic():
    assert W._record_id("u", b"p") == W._record_id("u", b"p")
    assert W._record_id("u", b"p") != W._record_id("u", b"q")
    assert _rec() == _rec()
    assert gzip.compress(_rec(), 6, mtime=0) == gzip.compress(_rec(), 6,
                                                              mtime=0)


def test_empty_payload_and_continuation_lines():
    [(h, p)] = W.parse_records(_rec(payload=b""))
    assert p == b"" and int(h["content-length"]) == 0
    # LWS continuation folds into the prior header value (spec allows)
    raw = _rec(payload=b"x")
    folded = raw.replace(
        b"Content-Type: text/plain; charset=utf-8\r\n",
        b"Content-Type: text/plain;\r\n\t charset=utf-8\r\n",
    )
    [(h2, _)] = W.parse_records(folded)
    assert "charset=utf-8" in h2["content-type"]


def test_format_record_rejects_bad_headers():
    with pytest.raises(ValueError):  # Content-Length is derived
        W.format_record([("WARC-Type", "resource"),
                         ("WARC-Record-ID", "<urn:uuid:x>"),
                         ("WARC-Date", "d"), ("Content-Length", "3")], b"x")
    with pytest.raises(ValueError):  # CR/LF smuggling
        W.format_record([("WARC-Type", "resource"),
                         ("WARC-Record-ID", "<urn:uuid:x>"),
                         ("WARC-Date", "d\r\nEvil: yes")], b"x")
    with pytest.raises(ValueError):  # missing mandatory header
        W.format_record([("WARC-Type", "resource")], b"x")


def test_malformed_archives_raise_valueerror():
    good = _rec()
    cases = [
        b"",  # handled: empty -> no records
        good[:-2],          # truncated trailer
        good[:20],          # truncated header block
        good.replace(b"WARC/1.1", b"HTTP/1.1"),       # wrong version line
        good.replace(b"Content-Length: 5", b"Content-Length: 99"),
        good.replace(b"Content-Length: 5", b"Content-Length: -1"),
        good.replace(b"Content-Length: 5", b"Content-Length: five"),
        good.replace(b"WARC-Date", b"X-Date"),        # missing mandatory
        b"\x1f\x8b" + b"\x00" * 30,                   # bad gzip stream
    ]
    assert W.parse_records(cases[0]) == []
    for bad in cases[1:]:
        with pytest.raises(ValueError):
            W.parse_records(bad)


def test_mutation_fuzz_never_escapes_valueerror():
    rng = random.Random(28500)
    blob = b"".join(
        gzip.compress(_rec(uri=f"u{i}", payload=bytes([i]) * i), 6, mtime=0)
        for i in range(1, 6)
    )
    for _ in range(200):
        buf = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            W.parse_records(bytes(buf[:rng.randrange(len(buf))]))
        except ValueError:
            pass  # the only allowed escape


def test_fixture_roundtrip_matches_parquet(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .withColumn("uri", F.concat(F.lit("corpus://"), F.col("source"),
                                        F.lit("/"), F.col("doc_id"))))
    out = str(tmp_path / "warc_out")
    n = W.write_warc(docs, out, uri_col="uri", payload_col="text",
                     meta_cols=("doc_id", "lang", "source", "n_chars"))
    assert n == docs.count()
    back = W.read_warc(spark, out)
    got = (
        back.select(
            F.element_at("headers", "warc-x-meta-doc_id").cast("long")
            .alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
            F.element_at("headers", "warc-x-meta-lang").alias("lang"),
            F.element_at("headers", "warc-x-meta-source").alias("source"),
            F.element_at("headers", "warc-x-meta-n_chars").cast("long")
            .alias("n_chars"),
        )
    )
    want = docs.select("doc_id", "text", "lang", "source", "n_chars")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple,
                                                           want.collect()))
    # promoted typed columns agree with the synthesized values
    one = back.orderBy("target_uri").first()
    assert one.warc_type == "resource"
    assert one.record_id.startswith("<urn:uuid:")
    assert one.content_length == len(one.payload)


def test_uncompressed_sink_and_empty_partition(spark, tmp_path):
    df = spark.range(0).selectExpr("'u' as target_uri",
                                   "cast('x' as binary) as payload")
    out = str(tmp_path / "warc_empty")
    assert W.write_warc(df, out) == 0
    assert not any(f.endswith(".warc.gz") for f in os.listdir(out))

    df2 = spark.range(3).selectExpr("concat('u', id) as target_uri",
                                    "cast(id as string) as payload")
    out2 = str(tmp_path / "warc_plain")
    assert W.write_warc(df2, out2, compress=False) == 3
    files = [f for f in os.listdir(out2) if f.endswith(".warc")]
    assert files
    with open(os.path.join(out2, files[0]), "rb") as fh:
        assert fh.read(5) == b"WARC/"


def test_warc_plan_shape_one_pandas_stage(spark, tmp_path):
    df = spark.range(4).selectExpr("concat('u', id) as target_uri",
                                   "cast(id as string) as payload")
    out = str(tmp_path / "warc_plan")
    W.write_warc(df, out)
    plan = W.read_warc(spark, out)._jdf.queryExecution().executedPlan() \
        .toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_pywarc_datasource_roundtrip(spark, tmp_path):
    import simple_anonymizer_spark.sources.warc as wmod
    if wmod.WarcDataSource is None:
        pytest.skip("Python Data Source API unavailable")
    spark.dataSource.register(wmod.WarcDataSource)
    from pyspark.sql import functions as F

    df = spark.range(5).selectExpr(
        "id", "concat('http://e.com/', id) as target_uri",
        "concat('payload ', id) as payload")
    out = str(tmp_path / "pywarc")
    (df.write.format("pywarc").option("path", out)
       .option("meta_cols", "id").mode("overwrite").save())
    back = spark.read.format("pywarc").option("path", out).load()
    got = sorted(
        (r["id"], r.target_uri, bytes(r.payload).decode())
        for r in back.select(
            F.element_at("headers", "warc-x-meta-id").cast("long")
            .alias("id"), "target_uri", "payload").collect())
    assert got == [(i, f"http://e.com/{i}", f"payload {i}")
                   for i in range(5)]
    # interop: mapInPandas reader parses data-source-written archives
    from simple_anonymizer_spark.sources.warc import read_warc
    assert read_warc(spark, out).count() == 5
    # overwrite drops prior archives
    (df.limit(2).write.format("pywarc").option("path", out)
       .option("meta_cols", "id").mode("overwrite").save())
    assert spark.read.format("pywarc").option("path", out).load().count() == 2
    # unknown column in options fails fast
    with pytest.raises(Exception):
        (df.write.format("pywarc").option("path", str(tmp_path / "bad"))
           .option("uri_col", "nope").mode("overwrite").save())
