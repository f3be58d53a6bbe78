"""JSONL / CSV interchange tier: schema-pinned round trips and
corrupt-record quarantine."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from simple_anonymizer_spark.sources.textfiles import (
    CORRUPT_COL,
    corrupt_rows,
    read_csv,
    read_jsonl,
    valid_rows,
    write_csv,
    write_jsonl,
)

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("name", StringType()),
    StructField("score", DoubleType()),
])

ROWS = [(1, "ada", 1.5), (2, "bob", -2.0), (3, "eve, jr", 0.25)]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _rows(frame):
    return sorted((r.id, r.name, r.score) for r in frame.collect())


def test_jsonl_roundtrip_exact(spark, df, tmp_path):
    p = os.path.join(str(tmp_path), "docs_jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, SCHEMA)
    assert corrupt_rows(back).count() == 0
    assert _rows(valid_rows(back)) == sorted(ROWS)


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = str(tmp_path / "mixed")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.json"), "w") as f:
        f.write('{"id": 1, "name": "ok", "score": 2.0}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"id": 2, "name": "also ok", "score": 3.0}\n')
    back = read_jsonl(spark, p, SCHEMA)
    assert _rows(valid_rows(back)) == [(1, "ok", 2.0), (2, "also ok", 3.0)]
    bad = [r[CORRUPT_COL] for r in corrupt_rows(back).collect()]
    assert bad == ["THIS IS NOT JSON"]


def test_csv_roundtrip_with_quoting(spark, df, tmp_path):
    # 'eve, jr' embeds the delimiter: quoting must round-trip it.
    p = os.path.join(str(tmp_path), "docs_csv")
    write_csv(df, p)
    back = read_csv(spark, p, SCHEMA)
    assert corrupt_rows(back).count() == 0
    assert _rows(valid_rows(back)) == sorted(ROWS)


def test_csv_custom_delimiter(spark, df, tmp_path):
    p = os.path.join(str(tmp_path), "docs_tsv")
    write_csv(df, p, delimiter="\t")
    back = read_csv(spark, p, SCHEMA, delimiter="\t")
    assert _rows(valid_rows(back)) == sorted(ROWS)


def test_no_inference_scan_schema_is_user_supplied(spark, df, tmp_path):
    # The reader's schema is exactly (user schema + corrupt col): had
    # inference run, the types would come from data sampling instead.
    p = os.path.join(str(tmp_path), "docs_jsonl2")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, SCHEMA)
    assert [f.name for f in back.schema.fields] == \
        ["id", "name", "score", CORRUPT_COL]
    assert back.schema["id"].dataType == LongType()
    assert back.schema["score"].dataType == DoubleType()


def test_fixture_table_jsonl_round_trip(spark, sf_dir):
    # Real fixture through the interchange boundary: parquet -> JSONL ->
    # read back equals the original projection.
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    import tempfile

    cust = read_sf_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    schema = StructType([
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_acctbal", DoubleType()),
    ])
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cust_jsonl")
        write_jsonl(cust, p)
        back = valid_rows(read_jsonl(spark, p, schema))
        a = sorted(map(tuple, cust.collect()))
        b = sorted(map(tuple, back.collect()))
        assert a == b
