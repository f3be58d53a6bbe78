"""Salted join / aggregate correctness + bucketed layout round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.skew import (salted_aggregate,
                                                    salted_join,
                                                    write_bucketed)


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: 90% of rows share key 1
    left = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)],
        "k int, v int",
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(1, 102)], "k int, name string")
    expected = sorted(
        (r.k, r.v, r.name) for r in left.join(right, "k").collect()
    )
    got = sorted(
        (r.k, r.v, r.name) for r in salted_join(left, right, "k", 8).collect()
    )
    assert got == expected


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [(1, 10.0)] * 500 + [(2, 1.0)] * 5, "k int, v double"
    )
    got = {
        r.k: (r.total, r.n)
        for r in salted_aggregate(
            df, "k", {"total": ("v", "sum"), "n": ("v", "count")}, 8
        ).collect()
    }
    assert got == {1: (5000.0, 500), 2: (5.0, 5)}


def test_bucketed_write_enables_shuffle_free_agg(spark, tmp_path):
    df = spark.createDataFrame([(i % 10, i) for i in range(100)], "k int, v int")
    write_bucketed(df, "bucketed_t", ["k"], num_buckets=4)
    try:
        back = spark.table("bucketed_t")
        agg = back.groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # bucketed layout: aggregation needs no exchange
        assert "Exchange" not in plan.replace("ReusedExchange", "")
        assert agg.count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_t")
