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


def test_bucketed_cobucketed_join_is_shuffle_free(spark):
    """Sort-merge-bucket join: both sides bucketed on the join key with
    the same bucket count co-locate, so the join plans with NO exchange
    on either side — the standing-layout answer to the repeated
    fact-to-fact join at 100 TB (shuffle once at write time, never per
    query). Broadcast is disabled for the assertion so AQE can't hide
    the shuffle question by broadcasting the small fixture."""
    a = spark.createDataFrame([(i % 50, i) for i in range(400)], "k int, v int")
    b = spark.createDataFrame([(i % 50, -i) for i in range(300)], "k int, w int")
    write_bucketed(a, "smb_a", ["k"], num_buckets=4, sort_cols=["k"])
    write_bucketed(b, "smb_b", ["k"], num_buckets=4, sort_cols=["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("smb_a").join(spark.table("smb_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.replace("ReusedExchange", "")
        assert j.count() == 400 * 300 // 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS smb_a")
        spark.sql("DROP TABLE IF EXISTS smb_b")
