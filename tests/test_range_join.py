"""Binned range join: semantics vs the naive non-equi join, plan shape
(hash join, never BNLJ/cartesian), boundaries, and left_semi."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.range_join import binned_range_join


def dt(day: int, hour: int = 0) -> datetime:
    return datetime(2024, 1, day, hour)


@pytest.fixture()
def sides(spark):
    points = spark.createDataFrame(
        [(i, dt(1 + i % 20, (i * 3) % 24)) for i in range(200)],
        "p_id int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, dt(2), dt(4)),
            (101, dt(3, 12), dt(10)),
            (102, dt(15), dt(15, 23)),   # sub-day interval
            (103, dt(19), dt(25)),       # extends past the data
            (104, dt(28), dt(30)),       # matches nothing
        ],
        "iv_id int, lo timestamp, hi timestamp",
    )
    return points, intervals


def test_matches_naive_nonequi_join(spark, sides):
    points, intervals = sides
    for bin_days in (1, 3, 7):
        got = {
            (r.p_id, r.iv_id)
            for r in binned_range_join(
                points, intervals, "ts", "lo", "hi", bin_width_days=bin_days
            ).collect()
        }
        want = {
            (r.p_id, r.iv_id)
            for r in points.join(
                intervals,
                (points.ts >= intervals.lo) & (points.ts <= intervals.hi),
            ).collect()
        }
        assert got == want and got, bin_days


def test_inclusive_boundaries(spark):
    points = spark.createDataFrame(
        [(1, dt(2)), (2, dt(4)), (3, dt(4, 1))], "p_id int, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(9, dt(2), dt(4))], "iv_id int, lo timestamp, hi timestamp"
    )
    got = {r.p_id for r in binned_range_join(points, intervals, "ts", "lo", "hi").collect()}
    assert got == {1, 2}  # both endpoints inclusive, just-after excluded


def test_plan_is_hash_join_not_bnlj(spark, sides):
    points, intervals = sides
    out = binned_range_join(points, intervals, "ts", "lo", "hi")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), plan


def test_left_semi_and_validation(spark, sides):
    points, intervals = sides
    semi = binned_range_join(points, intervals, "ts", "lo", "hi", how="left_semi")
    inner_ids = {
        r.p_id for r in binned_range_join(points, intervals, "ts", "lo", "hi").collect()
    }
    assert {r.p_id for r in semi.collect()} == inner_ids
    assert semi.columns == points.columns
    # a point matching two intervals appears once
    assert semi.count() == len(inner_ids)

    with pytest.raises(ValueError, match="supports inner/left_semi"):
        binned_range_join(points, intervals, "ts", "lo", "hi", how="full")
    with pytest.raises(ValueError, match="clash"):
        binned_range_join(points, points.withColumnRenamed("p_id", "x"), "ts", "ts", "ts")
