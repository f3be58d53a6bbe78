"""Behavioral tests for market-basket association rules and the
time-series resample/interpolation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.assoc import association_rules


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def _rules(spark, rows, **kw):
    df = association_rules(_baskets(spark, rows), "basket", "item", **kw)
    return {(r.item_a, r.item_b): r for r in df.collect()}


BASKETS = [
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "c"),
    (4, "b"),
]


def test_assoc_counts_and_metrics(spark):
    out = _rules(spark, BASKETS, min_item_support=1)
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab.pair_count, ab.supp_a, ab.supp_b, ab.n_baskets) == (2, 3, 3, 4)
    assert ab.confidence == 2 / 3
    assert ab.lift == (2 * 4) / (3 * 3)
    bc = out[("b", "c")]
    assert bc.pair_count == 1 and bc.lift == (1 * 4) / (3 * 2)


def test_assoc_apriori_prune_drops_rare_items(spark):
    # c appears in 2 baskets: support threshold 3 removes every c-pair.
    out = _rules(spark, BASKETS, min_item_support=3)
    assert set(out) == {("a", "b")}


def test_assoc_duplicate_items_in_basket_count_once(spark):
    rows = BASKETS + [(1, "a"), (1, "a"), (2, "b")]
    dup = {k: tuple(v) for k, v in _rules(spark, rows, min_item_support=1).items()}
    base = {k: tuple(v) for k, v in _rules(spark, BASKETS, min_item_support=1).items()}
    assert dup == base


def test_assoc_min_pair_support_filters(spark):
    out = _rules(spark, BASKETS, min_item_support=1, min_pair_support=2)
    assert set(out) == {("a", "b"), ("a", "c")}


def test_assoc_join_prune_matches_broadcast(spark):
    """prune='join' (the unbounded-vocabulary path) must be output-
    identical to the default broadcast-array prune, including with a
    support threshold actually dropping items."""
    for kw in ({"min_item_support": 1}, {"min_item_support": 3},
               {"min_item_support": 1, "min_pair_support": 2}):
        a = {k: tuple(v) for k, v in _rules(spark, BASKETS, **kw).items()}
        b = {k: tuple(v)
             for k, v in _rules(spark, BASKETS, prune="join", **kw).items()}
        assert a == b, kw


def test_assoc_prune_rejects_unknown_strategy(spark):
    with pytest.raises(ValueError):
        association_rules(_baskets(spark, BASKETS), "basket", "item",
                          prune="bogus")


def test_assoc_top_k_orders_by_count_then_items(spark):
    df = association_rules(
        _baskets(spark, BASKETS), "basket", "item",
        min_item_support=1, top_k=2,
    )
    got = [(r.item_a, r.item_b) for r in df.collect()]
    assert got == [("a", "b"), ("a", "c")]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Time-series daily resample + linear interpolation
# ---------------------------------------------------------------------------


from simple_anonymizer_spark.operators.timeseries import (  # noqa: E402
    resample_interpolate_daily,
)


def _series(spark, rows):
    # rows: (key, day, value) -> one event at noon of that day
    df = spark.createDataFrame(
        [(k, (d * 86400 + 43200) * 10**6, v) for k, d, v in rows],
        "user_id long, us long, value double",
    ).select(
        "user_id",
        (F.timestamp_micros(F.col("us"))).alias("ts"),
        "value",
    )
    out = resample_interpolate_daily(df, "user_id", "ts", "value")
    return {(r.user_id, r.day): (r.n_events, r.avg_value, r.interpolated)
            for r in out.collect()}


def test_ts_gap_is_linearly_interpolated(spark):
    out = _series(spark, [(1, 10, 1.0), (1, 14, 9.0)])
    assert out[(1, 10)] == (1, 1.0, 0)
    assert out[(1, 14)] == (1, 9.0, 0)
    # gap days 11..13 are interpolated at slope 2/day
    assert out[(1, 11)] == (0, 3.0, 1)
    assert out[(1, 12)] == (0, 5.0, 1)
    assert out[(1, 13)] == (0, 7.0, 1)
    assert len(out) == 5


def test_ts_multiple_events_average_per_day(spark):
    out = _series(spark, [(1, 5, 2.0), (1, 5, 4.0), (1, 6, 1.0)])
    assert out[(1, 5)] == (2, 3.0, 0)
    assert out[(1, 6)] == (1, 1.0, 0)


def test_ts_single_observation_no_gap_rows(spark):
    out = _series(spark, [(7, 3, 1.5)])
    assert out == {(7, 3): (1, 1.5, 0)}


def test_ts_keys_are_independent(spark):
    out = _series(spark, [(1, 0, 0.0), (1, 2, 2.0), (2, 100, 5.0)])
    assert out[(1, 1)] == (0, 1.0, 1)
    assert out[(2, 100)] == (1, 5.0, 0)
    # key 2's span never bleeds into key 1's calendar
    assert (1, 100) not in out and len(out) == 4


def test_ts_partition_invariance(spark):
    rows = [(i % 5, (i * 3) % 40, float(i % 11)) for i in range(120)]
    df = spark.createDataFrame(
        [(k, (d * 86400 + 1) * 10**6, v) for k, d, v in rows],
        "user_id long, us long, value double",
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"), "value")
    a = sorted(map(tuple,
        resample_interpolate_daily(df.repartition(1), "user_id", "ts", "value").collect()))
    b = sorted(map(tuple,
        resample_interpolate_daily(df.repartition(7), "user_id", "ts", "value").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Dyadic EWMA (timeseries.ewma_halflife)
# ---------------------------------------------------------------------------


def test_ewma_matches_closed_form(spark):
    from simple_anonymizer_spark.operators.timeseries import ewma_halflife

    rows = [("k", i, v) for i, v in enumerate([100, 200, 400, 0])]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = {r.t: r for r in
           ewma_halflife(df, "k", ["t"], "x", horizon=4).collect()}
    # adjust=True EWMA with alpha=1/2: weights 1, 1/2, 1/4, ... newest first
    assert out[0].ewma == 100.0                       # single term
    assert out[1].ewma == (2 * 200 + 100) / 3         # weights 2,1 / 3
    assert out[2].ewma == (4 * 400 + 2 * 200 + 100) / 7
    assert out[3].ewma == (8 * 0 + 4 * 400 + 2 * 200 + 100) / 15
    assert out[3].weight_mass == 15


def test_ewma_partial_window_renormalizes_per_key(spark):
    from simple_anonymizer_spark.operators.timeseries import ewma_halflife

    df = spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 30)], "k string, t long, x long"
    )
    out = {r.k: r.ewma for r in
           ewma_halflife(df, "k", ["t"], "x", horizon=16).collect()}
    assert out == {"a": 10.0, "b": 30.0}   # keys never mix


def test_ewma_horizon_truncation_is_deterministic(spark):
    from simple_anonymizer_spark.operators.timeseries import ewma_halflife

    rows = [("k", i, 1000) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = ewma_halflife(df, "k", ["t"], "x", horizon=8).collect()
    # constant series -> EWMA equals the constant at every t
    assert all(r.ewma == 1000.0 for r in out)
    last = [r for r in out if r.t == 39][0]
    assert last.weight_mass == (1 << 8) - 1   # full window mass

    with pytest.raises(ValueError, match=r"\[1, 62\]"):
        ewma_halflife(df, "k", ["t"], "x", horizon=0)


# ---------------------------------------------------------------------------
# CUSUM change-point detection (timeseries.cusum_flags)
# ---------------------------------------------------------------------------


def _cusum_naive(xs, target, slack, threshold):
    up = dn = 0
    out = []
    for x in xs:
        up = max(0, up + (x - target - slack))
        dn = max(0, dn + (target - slack - x))
        out.append((up, dn, int(up > threshold), int(dn > threshold)))
    return out


def test_cusum_closed_form_matches_recurrence(spark):
    from simple_anonymizer_spark.operators.timeseries import cusum_flags

    xs = [10, 12, 9, 11, 50, 55, 60, 10, 9, 2, 1, 0, 0, 30]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x long"
    )
    got = [
        (r.cusum_up, r.cusum_dn, r.alarm_up, r.alarm_dn)
        for r in cusum_flags(df, "k", ["t"], "x", target=10, slack=5,
                             threshold=40)
        .orderBy("t").collect()
    ]
    assert got == _cusum_naive(xs, 10, 5, 40)


def test_cusum_sustained_shift_alarms_and_resets(spark):
    from simple_anonymizer_spark.operators.timeseries import cusum_flags

    xs = [10] * 5 + [100] * 4 + [10] * 5
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x long"
    )
    rows = cusum_flags(df, "k", ["t"], "x", target=10, slack=10,
                       threshold=100).orderBy("t").collect()
    assert all(r.alarm_up == 0 for r in rows[:5])      # quiet before shift
    assert any(r.alarm_up == 1 for r in rows[5:9])     # fires during shift
    assert rows[-1].cusum_up < rows[8].cusum_up        # decays after


def test_cusum_keys_independent(spark):
    from simple_anonymizer_spark.operators.timeseries import cusum_flags

    df = spark.createDataFrame(
        [("a", 0, 100), ("b", 0, 10)], "k string, t long, x long"
    )
    out = {r.k: r.cusum_up for r in
           cusum_flags(df, "k", ["t"], "x", 10, 0, 5).collect()}
    assert out == {"a": 90, "b": 0}
