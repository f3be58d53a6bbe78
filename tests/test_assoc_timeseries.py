"""Behavioral tests for market-basket association rules and the
time-series resample/interpolation operators."""

from __future__ import annotations

import pytest

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


def test_assoc_top_k_orders_by_count_then_items(spark):
    df = association_rules(
        _baskets(spark, BASKETS), "basket", "item",
        min_item_support=1, top_k=2,
    )
    got = [(r.item_a, r.item_b) for r in df.collect()]
    assert got == [("a", "b"), ("a", "c")]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
