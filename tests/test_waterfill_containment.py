"""Property tests for the round-7 operators: water_fill_budget's
allocation invariants and ngram_containment_pairs' directional
semantics — the contracts the cross-engine oracle gate can't express."""

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.dedup import ngram_containment_pairs
from simple_anonymizer_spark.operators.sampling import water_fill_budget


def _counts(spark, rows):
    return spark.createDataFrame(rows, "source string, n_tokens long")


def _brute_waterline(tokens, budget):
    """Reference: largest integer W with sum(min(t, W)) <= budget, or
    None when the budget covers everything."""
    if sum(tokens) <= budget:
        return None
    w = 0
    while sum(min(t, w + 1) for t in tokens) <= budget:
        w += 1
    return w


@pytest.mark.parametrize("tokens,budget", [
    ([100, 200, 300, 1000], 800),
    ([100, 200, 300, 1000], 1600),   # covers everything
    ([5, 5, 5], 7),                  # line below the smallest domain
    ([10], 3),
    ([7, 7, 7, 7], 28),              # exact cover, no cut
    ([1, 1000000], 500),
])
def test_waterline_matches_brute_force(spark, tokens, budget):
    rows = [(f"s{i}", t) for i, t in enumerate(tokens)]
    out = water_fill_budget(_counts(spark, rows), budget).collect()
    expect_w = _brute_waterline(tokens, budget)
    got_w = {r["waterline"] for r in out}
    assert got_w == {expect_w}
    granted = {r["source"]: r["granted"] for r in out}
    for i, t in enumerate(tokens):
        assert granted[f"s{i}"] == (t if expect_w is None else min(t, expect_w))
    total = sum(granted.values())
    assert total <= budget or expect_w is None
    if expect_w is not None:
        # maximality: one more unit of waterline would overspend
        assert sum(min(t, expect_w + 1) for t in tokens) > budget


def test_waterfill_rejects_negative_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        water_fill_budget(_counts(spark, [("a", 1)]), -1)


def test_containment_detects_doc_in_doc(spark):
    """A short doc quoted inside a long one: containment_ab ~ 1 while
    Jaccard would be low; the reverse direction reflects the size gap.
    Empty docs emit NULL, never 0/0."""
    short = "alpha beta gamma delta"
    long_ = short + " " + ("padding words all different here " * 10)
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 1)], "id_a long, id_b long")
    rows = {(r["id_a"], r["id_b"]): r
            for r in ngram_containment_pairs(df, pairs).collect()}
    r12 = rows[(1, 2)]
    assert r12["containment_ab"] == 1.0          # short fully inside long
    assert r12["containment_ba"] < 0.5           # long mostly not in short
    r31 = rows[(3, 1)]
    assert r31["containment_ab"] is None         # empty shingle set -> NULL
    assert r31["containment_ba"] == 0.0
