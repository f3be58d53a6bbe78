"""Count-min sketch (operators/sketch.py): structural guarantees — the
grid never exceeds depth*width cells, estimates NEVER under-count, the
overestimate respects the (eps, delta) bound with margin, and weighted
counting matches exact weighted aggregation on collision-free keys."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from simple_anonymizer_spark.functions import textops as T
from simple_anonymizer_spark.operators import sketch
from simple_anonymizer_spark.sources.parquet import read_sf_table

DEPTH, WIDTH = 4, 256


@pytest.fixture(scope="module")
def token_df(spark, sf_dir):
    return (
        read_sf_table(spark, sf_dir, "documents")
        .select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .cache()
    )


def test_grid_bounded_and_mass_conserved(spark, token_df):
    sk = sketch.cms_sketch(token_df, "token", DEPTH, WIDTH).collect()
    assert len(sk) <= DEPTH * WIDTH
    total = token_df.count()
    per_row = {}
    for r in sk:
        assert 0 <= r.bucket < WIDTH and 0 <= r.sketch_row < DEPTH
        per_row[r.sketch_row] = per_row.get(r.sketch_row, 0) + r.cnt
    # every sketch row distributes the full token mass
    assert per_row == {r: total for r in range(DEPTH)}


def test_estimates_overcount_within_bound(spark, token_df):
    exact = {
        r.token: r.n for r in
        token_df.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    sk = sketch.cms_sketch(token_df, "token", DEPTH, WIDTH)
    probes = token_df.distinct()
    est = {
        r.token: r.est
        for r in sketch.cms_estimate(sk, probes, "token", DEPTH, WIDTH).collect()
    }
    assert set(est) == set(exact)
    eps = math.e / WIDTH
    for tok, true_n in exact.items():
        assert est[tok] >= true_n, f"undercount on {tok!r}"
        # eps*N holds per-row w.p. 1-1/e; the min over 4 rows failing 3x
        # the bound across EVERY probe would be a broken kernel, not luck
        assert est[tok] - true_n <= 3 * eps * n_total, tok


def test_weighted_sketch_collision_free_keys(spark):
    rows = [Row(k=f"key{n}", w=n) for n in range(1, 6)]
    df = spark.createDataFrame(rows, "k string, w long")
    sk = sketch.cms_sketch(df, "k", depth=4, width=4096, weight_col="w")
    est = sketch.cms_estimate(sk, df.select("k").distinct(), "k",
                              depth=4, width=4096)
    got = {r.k: r.est for r in est.collect()}
    assert got == {f"key{n}": n for n in range(1, 6)}


def test_null_and_empty_keys_dropped(spark):
    df = spark.createDataFrame(
        [Row(k="a"), Row(k=""), Row(k=None), Row(k="a")], "k string"
    )
    sk = sketch.cms_sketch(df, "k", depth=2, width=16)
    assert sk.agg(F.sum("cnt")).first()[0] == 2 * 2  # only the two "a"s


def test_validation(spark, token_df):
    with pytest.raises(ValueError, match=">= 1"):
        sketch.cms_sketch(token_df, "token", depth=0)
