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


# ---------------------------------------------------------------------------
# HyperLogLog (hll_registers / hll_estimate)
# ---------------------------------------------------------------------------


def test_hll_register_table_bounded_and_mergeable(spark):
    """Register table never exceeds 2^p rows; the union property holds:
    registers(A ∪ B) == element-wise max of registers(A), registers(B)."""
    a = spark.createDataFrame([(f"k{i}",) for i in range(500)], "k string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(300, 900)], "k string")
    p = 6
    ra = sketch.hll_registers(a, "k", p=p)
    rb = sketch.hll_registers(b, "k", p=p)
    runion = sketch.hll_registers(a.union(b), "k", p=p)
    assert runion.count() <= (1 << p)
    merged = (
        ra.union(rb).groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    )
    got = {(r.register, r.max_rho) for r in merged.collect()}
    want = {(r.register, r.max_rho) for r in runion.collect()}
    assert got == want


def test_hll_estimate_within_expected_error(spark):
    """Raw estimator's relative error vs 5000 distinct keys stays within
    3x the theoretical 1.04/sqrt(m) standard error at p=10 (the kernel is
    frozen, so this is a deterministic regression pin, not a flaky
    sample)."""
    n = 5000
    df = spark.createDataFrame([(f"value-{i}",) for i in range(n)], "k string")
    est = sketch.hll_estimate(sketch.hll_registers(df, "k", p=10), p=10).first()
    assert est.m == 1024
    assert est.used_registers + est.zero_registers == 1024
    rel = abs(est.hll_estimate - n) / n
    assert rel <= 3 * 1.04 / math.sqrt(1024), rel


def test_hll_duplicates_do_not_move_registers(spark):
    """Multiplicity is invisible to HLL: duplicating every key leaves the
    register table (and thus the estimate) identical."""
    base = spark.createDataFrame([(f"v{i}",) for i in range(200)], "k string")
    dup = base.union(base).union(base)
    r1 = {(r.register, r.max_rho)
          for r in sketch.hll_registers(base, "k").collect()}
    r2 = {(r.register, r.max_rho)
          for r in sketch.hll_registers(dup, "k").collect()}
    assert r1 == r2


def test_hll_null_empty_dropped_and_validation(spark):
    df = spark.createDataFrame([("a",), ("",), (None,)], "k string")
    regs = sketch.hll_registers(df, "k")
    assert regs.count() == 1
    with pytest.raises(ValueError, match=r"\[4, 16\]"):
        sketch.hll_registers(df, "k", p=2)


def test_hll_empty_input_yields_zero_sum_estimate(spark):
    df = spark.createDataFrame([], "k string")
    row = sketch.hll_estimate(sketch.hll_registers(df, "k", p=10), p=10).first()
    assert row.used_registers == 0 and row.zero_registers == 1024
    assert row.sum_pow == 1024 * (1 << 22)
    assert row.hll_estimate == pytest.approx(
        sketch.hll_alpha_const(10) / row.sum_pow
    )


# ---------------------------------------------------------------------------
# Hash-sampling quantile sketch (quantile_sketch / quantile_sketch_estimate)
# ---------------------------------------------------------------------------


def test_qsketch_union_merge_property(spark):
    """Sketches of disjoint shards union into the sketch of the union —
    coordinated sampling's defining property."""
    a = spark.createDataFrame([(i, i * 7 % 1000) for i in range(0, 400)],
                              "id long, v long")
    b = spark.createDataFrame([(i, i * 7 % 1000) for i in range(400, 900)],
                              "id long, v long")
    sa = sketch.quantile_sketch(a, "v", "id", level=3)
    sb = sketch.quantile_sketch(b, "v", "id", level=3)
    su = sketch.quantile_sketch(a.union(b), "v", "id", level=3)
    got = {(r.id, r.v) for r in sa.union(sb).collect()}
    want = {(r.id, r.v) for r in su.collect()}
    assert got == want


def test_qsketch_level_zero_is_exact_empirical_quantile(spark):
    vals = [(i, v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80,
                                          90, 100])]
    df = spark.createDataFrame(vals, "id long, v long")
    kept = sketch.quantile_sketch(df, "v", "id", level=0)
    out = {r.pct: r for r in sketch.quantile_sketch_estimate(
        kept, "v", "id", 0, percents=(10, 50, 100)).collect()}
    # ceil targets over n=10: pct 10 -> rank 1 -> 10; 50 -> rank 5 -> 50
    assert out[10].est_value == 10
    assert out[50].est_value == 50
    assert out[100].est_value == 100
    assert out[50].n_est == 10


def test_qsketch_estimate_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, (i * 131) % 10_000) for i in range(3000)], "id long, v long"
    )
    kept = sketch.quantile_sketch(df, "v", "id", level=4)
    a = sorted(map(tuple, sketch.quantile_sketch_estimate(
        kept, "v", "id", 4).collect()))
    b = sorted(map(tuple, sketch.quantile_sketch_estimate(
        kept.repartition(11), "v", "id", 4).collect()))
    assert a == b
    # sanity: estimates land within 10% rank error of the true quantile
    import bisect
    values = sorted(v for _, v in [(i, (i * 131) % 10_000)
                                   for i in range(3000)])
    for r in sketch.quantile_sketch_estimate(kept, "v", "id", 4).collect():
        true_rank = bisect.bisect_right(values, r.est_value)
        assert abs(true_rank - r.pct * 30) <= 300, (r.pct, true_rank)


def test_qsketch_validation(spark):
    df = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError, match=r"\[0, 30\]"):
        sketch.quantile_sketch(df, "v", "id", level=31)


def test_hll_merge_equals_direct_union(spark):
    a = spark.createDataFrame(
        [(f"k{i}",) for i in range(400)], "k string")
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(200, 700)], "k string")
    ra = sketch.hll_registers(a, "k")
    rb = sketch.hll_registers(b, "k")
    merged = sorted(map(tuple, sketch.hll_merge(ra, rb).collect()))
    direct = sorted(map(tuple, sketch.hll_registers(
        a.unionByName(b), "k").collect()))
    assert merged == direct  # max of maxes == union's register table


def test_hll_merge_empty_side_identity(spark):
    a = spark.createDataFrame([(f"k{i}",) for i in range(100)], "k string")
    empty = spark.createDataFrame([], "k string")
    ra = sketch.hll_registers(a, "k")
    re_ = sketch.hll_registers(empty, "k")
    merged = sorted(map(tuple, sketch.hll_merge(ra, re_).collect()))
    assert merged == sorted(map(tuple, ra.collect()))


def test_hll_inclusion_exclusion_overlap(spark):
    a = spark.createDataFrame([(f"x{i}",) for i in range(3000)], "k string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(1500, 4500)], "k string")
    ra, rb = sketch.hll_registers(a, "k"), sketch.hll_registers(b, "k")
    ea = sketch.hll_estimate(ra).collect()[0].hll_estimate
    eb = sketch.hll_estimate(rb).collect()[0].hll_estimate
    eu = sketch.hll_estimate(sketch.hll_merge(ra, rb)).collect()[0].hll_estimate
    overlap = ea + eb - eu
    assert abs(overlap - 1500) / 1500 < 0.25  # sketch-grade accuracy


def test_kmv_merge_equals_direct_union_sketch(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "k string")
    b = spark.createDataFrame([(f"a{i}",) for i in range(300, 900)], "k string")
    sa, sb = sketch.kmv_sketch(a, "k", k=64), sketch.kmv_sketch(b, "k", k=64)
    merged = sorted(r.h for r in sketch.kmv_merge(sa, sb, 64).collect())
    direct = sorted(r.h for r in sketch.kmv_sketch(
        a.unionByName(b), "k", k=64).collect())
    assert merged == direct


def test_kmv_estimate_accuracy_and_small_exact(spark):
    big = spark.createDataFrame([(f"v{i}",) for i in range(5000)], "k string")
    est = sketch.kmv_estimate(
        sketch.kmv_sketch(big, "k", k=256), 256).collect()[0]
    assert est.n_kept == 256
    assert abs(est.kmv_estimate - 5000) / 5000 < 0.25
    small = spark.createDataFrame([(f"v{i}",) for i in range(40)], "k string")
    est_s = sketch.kmv_estimate(
        sketch.kmv_sketch(small, "k", k=256), 256).collect()[0]
    assert est_s.n_kept == 40 and est_s.kmv_estimate == 40.0


def test_kmv_expected_n_prefilter_lossless(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(4000)], "k string")
    plain = sorted(r.h for r in sketch.kmv_sketch(df, "k", k=128).collect())
    filtered = sorted(r.h for r in sketch.kmv_sketch(
        df, "k", k=128, expected_n=4000).collect())
    assert plain == filtered


def test_kmv_overlap_estimates_jaccard(spark):
    a = spark.createDataFrame([(f"x{i}",) for i in range(4000)], "k string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(2000, 6000)], "k string")
    rep = sketch.kmv_overlap(
        sketch.kmv_sketch(a, "k", k=256),
        sketch.kmv_sketch(b, "k", k=256), k=256).collect()[0]
    # true: union 6000, inter 2000, jaccard 1/3
    assert abs(rep.jaccard_est - 1 / 3) < 0.12
    assert abs(rep.inter_est - 2000) / 2000 < 0.4


def test_cms_inner_product_overestimates_join_size(spark):
    a = spark.createDataFrame(
        [(f"k{i % 40}",) for i in range(400)], "key string")
    b = spark.createDataFrame(
        [(f"k{i % 25}",) for i in range(100)], "key string")
    exact = a.join(b, "key").count()
    est = sketch.cms_inner_product(
        sketch.cms_sketch(a, "key"), sketch.cms_sketch(b, "key")
    ).collect()[0].est_join_size
    assert est >= exact            # collisions only add
    assert est <= exact * 2        # 4x256 grid over 40 keys: near-exact


def test_ams_join_size_unbiased_accuracy(spark):
    a = spark.createDataFrame(
        [(f"k{i}",) for i in range(3000)], "key string")
    b = spark.createDataFrame(
        [(f"k{i % 3000}",) for i in range(9000)], "key string")
    exact = 9000  # every b row matches exactly one a key
    est = sketch.ams_join_size(
        sketch.ams_sketch(a, "key"), sketch.ams_sketch(b, "key")
    ).collect()[0].est_join_size
    assert abs(est - exact) / exact < 0.15  # ~3% expected at width 1024


def test_ams_sketch_bounded_and_deterministic(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(500)], "key string")
    g = sketch.ams_sketch(df, "key", depth=3, width=64)
    rows = g.collect()
    assert len(rows) <= 3 * 64
    again = sorted(map(tuple, sketch.ams_sketch(
        df.repartition(7), "key", depth=3, width=64).collect()))
    assert sorted(map(tuple, rows)) == again


def test_hll_grouped_matches_per_group_global(spark):
    rows = [("a", f"u{i}") for i in range(300)] + \
           [("b", f"u{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, k string")
    grouped = sketch.hll_grouped_estimate(
        sketch.hll_grouped_registers(df, ["g"], "k", p=6), ["g"], p=6)
    out = {r.g: r for r in grouped.collect()}
    for g, sub in [("a", df.where("g = 'a'")), ("b", df.where("g = 'b'"))]:
        solo = sketch.hll_estimate(
            sketch.hll_registers(sub, "k", p=6), p=6).collect()[0]
        assert out[g].hll_estimate == solo.hll_estimate
        assert out[g].sum_pow == solo.sum_pow


def test_hll_grouped_accuracy(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(2000)], "g string, k string")
    r = sketch.hll_grouped_estimate(
        sketch.hll_grouped_registers(df, ["g"], "k", p=8), ["g"], p=8
    ).collect()[0]
    assert abs(r.hll_estimate - 2000) / 2000 < 0.2


def test_kmv_prefilter_survives_4x_overestimate(spark):
    # the one-sided safety claim: hinting 4x the true distinct count
    # still keeps every sketch value (window stays 2x the kth min)
    df = spark.createDataFrame([(f"v{i}",) for i in range(2000)], "k string")
    plain = sorted(r.h for r in sketch.kmv_sketch(df, "k", k=128).collect())
    hinted = sorted(r.h for r in sketch.kmv_sketch(
        df, "k", k=128, expected_n=8000).collect())
    assert plain == hinted
