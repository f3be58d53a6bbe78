"""Semantics pins for operators/stats.py, operators/funnel.py, and the new
text/fuzzy operators — hand-computed expectations on tiny frames, exercising
the edge cases the fixture data may not contain (even/odd medians, timestamp
ties, empty prefixes, horizon boundaries)."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import Row, functions as F

from simple_anonymizer_spark.operators import stats
from simple_anonymizer_spark.operators.dedup import levenshtein_adjacent_pairs
from simple_anonymizer_spark.operators.funnel import funnel_two_step
from simple_anonymizer_spark.operators.text_analysis import (
    tfidf_top_terms,
    top_tokens,
)


def test_grouped_median_odd_and_even(spark):
    rows = [Row(g="odd", v=float(x), k=i) for i, x in enumerate([5, 1, 3])]
    rows += [Row(g="even", v=float(x), k=i) for i, x in enumerate([4, 1, 3, 2])]
    out = {
        r.g: (r.median, r.n_rows)
        for r in stats.grouped_median(
            spark.createDataFrame(rows), ["g"], "v", "k"
        ).collect()
    }
    assert out["odd"] == (3.0, 3)
    assert out["even"] == (2.5, 4)


def test_grouped_median_tie_values(spark):
    # All-equal values: median must be that value regardless of tie order.
    df = spark.createDataFrame([Row(g="a", v=7.0, k=i) for i in range(6)])
    [r] = stats.grouped_median(df, ["g"], "v", "k").collect()
    assert r.median == 7.0 and r.n_rows == 6


def test_moments_matches_statistics_module(spark):
    vals = [10.25, 20.5, 30.75, 41.0, 12.0]
    df = spark.createDataFrame([Row(g="x", v=v) for v in vals])
    [r] = stats.moments(df, ["g"], "v").collect()
    assert r.n == len(vals)
    assert r.mean_v == pytest.approx(statistics.mean(vals), rel=1e-12)
    assert r.stddev_v == pytest.approx(statistics.stdev(vals), rel=1e-12)
    assert (r.min_v, r.max_v) == (min(vals), max(vals))


def test_moments_degenerate_groups(spark):
    df = spark.createDataFrame(
        [Row(g="single", v=5.0), Row(g="flat", v=2.0), Row(g="flat", v=2.0)]
    )
    out = {r.g: r for r in stats.moments(df, ["g"], "v").collect()}
    assert out["single"].stddev_v is None  # n=1: sample stddev undefined
    assert out["flat"].stddev_v == 0.0


def test_corr_pair_exact_linear(spark):
    # y = 2x exactly -> Pearson r = 1 (up to the double combine).
    df = spark.createDataFrame(
        [Row(g="l", x=float(i), y=float(2 * i)) for i in range(1, 20)]
    )
    [r] = stats.corr_pair(df, ["g"], "x", "y").collect()
    assert r.corr_xy == pytest.approx(1.0, abs=1e-12)


def test_corr_pair_zero_variance_is_null(spark):
    df = spark.createDataFrame([Row(g="z", x=3.0, y=float(i)) for i in range(5)])
    [r] = stats.corr_pair(df, ["g"], "x", "y").collect()
    assert r.corr_xy is None


def test_histogram_boundary_lands_in_own_bin(spark):
    # 50.00 with width 1000 cents: cents=5000 -> bin [5000, 6000).
    df = spark.createDataFrame(
        [Row(v=49.99), Row(v=50.00), Row(v=50.01), Row(v=0.0)]
    )
    out = {r.bin_lo_cents: r.n_rows for r in
           stats.histogram(df, "v", 1000).collect()}
    assert out == {4000: 1, 5000: 2, 0: 1}
    hi = {r.bin_lo_cents: r.bin_hi_cents for r in
          stats.histogram(df, "v", 1000).collect()}
    assert hi[5000] == 6000


def test_rolling_time_agg_range_frame_and_ties(spark):
    # user u: events at t=0, 50, 100, 100 (tie), 161; window 100us trailing.
    rows = [
        Row(u="u", id=1, us=0, v=1.0),
        Row(u="u", id=2, us=50, v=1.0),
        Row(u="u", id=3, us=100, v=1.0),
        Row(u="u", id=4, us=100, v=1.0),
        Row(u="u", id=5, us=161, v=1.0),
    ]
    df = spark.createDataFrame(rows)
    out = stats.rolling_time_agg(df, "u", F.col("us"), "v", "id", 100)
    got = {r.id: r.n_trailing for r in out.collect()}
    # t=100 rows: frame [0,100] includes ids 1..4 — BOTH tie rows see all
    # peers (RANGE frame, not ROWS). t=161: frame [61,161] -> ids 3,4,5.
    assert got == {1: 1, 2: 2, 3: 4, 4: 4, 5: 3}


def test_funnel_tie_and_horizon_semantics(spark):
    rows = [
        # converts: purchase at exactly the signup microsecond (>= pins tie)
        Row(user_id=1, event_type="signup", us=1000),
        Row(user_id=1, event_type="purchase", us=1000),
        # no conversion: purchase strictly before signup
        Row(user_id=2, event_type="purchase", us=500),
        Row(user_id=2, event_type="signup", us=900),
        # no conversion: purchase beyond horizon
        Row(user_id=3, event_type="signup", us=0),
        Row(user_id=3, event_type="purchase", us=201),
        # converts at the horizon boundary (<=), earliest purchase wins
        Row(user_id=4, event_type="signup", us=0),
        Row(user_id=4, event_type="purchase", us=200),
        Row(user_id=4, event_type="purchase", us=150),
        # never signed up: absent from output
        Row(user_id=5, event_type="purchase", us=10),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.user_id: r
        for r in funnel_two_step(
            df, "user_id", "event_type", F.col("us"),
            "signup", "purchase", horizon_us=200,
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1].converted and out[1].lag_us == 0
    assert not out[2].converted and out[2].step_b_us is None
    assert not out[3].converted
    assert out[4].converted and out[4].step_b_us == 150 and out[4].lag_us == 150


def test_tfidf_prefers_rare_terms(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common rare common"),
            Row(doc_id=2, text="common common"),
            Row(doc_id=3, text="common unique"),
        ]
    )
    out = tfidf_top_terms(df, k=1)
    got = {r.doc_id: (r.term, r.tf, r.df) for r in out.collect()}
    # doc 1: 'rare' df=1 beats 'common' (tf=2, df=3): 1/1 > 2/3
    assert got[1] == ("rare", 1, 1)
    assert got[2] == ("common", 2, 3)
    assert got[3] == ("unique", 1, 1)


def test_top_tokens_tie_break(spark):
    df = spark.createDataFrame(
        [Row(text="b a"), Row(text="a b"), Row(text="c")]
    )
    out = top_tokens(df, n=3).collect()
    assert [(r.token, r.n_occurrences) for r in out] == [
        ("a", 2), ("b", 2), ("c", 1)
    ]


def test_levenshtein_pairs_including_empty(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="kitten"),
            Row(doc_id=2, text="sitting"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text=""),
        ]
    )
    out = {(r.id_a, r.id_b): r for r in
           levenshtein_adjacent_pairs(df, 60).collect()}
    assert out[(1, 2)].edit_distance == 3
    assert out[(1, 2)].prefix_similarity == pytest.approx(1 - 3 / 7)
    assert out[(3, 4)].edit_distance == 0
    assert out[(3, 4)].prefix_similarity == 1.0


def test_grouped_quantiles_matches_statistics_quantiles(spark):
    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(0, 1000), 2) for _ in range(101)]
    df = spark.createDataFrame([Row(g="a", v=v, k=i) for i, v in enumerate(vals)])
    out = {r.q_pct: r.quantile for r in stats.grouped_quantiles(
        df, ["g"], "v", "k").collect()}
    # statistics.quantiles(method='inclusive') is type-7 — same definition.
    q1, q2, q3 = statistics.quantiles(vals, n=4, method="inclusive")
    assert out[25] == pytest.approx(q1, abs=1e-9)
    assert out[50] == pytest.approx(q2, abs=1e-9)
    assert out[75] == pytest.approx(q3, abs=1e-9)


def test_grouped_quantiles_exact_positions(spark):
    # n=5: positions (n-1)*q = 1, 2, 3 exactly -> no interpolation.
    df = spark.createDataFrame(
        [Row(g="a", v=float(x), k=x) for x in [10, 20, 30, 40, 50]]
    )
    out = {r.q_pct: r.quantile for r in stats.grouped_quantiles(
        df, ["g"], "v", "k").collect()}
    assert out == {25: 20.0, 50: 30.0, 75: 40.0}


def test_key_skew_profile_shares(spark):
    df = spark.createDataFrame(
        [Row(k="hot")] * 6 + [Row(k="warm")] * 3 + [Row(k="cold")]
    )
    out = stats.key_skew_profile(df, "k", 2).collect()
    assert [(r.k, r.key_count, r.key_share) for r in out] == [
        ("hot", 6, 0.6), ("warm", 3, 0.3)
    ]


def test_cohort_retention_hand_grid(spark):
    from simple_anonymizer_spark.operators.cohort import cohort_retention

    P = 100  # period length in "us"
    rows = [
        # entity 1: first in period 0, active in periods 0, 1, 3
        Row(e=1, us=10), Row(e=1, us=150), Row(e=1, us=310), Row(e=1, us=320),
        # entity 2: first in period 0, active only period 0
        Row(e=2, us=99),
        # entity 3: first in period 1, active periods 1 and 2
        Row(e=3, us=100), Row(e=3, us=250),
    ]
    df = spark.createDataFrame(rows)
    out = {(r.cohort_start_us, r.periods_since): (r.n_active, r.cohort_size,
                                                  r.retained_share)
           for r in cohort_retention(df, "e", F.col("us"), P).collect()}
    assert out[(0, 0)] == (2, 2, 1.0)
    assert out[(0, 1)] == (1, 2, 0.5)
    assert out[(0, 3)] == (1, 2, 0.5)
    assert (0, 2) not in out  # nobody from cohort 0 active in period 2
    assert out[(100, 0)] == (1, 1, 1.0)
    assert out[(100, 1)] == (1, 1, 1.0)


def test_scd2_intervals_run_collapse(spark):
    from simple_anonymizer_spark.operators.scd import scd2_intervals

    rows = [
        Row(k=1, us=10, s="A"), Row(k=1, us=20, s="A"),  # run collapses
        Row(k=1, us=30, s="B"), Row(k=1, us=40, s="A"),  # A again: new run
        Row(k=2, us=5, s="X"),
    ]
    df = spark.createDataFrame(rows)
    out = sorted(
        (r.k, r.state, r.valid_from_us, r.valid_to_us)
        for r in scd2_intervals(df, "k", F.col("us"), "s").collect()
    )
    assert out == [
        (1, "A", 10, 30), (1, "A", 40, None), (1, "B", 30, 40),
        (2, "X", 5, None),
    ]


def test_funnel_steps_chain_break(spark):
    from simple_anonymizer_spark.operators.funnel import funnel_steps

    rows = [
        # completes all three, step2 tie at step1's microsecond
        Row(u=1, t="a", us=100), Row(u=1, t="b", us=100), Row(u=1, t="c", us=300),
        # breaks at step 2 (b happens BEFORE a)
        Row(u=2, t="b", us=50), Row(u=2, t="a", us=60), Row(u=2, t="c", us=70),
        # never does step 1: absent
        Row(u=3, t="b", us=10),
    ]
    df = spark.createDataFrame(rows)
    out = {r.u: r for r in funnel_steps(
        df, "u", "t", F.col("us"), ["a", "b", "c"]).collect()}
    assert set(out) == {1, 2}
    assert (out[1].step_1_us, out[1].step_2_us, out[1].step_3_us,
            out[1].n_steps) == (100, 100, 300, 3)
    # u2: step3 'c'@70 is >= step1 but step2 never happened -> chain broken
    assert (out[2].step_2_us, out[2].step_3_us, out[2].n_steps) == (None, None, 1)


def test_running_distinct_counts(spark):
    rows = [
        Row(p="t", e="u1", o=1), Row(p="t", e="u1", o=2),
        Row(p="t", e="u2", o=3), Row(p="t", e="u1", o=4),
        Row(p="t", e="u3", o=5), Row(p="x", e="u1", o=1),
    ]
    df = spark.createDataFrame(rows)
    out = {(r.p, r.o): r.n_distinct_so_far
           for r in stats.running_distinct(df, "p", "e", ["o"]).collect()}
    assert out == {("t", 1): 1, ("t", 2): 1, ("t", 3): 2,
                   ("t", 4): 2, ("t", 5): 3, ("x", 1): 1}


def test_running_distinct_matches_naive_window(spark):
    """The grouped two-pass prefix-sum decomposition must be
    output-identical to the naive single-window form (the per_group_cap
    / _per_query_topk invariant), including groups that straddle many
    range partitions and a NULL group key."""
    from pyspark.sql import Window

    rows = [
        Row(p=p, e=f"u{(i * 7) % 13}", o=i)
        for p in ("a", "b", None)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "p string, e string, o long")
    got = {
        (r.p, r.o): r.n_distinct_so_far
        for r in stats.running_distinct(
            df, "p", "e", ["o"], partitions=8
        ).collect()
    }
    w_first = Window.partitionBy("p", "e").orderBy("o")
    w_cum = (
        Window.partitionBy("p").orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r.p, r.o): r.n
        for r in df.withColumn(
            "__f", F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
        )
        .withColumn("n", F.sum("__f").over(w_cum).cast("long"))
        .collect()
    }
    assert got == naive


def test_contamination_hand_case(spark):
    from simple_anonymizer_spark.operators.contamination import (
        contamination_report,
        token_ngrams,
    )

    train = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e f g")]
    )
    test = spark.createDataFrame(
        [
            # grams: "x a b c d", "a b c d e" (hit), "b c d e x"
            Row(doc_id=10, text="x a b c d e x"),
            Row(doc_id=11, text="q r s t u v"),   # no overlap
            Row(doc_id=12, text="one two"),        # < 5 tokens: no grams
        ]
    )
    out = {r.doc_id: r for r in contamination_report(train, test).collect()}
    assert (out[10].n_grams, out[10].n_contaminated) == (3, 1)
    assert out[10].contamination_ratio == pytest.approx(1 / 3)
    assert not out[10].flagged is None
    assert out[11].n_contaminated == 0 and not out[11].flagged
    assert out[12].n_grams == 0 and out[12].contamination_ratio is None
    # the short-doc guard: no descending-sequence blowup
    [g] = spark.range(1).select(
        token_ngrams(F.lit("a b"), 5).alias("g")).collect()
    assert g.g == []


def test_anomaly_flags_fire_on_outlier(spark):
    from simple_anonymizer_spark.operators.quality_audit import anomaly_flags

    rows = [Row(g="s", id=i, v=100.0 + (i % 5)) for i in range(40)]
    rows.append(Row(g="s", id=999, v=5000.0))  # blatant outlier
    rows.append(Row(g="t", id=50, v=7.0))      # n=1 group: stddev NULL, skipped
    out = anomaly_flags(
        spark.createDataFrame(rows), ["g"], "v", "id"
    ).collect()
    assert [r.id for r in out] == [999]
    assert out[0].value == 5000.0 and out[0].g == "s"


def test_winsorize_clips_and_preserves(spark):
    rows = [Row(g="a", v=float(x), k=i)
            for i, x in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    out = {r.k: r for r in stats.winsorize(
        spark.createDataFrame(rows), ["g"], "v", "k",
        lo=(10, 100), hi=(90, 100)).collect()}
    assert len(out) == 10
    # p10 of 1..9,1000 (type-7): idx 0.9 -> 1.9; p90: idx 8.1 -> 9 + 0.1*991
    assert out[0].winsorized == pytest.approx(1.9)
    assert out[0].clipped_low and not out[0].clipped_high
    assert out[9].clipped_high and out[9].winsorized < 1000.0
    assert not out[4].clipped_low and not out[4].clipped_high
    assert out[4].winsorized == 5.0  # interior value untouched


def test_jaccard_join_exact_boundary(spark):
    from simple_anonymizer_spark.operators.simjoin import jaccard_join

    rows = [
        Row(doc_id=1, text="a b c d"),
        Row(doc_id=2, text="a b c d"),      # J = 1.0 with doc 1
        Row(doc_id=3, text="a b c x"),      # J = 3/5 = 0.6 with docs 1-2
        Row(doc_id=4, text="p q r s"),      # J = 0 with everything
        Row(doc_id=5, text=""),             # empty: never pairs
    ]
    df = spark.createDataFrame(rows)
    at_06 = {(r.id_a, r.id_b): r for r in
             jaccard_join(df, threshold=(3, 5)).collect()}
    # boundary INCLUSIVE: 0.6 pairs survive a 3/5 threshold
    assert set(at_06) == {(1, 2), (1, 3), (2, 3)}
    assert at_06[(1, 2)].jaccard == 1.0
    assert at_06[(1, 3)].n_inter == 3 and at_06[(1, 3)].n_union == 5
    at_07 = {(r.id_a, r.id_b) for r in
             jaccard_join(df, threshold=(7, 10)).collect()}
    assert at_07 == {(1, 2)}


def test_fk_audit_detects_injected_orphan(spark):
    from simple_anonymizer_spark.operators.quality_audit import fk_audit
    from simple_anonymizer_spark.sources.catalog import LogicalFK

    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)]  # 99 orphan; NULL ok
    )
    [r] = fk_audit(
        {"child": child, "parent": parent},
        [LogicalFK(None, "child", "parent", (("fk", "pk"),))],
    ).collect()
    assert (r.child_table, r.parent_table, r.orphans) == ("child", "parent", 1)


def test_profile_table_counts(spark):
    from simple_anonymizer_spark.operators.quality_audit import profile_table

    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b=None), Row(a=2, b="y")]
    )
    out = {r.column: (r.null_count, r.n_distinct)
           for r in profile_table(df).collect()}
    assert out == {"a": (0, 2), "b": (1, 2)}


def test_distribution_drift_bounds(spark):
    a = spark.createDataFrame([Row(v=float(x)) for x in [10, 10, 20, 20]])
    same = stats.distribution_drift(a, a, "v", 1000).collect()[0]
    assert same.tvd == 0.0 and same.n_bins == 2
    b = spark.createDataFrame([Row(v=float(x)) for x in [90, 90, 95]])
    disjoint = stats.distribution_drift(a, b, "v", 1000).collect()[0]
    assert disjoint.tvd == 1.0  # fully disjoint supports
    mixed = stats.distribution_drift(
        a, spark.createDataFrame([Row(v=10.0), Row(v=90.0)]), "v", 1000
    ).collect()[0]
    assert 0.0 < mixed.tvd < 1.0


def test_equi_depth_histogram_properties(spark, sf_dir):
    """Bins hold equal counts (+-1), edges are ordered and non-overlapping,
    total mass conserved, result invariant to partition count."""
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators.stats import equi_depth_histogram
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    orders = read_sf_table(spark, sf_dir, "orders")
    total = orders.count()
    owner: list = []
    rows = sorted(
        (r.bin, r.n_rows, r.lo, r.hi)
        for r in equi_depth_histogram(
            orders, "o_totalprice", "o_orderkey", 10, cache_owner=owner
        ).collect()
    )
    assert [b for b, *_ in rows] == list(range(10))
    counts = [n for _, n, *_ in rows]
    assert sum(counts) == total
    assert max(counts) - min(counts) <= 1  # equal frequency
    for (_, _, lo, hi), (_, _, lo2, _) in zip(rows, rows[1:]):
        assert lo <= hi <= lo2  # ordered, non-overlapping edges
    wide_owner: list = []
    wide = sorted(
        (r.bin, r.n_rows, r.lo, r.hi)
        for r in equi_depth_histogram(
            orders, "o_totalprice", "o_orderkey", 10,
            partitions=64, cache_owner=wide_owner,
        ).collect()
    )
    assert wide == rows
    for c in owner + wide_owner:
        c.unpersist()


def test_equi_depth_histogram_owns_cache_when_unowned(spark, sf_dir):
    """cache_owner=None must not pin partitions past the call: the function
    materializes the tiny histogram, releases its cache, and still returns
    the same rows (headline-query leak regression, ADVICE r3)."""
    from simple_anonymizer_spark.operators.stats import equi_depth_histogram
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    sc = spark.sparkContext
    before = {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    orders = read_sf_table(spark, sf_dir, "orders")
    owner: list = []
    owned = sorted(
        map(tuple, equi_depth_histogram(
            orders, "o_totalprice", "o_orderkey", 10, cache_owner=owner
        ).collect())
    )
    for c in owner:
        c.unpersist()
    unowned = sorted(
        map(tuple, equi_depth_histogram(
            orders, "o_totalprice", "o_orderkey", 10
        ).collect())
    )
    assert unowned == owned
    after = {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    assert after - before == set()  # nothing left pinned


def test_quantile_buckets_partition_invariance_and_exactness(spark):
    from simple_anonymizer_spark.operators.stats import quantile_buckets

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(200)], "k long, v double"
    )
    owner = []
    a = sorted(
        (r.k, r.bucket)
        for r in quantile_buckets(df.repartition(1), "v", "k", 4,
                                  cache_owner=owner).collect()
    )
    b = sorted(
        (r.k, r.bucket)
        for r in quantile_buckets(df.repartition(13), "v", "k", 4,
                                  cache_owner=owner).collect()
    )
    assert a == b
    counts = {}
    for _, bucket in a:
        counts[bucket] = counts.get(bucket, 0) + 1
    assert counts == {0: 50, 1: 50, 2: 50, 3: 50}  # exactly equal depth
    for c in owner:
        c.unpersist()


def test_rfm_scores_monotone_in_metrics(spark, sf_dir):
    from simple_anonymizer_spark.operators.stats import rfm_segments

    owner = []
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    seg = rfm_segments(orders, cache_owner=owner).collect()
    by_freq = sorted(seg, key=lambda r: (r.frequency, r.customer))
    scores = [r.f_score for r in by_freq]
    assert scores == sorted(scores)  # ranking monotone in the metric
    assert set(scores) == {1, 2, 3, 4}
    for c in owner:
        c.unpersist()


# ---------------------------------------------------------------------------
# MAD robust outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_wild_value(spark):
    from simple_anonymizer_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [("A", float(v), i) for i, v in enumerate([1, 2, 3, 4, 100])],
        "g string, v double, t long",
    )
    r = mad_outliers(df, ["g"], "v", "t", c=3).collect()[0]
    assert (r.n_rows, r.n_outliers) == (5, 1)   # only the 100
    assert r.median == 3.0 and r.mad == 1.0


def test_mad_outliers_even_group_exact_halves(spark):
    from simple_anonymizer_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [("A", float(v), i) for i, v in enumerate([1, 2, 3, 4])],
        "g string, v double, t long",
    )
    r = mad_outliers(df, ["g"], "v", "t", c=3).collect()[0]
    assert r.median == 2.5 and r.mad == 1.0
    assert r.n_outliers == 0


def test_mad_outliers_resists_contamination_where_sigma_fails(spark):
    from simple_anonymizer_spark.operators.stats import mad_outliers

    # 20 inliers at 10 +/- 1 cent and two 1e6 spikes: a 3-sigma rule's
    # stddev explodes (sigma ~ 3e5, spikes < 3.3 sigma -> missed);
    # median/MAD still flags both.
    vals = [10.0 + (i % 3 - 1) * 0.01 for i in range(20)] + [1e6, 1e6]
    df = spark.createDataFrame(
        [("A", v, i) for i, v in enumerate(vals)], "g string, v double, t long"
    )
    r = mad_outliers(df, ["g"], "v", "t", c=3).collect()[0]
    assert r.n_outliers == 2
    assert r.median == 10.0


def test_mad_outliers_groups_independent(spark):
    from simple_anonymizer_spark.operators.stats import mad_outliers

    rows = [("A", float(v), i) for i, v in enumerate([1, 2, 3])] + \
           [("B", float(v), i) for i, v in enumerate([100, 200, 300, 10000])]
    df = spark.createDataFrame(rows, "g string, v double, t long")
    out = {r.g: r for r in mad_outliers(df, ["g"], "v", "t").collect()}
    assert out["A"].median == 2.0 and out["A"].n_outliers == 0
    assert out["B"].median == 250.0 and out["B"].n_outliers == 1


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample statistic
# ---------------------------------------------------------------------------


def _ks(spark, a_vals, b_vals):
    from simple_anonymizer_spark.operators.stats import ks_statistic

    da = spark.createDataFrame([(float(v),) for v in a_vals], "v double")
    db = spark.createDataFrame([(float(v),) for v in b_vals], "v double")
    rows = ks_statistic(da, db, "v").collect()
    return rows[0] if rows else None


def test_ks_identical_distributions_zero(spark):
    r = _ks(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    assert (r.n_a, r.n_b, r.ks) == (4, 4, 0.0)


def test_ks_disjoint_distributions_one(spark):
    r = _ks(spark, [1, 2, 3], [10, 11, 12])
    assert r.ks == 1.0
    assert r.ks_at == 3.0        # the last A value separates fully


def test_ks_known_half_shift(spark):
    # A = {1,2}, B = {2,3}: F_A(1)=.5,F_B(1)=0 -> diff .5; at 2: 1 vs .5
    r = _ks(spark, [1, 2], [2, 3])
    assert r.ks == 0.5
    assert r.ks_at == 1.0        # smallest value attaining the supremum
    assert (r.n_a, r.n_b) == (2, 2)


def test_ks_partition_invariance(spark):
    from simple_anonymizer_spark.operators.stats import ks_statistic

    a = spark.createDataFrame(
        [(float(i % 37),) for i in range(500)], "v double")
    b = spark.createDataFrame(
        [(float((i * 7) % 41),) for i in range(400)], "v double")
    r1 = ks_statistic(a.repartition(1), b.repartition(1), "v").collect()[0]
    r2 = ks_statistic(a.repartition(13), b.repartition(7), "v").collect()[0]
    assert tuple(r1) == tuple(r2)
    assert 0.0 < r1.ks < 1.0


def test_ks_empty_side_returns_empty(spark):
    from simple_anonymizer_spark.operators.stats import ks_statistic

    a = spark.createDataFrame([(1.0,)], "v double")
    b = spark.createDataFrame([], "v double")
    assert ks_statistic(a, b, "v").collect() == []


def test_quantile_transform_exact_positions(spark):
    from simple_anonymizer_spark.operators.stats import quantile_transform

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([30, 10, 20, 40, 10])],
        "k long, v double",
    )
    out = {r.k: (r.rank, r.q) for r in
           quantile_transform(df, "v", "k").collect()}
    # ties on v=10 break by key: k=1 before k=4
    assert out[1] == (0, 0.0)
    assert out[4] == (1, 0.25)
    assert out[2] == (2, 0.5)
    assert out[0] == (3, 0.75)
    assert out[3] == (4, 1.0)


def test_quantile_transform_partition_invariance(spark):
    from simple_anonymizer_spark.operators.stats import quantile_transform

    # Identical ranks under any input partitioning; the range cache is
    # unpersisted inside the operator (localCheckpoint blocks that remain
    # are GC-managed, the same contract as pagerank's checkpoints).
    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(400)], "k long, v double"
    )
    a = sorted(map(tuple, quantile_transform(df.repartition(3), "v", "k").collect()))
    b = sorted(map(tuple, quantile_transform(df.repartition(11), "v", "k").collect()))
    assert a == b


def test_quantile_transform_single_row(spark):
    from simple_anonymizer_spark.operators.stats import quantile_transform

    df = spark.createDataFrame([(7, 3.5)], "k long, v double")
    assert quantile_transform(df, "v", "k").collect()[0].q == 0.0


# ---------------------------------------------------------------------------
# grouped_ols
# ---------------------------------------------------------------------------


def test_ols_recovers_exact_line(spark):
    from simple_anonymizer_spark.operators.stats import grouped_ols

    rows = [("g", x, 3 * x + 7) for x in range(50)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = grouped_ols(df, ["g"], "x", "y").collect()[0]
    assert r.n_points == 50
    assert r.slope == 3.0 and r.intercept == 7.0
    assert r.r_squared == 1.0  # exact line


def test_ols_degenerate_x_null(spark):
    from simple_anonymizer_spark.operators.stats import grouped_ols

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 9)], "g string, x long, y long")
    r = grouped_ols(df, ["g"], "x", "y").collect()[0]
    assert r.slope is None and r.intercept is None
    assert r.r_squared is None


def test_ols_partition_invariance(spark):
    from simple_anonymizer_spark.operators.stats import grouped_ols

    rows = [(f"g{i % 3}", i, (i * 17) % 101) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    a = sorted(map(tuple, grouped_ols(df, ["g"], "x", "y").collect()))
    b = sorted(map(tuple, grouped_ols(
        df.repartition(13), ["g"], "x", "y").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# two_proportion_ztest
# ---------------------------------------------------------------------------


def test_ztest_hand_computed(spark):
    import math

    from simple_anonymizer_spark.operators.stats import two_proportion_ztest

    # arm A: 100 units, 20 conv; arm B: 100 units, 30 conv
    rows = [(0, 1 if i < 20 else 0) for i in range(100)]
    rows += [(1, 1 if i < 30 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "variant int, success int")
    r = two_proportion_ztest(df, "variant", "success").collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (100, 20, 100, 30)
    pool = 50 / 200
    se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r.z_stat == (0.3 - 0.2) / se


def test_ztest_degenerate_pool_null(spark):
    from simple_anonymizer_spark.operators.stats import two_proportion_ztest

    df = spark.createDataFrame(
        [(0, 0), (1, 0)], "variant int, success int")
    r = two_proportion_ztest(df, "variant", "success").collect()[0]
    assert r.z_stat is None  # pooled rate 0


# ---------------------------------------------------------------------------
# linear_attribution
# ---------------------------------------------------------------------------


def _attr(spark, events, **kw):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators.funnel import linear_attribution

    df = spark.createDataFrame(
        events, "ent string, typ string, ts long, id long")
    return linear_attribution(
        df, "ent", "typ", F.col("ts"), "id",
        touch_types=["click", "view"], convert_type="buy", **kw)


def test_attribution_splits_credit(spark):
    # one conversion at t=100 with 2 in-window touches -> 0.5 each
    ev = [("u", "click", 90, 1), ("u", "view", 95, 2), ("u", "buy", 100, 3)]
    out = {(r.touch_type, r.touches_per_conversion): r
           for r in _attr(spark, ev, window_us=50).collect()}
    assert out[("click", 2)].credit == 0.5
    assert out[("view", 2)].credit == 0.5


def test_attribution_window_and_strict_before(spark):
    # touch AT the conversion instant and outside the window both excluded
    ev = [("u", "click", 100, 1), ("u", "view", 40, 2), ("u", "buy", 100, 3)]
    assert _attr(spark, ev, window_us=50).count() == 0


def test_attribution_total_credit_equals_attributed_conversions(spark):
    ev = []
    eid = 0
    for u in range(20):
        for t in range(u % 4):
            eid += 1
            ev.append((f"u{u}", "click" if t % 2 else "view", 50 + t, eid))
        eid += 1
        ev.append((f"u{u}", "buy", 100, eid))
    out = _attr(spark, ev, window_us=1000).collect()
    attributed = sum(1 for u in range(20) if u % 4 > 0)
    total_credit = sum(r.credit for r in out)
    assert abs(total_credit - attributed) < 1e-9


# ---------------------------------------------------------------------------
# bootstrap_mean_ci
# ---------------------------------------------------------------------------


def test_bootstrap_resample_means_bracket_truth(spark):
    from simple_anonymizer_spark.operators.stats import bootstrap_mean_ci

    rows = [(i, 100 + (i * 37) % 50) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v long")
    true_mean = sum(v for _, v in rows) / len(rows)
    means = sorted(r.mean for r in bootstrap_mean_ci(
        df, "v", "id", n_resamples=32).collect())
    assert len(means) == 32
    # all resample means near truth; the sorted band brackets it
    assert means[0] <= true_mean <= means[-1]
    for m in means:
        assert abs(m - true_mean) / true_mean < 0.05


def test_bootstrap_partition_invariance(spark):
    from simple_anonymizer_spark.operators.stats import bootstrap_mean_ci

    rows = [(i, (i * 13) % 1000) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = sorted(map(tuple, bootstrap_mean_ci(df, "v", "id", 8).collect()))
    b = sorted(map(tuple, bootstrap_mean_ci(
        df.repartition(11), "v", "id", 8).collect()))
    assert a == b


def test_poisson_thresholds_mean_one(spark):
    # multiplicities over many rows should average ~1 (Poisson(1) mean)
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, 1) for i in range(5000)], "id long, v long")
    out = bootstrap_mean_ci(df, "v", "id", n_resamples=4).collect()
    for r in out:
        assert abs(r.n_drawn - 5000) / 5000 < 0.05


# ---------------------------------------------------------------------------
# chisq_independence
# ---------------------------------------------------------------------------


def test_chisq_hand_computed_2x2(spark):
    from simple_anonymizer_spark.operators.stats import chisq_independence

    # 2x2 table: [[30, 10], [20, 40]]
    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 20 + [("b", "y")] * 40)
    df = spark.createDataFrame(rows, "r string, c string")
    out = chisq_independence(df, "r", "c").collect()[0]
    assert (out.n, out.n_rows, out.n_cols, out.dof) == (100, 2, 2, 1)
    # hand: e = [[20,20],[30,30]]; chi2 = 100/20*2... compute directly
    expected = (30 - 20) ** 2 / 20 + (10 - 20) ** 2 / 20 \
        + (20 - 30) ** 2 / 30 + (40 - 30) ** 2 / 30
    assert abs(out.chi2 - expected) < 1e-9


def test_chisq_independent_is_zero(spark):
    from simple_anonymizer_spark.operators.stats import chisq_independence

    # perfectly proportional table -> chi2 == 0
    rows = ([("a", "x")] * 10 + [("a", "y")] * 20
            + [("b", "x")] * 30 + [("b", "y")] * 60)
    df = spark.createDataFrame(rows, "r string, c string")
    assert chisq_independence(df, "r", "c").collect()[0].chi2 == 0.0


def test_chisq_zero_cell_included(spark):
    from simple_anonymizer_spark.operators.stats import chisq_independence

    # (b, y) never observed: the grid must still charge its expected mass
    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = chisq_independence(df, "r", "c").collect()[0]
    expected = ((5 - 7.5) ** 2 / 7.5 + (5 - 2.5) ** 2 / 2.5
                + (10 - 7.5) ** 2 / 7.5 + (0 - 2.5) ** 2 / 2.5)
    assert abs(out.chi2 - expected) < 1e-9


# ---------------------------------------------------------------------------
# mannwhitney_u
# ---------------------------------------------------------------------------


def test_mannwhitney_hand_computed_no_ties(spark):
    from simple_anonymizer_spark.operators.stats import mannwhitney_u

    # A = {1,3,5}, B = {2,4,6}: ranks A = 1,3,5 -> R_A=9, U_A = 9-6 = 3
    rows = [(0, 1), (0, 3), (0, 5), (1, 2), (1, 4), (1, 6)]
    df = spark.createDataFrame(rows, "variant int, v long")
    r = mannwhitney_u(df, "variant", "v").collect()[0]
    assert (r.n_a, r.n_b, r.tie_groups) == (3, 3, 0)
    assert r.u2_a == 6.0  # 2 * U_A


def test_mannwhitney_ties_midranks(spark):
    from simple_anonymizer_spark.operators.stats import mannwhitney_u

    # A = {1,2}, B = {2,3}: value 2 ties across arms, midrank 2.5
    # R_A = 1 + 2.5 = 3.5 -> 2R_A=7; 2U_A = 7 - 2*3 = 1
    rows = [(0, 1), (0, 2), (1, 2), (1, 3)]
    df = spark.createDataFrame(rows, "variant int, v long")
    r = mannwhitney_u(df, "variant", "v").collect()[0]
    assert r.u2_a == 1.0 and r.tie_groups == 1


def test_mannwhitney_identical_distributions_z_zero(spark):
    from simple_anonymizer_spark.operators.stats import mannwhitney_u

    # perfectly matched arms: each value appears once per arm, so the
    # rank sums split evenly and U_A sits exactly at its mean
    rows = [(i % 2, (i // 2 * 17) % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "variant int, v long")
    r = mannwhitney_u(df, "variant", "v").collect()[0]
    assert r.z_stat == 0.0


def test_mannwhitney_shifted_distribution_detected(spark):
    from simple_anonymizer_spark.operators.stats import mannwhitney_u

    rows = [(0, (i * 17) % 100) for i in range(500)]
    rows += [(1, (i * 17) % 100 + 30) for i in range(500)]
    df = spark.createDataFrame(rows, "variant int, v long")
    r = mannwhitney_u(df, "variant", "v").collect()[0]
    assert r.z_stat < -5  # arm B strongly larger -> U_A far below mean


def test_mannwhitney_degenerate_all_tied(spark):
    from simple_anonymizer_spark.operators.stats import mannwhitney_u

    df = spark.createDataFrame(
        [(0, 7), (1, 7), (0, 7), (1, 7)], "variant int, v long")
    r = mannwhitney_u(df, "variant", "v").collect()[0]
    assert r.z_stat is None  # variance degenerates


# ---------------------------------------------------------------------------
# welch_ttest / cuped_adjustment
# ---------------------------------------------------------------------------


def test_welch_hand_computed(spark):
    from simple_anonymizer_spark.operators.stats import welch_ttest

    a = [10, 12, 14, 16, 18]          # mean 14, var 10
    b = [20, 25, 30]                  # mean 25, var 25
    rows = [(0, x) for x in a] + [(1, x) for x in b]
    df = spark.createDataFrame(rows, "variant int, v long")
    r = welch_ttest(df, "variant", "v").collect()[0]
    assert (r.n_a, r.n_b) == (5, 3)
    assert r.mean_a == 14.0 and r.mean_b == 25.0
    assert r.var_a == 10.0 and r.var_b == 25.0
    se2 = 10 / 5 + 25 / 3
    import math
    assert abs(r.t_stat - (25 - 14) / math.sqrt(se2)) < 1e-12
    dof = se2 ** 2 / ((10 / 5) ** 2 / 4 + (25 / 3) ** 2 / 2)
    assert abs(r.dof - dof) < 1e-9


def test_welch_degenerate_single_unit_arm(spark):
    from simple_anonymizer_spark.operators.stats import welch_ttest

    df = spark.createDataFrame(
        [(0, 5), (1, 1), (1, 2)], "variant int, v long")
    r = welch_ttest(df, "variant", "v").collect()[0]
    assert r.t_stat is None and r.var_a is None


def test_cuped_perfect_covariate_removes_all_variance(spark):
    from simple_anonymizer_spark.operators.stats import cuped_adjustment

    # post = pre exactly -> theta = 1, rho2 = 1, adjusted diff = 0
    rows = [(i % 2, 100 + i, 100 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "variant int, pre long, post long")
    r = cuped_adjustment(df, "variant", "pre", "post").collect()[0]
    assert r.theta == 1.0 and r.rho2 == 1.0
    assert abs(r.diff_adj) < 1e-9


def test_cuped_uncorrelated_covariate_is_noop_shift(spark):
    from simple_anonymizer_spark.operators.stats import cuped_adjustment

    # pre constant -> den = 0 -> theta NULL, raw means still reported
    rows = [(i % 2, 5, 10 + i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "variant int, pre long, post long")
    r = cuped_adjustment(df, "variant", "pre", "post").collect()[0]
    assert r.theta is None and r.mean_adj_a is None
    assert r.mean_a is not None and r.diff_mean is not None


def test_cuped_balanced_shift_preserved(spark):
    from simple_anonymizer_spark.operators.stats import cuped_adjustment

    # arm B's post is arm A's + 7 with identical pre: adjustment keeps
    # the true treatment effect
    rows = [(0, (i * 13) % 50, 100 + (i * 13) % 50) for i in range(200)]
    rows += [(1, (i * 13) % 50, 107 + (i * 13) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "variant int, pre long, post long")
    r = cuped_adjustment(df, "variant", "pre", "post").collect()[0]
    assert abs(r.diff_mean - 7.0) < 1e-9
    assert abs(r.diff_adj - 7.0) < 1e-9
    assert r.theta == 1.0
    # the +7 treatment effect is itself y-variance the pooled covariate
    # cannot explain, so rho2 tops out below 1 even with a perfect pre
    assert r.rho2 > 0.9
