"""Deterministic sampling/split tests: reproducibility, partitioning
invariance, rate accuracy, salt independence, split disjointness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators import sampling


@pytest.fixture()
def ids(spark):
    return spark.range(0, 5000).select(F.col("id").alias("key"))


def keys(df):
    return {r.key for r in df.collect()}


def test_sample_is_deterministic_and_layout_invariant(ids):
    a = keys(sampling.hash_sample(ids, 0.3, "key"))
    b = keys(sampling.hash_sample(ids, 0.3, "key"))
    c = keys(sampling.hash_sample(ids.repartition(17), 0.3, "key"))
    assert a == b == c
    assert abs(len(a) / 5000 - 0.3) < 0.03


def test_rates_nest(ids):
    """Lower rate is a subset of higher rate (same salt) — thresholds on
    one bucket value nest by construction."""
    small = keys(sampling.hash_sample(ids, 0.1, "key"))
    big = keys(sampling.hash_sample(ids, 0.4, "key"))
    assert small <= big


def test_salts_give_independent_samples(ids):
    a = keys(sampling.hash_sample(ids, 0.5, "key", salt="a"))
    b = keys(sampling.hash_sample(ids, 0.5, "key", salt="b"))
    overlap = len(a & b) / 5000
    assert 0.15 < overlap < 0.35  # ~0.25 if independent


def test_stratified_rates(spark):
    df = spark.range(0, 6000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("stratum"),
    )
    out = sampling.stratified_sample(
        df, "stratum", {"a": 0.5, "b": 0.1}, key_col="key", default_rate=0.0
    )
    got = out.groupBy("stratum").count().collect()
    by = {r.stratum: r["count"] for r in got}
    assert abs(by["a"] / 2000 - 0.5) < 0.05
    assert abs(by["b"] / 2000 - 0.1) < 0.03
    assert "c" not in by  # default 0 drops the stratum entirely


def test_split_partitions_every_row_once(ids):
    out = sampling.train_val_test_split(ids, "key")
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 5000
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02
    # adding a later split never moves earlier assignments
    out2 = sampling.train_val_test_split(
        ids, "key", fractions={"train": 0.8, "val": 0.1, "holdout": 0.1}
    )
    train1 = {r.key for r in out.where("split = 'train'").collect()}
    train2 = {r.key for r in out2.where("split = 'train'").collect()}
    assert train1 == train2


def test_validation(ids):
    with pytest.raises(ValueError, match="rate must be"):
        sampling.hash_sample(ids, 1.5, "key")
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.train_val_test_split(ids, "key", fractions={"a": 0.5, "b": 0.4})


def test_sampling_is_pure_codegen(ids):
    out = sampling.hash_sample(ids, 0.3, "key")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_balanced_sample_caps_classes(spark):
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.sampling import balanced_sample

    rows = [Row(k=i, label="big") for i in range(100)]
    rows += [Row(k=1000 + i, label="small") for i in range(3)]
    df = spark.createDataFrame(rows)
    out = balanced_sample(df, "label", 10, "k")
    counts = {r.label: r.n for r in out.groupBy("label").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts == {"big": 10, "small": 3}
    # Determinism: same selection under a different partition layout.
    again = balanced_sample(df.repartition(13), "label", 10, "k")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_weighted_sample_favors_heavy_rows(spark, sf_dir):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators.sampling import weighted_sample_topk
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sample = weighted_sample_topk(docs, "n_chars", 100, "doc_id")
    assert sample.count() == 100
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sample.agg(F.avg("n_chars")).first()[0]
    # inclusion ~ weight, so the sample mean must sit clearly above the
    # corpus mean (length-biased sampling inflates the expectation)
    assert sample_mean > corpus_mean * 1.05, (sample_mean, corpus_mean)
    # determinism across invocations
    a = sorted(r.doc_id for r in sample.collect())
    b = sorted(r.doc_id for r in
               weighted_sample_topk(docs, "n_chars", 100, "doc_id").collect())
    assert a == b


def test_weighted_sample_plans_take_ordered(spark, sf_dir):
    from simple_anonymizer_spark.operators.sampling import weighted_sample_topk
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    plan = (weighted_sample_topk(docs, "n_chars", 100, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_remix_equalizes_group_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators.sampling import remix_equal
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "lang")
    before = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert len(set(before.values())) > 1  # fixture is actually skewed
    after = {
        r.lang: r["count"]
        for r in remix_equal(docs, "lang", "doc_id")
            .groupBy("lang").count().collect()
    }
    assert set(after.values()) == {min(before.values())}
    assert set(after) == set(before)


def test_remix_temperature_quotas_and_determinism(spark, sf_dir):
    """T=2 remix: per-group output equals the integer quota
    min(n, (total * floor(sqrt(n))) div sum(floor(sqrt(n)))), the total
    never exceeds the ask, low-resource groups gain relative share, and
    the selection is layout-invariant."""
    import math

    from simple_anonymizer_spark.operators.sampling import remix_temperature
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "lang")
    before = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    total = sum(before.values())
    ask = total // 2
    wts = {g: math.floor(math.sqrt(n)) for g, n in before.items()}
    sum_w = sum(wts.values())
    expected = {g: min(before[g], (ask * wts[g]) // sum_w) for g in before}

    out = remix_temperature(docs, "lang", "doc_id", ask)
    after = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert after == {g: n for g, n in expected.items() if n > 0}
    assert sum(after.values()) <= ask

    # sqrt-share mix: the smallest group's share must strictly grow
    # (unless already quota-capped at its full size).
    small = min(before, key=before.get)
    if after[small] < before[small]:
        assert after[small] / sum(after.values()) > before[small] / total

    # layout invariance: same keys regardless of partitioning
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id
         for r in remix_temperature(docs.repartition(17), "lang", "doc_id", ask).collect()}
    assert a == b


def test_remix_equal_tokens_caps_weight_per_group(spark):
    """Per-group cumulative-weight cap: every group's kept weight is
    <= budget, the kept set is the strict hash-order prefix (verified
    against a per-group brute-force reference), and a row heavier than
    the whole budget at the front of the order blocks nothing behind a
    lighter prefix — the cut is on cumulative, not individual, weight."""
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.sampling import (
        remix_equal_tokens, sample_bucket,
    )

    rows = [Row(k=i, g=["a", "b", "c"][i % 3], w=1 + (i * 7) % 20)
            for i in range(240)]
    df = spark.createDataFrame(rows)
    budget = 200

    # brute-force reference: per group, admit in (bucket, key) order
    buckets = {
        r.k: r.b
        for r in df.select("k", sample_bucket("k", "_tokmix").alias("b")).collect()
    }
    expected = set()
    for g in "abc":
        cum = 0
        for r in sorted((r for r in rows if r.g == g),
                        key=lambda r: (buckets[r.k], r.k)):
            cum += r.w
            if cum > budget:
                break
            expected.add(r.k)

    out = remix_equal_tokens(df, "g", "w", "k", budget)
    got = {r.k for r in out.collect()}
    assert got == expected
    per_group = {r.g: r.s for r in
                 out.groupBy("g").agg(F.sum("w").alias("s")).collect()}
    assert all(s <= budget for s in per_group.values())
    # layout invariance
    got2 = {r.k for r in
            remix_equal_tokens(df.repartition(13), "g", "w", "k", budget).collect()}
    assert got2 == expected


def test_per_group_cap_exact_quota_and_determinism(spark, sf_dir):
    """Every over-quota group yields exactly k rows, under-quota groups
    pass through whole, the kept set equals the naive single-window
    form, and repartitioning changes nothing."""
    from pyspark.sql import Window

    from simple_anonymizer_spark.operators import sampling
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    d = read_sf_table(spark, sf_dir, "documents").select("doc_id", "source")
    k = 7
    out = sampling.per_group_cap(d, "source", k, "doc_id")
    got = {(r.doc_id, r.source) for r in out.collect()}

    sizes = {r.source: r.n for r in
             d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r.source: r.n for r in
            out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in sizes.items():
        assert kept.get(s, 0) == min(n, k), s

    # equivalence with the semantic single-window form
    naive = d.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                sampling.sample_bucket("doc_id", "_cap"), F.col("doc_id")
            )
        ),
    ).where(F.col("__rn") <= k)
    assert got == {(r.doc_id, r.source) for r in naive.collect()}

    reparts = sampling.per_group_cap(
        d.repartition(13), "source", k, "doc_id"
    )
    assert got == {(r.doc_id, r.source) for r in reparts.collect()}

    # a different salt draws a different (same-sized) quota
    other = sampling.per_group_cap(d, "source", k, "doc_id", salt="_cap2")
    oset = {(r.doc_id, r.source) for r in other.collect()}
    assert len(oset) == len(got) and oset != got


def test_per_group_cap_rejects_bad_k(spark):
    import pytest as _pytest

    from simple_anonymizer_spark.operators import sampling

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        sampling.per_group_cap(df, "source", 0, "doc_id")


def test_grouped_split_no_group_straddles(spark, sf_dir):
    """Every group lands wholly in one split (the leakage guard), the
    assignment is partitioning-invariant, and all rows keep a split."""
    from simple_anonymizer_spark.operators import sampling
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    d = read_sf_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = sampling.grouped_split(d, "source")
    rows = out.collect()
    assert len(rows) == d.count()
    per_group = {}
    for r in rows:
        per_group.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in per_group.values())
    assert set().union(*per_group.values()) <= {"train", "val", "test"}
    again = {(r.doc_id, r.split)
             for r in sampling.grouped_split(d.repartition(9), "source").collect()}
    assert again == {(r.doc_id, r.split) for r in rows}
