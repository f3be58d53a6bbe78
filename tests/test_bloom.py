"""Distributed Bloom filter (operators/bloom.py): no false negatives ever,
bounded word-count state, deterministic false positives, and the
contamination report may only OVER-count relative to the exact semi-join
screen."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from simple_anonymizer_spark.operators import bloom
from simple_anonymizer_spark.sources.parquet import read_sf_table

BITS, K = 1 << 16, 4


def test_inserted_keys_always_might_contain(spark):
    keys = spark.createDataFrame([Row(k=f"key-{n}") for n in range(500)])
    filt = bloom.bloom_build(keys, "k", BITS, K)
    assert filt.count() <= BITS // 64
    got = bloom.bloom_might_contain(filt, keys, "k", BITS, K)
    assert got.where(~F.col("might_contain")).count() == 0  # no false negatives


def test_duplicate_probe_rows_answered_independently(spark):
    """k duplicate probe rows must each come back (no groupBy collapse) and
    each answer True for an inserted key — the historical bug summed hits
    across the duplicates, turning k*num_hashes hits into a false negative."""
    train = spark.createDataFrame([Row(k="present")])
    filt = bloom.bloom_build(train, "k", BITS, K)
    probes = spark.createDataFrame(
        [Row(k="present")] * 3 + [Row(k="absent-xyzzy")] * 2
    )
    got = bloom.bloom_might_contain(filt, probes, "k", BITS, K).collect()
    assert len(got) == 5  # duplicates preserved, one answer per input row
    answers = sorted((r.k, r.might_contain) for r in got)
    assert [a for a in answers if a[0] == "present"] == [("present", True)] * 3


def test_false_positive_rate_bounded(spark):
    train = spark.createDataFrame([Row(k=f"in-{n}") for n in range(500)])
    probe = spark.createDataFrame([Row(k=f"out-{n}") for n in range(2000)])
    filt = bloom.bloom_build(train, "k", BITS, K)
    fp = (
        bloom.bloom_might_contain(filt, probe, "k", BITS, K)
        .where(F.col("might_contain")).count()
    )
    # n=500, m=65536, k=4 -> theoretical fp ~ (1-e^{-4*500/65536})^4 ~ 8e-7;
    # allow enormous slack — anything beyond 1% means a broken kernel.
    assert fp <= 20


def test_null_empty_dropped_and_validation(spark):
    df = spark.createDataFrame([Row(k="a"), Row(k=""), Row(k=None)],
                               "k string")
    filt = bloom.bloom_build(df, "k", 64, 2)
    assert filt.agg(F.sum(F.bit_count("word"))).first()[0] <= 2
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.bloom_build(df, "k", num_bits=100)
    with pytest.raises(ValueError, match=">= 1"):
        bloom.bloom_build(df, "k", num_hashes=0)


def test_bloom_report_only_overcounts_exact(spark, sf_dir):
    from simple_anonymizer_spark.operators.contamination import (
        contamination_report,
    )
    from simple_anonymizer_spark.operators.sampling import train_val_test_split

    docs = train_val_test_split(
        read_sf_table(spark, sf_dir, "documents"), "doc_id"
    )
    train = docs.where(F.col("split") == "train")
    test = docs.where(F.col("split") == "test")
    exact = {
        r.doc_id: r.n_contaminated
        for r in contamination_report(train, test, n=5).collect()
    }
    approx = {
        r.doc_id: r.n_contaminated
        for r in bloom.bloom_contamination_report(
            train, test, n=5, num_bits=1 << 16, num_hashes=4
        ).collect()
    }
    assert set(exact) == set(approx)
    for doc_id, n_exact in exact.items():
        assert approx[doc_id] >= n_exact, f"false negative on doc {doc_id}"
