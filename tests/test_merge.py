"""Parquet MERGE sink tests — OnConflict semantics over a lake table
(``src/OnConflict.scala:7-44`` parity on the parquet path)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.plans.on_conflict import OnConflict
from simple_anonymizer_spark.sources.merge import (
    dedupe_source,
    merge_dataframes,
    merge_parquet,
)


def df_of(spark, rows):
    return spark.createDataFrame(rows, "id int, name string, score int")


@pytest.fixture()
def target(spark):
    return df_of(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])


def as_set(df):
    return {tuple(r) for r in df.collect()}


def test_do_update_matches_and_inserts(spark, target):
    source = df_of(spark, [(2, "B", 200), (4, "d", 40)])
    out = merge_dataframes(target, source, ["id"], OnConflict.do_update())
    assert as_set(out) == {(1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40)}


def test_do_update_takes_source_nulls(spark, target):
    """Matched rows take source values INCLUDING NULLs — MERGE semantics,
    not coalesce."""
    source = df_of(spark, [(2, None, 200)])
    out = merge_dataframes(target, source, ["id"], OnConflict.do_update())
    assert (None, 200) in {(r.name, r.score) for r in out.collect()}


def test_do_update_explicit_columns(spark, target):
    source = df_of(spark, [(2, "B", 200)])
    oc = OnConflict.do_update(update_columns=("score",))
    out = merge_dataframes(target, source, ["id"], oc)
    assert (2, "b", 200) in as_set(out)  # name untouched, score updated


def test_do_nothing_keeps_existing(spark, target):
    source = df_of(spark, [(2, "CLOBBER", 999), (4, "d", 40)])
    out = merge_dataframes(target, source, ["id"], OnConflict.do_nothing())
    assert as_set(out) == {(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)}


def test_none_policy_appends_like_plain_insert(spark, target):
    source = df_of(spark, [(2, "dup", 0)])
    out = merge_dataframes(target, source, ["id"], None)
    assert out.count() == 4  # duplicate preserved, as the INSERT path would


def test_source_dedupe_is_deterministic(spark, target):
    source = df_of(spark, [(4, "x", 1), (4, "y", 2), (4, "y", 0)])
    deduped = dedupe_source(source, ["id"])
    # last under total desc order of (name, score): ("y", 2)
    assert as_set(deduped) == {(4, "y", 2)}
    out = merge_dataframes(target, source, ["id"], OnConflict.do_update())
    assert out.count() == 4


def test_schema_mismatch_rejected(spark, target):
    bad = spark.createDataFrame([(1, "a")], "id int, name string")
    with pytest.raises(ValueError, match="source columns"):
        merge_dataframes(target, bad, ["id"], OnConflict.do_update())


def test_merge_parquet_roundtrip_and_atomic_swap(spark, target, tmp_path):
    path = str(tmp_path / "tbl")
    n = merge_parquet(spark, target, path, ["id"], OnConflict.do_update())
    assert n == 3

    source = df_of(spark, [(3, "C", 300), (5, "e", 50)])
    n = merge_parquet(spark, source, path, ["id"], OnConflict.do_update())
    assert n == 4
    back = spark.read.parquet(path)
    assert as_set(back) == {(1, "a", 10), (2, "b", 20), (3, "C", 300), (5, "e", 50)}

    # idempotent retry (same merge again) — unchanged
    assert merge_parquet(spark, source, path, ["id"], OnConflict.do_update()) == 4

    # no staging/old debris after the swap
    debris = [p for p in os.listdir(tmp_path) if "__staging__" in p or "__old__" in p]
    assert debris == []


def test_merge_parquet_do_nothing(spark, target, tmp_path):
    path = str(tmp_path / "tbl2")
    merge_parquet(spark, target, path, ["id"], OnConflict.do_nothing())
    merge_parquet(spark, df_of(spark, [(1, "Z", 0), (9, "i", 90)]), path,
                  ["id"], OnConflict.do_nothing())
    back = spark.read.parquet(path)
    assert as_set(back) == {(1, "a", 10), (2, "b", 20), (3, "c", 30), (9, "i", 90)}


def test_merge_plan_has_no_python_and_single_join(spark, target):
    """The merge compiles to pure JVM joins — no Python, no cartesian."""
    source = df_of(spark, [(2, "B", 200)])
    out = merge_dataframes(target, source, ["id"], OnConflict.do_update())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_merge_parquet_partitioned_layout(spark, target, tmp_path):
    """partition_by lays the table out by the named column and survives
    merges (the only-touched-partitions-rewrite path at scale)."""
    import os

    path = str(tmp_path / "ptbl")
    merge_parquet(spark, target, path, ["id"], OnConflict.do_update(),
                  partition_by=["name"])
    assert sorted(p for p in os.listdir(path) if p.startswith("name=")) == [
        "name=a", "name=b", "name=c"]
    merge_parquet(spark, df_of(spark, [(2, "b", 999), (4, "d", 40)]), path,
                  ["id"], OnConflict.do_update(), partition_by=["name"])
    back = spark.read.parquet(path)
    assert as_set(back.select("id", "score")) == {(1, 10), (2, 999), (3, 30), (4, 40)}
    assert "name=d" in os.listdir(path)
