"""Z-order layout (operators/layout.py): the Morton re-layout must
actually cluster — per-partition min/max ranges on EVERY z-ordered column
shrink far below the full domain (that range width IS the file-skipping
win) — and the curve value must be deterministic and validated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators import layout
from simple_anonymizer_spark.sources.parquet import read_sf_table


def _avg_partition_range_fraction(df, col):
    """Mean (per-partition max-min) / (global max-min) for ``col`` —
    1.0 means every partition spans the whole domain (no pruning), small
    means stats-based skipping works."""
    g = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    span = float(g.hi - g.lo)
    parts = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg((F.max(col) - F.min(col)).alias("w"))
        .agg(F.avg(F.col("w").cast("double")).alias("aw"))
        .first()
    )
    return float(parts.aw) / span


def test_zorder_clusters_both_dimensions(spark, sf_dir):
    orders = read_sf_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    laid = layout.zorder_by(orders, ["o_custkey", "o_totalprice"],
                            partitions=16).cache()
    try:
        assert laid.count() == orders.count()  # pure re-layout
        f_cust = _avg_partition_range_fraction(laid, "o_custkey")
        f_price = _avg_partition_range_fraction(laid, "o_totalprice")
        # a single-column sort gives ~1/16 on the sorted column and ~1.0 on
        # the other; the curve must prune BOTH well below the full domain.
        assert f_cust < 0.5, f_cust
        assert f_price < 0.5, f_price
        assert f_cust + f_price < 0.8, (f_cust, f_price)
    finally:
        laid.unpersist()


def test_zorder_plan_is_range_partitioned(spark, sf_dir):
    orders = read_sf_table(spark, sf_dir, "orders")
    plan = (
        layout.zorder_by(orders, ["o_custkey", "o_totalprice"], partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "BatchEvalPython" not in plan


def test_zorder_value_interleaves(spark):
    df = spark.range(1).select(
        layout.zorder_value([F.lit(0b101).cast("long"),
                             F.lit(0b011).cast("long")], bits=3).alias("z")
    )
    # dims a=101b, b=011b -> bits (a0,b0),(a1,b1),(a2,b2) = 1,1,0,1,1,0
    # -> z = 0b011011 = 27
    assert df.first().z == 27


def test_zorder_constant_column_collapses(spark, sf_dir):
    orders = read_sf_table(spark, sf_dir, "orders").withColumn(
        "const", F.lit(7)
    )
    out = layout.zorder_by(orders, ["const", "o_custkey"], partitions=4)
    assert out.count() == orders.count()


def test_zorder_validation(spark, sf_dir):
    orders = read_sf_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="signed long"):
        layout.zorder_by(orders, ["o_custkey", "o_totalprice"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        layout.zorder_value([], bits=4)


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------


def test_compaction_bins_are_contiguous_and_near_target(spark):
    from simple_anonymizer_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [(f"f{i:03d}", 400) for i in range(10)], "file string, size_bytes long"
    )
    out = sorted(compaction_plan(files, target_bytes=1000).collect(),
                 key=lambda r: r.file)
    # 400-byte files against a 1000-byte target: offsets 0,400,800,1200...
    assert [r.bin for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert out[3].bin_offset == 200  # straddler carries its in-bin offset
    # adjacent-merge: file order and bin order agree (monotone bins)
    bins = [r.bin for r in out]
    assert bins == sorted(bins)


def test_compaction_partition_invariance(spark):
    from simple_anonymizer_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [(f"p{i:04d}", (i * 37) % 900 + 100) for i in range(200)],
        "file string, size_bytes long",
    )
    owners = ([], [])
    a = sorted(compaction_plan(files, 4096, partitions=2,
                               cache_owner=owners[0]).collect())
    b = sorted(compaction_plan(files, 4096, partitions=64,
                               cache_owner=owners[1]).collect())
    assert a == b
    for o in owners:
        o[0].unpersist()


def test_compaction_empty_inventory_and_single_oversize_file(spark):
    from simple_anonymizer_spark.operators.layout import compaction_plan

    empty = spark.createDataFrame([], "file string, size_bytes long")
    assert compaction_plan(empty, 1000).count() == 0
    # a single file larger than the target still lands in bin 0 whole —
    # the planner never splits a file
    one = spark.createDataFrame([("big", 5000)], "file string, size_bytes long")
    r = compaction_plan(one, 1000).collect()[0]
    assert (r.bin, r.bin_offset) == (0, 0)
