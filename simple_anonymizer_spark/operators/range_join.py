"""Binned range join — point-in-interval joins that stay equi-joins.

Spark executes a bare non-equi predicate (``l.ts BETWEEN r.lo AND r.hi``)
as BroadcastNestedLoopJoin or a cartesian product: O(|L|·|R|) comparisons,
a non-starter at scale. The standard fix (Databricks' range-join binning,
Flink's interval-join bucketing) rewrites it as an equi-join on coarse
time bins plus an exact residual filter:

* every point row computes one bin id ``floor(ts / bin)``;
* every interval row explodes to the bins its ``[lo, hi]`` span covers
  (``sequence(floor(lo/bin), floor(hi/bin))``);
* the join is a plain shuffle/broadcast HASH join on the bin id — each
  point meets only intervals overlapping its bin, and the exact BETWEEN
  filter removes bin-boundary false positives.

A (point, interval) pair can match in at most one bin (the point's), so
no post-join dedup is needed. Work is O(|L| + |R|·span/bin + matches);
``bin_width`` trades explode factor against bin selectivity — set it near
the typical interval length so intervals explode to ~2 bins.

Bin arithmetic is exact integer division on epoch micros (no double
rounding at bin edges), and the residual comparison happens on the same
micros, so results are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICROS_PER_DAY = 86_400 * 1_000_000


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    bin_width_days: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row whose ``[lo_ts, hi_ts]``
    (inclusive) contains ``point_ts``. Timestamp columns must be Spark
    timestamps. Output: all columns of both inputs (names must not clash,
    checked). ``how`` supports 'inner' and 'left_semi'."""
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"column name clash between sides: {sorted(clash)}")
    if how not in ("inner", "left_semi"):
        raise ValueError(f"binned_range_join supports inner/left_semi, not {how!r}")
    bin_us = bin_width_days * MICROS_PER_DAY

    def to_us(col: str):
        # NTZ-tolerant: cast pins NTZ to the session zone; the mapping is
        # monotonic and applied to every side, so bins and the residual
        # comparison are unaffected by the zone choice.
        return F.unix_micros(F.col(col).cast("timestamp"))

    p = points.withColumn("__p_us", to_us(point_ts))
    p = p.withColumn("__bin", F.expr(f"__p_us div {bin_us}"))

    iv = (
        intervals.withColumn("__lo_us", to_us(lo_ts))
        .withColumn("__hi_us", to_us(hi_ts))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.expr(f"__lo_us div {bin_us}"), F.expr(f"__hi_us div {bin_us}")
                )
            ),
        )
    )
    joined = p.join(iv, "__bin", how="inner").where(
        F.col("__p_us").between(F.col("__lo_us"), F.col("__hi_us"))
    )
    if how == "left_semi":
        keep = points.columns
        return joined.select(*keep).distinct()
    return joined.drop("__bin", "__p_us", "__lo_us", "__hi_us")
