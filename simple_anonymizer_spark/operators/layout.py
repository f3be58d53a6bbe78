"""Z-order (Morton-curve) data layout — multi-column clustering so file
and partition min/max statistics prune on EVERY z-ordered column at once,
not just the leading sort key.

``zorder_by`` is the engine's analog of Delta's ``OPTIMIZE ZORDER BY``:
each dimension rank-scales into ``bits``-bit integer space, the bits
interleave into one Morton value, and the table range-repartitions +
sorts on that value. A linear sort on (a, b) gives perfect pruning on
``a`` and none on ``b``; the Morton curve gives ~``2^(-bits_used/ncols)``
range width per file on ALL dimensions — the difference between scanning
one file and scanning the table for a predicate on the second column.

Everything is integer bit arithmetic after one bounded min/max
aggregation (a single row collected per call), so the curve value is
deterministic and the DuckDB oracle reproduces it bit-for-bit: scaling
uses explicit ``floor`` (Spark casts double->long by truncation, DuckDB
by rounding — floor first makes both exact on an integral value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _scale_expr(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits - 1] by linear min/max scaling.
    Constant columns (hi == lo) collapse to 0 — they carry no pruning
    information anyway."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    top = float((1 << bits) - 1)
    return F.floor(
        (c.cast("double") - F.lit(float(lo))) * F.lit(top) / F.lit(span)
    ).cast("long")


def zorder_value(
    scaled: list[Column], bits: int = 16
) -> Column:
    """Interleave pre-scaled ``bits``-bit integers into the Morton value:
    bit ``i`` of dimension ``j`` lands at position ``i * ncols + j``. Pure
    codegen integer expression — ``bits * ncols`` shift/mask/or terms."""
    n = len(scaled)
    if n < 1:
        raise ValueError("zorder_value needs at least one column")
    terms = []
    for j, col in enumerate(scaled):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` along the Morton curve of ``cols``: one bounded
    min/max aggregation (single collected row), then
    ``repartitionByRange + sortWithinPartitions`` on the curve value so
    both partition boundaries AND within-file row order cluster every
    dimension. Write the result with any sink; parquet row-group stats
    then prune multi-column predicates. The curve column is dropped."""
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi{i}") for i, c in enumerate(cols)],
    ).first()
    scaled = [
        _scale_expr(F.col(c), bounds[f"__lo{i}"], bounds[f"__hi{i}"], bits)
        for i, c in enumerate(cols)
    ]
    with_z = df.withColumn("__z", zorder_value(scaled, bits))
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    return (
        with_z.repartitionByRange(partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "file",
    size_col: str = "size_bytes",
    partitions: int | None = None,
    cache_owner: list | None = None,
) -> DataFrame:
    """Small-file compaction planner: assign every file in a table's
    inventory to an output bin of ~``target_bytes`` — the distributed
    form of the bin-packing step behind ``OPTIMIZE``-style compaction
    (the deltalog backend plans its rewrites driver-side from a bounded
    log; THIS operator is for the 100M-file inventories where the
    inventory itself is a dataset). The small-files problem is the
    classic lakehouse tax: a 100 TB table ingested in 1 MB files carries
    10^8 scan tasks and a same-sized listing cost until compacted.

    Files pack in ``file_col`` order — adjacent-merge, preserving
    whatever clustering (ingest time, Z-order, hive partition path) the
    layout already has, unlike size-sorted first-fit which destroys
    locality. Bin assignment is offset-based, exactly
    ``textprep.pack_sequences``' formulation: each file lands in
    ``exclusive_prefix_size div target_bytes``, so a file may straddle a
    boundary (its bin runs slightly over target) — the deterministic,
    shuffle-friendly approximation of greedy packing, whose
    reset-at-overflow counter is inherently sequential. Every bin except
    the last holds at least ``target_bytes`` minus one file.

    The running offset is the distributed two-pass prefix sum
    (range-repartition + per-partition cumsum + one bounded
    one-row-per-partition collect broadcast back) — never a global
    single-reducer window. Same ``cache_owner`` contract as
    ``pack_sequences``: the pinned (file, size, pid) projection must
    outlive the returned plan.

    Output: ``<file_col>, <size_col>, bin (long), bin_offset (long)``.
    """
    from pyspark.sql import Window

    base = files.select(F.col(file_col), F.col(size_col).cast("long"))
    if partitions is None:
        partitions = base.sparkSession.sparkContext.defaultParallelism
    ranged = (
        base.repartitionByRange(partitions, F.col(file_col))
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "__local_cum", F.sum(size_col).over(w) - F.col(size_col)
    )
    totals = sorted(
        (r["__pid"], r["total"])
        for r in ranged.groupBy("__pid")
        .agg(F.sum(size_col).alias("total"))
        .collect()
    )
    prefix_rows = []
    running = 0
    for pid, total in totals:
        prefix_rows.append((pid, running))
        running += total
    if cache_owner is not None:
        cache_owner.append(ranged)
    spark = base.sparkSession
    if prefix_rows:
        prefix_df = spark.createDataFrame(prefix_rows, "__pid int, __base long")
        cum = local.join(F.broadcast(prefix_df), "__pid", "left").select(
            file_col,
            size_col,
            (F.col("__local_cum") + F.coalesce(F.col("__base"), F.lit(0)))
            .alias("__offset"),
        )
    else:
        cum = local.select(
            file_col, size_col, F.col("__local_cum").alias("__offset")
        )
    return cum.select(
        file_col,
        size_col,
        ((F.col("__offset") - F.col("__offset") % target_bytes)
         / target_bytes).cast("long").alias("bin"),
        (F.col("__offset") % target_bytes).alias("bin_offset"),
    )
