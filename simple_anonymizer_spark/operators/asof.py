"""As-of join — match each left row to the most recent earlier right row.

Spark has no native as-of join (pandas-on-Spark's merge_asof exists but
shuffles through Python). This implementation is the scalable sort-based
form: union both sides tagged, one window pass per key ordered by
``(ts, side)`` carrying the last-seen right row forward. Exactly one
shuffle (the window partitioning), no range explosion, no Python.

Strictness: right rows sort AFTER left rows at equal timestamps, so a
left row matches only right rows with ``r.ts < l.ts`` (strict) — the
variant DuckDB expresses as ``ASOF JOIN ... ON l.ts > r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_cols`` (suffixed) from
    the latest right row with the same keys and strictly earlier timestamp
    (nulls when none exists).

    All ``right_cols`` values come from the SAME right row: they travel as
    one struct through a single ``last(ignorenulls=True)`` window pass, so a
    NULL in one right column never mixes values from different right rows
    (the matched row's own NULLs are preserved).

    Right-side timestamp ties resolve deterministically to the row with the
    greatest ``right_cols`` struct (field-wise comparison); callers who need
    different tie semantics should pre-aggregate the right side to unique
    ``(key, ts)`` rows. Note DuckDB's ASOF JOIN picks an *arbitrary* row on
    ties — pre-aggregate both sides when comparing against it.
    """
    tagged_right = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__rrow"),
    )
    rrow_type = dict(tagged_right.dtypes)["__rrow"]
    tagged_left = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(0))
        .withColumn("__rrow", F.lit(None).cast(rrow_type))
    )
    for c in left.columns:
        if c not in key_cols:
            tagged_right = tagged_right.withColumn(c, F.lit(None).cast(
                dict(left.dtypes)[c]))
    unioned = tagged_left.unionByName(tagged_right)

    # Left rows (side 0) sort before right rows (side 1) at equal ts, so a
    # left row's frame contains exactly the strictly-earlier right rows.
    # Among right rows with equal ts, the greatest __rrow struct sorts last
    # and wins (left rows have NULL __rrow; nulls_first keeps them ahead).
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col("__rrow").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = unioned.withColumn(
        "__match", F.last(F.col("__rrow"), ignorenulls=True).over(w)
    )
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__match.{c}"))
    return (
        out.where(F.col("__side") == 0)
        .drop("__ts", "__side", "__rrow", "__match")
    )
