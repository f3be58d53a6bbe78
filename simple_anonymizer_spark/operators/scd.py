"""Slowly-changing-dimension (SCD type 2) interval building from an event
log: collapse a (key, ts, state) change stream into validity intervals
``(key, state, valid_from_us, valid_to_us)`` with NULL valid_to for the
current state.

This is the standard warehouse pattern for turning CDC/event streams into
point-in-time-joinable dimensions — the natural companion to the as-of
join (operators/asof.py) which consumes exactly this interval shape.

Determinism: pure window functions over exact epoch-microsecond integers;
ties on (key, ts) are broken by the state value so repeated runs and both
engines pick identical interval boundaries.

Scale (100 TB): one shuffle on the key + one window sort, then a filter
keeping only change rows — output is bounded by the number of state
CHANGES, not events. No driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    events: DataFrame,
    key_col: str,
    ts_us: Column,
    state_col: str,
) -> DataFrame:
    """Build SCD2 validity intervals from a change stream.

    Consecutive events with the same state are collapsed into one interval
    (run-length semantics); an interval closes at the ``valid_from`` of the
    next DIFFERENT state. The latest state per key stays open
    (``valid_to_us`` NULL).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col("__us"), F.col(state_col)
    )
    ev = events.select(
        F.col(key_col), ts_us.alias("__us"), F.col(state_col)
    )
    # Keep only rows where the state differs from the previous row —
    # run starts. lag is NULL for the first row, which always starts a run.
    runs = ev.withColumn("__prev", F.lag(state_col, 1).over(w)).where(
        F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col))
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("__us"), F.col(state_col))
    return runs.select(
        key_col,
        F.col(state_col).alias("state"),
        F.col("__us").alias("valid_from_us"),
        F.lead("__us", 1).over(w2).alias("valid_to_us"),
    )
