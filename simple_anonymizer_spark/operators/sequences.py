"""Order-sensitive sequence statistics over event streams.

First-order Markov transition estimation: the empirical conditional
distribution P(next event type | previous event type) over per-user
event sequences. The sequence order is (timestamp, event_id) — the
engine-wide unique-key tie-break rule, so the lag assignment is
deterministic under any partitioning.

Scale (100 TB): the lag window partitions by user — millions of small
partitions, no global sort. Both aggregates are map-side combinable over
a key space bounded by |event types|^2. The conditional probability is
one integer-over-integer double division (cross-engine exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts_us", "event_id"),
) -> DataFrame:
    """Transition counts and conditional probabilities between
    consecutive event types per user.

    Output: ``prev_type, next_type, n_trans, prev_total, p_cond``.
    """
    w = Window.partitionBy(user_col).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    seq = events.select(
        F.col(user_col),
        F.col(type_col).alias("next_type"),
        F.lag(F.col(type_col)).over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    totals = trans.groupBy("prev_type").agg(
        F.sum("n_trans").cast("long").alias("prev_total")
    )
    return trans.join(totals, "prev_type").select(
        "prev_type",
        "next_type",
        "n_trans",
        "prev_total",
        (F.col("n_trans").cast("double") / F.col("prev_total").cast("double"))
        .alias("p_cond"),
    )


def top_paths(
    events: DataFrame,
    n: int = 3,
    k: int = 25,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts_us", "event_id"),
) -> DataFrame:
    """Most frequent n-step event paths across all users.

    A path is ``n`` consecutive event types within one user's
    (timestamp, event_id)-ordered stream, rendered ``a>b>c``. Output:
    ``path, n_occurrences`` — global top-``k`` under the total order
    (count DESC, path ASC), planned as TakeOrderedAndProject.

    Scale: same shape as markov_transitions — per-user lag windows (no
    global sort), then a map-side-combinable count over a key space
    bounded by |event types|^n, then a driver-bounded top-k.
    """
    w = Window.partitionBy(user_col).orderBy(
        *[F.asc(c) for c in order_cols]
    )
    lags = [F.lag(F.col(type_col), i).over(w).alias(f"__t{i}")
            for i in range(n - 1, 0, -1)]
    seq = events.select(*lags, F.col(type_col).alias("__t0"))
    steps = [F.col(f"__t{i}") for i in range(n - 1, -1, -1)]
    path = F.concat_ws(">", *steps)
    return (
        seq.where(F.col(f"__t{n-1}").isNotNull())
        .select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(k)
    )
