"""Cohort retention analysis over an event stream.

The classic product-analytics matrix: bucket each entity by the period of
its first event (its cohort), then count how many entities from each cohort
were active k periods later. Also the shape of "how much of each crawl
snapshot survives into later training mixes" in data-pipeline terms.

Determinism: period indices are exact integer division of epoch
microseconds (``us div period_us``); every output is an integer or an
exact-int division double.

Scale (100 TB): two partial aggregations (first-event per entity; distinct
entity-periods) joined on the entity key, then a count keyed by
(cohort_period, periods_since) — at most cohorts x horizon rows out. The
entity-keyed join is the only shuffle pair and both sides are already
entity-unique aggregates, far smaller than the raw event log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    entity_col: str,
    ts_us: Column,
    period_us: int,
    max_periods: int | None = None,
) -> DataFrame:
    """Retention counts: ``(cohort_period_start_us, periods_since,
    n_active)`` plus the cohort size for share computation.

    ``periods_since`` 0 is the cohort period itself (n_active == cohort
    size by construction). ``retained_share`` is n_active / cohort_size —
    one exact-int double division.
    """
    # Exact integer period index: (us - us % p) / p — the numerator is a
    # multiple of p, so the double division is exact; float floor(us/p)
    # could mis-bin a timestamp sitting exactly on a period boundary.
    us = ts_us.cast("long")
    ev = events.select(
        F.col(entity_col).alias("__e"),
        ((us - us % period_us) / period_us).cast("long").alias("__p"),
    )
    first = ev.groupBy("__e").agg(F.min("__p").alias("cohort_p"))
    active = ev.distinct()  # (entity, period) activity grid
    joined = active.join(first, "__e").select(
        "cohort_p", (F.col("__p") - F.col("cohort_p")).alias("periods_since")
    )
    if max_periods is not None:
        joined = joined.where(F.col("periods_since") <= max_periods)
    cohort_sizes = first.groupBy("cohort_p").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    grid = joined.groupBy("cohort_p", "periods_since").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    return (
        grid.join(cohort_sizes, "cohort_p")
        .select(
            (F.col("cohort_p") * period_us).alias("cohort_start_us"),
            "periods_since",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double")
             / F.col("cohort_size").cast("double")).alias("retained_share"),
        )
    )
