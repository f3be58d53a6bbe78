"""Event-sequence (funnel) analysis over the events stream.

Answers "which entities performed step A and then step B within a horizon"
— the conversion/abandonment question every event pipeline asks, and a
building block for curriculum-style data selection (keep sessions that
reach a target behavior). No reference counterpart (SURVEY §2.12 explicit
absences); built entirely from groupBy + join so it scales as two shuffles
on the entity key.

Scale notes (100 TB): step extraction is a filtered partial aggregation
(map-side min per entity), so each step's intermediate is one row per
entity — tiny relative to the event log. The step-B-after-step-A
constraint is an equi-join on the entity key between those aggregates and
the filtered step-B events; Catalyst pushes the event_type filters into
the parquet scan. All timestamps are exact epoch-microsecond integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_two_step(
    events: DataFrame,
    entity_col: str,
    type_col: str,
    ts_us: Column,
    first_type: str,
    then_type: str,
    horizon_us: int | None = None,
) -> DataFrame:
    """Per-entity two-step funnel: first ``first_type`` event, then the
    earliest ``then_type`` event at-or-after it (optionally within
    ``horizon_us`` microseconds).

    Returns one row per entity that performed step A:
    ``(entity, step_a_us, step_b_us nullable, converted, lag_us nullable)``.
    Ties at the same microsecond count as converted (>= comparison) —
    pinned by tests.
    """
    ev = events.select(
        F.col(entity_col).alias("__e"),
        F.col(type_col).alias("__t"),
        ts_us.alias("__us"),
    )
    step_a = ev.where(F.col("__t") == first_type).groupBy("__e").agg(
        F.min("__us").alias("step_a_us")
    )
    step_b_events = ev.where(F.col("__t") == then_type)
    after = step_b_events.join(step_a, "__e").where(
        F.col("__us") >= F.col("step_a_us")
    )
    if horizon_us is not None:
        after = after.where(F.col("__us") <= F.col("step_a_us") + horizon_us)
    step_b = after.groupBy("__e", "step_a_us").agg(
        F.min("__us").alias("step_b_us")
    )
    return (
        step_a.join(step_b, ["__e", "step_a_us"], "left")
        .select(
            F.col("__e").alias(entity_col),
            "step_a_us",
            "step_b_us",
            F.col("step_b_us").isNotNull().alias("converted"),
            (F.col("step_b_us") - F.col("step_a_us")).alias("lag_us"),
        )
    )


def funnel_steps(
    events: DataFrame,
    entity_col: str,
    type_col: str,
    ts_us: Column,
    steps: list[str],
) -> DataFrame:
    """N-step funnel: for each entity that performed ``steps[0]``, the
    earliest occurrence of each subsequent step at-or-after the previous
    step's chosen timestamp (ties at the same microsecond count, matching
    funnel_two_step).

    Output: one row per step-1 entity with ``step_{k}_us`` columns (NULL
    once the chain breaks) and ``n_steps`` completed. Each step adds one
    filtered partial aggregation + one entity-key equi-join — cost is
    linear in the number of steps, and every intermediate is one row per
    entity still in the funnel.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(entity_col).alias("__e"),
        F.col(type_col).alias("__t"),
        ts_us.alias("__us"),
    )
    spine = (
        ev.where(F.col("__t") == steps[0])
        .groupBy("__e")
        .agg(F.min("__us").alias("step_1_us"))
    )
    for k, step in enumerate(steps[1:], start=2):
        prev = f"step_{k - 1}_us"
        cur = f"step_{k}_us"
        nxt = (
            ev.where(F.col("__t") == step)
            .join(spine.select("__e", prev), "__e")
            .where(F.col("__us") >= F.col(prev))
            .groupBy("__e")
            .agg(F.min("__us").alias(cur))
        )
        spine = spine.join(nxt, "__e", "left")
    step_cols = [f"step_{k}_us" for k in range(1, len(steps) + 1)]
    n_steps = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in step_cols),
        start=F.lit(0),
    )
    return spine.select(
        F.col("__e").alias(entity_col),
        *step_cols,
        n_steps.cast("long").alias("n_steps"),
    )


def linear_attribution(
    events: DataFrame,
    entity_col: str,
    type_col: str,
    ts_us: Column,
    id_col: str,
    touch_types: list[str],
    convert_type: str,
    window_us: int,
) -> DataFrame:
    """Linear multi-touch attribution: every conversion event splits one
    unit of credit equally across the entity's touch events in the
    preceding ``window_us`` microseconds (touch strictly before the
    conversion; conversions with zero in-window touches earn no row).

    Shape: one equi-join on the entity key with a bounded time-range
    residual (the interval-join pattern — never a cross join), then a
    count window per conversion id. The float hazard of summing
    ``1/k`` credits in shuffle order is avoided by aggregating the EXACT
    integer pair counts per ``(touch_type, k)`` first: the credit column
    is one division of those integers, so any downstream rollup is a
    deterministic sum over this small grid (|touch_types| x max k rows),
    not a row-order-dependent float reduction — the same
    grid-not-stream trick as the count-min sketch.

    Output: ``touch_type, touches_per_conversion long, n_pairs long,
    credit double`` where ``credit = n_pairs / touches_per_conversion``
    is the total credit the grid cell contributes.
    """
    ent, typ = F.col(entity_col), F.col(type_col)
    conv = events.where(typ == convert_type).select(
        ent.alias("__ent"),
        ts_us.alias("__conv_us"),
        F.col(id_col).alias("__conv_id"),
    )
    touch = events.where(typ.isin(touch_types)).select(
        ent.alias("__ent"),
        ts_us.alias("__touch_us"),
        typ.alias("touch_type"),
    )
    pairs = conv.join(touch, "__ent").where(
        (F.col("__touch_us") < F.col("__conv_us"))
        & (F.col("__touch_us") >= F.col("__conv_us") - F.lit(window_us))
    )
    k = F.count(F.lit(1)).over(
        Window.partitionBy("__ent", "__conv_id")
    ).cast("long")
    credited = pairs.select("touch_type", k.alias("touches_per_conversion"))
    return (
        credited.groupBy("touch_type", "touches_per_conversion")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            "touch_type", "touches_per_conversion", "n_pairs",
            (F.col("n_pairs").cast("double")
             / F.col("touches_per_conversion").cast("double")).alias("credit"),
        )
    )
