"""Time-series regularization: calendar gap-fill and linear
interpolation over per-key daily aggregates.

Irregular event streams become fixed-cadence training series in three
steps, each a native relational stage:

1. bucket to (key, day) aggregates — partial/final hash aggregate,
   map-side combined, DECIMAL-exact value sums;
2. expand each key's [min_day, max_day] span with ``sequence()`` +
   ``explode`` — generated rows never shuffle (the span row carries its
   key), and a left join marks which calendar days were observed;
3. interpolate gaps with ignore-nulls window functions — one sort per
   key partition, no driver participation.

Scale (100 TB): everything partitions by the series key; the calendar
explode multiplies rows only by each key's own span, and the four
window expressions share a single (key, day) sort. Floats follow the
engine rule — DECIMAL accumulation for sums, then IEEE-deterministic
arithmetic on already-identical doubles for the interpolation weights —
so a DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def resample_interpolate_daily(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Daily resample of an event stream with linear gap interpolation.

    Input: ``key_col``, ``ts_col`` (TIMESTAMP), ``value_col`` (double).
    Output one row per key per calendar day in the key's observed span:
    ``<key>, day (epoch days, int64), n_events (int64, 0 on gap days),
    avg_value (double — the day's mean, or the linear interpolation
    between the nearest observed neighbors), interpolated (int64 0/1)``.

    Gap days sit strictly between observed endpoints (the span is
    [min_day, max_day] of the key's own observations), so the
    interpolation neighbors always exist.
    """
    key = F.col(key_col)
    day = F.expr(f"unix_micros({ts_col}) div {US_PER_DAY}").alias("day")
    daily = (
        df.groupBy(key.alias("__k"), day)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum_dec"),
        )
        .select(
            "__k",
            "day",
            "n_events",
            (F.col("__sum_dec").cast("double")
             / F.col("n_events").cast("double")).alias("__avg_obs"),
        )
    )
    spans = daily.groupBy("__k").agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    cal = spans.select(
        "__k", F.explode(F.sequence("__d0", "__d1")).alias("day")
    )
    j = cal.join(daily, ["__k", "day"], "left_outer")
    w_back = (
        Window.partitionBy("__k").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("n_events").isNotNull(), F.col("day"))
    prev_v = F.last("__avg_obs", ignorenulls=True).over(w_back)
    prev_d = F.last(obs_day, ignorenulls=True).over(w_back)
    next_v = F.first("__avg_obs", ignorenulls=True).over(w_fwd)
    next_d = F.first(obs_day, ignorenulls=True).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (
        (F.col("day") - prev_d).cast("double")
        / (next_d - prev_d).cast("double")
    )
    return j.select(
        F.col("__k").alias(key_col),
        F.col("day").cast("long").alias("day"),
        F.coalesce(F.col("n_events"), F.lit(0).cast("long"))
        .alias("n_events"),
        F.when(F.col("n_events").isNotNull(), F.col("__avg_obs"))
        .otherwise(interp)
        .alias("avg_value"),
        F.when(F.col("n_events").isNotNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("interpolated"),
    )


def ewma_halflife(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    horizon: int = 16,
) -> DataFrame:
    """Exponentially-weighted moving average with half-life decay
    (alpha = 1/2) over EXACT integer values — the smoothing/forecast
    primitive the resampler above feeds.

    Float-safe by construction: the general EWMA recurrence accumulates
    ``(1-alpha)^t`` floats whose rounding drifts across engines, but with
    alpha = 1/2 every weight is dyadic, so the windowed form is exact
    integer arithmetic — ``N = sum_j x_{t-j} << (horizon-1-j)`` and
    ``D = sum_j 1 << (horizon-1-j)`` over the ``horizon`` most recent
    rows (pandas ``adjust=True`` renormalization: partial windows divide
    by the weight mass actually present), then ONE double division
    ``N / D``. Truncating the tail beyond ``horizon`` drops at most
    ``2^-horizon`` of the weight mass — deterministically, identically
    in both engines.

    ``value_col`` must be int64 (convert currency to exact cents
    upstream). All ``horizon`` lags share one ``(key, order)`` sort;
    the plan is a single window pass, no shuffle beyond it. Output: the
    key, the order columns, ``<value_col>``, ``weight_mass long``,
    ``ewma double``.
    """
    if not 1 <= horizon <= 62:
        raise ValueError("horizon must be in [1, 62]")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    num = []
    den = []
    for j in range(horizon):
        shift = 1 << (horizon - 1 - j)
        lagged = F.lag(F.col(value_col), j).over(w)
        num.append(F.coalesce(lagged * F.lit(shift), F.lit(0)))
        den.append(
            F.when(lagged.isNotNull(), F.lit(shift)).otherwise(F.lit(0))
        )
    n_expr = sum(num[1:], num[0]).cast("long")
    d_expr = sum(den[1:], den[0]).cast("long")
    return df.select(
        key_col, *order_cols, value_col,
        d_expr.alias("weight_mass"),
        (n_expr.cast("double") / d_expr.cast("double")).alias("ewma"),
    )


def cusum_flags(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    target: int,
    slack: int,
    threshold: int,
) -> DataFrame:
    """Two-sided CUSUM change-point detection (Page 1954) over exact
    integer values — the sequential mean-shift detector next to the
    batch screens (3-sigma, MAD): ``s_t = max(0, s_{t-1} + drift_t)``
    accumulates evidence of a sustained shift and resets on its own.

    The recurrence LOOKS un-windowable, but has the prefix-extremum
    closed form ``s_t = P_t - min(0, min_{j<=t} P_j)`` with ``P`` the
    running drift sum — so both sides (upward drift ``x - target -
    slack``, downward ``target - slack - x``) are two window aggregates
    over ONE ``(key, order)`` sort, exact int64 end to end, no recursion
    and no driver state. Alarms fire while ``s > threshold``.

    Output: the key, order columns, ``<value_col>``, ``cusum_up long,
    cusum_dn long, alarm_up long 0/1, alarm_dn long 0/1``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col)
    d_up = (x - F.lit(target + slack)).cast("long")
    d_dn = (F.lit(target - slack) - x).cast("long")
    p_up = F.sum(d_up).over(w)
    p_dn = F.sum(d_dn).over(w)
    s_up = (p_up - F.least(F.min(p_up).over(w), F.lit(0))).cast("long")
    s_dn = (p_dn - F.least(F.min(p_dn).over(w), F.lit(0))).cast("long")
    return df.select(
        key_col, *order_cols, value_col,
        s_up.alias("cusum_up"),
        s_dn.alias("cusum_dn"),
        (s_up > threshold).cast("long").alias("alarm_up"),
        (s_dn > threshold).cast("long").alias("alarm_dn"),
    )
