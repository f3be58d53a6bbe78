"""Data-quality audit: the pre-flight expectations a pipeline runs before
trusting a snapshot — null rates, key uniqueness, referential integrity,
domain bounds — emitted as one long-format (metric, value) report.

Every metric is a combinable aggregation or an anti-join count, so the
report costs a constant number of scans regardless of table size; at
100 TB each check is exactly the aggregation/semi-join shape the rest of
the engine already optimizes (counts partial-aggregate; the orphan check
is a broadcast/shuffle anti-join on the FK).

Determinism: all metrics are exact BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _metric(name: str, value: Column) -> Column:
    return F.struct(F.lit(name).alias("metric"), value.cast("long").alias("value"))


def audit_orders(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Audit the orders snapshot against its customer dimension.

    Metrics: row count, per-column null counts, primary-key duplicate
    rows (rows beyond the first per o_orderkey), FK orphans (orders whose
    customer is missing), and domain violations (non-positive totals).
    """
    base = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("null_orderdate"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias("null_totalprice"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpositive_total"),
    )
    orphans = (
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    wide = base.crossJoin(F.broadcast(orphans))
    metrics = [
        "n_rows", "null_custkey", "null_orderdate", "null_totalprice",
        "dup_pk_rows", "nonpositive_total", "fk_orphans",
    ]
    return (
        wide.select(
            F.explode(F.array(*[_metric(m, F.col(m)) for m in metrics]))
            .alias("kv")
        )
        .select(F.col("kv.metric").alias("metric"), F.col("kv.value").alias("value"))
    )


def anomaly_flags(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    n_sigma: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates more than ``n_sigma`` sample standard
    deviations from their group mean — the z-score outlier screen, built
    on stats.moments (exact DECIMAL sums -> IEEE double combine) joined
    back to the rows. Comparison is ``(x - mean)^2 > n²·var`` on
    identical doubles — no sqrt, engine-identical.

    Output: id, group cols, value (as double), group mean, the squared
    deviation, all deterministic.
    """
    from .stats import moments

    m = moments(df, group_cols, value_col)
    v = F.col(value_col).cast("decimal(12,2)").cast("double")
    joined = df.join(F.broadcast(m), group_cols)
    dev2 = (v - F.col("mean_v")) * (v - F.col("mean_v"))
    var = F.col("stddev_v") * F.col("stddev_v")
    return (
        joined.where(
            F.col("stddev_v").isNotNull()
            & (dev2 > F.lit(n_sigma * n_sigma) * var)
        )
        .select(
            F.col(id_col),
            *group_cols,
            v.alias("value"),
            F.col("mean_v"),
            dev2.alias("dev_sq"),
        )
    )
