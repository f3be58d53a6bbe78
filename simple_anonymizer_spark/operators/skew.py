"""Skew mitigation utilities: salted joins and bucketed layouts.

AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in `session.get_spark`) handles most skew transparently.
Salting is the explicit fallback for the cases AQE can't fix — skewed
*aggregations* and skewed *broadcast-ineligible* joins where one hot key
dwarfs every partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: the (large, skewed) left side gets a
    random salt in ``[0, salt_buckets)``; the (smaller) right side is
    replicated once per salt value via an exploded literal range. The join
    key becomes ``(key, salt)``, spreading each hot key over
    ``salt_buckets`` shuffle partitions.

    Right-side replication multiplies its size by ``salt_buckets`` — use
    only when ``right`` is far smaller than ``left`` but too big (or too
    dynamic) to broadcast.

    Only left-preserving joins are valid: a right/full outer join would
    emit each unmatched right row once per salt replica (duplicates).
    """
    if how.replace("_", "").lower() not in {
        "inner", "left", "leftouter", "leftsemi", "leftanti",
    }:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}:"
            " right-preserving joins would duplicate unmatched right rows"
            " once per salt bucket"
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    ``(key, salt)`` then final aggregate on ``key``. ``aggs`` maps output
    column -> (input column, fn) where fn is 'sum' or 'count' (the
    decomposable aggregates; count re-aggregates as sum)."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial_exprs = []
    final_exprs = []
    for out_col, (in_col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out_col}"))
            final_exprs.append(F.sum(f"__p_{out_col}").alias(out_col))
        elif fn == "sum":
            partial_exprs.append(F.sum(in_col).alias(f"__p_{out_col}"))
            final_exprs.append(F.sum(f"__p_{out_col}").alias(out_col))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist with a bucketed layout so repeated joins/aggregations on
    ``bucket_cols`` skip their shuffle (both sides bucketed on the same
    column count co-locate). The standing layout for iterative dedup runs
    over the same corpus — shingle/band shuffles happen once at write time.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
