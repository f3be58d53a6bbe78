"""MERGE sink over parquet — the lakehouse-native counterpart of the
JDBC ``INSERT ... ON CONFLICT`` path (``src/OnConflict.scala:7-44``,
``src/CopyAction.scala:92-125``).

Spark has no built-in ``MERGE INTO`` without a Delta/Iceberg catalog (and
this container ships neither), so the merge is expressed as what MERGE
*is* relationally — one key-equi join between target and deduplicated
source:

* ``do_nothing``  → target ∪ (source ⟕̸ target)       (anti-join inserts)
* ``do_update``   → (target ⟕ source, matched rows take source values)
                    ∪ (source ⟕̸ target)

``merge_dataframes`` is the pure transformation (reused by the
oracle-gated ``merge_upsert`` query); ``merge_parquet`` adds the sink:
stage-write then directory swap, so readers never observe a half-written
table (single-writer atomicity — multi-writer ACID is exactly what
Delta/Iceberg add on top of this same join plan; swap ``merge_parquet``
for ``DeltaTable.merge`` when those jars exist, the semantics line up
1:1 with OnConflict by construction).

Scale notes: the join shuffles both sides by the merge keys once — the
minimum any MERGE does. At 100 TB the wins come from layout, not the
operator: bucket/partition the target by the merge keys so the join is
co-located and only touched partitions rewrite (dynamic partition
overwrite), which is what this module's ``partition_by`` passthrough
enables. Source deduplication is a window over the keys, shuffled
identically, so AQE coalesces both into the same exchange.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.on_conflict import OnConflict

_PRESENT = "__merge_present"
_RN = "__merge_rn"


def dedupe_source(source: DataFrame, keys: list[str]) -> DataFrame:
    """Keep one row per key — the LAST under a total order of the
    remaining columns (deterministic; PG raises on double-hit upserts in
    one command, a distributed merge must instead pick reproducibly)."""
    others = [c for c in source.columns if c not in keys]
    order = [F.col(c).desc_nulls_last() for c in others] or [F.lit(1).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        source.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def merge_dataframes(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    on_conflict: OnConflict | None = None,
) -> DataFrame:
    """MERGE as a transformation; output columns = target columns.

    ``on_conflict=None`` behaves like the plain INSERT path (append),
    mirroring ``render_insert`` without a conflict clause — duplicates and
    all, because that is what the JDBC path would produce.

    The source plan is referenced by BOTH join branches (matched-update and
    anti-join insert). A non-deterministic source (``limit`` without order,
    ``sample``, unseeded ``rand``) would evaluate differently per branch and
    produce an inconsistent merge — the same hazard Delta solves by source
    materialization. ``merge_parquet`` persists the source for this reason;
    callers of the bare transformation must pass a deterministic source.
    """
    if set(source.columns) != set(target.columns):
        raise ValueError(
            f"source columns {sorted(source.columns)} != target columns "
            f"{sorted(target.columns)}"
        )
    cols = target.columns
    if on_conflict is None:
        return target.unionByName(source.select(*cols))

    src = dedupe_source(source.select(*cols), keys)
    inserts = src.join(target.select(*keys), on=keys, how="left_anti")

    if on_conflict.action == "nothing":
        return target.unionByName(inserts)

    update_cols = list(on_conflict.update_columns) or [
        c for c in cols if c not in keys
    ]
    marked = src.select(
        *[F.col(c).alias(f"__s_{c}") for c in cols], F.lit(True).alias(_PRESENT)
    )
    join_cond = [target[k] == marked[f"__s_{k}"] for k in keys]
    updated = target.join(marked, on=join_cond, how="left").select(
        *[
            (
                F.when(F.col(_PRESENT), F.col(f"__s_{c}"))
                .otherwise(target[c])
                .alias(c)
                if c in update_cols
                else target[c].alias(c)
            )
            for c in cols
        ]
    )
    return updated.unionByName(inserts)


def merge_parquet(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    on_conflict: OnConflict | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """MERGE ``source`` into the parquet table at ``path``; returns the
    row count of the merged table. First write creates the table."""
    path = str(path)
    if not os.path.exists(path):
        result = dedupe_source(source, keys) if on_conflict else source
        writer = result.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return spark.read.parquet(path).count()

    target = spark.read.parquet(path)
    # Source materialization (see merge_dataframes docstring): both join
    # branches must observe identical source rows even when the source plan
    # is non-deterministic. cache() computes each partition once under the
    # block manager's lock; unpersisted after the staging write.
    source = source.cache()
    try:
        result = merge_dataframes(target, source, keys, on_conflict)

        staging = f"{path}.__staging__{uuid.uuid4().hex[:8]}"
        writer = result.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)  # materializes BEFORE the old table moves
    finally:
        source.unpersist()

    old = f"{path}.__old__{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except Exception:  # pragma: no cover - restore on swap failure
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    return spark.read.parquet(path).count()
