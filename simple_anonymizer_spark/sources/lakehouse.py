"""Capability-gated lakehouse MERGE: the same ``OnConflict`` spec that
drives the JDBC ``INSERT ... ON CONFLICT`` path (``src/OnConflict.scala:7-44``)
and the parquet atomic-swap path (``sources/merge.py``), executed as a real
``MERGE INTO`` when a Delta Lake runtime is on the classpath.

Why a third path at all: ``merge_parquet`` is single-writer — the staging
write + directory swap gives readers atomicity but rewrites the whole
table and cannot tolerate concurrent writers. Delta's MERGE adds
multi-writer ACID (optimistic concurrency on the transaction log) and
file-level pruning (only files containing matched keys rewrite), which is
the difference between "works" and "works at 100 TB" for a continuously
upserted table. The join plan underneath is IDENTICAL to
``merge_dataframes`` — one key-equi join, matched rows take source values,
unmatched insert — so correctness carries over from the oracle-gated
``merge_upsert`` query; this module only changes the sink.

The container ships no Delta jars, so everything is built against a small
structural protocol (``alias/merge/whenMatchedUpdate[All]/
whenNotMatchedInsertAll/execute``) that ``delta.tables.DeltaTable``
satisfies. Tests inject a recorder implementing the same protocol and pin
the exact clause sequence; the live path lights up unmodified when
``pip install delta-spark`` + the jars exist.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..plans.on_conflict import OnConflict

_SRC = "__mrg_src"
_TGT = "__mrg_tgt"


def delta_available(spark: SparkSession | None = None) -> bool:
    """True when the Delta Lake Python bindings AND the jars are usable.

    Import alone is not enough — ``delta-spark`` can be pip-installed
    without the JVM side — so when a session is given, probe the JVM class
    too. Cheap (no I/O), safe to call per-merge.
    """
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is None:
        return True
    try:
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
        return True
    except Exception:
        return False


def build_merge(
    table: Any,
    source: DataFrame,
    keys: list[str],
    on_conflict: OnConflict | None,
    all_columns: list[str],
):
    """Translate an ``OnConflict`` spec into Delta merge-builder calls on
    ``table`` (a ``DeltaTable`` or any protocol-compatible object) and
    return the executable builder. Separated from :func:`merge_lakehouse`
    so the translation is unit-testable without a Delta runtime.

    Mapping (mirrors ``OnConflict.render`` clause-for-clause):

    * ``do_nothing``   -> whenNotMatchedInsertAll (matched rows untouched)
    * ``do_update``    -> whenMatchedUpdate(update_columns or all
      non-key columns) + whenNotMatchedInsertAll

    ``on_conflict=None`` is NOT a merge: plain INSERT appends every source
    row, duplicates included (what the JDBC batch INSERT and
    ``merge_dataframes`` both do), while an insert-only MERGE silently
    drops source rows whose keys already exist in the target. The None
    case must go through an append write — passing it here raises.
    """
    if on_conflict is None:
        raise ValueError(
            "on_conflict=None is plain-INSERT (append) semantics; "
            "write with mode('append') instead of MERGE"
        )
    cond = " AND ".join(f"{_TGT}.`{k}` = {_SRC}.`{k}`" for k in keys)
    builder = table.alias(_TGT).merge(source.alias(_SRC), cond)
    if on_conflict.action == "update":
        update_cols = list(on_conflict.update_columns) or [
            c for c in all_columns if c not in keys
        ]
        if update_cols:
            builder = builder.whenMatchedUpdate(
                set={c: f"{_SRC}.`{c}`" for c in update_cols}
            )
    return builder.whenNotMatchedInsertAll()


def merge_lakehouse(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    on_conflict: OnConflict | None = None,
    partition_by: list[str] | None = None,
    table: Any = None,
) -> int:
    """MERGE ``source`` into the Delta table at ``path``; returns the
    merged row count. First write creates the table. ``table`` injects a
    protocol-compatible handle for testing."""
    from .merge import dedupe_source

    if table is None:  # pragma: no cover - requires Delta jars
        from delta.tables import DeltaTable

        exists = DeltaTable.isDeltaTable(spark, path)
        if not exists or on_conflict is None:
            # First write creates the table; on_conflict=None appends to
            # an existing one — plain-INSERT semantics, matching
            # merge_dataframes/the JDBC path (an insert-only MERGE would
            # silently drop source rows whose keys already exist).
            result = dedupe_source(source, keys) if on_conflict else source
            writer = result.write.format("delta").mode(
                "append" if exists else "overwrite"
            )
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.save(path)
            return spark.read.format("delta").load(path).count()
        table = DeltaTable.forPath(spark, path)

    if on_conflict is not None:
        # Same reason as merge_parquet: MERGE requires at most one source
        # row per key (Delta raises DELTA_MULTIPLE_SOURCE_ROW_MATCHING...).
        source = dedupe_source(source, keys)
    build_merge(table, source, keys, on_conflict, source.columns).execute()
    return table.toDF().count()


def merge_table(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    on_conflict: OnConflict | None = None,
    partition_by: list[str] | None = None,
    backend: str = "auto",
) -> int:
    """One MERGE front door. Backends (all run the same relational plan;
    they differ only in sink durability/concurrency):

    * ``"delta"``    — jar-backed ``DeltaTable.merge`` (multi-writer ACID,
      engine-side file pruning);
    * ``"deltalog"`` — the pure-Python Delta transaction log
      (``sources/deltalog.py``): same ACID commit protocol and stats-based
      file pruning, executed without jars;
    * ``"parquet"``  — single-writer staging-swap (``merge_parquet``);
    * ``"auto"``     — ``delta`` when the runtime is importable, else the
      parquet swap (the format users get without opting into a log).
    """
    from .merge import merge_parquet

    if backend not in ("auto", "delta", "deltalog", "parquet"):
        raise ValueError(f"unknown merge backend {backend!r}")
    if backend == "deltalog":
        from .deltalog import merge_deltalog

        return merge_deltalog(
            spark, source, path, keys, on_conflict, partition_by
        )
    if backend == "delta" or (backend == "auto" and delta_available(spark)):
        # pragma: no cover - requires Delta jars
        return merge_lakehouse(
            spark, source, path, keys, on_conflict, partition_by
        )
    return merge_parquet(spark, source, path, keys, on_conflict, partition_by)
