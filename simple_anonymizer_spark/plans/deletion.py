"""Cascading deletion — the GDPR right-to-erasure workflow on the same
FK machinery that powers subsetting.

The reference's filter propagation (``src/FilterPropagation.scala``)
answers "keep these rows and everything reachable from them"; erasure
asks the complement: "delete these rows and everything that references
them". The propagation loop is the same topological walk, but the NULL
convention differs from subsetting's strict ``IN``: SQL ``ON DELETE
CASCADE`` touches only children whose FK actually references a deleted
parent, so a NULL-FK child always survives — every edge propagates
``fk IS NULL OR fk IN (surviving parents)``. Self-referencing FKs reuse
the subsetting closure (``self_ref_closure``), whose keep-rule already
is that disjunction.

The seed predicate is likewise SQL-DELETE-shaped: rows where the delete
predicate evaluates to NULL are NOT deleted (``NOT coalesce(φ, false)``).

Scale (100 TB): one left join (broadcast when the surviving parent key
set is small — a targeted erasure usually is) or semi-join per FK edge,
in topological order; the audit is one count aggregate per table,
unioned into a single small report.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.catalog import Catalog, LogicalFK
from .propagation import _all_null, _keep_reachable, self_ref_closure
from .table_sorter import sort_tables

_PRESENT = "__del_parent_present"


def _keep_if_parent_survives(
    child: DataFrame, parent: DataFrame, fk: LogicalFK
) -> DataFrame:
    """``fk IS NULL OR fk IN (surviving parent keys)`` as one left join
    (single pass over the child; the key set deduplicates first)."""
    keys = parent.select(
        *[F.col(pk).alias(f"__pk_{i}") for i, pk in enumerate(fk.pk_columns)]
    ).distinct().withColumn(_PRESENT, F.lit(True))
    cond = None
    for i, fkc in enumerate(fk.fk_columns):
        eq = child[fkc] == keys[f"__pk_{i}"]
        cond = eq if cond is None else cond & eq
    kept = child.join(keys, cond, "left_outer").where(
        F.col(_PRESENT).isNotNull() | _all_null(child, list(fk.fk_columns))
    )
    return kept.select(*[child[c] for c in child.columns])


def cascade_delete(
    dfs: dict[str, DataFrame],
    catalog: Catalog,
    delete_where: dict[str, str],
) -> dict[str, DataFrame]:
    """Per-table survivors after deleting rows matching ``delete_where``
    (raw Spark SQL fragments, per table) and cascading the deletion down
    every FK edge in ``catalog``."""
    fks = [
        fk for fk in catalog.foreign_keys
        if fk.fk_table in dfs and fk.pk_table in dfs
    ]
    order = [t for level in sort_tables(list(dfs), fks) for t in level]

    out: dict[str, DataFrame] = dict(dfs)
    touched: dict[str, bool] = {}
    for table in order:
        eff = dfs[table]
        hit = False
        if table in delete_where:
            eff = eff.where(
                F.expr(f"NOT coalesce(({delete_where[table]}), false)")
            )
            hit = True
        for fk in catalog.fks_of_child(table):
            if fk.is_self_ref:
                continue
            if touched.get(fk.pk_table):
                eff = _keep_if_parent_survives(eff, out[fk.pk_table], fk)
                hit = True
        if hit:
            for tag, fk in enumerate(catalog.self_ref_fks(table)):
                closure = self_ref_closure(eff, fk)
                eff = _keep_reachable(eff, fk, closure, tag)
        out[table] = eff
        touched[table] = hit
    return out


def deletion_audit(
    dfs: dict[str, DataFrame],
    catalog: Catalog,
    delete_where: dict[str, str],
) -> DataFrame:
    """Erasure audit report: ``table_name, rows_before, rows_surviving,
    rows_deleted`` — the compliance evidence a deletion run must emit."""
    survivors = cascade_delete(dfs, catalog, delete_where)
    reports = []
    for table in sorted(dfs):
        before = dfs[table].agg(
            F.count(F.lit(1)).cast("long").alias("rows_before")
        )
        after = survivors[table].agg(
            F.count(F.lit(1)).cast("long").alias("rows_surviving")
        )
        reports.append(
            before.crossJoin(after).select(
                F.lit(table).alias("table_name"),
                "rows_before",
                "rows_surviving",
                (F.col("rows_before") - F.col("rows_surviving"))
                .alias("rows_deleted"),
            )
        )
    return reduce(DataFrame.unionByName, reports)
