"""Whole-database copy orchestrator — mirrors ``src/DbCopier.scala``.

Plan → enrich → validate → execute, all driver-side; execution submits one
Spark write job per table, levels sequential and tables within a level in
parallel (``src/DbCopier.scala:57-83`` — there it's eager Futures, here a
thread pool submitting Spark actions; Spark's scheduler interleaves jobs).

Spec enrichment (``src/DbCopier.scala:85-99``): PK and FK columns are
auto-appended as passthrough ``SourceColumn``s, deduplicated by name with
the user's spec winning; propagated subset filters are applied via
``plans.propagation.apply_subsetting`` (semi-joins + fixpoint closures)
rather than re-rendered SQL.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import replace
from typing import Callable

from pyspark.sql import DataFrame

from ..sources.catalog import Catalog
from . import coverage
from .compiler import apply_spec
from .output_column import SourceColumn
from .propagation import apply_subsetting
from .table_sorter import sort_tables
from .table_spec import TableSpec

logger = logging.getLogger(__name__)


def add_keys(spec: TableSpec, catalog: Catalog, table: str) -> TableSpec:
    """Append PK∪FK passthrough columns, distinct by name, user spec wins
    (``src/DbCopier.scala:85-99``)."""
    key_cols = sorted(
        set(catalog.primary_keys.get(table, frozenset()))
        | set(catalog.fk_columns_by_table.get(table, frozenset()))
    )
    have = set(spec.column_names)
    extra = [SourceColumn(c) for c in key_cols if c not in have]
    return spec.with_columns(list(spec.columns) + extra)


class DbCopier:
    """Copy a whole schema with subsetting + anonymization.

    ``read_table(name) -> DataFrame`` abstracts the source (Parquet dir,
    JDBC, ...); ``write_table(name, df) -> int`` abstracts the sink and
    returns the row count written. For Parquet fixtures snapshot isolation
    is free (immutable files); the JDBC source handles snapshot pinning in
    ``sources.jdbc``.
    """

    def __init__(
        self,
        catalog: Catalog,
        read_table: Callable[[str], DataFrame],
        write_table: Callable[[str, DataFrame], int],
        skipped_tables: set[str] | None = None,
        max_parallel_tables: int = 8,
    ):
        self.catalog = catalog
        self.read_table = read_table
        self.write_table = write_table
        self.skipped_tables = skipped_tables or set()
        self.max_parallel_tables = max_parallel_tables

    def run(self, table_specs: dict[str, TableSpec]) -> dict[str, int]:
        catalog = self.catalog

        # Enrich: auto-passthrough PK/FK columns (user spec wins).
        enriched = {
            t: add_keys(spec, catalog, t) for t, spec in table_specs.items()
        }
        # Validate: all tables spec'd or skipped; all columns covered.
        coverage.validate(catalog, self.skipped_tables, enriched)

        # Topological plan over in-scope tables.
        in_scope = [t for t in catalog.tables if t not in self.skipped_tables]
        fks = [
            fk for fk in catalog.foreign_keys
            if fk.fk_table in in_scope and fk.pk_table in in_scope
        ]
        levels = sort_tables(in_scope, fks)

        # Read + subset (explicit filters AND propagated semi-joins).
        dfs = {t: self.read_table(t) for t in in_scope}
        explicit = {
            t: spec.where_clause.render()
            for t, spec in enriched.items()
            if spec.where_clause is not None and t in dfs
        }
        subsetted = apply_subsetting(dfs, catalog, explicit)

        logger.info("Copying %d tables in %d levels...",
                    sum(map(len, levels)), len(levels))
        results: dict[str, int] = {t: 0 for t in self.skipped_tables if t in catalog.tables}

        def copy_one(table: str) -> tuple[str, int]:
            spec = enriched[table]
            # WHERE already applied during subsetting — compile columns/limit only.
            df = apply_spec(subsetted[table], replace(spec, where_clause=None))
            return table, self.write_table(table, df)

        for level in levels:
            todo = [t for t in level if t not in self.skipped_tables]
            if not todo:
                continue
            with ThreadPoolExecutor(max_workers=self.max_parallel_tables) as pool:
                for table, count in pool.map(copy_one, todo):
                    results[table] = count
                    logger.info("Copied %s: %d rows", table, count)
        return results
