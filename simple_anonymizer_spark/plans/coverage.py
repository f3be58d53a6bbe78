"""Coverage validation — every table spec'd-or-skipped, every column
covered; failures carry copy-pastable Python DSL snippets.

Mirrors ``src/CoverageValidator.scala:28-104`` with the snippet text
adapted to this engine's Python DSL.
"""

from __future__ import annotations

import logging

from ..sources.catalog import Catalog
from .table_spec import TableSpec

logger = logging.getLogger(__name__)


def data_columns(catalog: Catalog, table: str) -> list[str]:
    """Columns needing explicit handling: non-PK, non-FK (those pass
    through automatically, ``src/CoverageValidator.scala:12-26``)."""
    pks = catalog.primary_keys.get(table, frozenset())
    fks = catalog.fk_columns_by_table.get(table, frozenset())
    return [c for c in catalog.columns.get(table, []) if c not in pks and c not in fks]


def generate_table_snippet(table: str, columns: list[str]) -> str:
    """Copy-pastable spec for a missing table
    (``src/CoverageValidator.scala:95-100``)."""
    column_list = ",\n".join(f"        row.{c}" for c in columns)
    body = f"\n{column_list}\n    " if columns else ""
    return (
        f'"{table}": TableSpec.select(lambda row: [{body}])'
    )


def generate_column_snippets(columns: set[str]) -> str:
    """Copy-pastable bindings for missing columns
    (``src/CoverageValidator.scala:103-104``)."""
    return ",\n      ".join(f"row.{c}" for c in sorted(columns))


def validate(
    catalog: Catalog,
    skipped_tables: set[str],
    table_specs: dict[str, TableSpec],
) -> None:
    """Raise ValueError unless every non-skipped table has a spec and every
    spec covers all its table's columns (``src/CoverageValidator.scala:79-89``).
    """
    required = [t for t in catalog.tables if t not in skipped_tables]
    missing_tables = [t for t in required if t not in table_specs]
    if missing_tables:
        snippets = ",\n\n".join(
            generate_table_snippet(t, data_columns(catalog, t)) for t in missing_tables
        )
        skip_list = ", ".join(f'"{t}"' for t in missing_tables)
        raise ValueError(
            f"Missing table specs for {len(missing_tables)} table(s).\n\n"
            f"Add these tables to copier.run(...):\n\n{snippets}\n\n"
            f"Or skip them via DbCopier(skipped_tables={{{skip_list}}})\n"
        )

    failures = []
    for table, spec in table_specs.items():
        missing = spec.validate_covers(catalog.columns.get(table, []))
        if missing:
            failures.append((table, missing))
    if failures:
        messages = "\n\n".join(
            f"Table '{t}' is missing {len(m)} column(s). Add these:\n"
            f"      {generate_column_snippets(set(m))}"
            for t, m in failures
        )
        raise ValueError(
            f"Table specs are missing columns for {len(failures)} table(s).\n\n"
            f"{messages}\n"
        )
    logger.info("Validation passed.")
