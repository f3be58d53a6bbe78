"""Single-table copy — mirrors ``src/TableCopier.scala:37-84``.

Unlike ``DbCopier``, there is NO automatic PK/FK passthrough: the spec
must list every column that should appear in the output (doc at
``src/TableCopier.scala:37-43``), and no cross-table filter propagation
runs. Unknown spec columns fail fast against the source schema
(``src/TableCopier.scala:49-59``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from .compiler import apply_spec
from .table_spec import TableSpec


def copy_table(
    read_table: Callable[[str], DataFrame],
    write_table: Callable[[str, DataFrame], int],
    table: str,
    spec: TableSpec,
) -> int:
    """Copy one table through a spec; returns rows written."""
    df = read_table(table)
    known = set(df.columns)
    # Every spec column (fixed ones included) must exist in the source —
    # reference semantics, src/TableCopier.scala:49-59.
    unknown = [c.name for c in spec.columns if c.name not in known]
    if unknown:
        raise ValueError(
            f"Unknown columns in spec for table '{table}': {sorted(unknown)}. "
            f"Available: {sorted(known)}"
        )
    return write_table(table, apply_spec(df, spec))
