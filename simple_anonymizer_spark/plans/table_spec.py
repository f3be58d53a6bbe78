"""Declarative per-table copy plan — mirrors ``src/TableSpec.scala``.

``TableSpec.select(lambda row: [...])`` receives a dynamic ``Row`` proxy;
chained options fold into a new immutable spec (``src/TableSpec.scala:33-43``).
``WhereClause`` trees AND raw SQL fragments with parenthesization
(``src/TableSpec.scala:47-70``).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Sequence

from .on_conflict import OnConflict
from .output_column import OutputColumn, Row

DEFAULT_BATCH_SIZE = 5000  # src/TableSpec.scala:14,22


@dataclass(frozen=True)
class WhereClause:
    """Single raw-SQL fragment or conjunction of clauses
    (``src/TableSpec.scala:47-70``)."""

    fragments: tuple[str, ...]

    @staticmethod
    def single(sql: str) -> "WhereClause":
        return WhereClause((sql,))

    def and_(self, other: "WhereClause | None") -> "WhereClause":
        if other is None:
            return self
        return WhereClause(self.fragments + other.fragments)

    def render(self) -> str:
        if len(self.fragments) == 1:
            return self.fragments[0]
        return " AND ".join(f"({f})" for f in self.fragments)


@dataclass(frozen=True)
class TableSpec:
    """Declarative plan: which columns to emit (and how), an optional row
    filter, limit, write batch size, and upsert policy
    (``src/TableSpec.scala:18-24``)."""

    columns: tuple[OutputColumn, ...] = ()
    where_clause: WhereClause | None = None
    limit: int | None = None
    batch_size: int = DEFAULT_BATCH_SIZE
    on_conflict: OnConflict | None = None

    @staticmethod
    def select(build: Callable[[Row], Sequence[OutputColumn]]) -> "TableSpec":
        """The DSL entry point (``src/TableSpec.scala:78-81``)."""
        return TableSpec(columns=tuple(build(Row())))

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def where(self, sql: str) -> "TableSpec":
        """AND a raw SQL predicate onto the spec (``src/TableSpec.scala:33-34``)."""
        new = WhereClause.single(sql)
        merged = self.where_clause.and_(new) if self.where_clause else new
        return replace(self, where_clause=merged)

    def with_limit(self, n: int) -> "TableSpec":
        return replace(self, limit=n)

    def with_batch_size(self, n: int) -> "TableSpec":
        return replace(self, batch_size=n)

    def with_on_conflict(self, oc: OnConflict) -> "TableSpec":
        return replace(self, on_conflict=oc)

    def with_columns(self, columns: Sequence[OutputColumn]) -> "TableSpec":
        return replace(self, columns=tuple(columns))

    def validate_covers(self, table_columns: Sequence[str]) -> list[str]:
        """Missing = table columns with no spec entry
        (``src/TableSpec.scala:27-30``). Returns sorted missing names."""
        spec_names = set(self.column_names)
        return sorted(c for c in table_columns if c not in spec_names)
