"""Schema catalog — tables, columns, PKs, logical FKs, sequences.

The reference introspects PostgreSQL lazily with one bulk query per
metadata category (``src/DbContext.scala:11-18``). Our catalog is a plain
driver-side object with two construction paths:

* **declared** — metadata passed as Python data (the path for Parquet
  fixtures, where FK/PK facts aren't stored in the files);
* **JDBC introspection** — the same ``information_schema`` /
  ``pg_catalog`` queries as the reference (``src/DbContext.scala:49-118``),
  executed over a JDBC connection and cached per category
  (see ``sources.jdbc.introspect_catalog``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property


@dataclass(frozen=True)
class LogicalFK:
    """A logical (possibly composite) FK constraint
    (``src/DbContext.scala:127-142``). ``columns`` is ordered
    ``(fk_column, pk_column)`` pairs."""

    name: str | None
    fk_table: str
    pk_table: str
    columns: tuple[tuple[str, str], ...]

    @property
    def is_self_ref(self) -> bool:
        return self.fk_table == self.pk_table

    @property
    def fk_columns(self) -> list[str]:
        return [c[0] for c in self.columns]

    @property
    def pk_columns(self) -> list[str]:
        return [c[1] for c in self.columns]


@dataclass(frozen=True)
class SequenceInfo:
    """A sequence-backed column (``src/DbContext.scala:81-101``)."""

    table_name: str
    column_name: str
    sequence_name: str


def group_fks(per_column_rows: list[tuple]) -> list[LogicalFK]:
    """Group per-column FK metadata rows into logical constraints
    (``src/DbContext.scala:136-142``). Rows are
    ``(fk_name, fk_table, pk_table, fk_column, pk_column, key_seq)``."""
    groups: dict[tuple, list[tuple]] = {}
    for row in per_column_rows:
        groups.setdefault((row[1], row[2], row[0]), []).append(row)
    out = []
    for (fk_table, pk_table, name), rows in groups.items():
        rows.sort(key=lambda r: r[5])
        out.append(LogicalFK(name, fk_table, pk_table,
                             tuple((r[3], r[4]) for r in rows)))
    return out


@dataclass(frozen=True)
class Catalog:
    """Driver-side schema metadata shared by planner and validator."""

    tables: tuple[str, ...]
    columns: dict[str, list[str]]
    primary_keys: dict[str, frozenset[str]] = field(default_factory=dict)
    foreign_keys: tuple[LogicalFK, ...] = ()
    sequences: tuple[SequenceInfo, ...] = ()

    @staticmethod
    def declared(
        columns: dict[str, list[str]],
        primary_keys: dict[str, set[str]] | None = None,
        foreign_keys: list[LogicalFK] | tuple[LogicalFK, ...] = (),
        sequences: list[SequenceInfo] | tuple[SequenceInfo, ...] = (),
    ) -> "Catalog":
        pks = {t: frozenset(v) for t, v in (primary_keys or {}).items()}
        return Catalog(
            tables=tuple(sorted(columns)),
            columns=dict(columns),
            primary_keys=pks,
            foreign_keys=tuple(foreign_keys),
            sequences=tuple(sequences),
        )

    @cached_property
    def fk_columns_by_table(self) -> dict[str, frozenset[str]]:
        """All FK column names per child table (``src/DbContext.scala:144-145``)."""
        out: dict[str, set[str]] = {}
        for fk in self.foreign_keys:
            out.setdefault(fk.fk_table, set()).update(fk.fk_columns)
        return {t: frozenset(v) for t, v in out.items()}

    def fks_of_child(self, table: str) -> list[LogicalFK]:
        return [fk for fk in self.foreign_keys if fk.fk_table == table]

    def self_ref_fks(self, table: str) -> list[LogicalFK]:
        return [fk for fk in self.fks_of_child(table) if fk.is_self_ref]

    def sequences_of(self, table: str) -> list[SequenceInfo]:
        return [s for s in self.sequences if s.table_name == table]


def quote_identifier(name: str) -> str:
    """PostgreSQL-style identifier quoting — SQL-injection-safe table and
    column names in generated SQL (``src/SlickProfile.scala:13-20``; the
    reference tests hostile names, ``it/TableCopierIntegrationTest.scala:182-216``)."""
    return '"' + name.replace('"', '""') + '"'


def quote_qualified(name: str, schema: str | None = None) -> str:
    if schema:
        return f"{quote_identifier(schema)}.{quote_identifier(name)}"
    return quote_identifier(name)
