"""Upsert conflict policy — mirrors ``src/OnConflict.scala:7-44``.

Used by the JDBC sink to render ``INSERT … ON CONFLICT`` clauses; the
conflict target is explicit columns, a named constraint, or (when absent)
the table's primary key sorted by name (``src/CopyAction.scala:92-125``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class OnConflict:
    """action: 'nothing' -> DO NOTHING; 'update' -> DO UPDATE SET c=EXCLUDED.c
    for every non-conflict column (or ``update_columns`` when given)."""

    action: str = "nothing"
    target_columns: tuple[str, ...] = ()
    constraint: str | None = None
    update_columns: tuple[str, ...] = ()

    @staticmethod
    def do_nothing(*target_columns: str, constraint: str | None = None) -> "OnConflict":
        return OnConflict("nothing", tuple(target_columns), constraint)

    @staticmethod
    def do_update(*target_columns: str, constraint: str | None = None,
                  update_columns: tuple[str, ...] = ()) -> "OnConflict":
        return OnConflict("update", tuple(target_columns), constraint, tuple(update_columns))

    def render(self, all_columns: list[str], primary_key: list[str],
               quote) -> str:
        """Render the ON CONFLICT clause (``src/CopyAction.scala:92-125``)."""
        if self.constraint:
            target = f"ON CONSTRAINT {quote(self.constraint)}"
            conflict_cols = set()
        else:
            cols = list(self.target_columns) or sorted(primary_key)
            if not cols:
                raise ValueError("onConflict requires target columns, a constraint, or a primary key")
            target = "(" + ", ".join(quote(c) for c in cols) + ")"
            conflict_cols = set(cols)
        if self.action == "nothing":
            return f"ON CONFLICT {target} DO NOTHING"
        update_cols = list(self.update_columns) or [
            c for c in all_columns if c not in conflict_cols
        ]
        sets = ", ".join(f"{quote(c)} = EXCLUDED.{quote(c)}" for c in update_cols)
        return f"ON CONFLICT {target} DO UPDATE SET {sets}"
