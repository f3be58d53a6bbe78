"""The stable-hash kernel as a native Catalyst expression.

Reference semantics (``src/Anonymizer.scala:27-36``): the first 4 bytes of
``MD5(UTF-8(input))`` interpreted as a big-endian signed int, masked with
``& Int.MaxValue`` to force non-negative; ``null`` / ``""`` hash to 0.

Implementation is pure JVM-side column algebra — ``md5``/``substring``/
``conv``/``pmod`` — so a 100 TB anonymization pass never leaves whole-stage
codegen. Bit-parity with the Python and DuckDB mirrors is pinned by
``tests/test_anonymizers.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INT_MAX = 0x7FFFFFFF


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def stable_hash(col: Column | str) -> Column:
    """Positive-int MD5 prefix hash of a string column; null/"" -> 0.

    ``conv(substring(md5(c), 1, 8), 16, 10)`` yields the unsigned 32-bit
    value of the first four digest bytes; masking with INT_MAX reproduces
    the reference's sign-bit clear exactly.
    """
    c = _as_col(col)
    raw = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    return (
        F.when(c.isNull() | (c == F.lit("")), F.lit(0).cast("long"))
        .otherwise(raw.bitwiseAND(F.lit(INT_MAX)))
    )


def _raw_hash(c: Column) -> Column:
    """Hash without the null/empty guard — for use inside expressions whose
    outer anonymizer already guards null/empty (saves a redundant CASE)."""
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(INT_MAX))
    )


def select_by_hash(c: Column, values: list[str], salt: str | None = None) -> Column:
    """``values[stableHash(input + salt) % len(values)]`` as an expression.

    The list is embedded as a literal array; Catalyst constant-folds it so
    executors index an in-memory array per row (no shuffle, no UDF).
    """
    keyed = F.concat(c, F.lit(salt)) if salt else c
    idx = F.pmod(_raw_hash(keyed), F.lit(len(values))).cast("int")
    return F.element_at(F.array(*[F.lit(v) for v in values]), idx + F.lit(1))
