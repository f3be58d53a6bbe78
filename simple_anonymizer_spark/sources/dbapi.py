"""DB-API source bridge: run the JDBC layer's rendered SELECTs through any
DB-API 2.0 connection and surface the rows as a Spark DataFrame.

Spark's JDBC source needs a JVM driver; when none exists (this container,
or any database with only a Python driver), this bridge provides the same
read contract as ``sources.jdbc.jdbc_reader``:

* the full per-table ``SELECT`` (projection, WHERE, ORDER BY id DESC,
  LIMIT) is pushed to the database — rendered by the same
  ``jdbc.render_select`` used for the JDBC path, so SQL behavior is
  identical by construction;
* ``partition=(column, lower, upper, n)`` splits the read into n range
  queries executed concurrently on separate connections — Spark JDBC's
  partitioning scheme (first/last partitions unbounded, NULLs in the
  first), built as WHERE-clause conjuncts;
* ``snapshot_id`` pins every partition connection to one exported
  snapshot via the same sessionInit statement the JDBC path uses
  (``BEGIN ... REPEATABLE READ; SET TRANSACTION SNAPSHOT ...``) — so all
  partitions observe a single point-in-time view regardless of concurrent
  writers (reference: ``src/DbCopier.scala:130-145``).

Column types come from the database itself through the
``information_schema.columns`` contract (``jdbc.COLUMNS_SQL``), mapped to
a Spark schema — no caller-side type declarations.

Scale note: rows are fetched driver-side (this is a test/driver bridge,
not the 100 TB path — that is parquet/JDBC); partition fan-out exists to
exercise snapshot semantics under real concurrency, not for throughput.
"""

from __future__ import annotations

import re
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .catalog import quote_identifier
from .jdbc import COLUMNS_SQL, render_select

_TYPE_MAP: list[tuple[str, Callable[[re.Match], T.DataType]]] = [
    (r"bigint|int8", lambda m: T.LongType()),
    (r"integer|int4|int\b|smallint", lambda m: T.IntegerType()),
    (r"numeric\((\d+),\s*(\d+)\)|decimal\((\d+),\s*(\d+)\)",
     lambda m: T.DecimalType(int(m.group(1) or m.group(3)),
                             int(m.group(2) or m.group(4)))),
    (r"numeric|decimal", lambda m: T.DecimalType(38, 18)),
    (r"double|float8|real", lambda m: T.DoubleType()),
    (r"boolean|bool\b", lambda m: T.BooleanType()),
]


def _spark_type(pg_type: str) -> T.DataType:
    for pattern, factory in _TYPE_MAP:
        m = re.match(pattern, pg_type.strip().lower())
        if m:
            return factory(m)
    return T.StringType()  # text / varchar / jsonb / timestamps-as-text


def session_init_sql(snapshot_id: str) -> str:
    """The exact statement pair the JDBC path passes via
    ``sessionInitStatement`` (``sources/jdbc.py``)."""
    return (
        "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
        f"SET TRANSACTION SNAPSHOT '{snapshot_id}'"
    )


def partition_clauses(column: str, lower: int, upper: int, n: int) -> list[str]:
    """Spark JDBC's range-partitioning predicates
    (JDBCRelation.columnPartition): stride floor, first partition takes
    ``< bound OR IS NULL``, last takes ``>= bound``."""
    if n <= 1:
        return [""]
    stride = max((upper - lower) // n, 1)
    q = quote_identifier(column)
    clauses = []
    bound = lower + stride
    clauses.append(f"({q} < {bound} OR {q} IS NULL)")
    for _ in range(n - 2):
        clauses.append(f"({q} >= {bound} AND {q} < {bound + stride})")
        bound += stride
    clauses.append(f"({q} >= {bound})")
    return clauses


def introspect_types(connect: Callable[[], Any], schema: str = "public") -> dict[str, dict[str, str]]:
    """table -> column -> database type, via the information_schema
    contract (column order preserved)."""
    conn = connect()
    try:
        cur = conn.cursor()
        cur.execute(COLUMNS_SQL, (schema,))
        out: dict[str, dict[str, str]] = {}
        for table, col, dtype in cur.fetchall():
            out.setdefault(table, {})[col] = dtype
        return out
    finally:
        conn.close()


def dbapi_reader(
    spark: SparkSession,
    connect: Callable[[], Any],
    schema: str = "public",
    snapshot_id: str | None = None,
    partition: tuple[str, int, int, int] | None = None,
) -> Callable[..., DataFrame]:
    """Source factory with ``jdbc_reader``'s signature: returns
    ``read(table, columns=None, where_sql=None, limit=None) -> DataFrame``."""
    types = introspect_types(connect, schema)

    def read(
        table: str,
        columns: list[str] | None = None,
        where_sql: str | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        if table not in types:
            raise ValueError(f"unknown table {table!r}")
        cols = columns if columns is not None else list(types[table])
        struct = T.StructType(
            [T.StructField(c, _spark_type(types[table][c]), True) for c in cols]
        )

        if partition is not None and limit is None:
            pcol, lower, upper, n = partition
            clauses = partition_clauses(pcol, lower, upper, n)
        else:
            clauses = [""]

        def fetch(clause: str) -> list[tuple]:
            conjuncts = [c for c in (where_sql, clause) if c]
            where = " AND ".join(
                f"({c})" if len(conjuncts) > 1 else c for c in conjuncts
            ) or None
            sql = render_select(table, cols, schema, where, limit)
            conn = connect()
            try:
                cur = conn.cursor()
                if snapshot_id:
                    cur.execute(session_init_sql(snapshot_id))
                cur.execute(sql)
                return cur.fetchall()
            finally:
                conn.close()

        if len(clauses) == 1:
            rows = fetch(clauses[0])
        else:
            with ThreadPoolExecutor(max_workers=len(clauses)) as pool:
                rows = [r for part in pool.map(fetch, clauses) for r in part]
        return spark.createDataFrame(rows, struct)

    return read
