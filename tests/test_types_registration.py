"""Type-preservation through the copier (it/DbCopierIntegrationTest
DECIMAL/INTEGER fidelity port) and SQL-registration coverage."""

from __future__ import annotations

from decimal import Decimal

from simple_anonymizer_spark.functions import anonymizers as A
from simple_anonymizer_spark.functions import pyimpl as P
from simple_anonymizer_spark.plans import TableSpec, apply_spec


def test_passthrough_preserves_types_exactly(spark):
    # it/DbCopierIntegrationTest.scala:243-268 — DECIMAL/INTEGER round-trip.
    df = spark.createDataFrame(
        [(1, Decimal("299.99"), 42)],
        "id int, total decimal(10,2), qty int",
    )
    spec = TableSpec.select(lambda r: [r.id, r.total, r.qty])
    out = apply_spec(df, spec)
    assert dict(out.dtypes) == {"id": "int", "total": "decimal(10,2)", "qty": "int"}
    row = out.collect()[0]
    assert row.total == Decimal("299.99")
    assert row.qty == 42


def test_transform_skips_null_not_empty_for_user_fns(spark):
    """mapString applies user fns to empty strings (only null skips) —
    reference semantics: null-guard lives in the Anonymizer, not the
    plumbing (src/OutputColumn.scala:33-34)."""
    df = spark.createDataFrame([("",), (None,), ("x",)], "s string")
    marker = lambda v: f"<{v}>"  # noqa: E731
    spec = TableSpec.select(lambda r: [r.s.map_string(marker)])
    got = sorted(
        (r.s for r in apply_spec(df, spec).collect()),
        key=lambda v: (v is None, v or ""),
    )
    assert got == ["<>", "<x>", None]


def test_register_all_sql_functions(spark):
    A.register_all(spark)
    row = spark.sql(
        "SELECT anon_full_name('Bob') AS n, anon_zip_code('Bob') AS z, "
        "anon_redact('secret') AS r, anon_email(NULL) AS e"
    ).collect()[0]
    assert row.n == P.full_name("Bob")
    assert row.z == P.zip_code("Bob")
    assert row.r == "******"
    assert row.e is None
