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
        "anon_redact('secret') AS r, anon_email(NULL) AS e, "
        "anon_partial_redact('confidential', 3, 2) AS p, "
        "anon_stable_hash('Bob') AS h"
    ).collect()[0]
    assert row.n == P.full_name("Bob")
    assert row.z == P.zip_code("Bob")
    assert row.r == "******"
    assert row.e is None
    assert row.p == P.partial_redact("confidential", 3, 2)
    assert row.h == P.stable_hash("Bob")


def test_sql_registration_matches_native_columns(spark, sf_dir):
    """Every SQL-registered anonymizer must produce the exact values of its
    native Column builder over real data plus edge inputs — the three
    renderers (Column / Spark SQL / DuckDB) share the frozen lists but are
    independent implementations."""
    from pyspark.sql import functions as F

    A.register_all(spark)
    edge = spark.createDataFrame(
        [("",), (None,), ("Ünïcode ' quote",), ("x",)], "c_name string"
    )
    base = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_name")
    df = base.union(edge)
    df.createOrReplaceTempView("__reg_parity")

    exprs_sql = ", ".join(f"anon_{n}(c_name) AS {n}" for n in A.ANONYMIZERS)
    via_sql = spark.sql(f"SELECT {exprs_sql} FROM __reg_parity").collect()
    via_df = df.select(
        *[fn(F.col("c_name")).alias(n) for n, fn in A.ANONYMIZERS.items()]
    ).collect()
    key = lambda rows: sorted(map(str, rows))
    assert key(via_sql) == key(via_df)


def test_sql_registration_stays_native_plan(spark):
    """The round-1 pitfall: SQL users silently getting a Python UDF. The
    registered functions must inline to native expressions — no
    BatchEvalPython / ArrowEvalPython anywhere in the plan."""
    A.register_all(spark)
    df = spark.createDataFrame([("Bob",)], "c_name string")
    df.createOrReplaceTempView("__reg_plan")
    q = spark.sql(
        "SELECT anon_email(c_name) AS e, anon_lorem_text(c_name) AS l, "
        "anon_phone_number(c_name) AS p FROM __reg_plan"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan
