"""Spec-DSL → IR mapping and compiler tests.

Ports ``tests/TableSpecTest.scala`` (DSL→IR, null-skip semantics,
validate_covers) plus end-to-end apply_spec checks on real DataFrames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_anonymizer_spark.functions import lens as L
from simple_anonymizer_spark.functions import pyimpl as P
from simple_anonymizer_spark.plans import (FixedColumn, SourceColumn,
                                           TableSpec, TransformedColumn,
                                           apply_spec)


# ---------- DSL → IR (TableSpecTest.scala:8-50) ----------

def test_row_attr_is_source_column():
    spec = TableSpec.select(lambda row: [row.id, row.name])
    assert spec.columns == (SourceColumn("id"), SourceColumn("name"))


def test_nulled_and_set_to_are_fixed():
    spec = TableSpec.select(lambda row: [row.a.nulled, row.b.set_to(7)])
    assert spec.columns == (FixedColumn("a", None), FixedColumn("b", 7))


def test_map_string_is_transformed_direct():
    spec = TableSpec.select(lambda row: [row.name.map_string("full_name")])
    col = spec.columns[0]
    assert isinstance(col, TransformedColumn)
    assert col.lens == L.Direct()
    assert not col.opt


def test_map_json_array_builds_lens():
    spec = TableSpec.select(
        lambda row: [row.phones.map_json_array(lambda o: o.number.map_string("phone_number"))]
    )
    col = spec.columns[0]
    assert col.lens == L.ArrayElements(L.Field("number", L.Direct()))
    assert col.transform == "phone_number"


def test_where_chaining_ands():
    spec = TableSpec.select(lambda r: [r.id]).where("id > 1").where("id < 9")
    assert spec.where_clause.fragments == ("id > 1", "id < 9")
    assert spec.where_clause.render() == "(id > 1) AND (id < 9)"


def test_validate_covers():
    # TableSpecTest.scala:91-121
    spec = TableSpec.select(lambda r: [r.a, r.b])
    assert spec.validate_covers(["a", "b", "c", "d"]) == ["c", "d"]
    assert spec.validate_covers(["a", "b"]) == []


# ---------- compiler behavior on real DataFrames ----------

def test_apply_spec_projection_and_filter(spark):
    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, None)], "id int, name string"
    )
    spec = TableSpec.select(lambda r: [r.id, r.name.map_string("redact")]).where("id >= 2")
    rows = apply_spec(df, spec).orderBy("id").collect()
    assert [(r.id, r.name) for r in rows] == [(2, "***"), (3, None)]


def test_apply_spec_limit_orders_by_id_desc(spark):
    # CopyAction.scala:78-83 — ORDER BY id DESC only when spec has an id col.
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    spec = TableSpec.select(lambda r: [r.id]).with_limit(3)
    got = sorted(r.id for r in apply_spec(df, spec).collect())
    assert got == [7, 8, 9]


def test_apply_spec_limit_without_id(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    spec = TableSpec.select(lambda r: [r.v]).with_limit(3)
    assert apply_spec(df, spec).count() == 3


def test_fixed_null_keeps_source_type(spark):
    df = spark.createDataFrame([(1, 2.5)], "id int, total double")
    spec = TableSpec.select(lambda r: [r.id, r.total.nulled])
    out = apply_spec(df, spec)
    assert dict(out.dtypes)["total"] == "double"
    assert out.collect()[0].total is None


def test_custom_callable_transform(spark):
    df = spark.createDataFrame([("a",), (None,)], "s string")
    spec = TableSpec.select(lambda r: [r.s.map_string(str.upper)])
    got = [r.s for r in apply_spec(df, spec).collect()]
    assert sorted(got, key=lambda x: (x is None, x)) == ["A", None]


def test_map_opt_string_sees_nulls(spark):
    # TableSpecTest.scala:52-82 — mapOptString receives None; mapString skips.
    df = spark.createDataFrame([("x",), (None,)], "s string")
    fill = lambda v: v if v is not None else "FILLED"  # noqa: E731
    spec = TableSpec.select(lambda r: [r.s.map_opt_string(fill)])
    got = {r.s for r in apply_spec(df, spec).collect()}
    assert got == {"x", "FILLED"}


def test_json_lens_end_to_end(spark):
    df = spark.createDataFrame(
        [('[{"type":"mobile","number":"555-111"},{"type":"home","number":"555-222"}]',)],
        "phones string",
    )
    spec = TableSpec.select(
        lambda r: [r.phones.map_json_array(lambda o: o.number.map_string("phone_number"))]
    )
    out = apply_spec(df, spec).collect()[0].phones
    import json as j
    parsed = j.loads(out)
    assert [p["type"] for p in parsed] == ["mobile", "home"]
    assert parsed[0]["number"] == P.phone_number("555-111")
    assert parsed[1]["number"] == P.phone_number("555-222")


def test_native_path_has_no_python_eval(spark):
    """Builtin anonymizers through Direct lens must stay JVM-side."""
    df = spark.createDataFrame([("bob",)], "name string")
    spec = TableSpec.select(lambda r: [r.name.map_string("email")])
    plan = apply_spec(df, spec)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
