"""Lens goldens — ports of the reference ``tests/LensTest.scala`` plus
Spark-compile checks for both the pandas and native paths."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from simple_anonymizer_spark.functions import lens as L


def upper(s: str) -> str:
    return s.upper()


# ---------- pure interpreter goldens (LensTest.scala ports) ----------

def test_direct_applies_plainly():
    assert L.Direct().modify(upper)("hello") == "HELLO"


def test_field_transforms_target_preserves_others():
    lens = L.Field("name")
    out = lens.modify(upper)('{"name":"bob","age":42}')
    assert out == '{"name":"BOB","age":42}'


def test_nested_field():
    # LensTest.scala:31-36 — Field("address", Field("city"))
    lens = L.Field("address", L.Field("city"))
    out = lens.modify(upper)('{"address":{"city":"springfield","zip":"12345"},"id":1}')
    assert out == '{"address":{"city":"SPRINGFIELD","zip":"12345"},"id":1}'


def test_parse_failure_passthrough():
    # LensTest.scala:38-43
    lens = L.Field("name")
    assert lens.modify(upper)("not json {") == "not json {"


def test_missing_field_passthrough():
    lens = L.Field("nope")
    assert lens.modify(upper)('{"name":"bob"}') == '{"name":"bob"}'


def test_wrong_shape_passthrough():
    assert L.Field("x").modify(upper)('[1,2]') == "[1,2]"
    assert L.ArrayElements(L.Direct()).modify(upper)('{"a":1}') == '{"a":1}'


def test_array_of_objects_field_golden():
    # LensTest.scala:54-60 — map a field across array elements.
    lens = L.ArrayElements(L.Field("number"))
    src = '[{"type":"mobile","number":"abc"},{"type":"home","number":"xyz"}]'
    assert lens.modify(upper)(src) == '[{"type":"mobile","number":"ABC"},{"type":"home","number":"XYZ"}]'


def test_direct_nested_non_string_passthrough():
    lens = L.ArrayElements(L.Direct())
    assert lens.modify(upper)("[1,2,3]") == "[1,2,3]"
    assert lens.modify(upper)('["a","b"]') == '["A","B"]'


def test_unicode_not_escaped():
    lens = L.Field("name")
    assert lens.modify(upper)('{"name":"ünïcode"}') == '{"name":"ÜNÏCODE"}'


# ---------- Spark compile paths ----------

def test_compile_pandas(spark):
    lens = L.ArrayElements(L.Field("number"))
    fn = L.compile_pandas(lens, upper)
    df = spark.createDataFrame(
        [('[{"type":"mobile","number":"abc"}]',), (None,), ("bad json",)],
        "phones string",
    )
    got = [r.out for r in df.select(fn(F.col("phones")).alias("out")).collect()]
    assert got == ['[{"type":"mobile","number":"ABC"}]', None, "bad json"]


def test_compile_native_field(spark):
    schema = StructType([
        StructField("name", StringType()),
        StructField("age", IntegerType()),
    ])
    fn = L.compile_native(L.Field("name"), lambda c: F.upper(c), schema)
    df = spark.createDataFrame([('{"name":"bob","age":42}',), (None,)], "j string")
    got = [r.out for r in df.select(fn(F.col("j")).alias("out")).collect()]
    assert got[0] == '{"name":"BOB","age":42}'
    assert got[1] is None


def test_compile_native_array(spark):
    schema = ArrayType(StructType([
        StructField("type", StringType()),
        StructField("number", StringType()),
    ]))
    lens = L.ArrayElements(L.Field("number"))
    fn = L.compile_native(lens, lambda c: F.upper(c), schema)
    df = spark.createDataFrame(
        [('[{"type":"mobile","number":"abc"},{"type":"home","number":"xyz"}]',)],
        "j string",
    )
    got = df.select(fn(F.col("j")).alias("out")).collect()[0].out
    assert got == '[{"type":"mobile","number":"ABC"},{"type":"home","number":"XYZ"}]'
