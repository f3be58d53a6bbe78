"""Avro Object Container File conformance (sources/avro.py): typed
round trips through the from-scratch stdlib codec, fixture-table parity
against Parquet in both directions, the untrusted-bytes ValueError
contract, and the one-pandas-stage plan shape for source and sink."""

import io
import os

import pytest

from simple_anonymizer_spark.sources import avro as A

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TYPED_SCHEMA = {
    "type": "record", "name": "r", "fields": [
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "i", "type": ["null", "int"]},
        {"name": "l", "type": "long"},
        {"name": "f", "type": ["null", "float"]},
        {"name": "d", "type": "double"},
        {"name": "by", "type": ["null", "bytes"]},
        {"name": "s", "type": ["null", "string"]},
    ],
}

TYPED_ROWS = [
    (True, -5, 2 ** 40, 1.5, -0.25, b"\x00\xff", "héllo 世界"),
    (None, None, -1, None, 3.140625, None, None),
    (False, 0, 0, -2.0, 0.0, b"", ""),
    (True, 2 ** 31 - 1, -2 ** 62, 0.5, 1e300, bytes(range(256)), "x" * 999),
]


def _container(codec="deflate", rows_per_block=2):
    buf = io.BytesIO()
    A.write_container(buf, TYPED_SCHEMA, iter(TYPED_ROWS), codec=codec,
                      rows_per_block=rows_per_block)
    return buf.getvalue()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_typed_roundtrip_all_primitives(codec):
    data = _container(codec=codec)
    schema, rows = A.read_container(data)
    assert schema == TYPED_SCHEMA
    assert rows == TYPED_ROWS


def test_write_is_deterministic_and_blocked():
    # content-derived sync marker -> byte-identical rewrites
    assert _container() == _container()
    # rows_per_block=2 over 4 rows -> 2 blocks, both decoded
    assert len(A.read_container(_container(rows_per_block=2))[1]) == 4


def test_null_in_non_nullable_field_raises():
    bad = [(None, None, None, None, 0.0, None, None)]  # l is non-null
    with pytest.raises(ValueError):
        A.write_container(io.BytesIO(), TYPED_SCHEMA, iter(bad))


def test_malformed_container_raises_valueerror():
    good = _container()
    for bad in (b"", b"Obj\x02" + good[4:], good[:10], good[:40],
                good[:-5], good[:-20] + b"\x00" * 20):
        with pytest.raises(ValueError):
            A.read_container(bad)
    # unsupported schema shapes
    for sch in ({"type": "array"}, {"type": "record", "fields": []},
                {"type": "record", "fields": [
                    {"name": "m", "type": {"type": "map"}}]}):
        with pytest.raises(ValueError):
            A._parse_fields(sch)
    # fuzz: truncations and byte flips either parse or raise ValueError
    import numpy as np
    rng = np.random.RandomState(11)
    for trial in range(200):
        buf = bytearray(good)
        if trial % 3 == 0:
            buf = buf[: rng.randint(2, len(buf))]
        else:
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            A.read_container(bytes(buf))
        except ValueError:
            pass  # the one allowed failure mode


@pytest.mark.parametrize("name", ["region", "nation", "customer",
                                  "documents"])
def test_fixture_roundtrip_matches_parquet(spark, tmp_path, name):
    src = spark.read.parquet(f"{SF_DIR}/{name}.parquet")
    out = str(tmp_path / name)
    assert A.write_avro(src.repartition(3), out) == src.count()
    back = A.read_avro(spark, out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple,
                                                            src.collect()))


def test_empty_partitions_write_no_files(spark, tmp_path):
    df = spark.range(2).repartition(8)
    out = str(tmp_path / "sparse")
    assert A.write_avro(df, out) == 2
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert 1 <= len(files) <= 2  # 6+ empty partitions skipped
    assert A.read_avro(spark, out).count() == 2


def test_read_avro_rejects_schema_drift(spark, tmp_path):
    out = str(tmp_path / "drift")
    A.write_avro(spark.range(3).selectExpr("id AS a"), out)
    A.write_avro(spark.range(3).selectExpr("id AS b"), out)
    with pytest.raises(Exception, match="schema drift"):
        A.read_avro(spark, out).collect()


def test_avro_plan_shape_one_pandas_stage(spark, tmp_path):
    out = str(tmp_path / "plan")
    A.write_avro(spark.range(10).selectExpr("id", "id * 2 AS v"), out)
    df = A.read_avro(spark, out)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "BatchEvalPython" not in plan


def test_pyavro_datasource_roundtrip(spark, tmp_path):
    from simple_anonymizer_spark.sources.avro import AvroDataSource

    spark.dataSource.register(AvroDataSource)
    src = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    out = str(tmp_path / "ds")
    src.write.format("pyavro").mode("append").save(out)
    back = spark.read.format("pyavro").load(out)
    assert [f.name for f in back.schema.fields] == src.columns
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple,
                                                            src.collect()))
    # overwrite replaces prior part files instead of accumulating
    src.limit(5).write.format("pyavro").mode("overwrite").save(out)
    assert spark.read.format("pyavro").load(out).count() == 5
    # cross-path interop: files written by write_avro read via the
    # data source, and vice versa
    assert sorted(
        map(tuple, A.read_avro(spark, out).collect())
    ) == sorted(map(tuple, spark.read.format("pyavro").load(out).collect()))


# -- property: arbitrary typed rows round-trip exactly -----------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_noneable = lambda s: st.one_of(st.none(), s)  # noqa: E731

_ROW = st.tuples(
    _noneable(st.booleans()),
    _noneable(st.integers(min_value=-2 ** 31, max_value=2 ** 31 - 1)),
    st.integers(min_value=-2 ** 63, max_value=2 ** 63 - 1),
    _noneable(st.floats(width=32, allow_nan=False)),
    st.floats(allow_nan=False),
    _noneable(st.binary(max_size=200)),
    _noneable(st.text(max_size=200)),
)


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(_ROW, max_size=40),
       codec=st.sampled_from(["null", "deflate"]),
       block=st.integers(min_value=1, max_value=7))
def test_property_container_roundtrip(rows, codec, block):
    buf = io.BytesIO()
    try:
        n = A.write_container(buf, TYPED_SCHEMA, iter(rows), codec=codec,
                              rows_per_block=block)
    except ValueError:
        # only the documented refusal: null in the non-nullable field
        assert any(r[2] is None for r in rows)
        return
    assert n == len(rows)
    schema, got = A.read_container(buf.getvalue())
    assert schema == TYPED_SCHEMA
    assert got == rows


# -- recursive composite types -----------------------------------------------

NESTED_SCHEMA = {
    "type": "record", "name": "n", "fields": [
        {"name": "id", "type": "long"},
        {"name": "vec", "type": {"type": "array", "items": "float"}},
        {"name": "tags", "type": ["null", {"type": "array",
                                           "items": ["null", "string"]}]},
        {"name": "props", "type": {"type": "map",
                                   "values": ["null", "double"]}},
        {"name": "inner", "type": ["null", {
            "type": "record", "name": "pt", "fields": [
                {"name": "x", "type": "long"},
                {"name": "y", "type": ["null", "string"]},
            ]}]},
        {"name": "grid", "type": {"type": "array", "items": {
            "type": "array", "items": "long"}}},
    ],
}

NESTED_ROWS = [
    (1, [0.5, -1.25], ["a", None, "b"], {"p": 1.5, "q": None},
     {"x": 7, "y": "hi"}, [[1, 2], [], [3]]),
    (2, [], None, {}, None, []),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_nested_types_roundtrip(codec):
    buf = io.BytesIO()
    A.write_container(buf, NESTED_SCHEMA, iter(NESTED_ROWS), codec=codec)
    schema, rows = A.read_container(buf.getvalue())
    assert schema == NESTED_SCHEMA
    assert rows == NESTED_ROWS


def test_nested_null_in_non_nullable_raises():
    bad = [(1, None, None, {}, None, [])]  # vec is non-nullable
    with pytest.raises(ValueError, match="vec"):
        A.write_container(io.BytesIO(), NESTED_SCHEMA, iter(bad))
    bad2 = [(1, [0.5], None, {}, {"x": None, "y": None}, [])]  # inner.x
    with pytest.raises(ValueError, match="inner.x"):
        A.write_container(io.BytesIO(), NESTED_SCHEMA, iter(bad2))


def test_size_prefixed_array_blocks_decode():
    # spec: a NEGATIVE item count means |count| items preceded by a
    # byte-size long — writers here never emit it, readers must accept
    items = A._zigzag_encode(5) + A._zigzag_encode(6)
    buf = (A._zigzag_encode(-2) + A._zigzag_encode(len(items)) + items
           + A._zigzag_encode(0))
    got, pos = A._dec(("array", ("prim", "long")), buf, 0)
    assert got == [5, 6] and pos == len(buf)


def test_spark_schema_mapping_roundtrip(spark):
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sch = A.avro_schema_for(src)
    assert A.spark_struct_for(sch) == src.schema


def test_decimal_logical_type_roundtrip():
    """Avro decimal logical type (bytes, minimal two's-complement
    big-endian unscaled): Decimal in -> Decimal out at the schema's
    scale, nullable, spec golden byte form (14.20 -> 05 8C), and a
    literal with too many fractional digits is refused."""
    import decimal
    D = decimal.Decimal

    dec_t = {"type": "bytes", "logicalType": "decimal",
             "precision": 12, "scale": 2}
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "price", "type": ["null", dec_t]},
    ]}
    rows = [(1, D("14.20")), (2, None), (3, D("-0.05")),
            (4, D("99999999.99")), (5, D("0.00"))]
    buf = io.BytesIO()
    A.write_container(buf, schema, iter(rows))
    _, got = A.read_container(buf.getvalue())
    assert got == rows
    assert A.min_twos_complement(1420) == b"\x05\x8c"
    assert A.min_twos_complement(0) == b"\x00"
    assert A.min_twos_complement(-1) == b"\xff"
    assert A.min_twos_complement(128) == b"\x00\x80"
    assert A.min_twos_complement(-129) == b"\xff\x7f"
    with pytest.raises(ValueError, match="scale"):
        A.write_container(io.BytesIO(), schema, iter([(9, D("1.005"))]))


def test_decimal_logical_type_full_38_digit_width():
    """Wide decimals (>28 significant digits) must round-trip exactly —
    the default decimal context rounds at 28 digits and used to corrupt
    them silently."""
    import decimal
    D = decimal.Decimal

    dec_t = {"type": "bytes", "logicalType": "decimal",
             "precision": 38, "scale": 2}
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": dec_t}]}
    vals = [D("111111111111111111111111111111111111.55"),
            D("-999999999999999999999999999999999999.99"),
            D("0.01")]
    buf = io.BytesIO()
    A.write_container(buf, schema, iter([(v,) for v in vals]))
    _, got = A.read_container(buf.getvalue())
    assert [r[0] for r in got] == vals


def test_min_twos_complement_properties():
    """Property: min_twos_complement is the SHORTEST signed big-endian
    form and inverts exactly through int.from_bytes — across the full
    int64 range and the 38-digit unscaled range."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(10 ** 38) + 1, max_value=10 ** 38 - 1))
    def check(u):
        b = A.min_twos_complement(u)
        assert int.from_bytes(b, "big", signed=True) == u
        if len(b) > 1:  # shortest: dropping the top byte changes value
            assert int.from_bytes(b[1:], "big", signed=True) != u

    check()
