"""Avro Object Container File source/sink, from scratch on the stdlib
(public Apache Avro 1.11 spec): the row-oriented interchange format next
to Parquet/ORC, for pipelines whose landing zone is Avro (Kafka-lineage
shops). Spark's own Avro support is an EXTERNAL jar this environment
cannot fetch (no network, pip forbidden) — the same constraint that
produced the pure-Python Delta log (``sources/deltalog.py``) — so the
container format is implemented directly: zigzag-varint primitives,
deflate (raw RFC 1951 via zlib) and null codecs, sync-marker-delimited
blocks, and the JSON schema header.

Scope (documented subset, ValueError otherwise): records over the full
recursive composite algebra — primitives ``boolean, int, long, float,
double, bytes, string``, plus ``array``, ``map`` (string keys, per the
spec), nested ``record``, and nullability anywhere via the idiomatic
``["null", T]`` union. That covers every fixture table including
``embeddings`` (``array<float>``) and arbitrary struct/map payload
columns, and the ``decimal`` logical type over ``bytes`` (the Avro
spec's minimal two's-complement big-endian unscaled encoding —
``decimal.Decimal`` in, ``decimal.Decimal`` out; Iceberg manifests use
it for decimal partition values). Not implemented (nothing here
produces them): ``enum``, ``fixed``, non-null multi-branch unions,
other logical-type annotations (read as their underlying primitive).

Distribution (100 TB): the sink writes ONE container file per Spark
partition from inside a ``mapInPandas`` stage (executor-side IO, the
``foreachPartition`` sink shape — no driver collect), so a big table
becomes many part files exactly like the Parquet sink. The source
parallelizes per part file (one task per file), which is how Spark's
own Avro reader schedules small-file layouts; sync markers would allow
intra-file splits for jumbo files, not needed for copier-written parts.
Per-value decode is pure Python — the honest cost of a from-scratch
codec (the jpeg.py tradeoff): conformance and driver-verifiability
first, with the native Parquet path remaining the performance format.
"""

from __future__ import annotations

import decimal
import hashlib
import io
import json
import os
import struct
import uuid
import zlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"Obj\x01"

_PRIMITIVES = {"boolean", "int", "long", "float", "double", "bytes", "string"}

_SPARK_TO_AVRO = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "binary": "bytes",
    "string": "string",
}

# -- primitive codec ---------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    z, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (z >> 1) ^ -(z & 1), pos


def _encode_value(atype: str, v) -> bytes:
    if atype == "boolean":
        return b"\x01" if v else b"\x00"
    if atype in ("int", "long"):
        return _zigzag_encode(int(v))
    if atype == "float":
        return struct.pack("<f", float(v))
    if atype == "double":
        return struct.pack("<d", float(v))
    if atype == "bytes":
        b = bytes(v)
        return _zigzag_encode(len(b)) + b
    if atype == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    raise ValueError(f"unsupported avro type {atype!r}")


def _decode_value(atype: str, buf: bytes, pos: int):
    if atype == "boolean":
        if pos >= len(buf):
            raise ValueError("truncated boolean")
        return buf[pos] != 0, pos + 1
    if atype in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if atype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if atype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if atype in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("bad length prefix")
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if atype == "string" else raw), pos + n
    raise ValueError(f"unsupported avro type {atype!r}")


# -- schema ------------------------------------------------------------------
#
# Normalized type nodes (the recursive algebra the codec walks):
#   ("prim", name) | ("opt", inner) | ("array", item) | ("map", value)
#   | ("record", [(field_name, node), ...]) | ("dec", precision, scale)


#: Working precision for decimal logical-type arithmetic — must exceed
#: the 38 digits Spark/Iceberg decimals carry (Python's DEFAULT context
#: rounds at 28 significant digits).
_DEC_PREC = 50


def min_twos_complement(u: int) -> bytes:
    """The MINIMAL two's-complement big-endian byte form of a signed
    integer — the Avro decimal value encoding (and, identically, the
    Iceberg spec's Appendix B/D byte form for decimal unscaled values:
    ``decimal(14.20)`` -> ``05 8C``)."""
    n = (max(1, (u.bit_length() + 8) // 8) if u >= 0
         else max(1, ((-u - 1).bit_length() + 8) // 8))
    return u.to_bytes(n, "big", signed=True)


def _norm_type(t):
    if isinstance(t, list):
        if len(t) == 2 and "null" in t:
            inner = t[0] if t[1] == "null" else t[1]
            if inner == "null":
                raise ValueError("union of null with null")
            return ("opt", _norm_type(inner))
        raise ValueError(f"unsupported union {t!r}")
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return ("prim", t)
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(t, dict):
        tt = t.get("type")
        if tt == "bytes" and t.get("logicalType") == "decimal":
            p, s = int(t["precision"]), int(t.get("scale", 0))
            if p < 1 or s < 0 or s > p:
                raise ValueError(f"bad decimal logical type {t!r}")
            return ("dec", p, s)
        if tt == "array" and "items" in t:
            return ("array", _norm_type(t["items"]))
        if tt == "map" and "values" in t:
            return ("map", _norm_type(t["values"]))
        if tt == "record":
            # nested records may be EMPTY (zero fields encode zero
            # bytes — Avro allows it, and Iceberg's unpartitioned
            # manifest ``partition`` struct is exactly that)
            return ("record", _parse_fields(t, allow_empty=True))
        if isinstance(tt, str) and tt in _PRIMITIVES:
            return ("prim", tt)  # {"type": "string", ...logicalType} form
    raise ValueError(f"unsupported avro type {t!r}")


def _parse_fields(
    schema: dict, allow_empty: bool = False
) -> list[tuple[str, tuple]]:
    """-> [(name, normalized_node)] from a record schema, ValueError on
    anything outside the documented subset. Top-level records must have
    fields (a rowless row type is a malformed container); nested ones
    may be empty."""
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    raw = schema.get("fields", [])
    if not isinstance(raw, list):
        raise ValueError("record fields must be a list")
    fields = []
    for f in raw:
        if not isinstance(f, dict) or "name" not in f or "type" not in f:
            raise ValueError("malformed record field")
        fields.append((f["name"], _norm_type(f["type"])))
    if not fields and not allow_empty:
        raise ValueError("record schema has no fields")
    return fields


def _avro_type_of(dt) -> object:
    """Spark DataType -> avro schema fragment (recursive)."""
    from pyspark.sql import types as T

    name = dt.typeName()
    if name in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[name]
    if isinstance(dt, T.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.ArrayType):
        item = _avro_type_of(dt.elementType)
        if dt.containsNull:
            item = ["null", item]
        return {"type": "array", "items": item}
    if isinstance(dt, T.MapType):
        if dt.keyType.typeName() != "string":
            raise ValueError("avro maps require string keys")
        val = _avro_type_of(dt.valueType)
        if dt.valueContainsNull:
            val = ["null", val]
        return {"type": "map", "values": val}
    if isinstance(dt, T.StructType):
        return {"type": "record", "name": f"rec{abs(hash(dt)) % 10**6}",
                "fields": [
                    {"name": f.name,
                     "type": (["null", _avro_type_of(f.dataType)]
                              if f.nullable else _avro_type_of(f.dataType))}
                    for f in dt.fields
                ]}
    raise ValueError(f"no avro mapping for spark type {name}")


def avro_schema_for(df: DataFrame, name: str = "row") -> dict:
    """Derive the container schema from a Spark DataFrame (recursive
    over arrays/maps/structs — the documented subset)."""
    fields = []
    for f in df.schema.fields:
        a = _avro_type_of(f.dataType)
        fields.append({"name": f.name,
                       "type": ["null", a] if f.nullable else a})
    return {"type": "record", "name": name, "fields": fields}


def _spark_type_of(node):
    """Normalized node -> (Spark DataType, nullable)."""
    from pyspark.sql import types as T

    _SPARK_T = {
        "boolean": T.BooleanType, "int": T.IntegerType, "long": T.LongType,
        "float": T.FloatType, "double": T.DoubleType,
        "bytes": T.BinaryType, "string": T.StringType,
    }
    if node[0] == "opt":
        inner, _ = _spark_type_of(node[1])
        return inner, True
    if node[0] == "prim":
        return _SPARK_T[node[1]](), False
    if node[0] == "dec":
        return T.DecimalType(node[1], node[2]), False
    if node[0] == "array":
        item, item_null = _spark_type_of(node[1])
        return T.ArrayType(item, item_null), False
    if node[0] == "map":
        val, val_null = _spark_type_of(node[1])
        return T.MapType(T.StringType(), val, val_null), False
    if node[0] == "record":
        return T.StructType([
            T.StructField(n, *_spark_type_of(sub)) for n, sub in node[1]
        ]), False
    raise ValueError(f"bad node {node!r}")


def spark_struct_for(schema: dict):
    """Avro record schema -> Spark StructType (recursive)."""
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField(name, *_spark_type_of(node))
        for name, node in _parse_fields(schema)
    ])


# -- recursive value codec ---------------------------------------------------


def _enc(node, v, out: list, where: str) -> None:
    kind = node[0]
    if kind == "opt":
        if v is None or (isinstance(v, float) and v != v
                         and node[1] != ("prim", "float")
                         and node[1] != ("prim", "double")):
            out.append(b"\x00")  # zigzag(0): the null branch
            return
        out.append(b"\x02")  # zigzag(1)
        _enc(node[1], v, out, where)
        return
    if v is None:
        raise ValueError(f"null in non-nullable field {where!r}")
    if kind == "prim":
        if (isinstance(v, float) and v != v
                and node[1] not in ("float", "double")):
            raise ValueError(f"null (NaN) in non-nullable field {where!r}")
        out.append(_encode_value(node[1], v))
        return
    if kind == "dec":
        _p, s = node[1], node[2]
        d = v if isinstance(v, decimal.Decimal) else decimal.Decimal(v)
        # prec must exceed 38: the DEFAULT context rounds at 28
        # significant digits, silently corrupting wide decimals
        ctx = decimal.Context(prec=_DEC_PREC, traps=[decimal.Inexact])
        try:
            u = int(d.scaleb(s, context=ctx).to_integral_exact(
                context=ctx))
        except decimal.Inexact:
            raise ValueError(
                f"decimal value {v} does not fit scale {s} in {where!r}")
        out.append(_encode_value("bytes", min_twos_complement(u)))
        return
    if kind == "array":
        items = list(v)
        if items:
            out.append(_zigzag_encode(len(items)))
            for i, x in enumerate(items):
                _enc(node[1], x, out, f"{where}[{i}]")
        out.append(b"\x00")
        return
    if kind == "map":
        entries = sorted(v.items())  # deterministic writes (house rule)
        if entries:
            out.append(_zigzag_encode(len(entries)))
            for k, x in entries:
                out.append(_encode_value("string", k))
                _enc(node[1], x, out, f"{where}.{k}")
        out.append(b"\x00")
        return
    if kind == "record":
        for name, sub in node[1]:
            if isinstance(v, dict):
                x = v.get(name)
            elif hasattr(v, "__fields__"):  # pyspark Row
                x = v[name]
            else:
                raise ValueError(f"record value for {where!r} must be a "
                                 "dict or Row")
            _enc(sub, x, out, f"{where}.{name}")
        return
    raise ValueError(f"bad node {node!r}")


def _dec(node, buf: bytes, pos: int):
    kind = node[0]
    if kind == "opt":
        idx, pos = _zigzag_decode(buf, pos)
        if idx == 0:
            return None, pos
        if idx != 1:
            raise ValueError("bad union index")
        return _dec(node[1], buf, pos)
    if kind == "prim":
        return _decode_value(node[1], buf, pos)
    if kind == "dec":
        b, pos = _decode_value("bytes", buf, pos)
        u = int.from_bytes(b, "big", signed=True)
        return decimal.Decimal(u).scaleb(
            -node[2], context=decimal.Context(prec=_DEC_PREC)), pos
    if kind in ("array", "map"):
        out = [] if kind == "array" else {}
        while True:
            count, pos = _zigzag_decode(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:  # size-prefixed block form (spec)
                count = -count
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(count):
                if kind == "map":
                    k, pos = _decode_value("string", buf, pos)
                    v, pos = _dec(node[1], buf, pos)
                    out[k] = v
                else:
                    v, pos = _dec(node[1], buf, pos)
                    out.append(v)
    if kind == "record":
        rec = {}
        for name, sub in node[1]:
            rec[name], pos = _dec(sub, buf, pos)
        return rec, pos
    raise ValueError(f"bad node {node!r}")


# -- container write ---------------------------------------------------------


def write_container(
    out: io.BufferedIOBase, schema: dict, rows: Iterator[tuple],
    codec: str = "deflate", rows_per_block: int = 4096,
) -> int:
    """Stream ``rows`` (tuples in field order) into one OCF; returns the
    row count. The sync marker is content-derived (md5 of the schema
    JSON) so identical writes are byte-identical — the repo's
    determinism house rule."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    fields = _parse_fields(schema)
    schema_json = json.dumps(schema, sort_keys=True)
    sync = hashlib.md5(schema_json.encode()).digest()
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    out.write(MAGIC)
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        out.write(_encode_value("string", k))
        out.write(_encode_value("bytes", v))
    out.write(_zigzag_encode(0))
    out.write(sync)

    total = 0

    def flush(block: list[bytes]) -> None:
        raw = b"".join(block)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = c.compress(raw) + c.flush()
        out.write(_zigzag_encode(len(block)))
        out.write(_zigzag_encode(len(raw)))
        out.write(raw)
        out.write(sync)

    block: list[bytes] = []
    for row in rows:
        parts: list[bytes] = []
        for (name, node), v in zip(fields, row):
            _enc(node, v, parts, name)
        block.append(b"".join(parts))
        total += 1
        if len(block) >= rows_per_block:
            flush(block)
            block = []
    if block:
        flush(block)
    return total


# -- container read ----------------------------------------------------------


def read_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Decode one OCF -> (schema, rows). ValueError on malformed input,
    wrong magic, bad sync markers, or schemas outside the subset — the
    untrusted-bytes contract shared with the media codecs."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:  # size-prefixed block form
            n = -n
            _, pos = _zigzag_decode(data, pos)
        for _ in range(n):
            k, pos = _decode_value("string", data, pos)
            v, pos = _decode_value("bytes", data, pos)
            meta[k] = v
    try:
        schema = json.loads(meta["avro.schema"])
    except (KeyError, ValueError) as exc:
        raise ValueError("missing or invalid avro.schema") from exc
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    fields = _parse_fields(schema)
    sync = data[pos:pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated header sync marker")
    pos += 16

    rows: list[tuple] = []
    while pos < len(data):
        count, pos = _zigzag_decode(data, pos)
        size, pos = _zigzag_decode(data, pos)
        if count < 0 or size < 0 or pos + size > len(data):
            raise ValueError("bad block header")
        raw = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            try:
                raw = zlib.decompressobj(-15).decompress(raw)
            except zlib.error as exc:
                raise ValueError("bad deflate block") from exc
        bpos = 0
        for _ in range(count):
            vals = []
            for _name, node in fields:
                v, bpos = _dec(node, raw, bpos)
                vals.append(v)
            rows.append(tuple(vals))
        if bpos != len(raw):
            raise ValueError("trailing bytes in block")
    return schema, rows


# -- Spark integration -------------------------------------------------------


def write_avro(df: DataFrame, out_dir: str, codec: str = "deflate") -> int:
    """Distributed Avro sink: one container file per partition, written
    executor-side inside a single mapInPandas stage (no driver
    collect); returns the total row count from the per-file manifest
    (bounded: one row per partition)."""
    os.makedirs(out_dir, exist_ok=True)
    schema = avro_schema_for(df)
    fields = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rows() -> Iterator[tuple]:
            for pdf in batches:
                for row in pdf[fields].itertuples(index=False, name=None):
                    yield row  # NaN-as-null is handled inside _enc

        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")
        with open(path, "wb") as fh:
            n = write_container(fh, schema, rows(), codec=codec)
        if n == 0:
            os.unlink(path)  # empty partition: no file
            yield pd.DataFrame({"path": pd.array([], dtype="object"),
                                "n_rows": pd.array([], dtype="Int64")})
        else:
            yield pd.DataFrame({"path": [path], "n_rows": [n]})

    manifest = df.mapInPandas(run, "path string, n_rows long")
    return int(manifest.agg(F.sum("n_rows")).collect()[0][0] or 0)


def read_avro(spark: SparkSession, in_dir: str) -> DataFrame:
    """Distributed Avro source: the driver reads ONE file header for the
    schema, then each part file decodes in its own task (mapInPandas
    over the file list)."""
    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".avro")
    )
    if not files:
        raise ValueError(f"no .avro files under {in_dir}")
    with open(files[0], "rb") as fh:
        head = fh.read()
    schema, _ = read_container(head[:_header_end(head)])
    fields = _parse_fields(schema)
    struct = spark_struct_for(schema)
    _PD_DT = {"boolean": "boolean", "int": "Int32", "long": "Int64",
              "float": "float32", "double": "float64"}

    def _dtype(node):
        prim = node[1][1] if node[0] == "opt" and node[1][0] == "prim" \
            else (node[1] if node[0] == "prim" else None)
        return _PD_DT.get(prim, "object") if prim else "object"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    fschema, rows = read_container(fh.read())
                if fschema != schema:
                    raise ValueError(f"schema drift in {path}")
                cols = {}
                for i, (name, node) in enumerate(fields):
                    vals = [r[i] for r in rows]
                    dt = _dtype(node)
                    cols[name] = pd.array(vals, dtype=dt) \
                        if dt != "object" else pd.Series(vals, dtype="object")
                yield pd.DataFrame(cols)

    paths = spark.createDataFrame([(p,) for p in files], "path string") \
        .repartition(len(files), "path")
    return paths.mapInPandas(run, struct)


def _header_end(data: bytes) -> int:
    """Offset just past the header sync marker (so a schema peek does
    not decode every block)."""
    pos = 4
    while True:
        n, pos = _zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _zigzag_decode(data, pos)
        for _ in range(n):
            _, pos = _decode_value("string", data, pos)
            _, pos = _decode_value("bytes", data, pos)
    return pos + 16


# -- Spark Python Data Source: format("pyavro") ------------------------------
#
# The idiomatic front door — spark.read.format("pyavro").load(dir) /
# df.write.format("pyavro").mode(...).save(dir) — on Spark 4's Python
# Data Source API (the sources/pyds.py pattern): schema inference from
# one file header driver-side, then one input partition per container
# file and one written container per task, all executor-side.

try:  # pragma: no cover - import surface depends on pyspark build
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, DataSourceWriter, InputPartition,
        WriterCommitMessage,
    )
    from pyspark.sql import types as _T

    class _AvroFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class AvroDataSource(DataSource):
        """``format("pyavro")`` — see module docstring. Read options:
        ``path`` (directory of ``.avro`` part files). Write options:
        ``path``, ``codec`` (``deflate`` default | ``null``)."""

        @classmethod
        def name(cls) -> str:
            return "pyavro"

        def _dir(self) -> str:
            path = self.options.get("path")
            if not path:
                raise ValueError("pyavro requires a path (use .load(dir))")
            return path

        def schema(self):
            files = sorted(
                os.path.join(self._dir(), f)
                for f in os.listdir(self._dir()) if f.endswith(".avro")
            )
            if not files:
                raise ValueError(f"no .avro files under {self._dir()}")
            with open(files[0], "rb") as fh:
                head = fh.read()
            schema, _ = read_container(head[:_header_end(head)])
            return spark_struct_for(schema)

        def reader(self, schema) -> "AvroFileReader":
            return AvroFileReader(self._dir())

        def writer(self, schema, overwrite: bool) -> "AvroFileWriter":
            out = self._dir()
            if overwrite and os.path.isdir(out):
                for f in os.listdir(out):
                    if f.endswith(".avro"):
                        os.unlink(os.path.join(out, f))
            os.makedirs(out, exist_ok=True)
            avro_fields = [
                {"name": f.name,
                 "type": (["null", _avro_type_of(f.dataType)]
                          if f.nullable else _avro_type_of(f.dataType))}
                for f in schema.fields
            ]
            return AvroFileWriter(
                out,
                {"type": "record", "name": "row", "fields": avro_fields},
                self.options.get("codec", "deflate"),
            )

    class AvroFileReader(DataSourceReader):
        def __init__(self, in_dir: str):
            self.in_dir = in_dir

        def partitions(self):
            return [
                _AvroFilePartition(os.path.join(self.in_dir, f))
                for f in sorted(os.listdir(self.in_dir))
                if f.endswith(".avro")
            ]

        def read(self, partition: "_AvroFilePartition") -> Iterator[tuple]:
            with open(partition.path, "rb") as fh:
                _, rows = read_container(fh.read())
            return iter(rows)

    class _AvroWriteResult(WriterCommitMessage):
        def __init__(self, n_rows: int):
            self.n_rows = n_rows

    class AvroFileWriter(DataSourceWriter):
        def __init__(self, out_dir: str, schema: dict, codec: str):
            self.out_dir = out_dir
            self.avro_schema = schema
            self.codec = codec

        def write(self, iterator: Iterator) -> "_AvroWriteResult":
            path = os.path.join(self.out_dir,
                                f"part-{uuid.uuid4().hex}.avro")
            with open(path, "wb") as fh:
                n = write_container(
                    fh, self.avro_schema,
                    (tuple(row) for row in iterator), codec=self.codec,
                )
            if n == 0:
                os.unlink(path)
            return _AvroWriteResult(n)

        def commit(self, messages) -> None:
            pass  # files are in place; partition-atomic like the DB sink

        def abort(self, messages) -> None:
            pass

except ImportError:  # pragma: no cover
    AvroDataSource = None  # type: ignore[assignment]
