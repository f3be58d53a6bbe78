"""A minimal, pure-Python Apache Iceberg table format tier — the
metadata-tree analog of ``sources/deltalog.py``, built on the repo's
from-scratch Avro codec (``sources/avro.py``).

Iceberg is a public specification (https://iceberg.apache.org/spec/):
a table is an immutable METADATA TREE — ``metadata/vN.metadata.json``
(schemas, partition specs, snapshot list) -> per-snapshot MANIFEST LIST
(Avro; one row per manifest file, with partition summaries) -> MANIFEST
files (Avro; one row per data file, with partition values and stats) ->
parquet data files. Readers never list directories: the planning walk is
O(metadata), and partition pruning happens on manifest rows BEFORE any
data IO — the property that makes query planning on a 100 TB / million-
file table a driver-side metadata read instead of a filesystem crawl.

Implemented (format-versions 1 and 2, Hadoop-catalog layout with
``version-hint.text``):

* ``create_iceberg`` / ``append_iceberg`` / ``overwrite_iceberg`` —
  snapshot-per-commit writers (append reuses prior manifests untouched —
  O(new files) metadata per commit; overwrite publishes a manifest list
  referencing only the new manifest). Partitioned writes are ONE Spark
  job (``partitionBy`` into staging, partition values recovered from the
  Hive-style directory names), never a per-value scan loop;
* identity partitioning on one column (``partition_by=``): partition
  values recorded on every manifest row per the spec; NULL partition
  values are first-class (Hive default-partition directory -> a null
  manifest partition value);
* per-file column stats: ``lower_bounds`` / ``upper_bounds`` (spec
  field-ids 125/128, field-id-keyed, single-value binary serialization
  per spec Appendix D) harvested from the parquet footers at write time;
* ``read_iceberg`` — snapshot resolution (current / by id / by
  timestamp), manifest-list -> manifest walk through the repo's own Avro
  decoder, file-level identity-partition pruning AND min/max range
  pruning (``predicates=``), then one native parquet scan of exactly the
  surviving files plus the residual row filter;
* ``iceberg_snapshots`` / ``iceberg_live_files`` — the history and
  file-inventory metadata tables; ``iceberg_plan_files`` — the pruned
  planning walk itself, exposed for tests and scale measurement;
* schema evolution (``add_iceberg_column`` — fresh field-id, new
  schema struct, metadata-only commit; old files read back null-filled
  via the explicit-schema scan, old snapshots keep their schema-id) and
  maintenance actions (``expire_iceberg_snapshots``,
  ``remove_iceberg_orphans``, ``rewrite_iceberg_files`` compaction);
* ``iceberg_count`` — metadata-only row count (sum of manifest
  ``record_count``, minus delete-manifest counts on v2), zero data IO;
* format-version 2 row-level deletes: ``delete_iceberg_rows`` commits
  POSITION DELETE parquet files and ``delete_iceberg_keys`` EQUALITY
  DELETE files (``equality_ids`` field-id 135) under delete manifests,
  sequence numbers tracked per the spec; ``read_iceberg`` applies both
  merge-on-read — position deletes as an anti-join on (file path,
  ``_metadata.row_index``), equality deletes as null-safe key anti-joins
  gated by the strict sequence rule (data seq < delete seq) — broadcast
  when the metadata-known delete counts are small. ``upsert_iceberg``
  composes them into the spec's CDC MERGE pattern (delete keys, append).

Manifest Avro schemas carry the spec's ``field-id`` attributes, so the
files are shaped for a real Iceberg runtime; like the Delta tier, what
an external jar runtime would do with them cannot be executed in this
container — the honest claim is round-trip + independent-decoder
verification (tests/test_iceberg.py).

Deliberate scope bounds: delete-file paths manifest-relative like every
other path this tier writes, and upserts as two commits (single-commit
delta writes are a real-runtime feature). Partition specs support
multiple fields and the spec's transforms — identity, ``bucket[N]``
(int/long/string/date/timestamp and decimal(<=18) sources via the
spec's Murmur3 hash; decimal precision > 18 would need an int128
unscaled kernel and stays an explicit refusal), ``truncate[W]``
(int/long/string/decimal(<=18)),
``year``/``month``/``day``/``hour``, and ``void`` (the always-null
transform v1 specs retire fields with; never prunes, by construction) —
with transform-aware inclusive projection pruning at plan time.
Remaining transform scope bounds, all explicit refusals at create time:
``bucket``/``truncate`` on decimal precision > 18 (int128 unscaled
kernel) and ``bucket`` on binary/fixed/uuid sources (types this tier's
schema mapping does not carry as partition sources). Format-version
scope: v1 + v2 complete as documented; **v3 is out of scope this tier**
(deletion vectors, row lineage, binary deletion-vector manifests —
``_FORMAT_VERSIONS`` refuses it at create, the honest
implement-or-refuse decision recorded per round-11 ask #8). An EMPTY-STRING string partition value
collapses to null on write — the Hive directory layout cannot
distinguish them (Spark routes both to the default-partition
directory), the classic Hive-metastore semantics.
"""

from __future__ import annotations

import datetime
import decimal
import glob
import io
import json
import os
import re
import shutil
import struct
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .avro import min_twos_complement, read_container, write_container

_FORMAT_VERSIONS = (1, 2)
_BLOCK_SIZE = 67108864  # deprecated-but-required v1 field

#: Metadata-driven join strategy for applying position deletes: below
#: this many delete rows (known EXACTLY from delete-manifest
#: record_counts, no data IO) the delete set is broadcast; above it the
#: anti-join shuffles both sides.
_DELETE_BROADCAST_ROWS = 10_000_000

#: Metadata-driven planning strategy: above this many live data files
#: (estimated from the manifest list's ``added_data_files_count``
#: sums — no manifest is opened to decide) ``iceberg_plan_files`` /
#: ``read_iceberg`` decode manifests in EXECUTORS instead of the driver
#: loop. Measured (SCALE.md round 10): the driver walk is ~2 s at 100k
#: files and O(files) beyond; the distributed walk is flat ~0.7 s across
#: the decade — the crossover sits safely below this threshold, and
#: below it the driver loop avoids a Spark job entirely.
_DISTRIBUTED_PLAN_FILES = 100_000

#: Write-side twin: above this many just-written data files the
#: commit's footer harvest (record counts + min/max bounds) runs as one
#: Spark job instead of the serial ~3 ms/footer driver loop.
_DISTRIBUTED_STATS_FILES = 2_048

_SPARK_TO_ICE = {
    "long": "long", "integer": "int", "string": "string",
    "double": "double", "float": "float", "boolean": "boolean",
    "binary": "binary", "date": "date", "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}

_ICE_TO_SPARK_TYPE = {
    "long": T.LongType, "int": T.IntegerType, "string": T.StringType,
    "double": T.DoubleType, "float": T.FloatType, "boolean": T.BooleanType,
    "binary": T.BinaryType, "date": T.DateType,
    "timestamptz": T.TimestampType, "timestamp": T.TimestampNTZType,
}

_DECIMAL_RE = re.compile(r"decimal\((\d+),\s*(\d+)\)")

#: Working context for decimal VALUE arithmetic (bounds decode, dirname
#: parse, unscaled extraction): precision must exceed the 38 digits an
#: Iceberg decimal can carry — Python's DEFAULT context silently ROUNDS
#: at 28 significant digits, which would corrupt wide bounds and make
#: _survives_bounds prune files that contain matching rows.
_DEC_CTX = decimal.Context(prec=50)


def _unscaled_to_decimal(u: int, scale: int) -> decimal.Decimal:
    """Exact ``u * 10^-scale`` at full 38-digit width."""
    return decimal.Decimal(u).scaleb(-scale, context=_DEC_CTX)


def _decimal_ps(itype: str) -> tuple[int, int] | None:
    """``"decimal(12,2)"`` -> ``(12, 2)``; None for non-decimal types."""
    m = _DECIMAL_RE.fullmatch(itype)
    return (int(m.group(1)), int(m.group(2))) if m else None


def _ice_type_of(dt) -> str:
    """Spark DataType -> Iceberg type string (decimal keeps P/S —
    ``typeName()`` alone would collapse every decimal to 'decimal')."""
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    t = dt.typeName()
    if t not in _SPARK_TO_ICE:
        raise IcebergError(f"no iceberg mapping for spark type {t!r}")
    return _SPARK_TO_ICE[t]


def _spark_type_for(itype: str):
    """Iceberg type string -> Spark DataType INSTANCE (parameterized
    decimals included)."""
    ps = _decimal_ps(itype)
    if ps:
        return T.DecimalType(*ps)
    if itype not in _ICE_TO_SPARK_TYPE:
        raise IcebergError(f"unknown iceberg type {itype!r}")
    return _ICE_TO_SPARK_TYPE[itype]()

#: Iceberg types whose min/max can be harvested from parquet footers and
#: serialized with the spec's single-value binary form (Appendix D).
#: Decimals qualify too (``_is_bound_type``): their footer stats decode
#: from the RAW physical values (int32/int64/FLBA unscaled) and their
#: Appendix D form is the minimal two's-complement big-endian unscaled
#: bytes — the same byte form the partition transforms hash.
_BOUND_TYPES = {"long", "int", "string", "double", "float", "boolean"}


def _is_bound_type(t: str | None) -> bool:
    return t in _BOUND_TYPES or (t is not None
                                 and _decimal_ps(t) is not None)

#: Identity-partition types representable in the manifest Avro schema.
_PARTITION_AVRO = {"long": "long", "int": "int", "string": "string",
                   "double": "double", "float": "float",
                   "boolean": "boolean"}


def _partition_avro_type(ptype: str):
    """Avro schema fragment for one partition value type — decimals map
    to the Avro decimal logical type (bytes, minimal two's-complement
    big-endian unscaled value; round-tripped as ``decimal.Decimal`` by
    the codec), everything else to its plain primitive."""
    ps = _decimal_ps(ptype)
    if ps:
        return {"type": "bytes", "logicalType": "decimal",
                "precision": ps[0], "scale": ps[1]}
    return _PARTITION_AVRO.get(ptype)

#: Temp column duplicating the partition key for the one-job
#: ``partitionBy`` write: Hive layout drops the partitioned column from
#: file contents, but Iceberg data files must keep every column — so we
#: partition by a throwaway copy and the real column stays in the files.
_PART_TMP = "__sa_ice_part"

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class IcebergError(ValueError):
    """Malformed or inconsistent Iceberg metadata."""


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _ice_schema(df: DataFrame) -> tuple[dict, dict[str, int]]:
    """Spark schema -> Iceberg schema struct + name->field-id map."""
    fields, ids = [], {}
    for i, f in enumerate(df.schema.fields, start=1):
        fields.append({
            "id": i, "name": f.name, "required": not f.nullable,
            "type": _ice_type_of(f.dataType),
        })
        ids[f.name] = i
    return {"type": "struct", "schema-id": 0, "fields": fields}, ids


def _schema_fields(meta: dict) -> list[dict]:
    return meta["schema"]["fields"]


def _schema_for_snapshot(meta: dict, snap: dict) -> dict:
    """The schema struct a snapshot was committed under — spec readers
    resolve a scan's schema by the snapshot's schema-id, so a column
    added LATER is invisible when time-traveling to before the add."""
    sid = snap.get("schema-id", meta["current-schema-id"])
    for s in meta.get("schemas", [meta["schema"]]):
        if s.get("schema-id") == sid:
            return s
    return meta["schema"]


def _spark_struct(schema_struct: dict) -> T.StructType:
    """An Iceberg schema struct as a Spark schema. Reads always pass it
    EXPLICITLY to the parquet scan: files written before an add-column
    lack the new field, and the explicit schema makes Spark fill it with
    null instead of failing schema inference."""
    return T.StructType([
        T.StructField(f["name"], _spark_type_for(f["type"]),
                      not f["required"])
        for f in schema_struct["fields"]])


def _bound_bytes(ice_t: str, v) -> bytes:
    """Single-value binary serialization (spec Appendix D)."""
    if ice_t == "boolean":
        return b"\x01" if v else b"\x00"
    if ice_t == "int":
        return struct.pack("<i", v)
    if ice_t == "long":
        return struct.pack("<q", v)
    if ice_t == "float":
        return struct.pack("<f", v)
    if ice_t == "double":
        return struct.pack("<d", v)
    if ice_t == "string":
        return v.encode("utf-8")
    ps = _decimal_ps(ice_t)
    if ps:
        # Appendix D: unscaled value, minimal two's-complement big-endian
        return min_twos_complement(_decimal_unscaled(v, ps[1]))
    raise IcebergError(f"no single-value serialization for {ice_t!r}")


def _bound_value(ice_t: str, b: bytes):
    if ice_t == "boolean":
        return b != b"\x00"
    if ice_t == "int":
        return struct.unpack("<i", b)[0]
    if ice_t == "long":
        return struct.unpack("<q", b)[0]
    if ice_t == "float":
        return struct.unpack("<f", b)[0]
    if ice_t == "double":
        return struct.unpack("<d", b)[0]
    if ice_t == "string":
        return b.decode("utf-8")
    ps = _decimal_ps(ice_t)
    if ps:
        return _unscaled_to_decimal(
            int.from_bytes(b, "big", signed=True), ps[1])
    raise IcebergError(f"no single-value serialization for {ice_t!r}")


def _kv_bounds_field(name: str, fid: int, key_id: int, val_id: int) -> dict:
    """``map<int, binary>`` per the spec's manifest Avro encoding: an
    array of key/value records with field-ids (Avro maps are
    string-keyed, so Iceberg encodes int-keyed maps this way)."""
    return {"name": name, "field-id": fid, "default": None,
            "type": ["null", {
                "type": "array", "items": {
                    "type": "record", "name": f"k{key_id}_v{val_id}",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": key_id},
                        {"name": "value", "type": "bytes",
                         "field-id": val_id},
                    ]}}]}


def _df_ice_types(df: DataFrame) -> dict[str, str]:
    out = {}
    for f in df.schema.fields:
        try:
            out[f.name] = _ice_type_of(f.dataType)
        except IcebergError:
            # unmapped types pass through by name; the partition-spec
            # validator rejects them with the full context later
            out[f.name] = f.dataType.typeName()
    return out


def _normalize_partition_spec(partition_by, stypes: dict[str, str],
                              ids: dict[str, int],
                              first_field_id: int = 1000) -> list[dict]:
    """User-facing ``partition_by`` -> resolved spec fields. Accepts
    None, a bare column name (identity — the historical form), or a list
    whose entries are a column name or a ``(column, transform)`` pair:
    ``[("o_orderdate", "day"), ("o_custkey", "bucket[8]")]``. Validation
    (unknown column, unsupported transform/source-type pairing) happens
    HERE, before any directory exists. ``stypes`` maps column name ->
    ICEBERG type; ``first_field_id`` lets spec evolution keep partition
    field-ids unique across every spec the table has ever had (the
    spec's ``last-partition-id`` rule)."""
    if partition_by is None:
        return []
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    fields, seen = [], set()
    for i, entry in enumerate(partition_by):
        col, tstr = (entry, "identity") if isinstance(entry, str) else entry
        if col not in ids:
            raise IcebergError(f"unknown partition column {col!r}")
        kind, param = _parse_transform(tstr)
        ptype = _transform_result_type(kind, stypes[col])
        name = _partition_field_name(col, kind)
        if name in seen:
            raise IcebergError(f"duplicate partition field {name!r}")
        seen.add(name)
        fields.append({
            "name": name, "transform": tstr, "source-id": ids[col],
            "field-id": first_field_id + i,
            # runtime-resolved extras (not persisted to metadata):
            "source": col, "kind": kind, "param": param,
            "stype": stypes[col], "ptype": ptype,
        })
    return fields


def _resolve_spec_fields(meta: dict, raw: list[dict]) -> list[dict]:
    by_id = {f["id"]: f for f in _schema_fields(meta)}
    out = []
    for pf in raw:
        src = by_id[pf["source-id"]]
        kind, param = _parse_transform(pf["transform"])
        out.append({
            **pf, "source": src["name"], "kind": kind, "param": param,
            "stype": src["type"],
            "ptype": _transform_result_type(kind, src["type"]),
        })
    return out


def _resolve_spec(meta: dict, spec_id: int | None = None) -> list[dict]:
    """A partition spec (the DEFAULT one unless ``spec_id`` is given)
    with runtime-resolved source column names/types and transform kinds
    — re-derived from the persisted spec-standard keys
    (name/transform/source-id/field-id), so the metadata stores nothing
    beyond what the spec defines."""
    if spec_id is None:
        spec_id = meta.get("default-spec-id", 0)
    for s in meta.get("partition-specs", []):
        if s.get("spec-id") == spec_id:
            raw = s["fields"]
            break
    else:
        raw = []
    return _resolve_spec_fields(meta, raw)


def _resolve_all_specs(meta: dict) -> dict[int, list[dict]]:
    """Every spec the table has ever had, resolved — per-file pruning on
    a spec-evolved table must use the spec each file was WRITTEN under
    (its manifest's ``partition_spec_id``), not the current default."""
    return {s.get("spec-id", 0): _resolve_spec_fields(meta, s["fields"])
            for s in meta.get("partition-specs", [])}


def _manifest_schema(spec: list[dict], format_version: int = 1) -> dict:
    pfields = []
    for i, f in enumerate(spec):
        avro_t = _partition_avro_type(f["ptype"])
        if avro_t is None:
            raise IcebergError(
                f"unsupported partition value type {f['ptype']!r}")
        pfields.append({"name": f["name"], "type": ["null", avro_t],
                        "field-id": 1000 + i})
    dfields = [
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "field-id": 102, "type": {
            "type": "record", "name": "r102", "fields": pfields}},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "block_size_in_bytes", "type": "long", "field-id": 105},
        _kv_bounds_field("lower_bounds", 125, 126, 127),
        _kv_bounds_field("upper_bounds", 128, 129, 130),
    ]
    if format_version >= 2:
        # content: 0 = data, 1 = position deletes, 2 = equality deletes
        # (spec field-id 134); equality_ids: the field-ids an equality
        # delete matches on (spec field-id 135)
        dfields.insert(1, {"name": "content", "type": "int",
                           "field-id": 134})
        dfields.append({"name": "equality_ids", "field-id": 135,
                        "default": None,
                        "type": ["null", {"type": "array",
                                          "items": "int"}]})
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "field-id": 1},
            {"name": "data_file", "field-id": 2,
             "type": {"type": "record", "name": "r2", "fields": dfields}},
        ]}


def _manifest_list_schema(format_version: int = 1) -> dict:
    fields = [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int",
         "field-id": 504},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
    ]
    if format_version >= 2:
        fields[3:3] = [
            # content: 0 = data manifest, 1 = delete manifest
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long",
             "field-id": 516},
        ]
    return {"type": "record", "name": "manifest_file", "fields": fields}


def _parse_partition_dirname(dirname: str, ptype: str):
    """Recover the typed partition value from a Hive-style staging
    directory name (``__sa_ice_part0=<escaped-value>``)."""
    raw = dirname.split("=", 1)[1]
    s = urllib.parse.unquote(raw)
    if s == _HIVE_NULL:
        return None
    if ptype == "string":
        return s
    if ptype in ("long", "int"):
        return int(s)
    if ptype in ("double", "float"):
        return float(s)
    if ptype == "boolean":
        return s == "true"
    ps = _decimal_ps(ptype)
    if ps:
        # Spark's dir names carry the plain string form at full scale
        # ("10.50"); quantize pins the Decimal's exponent to the type's
        # scale either way (exact — the value has <= scale digits)
        return decimal.Decimal(s).quantize(
            decimal.Decimal(1).scaleb(-ps[1], context=_DEC_CTX),
            context=_DEC_CTX)
    raise IcebergError(f"unsupported partition value type {ptype!r}")


# ---------------------------------------------------------------------------
# Partition transforms (spec v1/v2 "Partition Transforms" section).
#
# Supported: identity; bucket[N] on int/long sources (the spec's
# Murmur3-of-little-endian-long hash — Appendix B), string sources
# (Murmur3 over the UTF-8 bytes), date/timestamp sources (int days /
# long micros hashed as longs), and decimal sources up to precision 18
# (Appendix B: hash the minimal-bytes two's-complement BIG-endian
# unscaled value — ``hash(decimal(14.20)) = -500754589``; precision > 18
# needs an int128 unscaled kernel and stays a documented refusal);
# truncate[W] on int/long
# (floor-to-multiple), string (first W chars), and decimal (unscaled
# value floored to a multiple of W, spec table: truncate(50, d) of
# 10.65 at scale 2 -> 10.50); year/month/day on
# date/timestamp/timestamptz and hour on timestamps. Each transform has
# THREE aligned implementations that must stay in lockstep: the Spark
# column (write path), the Python value (predicate projection for
# pruning), and the result type. Time transforms on timestamptz bin in
# UTC per the spec; on timestamp (ntz) they bin the wall clock with no
# timezone anywhere in the pipeline.
# ---------------------------------------------------------------------------

_TIME_TRANSFORMS = ("year", "month", "day", "hour")
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
_DAY_MICROS = 86_400_000_000
_HOUR_MICROS = 3_600_000_000


def _parse_transform(t: str) -> tuple[str, int | None]:
    """``"bucket[16]"`` -> ``("bucket", 16)``; bare names pass through."""
    m = re.fullmatch(r"bucket\[(\d+)\]", t)
    if m:
        n = int(m.group(1))
        if n < 1:
            raise IcebergError(f"bucket count must be >= 1: {t!r}")
        return "bucket", n
    m = re.fullmatch(r"truncate\[(\d+)\]", t)
    if m:
        w = int(m.group(1))
        if w < 1:
            raise IcebergError(f"truncate width must be >= 1: {t!r}")
        return "truncate", w
    if t == "identity" or t == "void" or t in _TIME_TRANSFORMS:
        return t, None
    raise IcebergError(f"unsupported partition transform {t!r}")


def _transform_result_type(kind: str, stype: str) -> str:
    """Iceberg type of the PARTITION VALUE a transform emits, validating
    the source type. Raised errors happen at create time, before any
    directory exists."""
    dec = _decimal_ps(stype)
    if kind in ("identity", "void"):
        # void (the spec's always-null transform, how v1 specs retire a
        # partition field) keeps the source's value type, like identity
        if stype not in _PARTITION_AVRO and not dec:
            raise IcebergError(
                f"unsupported {kind} partition type {stype!r}")
        return stype
    if kind == "bucket":
        if dec:
            if dec[0] > 18:
                raise IcebergError(
                    f"bucket[N] on {stype!r}: precision > 18 needs an "
                    "int128 unscaled hash kernel (documented refusal); "
                    "use precision <= 18")
            return "int"
        if stype not in ("int", "long", "string", "date", "timestamp",
                         "timestamptz"):
            raise IcebergError(
                f"bucket[N] supports int/long/string/date/timestamp/"
                f"decimal(<=18) source columns, got {stype!r}")
        return "int"
    if kind == "truncate":
        if dec:
            if dec[0] > 18:
                raise IcebergError(
                    f"truncate[W] on {stype!r}: precision > 18 needs an "
                    "int128 unscaled kernel (documented refusal); use "
                    "precision <= 18")
            # one extra digit: flooring the minimum P-digit unscaled
            # value to a multiple of W can round DOWN past -10^P
            return f"decimal({dec[0] + 1},{dec[1]})"
        if stype not in ("int", "long", "string"):
            raise IcebergError(
                f"truncate[W] supports int/long/string/decimal(<=18) "
                f"sources, got {stype!r}")
        return stype
    if kind in _TIME_TRANSFORMS:
        if stype == "date":
            if kind == "hour":
                raise IcebergError(
                    "hour transform needs a timestamp source, got date")
            return "int"
        if stype in ("timestamp", "timestamptz"):
            return "int"
        raise IcebergError(
            f"{kind} transform needs a date/timestamp source, got "
            f"{stype!r}")
    raise IcebergError(f"unsupported partition transform {kind!r}")


def _partition_field_name(source: str, kind: str) -> str:
    """Spec-conventional partition field names: identity keeps the
    column name; transforms suffix it (``o_orderdate_day``,
    ``doc_id_bucket``, ``text_trunc``)."""
    if kind == "identity":
        return source
    suffix = {"truncate": "trunc", "void": "null"}.get(kind, kind)
    return f"{source}_{suffix}"


def _murmur3_32_long(v: int) -> int:
    """32-bit Murmur3 (x86) of the value's 8-byte little-endian form,
    seed 0 — the spec's bucket hash for int AND long sources (Appendix
    B: ints hash as longs, so buckets survive an int->long type
    promotion). Returns the UNSIGNED 32-bit result; bucket() masks to 31
    bits so the sign convention never matters."""
    M = 0xFFFFFFFF
    v &= 0xFFFFFFFFFFFFFFFF
    h = 0
    for k in (v & M, (v >> 32) & M):
        k = (k * 0xCC9E2D51) & M
        k = ((k << 15) | (k >> 17)) & M
        k = (k * 0x1B873593) & M
        h ^= k
        h = ((h << 13) | (h >> 19)) & M
        h = (h * 5 + 0xE6546B64) & M
    h ^= 8  # total byte length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h


def _murmur3_32_bytes(data: bytes) -> int:
    """32-bit Murmur3 (x86) of arbitrary bytes, seed 0 — the spec's
    bucket hash for string sources (UTF-8 bytes; Appendix B:
    ``hash("iceberg") = 1210000089``). Unsigned result."""
    M = 0xFFFFFFFF
    n = len(data)
    h = 0
    for i in range(n // 4):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * 0xCC9E2D51) & M
        k = ((k << 15) | (k >> 17)) & M
        k = (k * 0x1B873593) & M
        h ^= k
        h = ((h << 13) | (h >> 19)) & M
        h = (h * 5 + 0xE6546B64) & M
    tail = data[4 * (n // 4):]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * 0xCC9E2D51) & M
        k = ((k << 15) | (k >> 17)) & M
        k = (k * 0x1B873593) & M
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h


def _decimal_unscaled(v, scale: int) -> int:
    """Exact unscaled value of a decimal literal at the SOURCE column's
    scale; ValueError when the literal has more fractional digits than
    the scale (it then equals no column value — callers keep the file)."""
    d = v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))
    ctx = decimal.Context(prec=50, traps=[decimal.Inexact])
    try:
        return int(d.scaleb(scale, context=ctx).to_integral_exact(
            context=ctx))
    except decimal.Inexact:
        raise ValueError(
            f"literal {v} has more fractional digits than scale {scale}")


def _bucket_of(v, n: int, stype: str = "long") -> int:
    ps = _decimal_ps(stype)
    if ps:
        # Appendix B: hash the minimal-bytes two's-complement
        # BIG-endian unscaled value (hash(decimal(14.20)) = -500754589)
        u = _decimal_unscaled(v, ps[1])
        return (_murmur3_32_bytes(min_twos_complement(u))
                & 0x7FFFFFFF) % n
    if stype == "string":
        return (_murmur3_32_bytes(v.encode("utf-8")) & 0x7FFFFFFF) % n
    if stype == "date":
        d = _as_datetime(v, "date")
        v = (d - _EPOCH_DATE).days  # dates hash as int days (Appendix B)
    elif stype in ("timestamp", "timestamptz"):
        t = _as_datetime(v, stype)
        td = (t - _EPOCH_UTC if stype == "timestamptz"
              else t - datetime.datetime(1970, 1, 1))
        # timestamps hash as long micros-from-epoch (Appendix B)
        v = ((td.days * 86400 + td.seconds) * 1_000_000
             + td.microseconds)
    return (_murmur3_32_long(int(v)) & 0x7FFFFFFF) % n


_M32 = 0xFFFFFFFF


def _mul32_col(c, const: int):
    """``(c * const) mod 2**32`` without 64-bit overflow (ANSI-safe):
    split ``c`` (< 2**32, held in a long) into 16-bit halves — each
    partial product stays under 2**49, and only the low 16 bits of the
    high half contribute below bit 32."""
    lo = c.bitwiseAND(F.lit(0xFFFF)) * F.lit(const)
    hi = (F.shiftright(c, 16).bitwiseAND(F.lit(0xFFFF)) * F.lit(const)
          ).bitwiseAND(F.lit(0xFFFF))
    return (lo + F.shiftleft(hi, 16)).bitwiseAND(F.lit(_M32))


def _rotl32_col(c, r: int):
    # bitwiseOR, not `|` — PySpark's `|` on columns is the LOGICAL or
    return F.shiftleft(c, r).bitwiseAND(F.lit(_M32)).bitwiseOR(
        F.shiftright(c, 32 - r))


def _murmur3_32_long_col(c):
    """Column mirror of ``_murmur3_32_long`` — pure 64-bit-safe integer
    column algebra (whole-stage codegen, no UDF). Input is cast to long;
    output is the unsigned 32-bit hash held in a long.

    Built as ONE three-step ``F.aggregate`` fold (mix block 0, mix block
    1, finalize) rather than an inlined chain: each mixing step
    references its inputs several times, and with plain column chaining
    every reference DUPLICATES the whole upstream subtree — the naive
    inline form is ~10k expression nodes, which costs seconds of
    Catalyst planning and megabytes of task serialization per query (the
    CLAUDE.md expression-count lesson). Inside the fold the accumulator
    is a lambda-variable LEAF, so the body stays a few hundred nodes
    regardless of chain depth. NULL inputs propagate to NULL through the
    block arithmetic."""
    v = c.cast("long")
    M = F.lit(_M32)

    def mix(h, blk):
        k = _mul32_col(blk, 0xCC9E2D51)
        k = _rotl32_col(k, 15)
        k = _mul32_col(k, 0x1B873593)
        h = _rotl32_col(h.bitwiseXOR(k), 13)
        return (h * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(M)

    def fmix(h):
        h = h.bitwiseXOR(F.lit(8))  # total byte length
        h = h.bitwiseXOR(F.shiftright(h, 16))
        h = _mul32_col(h, 0x85EBCA6B)
        h = h.bitwiseXOR(F.shiftright(h, 13))
        h = _mul32_col(h, 0xC2B2AE35)
        return h.bitwiseXOR(F.shiftright(h, 16))

    def step(h, i):
        blk = F.when(i == 0, v.bitwiseAND(M)).otherwise(
            F.shiftright(v, 32).bitwiseAND(M))
        return F.when(i == 2, fmix(h)).otherwise(mix(h, blk))

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(2)), F.lit(0).cast("long"), step)


def _murmur3_32_hex_col(hx_expr):
    """Column mirror of ``_murmur3_32_bytes`` over a variable-length
    byte buffer given as its HEX form (two chars per byte, buffer
    order). The whole block/tail/finalize pipeline is ONE
    ``F.aggregate`` fold over ``sequence(1, nblocks + 2)`` — steps
    1..nblocks mix the 4-byte little-endian blocks, step nblocks+1
    mixes the 1-3-byte tail (identity when none), the last step
    finalizes. The fold body references the hex buffer dozens of times,
    so ``hx_expr`` is first bound to a lambda-variable LEAF via an outer
    one-element-array fold — otherwise every reference would duplicate
    the caller's whole upstream subtree (the expression-count lesson;
    the decimal kernel's minimal-bytes hex is ~250 nodes, and 30
    duplicates of it under a repartition clause is an OOM, not a
    slowdown). NULL in -> NULL out through the array element."""
    return F.aggregate(
        F.array(hx_expr), F.lit(0).cast("long"), _murmur3_32_hex_fold)


def _murmur3_32_hex_fold(acc, hx):
    """The fold body of ``_murmur3_32_hex_col`` — ``hx`` is a
    lambda-variable leaf here, free to reference."""
    M = F.lit(_M32)
    nbytes = (F.length(hx) / F.lit(2)).cast("long")
    r = nbytes % F.lit(4)
    nblocks = ((nbytes - r) / F.lit(4)).cast("long")

    def pair(p):  # hex pair at 1-based char position p
        return F.substr(hx, p, F.lit(2))

    def mul32(x, const):
        lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(const)
        hi = (F.shiftright(x, 16).bitwiseAND(F.lit(0xFFFF))
              * F.lit(const)).bitwiseAND(F.lit(0xFFFF))
        return (lo + F.shiftleft(hi, 16)).bitwiseAND(M)

    def mixk(k):
        k = mul32(k, 0xCC9E2D51)
        k = _rotl32_col(k, 15)
        return mul32(k, 0x1B873593)

    def block_le(i):  # little-endian uint32 of block i (1-based)
        p = (i - 1) * 8 + 1
        return F.conv(F.concat(pair(p + 6), pair(p + 4), pair(p + 2),
                               pair(p)), 16, 10).cast("long")

    def tail_le():  # little-endian value of the 1-3 tail bytes
        p = nblocks * 8 + 1
        return F.conv(
            F.when(r == 1, pair(p))
            .when(r == 2, F.concat(pair(p + 2), pair(p)))
            .otherwise(F.concat(pair(p + 4), pair(p + 2), pair(p))),
            16, 10).cast("long")

    def fmix(h):
        h = h.bitwiseXOR(nbytes)
        h = h.bitwiseXOR(F.shiftright(h, 16))
        h = mul32(h, 0x85EBCA6B)
        h = h.bitwiseXOR(F.shiftright(h, 13))
        h = mul32(h, 0xC2B2AE35)
        return h.bitwiseXOR(F.shiftright(h, 16))

    def step(h, i):
        mixed = _rotl32_col(h.bitwiseXOR(mixk(block_le(i))), 13)
        mixed = (mixed * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(M)
        tailed = F.when(r > 0, h.bitwiseXOR(mixk(tail_le()))).otherwise(h)
        return (F.when(i <= nblocks, mixed)
                .when(i == nblocks + 1, tailed)
                .otherwise(fmix(h)))

    return F.aggregate(
        F.sequence(F.lit(1).cast("long"), nblocks + 2), acc, step)


def _murmur3_32_str_col(c):
    """The spec's bucket hash for string sources: ``_murmur3_32_hex_col``
    over the UTF-8 bytes."""
    return _murmur3_32_hex_col(F.hex(F.encode(c, "UTF-8")))


def _unscaled_long_col(c, precision: int, scale: int):
    """Exact unscaled value of a decimal(<=18) column as a long:
    ``c * 10^scale`` in decimal arithmetic (result precision
    P+S+2 <= 38, exact) then an exact long cast."""
    return (c * F.lit(10 ** scale).cast(f"decimal({scale + 1},0)")
            ).cast("long")


def _murmur3_32_decimal_col(c, precision: int, scale: int):
    """The spec's bucket hash for decimal sources (Appendix B): Murmur3
    of the MINIMAL two's-complement big-endian byte form of the
    unscaled value — note big-endian and variable length, unlike the
    fixed 8-byte little-endian long hash.

    Pure integer column algebra, no strings: the minimal L-byte buffer
    is the low 8L bits of the long's two's-complement pattern, so its
    murmur blocks derive arithmetically — block 1 (bytes 0..3, present
    when L >= 4) is the byte-reverse of ``(u >> (8L-32)) & 0xFFFFFFFF``,
    block 2 (L == 8) the byte-reverse of ``u & 0xFFFFFFFF``, and the
    1-3-byte tail is the byte-reverse of the LOW ``L % 4`` bytes
    (independent of the block count). At most 2 blocks + tail +
    finalize = one fixed 4-step ``F.aggregate`` fold with the
    accumulator AND the derived pieces as lambda leaves (an earlier
    hex-string form paid interpreted conv/substr per block: 52 s vs
    34.6 s for the sf1 gate; inlining the pieces into the fold body
    instead of leaf-binding them was 10x WORSE than the hex form —
    77 s at sf0.1 — because mix() duplicates its block ~8x per step).
    NULL in -> NULL out."""
    u = _unscaled_long_col(c, precision, scale)
    M = F.lit(_M32)
    nbytes = F.lit(1).cast("long")
    for k in range(1, 8):
        t = 1 << (8 * k - 1)
        nbytes = nbytes + F.when((u >= t) | (u < -t), 1).otherwise(0)
    r = nbytes % 4

    def byte(x, shift_bits):  # literal shift
        return F.shiftright(x, shift_bits).bitwiseAND(F.lit(0xFF))

    def rev32(x):
        return (F.shiftleft(x.bitwiseAND(F.lit(0xFF)), 24)
                + F.shiftleft(byte(x, 8), 16)
                + F.shiftleft(byte(x, 16), 8)
                + byte(x, 24))

    # top 4 buffer bytes: bits [8L-32, 8L) of the 64-bit pattern
    # (column shift amount -> SQL function form, F.shiftright is
    # literal-only)
    top4 = F.call_function(
        "shiftright", u, (nbytes * 8 - 32).cast("int")).bitwiseAND(M)
    k1 = rev32(top4)
    k2 = rev32(u.bitwiseAND(M))
    tail = (F.when(r == 1, u.bitwiseAND(F.lit(0xFF)))
            .when(r == 2, F.shiftleft(u.bitwiseAND(F.lit(0xFF)), 8)
                  + byte(u, 8))
            .when(r == 3, F.shiftleft(u.bitwiseAND(F.lit(0xFF)), 16)
                  + F.shiftleft(byte(u, 8), 8) + byte(u, 16))
            .otherwise(F.lit(0).cast("long")))

    def mixk(k):
        k = _mul32_col(k, 0xCC9E2D51)
        k = _rotl32_col(k, 15)
        return _mul32_col(k, 0x1B873593)

    def mix(h, k):
        h = _rotl32_col(h.bitwiseXOR(mixk(k)), 13)
        return (h * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(M)

    def fmix_n(h, n):
        h = h.bitwiseXOR(n)
        h = h.bitwiseXOR(F.shiftright(h, 16))
        h = _mul32_col(h, 0x85EBCA6B)
        h = h.bitwiseXOR(F.shiftright(h, 13))
        h = _mul32_col(h, 0xC2B2AE35)
        return h.bitwiseXOR(F.shiftright(h, 16))

    # Bind the derived pieces to ONE struct lambda-leaf before the
    # mixing fold: mix()/mixk() reference their block ~8x through the
    # 16-bit-split multiplies, and k1/tail are themselves ~100-node
    # trees over u and nbytes — inlining them into the fold body made
    # the per-row interpreted tree ~10x slower than the hex form it
    # replaced (77 s vs 7 s at sf0.1), while leaf-field references
    # cost nothing to duplicate.
    parts = F.struct(nbytes.alias("n"), r.alias("r"), k1.alias("k1"),
                     k2.alias("k2"), tail.alias("t"))

    def fold(acc, p):
        def step(h, i):
            return (F.when(i == 1, F.when(p["n"] >= 4, mix(h, p["k1"]))
                           .otherwise(h))
                    .when(i == 2, F.when(p["n"] == 8, mix(h, p["k2"]))
                          .otherwise(h))
                    .when(i == 3,
                          F.when(p["r"] > 0,
                                 h.bitwiseXOR(mixk(p["t"])))
                          .otherwise(h))
                    .otherwise(fmix_n(h, p["n"])))

        return F.aggregate(F.sequence(F.lit(1), F.lit(4)), acc, step)

    return F.aggregate(F.array(parts), F.lit(0).cast("long"), fold)


def _floordiv_col(c, unit: int):
    """Exact floor division of a long column: subtract the positive
    remainder, then divide. The double division is exact — both operands
    are exactly representable (< 2**53) and the quotient is an integer."""
    return ((c - F.pmod(c, F.lit(unit))) / F.lit(unit)).cast("long")


def _transform_col(kind: str, param: int | None, source: str, stype: str):
    """The Spark column computing a partition value from its source
    column — the write path's throwaway ``partitionBy`` key. NULL
    sources propagate to NULL partition values through every branch."""
    c = F.col(source)
    dec = _decimal_ps(stype)
    if kind == "identity":
        return c
    if kind == "void":
        return F.lit(None).cast(_spark_type_for(stype))
    if kind == "bucket":
        if dec:
            h = _murmur3_32_decimal_col(c, *dec)
        elif stype == "string":
            h = _murmur3_32_str_col(c)
        elif stype == "date":
            # dates hash as their int days-from-epoch (Appendix B)
            h = _murmur3_32_long_col(
                F.datediff(c, F.lit("1970-01-01")).cast("long"))
        elif stype == "timestamptz":
            h = _murmur3_32_long_col(F.unix_micros(c))
        elif stype == "timestamp":
            # ntz: exact wall-clock micros-from-epoch, no timezone
            # anywhere (date_part SECOND is a DECIMAL with the exact
            # fractional micros; *1e6 is exact decimal arithmetic)
            days = F.datediff(F.to_date(c),
                              F.lit("1970-01-01")).cast("long")
            micros = (days * F.lit(86_400_000_000)
                      + F.hour(c).cast("long") * F.lit(3_600_000_000)
                      + F.minute(c).cast("long") * F.lit(60_000_000)
                      + (F.date_part(F.lit("SECOND"), c)
                         * F.lit(1_000_000)).cast("long"))
            h = _murmur3_32_long_col(micros)
        else:
            h = _murmur3_32_long_col(c)
        return (h.bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(param)).cast("int")
    if kind == "truncate":
        if stype == "string":
            return F.substring(c, 1, param)
        if dec:
            # floor the UNSCALED value to a multiple of W, then rebuild
            # the decimal: exact decimal division by 10^S (the quotient
            # has <= S fractional digits, so the adjusted result scale
            # always holds it), then an exact cast to decimal(P+1,S) —
            # one digit wider than the source, because flooring the
            # minimum P-digit value can pass -10^P (ANSI would throw on
            # a same-precision cast)
            p, s = dec
            u = _unscaled_long_col(c, p, s)
            ut = u - F.pmod(u, F.lit(param))
            return (ut.cast("decimal(20,0)")
                    / F.lit(10 ** s).cast(f"decimal({s + 1},0)")
                    ).cast(f"decimal({p + 1},{s})")
        out = c - F.pmod(c, F.lit(param))
        return out.cast("int" if stype == "int" else "long")
    # time transforms -> int
    if stype == "date":
        d = c
    elif stype == "timestamp":  # ntz: wall clock, no timezone anywhere
        if kind == "hour":
            days = F.datediff(F.to_date(c), F.lit("1970-01-01"))
            return (days * 24 + F.hour(c)).cast("int")
        d = F.to_date(c)
    else:  # timestamptz: UTC micros per the spec
        micros = F.unix_micros(c)
        if kind == "hour":
            return _floordiv_col(micros, _HOUR_MICROS).cast("int")
        days = _floordiv_col(micros, _DAY_MICROS)
        if kind == "day":
            return days.cast("int")
        d = F.date_add(F.to_date(F.lit("1970-01-01")), days.cast("int"))
    if kind == "day":
        return F.datediff(d, F.lit("1970-01-01")).cast("int")
    if kind == "month":
        return ((F.year(d) - 1970) * 12 + F.month(d) - 1).cast("int")
    if kind == "year":
        return (F.year(d) - 1970).cast("int")
    raise IcebergError(f"unsupported partition transform {kind!r}")


def _as_datetime(v, stype: str):
    """Coerce a predicate literal to the datetime/date a time transform
    needs: datetime/date objects pass through, ISO strings parse.
    timestamptz: naive inputs are treated as UTC, aware inputs are
    converted to UTC (the spec bins in UTC)."""
    if isinstance(v, str):
        v = (datetime.date.fromisoformat(v) if stype == "date"
             else datetime.datetime.fromisoformat(v))
    if stype == "date":
        if isinstance(v, datetime.datetime):
            return v.date()
        return v
    if not isinstance(v, datetime.datetime):
        raise IcebergError(
            f"cannot project a {type(v).__name__} literal through a "
            f"time transform on a {stype} column")
    if stype == "timestamptz":
        if v.tzinfo is None:
            return v.replace(tzinfo=datetime.timezone.utc)
        return v.astimezone(datetime.timezone.utc)
    return v.replace(tzinfo=None) if v.tzinfo else v


def _transform_value(kind: str, param: int | None, v, stype: str):
    """Python mirror of ``_transform_col`` for driver-side predicate
    projection. Returns None when the literal can't be projected (the
    caller keeps the file — pruning stays sound)."""
    if v is None:
        return None
    if kind == "identity":
        return v
    if kind == "void":
        return None  # always-null: projection can never prune on it
    if kind == "bucket":
        return _bucket_of(v, param, stype)
    if kind == "truncate":
        if stype == "string":
            return v[:param]
        ps = _decimal_ps(stype)
        if ps:
            u = _decimal_unscaled(v, ps[1])
            return decimal.Decimal(u - (u % param)).scaleb(-ps[1])
        return v - (v % param)  # Python % is a floor mod
    try:
        t = _as_datetime(v, stype)
    except (ValueError, IcebergError):
        return None
    if stype == "date":
        days = (t - _EPOCH_DATE).days
        d = t
    elif stype == "timestamptz":
        td = t - _EPOCH_UTC
        days = td.days
        if kind == "hour":
            return days * 24 + td.seconds // 3600
        d = (_EPOCH_DATE + datetime.timedelta(days=days))
    else:  # ntz wall clock
        days = (t.date() - _EPOCH_DATE).days
        if kind == "hour":
            return days * 24 + t.hour
        d = t.date()
    if kind == "day":
        return days
    if kind == "month":
        return (d.year - 1970) * 12 + d.month - 1
    if kind == "year":
        return d.year - 1970
    return None


def _raw_unscaled_decimal(raw, scale: int):
    """A parquet footer's RAW decimal statistic -> exact Decimal:
    int32/int64 physicals report the unscaled int, FLBA physicals the
    two's-complement big-endian unscaled bytes."""
    if isinstance(raw, int):
        return _unscaled_to_decimal(raw, scale)
    if isinstance(raw, bytes) and raw:
        return _unscaled_to_decimal(
            int.from_bytes(raw, "big", signed=True), scale)
    return None


def _file_bounds(md, bound_types: dict[str, str]) -> dict[str, tuple]:
    """Per-column (min, max) for one parquet file, from its footer
    row-group statistics. A column drops out if ANY row group lacks
    exact min/max (all-null chunk, missing stats) or a float bound is
    NaN — bounds are advisory, absence just means no pruning. Parquet
    writers may truncate long string maxes but must keep them valid
    upper bounds (parquet-format Statistics contract), so range pruning
    on what the footer reports stays sound."""
    acc: dict[str, tuple] = {}
    dead: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in bound_types or name in dead:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                dead.add(name)
                acc.pop(name, None)
                continue
            ps = _decimal_ps(bound_types[name])
            if ps:
                # pyarrow cannot logically cast decimal stats — decode
                # the RAW physical values (int32/int64 unscaled, or
                # FLBA two's-complement big-endian unscaled) exactly
                lo = _raw_unscaled_decimal(st.min_raw, ps[1])
                hi = _raw_unscaled_decimal(st.max_raw, ps[1])
                if lo is None or hi is None:
                    dead.add(name)
                    acc.pop(name, None)
                    continue
            else:
                lo, hi = st.min, st.max
            if isinstance(lo, float) and (lo != lo or hi != hi):
                dead.add(name)
                acc.pop(name, None)
                continue
            if name in acc:
                lo, hi = min(acc[name][0], lo), max(acc[name][1], hi)
            acc[name] = (lo, hi)
    return acc


def _write_data_files(
    df: DataFrame, table_dir: str, tag: str, spec: list[dict],
    bound_types: dict[str, str],
) -> list[dict]:
    """Write parquet data files in ONE Spark job and return one dict per
    file: file_path (relative), record_count, file_size_in_bytes,
    partition values (dict keyed by partition field name), per-column
    (min, max) bounds. Partitioning goes through ``partitionBy`` on
    throwaway TRANSFORMED columns (``__sa_ice_part0..k`` — identity is
    just the trivial transform) so every real column stays inside the
    data files; partition values are recovered from the Hive-style
    staging directory names and the stats from the parquet footers — no
    per-value ``.where`` re-scan of the input, however many partition
    tuples there are. (Callers who want one-file-per-partition layout
    can ``df.repartition(...)`` first; we do not force it — that would
    serialize large partitions onto single tasks.)"""
    import pyarrow.parquet as pq

    os.makedirs(_data_dir(table_dir), exist_ok=True)
    staging = os.path.join(table_dir, f"_staging-{tag}")
    found: list[tuple[object, str]] = []
    if not spec:
        df.write.mode("overwrite").parquet(staging)
        found = [(None, p) for p in
                 sorted(glob.glob(os.path.join(staging, "part-*.parquet")))]
    else:
        tmp_cols = [f"{_PART_TMP}{i}" for i in range(len(spec))]
        out = df
        for tc, f in zip(tmp_cols, spec):
            out = out.withColumn(
                tc, _transform_col(f["kind"], f["param"], f["source"],
                                   f["stype"]))
        (out.write.mode("overwrite").partitionBy(*tmp_cols)
            .parquet(staging))
        pattern = os.path.join(
            staging, *[f"{tc}=*" for tc in tmp_cols], "part-*.parquet")
        for p in sorted(glob.glob(pattern)):
            segs = os.path.relpath(p, staging).split(os.sep)[:-1]
            pvals = {
                f["name"]: _parse_partition_dirname(seg, f["ptype"])
                for seg, f in zip(segs, spec)
            }
            found.append((pvals, p))
    moved: list[tuple[object, str, str]] = []
    for seq, (pval, src) in enumerate(found):
        name = f"{tag}-{seq:05d}.parquet"
        dst = os.path.join(_data_dir(table_dir), name)
        shutil.move(src, dst)
        moved.append((pval, name, dst))
    if len(moved) > _DISTRIBUTED_STATS_FILES:
        stats = _harvest_stats_distributed(
            df.sparkSession, [dst for _, _, dst in moved], bound_types)
    else:
        stats = None
    files: list[dict] = []
    for pval, name, dst in moved:
        if stats is not None:
            n_rows, bounds = stats[dst]
        else:
            md = pq.read_metadata(dst)
            n_rows, bounds = md.num_rows, _file_bounds(md, bound_types)
        files.append({
            "file_path": os.path.join("data", name),
            "record_count": n_rows,
            "file_size_in_bytes": os.path.getsize(dst),
            "partition": pval,
            "bounds": bounds,
        })
    shutil.rmtree(staging, ignore_errors=True)
    return files


def _harvest_stats_distributed(
    spark: SparkSession, paths: list[str], bound_types: dict[str, str],
) -> dict[str, tuple[int, dict]]:
    """The commit-time footer harvest (row counts + min/max bounds) as
    one Spark job over the just-written files — the write-side twin of
    the distributed planning walk. The driver loop costs ~3 ms per
    footer, serial: fine at hundreds of files, minutes at the 100k-file
    writes a real ingest produces, so past ``_DISTRIBUTED_STATS_FILES``
    the footers decode where executors already are. Bound values cross
    as JSON — Decimal bounds go through their exact string form
    (``default=str``) and rehydrate by the column's declared type."""
    import pandas as pd

    mdf = spark.createDataFrame(
        [(p,) for p in paths], "path string").repartition(
        min(len(paths), spark.sparkContext.defaultParallelism))

    def harvest(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.read_metadata(p)
                out.append((p, md.num_rows,
                            json.dumps(_file_bounds(md, bound_types),
                                       default=str)))
            yield pd.DataFrame(
                out, columns=["path", "n_rows", "bounds"])

    rows = mdf.mapInPandas(
        harvest, schema="path string, n_rows long, bounds string"
    ).collect()

    def rehydrate(c, v):
        if _decimal_ps(bound_types[c]):
            return (decimal.Decimal(v[0]), decimal.Decimal(v[1]))
        return tuple(v)

    return {r["path"]: (r["n_rows"],
                        {c: rehydrate(c, v) for c, v in
                         json.loads(r["bounds"]).items()})
            for r in rows}


def _write_manifest(
    table_dir: str, snapshot_id: int, files: list[dict],
    spec: list[dict],
    ids: dict[str, int], types: dict[str, str],
    format_version: int = 1, content: int = 0,
    sequence_number: int = 0, spec_id: int = 0,
) -> dict:
    schema = _manifest_schema(spec, format_version)
    # uuid suffix per the spec's writers: two racing commits must never
    # share a manifest filename (the metadata.json O_EXCL check decides
    # the winner; the loser's orphan Avro files are harmless).
    name = f"manifest-{snapshot_id:05d}-{uuid.uuid4().hex[:8]}.avro"
    path = os.path.join(_meta_dir(table_dir), name)
    rows = []
    for f in files:
        fpart = f.get("partition") or {}
        part = {pf["name"]: fpart.get(pf["name"]) for pf in spec}
        lower = [{"key": ids[c], "value": _bound_bytes(types[c], lo)}
                 for c, (lo, _) in sorted(f["bounds"].items())]
        upper = [{"key": ids[c], "value": _bound_bytes(types[c], hi)}
                 for c, (_, hi) in sorted(f["bounds"].items())]
        data_file = {
            "file_path": f["file_path"],
            "file_format": "PARQUET",
            "partition": part,
            "record_count": f["record_count"],
            "file_size_in_bytes": f["file_size_in_bytes"],
            "block_size_in_bytes": _BLOCK_SIZE,
            "lower_bounds": lower or None,
            "upper_bounds": upper or None,
        }
        if format_version >= 2:
            data_file["content"] = content
            data_file["equality_ids"] = f.get("equality_ids")
        rows.append((1, snapshot_id, data_file))  # status 1 = ADDED
    buf = io.BytesIO()
    write_container(buf, schema, iter(rows))
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())
    out = {
        "manifest_path": os.path.join("metadata", name),
        "manifest_length": len(buf.getvalue()),
        "partition_spec_id": spec_id,
        "added_snapshot_id": snapshot_id,
        "added_data_files_count": len(files),
        "added_rows_count": sum(f["record_count"] for f in files),
    }
    if format_version >= 2:
        # manifest-list content: 0 = data manifest, 1 = DELETES manifest
        # (position or equality — the entry's own content field, 1 vs 2,
        # tells them apart)
        out["content"] = 0 if content == 0 else 1
        out["sequence_number"] = sequence_number
        out["min_sequence_number"] = sequence_number
    return out


def _write_manifest_list(
    table_dir: str, snapshot_id: int, manifests: list[dict],
    format_version: int = 1,
) -> str:
    name = f"snap-{snapshot_id:05d}-{uuid.uuid4().hex[:8]}.avro"
    path = os.path.join(_meta_dir(table_dir), name)
    schema = _manifest_list_schema(format_version)
    rows = [tuple(m[f["name"]] for f in schema["fields"])
            for m in manifests]
    buf = io.BytesIO()
    write_container(buf, schema, iter(rows))
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())
    return os.path.join("metadata", name)


def _load_metadata(table_dir: str, version: int | None = None) -> dict:
    md = _meta_dir(table_dir)
    if version is None:
        hint = os.path.join(md, "version-hint.text")
        try:
            with open(hint) as fh:
                version = int(fh.read().strip())
        except (OSError, ValueError) as exc:
            raise IcebergError(f"no readable version hint in {md}") from exc
    path = os.path.join(md, f"v{version}.metadata.json")
    try:
        with open(path) as fh:
            meta = json.load(fh)
    except (OSError, ValueError) as exc:
        raise IcebergError(f"missing/invalid metadata {path}") from exc
    if meta.get("format-version") not in _FORMAT_VERSIONS:
        raise IcebergError("unsupported format-version")
    return meta


def _commit_metadata(table_dir: str, meta: dict, version: int) -> None:
    md = _meta_dir(table_dir)
    os.makedirs(md, exist_ok=True)
    path = os.path.join(md, f"v{version}.metadata.json")
    # O_CREAT|O_EXCL: the Hadoop-catalog optimistic-concurrency commit —
    # a losing concurrent writer gets an error, not a clobbered table
    # (same contract as the Delta tier's version-file create).
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
    with os.fdopen(fd, "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write(str(version))


def _publish_snapshot(
    table_dir: str, meta: dict, operation: str, manifests: list[dict],
    snap_id: int, seq: int,
) -> dict:
    """Write the manifest list and return updated metadata with the new
    snapshot appended — the shared tail of every commit kind."""
    fv = meta["format-version"]
    mlist = _write_manifest_list(table_dir, snap_id, manifests, fv)
    now = int(time.time() * 1000)
    meta = dict(meta)
    meta["current-snapshot-id"] = snap_id
    meta["last-updated-ms"] = now
    snap = {
        "snapshot-id": snap_id, "timestamp-ms": now,
        "manifest-list": mlist,
        "schema-id": meta.get("current-schema-id", 0),
        "summary": {"operation": operation},
    }
    if fv >= 2:
        snap["sequence-number"] = seq
        meta["last-sequence-number"] = seq
    meta["snapshots"] = meta["snapshots"] + [snap]
    meta["snapshot-log"] = meta["snapshot-log"] + [
        {"snapshot-id": snap_id, "timestamp-ms": now}]
    return meta


def _new_snapshot(
    df: DataFrame, table_dir: str, meta: dict, operation: str,
    prior_manifests: list[dict],
) -> dict:
    fv = meta["format-version"]
    spec = _resolve_spec(meta)
    spec_id = meta.get("default-spec-id", 0)
    names = [f["name"] for f in _schema_fields(meta)]
    if sorted(df.columns) != sorted(names):
        raise IcebergError(
            f"dataframe columns {sorted(df.columns)} do not match the "
            f"table schema {sorted(names)} (after add_iceberg_column, "
            "writers must supply the new column)")
    df = df.select(*names)  # schema order; data files carry every column
    ids = {f["name"]: f["id"] for f in _schema_fields(meta)}
    types = {f["name"]: f["type"] for f in _schema_fields(meta)}
    bound_types = {c: t for c, t in types.items() if _is_bound_type(t)}
    snap_id = meta["current-snapshot-id"] + 1
    seq = meta.get("last-sequence-number", 0) + 1
    files = _write_data_files(
        df, table_dir, f"s{snap_id:05d}", spec, bound_types)
    manifest = _write_manifest(
        table_dir, snap_id, files, spec, ids, types,
        format_version=fv, content=0, sequence_number=seq,
        spec_id=spec_id)
    return _publish_snapshot(
        table_dir, meta, operation, prior_manifests + [manifest],
        snap_id, seq)


def partition_transform_columns(df: DataFrame, partition_by) -> list:
    """The transform Columns a ``partition_by`` spec computes at write
    time, exposed so callers can co-locate rows BEFORE the write:
    ``df.repartition(n, *partition_transform_columns(df, spec))`` lands
    every partition tuple in exactly one task, so the one-job
    ``partitionBy`` write emits one file per tuple instead of (tasks x
    tuples) small files — the layout a real table wants, and it keeps
    the driver-side footer harvest O(tuples). Optional: the write is
    correct (just smaller-filed) without it."""
    schema, ids = _ice_schema(df)
    return [
        _transform_col(f["kind"], f["param"], f["source"], f["stype"])
        for f in _normalize_partition_spec(
            partition_by, _df_ice_types(df), ids)
    ]


def _new_table_meta(table_dir: str, schema: dict,
                    spec_fields: list[dict], format_version: int,
                    last_column_id: int) -> dict:
    """The table-bootstrap metadata shape shared by ``create_iceberg``
    and ``create_iceberg_staged`` — ONE definition so the two create
    paths can never drift."""
    meta = {
        "format-version": format_version,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     os.path.abspath(table_dir))),
        "location": os.path.abspath(table_dir),
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": last_column_id,
        "schema": schema, "schemas": [schema], "current-schema-id": 0,
        "partition-spec": spec_fields,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 999 + len(spec_fields),
        "current-snapshot-id": 0,
        "snapshots": [], "snapshot-log": [],
    }
    if format_version >= 2:
        meta["last-sequence-number"] = 0
    return meta


def create_iceberg(
    df: DataFrame, table_dir: str, partition_by=None,
    format_version: int = 1,
) -> int:
    """Create a new Iceberg table from ``df``; returns the snapshot id.

    ``partition_by`` records partition values on every manifest row (the
    pruning key): a bare column name partitions by identity; a list of
    names and/or ``(column, transform)`` pairs builds a multi-field
    transformed spec per the Iceberg spec's partition-transform table,
    e.g. ``[("o_orderdate", "day"), ("o_custkey", "bucket[8]")]``.
    Supported transforms: ``identity``, ``bucket[N]``
    (int/long/string/date/timestamp/decimal(<=18) sources, the spec's
    Murmur3 hash), ``truncate[W]`` (int/long/string/decimal(<=18)),
    ``year``/``month``/``day`` (date/timestamp sources) and ``hour``
    (timestamp sources). ``format_version=2`` enables sequence-number
    tracking and row-level position deletes (``delete_iceberg_rows``)."""
    if format_version not in _FORMAT_VERSIONS:
        raise IcebergError(f"unsupported format-version {format_version}")
    if os.path.exists(_meta_dir(table_dir)):
        raise IcebergError(f"table already exists at {table_dir}")
    schema, ids = _ice_schema(df)
    # validate BEFORE any directory or data file exists: an unsupported
    # type/transform must not leave a half-built table behind.
    resolved = _normalize_partition_spec(
        partition_by, _df_ice_types(df), ids)
    _manifest_schema(resolved)
    spec_fields = [
        {"name": f["name"], "transform": f["transform"],
         "source-id": f["source-id"], "field-id": f["field-id"]}
        for f in resolved
    ]
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    meta = _new_table_meta(table_dir, schema, spec_fields,
                           format_version, len(ids))
    meta = _new_snapshot(df, table_dir, meta, "append", [])
    _commit_metadata(table_dir, meta, 1)
    return meta["current-snapshot-id"]


def create_iceberg_staged(
    table_dir: str, schema_struct: dict, partition_by=None,
    format_version: int = 1,
) -> None:
    """Metadata-only CREATE from an Iceberg wire schema struct (the REST
    catalog's create-table route): commits ``v1.metadata.json`` with the
    schema and partition spec but NO snapshot — data arrives through the
    normal snapshot-committing writers (``append_iceberg`` et al.).
    Until then the table reads as empty (``read_iceberg`` /
    ``iceberg_count`` / ``iceberg_plan_files`` all handle the
    zero-snapshot state). ``schema_struct`` is the spec's
    ``{"type": "struct", "fields": [{id, name, required, type}, ...]}``
    shape; field-ids must be unique and types known to the tier."""
    if format_version not in _FORMAT_VERSIONS:
        raise IcebergError(f"unsupported format-version {format_version}")
    if os.path.exists(_meta_dir(table_dir)):
        raise IcebergError(f"table already exists at {table_dir}")
    fields = schema_struct.get("fields") or []
    if not fields:
        raise IcebergError("schema has no fields")
    ids, stypes = {}, {}
    for f in fields:
        if not all(k in f for k in ("id", "name", "type")):
            raise IcebergError(f"malformed schema field {f!r}")
        _spark_type_for(f["type"])  # raises on unknown types
        if f["name"] in ids:
            raise IcebergError(f"duplicate field name {f['name']!r}")
        if f["id"] in set(ids.values()):
            raise IcebergError(f"duplicate field id {f['id']}")
        ids[f["name"]] = f["id"]
        stypes[f["name"]] = f["type"]
    schema = {"type": "struct", "schema-id": 0,
              "fields": [{"id": f["id"], "name": f["name"],
                          "required": bool(f.get("required", False)),
                          "type": f["type"]} for f in fields]}
    resolved = _normalize_partition_spec(partition_by, stypes, ids)
    _manifest_schema(resolved)  # validate before committing anything
    spec_fields = [
        {"name": f["name"], "transform": f["transform"],
         "source-id": f["source-id"], "field-id": f["field-id"]}
        for f in resolved
    ]
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    meta = _new_table_meta(table_dir, schema, spec_fields,
                           format_version, max(ids.values()))
    _commit_metadata(table_dir, meta, 1)


def update_iceberg_partition_spec(table_dir: str, partition_by) -> int:
    """PARTITION SPEC EVOLUTION (spec §Partition Evolution): change how
    FUTURE writes are partitioned in a metadata-only commit — no
    snapshot, no data file touched. The new spec (same ``partition_by``
    forms as ``create_iceberg``) becomes the default; every existing
    file keeps the spec it was written under (its manifest's
    ``partition_spec_id``), and plan-time pruning projects predicates
    through each file's OWN spec — so a table that starts
    identity-partitioned and evolves to ``[("ts", "day"), ("k",
    "bucket[16]")]`` still prunes its old files by the old field and its
    new files by the new ones. Partition field-ids stay unique across
    every spec the table ever had (``last-partition-id``).

    ``partition_filter`` (exact match on recorded partition values)
    only prunes files whose spec records the field; files of other
    specs are KEPT — use ``predicates`` for exact cross-spec filtering,
    and metadata-only counts refuse mixed-spec partition filters.
    Returns the new spec-id."""
    meta = _load_metadata(table_dir)
    ids = {f["name"]: f["id"] for f in _schema_fields(meta)}
    stypes = {f["name"]: f["type"] for f in _schema_fields(meta)}
    last_pid = meta.get("last-partition-id", 999)
    resolved = _normalize_partition_spec(
        partition_by, stypes, ids, first_field_id=last_pid + 1)
    _manifest_schema(resolved)  # validate before committing anything
    version = _next_version(table_dir)
    spec_id = 1 + max(s.get("spec-id", 0)
                      for s in meta["partition-specs"])
    spec_fields = [
        {"name": f["name"], "transform": f["transform"],
         "source-id": f["source-id"], "field-id": f["field-id"]}
        for f in resolved
    ]
    meta = dict(meta)
    meta["partition-specs"] = meta["partition-specs"] + [
        {"spec-id": spec_id, "fields": spec_fields}]
    meta["default-spec-id"] = spec_id
    meta["partition-spec"] = spec_fields  # v1 legacy mirror
    meta["last-partition-id"] = last_pid + len(spec_fields)
    meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(table_dir, meta, version)
    return spec_id


def migrate_delta_to_iceberg(
    table_path: str, format_version: int = 1
) -> int:
    """In-place Delta -> Iceberg migration (the spec's ``migrate`` /
    ``snapshot`` action shape): read the Delta log's CURRENT snapshot
    and commit an Iceberg metadata tree NEXT TO ``_delta_log`` over the
    SAME parquet files — zero data copied or moved; manifest rows point
    at the existing files by their Delta-relative paths, with
    record counts and min/max bounds harvested from the footers already
    on disk. The result is a normal table of this tier: time travel
    starts at the migration snapshot, range pruning works immediately,
    and with ``format_version=2`` so do row-level deletes and upserts.

    The Delta log is left intact as a frozen historical view — but after
    migration the ICEBERG metadata owns the files: writing through the
    Delta tier again, or expiring the migration snapshot after Iceberg
    overwrites, invalidates the frozen Delta view (the same ownership
    handoff real migrations make). Unpartitioned tables only (this
    tier's Delta writer is unpartitioned). Returns the snapshot id."""
    import pyarrow.parquet as pq

    from .deltalog import PyDeltaLog

    if format_version not in _FORMAT_VERSIONS:
        raise IcebergError(f"unsupported format-version {format_version}")
    if os.path.exists(_meta_dir(table_path)):
        raise IcebergError(
            f"{table_path} already has iceberg metadata")
    snap = PyDeltaLog(table_path).snapshot()
    if snap.version < 0 or snap.metadata is None:
        raise IcebergError(f"no Delta table at {table_path}")
    spark_schema = T.StructType.fromJson(
        json.loads(snap.metadata["schemaString"]))
    fields, ids = [], {}
    for i, f in enumerate(spark_schema.fields, start=1):
        t = f.dataType.typeName()
        if t not in _SPARK_TO_ICE:
            raise IcebergError(f"no iceberg mapping for spark type {t!r}")
        fields.append({"id": i, "name": f.name,
                       "required": not f.nullable,
                       "type": _SPARK_TO_ICE[t]})
        ids[f.name] = i
    schema = {"type": "struct", "schema-id": 0, "fields": fields}
    types = {f["name"]: f["type"] for f in fields}
    bound_types = {c: t for c, t in types.items() if _is_bound_type(t)}
    files = []
    for add in snap.files:
        p = os.path.join(table_path, add["path"])
        md = pq.read_metadata(p)
        files.append({
            "file_path": add["path"],
            "record_count": md.num_rows,
            "file_size_in_bytes": os.path.getsize(p),
            "partition": None,
            "bounds": _file_bounds(md, bound_types),
        })
    os.makedirs(_meta_dir(table_path), exist_ok=True)
    meta = {
        "format-version": format_version,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     os.path.abspath(table_path))),
        "location": os.path.abspath(table_path),
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": len(ids),
        "schema": schema, "schemas": [schema], "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "current-snapshot-id": 0,
        "snapshots": [], "snapshot-log": [],
    }
    if format_version >= 2:
        meta["last-sequence-number"] = 0
    manifest = _write_manifest(
        table_path, 1, files, [], ids, types,
        format_version=format_version, content=0, sequence_number=1)
    new_meta = _publish_snapshot(
        table_path, meta, "append", [manifest], 1, 1)
    _commit_metadata(table_path, new_meta, 1)
    return 1


def migrate_iceberg_to_delta(table_path: str) -> int:
    """The reverse handoff: commit a Delta log (version 0) next to the
    Iceberg ``metadata/`` tree referencing the current snapshot's SAME
    parquet files — zero data copied; Delta per-file stats are computed
    from the footers on disk, so Delta-side stats pruning works
    immediately. Refused under outstanding v2 delete debt (Delta add
    actions cannot express merge-on-read deletes) — run
    ``rewrite_iceberg_files`` first, which purges it. After migration
    the DELTA log owns the files; the Iceberg metadata stays as a frozen
    view with the mirror-image caveats of ``migrate_delta_to_iceberg``.
    Returns the Delta version (0)."""
    from .deltalog import PyDeltaLog, _file_stats

    meta = _load_metadata(table_path)
    snap = _resolve_snapshot(meta, None, None)
    if (meta["format-version"] >= 2
            and _live_delete_files(table_path, snap)):
        raise IcebergError(
            "outstanding v2 delete debt: run rewrite_iceberg_files "
            "(compaction) first, then migrate")
    if _files_need_mapping(meta, meta["schema"],
                           _live_files(table_path, snap)):
        raise IcebergError(
            "renamed columns outstanding: Delta resolves columns by "
            "physical name and pre-rename files still store the old "
            "one — run rewrite_iceberg_files (compaction bakes the "
            "current names into the data), then migrate")
    log = PyDeltaLog(table_path)
    if log.latest_version() >= 0:
        raise IcebergError(f"{table_path} already has a Delta log")
    spark_schema = _spark_struct(meta["schema"])
    actions = log.create_actions(spark_schema)
    for f in _live_files(table_path, snap):
        p = os.path.join(table_path, f["file_path"])
        st = os.stat(p)
        actions.append({"add": {
            "path": f["file_path"],
            "partitionValues": {},
            "size": st.st_size,
            "modificationTime": int(st.st_mtime * 1000),
            "dataChange": True,
            "stats": _file_stats(p, spark_schema),
        }})
    return log.commit(actions, read_version=-1)


def _current_manifests(table_dir: str, meta: dict) -> list[dict]:
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    cur = snaps.get(meta["current-snapshot-id"])
    if cur is None:
        return []
    return _read_manifest_list(table_dir, cur["manifest-list"])


def _read_manifest_list(table_dir: str, rel_path: str) -> list[dict]:
    with open(os.path.join(table_dir, rel_path), "rb") as fh:
        schema, rows = read_container(fh.read())
    names = [f["name"] for f in schema["fields"]]
    return [dict(zip(names, r)) for r in rows]


def append_iceberg(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as a new append snapshot: prior manifests are
    REUSED by reference (O(new files) metadata work, however large the
    table already is)."""
    meta = _load_metadata(table_dir)
    version = _next_version(table_dir)
    new_meta = _new_snapshot(
        df, table_dir, meta, "append", _current_manifests(table_dir, meta))
    _commit_metadata(table_dir, new_meta, version)
    return new_meta["current-snapshot-id"]


def overwrite_iceberg(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as a REPLACE snapshot: the new manifest list
    references only the new manifest, so prior files drop out of the
    current snapshot while remaining readable via time travel."""
    meta = _load_metadata(table_dir)
    version = _next_version(table_dir)
    new_meta = _new_snapshot(df, table_dir, meta, "overwrite", [])
    _commit_metadata(table_dir, new_meta, version)
    return new_meta["current-snapshot-id"]


def _delete_path_prefix(table_dir: str) -> str:
    """What ``_metadata.file_path`` prepends to our manifest-relative
    paths on a local filesystem scan."""
    return "file:" + os.path.abspath(table_dir) + "/"


def _position_delete_entries(table_dir: str, snapshot: dict) -> list[dict]:
    return [f for f in _live_delete_files(table_dir, snapshot)
            if not f.get("equality_ids")]


def _equality_delete_entries(table_dir: str, snapshot: dict) -> list[dict]:
    return [f for f in _live_delete_files(table_dir, snapshot)
            if f.get("equality_ids")]


def _position_deletes_df(
    spark: SparkSession, table_dir: str, snapshot: dict,
) -> tuple[DataFrame | None, int]:
    """The snapshot's merged position-delete rows (file_path, pos) and
    their EXACT total row count (from delete-manifest record_counts —
    metadata only)."""
    dels = _position_delete_entries(table_dir, snapshot)
    if not dels:
        return None, 0
    paths = [os.path.join(table_dir, f["file_path"]) for f in dels]
    return spark.read.parquet(*paths), sum(
        f["record_count"] for f in dels)


def delete_iceberg_rows(
    spark: SparkSession, table_dir: str, predicate: str,
) -> int:
    """Row-level DELETE via v2 POSITION DELETE files: rows of the
    current snapshot matching ``predicate`` (a SQL expression over the
    table's columns) are recorded as (file_path, pos) rows in a new
    parquet delete file, committed as a delete manifest (content=1) —
    no data file is rewritten, the merge-on-read half of the v2 spec.

    Positions come from Spark's ``_metadata.row_index`` on one scan of
    the live data files; rows already deleted by earlier snapshots are
    anti-joined out first, so delete files never overlap (each live row
    is deleted at most once — what keeps the metadata-only count exact
    and a re-run of the same predicate a no-op). ``file_path`` values in
    delete files are manifest-relative, consistent with every other
    path this tier writes. Returns the new snapshot id (the current one
    if nothing matched)."""
    import pyarrow.parquet as pq

    meta = _load_metadata(table_dir)
    if meta["format-version"] < 2:
        raise IcebergError(
            "row-level deletes need format_version=2 tables")
    version = _next_version(table_dir)
    snap = _resolve_snapshot(meta, None, None)
    files = _live_files(table_dir, snap)
    if not files:
        return meta["current-snapshot-id"]
    paths = [os.path.join(table_dir, f["file_path"]) for f in files]
    # name-mapping scan: pre-evolution files lack added columns (null-
    # filled) and pre-RENAME files store old physical names (coalesced),
    # so the predicate always references the current schema
    hits = (
        _mapped_scan(spark, table_dir, meta, meta["schema"], paths)
        .where(F.expr(predicate))
        .select(
            F.col("__sa_fp").alias("file_path"),
            F.col("__sa_pos").alias("pos"),
        ))
    prior, _n = _position_deletes_df(spark, table_dir, snap)
    if prior is not None:
        hits = hits.join(prior, ["file_path", "pos"], "left_anti")
    snap_id = meta["current-snapshot-id"] + 1
    seq = meta["last-sequence-number"] + 1
    staging = os.path.join(table_dir, f"_staging-del{snap_id:05d}")
    # spec ordering: position delete files sorted by file_path then pos
    hits.sort("file_path", "pos").coalesce(1).write.mode(
        "overwrite").parquet(staging)
    [part] = glob.glob(os.path.join(staging, "part-*.parquet"))
    name = f"s{snap_id:05d}-delete-00000.parquet"
    dst = os.path.join(_data_dir(table_dir), name)
    os.makedirs(_data_dir(table_dir), exist_ok=True)  # migrated tables
    shutil.move(part, dst)
    shutil.rmtree(staging, ignore_errors=True)
    md = pq.read_metadata(dst)
    if md.num_rows == 0:
        os.remove(dst)
        return meta["current-snapshot-id"]
    spec = _resolve_spec(meta)
    ids = {f["name"]: f["id"] for f in _schema_fields(meta)}
    types = {f["name"]: f["type"] for f in _schema_fields(meta)}
    manifest = _write_manifest(
        table_dir, snap_id,
        [{"file_path": os.path.join("data", name),
          "record_count": md.num_rows,
          "file_size_in_bytes": os.path.getsize(dst),
          "partition": None, "bounds": {}}],
        spec, ids, types,
        format_version=2, content=1, sequence_number=seq)
    prior_manifests = _current_manifests(table_dir, meta)
    new_meta = _publish_snapshot(
        table_dir, meta, "delete", prior_manifests + [manifest],
        snap_id, seq)
    _commit_metadata(table_dir, new_meta, version)
    return snap_id


def delete_iceberg_keys(
    spark: SparkSession, table_dir: str, keys_df: DataFrame,
) -> int:
    """Row-level DELETE via v2 EQUALITY DELETE files: each distinct row
    of ``keys_df`` (whose columns must be a subset of the table schema)
    is written to a parquet delete file committed under a delete
    manifest with the spec's ``equality_ids`` (field-id 135). On read, a
    data row is removed when a delete row matches all key columns
    NULL-SAFELY and the data file's sequence number is STRICTLY LESS
    than the delete's — so rows appended AFTER the delete with the same
    key survive, which is exactly what makes ``upsert_iceberg`` (delete
    keys, then append) the spec's CDC pattern. Returns the new snapshot
    id (the current one if ``keys_df`` is empty)."""
    import pyarrow.parquet as pq

    meta = _load_metadata(table_dir)
    if meta["format-version"] < 2:
        raise IcebergError(
            "row-level deletes need format_version=2 tables")
    ids = {f["name"]: f["id"] for f in _schema_fields(meta)}
    unknown = [c for c in keys_df.columns if c not in ids]
    if unknown:
        raise IcebergError(f"unknown equality-delete columns {unknown}")
    version = _next_version(table_dir)
    snap_id = meta["current-snapshot-id"] + 1
    seq = meta["last-sequence-number"] + 1
    staging = os.path.join(table_dir, f"_staging-eqdel{snap_id:05d}")
    keys_df.distinct().coalesce(1).write.mode("overwrite").parquet(staging)
    [part] = glob.glob(os.path.join(staging, "part-*.parquet"))
    name = f"s{snap_id:05d}-eqdelete-00000.parquet"
    dst = os.path.join(_data_dir(table_dir), name)
    os.makedirs(_data_dir(table_dir), exist_ok=True)
    shutil.move(part, dst)
    shutil.rmtree(staging, ignore_errors=True)
    md = pq.read_metadata(dst)
    if md.num_rows == 0:
        os.remove(dst)
        return meta["current-snapshot-id"]
    spec = _resolve_spec(meta)
    types = {f["name"]: f["type"] for f in _schema_fields(meta)}
    manifest = _write_manifest(
        table_dir, snap_id,
        [{"file_path": os.path.join("data", name),
          "record_count": md.num_rows,
          "file_size_in_bytes": os.path.getsize(dst),
          "partition": None, "bounds": {},
          "equality_ids": [ids[c] for c in keys_df.columns]}],
        spec, ids, types,
        format_version=2, content=2, sequence_number=seq)
    prior_manifests = _current_manifests(table_dir, meta)
    new_meta = _publish_snapshot(
        table_dir, meta, "delete", prior_manifests + [manifest],
        snap_id, seq)
    _commit_metadata(table_dir, new_meta, version)
    return snap_id


def upsert_iceberg(
    spark: SparkSession, table_dir: str, df: DataFrame,
    key_cols: list[str],
) -> int:
    """MERGE (upsert) the v2 CDC way: one equality-delete commit on the
    batch's key values, then one append commit — two snapshots, both
    merge-on-read, no data file rewritten. The sequence-number rule does
    the rest: the delete (seq S) kills older versions of the keys
    (seq < S) while the appended rows (seq S+1 > S) survive. A reader
    BETWEEN the two commits sees the keys deleted-but-not-yet-reinserted
    (this tier commits them separately; single-commit delta writes are a
    real-runtime feature). Returns the append's snapshot id."""
    delete_iceberg_keys(spark, table_dir, df.select(*key_cols))
    return append_iceberg(df, table_dir)


def _next_version(table_dir: str) -> int:
    with open(os.path.join(_meta_dir(table_dir), "version-hint.text")) as fh:
        return int(fh.read().strip()) + 1


def _resolve_snapshot(
    meta: dict, snapshot_id: int | None, as_of_ms: int | None
) -> dict:
    snaps = meta["snapshots"]
    if not snaps:
        raise IcebergError("table has no snapshots")
    if snapshot_id is not None:
        for s in snaps:
            if s["snapshot-id"] == snapshot_id:
                return s
        raise IcebergError(f"no snapshot {snapshot_id}")
    if as_of_ms is not None:
        eligible = [s for s in snaps if s["timestamp-ms"] <= as_of_ms]
        if not eligible:
            raise IcebergError(f"no snapshot at or before {as_of_ms}")
        # tie-break toward the NEWER commit when two snapshots share a
        # millisecond (common for back-to-back test commits).
        return max(eligible,
                   key=lambda s: (s["timestamp-ms"], s["snapshot-id"]))
    for s in snaps:
        if s["snapshot-id"] == meta["current-snapshot-id"]:
            return s
    raise IcebergError("current-snapshot-id not in snapshot list")


_PRUNE_OPS = {"<", "<=", ">", ">=", "=", "==", "!="}


def _survives_bounds(
    data_file: dict, predicates: list[tuple],
    ids: dict[str, int], types: dict[str, str],
) -> bool:
    """True unless some predicate PROVES the file can't match: bounds
    are advisory, so a missing bound (old manifest, all-null chunk,
    unsupported type) keeps the file. ``!=`` never prunes (a file whose
    entire range equals v could still be all-null — record-level truth
    belongs to the residual filter)."""
    lower = {e["key"]: e["value"]
             for e in (data_file.get("lower_bounds") or [])}
    upper = {e["key"]: e["value"]
             for e in (data_file.get("upper_bounds") or [])}
    for colname, op, v in predicates:
        fid = ids.get(colname)
        t = types.get(colname)
        if fid is None or not _is_bound_type(t):
            continue
        if fid not in lower or fid not in upper:
            continue
        lo, hi = _bound_value(t, lower[fid]), _bound_value(t, upper[fid])
        try:
            if op == ">=" and hi < v:
                return False
            if op == ">" and hi <= v:
                return False
            if op == "<=" and lo > v:
                return False
            if op == "<" and lo >= v:
                return False
            if op in ("=", "==") and (v < lo or v > hi):
                return False
        except TypeError:
            continue  # incomparable literal: keep the file
    return True


def _survives_partition(
    data_file: dict, predicates: list[tuple], spec: list[dict],
) -> bool:
    """Transform-aware partition pruning: project each predicate on a
    SOURCE column through the partition transforms that consume it (the
    spec's inclusive projection) and compare against the file's recorded
    partition value. Monotonic transforms (identity, truncate,
    year/month/day/hour) project ranges; bucket projects equality only.
    Missing/null partition values and unprojectable literals keep the
    file — pruning must only ever be an optimization (the residual
    filter re-applies the exact predicate row-level)."""
    part = data_file.get("partition") or {}
    for colname, op, v in predicates:
        if v is None:
            continue
        for f in spec:
            if f["source"] != colname:
                continue
            pv = part.get(f["name"])
            if pv is None:
                continue
            if f["kind"] == "bucket":
                if op in ("=", "=="):
                    try:
                        if pv != _transform_value(
                                "bucket", f["param"], v, f["stype"]):
                            return False
                    except (TypeError, ValueError, AttributeError):
                        continue
                continue
            if f["kind"] == "identity":
                # every row in the file carries exactly pv
                try:
                    keep = {"<": pv < v, "<=": pv <= v, ">": pv > v,
                            ">=": pv >= v, "=": pv == v, "==": pv == v,
                            "!=": True}[op]
                except TypeError:
                    continue  # incomparable literal: keep the file
                if not keep:
                    return False
                continue
            try:
                tv = _transform_value(f["kind"], f["param"], v, f["stype"])
            except (TypeError, ValueError, AttributeError):
                continue  # unprojectable literal: keep the file
            if tv is None:
                continue
            if op in ("=", "==") and pv != tv:
                return False
            if op in (">", ">=") and pv < tv:
                return False
            if op in ("<", "<=") and pv > tv:
                return False
    return True


def _live_entries(
    table_dir: str, snapshot: dict, content: int,
    partition_filter: dict | None = None,
) -> list[dict]:
    """Walk manifest list -> manifests of the requested ``content`` kind
    (0 = data, 1 = position deletes); return live file rows (status
    != 2), pruned by identity-partition equality BEFORE any data IO.
    ``partition_filter`` applies only to data entries — position deletes
    are path-matched, so loading them unpruned is always sound."""
    out = []
    for m in _read_manifest_list(table_dir, snapshot["manifest-list"]):
        if m.get("content", 0) != content:
            continue
        with open(os.path.join(table_dir, m["manifest_path"]), "rb") as fh:
            _, rows = read_container(fh.read())
        for status, snap_id, data_file in rows:
            if status == 2:  # DELETED
                continue
            part = data_file["partition"]
            # prune only on fields the file's OWN spec records: a
            # spec-evolved table has files whose partition structs lack
            # the filtered field — those stay (conservative)
            if content == 0 and partition_filter and any(
                k in part and part[k] != v
                for k, v in partition_filter.items()
            ):
                continue
            out.append({"snapshot_id": snap_id,
                        "_seq": m.get("sequence_number", 0),
                        "_spec_id": m.get("partition_spec_id", 0),
                        **data_file})
    return out


def _live_files(
    table_dir: str, snapshot: dict,
    partition_filter: dict | None = None,
) -> list[dict]:
    return _live_entries(table_dir, snapshot, 0, partition_filter)


def _live_delete_files(table_dir: str, snapshot: dict) -> list[dict]:
    return _live_entries(table_dir, snapshot, 1)


def _plan_files_distributed(
    spark: SparkSession, table_dir: str, meta: dict, snap: dict,
    partition_filter: dict | None, predicates: list[tuple] | None,
) -> list[dict]:
    """The manifest-decode stage of ``iceberg_plan_files`` run in
    EXECUTORS — one task per manifest batch, partition/bounds/transform
    pruning applied WHERE the manifest rows are decoded so only the
    surviving (usually tiny) file list crosses back to the driver. Same
    entries as the driver walk minus the bounds payloads, which pruning
    has already consumed (``read_iceberg`` uses only file_path and
    ``_seq`` downstream)."""
    import pandas as pd

    manifests = [m for m in
                 _read_manifest_list(table_dir, snap["manifest-list"])
                 if m.get("content", 0) == 0]
    if not manifests:
        return []
    ids = {f["name"]: f["id"] for f in _schema_fields(meta)}
    types = {f["name"]: f["type"] for f in _schema_fields(meta)}
    specs = _resolve_all_specs(meta)
    preds = list(predicates or [])
    pfilter = dict(partition_filter or {})
    rows = [(os.path.join(table_dir, m["manifest_path"]),
             m.get("sequence_number", 0),
             m.get("partition_spec_id", 0)) for m in manifests]
    mdf = spark.createDataFrame(
        rows, "path string, seq long, spec_id int").repartition(
        min(len(rows), spark.sparkContext.defaultParallelism))
    cols = ["file_path", "record_count", "file_size_in_bytes", "_seq",
            "_spec_id", "partition", "snapshot_id"]

    def decode(batches):
        for pdf in batches:
            out = []
            for path, seq, spec_id in zip(pdf["path"], pdf["seq"],
                                          pdf["spec_id"]):
                sp = specs.get(int(spec_id), [])
                with open(path, "rb") as fh:
                    _, entries = read_container(fh.read())
                for status, snap_id, data_file in entries:
                    if status == 2:
                        continue
                    part = data_file["partition"]
                    if pfilter and any(k in part and part[k] != v
                                       for k, v in pfilter.items()):
                        continue
                    if preds and not _survives_bounds(
                            data_file, preds, ids, types):
                        continue
                    if preds and sp and not _survives_partition(
                            data_file, preds, sp):
                        continue
                    out.append((data_file["file_path"],
                                data_file["record_count"],
                                data_file["file_size_in_bytes"],
                                int(seq), int(spec_id),
                                # default=str: decimal partition values
                                # cross as exact strings, rehydrated by
                                # ptype on the driver below so both
                                # planning regimes return the same shape
                                json.dumps(part, sort_keys=True,
                                           default=str),
                                snap_id))
            yield pd.DataFrame(out, columns=cols)

    got = mdf.mapInPandas(
        decode,
        schema="file_path string, record_count long,"
               " file_size_in_bytes long, _seq long, _spec_id int,"
               " partition string, snapshot_id long").collect()
    ptypes = {sid: {f["name"]: f["ptype"] for f in sp}
              for sid, sp in specs.items()}

    def rehydrate(spec_id: int, part: dict) -> dict:
        out = {}
        for k, v in part.items():
            ps = _decimal_ps(ptypes.get(spec_id, {}).get(k, ""))
            out[k] = (decimal.Decimal(v)
                      if ps and isinstance(v, str) else v)
        return out

    return [{"file_path": r["file_path"],
             "record_count": r["record_count"],
             "file_size_in_bytes": r["file_size_in_bytes"],
             "_seq": r["_seq"],
             "_spec_id": r["_spec_id"],
             "partition": rehydrate(r["_spec_id"],
                                    json.loads(r["partition"])),
             "snapshot_id": r["snapshot_id"]} for r in got]


def iceberg_plan_files(
    table_dir: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    partition_filter: dict | None = None,
    predicates: list[tuple] | None = None,
    spark: SparkSession | None = None,
) -> list[dict]:
    """The planning walk ``read_iceberg`` runs, exposed: resolve the
    snapshot, walk manifest list -> manifests, prune by partition values
    (identity AND transformed, via inclusive projection) and per-file
    min/max bounds. Pure metadata — no parquet file is ever opened.
    ``predicates`` is a list of ``(column, op, value)`` with op in <,
    <=, >, >=, =, !=. When ``spark`` is given and the manifest list's
    ``added_data_files_count`` sums past ``_DISTRIBUTED_PLAN_FILES``
    (metadata-known, like the delete-broadcast switch), the manifest
    decode runs in executors instead of the driver loop — flat planning
    time into the million-file regime."""
    meta = _load_metadata(table_dir)
    for colname, op, _v in predicates or []:
        if op not in _PRUNE_OPS:
            raise IcebergError(f"unsupported predicate op {op!r}")
        if colname not in {f["name"] for f in _schema_fields(meta)}:
            raise IcebergError(f"unknown predicate column {colname!r}")
    if not meta["snapshots"] and snapshot_id is None and as_of_ms is None:
        return []  # staged create: no snapshot, nothing to plan
    snap = _resolve_snapshot(meta, snapshot_id, as_of_ms)
    if spark is not None:
        est = sum(m.get("added_data_files_count", 0)
                  for m in _read_manifest_list(
                      table_dir, snap["manifest-list"])
                  if m.get("content", 0) == 0)
        if est > _DISTRIBUTED_PLAN_FILES:
            return _plan_files_distributed(
                spark, table_dir, meta, snap, partition_filter, predicates)
    files = _live_files(table_dir, snap, partition_filter)
    if predicates:
        ids = {f["name"]: f["id"] for f in _schema_fields(meta)}
        types = {f["name"]: f["type"] for f in _schema_fields(meta)}
        files = [f for f in files
                 if _survives_bounds(f, predicates, ids, types)]
        # per-file spec: a spec-evolved table prunes each file through
        # the spec it was WRITTEN under (manifest partition_spec_id)
        specs = _resolve_all_specs(meta)
        if any(specs.values()):
            files = [f for f in files
                     if _survives_partition(
                         f, predicates,
                         specs.get(f.get("_spec_id", 0), []))]
    return files


def _residual_filter(df: DataFrame, predicates: list[tuple]) -> DataFrame:
    for colname, op, v in predicates:
        c = F.col(colname)
        cond = {"<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v,
                "=": c == v, "==": c == v, "!=": c != v}[op]
        df = df.where(cond)
    return df


def _files_need_mapping(meta: dict, struct: dict,
                        files: list[dict]) -> bool:
    """True when some live data file may physically store a column under
    a name that differs from the target schema — i.e. it was added under
    a snapshot whose schema names any shared field differently. Decided
    from metadata the planner already holds (each entry's adding
    snapshot -> its schema-id), zero extra IO; compaction rewrites every
    live file under the current schema, so it flips this back to False
    and restores the plain single-schema scan."""
    cur = {f["id"]: f["name"] for f in struct["fields"]}
    sid_of = {s["snapshot-id"]: s.get("schema-id", 0)
              for s in meta.get("snapshots", [])}
    structs = {s.get("schema-id", 0): s
               for s in meta.get("schemas", [meta["schema"]])}
    for schema_id in {sid_of.get(f.get("snapshot_id")) for f in files}:
        st = structs.get(schema_id)
        if st is None:
            return True  # unknown provenance: resolve conservatively
        names = {fl["id"]: fl["name"] for fl in st["fields"]}
        if any(names.get(i) not in (None, n) for i, n in cur.items()):
            return True
    return False


def _mapped_scan(
    spark: SparkSession, table_dir: str, meta: dict, struct: dict,
    paths: list[str],
) -> DataFrame:
    """One parquet scan of ``paths`` under the target schema with
    NAME-MAPPING resolution: the scan schema is widened with every
    field's historical aliases (typed like the field, nullable — at most
    one is physically present per file, the rest null-fill) and each
    current column is the coalesce over its name history. Exposes
    ``__sa_fp``/``__sa_pos`` helper columns, derived from ``_metadata``
    BEFORE the coalesce projection (file-source metadata does not
    survive a select) — callers drop them when done."""
    schema = _spark_struct(struct)
    aliases = _historical_aliases(meta, struct)
    by_id = {f["id"]: f for f in struct["fields"]}
    scan_fields = list(schema.fields)
    for fid, old_names in aliases.items():
        t = _spark_type_for(by_id[fid]["type"])
        scan_fields += [T.StructField(n, t, True) for n in old_names]
    df = spark.read.schema(T.StructType(scan_fields)).parquet(*paths)
    sel = []
    for f in struct["fields"]:
        olds = aliases[f["id"]]
        c = (F.coalesce(F.col(f["name"]), *[F.col(n) for n in olds])
             if olds else F.col(f["name"]))
        sel.append(c.alias(f["name"]))
    prefix = _delete_path_prefix(table_dir)
    return (df.withColumn("__sa_fp", F.expr(
                f"substring(_metadata.file_path, {len(prefix) + 1})"))
              .withColumn("__sa_pos", F.col("_metadata.row_index"))
              .select(*sel, "__sa_fp", "__sa_pos"))


def read_iceberg(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    partition_filter: dict | None = None,
    predicates: list[tuple] | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read a snapshot through the metadata tree: one native parquet
    scan over exactly the files the manifests say are live (pruned by
    ``partition_filter`` and by min/max ``predicates`` with zero data
    IO; the predicates are then re-applied as the residual row filter,
    so results are exact). No directory listing ever happens — planning
    cost is O(manifest rows). An empty plan (empty table, or a filter
    that prunes everything) returns an EMPTY DataFrame with the table
    schema, as real Iceberg scans do.

    On v2 tables with position deletes, deleted rows are filtered
    MERGE-ON-READ: an anti-join against the snapshot's delete files on
    (file path, ``_metadata.row_index``) — broadcast when the
    metadata-known delete row count is small, shuffled otherwise.

    On RENAMED tables (``rename_iceberg_column``) the scan schema is
    widened with each field's historical aliases and the current value
    is their coalesce — files written before a rename store the column
    under its old name, which the rename guard keeps unambiguous (the
    spec's name-mapping resolution, in one scan)."""
    meta = _load_metadata(table_dir)
    if ref is not None:
        if snapshot_id is not None or as_of_ms is not None:
            raise IcebergError(
                "pass ONE of snapshot_id / as_of_ms / ref")
        snapshot_id = _ref_snapshot_id(meta, ref)
    if not meta["snapshots"] and snapshot_id is None and as_of_ms is None:
        # staged create (create_iceberg_staged): no snapshot yet, the
        # table reads as empty under its declared schema
        return spark.createDataFrame([], _spark_struct(meta["schema"]))
    files = iceberg_plan_files(
        table_dir, snapshot_id, as_of_ms, partition_filter, predicates,
        spark=spark)
    snap = _resolve_snapshot(meta, snapshot_id, as_of_ms)
    # current reads use the CURRENT table schema (an add-column is
    # metadata-only, no snapshot); explicit time travel reads with the
    # schema the snapshot was committed under.
    struct = (meta["schema"]
              if snapshot_id is None and as_of_ms is None
              else _schema_for_snapshot(meta, snap))
    schema = _spark_struct(struct)
    if not files:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table_dir, f["file_path"]) for f in files]
    if _files_need_mapping(meta, struct, files):
        df = _mapped_scan(spark, table_dir, meta, struct, paths)
    else:
        df = spark.read.schema(schema).parquet(*paths)
    if meta["format-version"] >= 2:
        df = _apply_v2_deletes(spark, table_dir, meta, snap, df, files)
    if "__sa_fp" in df.columns:
        df = df.drop("__sa_fp", "__sa_pos")
    if predicates:
        df = _residual_filter(df, predicates)
    return df


def _apply_v2_deletes(
    spark: SparkSession, table_dir: str, meta: dict, snap: dict,
    df: DataFrame, files: list[dict],
) -> DataFrame:
    """Merge-on-read: anti-join the scan against the snapshot's delete
    files. Position deletes match on (file path, ``_metadata.row_index``);
    equality deletes match null-safely on their key columns, restricted
    by the spec's sequence rule (data seq STRICTLY LESS than delete seq)
    via a metadata-sized broadcast (file -> sequence number) lookup.
    Delete sides broadcast when their metadata-known row counts are
    small."""
    pos, n_pos = _position_deletes_df(spark, table_dir, snap)
    eqs = _equality_delete_entries(table_dir, snap)
    if pos is None and not eqs:
        return df
    prefix = _delete_path_prefix(table_dir)
    cols = df.columns
    if "__sa_fp" not in df.columns:  # rename-aware reads pre-derive them
        df = (
            df.withColumn("__sa_fp", F.expr(
                f"substring(_metadata.file_path, {len(prefix) + 1})"))
            .withColumn("__sa_pos", F.col("_metadata.row_index")))
    if pos is not None:
        if n_pos <= _DELETE_BROADCAST_ROWS:
            pos = F.broadcast(pos)
        df = df.join(
            pos,
            (df["__sa_fp"] == pos["file_path"])
            & (df["__sa_pos"] == pos["pos"]),
            "left_anti",
        )
    if eqs:
        seq_df = F.broadcast(spark.createDataFrame(
            [(f["file_path"], f.get("_seq", 0)) for f in files],
            "file_path string, __sa_seq long"))
        df = (df.join(seq_df, df["__sa_fp"] == seq_df["file_path"],
                      "left")
              .drop(seq_df["file_path"]))
        names = {f["id"]: f["name"] for f in _schema_fields(meta)}
        aliases = _historical_aliases(meta, meta["schema"])
        groups: dict[tuple, list[dict]] = {}
        for e in eqs:
            groups.setdefault(tuple(sorted(e["equality_ids"])),
                              []).append(e)
        for id_tuple, entries in sorted(groups.items()):
            key_cols = [names[i] for i in id_tuple]
            dels = None
            for e in entries:
                one = spark.read.parquet(
                    os.path.join(table_dir, e["file_path"]))
                # a delete file committed BEFORE a rename stores its key
                # columns under the then-current names — resolve through
                # the same history the data scan uses
                sel = []
                for i in id_tuple:
                    phys = names[i] if names[i] in one.columns else next(
                        n for n in aliases.get(i, ())
                        if n in one.columns)
                    sel.append(F.col(phys).alias(names[i]))
                one = (one.select(*sel)
                       .withColumn("__del_seq",
                                   F.lit(e.get("_seq", 0)).cast("long")))
                dels = one if dels is None else dels.unionByName(one)
            if sum(e["record_count"]
                   for e in entries) <= _DELETE_BROADCAST_ROWS:
                dels = F.broadcast(dels)
            cond = dels["__del_seq"] > df["__sa_seq"]
            for c in key_cols:
                cond = cond & df[c].eqNullSafe(dels[c])
            df = df.join(dels, cond, "left_anti")
    return df.select(*cols)


def _all_schema_names(meta: dict) -> dict[str, set[int]]:
    """Every column name that has EVER existed, mapped to the field-ids
    it named across the table's schema history — the collision oracle
    for rename/add guards (a name that once meant a different field
    would make by-name file resolution ambiguous)."""
    out: dict[str, set[int]] = {}
    for s in meta.get("schemas", [meta["schema"]]):
        for f in s["fields"]:
            out.setdefault(f["name"], set()).add(f["id"])
    return out


def _historical_aliases(meta: dict, struct: dict) -> dict[int, list[str]]:
    """For each field-id in the target read schema, the OTHER names the
    field has carried across the schema history (name-mapping
    resolution: files written before a rename store the field under its
    then-current name, and carry no field-ids — the spec's
    ``schema.name-mapping.default`` case). Empty lists when no rename
    ever happened (the fast path)."""
    current = {f["id"]: f["name"] for f in struct["fields"]}
    out: dict[int, list[str]] = {fid: [] for fid in current}
    for s in meta.get("schemas", [meta["schema"]]):
        for f in s["fields"]:
            fid = f["id"]
            if fid in out and f["name"] != current[fid] \
                    and f["name"] not in out[fid]:
                out[fid].append(f["name"])
    return out


def _name_mapping(meta: dict) -> list[dict]:
    """The spec's ``schema.name-mapping.default`` value: every name each
    field-id has carried, so an external field-id-aware reader can
    resolve this tier's id-less parquet files."""
    names: dict[int, list[str]] = {}
    for s in meta.get("schemas", [meta["schema"]]):
        for f in s["fields"]:
            ns = names.setdefault(f["id"], [])
            if f["name"] not in ns:
                ns.append(f["name"])
    return [{"field-id": fid, "names": ns}
            for fid, ns in sorted(names.items())]


def _evolve_schema(meta: dict, new_fields: list[dict]) -> dict:
    """Shared tail of every metadata-only schema commit: a new schema
    struct (schema-id + 1) becomes current, history is appended, and the
    name-mapping property is refreshed."""
    new_schema = {
        "type": "struct",
        "schema-id": meta["current-schema-id"] + 1,
        "fields": new_fields,
    }
    meta = dict(meta)
    meta["current-schema-id"] = new_schema["schema-id"]
    meta["schema"] = new_schema
    meta["schemas"] = meta["schemas"] + [new_schema]
    props = dict(meta.get("properties", {}))
    props["schema.name-mapping.default"] = json.dumps(
        _name_mapping(meta), sort_keys=True)
    meta["properties"] = props
    meta["last-updated-ms"] = int(time.time() * 1000)
    return meta


def rename_iceberg_column(table_dir: str, old: str, new: str) -> int:
    """Schema evolution RENAME: the field keeps its field-id and gets a
    new name in a metadata-only commit — no snapshot, no data file
    touched. Files written before the rename still store the column
    under the old name (this tier's parquet carries no field-ids), so
    reads resolve it through the schema history — the spec's
    name-mapping mechanism, recorded in ``schema.name-mapping.default``
    for external readers too. Bounds, partition specs, and equality
    deletes are all field-id-keyed, so pruning and merge-on-read survive
    the rename untouched. The new name must never have named a DIFFERENT
    field in any historical schema (by-name file resolution would turn
    ambiguous). Returns the new schema-id."""
    meta = _load_metadata(table_dir)
    fields = _schema_fields(meta)
    by_name = {f["name"]: f for f in fields}
    if old not in by_name:
        raise IcebergError(f"unknown column {old!r}")
    if new in by_name:
        raise IcebergError(f"column {new!r} already exists")
    fid = by_name[old]["id"]
    for name, fids in _all_schema_names(meta).items():
        if name == new and fids != {fid}:
            raise IcebergError(
                f"{new!r} historically named field(s) {sorted(fids)} — "
                "reusing it for a different field would make by-name "
                "file resolution ambiguous")
    version = _next_version(table_dir)
    new_fields = [dict(f, name=new) if f["id"] == fid else f
                  for f in fields]
    meta = _evolve_schema(meta, new_fields)
    _commit_metadata(table_dir, meta, version)
    return meta["current-schema-id"]


def drop_iceberg_column(table_dir: str, name: str) -> int:
    """Schema evolution DROP: the field leaves the current schema in a
    metadata-only commit — values stay in the data files (time travel to
    older snapshots still reads them) but current reads project them
    away and writers must stop supplying the column. Partition-spec
    source columns cannot be dropped. The field-id is retired, never
    reused — re-adding the same NAME is refused (``add_iceberg_column``
    guard), so dropped values can never silently resurrect under a new
    field. Returns the new schema-id."""
    meta = _load_metadata(table_dir)
    fields = _schema_fields(meta)
    if name not in {f["name"] for f in fields}:
        raise IcebergError(f"unknown column {name!r}")
    if len(fields) == 1:
        raise IcebergError("cannot drop the only column")
    for pf in _resolve_spec(meta):
        if pf["source"] == name:
            raise IcebergError(
                f"{name!r} is a partition-spec source column")
    version = _next_version(table_dir)
    meta = _evolve_schema(
        meta, [f for f in fields if f["name"] != name])
    _commit_metadata(table_dir, meta, version)
    return meta["current-schema-id"]


def add_iceberg_column(
    table_dir: str, name: str, ice_type: str,
) -> int:
    """Schema evolution, the spec's safe ADD COLUMN: a new OPTIONAL
    field with a fresh field-id (last-column-id + 1) joins the schema as
    a new schema struct (schema-id + 1) in a metadata-only commit — no
    snapshot, no data rewritten. Existing files simply lack the column
    and read back as null (the explicit-schema scan fills it); snapshots
    committed before the add keep their old schema-id, so time travel
    does not show the column retroactively. After the add, writers must
    supply the column (``_new_snapshot`` validates). The name must never
    have named ANOTHER field in the schema history (files store columns
    by name, so a recycled name would resurrect old values under the new
    field-id). Type promotion stays out of scope. Returns the new
    column's field-id."""
    _spark_type_for(ice_type)  # raises on unknown types
    meta = _load_metadata(table_dir)
    fields = _schema_fields(meta)
    if name in {f["name"] for f in fields}:
        raise IcebergError(f"column {name!r} already exists")
    if name in _all_schema_names(meta):
        raise IcebergError(
            f"{name!r} named a different field in a historical schema — "
            "recycling it would resurrect old file values under the new "
            "field-id")
    version = _next_version(table_dir)
    fid = meta["last-column-id"] + 1
    new_schema = {
        "type": "struct",
        "schema-id": meta["current-schema-id"] + 1,
        "fields": fields + [{"id": fid, "name": name,
                             "required": False, "type": ice_type}],
    }
    meta = dict(meta)
    meta["last-column-id"] = fid
    meta["current-schema-id"] = new_schema["schema-id"]
    meta["schema"] = new_schema
    meta["schemas"] = meta["schemas"] + [new_schema]
    meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(table_dir, meta, version)
    return fid


def rewrite_iceberg_files(
    spark: SparkSession, table_dir: str,
    sort_by: list[str] | None = None,
    target_partitions: int | None = None,
) -> int:
    """The spec's ``rewriteDataFiles`` (compaction) maintenance action:
    materialize the current snapshot's merge-on-read view (position AND
    equality deletes applied) and commit it as one REPLACE snapshot —
    purging the accumulated delete debt (the new manifest list carries
    no delete manifests, so reads drop their anti-joins and
    ``iceberg_count`` is metadata-exact again) and optionally laying the
    data out sorted. ``sort_by`` range-partitions + sorts within
    partitions, which TIGHTENS per-file min/max bounds — the standard
    way to make range pruning bite on a hot column. Prior snapshots stay
    time-travelable until ``expire_iceberg_snapshots``. Returns the new
    snapshot id."""
    df = read_iceberg(spark, table_dir)
    if sort_by:
        n = target_partitions or df.rdd.getNumPartitions()
        df = (df.repartitionByRange(n, *[F.col(c) for c in sort_by])
                .sortWithinPartitions(*sort_by))
    elif target_partitions is not None:
        df = df.repartition(target_partitions)
    return overwrite_iceberg(df, table_dir)


def _reachable_paths(table_dir: str, snapshots: list[dict]) -> set[str]:
    """Every table-relative path (manifest lists, manifests, data +
    delete files) reachable from the given snapshots — pure metadata
    walk."""
    out: set[str] = set()
    for s in snapshots:
        out.add(s["manifest-list"])
        for m in _read_manifest_list(table_dir, s["manifest-list"]):
            out.add(m["manifest_path"])
            with open(os.path.join(table_dir, m["manifest_path"]),
                      "rb") as fh:
                _, rows = read_container(fh.read())
            for _status, _sid, data_file in rows:
                out.add(data_file["file_path"])
    return out


def _ref_snapshot_id(meta: dict, ref: str) -> int:
    """Resolve a named ref (spec v2 ``refs`` map) to its snapshot id.
    ``main`` is the implicit branch at the current snapshot."""
    if ref == "main":
        return meta["current-snapshot-id"]
    entry = meta.get("refs", {}).get(ref)
    if entry is None:
        raise IcebergError(
            f"no such ref {ref!r} (known: "
            f"{sorted(meta.get('refs', {})) or 'none'})")
    return entry["snapshot-id"]


def set_iceberg_ref(table_dir: str, name: str,
                    snapshot_id: int | None = None,
                    kind: str = "tag") -> int:
    """Create or move a named snapshot ref (the spec's v2 ``refs``
    map): ``kind="tag"`` is an immutable-history bookmark, ``"branch"``
    a movable head — both retain their snapshot through
    ``expire_iceberg_snapshots`` until the ref is dropped. Defaults to
    the current snapshot. Metadata-only commit; ``main`` is reserved
    (it IS ``current-snapshot-id``). Commits in this tier always go to
    main — a branch ref can be moved (fast-forwarded) with this
    function, but branch-targeted WRITES are out of scope (documented:
    the reference runtime surface has no branch writes either).
    Returns the ref's snapshot id."""
    if kind not in ("tag", "branch"):
        raise IcebergError(f"ref kind must be tag|branch, got {kind!r}")
    if name == "main":
        raise IcebergError("'main' is the implicit current-snapshot ref")
    meta = _load_metadata(table_dir)
    sid = (meta["current-snapshot-id"] if snapshot_id is None
           else snapshot_id)
    if sid not in {s["snapshot-id"] for s in meta["snapshots"]}:
        raise IcebergError(f"no snapshot {sid}")
    existing = meta.get("refs", {}).get(name)
    if existing is not None and existing.get("type") == "tag":
        raise IcebergError(
            f"tag {name!r} already exists (tags are immutable — drop it "
            "first or use a branch)")
    version = _next_version(table_dir)
    meta = dict(meta)
    meta["refs"] = {**meta.get("refs", {}),
                    name: {"snapshot-id": sid, "type": kind}}
    meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(table_dir, meta, version)
    return sid


def drop_iceberg_ref(table_dir: str, name: str) -> None:
    """Remove a named ref (metadata-only commit). The snapshot itself
    stays until expiry stops retaining it."""
    meta = _load_metadata(table_dir)
    if name not in meta.get("refs", {}):
        raise IcebergError(f"no such ref {name!r}")
    version = _next_version(table_dir)
    meta = dict(meta)
    meta["refs"] = {k: v for k, v in meta["refs"].items() if k != name}
    meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(table_dir, meta, version)


def iceberg_refs(table_dir: str) -> dict[str, dict]:
    """The refs map, ``main`` included."""
    meta = _load_metadata(table_dir)
    return {"main": {"snapshot-id": meta["current-snapshot-id"],
                     "type": "branch"},
            **meta.get("refs", {})}


def expire_iceberg_snapshots(
    table_dir: str, keep_last: int | None = None,
    older_than_ms: int | None = None,
) -> dict:
    """The spec's ``expireSnapshots`` maintenance action: drop snapshots
    from the history (the current snapshot is always retained; plus the
    newest ``keep_last``, plus any newer than ``older_than_ms``) and
    physically delete every manifest-list/manifest/data/delete file
    reachable ONLY from the expired ones. Metadata commits FIRST, file
    deletion after — a crash between the two leaves orphans (cleanable
    by ``remove_iceberg_orphans``), never a broken table. Shared files
    (an append chain reuses prior manifests) are kept as long as any
    retained snapshot references them. Returns
    ``{"expired_snapshots": n, "deleted_files": n}``."""
    if keep_last is None and older_than_ms is None:
        raise IcebergError("pass keep_last and/or older_than_ms")
    meta = _load_metadata(table_dir)
    version = _next_version(table_dir)
    snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])
    keep_ids = {meta["current-snapshot-id"]}
    # named refs (tags/branches) retain their snapshots until dropped
    keep_ids.update(r["snapshot-id"] for r in meta.get("refs", {}).values())
    if keep_last is not None:
        keep_ids.update(s["snapshot-id"] for s in snaps[-keep_last:])
    if older_than_ms is not None:
        keep_ids.update(s["snapshot-id"] for s in snaps
                        if s["timestamp-ms"] >= older_than_ms)
    retained = [s for s in snaps if s["snapshot-id"] in keep_ids]
    expired = [s for s in snaps if s["snapshot-id"] not in keep_ids]
    if not expired:
        return {"expired_snapshots": 0, "deleted_files": 0}
    keep_paths = _reachable_paths(table_dir, retained)
    drop_paths = _reachable_paths(table_dir, expired) - keep_paths
    new_meta = dict(meta)
    new_meta["snapshots"] = retained
    new_meta["snapshot-log"] = [
        e for e in meta["snapshot-log"] if e["snapshot-id"] in keep_ids]
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    _commit_metadata(table_dir, new_meta, version)
    deleted = 0
    for rel in sorted(drop_paths):
        try:
            os.remove(os.path.join(table_dir, rel))
            deleted += 1
        except OSError:
            pass  # already gone: expiry is idempotent
    return {"expired_snapshots": len(expired), "deleted_files": deleted}


def remove_iceberg_orphans(table_dir: str) -> list[str]:
    """The spec's ``removeOrphanFiles`` maintenance action: delete files
    under ``data/`` and ``metadata/`` that no snapshot of the CURRENT
    metadata reaches — losing-commit leftovers, crashed-staging debris,
    post-expiry stragglers. This is the ONE place a directory listing is
    correct (it exists to find what the metadata does NOT know about);
    planning still never lists. Metadata version files and the version
    hint are always kept. Returns the deleted table-relative paths."""
    meta = _load_metadata(table_dir)
    keep = _reachable_paths(table_dir, meta["snapshots"])
    removed: list[str] = []
    for sub in ("data", "metadata"):
        root = os.path.join(table_dir, sub)
        for p in sorted(glob.glob(os.path.join(root, "**", "*"),
                                  recursive=True)):
            if os.path.isdir(p):
                continue
            rel = os.path.relpath(p, table_dir)
            base = os.path.basename(p)
            if sub == "metadata" and (
                base == "version-hint.text"
                or (base.startswith("v") and base.endswith(".metadata.json"))
            ):
                continue
            if rel not in keep:
                os.remove(p)
                removed.append(rel)
    return removed


def iceberg_partitions(
    spark: SparkSession, table_dir: str,
    snapshot_id: int | None = None, ref: str | None = None,
) -> DataFrame:
    """The spec's ``partitions`` metadata table: one row per partition
    tuple with ``record_count`` (sum of data-file record counts —
    NOT delete-adjusted, same as real Iceberg's table) and
    ``file_count``. Pure metadata walk, zero data IO. The partition
    tuple is emitted as a sorted-key JSON string (``partition``) so
    tuples from DIFFERENT specs of an evolved table coexist in one
    column; callers project typed fields back out with
    ``get_json_object``. Decimal partition values serialize as their
    exact plain string form."""
    meta = _load_metadata(table_dir)
    if ref is not None:
        if snapshot_id is not None:
            raise IcebergError("pass snapshot_id OR ref, not both")
        snapshot_id = _ref_snapshot_id(meta, ref)
    schema = ("partition string, record_count long, file_count long")
    if not meta["snapshots"] and snapshot_id is None:
        return spark.createDataFrame([], schema)
    snap = _resolve_snapshot(meta, snapshot_id, None)
    agg: dict[str, list[int]] = {}
    for f in _live_files(table_dir, snap):
        key = json.dumps(f["partition"] or {}, sort_keys=True,
                         default=str)
        cur = agg.setdefault(key, [0, 0])
        cur[0] += f["record_count"]
        cur[1] += 1
    rows = [(k, v[0], v[1]) for k, v in sorted(agg.items())]
    return spark.createDataFrame(rows, schema)


def iceberg_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """The spec's ``history`` metadata table: the snapshot log with an
    ``is_current_ancestor`` flag (this tier's history is linear, so
    every retained log entry is an ancestor of the current head)."""
    meta = _load_metadata(table_dir)
    current = meta["current-snapshot-id"]
    retained = {s["snapshot-id"] for s in meta["snapshots"]}
    rows = [(e["timestamp-ms"], e["snapshot-id"],
             e["snapshot-id"] in retained and e["snapshot-id"] <= current)
            for e in meta["snapshot-log"]]
    return spark.createDataFrame(
        rows, "made_current_at_ms long, snapshot_id long,"
              " is_current_ancestor boolean")


def iceberg_manifests(
    spark: SparkSession, table_dir: str,
    snapshot_id: int | None = None, ref: str | None = None,
) -> DataFrame:
    """The spec's ``manifests`` metadata table for one snapshot: path,
    length, spec id, content kind, added counts — straight from the
    manifest list, zero manifest decode."""
    meta = _load_metadata(table_dir)
    if ref is not None:
        if snapshot_id is not None:
            raise IcebergError("pass snapshot_id OR ref, not both")
        snapshot_id = _ref_snapshot_id(meta, ref)
    schema = ("path string, length long, partition_spec_id int,"
              " content int, added_data_files_count int,"
              " added_rows_count long")
    if not meta["snapshots"] and snapshot_id is None:
        return spark.createDataFrame([], schema)
    snap = _resolve_snapshot(meta, snapshot_id, None)
    rows = [(m["manifest_path"], m["manifest_length"],
             m["partition_spec_id"], m.get("content", 0),
             m["added_data_files_count"], m["added_rows_count"])
            for m in _read_manifest_list(table_dir, snap["manifest-list"])]
    return spark.createDataFrame(rows, schema)


def iceberg_snapshots(spark: SparkSession, table_dir: str) -> DataFrame:
    """The snapshot-history metadata table."""
    meta = _load_metadata(table_dir)
    rows = [(s["snapshot-id"], s["timestamp-ms"],
             s["summary"]["operation"], s["manifest-list"])
            for s in meta["snapshots"]]
    return spark.createDataFrame(
        rows, "snapshot_id long, timestamp_ms long, operation string,"
              " manifest_list string")


def iceberg_live_files(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """The file-inventory metadata table for one snapshot."""
    meta = _load_metadata(table_dir)
    snap = _resolve_snapshot(meta, snapshot_id, None)
    rows = [(f["file_path"], f["record_count"], f["file_size_in_bytes"],
             json.dumps(f["partition"], sort_keys=True, default=str))
            for f in _live_files(table_dir, snap, partition_filter)]
    return spark.createDataFrame(
        rows, "file_path string, record_count long,"
              " file_size_bytes long, partition string")


def iceberg_live_files_distributed(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """``iceberg_live_files`` for the MILLION-file regime: the manifest
    LIST (one small row per manifest) still reads driver-side, but the
    manifests themselves — the O(data files) part of the walk — decode
    in EXECUTORS, one task per manifest batch, through the same
    from-scratch Avro reader. This is how real engines plan giant
    tables: at ~20k rows/s/core of pure-Python Avro decode, a 10M-file
    table is ~500 driver-seconds but only seconds wide across a cluster.
    Requires ``table_dir`` on storage the executors can read (the
    tier-wide assumption). Same columns as ``iceberg_live_files``."""
    import pandas as pd

    meta = _load_metadata(table_dir)
    snap = _resolve_snapshot(meta, snapshot_id, None)
    manifests = [m for m in
                 _read_manifest_list(table_dir, snap["manifest-list"])
                 if m.get("content", 0) == 0]
    cols = ["file_path", "record_count", "file_size_bytes", "partition"]
    if not manifests:
        return spark.createDataFrame(
            [], "file_path string, record_count long,"
                " file_size_bytes long, partition string")
    paths = [(os.path.join(table_dir, m["manifest_path"]),)
             for m in manifests]
    mdf = spark.createDataFrame(paths, "path string").repartition(
        min(len(paths), spark.sparkContext.defaultParallelism))
    pfilter = dict(partition_filter or {})

    def decode(batches):
        for pdf in batches:
            out = []
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    _, rows = read_container(fh.read())
                for status, _sid, data_file in rows:
                    if status == 2:
                        continue
                    part = data_file["partition"]
                    if pfilter and any(part.get(k) != v
                                       for k, v in pfilter.items()):
                        continue
                    out.append((data_file["file_path"],
                                data_file["record_count"],
                                data_file["file_size_in_bytes"],
                                json.dumps(part, sort_keys=True,
                                           default=str)))
            yield pd.DataFrame(out, columns=cols)

    return mdf.mapInPandas(
        decode, schema="file_path string, record_count long,"
                       " file_size_bytes long, partition string")


def iceberg_count(
    table_dir: str, snapshot_id: int | None = None,
    partition_filter: dict | None = None,
    ref: str | None = None,
) -> int:
    """Metadata-only COUNT(*): sums manifest ``record_count`` — zero
    data-file IO, the planning-economy property the format exists for.
    Position deletes subtract exactly because this tier's writer never
    lets delete files overlap (``delete_iceberg_rows`` anti-joins prior
    deletes); they are not partition-attributed, so a partition-filtered
    count on a table with deletes must go through ``read_iceberg``."""
    meta = _load_metadata(table_dir)
    if ref is not None:
        if snapshot_id is not None:
            raise IcebergError("pass snapshot_id OR ref, not both")
        snapshot_id = _ref_snapshot_id(meta, ref)
    if partition_filter:
        # a name NO spec ever recorded is a caller error (typo, filter
        # on an unpartitioned table) — distinct from the evolution case
        # below, where the field exists but not in every file's spec
        known = {f["name"] for spec in _resolve_all_specs(meta).values()
                 for f in spec}
        unknown = sorted(set(partition_filter) - known)
        if unknown:
            raise IcebergError(
                f"unknown partition field(s) {unknown}: no partition "
                f"spec of this table records them (known: "
                f"{sorted(known) or 'none — table is unpartitioned'})")
    if not meta["snapshots"] and snapshot_id is None:
        return 0  # staged create: no snapshot, no rows
    snap = _resolve_snapshot(meta, snapshot_id, None)
    live = _live_files(table_dir, snap, partition_filter)
    if partition_filter and any(
            k not in f["partition"] for f in live
            for k in partition_filter):
        raise IcebergError(
            "partition-filtered metadata count is not exact across a "
            "partition-spec evolution (files written under another "
            "spec do not record the filtered field); use "
            "read_iceberg(...).count()")
    n = sum(f["record_count"] for f in live)
    if meta["format-version"] >= 2:
        if _equality_delete_entries(table_dir, snap):
            raise IcebergError(
                "metadata count is not exact under equality deletes "
                "(their record_count is keys, not matched rows); use "
                "read_iceberg(...).count()")
        n_del = sum(f["record_count"]
                    for f in _position_delete_entries(table_dir, snap))
        if n_del and partition_filter:
            raise IcebergError(
                "partition-filtered metadata count is not exact under "
                "position deletes; use read_iceberg(...).count()")
        n -= n_del
    return n


# -- Spark Python Data Source: format("pyiceberg") ----------------------------
#
# The idiomatic front door — spark.read.format("pyiceberg").load(table)
# — on Spark 4's Python Data Source API (the sources/pyds.py pattern).
# Planning runs driver-side through the SAME metadata walk as
# read_iceberg (iceberg_plan_files: snapshot resolution, partition +
# min/max pruning, zero data IO); each surviving data file becomes one
# input partition whose task reads it as ARROW BATCHES via pyarrow
# (never row-at-a-time Python) and applies its own position deletes with
# a parquet-pushdown filter on file_path. read_iceberg stays the fast
# path (native parquet scan); this front door exists for API parity and
# for sessions that want the format(...) surface. Tables carrying
# EQUALITY deletes are rejected here (their null-safe-key anti-join
# belongs to the native path) — use read_iceberg.

try:  # pragma: no cover - import surface depends on pyspark build
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, DataSourceWriter, InputPartition,
        WriterCommitMessage,
    )

    _ICE_TO_ARROW = {
        "long": "int64", "int": "int32", "string": "string",
        "double": "float64", "float": "float32", "boolean": "bool",
        "binary": "binary", "date": "date32",
    }

    def _arrow_schema(schema_struct: dict):
        import pyarrow as pa

        fields = []
        for f in schema_struct["fields"]:
            t = f["type"]
            ps = _decimal_ps(t)
            if t == "timestamptz":
                at = pa.timestamp("us", tz="UTC")
            elif t == "timestamp":
                at = pa.timestamp("us")
            elif t == "date":
                at = pa.date32()
            elif ps:
                at = pa.decimal128(*ps)
            else:
                at = getattr(pa, _ICE_TO_ARROW[t])()
            fields.append(pa.field(f["name"], at,
                                   nullable=not f["required"]))
        return pa.schema(fields)

    class _IcebergScanPartition(InputPartition):
        def __init__(self, table_dir: str, rel_path: str,
                     delete_paths: list[str]):
            self.table_dir = table_dir
            self.rel_path = rel_path
            self.delete_paths = delete_paths

    class IcebergDataSource(DataSource):
        """``format("pyiceberg")`` — see the section comment. Options:
        ``path`` (table dir, or use ``.load(dir)``/``.save(dir)``),
        ``snapshot_id``, ``as_of_ms`` (time travel). Writes append or
        overwrite EXISTING unpartitioned tables through the same
        snapshot-commit machinery as ``append_iceberg`` (see
        ``IcebergBatchWriter``); bootstrap and partitioned/transformed
        commits stay with ``create_iceberg``/``append_iceberg``."""

        @classmethod
        def name(cls) -> str:
            return "pyiceberg"

        def _table_dir(self) -> str:
            path = self.options.get("path")
            if not path:
                raise ValueError(
                    "pyiceberg requires a path (use .load(table_dir))")
            return path

        def _snap_args(self) -> tuple[int | None, int | None]:
            sid = self.options.get("snapshot_id")
            ts = self.options.get("as_of_ms")
            ref = self.options.get("ref")
            if ref is not None:
                if sid is not None or ts is not None:
                    raise ValueError(
                        "pass ONE of snapshot_id / as_of_ms / ref")
                sid = _ref_snapshot_id(
                    _load_metadata(self._table_dir()), ref)
            return (int(sid) if sid is not None else None,
                    int(ts) if ts is not None else None)

        def _struct(self) -> dict:
            meta = _load_metadata(self._table_dir())
            sid, ts = self._snap_args()
            if sid is None and ts is None:
                return meta["schema"]
            snap = _resolve_snapshot(meta, sid, ts)
            return _schema_for_snapshot(meta, snap)

        def schema(self):
            return _spark_struct(self._struct())

        def reader(self, schema) -> "IcebergScanReader":
            table_dir = self._table_dir()
            sid, ts = self._snap_args()
            meta = _load_metadata(table_dir)
            snap = _resolve_snapshot(meta, sid, ts)
            if _equality_delete_entries(table_dir, snap):
                raise ValueError(
                    "pyiceberg cannot apply equality deletes; use "
                    "read_iceberg (the native path)")
            files = _live_files(table_dir, snap)
            if _files_need_mapping(meta, self._struct(), files):
                raise ValueError(
                    "pyiceberg resolves columns by physical name and "
                    "live files predate a column rename; use "
                    "read_iceberg (name-mapping resolution) or compact "
                    "first")
            dels = [f["file_path"]
                    for f in _position_delete_entries(table_dir, snap)]
            # DSv2 filter pushdown is opt-in twice over: Spark gates it
            # behind spark.sql.python.filterPushdown.enabled AND a reader
            # that merely IMPLEMENTS pushFilters errors when that conf is
            # off — so the pushdown reader is selected only when the
            # caller asks (.option("pushdown", "true")).
            cls = (IcebergPushdownScanReader
                   if str(self.options.get("pushdown", "false")).lower()
                   == "true" else IcebergScanReader)
            return cls(table_dir, files, dels, self._struct(),
                       _resolve_all_specs(meta))

        def writer(self, schema, overwrite: bool):
            table_dir = self._table_dir()
            if not os.path.exists(_meta_dir(table_dir)):
                raise ValueError(
                    "no iceberg table at this path — create it first "
                    "with create_iceberg (table bootstrap fixes the "
                    "schema, format version, and partition spec; the "
                    "DSv2 writer appends/overwrites EXISTING tables)")
            meta = _load_metadata(table_dir)
            if _resolve_spec(meta):
                raise ValueError(
                    "pyiceberg writes support unpartitioned tables "
                    "only; partitioned commits need the transform "
                    "write path — use append_iceberg/overwrite_iceberg")
            want = {f["name"]: f["type"] for f in _schema_fields(meta)}

            def ice_t(dt):
                try:
                    return _ice_type_of(dt)  # decimals keep (P,S)
                except IcebergError:
                    return None

            got = {f.name: ice_t(f.dataType) for f in schema.fields}
            if got != want:
                raise ValueError(
                    f"dataframe schema {got} does not match the table "
                    f"schema {want}")
            return IcebergBatchWriter(table_dir, meta["schema"],
                                      overwrite)

    class IcebergScanReader(DataSourceReader):
        def __init__(self, table_dir: str, files: list[dict],
                     delete_paths: list[str], schema_struct: dict,
                     specs: dict[int, list[dict]] | None = None):
            self.table_dir = table_dir
            self.files = files
            self.delete_paths = delete_paths
            self.schema_struct = schema_struct
            self.specs = specs or {}
            self.predicates: list[tuple] = []

        def partitions(self):
            files = self.files
            if self.predicates:
                ids = {f["name"]: f["id"]
                       for f in self.schema_struct["fields"]}
                types = {f["name"]: f["type"]
                         for f in self.schema_struct["fields"]}
                files = [f for f in files if _survives_bounds(
                    f, self.predicates, ids, types)]
                if any(self.specs.values()):
                    # transform-aware inclusive projection, per-file
                    # spec — same rule as read_iceberg's planner
                    files = [f for f in files if _survives_partition(
                        f, self.predicates,
                        self.specs.get(f.get("_spec_id", 0), []))]
            return [_IcebergScanPartition(self.table_dir, f["file_path"],
                                          self.delete_paths)
                    for f in files]


        def read(self, partition: "_IcebergScanPartition"):
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            if partition is None:  # everything pruned: empty scan
                return iter(())
            tbl = pq.read_table(
                os.path.join(partition.table_dir, partition.rel_path))
            if partition.delete_paths:
                dead: list = []
                for rel in partition.delete_paths:
                    dt = pq.read_table(
                        os.path.join(partition.table_dir, rel),
                        filters=[("file_path", "=", partition.rel_path)])
                    dead.extend(dt.column("pos").to_pylist())
                if dead:
                    keep = np.ones(tbl.num_rows, dtype=bool)
                    keep[np.asarray(dead, dtype=np.int64)] = False
                    tbl = tbl.filter(pa.array(keep))
            target = _arrow_schema(self.schema_struct)
            # schema evolution: files predating an add-column lack the
            # field — null-fill, then cast to the exact target schema
            for name in target.names:
                if name not in tbl.column_names:
                    tbl = tbl.append_column(
                        name, pa.nulls(tbl.num_rows,
                                       target.field(name).type))
            tbl = tbl.select(target.names).cast(target)
            return iter(tbl.to_batches(max_chunksize=1 << 16))

    class IcebergPushdownScanReader(IcebergScanReader):
        """``IcebergScanReader`` plus Spark 4.1 DSv2 filter pushdown:
        comparison filters on stats-bounded columns become manifest
        min/max predicates, and filters on PARTITION-TRANSFORM source
        columns additionally project through each file's own spec
        (bucket equality, monotonic ranges) — both PRUNE INPUT
        PARTITIONS (whole files) before any read task launches. Every
        filter is also returned as residual — the pruning is file-level
        and advisory, rows inside surviving files still need Spark's
        own filter (the same prune-then-residual contract as
        ``read_iceberg``). Selected via ``.option("pushdown", "true")``;
        also requires ``spark.sql.python.filterPushdown.enabled=true``."""

        def pushFilters(self, filters):
            from pyspark.sql.datasource import (
                EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                LessThanOrEqual,
            )

            ops = {EqualTo: "=", GreaterThan: ">",
                   GreaterThanOrEqual: ">=", LessThan: "<",
                   LessThanOrEqual: "<="}
            types = {f["name"]: f["type"]
                     for f in self.schema_struct["fields"]}
            spec_sources = {pf["source"] for sp in self.specs.values()
                            for pf in sp}
            for f in filters:
                op = ops.get(type(f))
                if (op is not None and len(f.attribute) == 1
                        and (_is_bound_type(types.get(f.attribute[0]))
                             or f.attribute[0] in spec_sources)):
                    self.predicates.append(
                        (f.attribute[0], op, f.value))
                yield f  # always residual: file-level pruning only

    class _IceWriteResult(WriterCommitMessage):
        def __init__(self, files: list[str]):
            self.files = files

    class IcebergBatchWriter(DataSourceWriter):
        """``df.write.format("pyiceberg").mode("append"|"overwrite")
        .save(table_dir)`` — the DSv2 half of the snapshot-commit
        protocol. Each task writes ONE parquet data file (arrow, never
        row-at-a-time encoding) under a uuid name and reports it; the
        driver-side ``commit`` harvests footer stats and publishes ONE
        snapshot through the same manifest machinery as
        ``append_iceberg`` — so a racing writer loses at the
        metadata.json O_EXCL commit, exactly like the native path, and
        its orphan files stay cleanable by ``remove_iceberg_orphans``.
        ``abort`` removes the files reported by completed tasks."""

        def __init__(self, table_dir: str, schema_struct: dict,
                     overwrite: bool):
            self.table_dir = table_dir
            self.schema_struct = schema_struct
            self.overwrite = overwrite

        def write(self, iterator) -> "_IceWriteResult":
            import itertools

            import pyarrow as pa
            import pyarrow.parquet as pq

            names = [f["name"] for f in self.schema_struct["fields"]]
            arrow = _arrow_schema(self.schema_struct)
            # consume the task iterator in bounded chunks into
            # successive record batches through ONE ParquetWriter (one
            # output file per task) — never a whole-partition Python
            # list, whose O(rows) object memory defeats the arrow-batch
            # contract for large appends
            name = f"dsw-{uuid.uuid4().hex}.parquet"
            path = os.path.join(_data_dir(self.table_dir), name)
            writer = None
            try:
                while True:
                    chunk = list(itertools.islice(iterator, 65536))
                    if not chunk:
                        break
                    batch = pa.RecordBatch.from_pylist(
                        [{c: row[c] for c in names} for row in chunk],
                        schema=arrow)
                    if writer is None:
                        os.makedirs(_data_dir(self.table_dir),
                                    exist_ok=True)
                        writer = pq.ParquetWriter(path, arrow)
                    writer.write_batch(batch)
            finally:
                if writer is not None:
                    writer.close()
            if writer is None:
                return _IceWriteResult([])
            return _IceWriteResult([name])

        def commit(self, messages) -> None:
            import pyarrow.parquet as pq

            names = [n for m in messages if m for n in m.files]
            meta = _load_metadata(self.table_dir)
            version = _next_version(self.table_dir)
            ids = {f["name"]: f["id"] for f in _schema_fields(meta)}
            types = {f["name"]: f["type"] for f in _schema_fields(meta)}
            bound_types = {c: t for c, t in types.items()
                           if _is_bound_type(t)}
            entries = []
            for name in sorted(names):
                p = os.path.join(_data_dir(self.table_dir), name)
                md = pq.read_metadata(p)
                entries.append({
                    "file_path": os.path.join("data", name),
                    "record_count": md.num_rows,
                    "file_size_in_bytes": os.path.getsize(p),
                    "partition": None,
                    "bounds": _file_bounds(md, bound_types),
                })
            if not entries and not self.overwrite:
                return  # empty append: no snapshot
            fv = meta["format-version"]
            snap_id = meta["current-snapshot-id"] + 1
            seq = meta.get("last-sequence-number", 0) + 1
            manifest = _write_manifest(
                self.table_dir, snap_id, entries, [], ids, types,
                format_version=fv, content=0, sequence_number=seq)
            prior = ([] if self.overwrite
                     else _current_manifests(self.table_dir, meta))
            new_meta = _publish_snapshot(
                self.table_dir, meta,
                "overwrite" if self.overwrite else "append",
                prior + [manifest], snap_id, seq)
            _commit_metadata(self.table_dir, new_meta, version)

        def abort(self, messages) -> None:
            for m in messages or []:
                for name in getattr(m, "files", []) if m else []:
                    try:
                        os.remove(os.path.join(
                            _data_dir(self.table_dir), name))
                    except OSError:
                        pass

except ImportError:  # pragma: no cover
    IcebergDataSource = None  # type: ignore[assignment]
