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

Implemented (format-version 1, Hadoop-catalog layout with
``version-hint.text``):

* ``create_iceberg`` / ``append_iceberg`` / ``overwrite_iceberg`` —
  snapshot-per-commit writers (append reuses prior manifests untouched —
  O(new files) metadata per commit; overwrite publishes a manifest list
  referencing only the new manifest);
* identity partitioning on one column (``partition_by=``): partition
  values recorded on every manifest row per the spec;
* ``read_iceberg`` — snapshot resolution (current / by id / by
  timestamp), manifest-list -> manifest walk through the repo's own Avro
  decoder, file-level identity-partition pruning, then one native
  parquet scan of exactly the surviving files;
* ``iceberg_snapshots`` / ``iceberg_live_files`` — the history and
  file-inventory metadata tables;
* ``iceberg_count`` — metadata-only row count (sum of manifest
  ``record_count``), zero data IO.

Manifest Avro schemas carry the spec's ``field-id`` attributes, so the
files are shaped for a real Iceberg runtime; like the Delta tier, what
an external jar runtime would do with them cannot be executed in this
container — the honest claim is round-trip + independent-decoder
verification (tests/test_iceberg.py).

Deliberate scope bounds: format-version 1 (no sequence-number /
delete-file machinery), single identity partition column, and no
column-bound stats in manifests (``record_count`` / sizes only).
"""

from __future__ import annotations

import glob
import io
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .avro import read_container, write_container

_FORMAT_VERSION = 1
_BLOCK_SIZE = 67108864  # deprecated-but-required v1 field

_SPARK_TO_ICE = {
    "long": "long", "integer": "int", "string": "string",
    "double": "double", "float": "float", "boolean": "boolean",
    "binary": "binary", "date": "date", "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}


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
        t = f.dataType.typeName()
        if t not in _SPARK_TO_ICE:
            raise IcebergError(f"no iceberg mapping for spark type {t!r}")
        fields.append({
            "id": i, "name": f.name, "required": not f.nullable,
            "type": _SPARK_TO_ICE[t],
        })
        ids[f.name] = i
    return {"type": "struct", "schema-id": 0, "fields": fields}, ids


def _manifest_schema(partition_by: str | None, ptype: str) -> dict:
    pfields = []
    if partition_by is not None:
        avro_t = {"long": "long", "int": "int", "string": "string",
                  "double": "double", "float": "float",
                  "boolean": "boolean"}.get(ptype)
        if avro_t is None:
            raise IcebergError(
                f"unsupported identity partition type {ptype!r}")
        pfields.append({"name": partition_by, "type": ["null", avro_t],
                        "field-id": 1000})
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "field-id": 1},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "field-id": 102, "type": {
                        "type": "record", "name": "r102",
                        "fields": pfields}},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "block_size_in_bytes", "type": "long",
                     "field-id": 105},
                ]}},
        ]}


_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int",
         "field-id": 504},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
    ]}


def _write_data_files(
    df: DataFrame, table_dir: str, tag: str, partition_by: str | None
) -> list[dict]:
    """Write parquet data files and return one dict per file:
    file_path (relative), record_count, file_size_in_bytes, partition
    value. Identity partitioning writes one spark job per partition
    value — the partition domain is bounded by definition (it IS the
    thing a table is partitioned by), the same bounded-driver-loop
    contract as the level-parallel copier."""
    import pyarrow.parquet as pq

    os.makedirs(_data_dir(table_dir), exist_ok=True)
    staging_root = os.path.join(table_dir, f"_staging-{tag}")
    groups: list[tuple[object, DataFrame]] = []
    if partition_by is None:
        groups.append((None, df))
    else:
        values = [r[0] for r in
                  df.select(partition_by).distinct().orderBy(
                      partition_by).collect()]
        for v in values:
            groups.append((v, df.where(F.col(partition_by) == F.lit(v))))
    files: list[dict] = []
    seq = 0
    for pval, part_df in groups:
        staging = os.path.join(staging_root, str(seq))
        part_df.write.mode("overwrite").parquet(staging)
        for src in sorted(glob.glob(os.path.join(staging, "part-*.parquet"))):
            name = f"{tag}-{seq:05d}.parquet"
            dst = os.path.join(_data_dir(table_dir), name)
            shutil.move(src, dst)
            md = pq.read_metadata(dst)
            files.append({
                "file_path": os.path.join("data", name),
                "record_count": md.num_rows,
                "file_size_in_bytes": os.path.getsize(dst),
                "partition": pval,
            })
            seq += 1
    shutil.rmtree(staging_root, ignore_errors=True)
    return files


def _write_manifest(
    table_dir: str, snapshot_id: int, files: list[dict],
    partition_by: str | None, ptype: str,
) -> dict:
    schema = _manifest_schema(partition_by, ptype)
    name = f"manifest-{snapshot_id:05d}.avro"
    path = os.path.join(_meta_dir(table_dir), name)
    rows = []
    for f in files:
        part = ({} if partition_by is None
                else {partition_by: f["partition"]})
        rows.append((1, snapshot_id, {  # status 1 = ADDED
            "file_path": f["file_path"],
            "file_format": "PARQUET",
            "partition": part,
            "record_count": f["record_count"],
            "file_size_in_bytes": f["file_size_in_bytes"],
            "block_size_in_bytes": _BLOCK_SIZE,
        }))
    buf = io.BytesIO()
    write_container(buf, schema, iter(rows))
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())
    return {
        "manifest_path": os.path.join("metadata", name),
        "manifest_length": len(buf.getvalue()),
        "partition_spec_id": 0,
        "added_snapshot_id": snapshot_id,
        "added_data_files_count": len(files),
        "added_rows_count": sum(f["record_count"] for f in files),
    }


def _write_manifest_list(
    table_dir: str, snapshot_id: int, manifests: list[dict]
) -> str:
    name = f"snap-{snapshot_id:05d}.avro"
    path = os.path.join(_meta_dir(table_dir), name)
    rows = [tuple(m[f["name"]] for f in _MANIFEST_LIST_SCHEMA["fields"])
            for m in manifests]
    buf = io.BytesIO()
    write_container(buf, _MANIFEST_LIST_SCHEMA, iter(rows))
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
    if meta.get("format-version") != _FORMAT_VERSION:
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


def _new_snapshot(
    df: DataFrame, table_dir: str, meta: dict, operation: str,
    prior_manifests: list[dict],
) -> dict:
    pspec = meta["partition-specs"][0]["fields"]
    partition_by = pspec[0]["name"] if pspec else None
    ptype = meta.get("_sa-partition-type", "string")
    snap_id = meta["current-snapshot-id"] + 1
    files = _write_data_files(
        df, table_dir, f"s{snap_id:05d}", partition_by)
    manifest = _write_manifest(
        table_dir, snap_id, files, partition_by, ptype)
    mlist = _write_manifest_list(
        table_dir, snap_id, prior_manifests + [manifest])
    now = int(time.time() * 1000)
    meta = dict(meta)
    meta["current-snapshot-id"] = snap_id
    meta["last-updated-ms"] = now
    meta["snapshots"] = meta["snapshots"] + [{
        "snapshot-id": snap_id, "timestamp-ms": now,
        "manifest-list": mlist, "schema-id": 0,
        "summary": {"operation": operation},
    }]
    meta["snapshot-log"] = meta["snapshot-log"] + [
        {"snapshot-id": snap_id, "timestamp-ms": now}]
    return meta


def create_iceberg(
    df: DataFrame, table_dir: str, partition_by: str | None = None
) -> int:
    """Create a new Iceberg table from ``df``; returns the snapshot id.
    ``partition_by`` records identity partition values on every manifest
    row (the pruning key)."""
    if os.path.exists(_meta_dir(table_dir)):
        raise IcebergError(f"table already exists at {table_dir}")
    schema, ids = _ice_schema(df)
    ptype = "string"
    if partition_by is not None:
        if partition_by not in ids:
            raise IcebergError(f"unknown partition column {partition_by!r}")
        ptype = dict(
            (f.name, f.dataType.typeName()) for f in df.schema.fields
        )[partition_by]
        ptype = {"long": "long", "integer": "int"}.get(ptype, ptype)
    spec_fields = [] if partition_by is None else [{
        "name": partition_by, "transform": "identity",
        "source-id": ids[partition_by], "field-id": 1000,
    }]
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    meta = {
        "format-version": _FORMAT_VERSION,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     os.path.abspath(table_dir))),
        "location": os.path.abspath(table_dir),
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": len(ids),
        "schema": schema, "schemas": [schema], "current-schema-id": 0,
        "partition-spec": spec_fields,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "_sa-partition-type": ptype,
        "current-snapshot-id": 0,
        "snapshots": [], "snapshot-log": [],
    }
    meta = _new_snapshot(df, table_dir, meta, "append", [])
    _commit_metadata(table_dir, meta, 1)
    return meta["current-snapshot-id"]


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
        return max(eligible, key=lambda s: s["timestamp-ms"])
    for s in snaps:
        if s["snapshot-id"] == meta["current-snapshot-id"]:
            return s
    raise IcebergError("current-snapshot-id not in snapshot list")


def _live_files(
    table_dir: str, snapshot: dict,
    partition_filter: dict | None = None,
) -> list[dict]:
    """Walk manifest list -> manifests; return live data-file rows
    (status != 2), pruned by identity-partition equality BEFORE any
    data IO."""
    out = []
    for m in _read_manifest_list(table_dir, snapshot["manifest-list"]):
        with open(os.path.join(table_dir, m["manifest_path"]), "rb") as fh:
            _, rows = read_container(fh.read())
        for status, snap_id, data_file in rows:
            if status == 2:  # DELETED
                continue
            part = data_file["partition"]
            if partition_filter and any(
                part.get(k) != v for k, v in partition_filter.items()
            ):
                continue
            out.append({"snapshot_id": snap_id, **data_file})
    return out


def read_iceberg(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Read a snapshot through the metadata tree: one native parquet
    scan over exactly the files the manifests say are live (pruned by
    ``partition_filter`` with zero data IO). No directory listing ever
    happens — planning cost is O(manifest rows)."""
    meta = _load_metadata(table_dir)
    snap = _resolve_snapshot(meta, snapshot_id, as_of_ms)
    files = _live_files(table_dir, snap, partition_filter)
    if not files:
        raise IcebergError("snapshot has no matching data files")
    paths = [os.path.join(table_dir, f["file_path"]) for f in files]
    return spark.read.parquet(*paths)


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
             json.dumps(f["partition"], sort_keys=True))
            for f in _live_files(table_dir, snap, partition_filter)]
    return spark.createDataFrame(
        rows, "file_path string, record_count long,"
              " file_size_bytes long, partition string")


def iceberg_count(
    table_dir: str, snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> int:
    """Metadata-only COUNT(*): sums manifest ``record_count`` — zero
    data-file IO, the planning-economy property the format exists for."""
    meta = _load_metadata(table_dir)
    snap = _resolve_snapshot(meta, snapshot_id, None)
    return sum(f["record_count"]
               for f in _live_files(table_dir, snap, partition_filter))
