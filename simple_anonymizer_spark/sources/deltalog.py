"""A minimal, pure-Python Delta Lake transaction log — executed MERGE
without the Delta jars.

The container has no network, no delta-spark wheel, and no jars, but the
Delta *format* is a public specification
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md): a parquet
file set plus an ordered ``_delta_log/{version:020d}.json`` action log
(``protocol`` / ``metaData`` / ``add`` / ``remove`` / ``commitInfo``
actions, one JSON object per line). This module implements the slice of
that spec needed for ACID MERGE:

* **snapshot isolation** — a read replays the log up to a pinned version;
  active files = adds minus removes, in log order;
* **optimistic concurrency** — a commit creates its version file with
  ``O_CREAT|O_EXCL`` (atomic on POSIX); a loser gets
  :class:`DeltaConcurrentModification` and replays against the new state;
* **file-skipping MERGE** — per-file min/max stats (from parquet footers,
  recorded in ``add.stats`` per the spec) prune the rewrite set to files
  whose first-merge-key range overlaps the source's; untouched files are
  neither removed nor rewritten — the property that makes MERGE viable on
  a 100 TB table where the source touches one key range;
* **time travel** — ``read_deltalog(..., version=N)``.

The relational plan underneath is byte-identical to
``merge.merge_dataframes`` (oracle-gated via ``merge_upsert``); this
module contributes only the transactional sink. Tables written here use
``minReaderVersion=1`` / ``minWriterVersion=2`` and no advanced table
features, so a real delta-spark runtime can read them as-is.

Also implemented: OPTIMIZE / OPTIMIZE ZORDER BY (``optimize_table``,
dataChange=false rearrangement commits), additive schema evolution
(``merge_schema=True``), a Change Data Feed (``change_data=True`` writes
``cdc`` actions under ``_change_data/``; ``table_changes`` replays them,
deriving inserts from plain-add commits per the spec's fallback), and a
version-window ``vacuum``.

Also implemented (spec §Checkpoints): parquet checkpoint files —
``write_checkpoint`` snapshots the full state into
``_delta_log/{v:020d}.checkpoint.parquet`` (spec-shaped struct columns,
so a jar runtime consumes it) plus the ``_last_checkpoint`` pointer;
``snapshot()`` replays from the newest checkpoint at or below the
target version, making replay O(commits since checkpoint) instead of
O(all commits). ``merge_deltalog`` auto-checkpoints every
``checkpoint_interval`` commits. And RESTORE (``restore_table``): a
commit that re-adds the target version's files and removes the rest —
time travel made durable, refusing if a needed data file was vacuumed.

Deliberate scope bound: unpartitioned tables only (``partition_by``
raises — partitionValues plumbing is the jar runtime's job).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from ..plans.on_conflict import OnConflict

LOG_DIR = "_delta_log"
PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}
# Columns eligible for stats-based pruning (orderable primitives whose
# JSON round-trip is lossless).
_STATS_TYPES = (ST.ByteType, ST.ShortType, ST.IntegerType, ST.LongType,
                ST.FloatType, ST.DoubleType, ST.StringType)


class DeltaLogError(Exception):
    pass


class DeltaConcurrentModification(DeltaLogError):
    """Another writer committed the version this transaction targeted."""


@dataclass
class Snapshot:
    version: int          # -1 when the table does not exist yet
    metadata: dict | None
    files: list[dict] = field(default_factory=list)  # add actions, live


class PyDeltaLog:
    def __init__(self, path: str):
        self.path = str(path)
        self.log_path = os.path.join(self.path, LOG_DIR)

    # -- log replay ---------------------------------------------------------

    def _version_file(self, v: int) -> str:
        return os.path.join(self.log_path, f"{v:020d}.json")

    def latest_version(self) -> int:
        if not os.path.isdir(self.log_path):
            return -1
        versions = [
            int(f[:20]) for f in os.listdir(self.log_path)
            if f.endswith(".json") and f[:20].isdigit()
        ]
        return max(versions, default=-1)

    def checkpoint_versions(self) -> list[int]:
        if not os.path.isdir(self.log_path):
            return []
        return sorted(
            int(f[:20]) for f in os.listdir(self.log_path)
            if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
        )

    def _checkpoint_file(self, v: int) -> str:
        return os.path.join(self.log_path, f"{v:020d}.checkpoint.parquet")

    def snapshot(self, version: int | None = None) -> Snapshot:
        latest = self.latest_version()
        if latest < 0:
            return Snapshot(version=-1, metadata=None)
        v = latest if version is None else version
        if v > latest or v < 0:
            raise DeltaLogError(f"version {v} not in log (latest {latest})")
        metadata = None
        live: dict[str, dict] = {}  # path -> add action, insertion-ordered
        # Start from the newest checkpoint at or below v; JSON-replay the
        # rest. Versions below every checkpoint still replay from 0.
        start = 0
        cps = [c for c in self.checkpoint_versions() if c <= v]
        if cps:
            cp = cps[-1]
            metadata, live = _read_checkpoint(self._checkpoint_file(cp))
            start = cp + 1
        for i in range(start, v + 1):
            with open(self._version_file(i), encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "metaData" in action:
                        metadata = action["metaData"]
                    elif "add" in action:
                        live[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        live.pop(action["remove"]["path"], None)
        return Snapshot(version=v, metadata=metadata, files=list(live.values()))

    def write_checkpoint(self, version: int | None = None) -> int:
        """Write the spec-shaped parquet checkpoint for ``version``
        (default: latest) plus the ``_last_checkpoint`` pointer.
        Idempotent — re-checkpointing a version rewrites the same state;
        concurrent writers at different versions never conflict because
        the file name carries the version."""
        snap = self.snapshot(version)
        if snap.version < 0:
            raise DeltaLogError("cannot checkpoint a non-existent table")
        n = _write_checkpoint_file(
            self._checkpoint_file(snap.version), snap
        )
        pointer = os.path.join(self.log_path, "_last_checkpoint")
        tmp = pointer + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"version": snap.version, "size": n}, fh)
        os.replace(tmp, pointer)  # atomic pointer swap
        return snap.version

    # -- commits ------------------------------------------------------------

    def commit(self, actions: list[dict], read_version: int) -> int:
        """Atomically write ``read_version + 1``. ``O_CREAT|O_EXCL`` makes
        the version file the lock: exactly one writer wins each version."""
        os.makedirs(self.log_path, exist_ok=True)
        v = read_version + 1
        try:
            fd = os.open(
                self._version_file(v),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            raise DeltaConcurrentModification(
                f"version {v} already committed by another writer"
            ) from None
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            for action in actions:
                fh.write(json.dumps(action, separators=(",", ":")) + "\n")
        return v

    def create_actions(self, schema: ST.StructType) -> list[dict]:
        return [
            {"protocol": dict(PROTOCOL)},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": int(time.time() * 1000),
                }
            },
        ]


# ---------------------------------------------------------------------------
# Checkpoint parquet I/O (PROTOCOL.md §Checkpoints) — spec-shaped struct
# columns so a jar-backed reader can consume the file; one action per row,
# exactly one of the struct columns non-null.
# ---------------------------------------------------------------------------


def _checkpoint_arrow_schema():
    import pyarrow as pa

    return pa.schema([
        pa.field("protocol", pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
        ])),
        pa.field("metaData", pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([
                ("provider", pa.string()),
                ("options", pa.map_(pa.string(), pa.string())),
            ])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ])),
        pa.field("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ])),
    ])


def _write_checkpoint_file(file_path: str, snap: Snapshot) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = snap.metadata
    rows = [
        {"protocol": dict(PROTOCOL), "metaData": None, "add": None},
        {
            "protocol": None,
            "metaData": {
                "id": meta["id"],
                "format": {
                    "provider": meta["format"]["provider"],
                    "options": list(meta["format"].get("options", {}).items()),
                },
                "schemaString": meta["schemaString"],
                "partitionColumns": meta.get("partitionColumns", []),
                "configuration": list(meta.get("configuration", {}).items()),
                "createdTime": meta.get("createdTime"),
            },
            "add": None,
        },
    ]
    for f in snap.files:
        rows.append({
            "protocol": None,
            "metaData": None,
            "add": {
                "path": f["path"],
                "partitionValues": list(
                    f.get("partitionValues", {}).items()
                ),
                "size": f.get("size"),
                "modificationTime": f.get("modificationTime"),
                "dataChange": f.get("dataChange", True),
                "stats": f.get("stats"),
            },
        })
    table = pa.Table.from_pylist(rows, schema=_checkpoint_arrow_schema())
    tmp = file_path + f".tmp.{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.replace(tmp, file_path)
    return len(rows)


def _read_checkpoint(file_path: str) -> tuple[dict | None, dict[str, dict]]:
    import pyarrow.parquet as pq

    metadata = None
    live: dict[str, dict] = {}
    for row in pq.read_table(file_path).to_pylist():
        if row.get("metaData") is not None:
            m = row["metaData"]
            metadata = {
                "id": m["id"],
                "format": {
                    "provider": m["format"]["provider"],
                    "options": dict(m["format"]["options"] or []),
                },
                "schemaString": m["schemaString"],
                "partitionColumns": m["partitionColumns"] or [],
                "configuration": dict(m["configuration"] or []),
                "createdTime": m["createdTime"],
            }
        elif row.get("add") is not None:
            a = row["add"]
            add = {
                "path": a["path"],
                "partitionValues": dict(a["partitionValues"] or []),
                "size": a["size"],
                "modificationTime": a["modificationTime"],
                "dataChange": a["dataChange"],
            }
            if a.get("stats") is not None:
                add["stats"] = a["stats"]
            live[add["path"]] = add
    return metadata, live


def restore_table(path: str, version: int, max_retries: int = 3) -> int:
    """RESTORE the table to ``version`` as a NEW commit (durable time
    travel): re-add the target snapshot's files missing from the current
    one, remove current files absent from the target. Refuses when a
    required data file was vacuumed away (same failure mode as Delta's
    own RESTORE). Returns the new version."""
    path = str(path)
    log = PyDeltaLog(path)
    for attempt in range(max_retries + 1):
        cur = log.snapshot()
        if cur.version < 0:
            raise DeltaLogError(f"no Delta table at {path}")
        target = log.snapshot(version)
        missing = [
            f["path"] for f in target.files
            if not os.path.exists(os.path.join(path, f["path"]))
        ]
        if missing:
            raise DeltaLogError(
                f"cannot RESTORE to version {version}: data files "
                f"{missing} were vacuumed"
            )
        cur_paths = {f["path"] for f in cur.files}
        tgt_paths = {f["path"] for f in target.files}
        actions: list[dict] = [{
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": str(version)},
                "readVersion": cur.version,
                "timestamp": int(time.time() * 1000),
            }
        }]
        if target.metadata and cur.metadata and (
            target.metadata["schemaString"] != cur.metadata["schemaString"]
        ):
            actions.append({"metaData": target.metadata})
        actions += [
            _remove_action(f) for f in cur.files
            if f["path"] not in tgt_paths
        ]
        actions += [
            {"add": dict(f, dataChange=True)} for f in target.files
            if f["path"] not in cur_paths
        ]
        try:
            return log.commit(actions, read_version=cur.version)
        except DeltaConcurrentModification:
            if attempt == max_retries:
                raise
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# Data files
# ---------------------------------------------------------------------------


def _file_stats(file_path: str, schema: ST.StructType) -> str | None:
    """Delta ``add.stats`` JSON from the parquet footer: numRecords +
    min/max/nullCount per eligible top-level column, merged across row
    groups. Footer statistics only — no data scan."""
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(file_path).metadata
    except Exception:  # pragma: no cover - stats are best-effort
        return None
    eligible = {
        f.name for f in schema.fields if isinstance(f.dataType, _STATS_TYPES)
    }
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if name not in eligible:
                continue
            stats = col.statistics
            if stats is None or not stats.has_min_max:
                eligible.discard(name)  # partial stats -> unusable
                continue
            lo, hi = stats.min, stats.max
            if isinstance(lo, bytes):
                eligible.discard(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
            nulls[name] = nulls.get(name, 0) + (stats.null_count or 0)
    payload = {
        "numRecords": meta.num_rows,
        "minValues": {k: v for k, v in mins.items() if k in eligible},
        "maxValues": {k: v for k, v in maxs.items() if k in eligible},
        "nullCount": {k: v for k, v in nulls.items() if k in eligible},
    }
    return json.dumps(payload, separators=(",", ":"))


def _write_data_files(
    spark: SparkSession, df: DataFrame, table_path: str
) -> list[dict]:
    """Materialize ``df`` as parquet files inside the table directory and
    return their ``add`` actions. Spark writes to a staging subdir (full
    cluster parallelism); files are then renamed into place — same-
    filesystem renames, no data copy."""
    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    adds = []
    try:
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            final = f"part-{uuid.uuid4().hex}.snappy.parquet"
            src, dst = os.path.join(staging, name), os.path.join(table_path, final)
            os.rename(src, dst)
            stats = _file_stats(dst, df.schema)
            if stats is not None and json.loads(stats)["numRecords"] == 0:
                # Empty partitions produce zero-row part files; adding them
                # would poison stats pruning (no min/max -> every future
                # merge rewrites them) for zero information.
                os.remove(dst)
                continue
            stat = os.stat(dst)
            adds.append(
                {
                    "add": {
                        "path": final,
                        "partitionValues": {},
                        "size": stat.st_size,
                        "modificationTime": int(stat.st_mtime * 1000),
                        "dataChange": True,
                        "stats": stats,
                    }
                }
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return adds


def _remove_action(add: dict) -> dict:
    return {
        "remove": {
            "path": add["path"],
            "deletionTimestamp": int(time.time() * 1000),
            "dataChange": True,
        }
    }


# ---------------------------------------------------------------------------
# Read path
# ---------------------------------------------------------------------------


def read_deltalog(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot (optionally time-traveled) read of a Delta table."""
    log = PyDeltaLog(path)
    snap = log.snapshot(version)
    if snap.version < 0 or snap.metadata is None:
        raise DeltaLogError(f"no Delta table at {path}")
    schema = ST.StructType.fromJson(json.loads(snap.metadata["schemaString"]))
    if not snap.files:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(path, f["path"]) for f in snap.files]
    return spark.read.schema(schema).parquet(*paths)


# ---------------------------------------------------------------------------
# MERGE
# ---------------------------------------------------------------------------


def _overlapping_files(
    files: list[dict], bounds: dict[str, tuple]
) -> list[dict]:
    """Files whose per-column [min,max] ranges intersect the source's on
    EVERY merge key in ``bounds`` (a file is prunable if it provably
    misses the source range on ANY key); files without usable stats for
    a key skip that key's test (safe side)."""
    if not bounds:
        return list(files)
    out = []
    for f in files:
        stats = f.get("stats")
        try:
            parsed = json.loads(stats) if stats else None
        except (TypeError, ValueError):  # pragma: no cover
            parsed = None
        overlap = True
        for key, (lo, hi) in bounds.items():
            if not parsed or key not in parsed.get("minValues", {}):
                continue
            fmin, fmax = parsed["minValues"][key], parsed["maxValues"][key]
            if fmin > hi or fmax < lo:
                overlap = False
                break
        if overlap:
            out.append(f)
    return out


def _evolve_schema(
    table_schema: ST.StructType, src_schema: ST.StructType
) -> list[ST.StructField]:
    """Source fields absent from the table — the mergeSchema additions
    (appended nullable, table column order preserved). Raises on a
    same-name type clash; type *widening* is the jar runtime's job."""
    existing = {f.name: f for f in table_schema.fields}
    new = []
    for f in src_schema.fields:
        if f.name not in existing:
            new.append(ST.StructField(f.name, f.dataType, nullable=True))
        elif existing[f.name].dataType != f.dataType:
            raise DeltaLogError(
                f"column {f.name!r}: source type {f.dataType.simpleString()} "
                f"!= table type {existing[f.name].dataType.simpleString()}"
            )
    return new


def merge_deltalog(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    on_conflict: OnConflict | None = None,
    partition_by: list[str] | None = None,
    max_retries: int = 3,
    merge_schema: bool = False,
    change_data: bool = False,
    checkpoint_interval: int | None = 10,
) -> int:
    """MERGE ``source`` into the pure-Python Delta table at ``path``;
    returns the merged row count. Semantics match ``merge_parquet`` /
    the JDBC ``ON CONFLICT`` path exactly:

    * first write creates the table (version 0 + data commit);
    * ``on_conflict=None``   -> plain INSERT: append-only commit, no
      removes, duplicates preserved;
    * ``do_nothing``/``do_update`` -> stats-pruned rewrite of only the
      files overlapping the source's key range.

    ``merge_schema=True`` enables additive schema evolution: source
    columns the table lacks are appended (nullable) via a new
    ``metaData`` action in the same commit; rows in untouched files read
    NULL for them (the parquet reader fills missing columns) — Delta's
    own ``mergeSchema`` behavior. Without the flag a wider source raises.

    Losers of a concurrent-commit race replay automatically (up to
    ``max_retries``) against the fresh snapshot — the merge result is
    recomputed, not blindly re-committed.
    """
    from .merge import dedupe_source, merge_dataframes

    if partition_by:
        raise NotImplementedError(
            "partitioned pure-Python Delta tables are out of scope; "
            "use merge_parquet(partition_by=...) or a jar-backed runtime"
        )
    path = str(path)
    log = PyDeltaLog(path)
    source = source.cache()  # both join branches must see identical rows
    try:
        for attempt in range(max_retries + 1):
            snap = log.snapshot()
            try:
                extra_actions: list[dict] = []
                if snap.version >= 0:
                    table_schema = ST.StructType.fromJson(
                        json.loads(snap.metadata["schemaString"])
                    )
                    new_fields = _evolve_schema(table_schema, source.schema)
                    if new_fields and not merge_schema:
                        raise DeltaLogError(
                            f"source adds columns "
                            f"{[f.name for f in new_fields]}; pass "
                            f"merge_schema=True to evolve the table schema"
                        )
                    if new_fields:
                        schema = ST.StructType(
                            list(table_schema.fields) + new_fields
                        )
                        meta = dict(snap.metadata)
                        meta["schemaString"] = schema.json()
                        extra_actions.append({"metaData": meta})
                    else:
                        schema = table_schema
                if snap.version < 0:
                    os.makedirs(path, exist_ok=True)
                    result = (
                        dedupe_source(source, keys) if on_conflict else source
                    )
                    actions = log.create_actions(result.schema)
                    actions += _write_data_files(spark, result, path)
                    log.commit(actions, read_version=-1)
                elif on_conflict is None:
                    aligned = source
                    for f in schema.fields:
                        if f.name not in source.columns:
                            aligned = aligned.withColumn(
                                f.name,
                                F.lit(None).cast(f.dataType),
                            )
                    adds = _write_data_files(
                        spark, aligned.select(*[f.name for f in schema.fields]),
                        path,
                    )
                    log.commit(extra_actions + adds,
                               read_version=snap.version)
                else:
                    statable = [
                        k for k in keys
                        if isinstance(schema[k].dataType, _STATS_TYPES)
                    ]
                    bounds = {}
                    if statable:
                        row = source.selectExpr(
                            *[f"min(`{k}`) as `__lo_{k}`" for k in statable],
                            *[f"max(`{k}`) as `__hi_{k}`" for k in statable],
                        ).collect()[0]
                        bounds = {
                            k: (row[f"__lo_{k}"], row[f"__hi_{k}"])
                            for k in statable
                            if row[f"__lo_{k}"] is not None
                        }
                    touched = _overlapping_files(snap.files, bounds)
                    if touched:
                        # Old files under the (possibly evolved) schema:
                        # the parquet reader fills absent columns with NULL.
                        target = spark.read.schema(schema).parquet(
                            *[os.path.join(path, f["path"]) for f in touched]
                        )
                    else:
                        target = spark.createDataFrame([], schema)
                    aligned = source
                    for f in schema.fields:
                        if f.name not in source.columns:
                            aligned = aligned.withColumn(
                                f.name, F.lit(None).cast(f.dataType)
                            )
                    aligned = aligned.select(*[f.name for f in schema.fields])
                    merged = merge_dataframes(
                        target, aligned, keys, on_conflict
                    )
                    actions = _write_data_files(spark, merged, path)
                    actions += [_remove_action(f) for f in touched]
                    if change_data:
                        changes = _merge_change_rows(
                            target, aligned, keys, on_conflict
                        )
                        actions += _write_cdc_files(spark, changes, path)
                    log.commit(extra_actions + actions,
                               read_version=snap.version)
                break
            except DeltaConcurrentModification:
                if attempt == max_retries:
                    raise
        # Periodic checkpoint keeps replay O(interval); losing a race
        # here is harmless (same-version checkpoints are identical).
        if checkpoint_interval:
            latest = log.latest_version()
            if latest > 0 and latest % checkpoint_interval == 0:
                log.write_checkpoint(latest)
    finally:
        source.unpersist()
    return read_deltalog(spark, path).count()


def history(path: str) -> list[dict]:
    """commitInfo-style view of the log: one dict per version with the
    action counts — enough to audit what each commit did."""
    log = PyDeltaLog(path)
    latest = log.latest_version()
    out = []
    for v in range(latest + 1):
        adds = removes = 0
        with open(log._version_file(v), encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                adds += "add" in action
                removes += "remove" in action
        out.append({"version": v, "numAddedFiles": adds,
                    "numRemovedFiles": removes})
    return out


# ---------------------------------------------------------------------------
# OPTIMIZE — lakehouse maintenance
# ---------------------------------------------------------------------------


def optimize_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder_cols: list[str] | None = None,
    max_retries: int = 3,
) -> dict:
    """Compact small files (and optionally re-cluster along a Z-order
    curve) — the OPTIMIZE / OPTIMIZE ZORDER BY maintenance operation.

    Per the Delta spec, rearrangement commits carry ``dataChange: false``
    on every add and remove: the logical table is untouched, only the
    physical layout changes. Without ``zorder_cols`` the rewrite set is
    just the files under ``target_file_bytes`` (bin-packed via coalesce —
    no shuffle); with ``zorder_cols`` every live file rewrites through
    ``layout.zorder_by`` so parquet row-group stats (and this log's own
    ``add.stats``) prune multi-column predicates afterwards.

    Returns ``{"version", "filesAdded", "filesRemoved"}``; a no-op
    (nothing worth compacting) returns version unchanged with zeros.

    Scale (100 TB): streaming MERGE ingestion accretes small files —
    compaction is what keeps scan task counts and footer overhead
    bounded. The rewrite reads only the compaction set; concurrent
    writers are safe (optimistic replay recomputes against the fresh
    snapshot on conflict).
    """
    from ..operators.layout import zorder_by

    log = PyDeltaLog(path)
    for attempt in range(max_retries + 1):
        snap = log.snapshot()
        if snap.version < 0 or snap.metadata is None:
            raise DeltaLogError(f"no Delta table at {path}")
        if zorder_cols:
            todo = list(snap.files)
        else:
            todo = [f for f in snap.files if f["size"] < target_file_bytes]
            if len(todo) < 2:
                return {"version": snap.version, "filesAdded": 0,
                        "filesRemoved": 0}
        if not todo:
            return {"version": snap.version, "filesAdded": 0,
                    "filesRemoved": 0}
        schema = ST.StructType.fromJson(
            json.loads(snap.metadata["schemaString"])
        )
        df = spark.read.schema(schema).parquet(
            *[os.path.join(path, f["path"]) for f in todo]
        )
        total = sum(f["size"] for f in todo)
        n_out = max(1, -(-total // target_file_bytes))
        if zorder_cols:
            out = zorder_by(df, zorder_cols, partitions=n_out)
        else:
            out = df.coalesce(n_out)
        adds = _write_data_files(spark, out, path)
        for a in adds:
            a["add"]["dataChange"] = False
        removes = [_remove_action(f) for f in todo]
        for r in removes:
            r["remove"]["dataChange"] = False
        try:
            v = log.commit(adds + removes, read_version=snap.version)
            return {"version": v, "filesAdded": len(adds),
                    "filesRemoved": len(removes)}
        except DeltaConcurrentModification:
            # Lost the race: the just-written files are orphans (never
            # referenced by any committed version) — remove them and
            # replay against the new snapshot.
            for a in adds:
                try:
                    os.remove(os.path.join(path, a["add"]["path"]))
                except OSError:  # pragma: no cover
                    pass
            if attempt == max_retries:
                raise
    raise AssertionError("unreachable")  # pragma: no cover


# ---------------------------------------------------------------------------
# Change Data Feed
# ---------------------------------------------------------------------------

CDC_DIR = "_change_data"
CHANGE_TYPE = "_change_type"


def _merge_change_rows(target, source, keys, on_conflict):
    """The CDF row set a MERGE produces: inserts, and for ``do_update``
    the pre/post images of matched rows — same relational convention as
    ``merge.merge_dataframes`` (dedup, update-column subset)."""
    from .merge import dedupe_source

    cols = target.columns
    src = dedupe_source(source.select(*cols), keys)
    inserts = src.join(target.select(*keys), on=keys, how="left_anti").select(
        *cols, F.lit("insert").alias(CHANGE_TYPE)
    )
    if on_conflict.action == "nothing":
        return inserts
    update_cols = list(on_conflict.update_columns) or [
        c for c in cols if c not in keys
    ]
    marked = src.select(*[F.col(c).alias(f"__s_{c}") for c in cols])
    joined = target.join(
        marked,
        [target[k] == marked[f"__s_{k}"] for k in keys],
        "inner",
    )
    pre = joined.select(
        *[target[c].alias(c) for c in cols],
        F.lit("update_preimage").alias(CHANGE_TYPE),
    )
    post = joined.select(
        *[
            (F.col(f"__s_{c}").alias(c) if c in update_cols
             else target[c].alias(c))
            for c in cols
        ],
        F.lit("update_postimage").alias(CHANGE_TYPE),
    )
    return inserts.unionByName(pre).unionByName(post)


def _write_cdc_files(
    spark: SparkSession, df: DataFrame, table_path: str
) -> list[dict]:
    """Materialize CDF rows under ``_change_data/`` and return their
    ``cdc`` actions (spec: cdc files never count as data change)."""
    cdc_root = os.path.join(table_path, CDC_DIR)
    os.makedirs(cdc_root, exist_ok=True)
    staging = os.path.join(table_path, f".cdc-staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    actions = []
    try:
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            final = f"{CDC_DIR}/cdc-{uuid.uuid4().hex}.snappy.parquet"
            dst = os.path.join(table_path, final)
            os.rename(os.path.join(staging, name), dst)
            import pyarrow.parquet as pq

            if pq.ParquetFile(dst).metadata.num_rows == 0:
                os.remove(dst)
                continue
            actions.append(
                {
                    "cdc": {
                        "path": final,
                        "partitionValues": {},
                        "size": os.stat(dst).st_size,
                        "dataChange": False,
                    }
                }
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return actions


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int = 0,
    to_version: int | None = None,
) -> DataFrame:
    """The change feed between two versions (inclusive): rows tagged
    ``_change_type`` (insert / update_preimage / update_postimage) plus
    ``_commit_version`` — what an incremental downstream pipeline
    consumes instead of re-diffing snapshots.

    Commits that recorded ``cdc`` actions replay those files verbatim;
    commits with only ``dataChange`` adds (create, plain append) derive
    inserts from the added data files, per the spec's fallback rule.
    """
    log = PyDeltaLog(path)
    latest = log.latest_version()
    if latest < 0:
        raise DeltaLogError(f"no Delta table at {path}")
    hi = latest if to_version is None else min(to_version, latest)
    snap = log.snapshot(hi)
    schema = ST.StructType.fromJson(json.loads(snap.metadata["schemaString"]))
    out_schema = ST.StructType(
        list(schema.fields)
        + [ST.StructField(CHANGE_TYPE, ST.StringType(), False),
           ST.StructField("_commit_version", ST.LongType(), False)]
    )
    parts = []
    for v in range(from_version, hi + 1):
        cdc_paths, add_paths, has_cdc = [], [], False
        with open(log._version_file(v), encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    has_cdc = True
                    cdc_paths.append(os.path.join(path, action["cdc"]["path"]))
                elif "add" in action and action["add"].get("dataChange", True):
                    add_paths.append(os.path.join(path, action["add"]["path"]))
        if has_cdc:
            part = spark.read.schema(
                ST.StructType(list(schema.fields)
                              + [ST.StructField(CHANGE_TYPE, ST.StringType(),
                                                False)])
            ).parquet(*cdc_paths)
        elif add_paths:
            part = spark.read.schema(schema).parquet(*add_paths).select(
                "*", F.lit("insert").alias(CHANGE_TYPE)
            )
        else:
            continue
        parts.append(part.select(
            "*", F.lit(v).cast("long").alias("_commit_version")
        ))
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# VACUUM
# ---------------------------------------------------------------------------


def vacuum(path: str, retain_last: int = 1) -> int:
    """Physically delete data files no version in the retained window
    references, and change-data files from commits before it. Time
    travel older than ``retain_last`` versions stops resolving — the
    same trade Delta's VACUUM makes (its retention is time-based; a
    version window is the deterministic test-friendly equivalent).
    Returns the number of files deleted."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    log = PyDeltaLog(path)
    latest = log.latest_version()
    if latest < 0:
        raise DeltaLogError(f"no Delta table at {path}")
    floor_v = max(0, latest - retain_last + 1)
    referenced = set()
    for v in range(floor_v, latest + 1):
        referenced |= {f["path"] for f in log.snapshot(v).files}
    deleted = 0
    for name in os.listdir(path):
        if name.endswith(".parquet") and name not in referenced:
            os.remove(os.path.join(path, name))
            deleted += 1
    # cdc files belong to exactly one commit: drop those below the floor.
    kept_cdc = set()
    for v in range(floor_v, latest + 1):
        with open(log._version_file(v), encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    kept_cdc.add(action["cdc"]["path"])
    cdc_root = os.path.join(path, CDC_DIR)
    if os.path.isdir(cdc_root):
        for name in os.listdir(cdc_root):
            rel = f"{CDC_DIR}/{name}"
            if name.endswith(".parquet") and rel not in kept_cdc:
                os.remove(os.path.join(cdc_root, name))
                deleted += 1
    return deleted
