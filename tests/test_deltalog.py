"""Executed transaction-log MERGE: the pure-Python Delta log
(sources/deltalog.py) — ACID commits, snapshot reads, time travel,
stats-based file pruning, and optimistic-concurrency conflicts, all
against real files on disk."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.plans.on_conflict import OnConflict
from simple_anonymizer_spark.sources.deltalog import (
    DeltaConcurrentModification,
    PyDeltaLog,
    history,
    merge_deltalog,
    read_deltalog,
)
from simple_anonymizer_spark.sources.lakehouse import merge_table

DO_UPDATE = OnConflict(action="update")
DO_NOTHING = OnConflict(action="nothing")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def _rows(spark, path, version=None):
    return sorted(
        (r.id, r.val) for r in read_deltalog(spark, path, version).collect()
    )


def test_create_and_read_back(spark, tmp_path):
    path = str(tmp_path / "t")
    n = merge_deltalog(spark, _df(spark, [(1, "a"), (2, "b")]), path, ["id"],
                       DO_UPDATE)
    assert n == 2
    assert _rows(spark, path) == [(1, "a"), (2, "b")]
    assert PyDeltaLog(path).latest_version() == 0


def test_log_format_follows_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    log_file = os.path.join(path, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(line) for line in open(log_file, encoding="utf-8")]
    protocol = next(a["protocol"] for a in actions if "protocol" in a)
    assert protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    schema = json.loads(meta["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["id", "val"]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(
        {"path", "partitionValues", "size", "modificationTime", "dataChange"}
        <= set(a) for a in adds
    )
    stats = json.loads(adds[0]["stats"])
    assert stats["numRecords"] >= 1 and "id" in stats["minValues"]


def test_upsert_do_update(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a"), (2, "b")]), path, ["id"],
                   DO_UPDATE)
    n = merge_deltalog(spark, _df(spark, [(2, "B"), (3, "c")]), path, ["id"],
                       DO_UPDATE)
    assert n == 3
    assert _rows(spark, path) == [(1, "a"), (2, "B"), (3, "c")]


def test_upsert_do_nothing_keeps_existing(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a"), (2, "b")]), path, ["id"],
                   DO_NOTHING)
    merge_deltalog(spark, _df(spark, [(2, "CLOBBER"), (3, "c")]), path, ["id"],
                   DO_NOTHING)
    assert _rows(spark, path) == [(1, "a"), (2, "b"), (3, "c")]


def test_none_is_plain_append_with_duplicates(spark, tmp_path):
    # Parity with merge_dataframes / the JDBC INSERT path: no dedup, no
    # matching — every source row lands (the ADVICE.md lakehouse fix).
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    n = merge_deltalog(spark, _df(spark, [(1, "dup"), (1, "dup2")]), path,
                       ["id"], None)
    assert n == 3
    assert sorted(r[1] for r in _rows(spark, path)) == ["a", "dup", "dup2"]


def test_time_travel_reads_old_version(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    merge_deltalog(spark, _df(spark, [(1, "A2")]), path, ["id"], DO_UPDATE)
    assert _rows(spark, path, version=0) == [(1, "a")]
    assert _rows(spark, path, version=1) == [(1, "A2")]
    assert _rows(spark, path) == [(1, "A2")]


def test_stats_pruning_leaves_disjoint_files_alone(spark, tmp_path):
    path = str(tmp_path / "t")
    # Two single-file commits with disjoint id ranges.
    merge_deltalog(spark, _df(spark, [(i, f"lo{i}") for i in range(10)])
                   .coalesce(1), path, ["id"], DO_UPDATE)
    merge_deltalog(spark, _df(spark, [(i, f"hi{i}") for i in range(1000, 1010)])
                   .coalesce(1), path, ["id"], DO_UPDATE)
    lo_files = {f["path"] for f in PyDeltaLog(path).snapshot(0).files}
    # Source touches only the high range: the low-range file must survive.
    merge_deltalog(spark, _df(spark, [(1005, "HI")]).coalesce(1), path,
                   ["id"], DO_UPDATE)
    hist = history(path)
    assert hist[-1]["numRemovedFiles"] == 1  # pruned: only the hi file
    after = {f["path"] for f in PyDeltaLog(path).snapshot().files}
    assert lo_files <= after  # low file untouched, not rewritten
    assert _rows(spark, path)[:3] == [(0, "lo0"), (1, "lo1"), (2, "lo2")]
    assert (1005, "HI") in _rows(spark, path)


def test_removed_files_invisible_but_on_disk(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]).coalesce(1), path, ["id"],
                   DO_UPDATE)
    v0_files = {f["path"] for f in PyDeltaLog(path).snapshot().files}
    merge_deltalog(spark, _df(spark, [(1, "b")]).coalesce(1), path, ["id"],
                   DO_UPDATE)
    snap_files = {f["path"] for f in PyDeltaLog(path).snapshot().files}
    assert v0_files.isdisjoint(snap_files)  # rewritten
    for p in v0_files:  # no vacuum: bytes still there for time travel
        assert os.path.exists(os.path.join(path, p))


def test_commit_conflict_raises_and_merge_retries(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    log = PyDeltaLog(path)
    # Direct API: losing the race for version 1 raises.
    log.commit([{"commitInfo": {"op": "winner"}}], read_version=0)
    with pytest.raises(DeltaConcurrentModification):
        log.commit([{"commitInfo": {"op": "loser"}}], read_version=0)
    # The MERGE front-end replays against the new snapshot and lands as
    # version 2.
    merge_deltalog(spark, _df(spark, [(2, "b")]), path, ["id"], DO_UPDATE)
    assert log.latest_version() == 2
    assert _rows(spark, path) == [(1, "a"), (2, "b")]


def test_merge_table_deltalog_backend(spark, tmp_path):
    path = str(tmp_path / "t")
    n = merge_table(spark, _df(spark, [(1, "a"), (2, "b")]), path, ["id"],
                    DO_UPDATE, backend="deltalog")
    assert n == 2
    n = merge_table(spark, _df(spark, [(2, "B2")]), path, ["id"], DO_UPDATE,
                    backend="deltalog")
    assert n == 2
    assert _rows(spark, path) == [(1, "a"), (2, "B2")]
    assert os.path.isdir(os.path.join(path, "_delta_log"))


def test_partitioned_tables_rejected(spark, tmp_path):
    with pytest.raises(NotImplementedError):
        merge_deltalog(spark, _df(spark, [(1, "a")]), str(tmp_path / "t"),
                       ["id"], DO_UPDATE, partition_by=["val"])


def test_sf_scale_upsert_roundtrip(spark, sf_dir, tmp_path):
    # End-to-end on real fixture data: copy orders, bump a slice's price.
    path = str(tmp_path / "orders_delta")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = merge_deltalog(spark, orders, path, ["o_orderkey"], DO_UPDATE)
    assert n == orders.count()
    patch = (
        orders.where(F.col("o_orderkey") < 100)
        .withColumn("o_totalprice", F.lit(0.0))
    )
    merge_deltalog(spark, patch, path, ["o_orderkey"], DO_UPDATE)
    out = read_deltalog(spark, path)
    assert out.count() == n
    assert out.where((F.col("o_orderkey") < 100)
                     & (F.col("o_totalprice") != 0.0)).count() == 0
    assert out.where(F.col("o_orderkey") >= 100).count() == n - patch.count()


# ---------------------------------------------------------------------------
# OPTIMIZE
# ---------------------------------------------------------------------------


def test_optimize_compacts_small_files(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import optimize_table

    path = str(tmp_path / "t")
    # Five tiny single-file commits -> five small files.
    for i in range(5):
        merge_deltalog(
            spark,
            _df(spark, [(i * 10 + j, f"v{i}_{j}") for j in range(10)])
            .coalesce(1),
            path, ["id"], DO_UPDATE,
        )
    before = _rows(spark, path)
    assert len(PyDeltaLog(path).snapshot().files) == 5
    out = optimize_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert out["filesRemoved"] == 5 and out["filesAdded"] == 1
    snap = PyDeltaLog(path).snapshot()
    assert len(snap.files) == 1
    assert _rows(spark, path) == before  # logical table untouched
    # Spec: rearrangement commits carry dataChange=false throughout.
    log_file = os.path.join(path, "_delta_log", f"{out['version']:020d}.json")
    for line in open(log_file, encoding="utf-8"):
        action = json.loads(line)
        body = action.get("add") or action.get("remove")
        assert body is not None and body["dataChange"] is False
    # Time travel to the pre-optimize version still works.
    assert _rows(spark, path, version=out["version"] - 1) == before


def test_optimize_noop_when_nothing_small(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import optimize_table

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]).coalesce(1), path, ["id"],
                   DO_UPDATE)
    out = optimize_table(spark, path, target_file_bytes=1)  # nothing < 1B
    assert out == {"version": 0, "filesAdded": 0, "filesRemoved": 0}
    assert PyDeltaLog(path).latest_version() == 0


def test_optimize_zorder_clusters_and_preserves_rows(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import (
        PyDeltaLog as _Log, optimize_table)

    path = str(tmp_path / "t")
    rows = [(i, f"v{i % 7}") for i in range(200)]
    for chunk in range(4):  # interleaved id ranges -> overlapping files
        merge_deltalog(
            spark,
            _df(spark, rows[chunk::4]).coalesce(1),
            path, ["id"], DO_UPDATE,
        )
    before = _rows(spark, path)
    out = optimize_table(spark, path, target_file_bytes=64 * 1024 * 1024,
                         zorder_cols=["id"])
    assert out["filesRemoved"] == 4
    assert _rows(spark, path) == before
    # Post-cluster stats must be present so MERGE pruning keeps working.
    for f in _Log(path).snapshot().files:
        stats = json.loads(f["stats"])
        assert "id" in stats["minValues"]
    merge_deltalog(spark, _df(spark, [(0, "patched")]).coalesce(1), path,
                   ["id"], DO_UPDATE)
    assert (0, "patched") in _rows(spark, path)


def test_streaming_foreachbatch_upserts_into_deltalog(spark, tmp_path):
    """Structured-Streaming ingestion: a file-source stream upserted
    micro-batch-by-micro-batch into the ACID table via foreachBatch."""
    import glob
    import shutil as _sh

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")

    def land(rows, name):
        staging = str(tmp_path / f"stage_{name}")
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(staging)
        for i, f in enumerate(glob.glob(f"{staging}/part-*.parquet")):
            _sh.move(f, str(src_dir / f"{name}_{i}.parquet"))

    land([(1, "a"), (2, "b")], "batch0")
    land([(2, "B2"), (3, "c")], "batch1")

    def upsert(batch_df, _batch_id):
        merge_deltalog(batch_df.sparkSession, batch_df, table, ["id"],
                       DO_UPDATE)

    stream = (
        spark.readStream.schema("id long, val string")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(str(src_dir))
    )
    (stream.writeStream.foreachBatch(upsert)
     .option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start().awaitTermination(120))

    rows = dict(_rows(spark, table))
    assert rows[1] == "a" and rows[3] == "c"
    assert rows[2] in ("b", "B2")  # file listing order decides which lands last
    assert PyDeltaLog(table).latest_version() >= 1  # one commit per batch


# ---------------------------------------------------------------------------
# Schema evolution (mergeSchema)
# ---------------------------------------------------------------------------


def test_merge_schema_adds_column_old_rows_null(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import DeltaLogError

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a"), (2, "b")]), path, ["id"],
                   DO_UPDATE)
    wide = spark.createDataFrame([(2, "B2", 99), (3, "c", 7)],
                                 "id long, val string, score long")
    # Without the flag: refuse rather than silently drop the column.
    with pytest.raises(DeltaLogError, match="merge_schema"):
        merge_deltalog(spark, wide, path, ["id"], DO_UPDATE)
    merge_deltalog(spark, wide, path, ["id"], DO_UPDATE, merge_schema=True)
    out = {r.id: (r.val, r.score) for r in read_deltalog(spark, path).collect()}
    assert out == {1: ("a", None), 2: ("B2", 99), 3: ("c", 7)}
    # metaData id must survive the evolution (same table identity).
    log = PyDeltaLog(path)
    assert (log.snapshot(0).metadata["id"]
            == log.snapshot().metadata["id"])
    assert "score" in log.snapshot().metadata["schemaString"]


def test_merge_schema_append_and_narrow_source(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    wide = spark.createDataFrame([(5, "e", 1.5)],
                                 "id long, val string, w double")
    merge_deltalog(spark, wide, path, ["id"], None, merge_schema=True)
    # A post-evolution narrow source null-fills the new column.
    merge_deltalog(spark, _df(spark, [(9, "i")]), path, ["id"], DO_UPDATE)
    out = {r.id: (r.val, r.w) for r in read_deltalog(spark, path).collect()}
    assert out == {1: ("a", None), 5: ("e", 1.5), 9: ("i", None)}


def test_merge_schema_type_clash_rejected(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import DeltaLogError

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    clash = spark.createDataFrame([(2, 42)], "id long, val long")
    with pytest.raises(DeltaLogError, match="val"):
        merge_deltalog(spark, clash, path, ["id"], DO_UPDATE,
                       merge_schema=True)


# ---------------------------------------------------------------------------
# Change Data Feed + VACUUM
# ---------------------------------------------------------------------------


def test_cdf_upsert_emits_images_and_inserts(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import table_changes

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a"), (2, "b")]), path, ["id"],
                   DO_UPDATE)
    merge_deltalog(spark, _df(spark, [(2, "B2"), (3, "c")]), path, ["id"],
                   DO_UPDATE, change_data=True)
    ch = table_changes(spark, path, from_version=1).collect()
    tagged = sorted((r.id, r.val, r._change_type) for r in ch)
    assert tagged == [
        (2, "B2", "update_postimage"),
        (2, "b", "update_preimage"),
        (3, "c", "insert"),
    ]
    assert all(r._commit_version == 1 for r in ch)


def test_cdf_fallback_derives_inserts_from_creates_and_appends(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import table_changes

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    merge_deltalog(spark, _df(spark, [(2, "b")]), path, ["id"], None)
    ch = sorted((r.id, r._change_type, r._commit_version)
                for r in table_changes(spark, path).collect())
    assert ch == [(1, "insert", 0), (2, "insert", 1)]


def test_cdf_do_nothing_emits_inserts_only(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import table_changes

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_NOTHING)
    merge_deltalog(spark, _df(spark, [(1, "CLOBBER"), (2, "b")]), path, ["id"],
                   DO_NOTHING, change_data=True)
    ch = [(r.id, r.val, r._change_type)
          for r in table_changes(spark, path, from_version=1).collect()]
    assert ch == [(2, "b", "insert")]  # the matched row produced NO change


def test_cdf_version_range_filter(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import table_changes

    path = str(tmp_path / "t")
    for i in range(4):
        merge_deltalog(spark, _df(spark, [(100 + i, f"v{i}")]), path, ["id"],
                       DO_UPDATE, change_data=True)
    mid = table_changes(spark, path, from_version=1, to_version=2).collect()
    assert sorted(r._commit_version for r in mid) == [1, 2]


def test_vacuum_drops_unreferenced_keeps_current(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import vacuum

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]).coalesce(1), path, ["id"],
                   DO_UPDATE)
    v0_files = {f["path"] for f in PyDeltaLog(path).snapshot(0).files}
    merge_deltalog(spark, _df(spark, [(1, "b")]).coalesce(1), path, ["id"],
                   DO_UPDATE)
    current = _rows(spark, path)
    deleted = vacuum(path, retain_last=1)
    assert deleted >= 1
    for p in v0_files:
        assert not os.path.exists(os.path.join(path, p))
    assert _rows(spark, path) == current  # current snapshot intact


def test_vacuum_retains_window(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import vacuum

    path = str(tmp_path / "t")
    for i in range(3):
        merge_deltalog(spark, _df(spark, [(1, f"v{i}")]).coalesce(1), path,
                       ["id"], DO_UPDATE)
    assert vacuum(path, retain_last=10) == 0  # everything inside the window
    assert _rows(spark, path, version=0) == [(1, "v0")]  # time travel intact


def test_multikey_pruning_second_key_disjoint(spark, tmp_path):
    """Files disjoint on the SECOND merge key alone are pruned."""
    path = str(tmp_path / "t")
    df2 = lambda rows: spark.createDataFrame(rows, "a long, b long, v string")
    merge_deltalog(spark, df2([(1, 100 + i, f"x{i}") for i in range(5)])
                   .coalesce(1), path, ["a", "b"], DO_UPDATE)
    merge_deltalog(spark, df2([(1, 900 + i, f"y{i}") for i in range(5)])
                   .coalesce(1), path, ["a", "b"], DO_UPDATE)
    lo_files = {f["path"] for f in PyDeltaLog(path).snapshot(0).files}
    # a-range overlaps (all a=1); only the b-range distinguishes files.
    merge_deltalog(spark, df2([(1, 902, "HIT")]).coalesce(1), path,
                   ["a", "b"], DO_UPDATE)
    assert history(path)[-1]["numRemovedFiles"] == 1
    after = {f["path"] for f in PyDeltaLog(path).snapshot().files}
    assert lo_files <= after
    rows = {(r.a, r.b): r.v for r in read_deltalog(spark, path).collect()}
    assert rows[(1, 902)] == "HIT" and rows[(1, 100)] == "x0"


def test_merge_model_based_random_sequence(spark, tmp_path):
    """Model check: a seeded random sequence of mixed merges against the
    Delta log must equal the same sequence applied to a dict model
    (update/insert-if-absent/append semantics)."""
    import random

    rng = random.Random(42)
    path = str(tmp_path / "t")
    model: list[tuple[int, str]] = []  # appends allowed -> list, keyed view

    def model_apply(rows, mode):
        nonlocal model
        if mode == "append":
            model.extend(rows)
            return
        # dedupe_source keeps the row with max non-key cols per key
        best = {}
        for k, v in rows:
            if k not in best or v > best[k]:
                best[k] = v
        keyed = {}
        order = []
        for k, v in model:
            keyed.setdefault(k, []).append(v)
        existing = set(keyed)
        if mode == "update":
            model = [
                (k, best[k]) if k in best else (k, v) for k, v in model
            ]
        for k in sorted(best):
            if k not in existing:
                model.append((k, best[k]))

    for step in range(8):
        mode = rng.choice(["update", "nothing", "append"])
        rows = [(rng.randrange(12), f"s{step}v{rng.randrange(99)}")
                for _ in range(rng.randrange(1, 5))]
        oc = {"update": DO_UPDATE, "nothing": DO_NOTHING, "append": None}[mode]
        if mode == "nothing":
            # model: insert-if-absent only
            model_apply(rows, "nothing")
        else:
            model_apply(rows, mode)
        merge_deltalog(spark, _df(spark, rows), path, ["id"], oc)

    got = sorted(_rows(spark, path))
    want = sorted(model)
    assert got == want, f"model divergence:\n got={got}\nwant={want}"


def test_cdf_driven_anonymized_replica(spark, tmp_path):
    """Composition: maintain an anonymized replica incrementally from the
    source table's Change Data Feed — upstream MERGE commits flow through
    table_changes, post-images anonymize with the native-expression
    anonymizers, and the replica upserts via its own ACID MERGE. The
    GDPR-replica pipeline end-to-end."""
    from simple_anonymizer_spark.functions import anonymizers as A
    from simple_anonymizer_spark.sources.deltalog import table_changes

    src_path = str(tmp_path / "src")
    rep_path = str(tmp_path / "rep")
    cust = spark.createDataFrame(
        [(1, "Alice Smith"), (2, "Bob Jones")], "id long, name string"
    )

    def sync(from_v):
        post = (
            table_changes(spark, src_path, from_version=from_v)
            .where(F.col("_change_type").isin("insert", "update_postimage"))
            .select("id", A.full_name(F.col("name")).alias("name"))
        )
        merge_deltalog(spark, post, rep_path, ["id"], DO_UPDATE)

    merge_deltalog(spark, cust, src_path, ["id"], DO_UPDATE)
    sync(0)
    merge_deltalog(
        spark,
        spark.createDataFrame([(2, "Robert Jones"), (3, "Cara Voss")],
                              "id long, name string"),
        src_path, ["id"], DO_UPDATE, change_data=True,
    )
    sync(1)

    replica = {r.id: r.name for r in read_deltalog(spark, rep_path).collect()}
    source = {r.id: r.name for r in read_deltalog(spark, src_path).collect()}
    assert set(replica) == {1, 2, 3}
    # Replica carries NO raw names, and tracks the source deterministically:
    # the same anonymizer over the current source equals the replica.
    from simple_anonymizer_spark.sources.deltalog import read_deltalog as rd
    expected = {
        r.id: r.name
        for r in rd(spark, src_path)
        .select("id", A.full_name(F.col("name")).alias("name")).collect()
    }
    assert replica == expected
    assert all(n not in replica.values() for n in source.values())


# ---------------------------------------------------------------------------
# Checkpoints (PROTOCOL.md §Checkpoints)
# ---------------------------------------------------------------------------


def _state(snap):
    return snap.metadata, sorted(snap.files, key=lambda f: f["path"])


def test_checkpoint_written_at_interval_and_pointer_updated(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(7):
        merge_deltalog(spark, _df(spark, [(i, f"v{i}")]), path, ["id"],
                       DO_UPDATE, checkpoint_interval=3)
    log = PyDeltaLog(path)
    assert log.latest_version() == 6
    assert log.checkpoint_versions() == [3, 6]
    pointer = json.load(open(
        os.path.join(path, "_delta_log", "_last_checkpoint")))
    assert pointer["version"] == 6 and pointer["size"] >= 3


def test_checkpoint_replay_equals_full_json_replay(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(8):
        merge_deltalog(
            spark, _df(spark, [(i % 3, f"v{i}"), (10 + i, "x")]), path,
            ["id"], DO_UPDATE, checkpoint_interval=4,
        )
    log = PyDeltaLog(path)
    assert log.checkpoint_versions() == [4]
    with_cp = {v: _state(log.snapshot(v)) for v in range(8)}
    rows_with_cp = _rows(spark, path)
    # strip the checkpoint: pure JSON replay must reconstruct the same
    # state at EVERY version (including those the checkpoint served).
    os.remove(os.path.join(path, "_delta_log", f"{4:020d}.checkpoint.parquet"))
    os.remove(os.path.join(path, "_delta_log", "_last_checkpoint"))
    for v in range(8):
        assert _state(log.snapshot(v)) == with_cp[v], f"version {v}"
    assert _rows(spark, path) == rows_with_cp


def test_checkpoint_file_is_spec_shaped(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    for i in range(4):
        merge_deltalog(spark, _df(spark, [(i, "a")]), path, ["id"],
                       DO_UPDATE, checkpoint_interval=3)
    cp = os.path.join(path, "_delta_log", f"{3:020d}.checkpoint.parquet")
    rows = pq.read_table(cp).to_pylist()
    assert {"protocol", "metaData", "add"} <= set(rows[0].keys())
    # exactly one non-null action per row
    for r in rows:
        assert sum(r[k] is not None for k in ("protocol", "metaData", "add")) == 1
    assert sum(1 for r in rows if r["protocol"]) == 1
    assert sum(1 for r in rows if r["metaData"]) == 1
    live = PyDeltaLog(path).snapshot(3).files
    assert sum(1 for r in rows if r["add"]) == len(live)


# ---------------------------------------------------------------------------
# RESTORE
# ---------------------------------------------------------------------------


def test_restore_reinstates_old_version_as_new_commit(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import restore_table

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a"), (2, "b")]), path, ["id"],
                   DO_UPDATE)
    merge_deltalog(spark, _df(spark, [(2, "B"), (3, "c")]), path, ["id"],
                   DO_UPDATE)
    assert _rows(spark, path) == [(1, "a"), (2, "B"), (3, "c")]
    v = restore_table(path, 0)
    assert v == 2
    assert _rows(spark, path) == [(1, "a"), (2, "b")]
    # time travel still sees the pre-restore state
    assert _rows(spark, path, version=1) == [(1, "a"), (2, "B"), (3, "c")]
    # the table keeps working after a restore
    merge_deltalog(spark, _df(spark, [(4, "d")]), path, ["id"], DO_UPDATE)
    assert _rows(spark, path) == [(1, "a"), (2, "b"), (4, "d")]


def test_restore_refuses_when_files_vacuumed(spark, tmp_path):
    from simple_anonymizer_spark.sources.deltalog import (
        DeltaLogError,
        restore_table,
        vacuum,
    )

    path = str(tmp_path / "t")
    merge_deltalog(spark, _df(spark, [(1, "a")]), path, ["id"], DO_UPDATE)
    merge_deltalog(spark, _df(spark, [(1, "A2")]), path, ["id"], DO_UPDATE)
    vacuum(path, retain_last=1)
    with pytest.raises(DeltaLogError, match="vacuumed"):
        restore_table(path, 0)
