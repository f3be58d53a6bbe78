"""Spec-conformance harden: an INDEPENDENT Delta Lake reader — built only
from the public Delta PROTOCOL.md using os/json/pyarrow/duckdb, sharing
zero code with sources/deltalog.py — must reconstruct the same live-file
set and row contents from a table deltalog.py wrote.

delta-spark jars are unobtainable in this environment (no network, no
pip), so jar-backed execution cannot be tested; this reader is the
strongest available substitute: if OUR writer and a from-scratch reader
agree through checkpoints, OPTIMIZE rewrites, time travel, and VACUUM,
a conforming external runtime reads the table the same way.
"""

from __future__ import annotations

import json
import os

import duckdb
import pyarrow.parquet as pq

from simple_anonymizer_spark.plans.on_conflict import OnConflict
from simple_anonymizer_spark.sources.deltalog import (
    PyDeltaLog,
    merge_deltalog,
    optimize_table,
    read_deltalog,
    restore_table,
    vacuum,
)

DO_UPDATE = OnConflict(action="update")


# --------------------------------------------------------------------------
# The independent reader. Protocol facts used (all from the public spec):
# - commits are _delta_log/<20-digit version>.json, one JSON action/line
# - table state = replay of add/remove actions; an add is live until a
#   remove for the same path; re-adding a removed path revives it
# - a checkpoint parquet at version V summarizes state <= V; later JSON
#   commits replay on top; _last_checkpoint points at the newest one
# - add.path is relative to the table root
# --------------------------------------------------------------------------

def independent_read(table_path: str, version: int | None = None):
    log_dir = os.path.join(table_path, "_delta_log")
    commits = sorted(
        int(f[:20]) for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:20].isdigit()
    )
    assert commits, "no commit files"
    target = max(commits) if version is None else version

    adds: dict[str, dict] = {}
    start = 0
    cps = sorted(
        int(f.split(".")[0]) for f in os.listdir(log_dir)
        if f.endswith(".checkpoint.parquet")
    )
    usable = [v for v in cps if v <= target]
    if usable:
        cpv = max(usable)
        cp = pq.read_table(
            os.path.join(log_dir, f"{cpv:020d}.checkpoint.parquet")
        ).to_pylist()
        for row in cp:
            add = row.get("add")
            if add is not None and add.get("path"):
                adds[add["path"]] = add
        start = cpv + 1
        # the JSON commits the checkpoint covered must not be required —
        # but they may legitimately still exist; skip them.
    for v in range(start, target + 1):
        fp = os.path.join(log_dir, f"{v:020d}.json")
        with open(fp, encoding="utf-8") as fh:
            for line in fh:
                action = json.loads(line)
                if "add" in action:
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)

    files = [os.path.join(table_path, p) for p in sorted(adds)]
    if not files:
        return []
    con = duckdb.connect()
    lit = "[" + ", ".join("'" + f.replace("'", "''") + "'" for f in files) + "]"
    rows = con.execute(
        f"SELECT * FROM read_parquet({lit})"
    ).fetch_arrow_table().to_pylist()
    return sorted((r["id"], r["val"]) for r in rows)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def _ours(spark, path, version=None):
    return sorted(
        (r.id, r.val) for r in read_deltalog(spark, path, version).collect()
    )


def _build(spark, path, checkpoint_interval=None):
    """Six commits: inserts, update-merge, delete-shaped overwrite mix."""
    kw = {}
    if checkpoint_interval:
        kw["checkpoint_interval"] = checkpoint_interval
    merge_deltalog(spark, _df(spark, [(1, "a"), (2, "b")]), path,
                   ["id"], DO_UPDATE, **kw)
    merge_deltalog(spark, _df(spark, [(3, "c"), (4, "d")]), path,
                   ["id"], DO_UPDATE, **kw)
    merge_deltalog(spark, _df(spark, [(2, "B"), (5, "e")]), path,
                   ["id"], DO_UPDATE, **kw)
    merge_deltalog(spark, _df(spark, [(1, "A2")]), path, ["id"],
                   DO_UPDATE, **kw)
    merge_deltalog(spark, _df(spark, [(6, "f"), (7, "g")]), path,
                   ["id"], DO_UPDATE, **kw)
    merge_deltalog(spark, _df(spark, [(4, "D2"), (8, "h")]), path,
                   ["id"], DO_UPDATE, **kw)


def test_independent_reader_matches_at_every_version(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    log = PyDeltaLog(path)
    assert log.latest_version() == 5
    for v in range(6):
        assert independent_read(path, v) == _ours(spark, path, v), v
    # latest (no version arg) too
    assert independent_read(path) == _ours(spark, path)


def test_independent_reader_through_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path, checkpoint_interval=2)
    log = PyDeltaLog(path)
    cps = log.checkpoint_versions()
    assert cps, "expected checkpoints to be written"
    # versions before, at, and after each checkpoint
    for v in range(log.latest_version() + 1):
        assert independent_read(path, v) == _ours(spark, path, v), v
    # destroy the covered JSON commits: a spec reader must work from the
    # checkpoint alone for versions >= last checkpoint
    last_cp = max(cps)
    for v in range(last_cp):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    assert independent_read(path) == _ours(spark, path)


def test_independent_reader_after_optimize_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    before = independent_read(path)
    optimize_table(spark, path)
    assert independent_read(path) == before == _ours(spark, path)
    # vacuum removes unreferenced data files; live set must be unaffected
    vacuum(path, retain_last=1)
    assert independent_read(path) == before == _ours(spark, path)


def test_independent_reader_after_restore(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    want_v2 = independent_read(path, 2)
    restore_table(path, 2)
    assert independent_read(path) == want_v2 == _ours(spark, path)


def test_last_checkpoint_pointer_is_spec_shaped(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path, checkpoint_interval=3)
    ptr = os.path.join(path, "_delta_log", "_last_checkpoint")
    meta = json.load(open(ptr, encoding="utf-8"))
    assert set(meta) >= {"version", "size"}
    cp = os.path.join(path, "_delta_log",
                      f"{meta['version']:020d}.checkpoint.parquet")
    assert os.path.exists(cp)
    rows = pq.read_table(cp).to_pylist()
    assert meta["size"] == len(rows)
