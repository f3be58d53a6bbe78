"""Incremental view maintenance (streaming/incremental.py): the rollup
maintained by foreachBatch additive merges must equal the batch aggregate
over all data, across multiple availableNow runs with new files arriving
in between, and replayed batch ids must not double-count."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from simple_anonymizer_spark.sources.parquet import read_sf_table
from simple_anonymizer_spark.streaming import events as SE
from simple_anonymizer_spark.streaming import incremental as INC


def _rollup_rows(spark, path):
    return {
        (r.window_start, r.event_type): (r.n_events, float(r.sum_value_dec))
        for r in spark.read.parquet(path).collect()
    }


def _expected(events):
    agg = SE.tumbling_counts(events)
    return {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in agg.collect()
    }


def test_incremental_rollup_across_arrivals(spark, sf_dir, tmp_path):
    # Split the RAW file (ts as nanos bigint) — the stream reads with the
    # raw schema and does its own timestamp normalization.
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    half1 = raw.where(F.col("event_id") % 2 == 0)
    half2 = raw.where(F.col("event_id") % 2 == 1)

    src = tmp_path / "src"
    src.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def run_once():
        q = (
            INC.stream_rollup(spark, str(src), rollup, ckpt, schema=raw_schema)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    import glob
    import shutil

    def deliver(df, name):
        # The file stream source lists FILES, not Spark output directories:
        # write to a staging dir and move the single part file in.
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    # arrival 1: half the events
    deliver(half1, "part1.parquet")
    run_once()
    got1 = _rollup_rows(spark, rollup)
    exp1 = _expected(read_sf_table(spark, sf_dir, "events").where(
        F.col("event_id") % 2 == 0))
    assert {k: (n, round(s, 6)) for k, (n, s) in got1.items()} == exp1

    # arrival 2: the rest — rollup must now equal the full batch aggregate
    deliver(half2, "part2.parquet")
    run_once()
    got2 = _rollup_rows(spark, rollup)
    exp2 = _expected(read_sf_table(spark, sf_dir, "events"))
    assert {k: (n, round(s, 6)) for k, (n, s) in got2.items()} == exp2

    # a third run with no new data must not change the table
    run_once()
    assert _rollup_rows(spark, rollup) == got2

    # replay guard: merging the recorded last batch id again is a no-op
    # at the file level (apply_batch checks the guard before merging)
    with open(rollup + ".last_batch.json") as fh:
        last = json.load(fh)["last_batch_id"]
    assert last >= 0


def test_incremental_sketch_across_arrivals(spark, sf_dir, tmp_path):
    """The streamed count-min sketch after N arrivals must equal the batch
    sketch over all data seen so far, and a no-new-data run is a no-op."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators.sketch import cms_sketch
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    halves = [raw.where(F.col("event_id") % 2 == i) for i in (0, 1)]
    src = tmp_path / "src"
    src.mkdir()
    sketch_path = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    schema = raw.schema

    def deliver(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    def run_once():
        q = (
            INC.stream_sketch_rollup(
                spark, str(src), sketch_path, ckpt, schema=schema
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    def sketch_rows(path_or_df):
        df = (spark.read.parquet(path_or_df)
              if isinstance(path_or_df, str) else path_or_df)
        return {(r.sketch_row, r.bucket): r.cnt for r in df.collect()}

    def batch_expected(df):
        return sketch_rows(
            cms_sketch(df.selectExpr("CAST(user_id AS STRING) AS __key"),
                       "__key", 4, 256)
        )

    all_events = read_sf_table(spark, sf_dir, "events")
    deliver(halves[0], "part1.parquet")
    run_once()
    assert sketch_rows(sketch_path) == batch_expected(
        all_events.where(F.col("event_id") % 2 == 0))

    deliver(halves[1], "part2.parquet")
    run_once()
    full = batch_expected(all_events)
    assert sketch_rows(sketch_path) == full

    run_once()  # no new files: table unchanged
    assert sketch_rows(sketch_path) == full


def test_stream_neardup_ingest_equals_batch(spark, sf_dir, tmp_path):
    """Streamed near-dup ingest across two arrivals must produce EXACTLY
    the pairs a batch-mode minhash_lsh_pairs finds over the full corpus
    (intra-batch + cross-batch union), and a no-new-data run appends
    nothing."""
    import glob
    import shutil

    from simple_anonymizer_spark.operators import dedup

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    halves = [docs.where(F.col("doc_id") % 2 == i) for i in (0, 1)]
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def deliver(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    def run_once():
        q = (
            INC.stream_neardup_ingest(
                spark, str(src), state, ckpt, schema=docs.schema
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    def pair_set(df):
        return {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in df.collect()}

    deliver(halves[0], "part1.parquet")
    run_once()
    got1 = pair_set(spark.read.parquet(state + "/pairs"))
    assert got1 == pair_set(dedup.minhash_lsh_pairs(halves[0]))

    deliver(halves[1], "part2.parquet")
    run_once()
    got2 = pair_set(spark.read.parquet(state + "/pairs"))
    want = pair_set(dedup.minhash_lsh_pairs(docs))
    assert got2 == want and len(want) > len(got1) > 0

    run_once()  # no new files: nothing appended
    assert pair_set(spark.read.parquet(state + "/pairs")) == want
    # the standing state grew to the full corpus
    assert spark.read.parquet(state + "/corpus").count() == docs.count()


def test_stream_embedding_ingest_index_queryable_and_pruned(spark, sf_dir, tmp_path):
    """The streamed IVF index after two arrivals must answer ivf_topk
    identically to a batch run over all delivered vectors (same pinned
    centroids), and the cell-partitioned layout must actually prune:
    reading one cell touches only that cell's files."""
    import glob
    import shutil

    from simple_anonymizer_spark.operators.similarity import (
        ivf_centroids, ivf_topk)

    vecs = read_sf_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    centroids = ivf_centroids(vecs, 8)
    halves = [vecs.where(F.col("vec_id") % 2 == i) for i in (0, 1)]
    src = tmp_path / "src"
    src.mkdir()
    index = str(tmp_path / "ivf_index")
    ckpt = str(tmp_path / "ckpt")

    def deliver(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    def run_once():
        q = (
            INC.stream_embedding_ingest(
                spark, str(src), index, ckpt, centroids, schema=vecs.schema
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    deliver(halves[0], "a.parquet")
    run_once()
    deliver(halves[1], "b.parquet")
    run_once()

    idx = spark.read.parquet(index)
    assert idx.count() == vecs.count()
    queries = vecs.where(F.col("vec_id") < 5)
    got = sorted(tuple(r) for r in ivf_topk(
        idx.select("vec_id", "embedding"), queries,
        centroids=centroids).collect())
    want = sorted(tuple(r) for r in ivf_topk(
        vecs, queries, centroids=centroids).collect())
    assert got == want and len(got) > 0

    # partition pruning: a single-cell read lists only that cell's files
    one_cell = spark.read.parquet(index).where(F.col("cell") == 0)
    files = {r[0] for r in
             one_cell.select(F.input_file_name()).distinct().collect()}
    assert files and all("cell=0" in f for f in files)

    run_once()  # no new data: index unchanged
    assert spark.read.parquet(index).count() == vecs.count()


def test_incremental_hll_across_arrivals(spark, sf_dir, tmp_path):
    """The streamed HLL register table after N arrivals must equal the
    batch register table over all data seen so far (MAX merge ==
    registers of the union); the estimate read mid-stream is the batch
    estimate; and because MAX is idempotent a replayed merge is
    harmless even WITHOUT the guard."""
    import glob
    import shutil

    from simple_anonymizer_spark.operators.sketch import (
        hll_estimate, hll_registers)
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    halves = [raw.where(F.col("event_id") % 2 == i) for i in (0, 1)]
    src = tmp_path / "src"
    src.mkdir()
    reg_path = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")

    def deliver(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    def run_once():
        q = (
            INC.stream_hll_rollup(
                spark, str(src), reg_path, ckpt, schema=raw.schema
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    def regs(path_or_df):
        df = (spark.read.parquet(path_or_df)
              if isinstance(path_or_df, str) else path_or_df)
        return {(r.register, r.max_rho) for r in df.collect()}

    def batch_regs(df):
        return regs(hll_registers(
            df.selectExpr("CAST(user_id AS STRING) AS __key"), "__key"))

    all_events = read_sf_table(spark, sf_dir, "events")
    deliver(halves[0], "part1.parquet")
    run_once()
    assert regs(reg_path) == batch_regs(
        all_events.where(F.col("event_id") % 2 == 0))

    deliver(halves[1], "part2.parquet")
    run_once()
    full = batch_regs(all_events)
    assert regs(reg_path) == full
    # mid-stream estimate == batch estimate over everything seen
    streamed_est = hll_estimate(spark.read.parquet(reg_path)).collect()[0]
    batch_est = hll_estimate(hll_registers(
        all_events.selectExpr("CAST(user_id AS STRING) AS __key"), "__key"
    )).collect()[0]
    assert streamed_est.hll_estimate == batch_est.hll_estimate

    # idempotence: re-merging the full delta directly (no guard) is a no-op
    delta = hll_registers(
        all_events.selectExpr("CAST(user_id AS STRING) AS __key"), "__key")
    INC.merge_max(spark, delta, reg_path, keys=["register"],
                  max_cols=["max_rho"])
    assert regs(reg_path) == full


def test_stream_iceberg_append_equals_batch(spark, sf_dir, tmp_path):
    """Streamed Iceberg maintenance: after two arrivals the table must
    equal the full corpus (streamed == batch), each micro-batch must be
    exactly one append snapshot (history == batch history, every batch
    boundary time-travelable), and a no-new-data run commits nothing."""
    import glob
    import shutil

    from simple_anonymizer_spark.sources import iceberg as ice

    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    halves = [docs.where(F.col("doc_id") % 2 == i) for i in (0, 1)]
    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def deliver(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    def run_once():
        q = (
            INC.stream_iceberg_append(
                spark, str(src), table, ckpt, schema=docs.schema,
                partition_by="source",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    deliver(halves[0], "part1.parquet")
    run_once()
    assert rows(ice.read_iceberg(spark, table)) == rows(halves[0])
    snaps1 = ice.iceberg_snapshots(spark, table).collect()
    assert [r.operation for r in snaps1] == ["append"]

    deliver(halves[1], "part2.parquet")
    run_once()
    assert rows(ice.read_iceberg(spark, table)) == rows(docs)
    snaps2 = ice.iceberg_snapshots(spark, table).collect()
    assert len(snaps2) == 2
    # batch-1 boundary stays time-travelable
    assert rows(ice.read_iceberg(
        spark, table, snapshot_id=snaps2[0].snapshot_id)) == rows(halves[0])
    # partition pruning works on the streamed table
    one_src = [r[0] for r in docs.select("source").distinct().collect()][0]
    assert rows(ice.read_iceberg(
        spark, table, partition_filter={"source": one_src})) == rows(
        docs.where(F.col("source") == one_src))

    run_once()  # no new files: no new snapshot, contents unchanged
    assert ice.iceberg_snapshots(spark, table).count() == 2
    assert ice.iceberg_count(table) == docs.count()


def test_stream_iceberg_upsert_last_write_wins(spark, sf_dir, tmp_path):
    """Streamed CDC upserts: batch 2 overwrites batch 1's rows with the
    same key and inserts new keys; the table reads as the last write per
    key; a no-new-data run changes nothing."""
    import glob
    import shutil

    from simple_anonymizer_spark.sources import iceberg as ice

    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    first = docs.where(F.col("doc_id") < 300)
    second = (docs.where((F.col("doc_id") >= 150)
                         & (F.col("doc_id") < 450))
              .withColumn("source", F.lit("cdc")))
    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def deliver(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    def run_once():
        q = (
            INC.stream_iceberg_upsert(
                spark, str(src), table, ckpt, ["doc_id"],
                schema=docs.schema,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    deliver(first, "part1.parquet")
    run_once()
    assert sorted(map(tuple, ice.read_iceberg(spark, table).collect())) \
        == sorted(map(tuple, first.collect()))

    deliver(second, "part2.parquet")
    run_once()
    want = sorted(map(tuple, first.where(F.col("doc_id") < 150)
                      .unionByName(second).collect()))
    got = sorted(map(tuple, ice.read_iceberg(spark, table).collect()))
    assert got == want
    assert {r[2] for r in got if 150 <= r[0] < 450} == {"cdc"}

    run_once()  # no new files: unchanged
    assert sorted(map(tuple, ice.read_iceberg(spark, table).collect())) \
        == want


def test_stream_iceberg_append_transformed_spec(spark, sf_dir, tmp_path):
    """Streamed maintenance under a TRANSFORMED partition spec: the
    first batch creates bucket[4](doc_id), later appends partition by
    the table's recorded spec, and bucket-equality pruning works on the
    streamed table exactly as on a batch-built one."""
    import glob
    import shutil

    from simple_anonymizer_spark.sources import iceberg as ice

    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    halves = [docs.where(F.col("doc_id") % 2 == i) for i in (0, 1)]
    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def deliver(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, str(src / name))

    def run_once():
        q = (INC.stream_iceberg_append(
                spark, str(src), table, ckpt, schema=docs.schema,
                partition_by=[("doc_id", "bucket[4]")])
             .trigger(availableNow=True).start())
        q.awaitTermination(240)

    deliver(halves[0], "part1.parquet")
    run_once()
    deliver(halves[1], "part2.parquet")
    run_once()

    assert ice.iceberg_count(table) == docs.count()
    files = ice.iceberg_plan_files(table)
    assert all(0 <= f["partition"]["doc_id_bucket"] < 4 for f in files)
    target = halves[1].select("doc_id").first()[0]
    pruned = ice.iceberg_plan_files(
        table, predicates=[("doc_id", "=", int(target))])
    assert 0 < len(pruned) < len(files)
    got = ice.read_iceberg(spark, table,
                           predicates=[("doc_id", "=", int(target))])
    assert [r["doc_id"] for r in got.collect()] == [target]
