"""Incremental view maintenance: keep a parquet rollup continuously
up-to-date from an event stream with foreachBatch + additive MERGE.

The pattern every incremental pipeline needs and Spark doesn't ship
without a lakehouse catalog: aggregate ONLY the new micro-batch (a delta
aggregate), combine it additively with the current rollup, and swap the
table atomically (sources/merge.py). State lives in the TABLE, not the
state store — no watermark memory, late data simply folds into its window
whenever it arrives, and the rollup is always a full-history view.

Scale notes: each micro-batch costs one combinable aggregation over the
delta (tiny) + one keyed join against the rollup (bounded by distinct
keys, not history length). Partition the rollup by a window-derived
column so only touched partitions rewrite. Exactly-once comes from the
checkpoint (a replayed batch re-merges the same delta — see the
idempotency note in merge_additive: replays are NOT idempotent for sums,
which is why the checkpoint must gate batch re-entry; Spark's
foreachBatch contract guarantees batchId-based dedup when the writer
checks it, and the test pins the no-new-data case).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.merge import merge_parquet
from ..sources.parquet import normalize_events_ts
from ..plans.on_conflict import OnConflict


def tumbling_rollup_delta(batch: DataFrame, window_len: str = "1 hour") -> DataFrame:
    """The per-batch delta aggregate: counts + decimal-exact value sums
    per (window_start, event_type) for JUST this batch's rows."""
    return (
        batch.groupBy(
            F.window(F.col("ts"), window_len).alias("__w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value_dec"),
        )
        .select(
            F.unix_micros(F.col("__w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_dec",
        )
    )


def merge_additive(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    keys: list[str],
    add_cols: list[str],
) -> int:
    """Additively merge a delta aggregate into the rollup at ``path``:
    matched keys SUM ``add_cols`` (target + delta), unmatched insert.

    Built by pre-combining the delta with the current target (left join
    adding existing values), then running the plain do_update MERGE —
    the combined source row carries the new totals.
    """
    delta = delta.cache()
    try:
        if os.path.exists(path):
            target = spark.read.parquet(path).select(delta.columns)
            t_marked = target.select(
                *keys, *[F.col(c).alias(f"__t_{c}") for c in add_cols]
            )
            combined = delta.join(t_marked, keys, "left").select(
                *keys,
                *[
                    (F.col(c) + F.coalesce(F.col(f"__t_{c}"), F.lit(0)))
                    .alias(c)
                    for c in add_cols
                ],
            )
        else:
            combined = delta.select(*keys, *add_cols)
        return merge_parquet(
            spark, combined, path, keys,
            OnConflict.do_update(*keys),
        )
    finally:
        delta.unpersist()


def stream_rollup(
    spark: SparkSession,
    source_path: str,
    rollup_path: str,
    checkpoint: str,
    window_len: str = "1 hour",
    schema=None,
):
    """Wire the incremental rollup as a stream: raw events in, maintained
    rollup table out. Returns the DataStreamWriter (call .start()).

    foreachBatch records the last applied batchId next to the rollup so a
    replayed batch (failure between merge and checkpoint commit) is
    skipped instead of double-counted — the standard transactional-sink
    dance Delta does internally.
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = normalize_events_ts(reader.parquet(source_path))

    def merge_batch(batch_df: DataFrame, _bid: int) -> None:
        delta = tumbling_rollup_delta(batch_df, window_len)
        merge_additive(
            batch_df.sparkSession, delta, rollup_path,
            keys=["window_start", "event_type"],
            add_cols=["n_events", "sum_value_dec"],
        )

    return (
        raw.writeStream.foreachBatch(_replay_guarded(rollup_path, merge_batch))
        .option("checkpointLocation", checkpoint)
    )


def _replay_guarded(table_path: str, fn):
    """Wrap a foreachBatch body with the batch-id replay guard: a batch
    replayed after a crash between merge and checkpoint commit is skipped
    instead of double-merged (additive merges are NOT idempotent). The
    last applied id lives next to the table it protects."""
    batch_id_file = table_path + ".last_batch.json"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(batch_id_file):
            with open(batch_id_file) as fh:
                if json.load(fh)["last_batch_id"] >= batch_id:
                    return  # replay after a crash: already merged
        fn(batch_df, batch_id)
        with open(batch_id_file, "w") as fh:
            json.dump({"last_batch_id": batch_id}, fh)

    return apply_batch


def stream_sketch_rollup(
    spark: SparkSession,
    source_path: str,
    sketch_path: str,
    checkpoint: str,
    key_expr: str = "CAST(user_id AS STRING)",
    depth: int = 4,
    width: int = 256,
    schema=None,
):
    """Continuously-maintained count-min sketch over a stream — sketch
    cells are ADDITIVE (cnt sums), so the same delta-aggregate + additive
    MERGE pattern as ``stream_rollup`` keeps a full-history frequency
    summary in ``depth*width`` rows of table state: no watermark, no state
    store, late data folds in whenever it arrives, and point estimates
    stay valid mid-stream (``sketch.cms_estimate`` reads the table
    directly). Returns the DataStreamWriter (call ``.start()``)."""
    from ..operators.sketch import cms_sketch

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = normalize_events_ts(reader.parquet(source_path))

    def merge_batch(batch_df: DataFrame, _bid: int) -> None:
        delta = cms_sketch(
            batch_df.selectExpr(f"{key_expr} AS __key"), "__key", depth, width
        )
        merge_additive(
            batch_df.sparkSession, delta, sketch_path,
            keys=["sketch_row", "bucket"], add_cols=["cnt"],
        )

    return (
        raw.writeStream.foreachBatch(_replay_guarded(sketch_path, merge_batch))
        .option("checkpointLocation", checkpoint)
    )


def merge_max(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    keys: list[str],
    max_cols: list[str],
) -> int:
    """MAX-merge a delta into the rollup at ``path``: matched keys take
    ``GREATEST(target, delta)``, unmatched insert. Unlike the additive
    merge this is IDEMPOTENT — replaying a batch cannot corrupt the
    table — which is exactly the property HLL register state has."""
    delta = delta.cache()
    try:
        if os.path.exists(path):
            target = spark.read.parquet(path).select(delta.columns)
            t_marked = target.select(
                *keys, *[F.col(c).alias(f"__t_{c}") for c in max_cols]
            )
            combined = delta.join(t_marked, keys, "left").select(
                *keys,
                *[
                    F.greatest(F.col(c), F.coalesce(F.col(f"__t_{c}"), F.col(c)))
                    .alias(c)
                    for c in max_cols
                ],
            )
        else:
            combined = delta.select(*keys, *max_cols)
        return merge_parquet(
            spark, combined, path, keys,
            OnConflict.do_update(*keys),
        )
    finally:
        delta.unpersist()


def stream_hll_rollup(
    spark: SparkSession,
    source_path: str,
    registers_path: str,
    checkpoint: str,
    key_expr: str = "CAST(user_id AS STRING)",
    p: int = 10,
    schema=None,
):
    """Continuously-maintained HLL register table over a stream — the
    DISTINCT-count sibling of ``stream_sketch_rollup``: per-batch
    registers MAX-merge into at most ``2^p`` rows of table state, so a
    full-history distinct-key estimate (``sketch.hll_estimate`` over the
    table) stays valid mid-stream at any stream length. No watermark, no
    state store, late data folds in whenever it arrives; because MAX is
    idempotent the replay guard is belt-and-braces here, not
    correctness-critical. Returns the DataStreamWriter (call
    ``.start()``)."""
    from ..operators.sketch import hll_registers

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = normalize_events_ts(reader.parquet(source_path))

    def merge_batch(batch_df: DataFrame, _bid: int) -> None:
        delta = hll_registers(
            batch_df.selectExpr(f"{key_expr} AS __key"), "__key", p
        )
        merge_max(
            batch_df.sparkSession, delta, registers_path,
            keys=["register"], max_cols=["max_rho"],
        )

    return (
        raw.writeStream.foreachBatch(_replay_guarded(registers_path, merge_batch))
        .option("checkpointLocation", checkpoint)
    )


def stream_neardup_ingest(
    spark: SparkSession,
    source_path: str,
    state_dir: str,
    checkpoint: str,
    schema=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
):
    """Streaming near-duplicate ingest against a STANDING corpus — the
    streaming face of ``dedup.minhash_lsh_ingest``. Each micro-batch:

    1. finds the batch's internal near-dup pairs (``minhash_lsh_pairs``
       over just the batch — O(batch) signatures);
    2. screens the batch against everything already ingested via the
       persisted band index (``minhash_lsh_ingest`` — the candidates
       subtree reads the index, candidates-only verify);
    3. appends the verified pairs to ``<state_dir>/pairs``, the batch's
       band entries to ``<state_dir>/band_index``, and the batch's
       ``(id, text)`` rows to ``<state_dir>/corpus``.

    The union of intra-batch and cross-batch pairs makes the streamed
    output EQUAL to a batch-mode ``minhash_lsh_pairs`` over the full
    corpus, regardless of how arrivals were chopped into batches — the
    streamed==batch contract the test pins. Document ids must be unique
    across the stream (the standard ingest assumption; replays are
    handled by the batch-id guard, not id dedup).

    State grows with the corpus BY DESIGN (it is the standing index —
    one row per band per document, plus the text for verify); per-batch
    cost stays O(batch + candidates). Appends are blind (no merge), so
    a replayed batch would double-append — the same batch-id guard as
    ``stream_rollup`` makes replays no-ops. Returns the
    DataStreamWriter (call ``.start()``)."""
    from ..operators import dedup

    index_path = os.path.join(state_dir, "band_index")
    corpus_path = os.path.join(state_dir, "corpus")
    pairs_path = os.path.join(state_dir, "pairs")

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.parquet(source_path)

    kw = dict(text_col=text_col, id_col=id_col, num_hashes=num_hashes,
              bands=bands, shingle_k=shingle_k)

    def ingest_batch(batch_df: DataFrame, _bid: int) -> None:
        s = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).cache()
        try:
            pairs = dedup.minhash_lsh_pairs(
                batch, jaccard_threshold=jaccard_threshold, **kw
            ).select("id_a", "id_b", "jaccard")
            if os.path.exists(index_path):
                index = s.read.parquet(index_path)
                corpus = s.read.parquet(corpus_path)
                cross = dedup.minhash_lsh_ingest(
                    index, corpus, batch,
                    jaccard_threshold=jaccard_threshold, **kw
                ).select(
                    F.least("new_id", "corpus_id").alias("id_a"),
                    F.greatest("new_id", "corpus_id").alias("id_b"),
                    "jaccard",
                )
                pairs = pairs.unionByName(cross)
            pairs.write.mode("append").parquet(pairs_path)
            dedup.minhash_band_index(batch, **kw).write.mode(
                "append").parquet(index_path)
            batch.write.mode("append").parquet(corpus_path)
        finally:
            batch.unpersist()

    return (
        raw.writeStream.foreachBatch(_replay_guarded(pairs_path, ingest_batch))
        .option("checkpointLocation", checkpoint)
    )


def stream_embedding_ingest(
    spark: SparkSession,
    source_path: str,
    index_path: str,
    checkpoint: str,
    centroids: list[list[float]],
    schema=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Continuously maintain a cell-partitioned IVF index from a vector
    stream — the ANN sibling of ``stream_neardup_ingest``. Each
    micro-batch maps through ``similarity.ivf_assign_cell`` (broadcast
    LITERAL centroids, so assignment never shuffles) and appends to
    ``index_path`` partitioned by cell; the standing index is
    immediately queryable with ``similarity.ivf_topk`` (pass the same
    ``centroids``), and because files are laid out by cell, a probe of
    ``nprobe`` cells reads ``nprobe/n_cells`` of the data — Spark's
    partition pruning does the index lookup.

    The centroid list is the model and must stay FIXED across the
    stream's lifetime (retraining means rebuilding the index — standard
    IVF operations practice). Appends are blind; the batch-id guard
    makes replayed batches no-ops. Returns the DataStreamWriter."""
    from ..operators.similarity import ivf_assign_cell

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.parquet(source_path)

    def ingest_batch(batch_df: DataFrame, _bid: int) -> None:
        (
            batch_df.select(
                F.col(id_col), F.col(vec_col),
                ivf_assign_cell(F.col(vec_col), centroids).alias("cell"),
            )
            .write.mode("append").partitionBy("cell").parquet(index_path)
        )

    return (
        raw.writeStream.foreachBatch(_replay_guarded(index_path, ingest_batch))
        .option("checkpointLocation", checkpoint)
    )


def stream_iceberg_append(
    spark: SparkSession,
    source_path: str,
    table_dir: str,
    checkpoint: str,
    schema=None,
    partition_by=None,
):
    """Continuously maintain an Iceberg table from a stream — the
    lakehouse face of the maintainer family: each micro-batch commits
    exactly ONE append snapshot through ``sources/iceberg.py`` (the
    first batch creates the table; ``partition_by`` takes every form
    ``create_iceberg`` does, transformed specs included, and every
    subsequent append partitions by the table's recorded spec), so the
    table's snapshot history IS the batch history and every historical
    batch boundary stays time-travelable.

    The commit itself is the single-job partitionBy write + O(new
    files) metadata append, so per-batch cost is O(batch) regardless of
    table size — the property that makes this a standing maintainer at
    100 TB. A crash between commit and checkpoint would replay the
    batch as a SECOND append snapshot (doubled rows), so the same
    batch-id guard as ``stream_rollup`` makes replays no-ops; with it,
    streamed contents equal a batch-mode create+appends over the same
    arrivals (the streamed==batch contract the test pins). Returns the
    DataStreamWriter (call ``.start()``)."""
    from ..sources import iceberg as ice

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.parquet(source_path)

    def append_batch(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(ice._meta_dir(table_dir)):
            ice.append_iceberg(batch_df, table_dir)
        else:
            ice.create_iceberg(batch_df, table_dir,
                               partition_by=partition_by)

    return (
        raw.writeStream.foreachBatch(_replay_guarded(table_dir, append_batch))
        .option("checkpointLocation", checkpoint)
    )


def stream_iceberg_upsert(
    spark: SparkSession,
    source_path: str,
    table_dir: str,
    checkpoint: str,
    key_cols: list[str],
    schema=None,
    partition_by: str | None = None,
):
    """Continuously MERGE a change stream into an Iceberg v2 table — the
    CDC face of ``stream_iceberg_append``: each micro-batch upserts by
    ``key_cols`` (one equality-delete commit on the batch's keys + one
    append, ``upsert_iceberg``), so later batches overwrite earlier rows
    with the same key and the table always reads as the LAST write per
    key. Keys must be unique WITHIN a batch (the standard foreachBatch
    merge assumption); across batches the sequence rule arbitrates.

    Per-batch cost is O(batch) metadata + one key-file write — no data
    file is ever rewritten, however large the table grows (the deletes
    apply merge-on-read). The batch-id guard makes replays no-ops; with
    it, streamed contents equal batch-mode upserts over the same
    arrivals in the same order. Returns the DataStreamWriter."""
    from ..sources import iceberg as ice

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    raw = reader.parquet(source_path)

    def upsert_batch(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(ice._meta_dir(table_dir)):
            ice.upsert_iceberg(
                batch_df.sparkSession, table_dir, batch_df, key_cols)
        else:
            ice.create_iceberg(batch_df, table_dir,
                               partition_by=partition_by,
                               format_version=2)

    return (
        raw.writeStream.foreachBatch(_replay_guarded(table_dir, upsert_batch))
        .option("checkpointLocation", checkpoint)
    )
