"""Connected components — duplicate-cluster resolution over near-dup
pair graphs.

Pair generators (``dedup.minhash_lsh_pairs``, ``ngram_jaccard_pairs``,
``similarity.embedding_neardup_pairs``) emit edges; an actual dedup pass
needs the transitive CLUSTERS those edges imply, with one canonical
keeper per cluster. That is connected components: label every node with
the minimum node id reachable from it.

Algorithm: iterative min-label propagation. Each round every node takes
``min(own label, min of neighbors' labels)``; convergence in at most
graph-diameter rounds. Near-duplicate graphs are clique-ish (duplicates
of a document are duplicates of each other), so the diameter — and the
round count — is tiny in practice. Each round is one shuffle
(groupBy node) plus a broadcast-or-shuffle join; labels are eagerly
``localCheckpoint``-ed so the plan does not grow exponentially with
rounds. At extreme graph scale the alternating large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce", 2014)
halves the round count; the per-round dataflow below is the same shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with the smallest node id in its component.
    ``nodes`` (optional, single column ``node_col``) adds isolated nodes —
    they come back as singleton components. Output: ``node, component``.
    Raises if the propagation has not converged after ``max_iterations``
    (diameter larger than the bound — raise it)."""
    # r12 plan shape (guide §2.4 "remove shuffles outright"): the edge
    # set and the label table are hash-partitioned on their join keys
    # with the SAME explicit partition count and pre-sorted, then
    # localCheckpoint-ed — LogicalRDD preserves partitioning+ordering,
    # so the per-round label join is a sort-merge join with ZERO
    # exchange and ZERO sort on both standing sides. Before: every round
    # re-broadcast (or re-shuffled) the label table AND the edge set —
    # 2 broadcast-build jobs per round at bench scale, a full edge-set
    # re-shuffle per round at 100 TB. The merge hint pins the strategy:
    # broadcast would be legal at toy scale but re-introduces a
    # per-round broadcast build, and at scale the label side is
    # node-count-sized anyway (never broadcastable).
    try:
        n_part = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        # e.g. "auto" on managed platforms, or unset on some builds
        n_part = edges.sparkSession.sparkContext.defaultParallelism
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .repartition(n_part, "a")
        .sortWithinPartitions("a")
        # Materialize ONCE: every round joins against `und`, and without
        # this the edge-producing upstream (e.g. the whole MinHash pair
        # pipeline) would re-execute per iteration.
        .localCheckpoint()
    )
    # Propagation runs over edge-ENDPOINT nodes only: an isolated node
    # has no neighbors, so its label can never change — carrying it
    # through every round (the pre-r12 form) shuffles node-count rows
    # per round for nothing. Isolated nodes re-attach at the end as
    # singleton components (guide §2.3: shuffle fewer bytes).
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(n_part, "node")
        .sortWithinPartitions("node")
        .localCheckpoint()
    )

    def finish(endpoint_labels: DataFrame) -> DataFrame:
        if nodes is None:
            return endpoint_labels
        allnodes = (
            nodes.select(F.col(node_col).alias("node"))
            .union(und.select(F.col("a").alias("node")))
            .distinct()
        )
        return allnodes.join(endpoint_labels, "node", "left").select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )

    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels.hint("merge"), und.a == labels.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("__nmin"))
        )
        updated = (
            labels.join(neighbor_min.hint("merge"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("__nmin"), F.col("component")) < F.col("component"))
                .alias("__changed"),
            )
        ).localCheckpoint()  # truncate lineage every round
        changed = updated.filter("__changed").limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            return finish(labels)
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def cluster_stats(components: DataFrame) -> DataFrame:
    """Per-component size — the dedup keep/drop accounting. Output:
    ``component, n_members``."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )


def golden_records(
    rows: DataFrame,
    labels: DataFrame,
    id_col: str,
    score: Column,
    node_col: str = "node",
) -> DataFrame:
    """Survivorship: elect one canonical record per duplicate cluster.

    ``labels`` is the ``connected_components`` output; ``score`` ranks
    candidates within a cluster (higher wins, id ascending breaks ties —
    a total order, so the election is deterministic). Output: one row
    per input record — ``<id_col>, component, canonical_id (the
    elected record's id), is_canonical (int64 0/1)``.

    Scale (100 TB): one equi-join onto the label table, one window sort
    per component (components are duplicate clusters — small by
    construction), and a component-keyed join of the winners back. The
    same shuffle key (component) serves both stages.
    """
    joined = rows.join(
        labels, rows[id_col] == labels[node_col]
    ).select(rows[id_col].alias("__id"), F.col("component"),
             score.alias("__score"))
    w = Window.partitionBy("component").orderBy(
        F.col("__score").desc(), F.col("__id").asc()
    )
    ranked = joined.select(
        "__id", "component", F.row_number().over(w).alias("__rn")
    )
    canon = ranked.where(F.col("__rn") == 1).select(
        "component", F.col("__id").alias("canonical_id")
    )
    return ranked.join(canon, "component").select(
        F.col("__id").alias(id_col),
        "component",
        "canonical_id",
        (F.col("__id") == F.col("canonical_id")).cast("long")
        .alias("is_canonical"),
    )
