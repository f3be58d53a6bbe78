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

from pyspark.sql import DataFrame, functions as F


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
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        # Materialize ONCE: every round joins against `und`, and without
        # this the edge-producing upstream (e.g. the whole MinHash pair
        # pipeline) would re-execute per iteration.
        .localCheckpoint()
    )
    endpoints = und.select(F.col("a").alias("node")).distinct()
    if nodes is not None:
        endpoints = (
            nodes.select(F.col(node_col).alias("node")).union(endpoints).distinct()
        )
    labels = endpoints.withColumn("component", F.col("node")).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels, und.a == labels.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("__nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
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
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def cluster_stats(components: DataFrame) -> DataFrame:
    """Per-component size — the dedup keep/drop accounting. Output:
    ``component, n_members``."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
