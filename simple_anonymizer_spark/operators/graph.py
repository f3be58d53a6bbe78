"""Weighted PageRank over an edge DataFrame, in exact integer arithmetic.

Joins `operators/components.py` (connected components) as the second
iterative graph primitive. The classic formulation accumulates floating-
point rank mass, whose sum order differs run-to-run and engine-to-engine;
here every quantity is fixed-point int64 so each iteration is a pure
integer join + sum — bit-identical on any engine and any partitioning:

* ranks carry ``RANK_SCALE = 10^12`` fixed point;
* edge weights are pre-normalized per source to ``W_SCALE = 10^6``
  (``wn = w * 10^6 div out_w``, floor — the lost mass is deterministic);
* one step: ``r'_j = (15*RANK_SCALE div (100*N)) + (85 * sum_i (r_i *
  wn_ij div 10^6)) div 100`` — damping 0.85, teleport 0.15.

int64 bound: ``r * wn <= 10^12 * 10^6 < 2^63``. Dangling nodes keep the
teleport term only (their mass is not redistributed — documented drop,
same convention both engines).

Scale (100 TB): the per-iteration work is one equi-join of edges against
the rank table on the source key and one map-side-combinable integer sum
keyed by destination — the textbook distributed PageRank shape. Rank and
edge tables co-partition on the node key across iterations; only the
node COUNT (one scalar) ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 10**12
W_SCALE = 10**6


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Fixed-iteration weighted PageRank.

    Output: ``node, rank_fp (int64, 10^12 fixed point), rank (double)``.
    """
    src, dst, w = F.col(src_col), F.col(dst_col), F.col(weight_col)
    # The edge/node subplans are referenced once per iteration; without
    # materialization Spark re-evaluates the full upstream lineage (e.g.
    # the fact-table joins that built the graph) every time — measured 14
    # redundant scans at 3 iterations. localCheckpoint pins them once,
    # the same pattern as the self-ref closure's frontiers
    # (plans/propagation.py). A production cluster run would use a
    # reliable checkpoint dir; the algorithm is insensitive to it.
    # r13: the caller's edge pipeline (e.g. the 4-table nation-trade
    # join+aggregate) was declared FOUR times — twice under nodes, twice
    # under norm_edges (edges + out_w) — and deduplication depended on
    # runtime exchange reuse firing (the lsh_ingest lesson: bimodal).
    # One eager checkpoint of the O(E) edge list runs the upstream once;
    # everything below derives from the pinned RDD.
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one scalar to the driver — bounds every constant below
    base = (15 * RANK_SCALE) // (100 * n)

    out_w = edges.groupBy(src.alias("__s")).agg(
        F.sum(w.cast("long")).alias("__out_w")
    )
    norm_edges = (
        edges.join(out_w, src == F.col("__s"))
        .select(
            src.alias("e_src"),
            dst.alias("e_dst"),
            F.expr(
                f"CAST({weight_col} AS BIGINT) * {W_SCALE} div __out_w"
            ).alias("wn"),
        )
        .localCheckpoint(eager=True)
    )

    ranks = nodes.select(
        "node", F.lit(RANK_SCALE // n).cast("long").alias("r")
    )
    for _ in range(iterations):
        contribs = (
            norm_edges.join(ranks, norm_edges.e_src == ranks.node)
            .select(
                F.col("e_dst").alias("node"),
                F.expr(f"r * wn div {W_SCALE}").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left_outer")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("85 * coalesce(s, CAST(0 AS BIGINT)) div 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # truncate per-iteration lineage
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_fp"),
        (F.col("r").cast("double") / F.lit(float(RANK_SCALE))).alias("rank"),
    )


def undirected_canonical(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Canonical undirected edge set: ``(a, b)`` with ``a < b``, self-loops
    dropped, parallel edges collapsed. Every triangle algorithm downstream
    assumes this normal form."""
    a = F.least(F.col(src_col), F.col(dst_col)).alias("a")
    b = F.greatest(F.col(src_col), F.col(dst_col)).alias("b")
    return (
        edges.select(a, b)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient.

    Output: ``node, degree (int64), tri_count (int64), lcc (double)`` with
    ``lcc = 2 * tri / (degree * (degree - 1))`` (0.0 when degree < 2) —
    both operands already-identical int64 before the one IEEE division.

    Scale (100 TB): wedges are enumerated under the degree orientation of
    Suri & Vassilvitskii's MapReduce triangle algorithm — each edge is
    directed from its (degree, id)-smaller endpoint to the larger, so a
    node generates wedges only among neighbors that out-rank it. Wedge
    count is bounded by sum_e min-degree(e) = O(m^1.5) instead of
    sum_v deg(v)^2, which is the difference between a hub node producing
    deg^2 candidate pairs and producing none. Both joins are plain
    equi-joins (on the wedge center, then on the closing (v, w) pair) —
    shuffle-partitioned by node key, no cartesian anywhere. Counts are
    exact integers; enumeration order is immaterial to the result, so the
    DuckDB oracle may use the simpler id-ordered 3-way self-join.
    """
    # The canonical edge set feeds the degree union (x2), the orientation
    # join, and - through `oriented` - three more subtrees; without a pin
    # every reference re-derives the caller's whole edge pipeline (for
    # the trade graph: a 4-table join) - the simjoin/release multi-
    # reference disease. Materialize each once.
    und = undirected_canonical(edges, src_col, dst_col).localCheckpoint(
        eager=True
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # Orient each edge from its (degree, id)-smaller endpoint to the larger.
    keyed = (
        und.join(deg.select(F.col("node").alias("a"),
                            F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("degree").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (
            (F.col("o1.dv") < F.col("o2.dv"))
            | ((F.col("o1.dv") == F.col("o2.dv"))
               & (F.col("o1.v") < F.col("o2.v")))
        ),
    ).select(
        F.col("o1.u").alias("w_u"),
        F.col("o1.v").alias("w_x"),
        F.col("o2.v").alias("w_y"),
    )
    closing = oriented.select(F.col("u").alias("w_x"), F.col("v").alias("w_y"))
    triangles = wedges.join(closing, ["w_x", "w_y"], "left_semi")
    per_node = (
        triangles.select(
            F.explode(F.array("w_u", "w_x", "w_y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri_count"))
    )
    return (
        deg.join(per_node, "node", "left_outer")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("tri_count"), F.lit(0).cast("long"))
            .alias("tri_count"),
            F.when(F.col("degree") < 2, F.lit(0.0))
            .otherwise(
                (F.coalesce(F.col("tri_count"), F.lit(0).cast("long")) * 2)
                .cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            )
            .alias("lcc"),
        )
    )


def nation_trade_edges(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Customer-nation -> supplier-nation trade graph, weighted by the
    number of lineitems flowing between them. Supplier and customer both
    scale with SF (SF x 10k / SF x 150k rows), so neither carries a pinned
    broadcast hint — AQE picks broadcast when a side is actually under the
    threshold at runtime; the joins shuffle on their keys otherwise."""
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    iterations: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    every node with degree < k (and its edges) until stable — the
    classic graph-density filter (web-spam and bot-farm screens keep
    the dense core; link-graph quality signals discard the periphery).
    The input edge list is treated as UNDIRECTED: it is symmetrized and
    deduplicated first, so degree = number of distinct neighbors.

    Peeling is monotone (a removed node never comes back), so running
    more iterations past the fixpoint is a no-op: a fixed ``iterations``
    unroll is output-identical to loop-until-stable whenever it covers
    convergence, and the loop breaks early the first time an iteration
    removes nothing (one bounded scalar per iteration — the pagerank
    node-count pattern). Production runs set ``iterations`` high and
    rely on the break; the oracle mirror unrolls the same fixed count.

    Each iteration is one map-side-combinable degree aggregation plus
    two semi-joins of the live edge list against the surviving node
    set — the same co-partitioned join shape as pagerank's step, with
    ``localCheckpoint`` pinning each generation (re-evaluating iteration
    i's lineage at iteration i+1 would rescan the whole upstream graph
    build per generation). Output: ``node (long), core_degree (long)``
    — the members of the k-core with their within-core degree.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    sym = (
        edges.select(src.alias("a"), dst.alias("b"))
        .union(edges.select(dst.alias("a"), src.alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = sym
    for _ in range(iterations):
        keep = (
            alive.groupBy("a")
            .agg(F.count(F.lit(1)).cast("long").alias("__deg"))
            .where(F.col("__deg") >= k)
            .select("a")
        )
        nxt = (
            alive.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        # bounded: one scalar per iteration; peeling is monotone so
        # equal edge counts mean the fixpoint was reached
        if nxt.count() == alive.count():
            alive = nxt
            break
        alive = nxt
    return (
        alive.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
