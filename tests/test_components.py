"""Connected-components tests: shapes, isolated nodes, convergence,
cluster accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.components import (
    cluster_stats,
    connected_components,
)


def edges_of(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def labels_of(df):
    return {r.node: r.component for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain plus separate component {10, 11}
    out = connected_components(
        edges_of(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    )
    assert labels_of(out) == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_isolated_nodes_are_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    out = connected_components(edges_of(spark, [(0, 3)]), nodes=nodes)
    got = labels_of(out)
    assert got[0] == got[3] == 0
    assert all(got[i] == i for i in (1, 2, 4, 5))


def test_direction_does_not_matter(spark):
    a = labels_of(connected_components(edges_of(spark, [(5, 1), (1, 9)])))
    b = labels_of(connected_components(edges_of(spark, [(1, 5), (9, 1)])))
    assert a == b == {1: 1, 5: 1, 9: 1}


def test_long_path_needs_diameter_rounds(spark):
    n = 18
    out = connected_components(edges_of(spark, [(i, i + 1) for i in range(n)]))
    assert set(labels_of(out).values()) == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            edges_of(spark, [(i, i + 1) for i in range(n)]), max_iterations=2
        )


def test_cluster_stats(spark):
    out = connected_components(edges_of(spark, [(1, 2), (2, 3), (7, 8)]))
    stats = {r.component: r.n_members for r in cluster_stats(out).collect()}
    assert stats == {1: 3, 7: 2}


def test_no_python_in_round_plan(spark):
    """Each propagation round is pure JVM (join + groupBy min)."""
    out = connected_components(edges_of(spark, [(1, 2), (3, 4), (2, 3)]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Golden-record survivorship
# ---------------------------------------------------------------------------


def test_golden_records_elects_highest_score_lowest_id(spark):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators.components import (
        connected_components,
        golden_records,
    )

    # Cluster {1,2,3} (3 longest), cluster {4,5} tie on length -> 4 wins,
    # 6 is a singleton.
    rows = spark.createDataFrame(
        [(1, "aa"), (2, "bbbb"), (3, "cccccc"), (4, "dd"), (5, "ee"),
         (6, "f")],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    labels = connected_components(
        edges, nodes=rows.select(F.col("doc_id").alias("node"))
    )
    out = {r.doc_id: (r.component, r.canonical_id, r.is_canonical)
           for r in golden_records(rows, labels, "doc_id",
                                   F.length(F.col("text"))).collect()}
    assert out[1] == (1, 3, 0) and out[2] == (1, 3, 0) and out[3] == (1, 3, 1)
    assert out[4] == (4, 4, 1) and out[5] == (4, 4, 0)
    assert out[6] == (6, 6, 1)
    assert len(out) == 6
