"""TableSorter ports — ``tests/TableSorterTest.scala``."""

from __future__ import annotations

from simple_anonymizer_spark.plans.table_sorter import (compute_table_levels,
                                                        group_tables_by_level,
                                                        sort_tables)
from simple_anonymizer_spark.sources.catalog import LogicalFK


def fk(child, child_col, parent, parent_col):
    return LogicalFK(None, child, parent, ((child_col, parent_col),))


def test_no_deps_level_zero():
    assert compute_table_levels(["a", "b"], []) == {"a": 0, "b": 0}


def test_chain():
    fks = [fk("b", "a_id", "a", "id"), fk("c", "b_id", "b", "id")]
    assert compute_table_levels(["a", "b", "c"], fks) == {"a": 0, "b": 1, "c": 2}


def test_diamond():
    # TableSorterTest.scala:40-53 — d depends on b and c, both depend on a.
    fks = [
        fk("b", "a_id", "a", "id"),
        fk("c", "a_id", "a", "id"),
        fk("d", "b_id", "b", "id"),
        fk("d", "c_id", "c", "id"),
    ]
    assert compute_table_levels(["a", "b", "c", "d"], fks) == {
        "a": 0, "b": 1, "c": 1, "d": 2,
    }


def test_self_ref_ignored():
    # TableSorterTest.scala:55-60
    fks = [fk("a", "parent_id", "a", "id")]
    assert compute_table_levels(["a"], fks) == {"a": 0}


def test_cycles_dropped():
    # TableSorterTest.scala:62-70 — cyclic tables omitted, others assigned.
    fks = [fk("a", "b_id", "b", "id"), fk("b", "a_id", "a", "id")]
    levels = compute_table_levels(["a", "b", "c"], fks)
    assert levels == {"c": 0}


def test_out_of_scope_parent_ignored():
    fks = [fk("b", "x_id", "x", "id")]  # x not in table list
    assert compute_table_levels(["b"], fks) == {"b": 0}


def test_grouping_sorted():
    # TableSorterTest.scala:77-90
    levels = {"z": 0, "a": 0, "m": 1}
    assert group_tables_by_level(levels) == [["a", "z"], ["m"]]
    assert group_tables_by_level({}) == []


def test_sort_tables_end_to_end():
    fks = [fk("orders", "user_id", "users", "id"),
           fk("order_items", "order_id", "orders", "id")]
    assert sort_tables(["order_items", "users", "orders"], fks) == [
        ["users"], ["orders"], ["order_items"],
    ]
