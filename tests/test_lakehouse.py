"""Lakehouse MERGE gating (sources/lakehouse.py): the OnConflict -> Delta
merge-builder translation is pinned via an injected protocol recorder (no
Delta jars in this container), and the front door must fall back to the
parquet staging-swap path with identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from simple_anonymizer_spark.plans.on_conflict import OnConflict
from simple_anonymizer_spark.sources import lakehouse
from simple_anonymizer_spark.sources.merge import merge_parquet


class RecordingBuilder:
    def __init__(self, log):
        self.log = log

    def whenMatchedUpdate(self, set=None):
        self.log.append(("whenMatchedUpdate", dict(set)))
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append(("whenNotMatchedInsertAll",))
        return self

    def execute(self):
        self.log.append(("execute",))


class RecordingTable:
    """Implements the structural protocol DeltaTable satisfies."""

    def __init__(self, spark, rows_df):
        self.log = []
        self._df = rows_df

    def alias(self, name):
        self.log.append(("alias", name))
        return self

    def merge(self, source, condition):
        self.log.append(("merge", condition))
        self._merge_source = source
        return RecordingBuilder(self.log)

    def toDF(self):
        return self._df


@pytest.fixture()
def target_df(spark):
    return spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b")], "id long, v string"
    )


def test_do_update_builder_sequence(spark, target_df):
    src = spark.createDataFrame([Row(id=2, v="B"), Row(id=3, v="c")],
                                "id long, v string")
    table = RecordingTable(spark, target_df)
    n = lakehouse.merge_lakehouse(
        spark, src, "/ignored", ["id"], OnConflict.do_update("id"),
        table=table,
    )
    assert n == 2  # recorder returns the injected target frame
    assert table.log == [
        ("alias", "__mrg_tgt"),
        ("merge", "__mrg_tgt.`id` = __mrg_src.`id`"),
        ("whenMatchedUpdate", {"v": "__mrg_src.`v`"}),
        ("whenNotMatchedInsertAll",),
        ("execute",),
    ]


def test_do_nothing_skips_matched_clause(spark, target_df):
    src = spark.createDataFrame([Row(id=2, v="B")], "id long, v string")
    table = RecordingTable(spark, target_df)
    lakehouse.merge_lakehouse(
        spark, src, "/ignored", ["id"], OnConflict.do_nothing("id"),
        table=table,
    )
    kinds = [e[0] for e in table.log]
    assert "whenMatchedUpdate" not in kinds
    assert kinds[-2:] == ["whenNotMatchedInsertAll", "execute"]


def test_update_columns_subset_and_composite_key(spark):
    df = spark.createDataFrame([Row(a=1, b=2, x="p", y="q")],
                               "a long, b long, x string, y string")
    table = RecordingTable(spark, df)
    lakehouse.merge_lakehouse(
        spark, df, "/ignored", ["a", "b"],
        OnConflict.do_update("a", "b", update_columns=("x",)), table=table,
    )
    assert ("merge", "__mrg_tgt.`a` = __mrg_src.`a` AND "
            "__mrg_tgt.`b` = __mrg_src.`b`") in table.log
    assert ("whenMatchedUpdate", {"x": "__mrg_src.`x`"}) in table.log


def test_merge_source_is_key_deduped(spark, target_df):
    src = spark.createDataFrame(
        [Row(id=3, v="z"), Row(id=3, v="a")], "id long, v string"
    )
    table = RecordingTable(spark, target_df)
    lakehouse.merge_lakehouse(
        spark, src, "/ignored", ["id"], OnConflict.do_update("id"),
        table=table,
    )
    rows = table._merge_source.collect()
    assert [(r.id, r.v) for r in rows] == [(3, "z")]  # last under total order


def test_build_merge_rejects_plain_insert(spark, target_df):
    """on_conflict=None is append semantics (every source row lands,
    duplicates included) — an insert-only MERGE would drop rows whose keys
    already exist, so the builder refuses to translate it."""
    table = RecordingTable(spark, target_df)
    src = spark.createDataFrame([Row(id=2, v="B")], "id long, v string")
    with pytest.raises(ValueError, match="append"):
        lakehouse.build_merge(table, src, ["id"], None, src.columns)


def test_front_door_none_matches_parquet_append(spark, tmp_path):
    """Parity for the None case on the front door: with no Delta runtime it
    must behave exactly like merge_parquet's plain append — existing keys
    kept AND re-appended, not dropped."""
    t = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")],
                              "id long, v string")
    src = spark.createDataFrame([Row(id=2, v="B"), Row(id=3, v="c")],
                                "id long, v string")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    t.write.parquet(p1)
    t.write.parquet(p2)
    n = lakehouse.merge_table(spark, src, p1, ["id"], None)
    merge_parquet(spark, src, p2, ["id"], None)
    assert n == 4  # 2 existing + 2 appended; id=2 now present twice
    assert sorted(map(tuple, spark.read.parquet(p1).collect())) == \
        sorted(map(tuple, spark.read.parquet(p2).collect()))


def test_front_door_falls_back_to_parquet(spark, tmp_path):
    assert not lakehouse.delta_available(spark)
    path = str(tmp_path / "t")
    t = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")],
                              "id long, v string")
    t.write.parquet(path)
    src = spark.createDataFrame([Row(id=2, v="B"), Row(id=3, v="c")],
                                "id long, v string")
    n = lakehouse.merge_table(spark, src, path, ["id"],
                              OnConflict.do_update("id"))
    assert n == 3
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_front_door_matches_direct_parquet_merge(spark, tmp_path):
    t = spark.createDataFrame([Row(id=i, v=str(i)) for i in range(10)],
                              "id long, v string")
    src = spark.createDataFrame(
        [Row(id=i, v=f"new{i}") for i in range(5, 15)], "id long, v string"
    )
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    t.write.parquet(p1)
    t.write.parquet(p2)
    lakehouse.merge_table(spark, src, p1, ["id"], OnConflict.do_nothing("id"))
    merge_parquet(spark, src, p2, ["id"], OnConflict.do_nothing("id"))
    assert sorted(map(tuple, spark.read.parquet(p1).collect())) == \
        sorted(map(tuple, spark.read.parquet(p2).collect()))
