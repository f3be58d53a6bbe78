"""applyInPandasWithState stateful streaming + single-table copier tests."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.plans import TableSpec
from simple_anonymizer_spark.plans.table_copier import copy_table
from simple_anonymizer_spark.streaming.stateful import user_running_counts


def test_stateful_running_counts_stream(spark, sf_dir, tmp_path):
    """One availableNow micro-batch: per-user running counts from the state
    store must equal a batch groupBy."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    out = user_running_counts(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        r.user_id: r.n_events
        for r in spark.sql("SELECT * FROM user_counts").collect()
    }
    expected = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected


def test_copy_table_requires_all_columns_known(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id int, name string")

    def write(name, d):
        path = str(tmp_path / name)
        d.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    n = copy_table(lambda _: df, write, "t",
                   TableSpec.select(lambda r: [r.id, r.name.map_string("redact")]))
    assert n == 1
    got = spark.read.parquet(str(tmp_path / "t")).collect()[0]
    assert got.name == "*"

    with pytest.raises(ValueError, match="Unknown columns .* 'missing'|Unknown columns"):
        copy_table(lambda _: df, write, "t",
                   TableSpec.select(lambda r: [r.id, r.missing]))
