"""Coverage validation goldens (``tests/CoverageValidatorTest.scala``) and
end-to-end DbCopier runs on parquet fixtures."""

from __future__ import annotations

import pytest

from simple_anonymizer_spark.functions import pyimpl as P
from simple_anonymizer_spark.plans import TableSpec
from simple_anonymizer_spark.plans import coverage
from simple_anonymizer_spark.plans.db_copier import DbCopier, add_keys
from simple_anonymizer_spark.sources.catalog import Catalog, LogicalFK


def fk(child, child_col, parent, parent_col):
    return LogicalFK(None, child, parent, ((child_col, parent_col),))


@pytest.fixture(scope="module")
def catalog():
    return Catalog.declared(
        columns={
            "users": ["id", "first_name", "email"],
            "orders": ["id", "user_id", "total", "status"],
        },
        primary_keys={"users": {"id"}, "orders": {"id"}},
        foreign_keys=[fk("orders", "user_id", "users", "id")],
    )


def test_data_columns_excludes_keys(catalog):
    # CoverageValidatorIntegrationTest.scala:6-26
    assert coverage.data_columns(catalog, "orders") == ["total", "status"]
    assert coverage.data_columns(catalog, "users") == ["first_name", "email"]


def test_missing_table_error_has_snippet(catalog):
    with pytest.raises(ValueError) as e:
        coverage.validate(catalog, set(), {"users": TableSpec.select(
            lambda r: [r.id, r.first_name, r.email])})
    msg = str(e.value)
    assert '"orders": TableSpec.select(lambda row: [' in msg
    assert "row.total" in msg and "row.status" in msg
    assert 'skip them via DbCopier(skipped_tables={"orders"})' in msg


def test_missing_columns_error_has_snippet(catalog):
    specs = {
        "users": TableSpec.select(lambda r: [r.id]),
        "orders": TableSpec.select(lambda r: [r.id, r.user_id, r.total, r.status]),
    }
    with pytest.raises(ValueError) as e:
        coverage.validate(catalog, set(), specs)
    msg = str(e.value)
    assert "Table 'users' is missing 2 column(s)" in msg
    assert "row.email" in msg and "row.first_name" in msg


def test_skipped_tables_excluded(catalog):
    coverage.validate(catalog, {"orders"}, {"users": TableSpec.select(
        lambda r: [r.id, r.first_name, r.email])})


def test_add_keys_user_spec_wins(catalog):
    spec = TableSpec.select(lambda r: [r.total, r.user_id.nulled])
    enriched = add_keys(spec, catalog, "orders")
    names = enriched.column_names
    assert set(names) == {"total", "user_id", "id"}
    assert len(names) == 3  # user_id not duplicated
    # user's nulled user_id preserved, not replaced by passthrough
    from simple_anonymizer_spark.plans import FixedColumn
    by_name = {c.name: c for c in enriched.columns}
    assert isinstance(by_name["user_id"], FixedColumn)


def test_db_copier_end_to_end(spark, catalog, tmp_path):
    users = spark.createDataFrame(
        [(1, "Alice", "a@x.com"), (2, "Bob", "b@x.com"), (3, "Carol", None)],
        "id int, first_name string, email string",
    )
    orders = spark.createDataFrame(
        [(1, 1, 10.0, "done"), (2, 2, 20.0, "open"), (3, 3, 30.0, "done")],
        "id int, user_id int, total double, status string",
    )
    dfs = {"users": users, "orders": orders}
    out_counts = {}

    def write(name, df):
        path = str(tmp_path / name)
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        out_counts[name] = path
        return n

    copier = DbCopier(catalog, lambda n: dfs[n], write)
    result = copier.run({
        "users": TableSpec.select(lambda r: [
            r.first_name.map_string("first_name"),
            r.email.map_string("email"),
        ]).where("id <= 2"),
        "orders": TableSpec.select(lambda r: [r.total, r.status]),
    })
    assert result == {"users": 2, "orders": 2}

    got_users = {r.id: r for r in spark.read.parquet(out_counts["users"]).collect()}
    assert set(got_users) == {1, 2}
    assert got_users[1].first_name == P.first_name("Alice")
    assert got_users[1].email == P.email("a@x.com")
    got_orders = {r.id: r.user_id for r in spark.read.parquet(out_counts["orders"]).collect()}
    assert got_orders == {1: 1, 2: 2}  # order 3 subsetted away


def test_db_copier_validation_failure(spark, catalog):
    copier = DbCopier(catalog, lambda n: None, lambda n, d: 0)
    with pytest.raises(ValueError, match="Missing table specs"):
        copier.run({"users": TableSpec.select(lambda r: [r.first_name, r.email])})
