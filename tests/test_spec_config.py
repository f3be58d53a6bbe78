"""Config front door (plans/spec_config.py): JSON-compatible dicts must
build EXACTLY the TableSpec values the code DSL builds (frozen
dataclasses compare structurally), reject bad config at plan time, and
run through apply_spec identically."""

from __future__ import annotations

import json

import pytest

from simple_anonymizer_spark.functions import lens as L
from simple_anonymizer_spark.plans import TableSpec, apply_spec
from simple_anonymizer_spark.plans.on_conflict import OnConflict
from simple_anonymizer_spark.plans.spec_config import (
    spec_from_config,
    specs_from_config,
    specs_from_json,
)


def test_config_equals_dsl_simple():
    via_config = spec_from_config({
        "where": "id <= 1000",
        "columns": {
            "id": "passthrough",
            "first_name": "first_name",
            "ssn": "null",
            "plan": {"set": "basic"},
        },
    })
    via_dsl = TableSpec.select(lambda r: [
        r.id,
        r.first_name.map_string("first_name"),
        r.ssn.nulled,
        r.plan.set_to("basic"),
    ]).where("id <= 1000")
    assert via_config == via_dsl


def test_config_equals_dsl_lenses_and_options():
    via_config = spec_from_config({
        "where": ["id > 1", "id < 9"],
        "limit": 5,
        "batch_size": 100,
        "on_conflict": "update",
        "columns": {
            "payload": {"anonymizer": "redact", "lens": {"field": "secret"}},
            "phones": {"anonymizer": "phone_number",
                       "lens": {"array_field": "number"}},
        },
    })
    via_dsl = (
        TableSpec.select(lambda r: [
            r.payload.map_string("redact", L.Field("secret")),
            r.phones.map_json_array(
                lambda o: o.number.map_string("phone_number")),
        ])
        .where("id > 1").where("id < 9")
        .with_limit(5).with_batch_size(100)
        .with_on_conflict(OnConflict(action="update"))
    )
    assert via_config == via_dsl


def test_specs_from_json_document():
    doc = json.dumps({
        "users": {"columns": {"id": "passthrough", "name": "full_name"}},
        "orders": {"columns": {"total": "passthrough"}, "limit": 3},
    })
    specs = specs_from_json(doc)
    assert set(specs) == {"users", "orders"}
    assert specs["orders"].limit == 3
    assert specs["users"].column_names == ["id", "name"]


@pytest.mark.parametrize("cfg, match", [
    ({"columns": {"x": "not_an_anonymizer"}}, "unknown spec"),
    ({"columns": {"x": {"anonymizer": "nope"}}}, "unknown anonymizer"),
    ({"columns": {"x": {"set": 1, "anonymizer": "redact"}}}, "no other keys"),
    ({"columns": {"x": {"anonymizer": "redact",
                        "lens": {"bad": "y"}}}}, "unknown lens"),
    ({"columns": {}}, "non-empty"),
    ({"columns": {"x": "redact"}, "typo_key": 1}, "unknown table-spec"),
    ({"columns": {"x": "redact"}, "on_conflict": "merge"}, "on_conflict"),
])
def test_bad_config_fails_at_plan_time(cfg, match):
    with pytest.raises(ValueError, match=match):
        spec_from_config(cfg)


def test_config_spec_runs_identically(spark):
    df = spark.createDataFrame(
        [(1, "alice", "s1"), (2, "bob", None), (3, None, "s3")],
        "id int, name string, ssn string",
    )
    cfg_spec = spec_from_config({
        "where": "id >= 2",
        "columns": {"id": "passthrough", "name": "redact", "ssn": "null"},
    })
    dsl_spec = TableSpec.select(
        lambda r: [r.id, r.name.map_string("redact"), r.ssn.nulled]
    ).where("id >= 2")
    got_cfg = sorted(map(tuple, apply_spec(df, cfg_spec).collect()))
    got_dsl = sorted(map(tuple, apply_spec(df, dsl_spec).collect()))
    assert got_cfg == got_dsl == [(2, "***", None), (3, None, None)]


def test_specs_from_config_feeds_copier_shapes():
    specs = specs_from_config({
        "users": {"columns": {"id": "passthrough", "email": "email"}},
    })
    missing = specs["users"].validate_covers(["id", "email", "created_at"])
    assert missing == ["created_at"]
