"""The REST catalog served over HTTP (sources/icecatalog_http.py):
spec routes driven through a REAL client (urllib over a loopback
socket) against the native Iceberg tier — create/load/list/rename/drop
for namespaces and tables, spec ErrorModel JSON on failures, and data
written through the native writers visible through catalog loads."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from simple_anonymizer_spark.sources import iceberg as I
from simple_anonymizer_spark.sources.icecatalog_http import (
    CatalogHTTPServer,
)

SCHEMA = {"type": "struct", "fields": [
    {"id": 1, "name": "doc_id", "required": False, "type": "long"},
    {"id": 2, "name": "text", "required": False, "type": "string"},
    {"id": 3, "name": "price", "required": False,
     "type": "decimal(12,2)"},
]}


@pytest.fixture()
def served(tmp_path):
    with CatalogHTTPServer(str(tmp_path / "wh")) as srv:
        yield srv


def _call(method, url, body=None):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        return resp.status, (json.loads(raw) if raw else None)


def _expect_error(method, url, body=None):
    try:
        _call(method, url, body)
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, (json.loads(raw) if raw else None)
    raise AssertionError(f"{method} {url} unexpectedly succeeded")


def test_config_and_namespace_lifecycle(served):
    u = served.url
    st, cfg = _call("GET", f"{u}/v1/config")
    assert st == 200 and "overrides" in cfg

    st, body = _call("POST", f"{u}/v1/namespaces",
                     {"namespace": ["prod"], "properties": {"owner": "a"}})
    assert st == 200 and body["namespace"] == ["prod"]
    st, got = _call("GET", f"{u}/v1/namespaces/prod")
    assert st == 200 and got["properties"] == {"owner": "a"}
    st, _ = _call("HEAD", f"{u}/v1/namespaces/prod")
    assert st == 204
    st, listed = _call("GET", f"{u}/v1/namespaces")
    assert ["prod"] in listed["namespaces"]

    st, upd = _call("POST", f"{u}/v1/namespaces/prod/properties",
                    {"updates": {"tier": "gold"}, "removals": ["owner"]})
    assert st == 200 and upd["removed"] == ["owner"]
    _, got = _call("GET", f"{u}/v1/namespaces/prod")
    assert got["properties"] == {"tier": "gold"}

    st, _ = _call("DELETE", f"{u}/v1/namespaces/prod")
    assert st == 204
    code, err = _expect_error("GET", f"{u}/v1/namespaces/prod")
    assert code == 404 and err["error"]["code"] == 404


def test_table_create_load_rename_drop_over_http(served, spark):
    u = served.url
    _call("POST", f"{u}/v1/namespaces", {"namespace": ["prod"]})

    # staged create from the wire schema: metadata-only, no snapshot
    st, created = _call(
        "POST", f"{u}/v1/namespaces/prod/tables",
        {"name": "docs", "schema": SCHEMA,
         "partition-by": [["price", "bucket[4]"]]})
    assert st == 200
    assert created["metadata"]["snapshots"] == []
    specs = created["metadata"]["partition-specs"]
    assert specs[0]["fields"][0]["transform"] == "bucket[4]"

    # the staged table reads as empty through the native tier
    tdir = created["metadata"]["location"]
    assert I.iceberg_count(tdir) == 0
    assert I.read_iceberg(spark, tdir).count() == 0

    # data arrives through the native snapshot-committing writer and is
    # visible through the catalog's HTTP load
    import decimal

    rows = [(i, f"t-{i}", decimal.Decimal(i).scaleb(-2))
            for i in range(40)]
    I.append_iceberg(
        spark.createDataFrame(
            rows, "doc_id long, text string, price decimal(12,2)"),
        tdir)
    st, loaded = _call("GET", f"{u}/v1/namespaces/prod/tables/docs")
    assert st == 200 and len(loaded["metadata"]["snapshots"]) == 1
    assert I.iceberg_count(tdir) == 40

    st, listed = _call("GET", f"{u}/v1/namespaces/prod/tables")
    assert listed["identifiers"] == [
        {"namespace": ["prod"], "name": "docs"}]
    st, _ = _call("HEAD", f"{u}/v1/namespaces/prod/tables/docs")
    assert st == 204

    # rename, then the old identifier 404s and the new one reads
    st, _ = _call("POST", f"{u}/v1/tables/rename",
                  {"source": {"namespace": ["prod"], "name": "docs"},
                   "destination": {"namespace": ["prod"],
                                   "name": "corpus"}})
    assert st == 204
    code, _ = _expect_error("GET", f"{u}/v1/namespaces/prod/tables/docs")
    assert code == 404
    st, moved = _call("GET", f"{u}/v1/namespaces/prod/tables/corpus")
    assert st == 200
    assert I.read_iceberg(spark, moved["metadata"]["location"]
                          ).count() == 40

    st, _ = _call("DELETE",
                  f"{u}/v1/namespaces/prod/tables/corpus"
                  "?purgeRequested=true")
    assert st == 204
    code, _ = _expect_error("HEAD", f"{u}/v1/namespaces/prod/tables/corpus")
    assert code == 404


def test_error_model_shapes(served):
    u = served.url
    _call("POST", f"{u}/v1/namespaces", {"namespace": ["a"]})
    code, err = _expect_error("POST", f"{u}/v1/namespaces",
                              {"namespace": ["a"]})
    assert code == 409 and err["error"]["type"] == "AlreadyExistsException"
    code, err = _expect_error("GET", f"{u}/v1/namespaces/a/tables/zzz")
    assert code == 404 and "no such table" in err["error"]["message"]
    code, err = _expect_error("GET", f"{u}/v1/nope")
    assert code == 404
    # a table blocks its namespace's drop with the spec's 409
    _call("POST", f"{u}/v1/namespaces/a/tables",
          {"name": "t", "schema": SCHEMA})
    code, err = _expect_error("DELETE", f"{u}/v1/namespaces/a")
    assert code == 409


def test_multipart_namespace_unit_separator(served):
    u = served.url
    _call("POST", f"{u}/v1/namespaces", {"namespace": ["a"]})
    _call("POST", f"{u}/v1/namespaces", {"namespace": ["a", "b"]})
    st, got = _call("GET", f"{u}/v1/namespaces/a%1Fb")
    assert st == 200 and got["namespace"] == ["a", "b"]
    st, listed = _call("GET", f"{u}/v1/namespaces?parent=a")
    assert listed["namespaces"] == [["a", "b"]]
