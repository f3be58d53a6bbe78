"""REST-catalog-shaped metadata API over the Hadoop-layout Iceberg tier.

The Apache Iceberg REST Catalog OpenAPI (public spec,
``rest-catalog-open-api.yaml``) defines the payload shapes every
catalog-speaking engine consumes: ``CatalogConfig``,
``ListNamespacesResponse``, ``ListTablesResponse`` (identifiers as
``{"namespace": [...], "name": ...}``), ``LoadTableResult``
(``metadata-location`` + the full table metadata + ``config``), and the
rename/drop/exists routes. This module is that surface as an IN-PROCESS
class over a warehouse directory — no server, no network (environment
bound) — so anything scripted against the REST shapes can run here
verbatim, and a real HTTP frontend would be a ~20-line flask shim
mapping routes to these methods.

Layout: ``warehouse/<namespace>/<table>/metadata/vN.metadata.json`` —
one directory level per namespace ("multipart namespaces" collapse with
the spec's ``%1F`` unit separator), tables are the normal directories
of ``sources/iceberg.py`` (version-hint + O_EXCL commit files), so
every table this catalog serves is also readable by ``read_iceberg``
directly and vice versa.

Deviations, documented: ``create_table`` takes a DataFrame (the schema
source of truth in this tier) instead of a wire-JSON Iceberg schema,
and the table-commit route is not re-implemented — data commits go
through the snapshot-committing writers (``append_iceberg`` et al.),
whose metadata.json O_EXCL create IS the commit protocol the REST
route's requirements model.

Reference parity note: the reference system (public repo
io-github-nafg/simple-anonymizer) has no catalog concept — its runtime
surface is plain JDBC; this tier exceeds reference scope as part of the
lakehouse extension family.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .iceberg import (
    IcebergError,
    _commit_metadata,
    _load_metadata,
    _meta_dir,
    _next_version,
    create_iceberg,
    create_iceberg_staged,
    read_iceberg,
)

#: The spec's multipart-namespace separator (0x1F "unit separator").
_NS_SEP = "\x1f"

_NS_PROPS = ".namespace-properties.json"


def _ns_dir(warehouse: str, namespace: list[str] | tuple[str, ...]) -> str:
    for part in namespace:
        if not part or "/" in part or part.startswith("."):
            raise IcebergError(f"invalid namespace part {part!r}")
    return os.path.join(warehouse, *namespace)


class RestShapedCatalog:
    """The Iceberg REST catalog's routes as methods; every return value
    is the spec's response body shape (plain dicts, JSON-serializable
    verbatim). Missing namespaces/tables raise ``IcebergError`` — the
    in-process stand-in for the spec's 404 ``ErrorModel``."""

    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    # -- GET /v1/config -----------------------------------------------------
    def config(self) -> dict:
        return {"defaults": {},
                "overrides": {"warehouse": self.warehouse}}

    # -- namespaces -----------------------------------------------------------
    def create_namespace(self, namespace: list[str],
                         properties: dict | None = None) -> dict:
        d = _ns_dir(self.warehouse, namespace)
        if os.path.isdir(d):
            raise IcebergError(
                f"namespace already exists: {_NS_SEP.join(namespace)}")
        os.makedirs(d)
        props = dict(properties or {})
        with open(os.path.join(d, _NS_PROPS), "w") as fh:
            json.dump(props, fh, sort_keys=True)
        return {"namespace": list(namespace), "properties": props}

    def namespace_exists(self, namespace: list[str]) -> bool:
        return os.path.isdir(_ns_dir(self.warehouse, namespace))

    def list_namespaces(self, parent: list[str] | None = None) -> dict:
        base = _ns_dir(self.warehouse, parent or [])
        if not os.path.isdir(base):
            raise IcebergError(f"no such namespace: {parent}")
        out = []
        for name in sorted(os.listdir(base)):
            d = os.path.join(base, name)
            # a namespace is a dir WITH a properties marker; a table is
            # a dir with a metadata/ tree
            if os.path.isfile(os.path.join(d, _NS_PROPS)):
                out.append(list(parent or []) + [name])
        return {"namespaces": out}

    def load_namespace_metadata(self, namespace: list[str]) -> dict:
        d = _ns_dir(self.warehouse, namespace)
        try:
            with open(os.path.join(d, _NS_PROPS)) as fh:
                props = json.load(fh)
        except OSError as exc:
            raise IcebergError(
                f"no such namespace: {_NS_SEP.join(namespace)}") from exc
        return {"namespace": list(namespace), "properties": props}

    def update_namespace_properties(
            self, namespace: list[str], removals: list[str] | None = None,
            updates: dict | None = None) -> dict:
        props = self.load_namespace_metadata(namespace)["properties"]
        removed = [k for k in (removals or []) if k in props]
        for k in removed:
            del props[k]
        props.update(updates or {})
        d = _ns_dir(self.warehouse, namespace)
        with open(os.path.join(d, _NS_PROPS), "w") as fh:
            json.dump(props, fh, sort_keys=True)
        return {"removed": removed,
                "updated": sorted((updates or {}).keys()),
                "missing": [k for k in (removals or [])
                            if k not in removed]}

    def drop_namespace(self, namespace: list[str]) -> None:
        if self.list_tables(namespace)["identifiers"]:
            raise IcebergError(
                "namespace is not empty (the spec's 409): drop its "
                "tables first")
        if self.list_namespaces(namespace)["namespaces"]:
            raise IcebergError("namespace has child namespaces")
        shutil.rmtree(_ns_dir(self.warehouse, namespace))

    # -- tables ---------------------------------------------------------------
    def _table_dir(self, namespace: list[str], name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise IcebergError(f"invalid table name {name!r}")
        return os.path.join(_ns_dir(self.warehouse, namespace), name)

    def list_tables(self, namespace: list[str]) -> dict:
        base = _ns_dir(self.warehouse, namespace)
        if not os.path.isdir(base):
            raise IcebergError(f"no such namespace: {namespace}")
        idents = [
            {"namespace": list(namespace), "name": name}
            for name in sorted(os.listdir(base))
            if os.path.isdir(os.path.join(base, name, "metadata"))
        ]
        return {"identifiers": idents}

    def table_exists(self, namespace: list[str], name: str) -> bool:
        return os.path.isdir(
            os.path.join(self._table_dir(namespace, name), "metadata"))

    def create_table(self, namespace: list[str], name: str,
                     df: DataFrame, partition_by=None,
                     format_version: int = 1) -> dict:
        if not self.namespace_exists(namespace):
            raise IcebergError(f"no such namespace: {namespace}")
        tdir = self._table_dir(namespace, name)
        if self.table_exists(namespace, name):
            raise IcebergError(
                f"table already exists: {'.'.join(namespace)}.{name}")
        create_iceberg(df, tdir, partition_by=partition_by,
                       format_version=format_version)
        return self.load_table(namespace, name)

    def create_table_staged(self, namespace: list[str], name: str,
                            schema_struct: dict, partition_by=None,
                            format_version: int = 1) -> dict:
        """The REST create-table route's true semantics: a metadata-only
        commit from the WIRE schema shape (``{"type": "struct",
        "fields": [{id, name, required, type}, ...]}``) with no
        snapshot — data arrives later through the snapshot-committing
        writers; until then the table reads as empty. This is the route
        the HTTP frontend serves (``icecatalog_http``)."""
        if not self.namespace_exists(namespace):
            raise IcebergError(f"no such namespace: {namespace}")
        tdir = self._table_dir(namespace, name)
        if self.table_exists(namespace, name):
            raise IcebergError(
                f"table already exists: {'.'.join(namespace)}.{name}")
        create_iceberg_staged(tdir, schema_struct,
                              partition_by=partition_by,
                              format_version=format_version)
        return self.load_table(namespace, name)

    def load_table(self, namespace: list[str], name: str) -> dict:
        tdir = self._table_dir(namespace, name)
        if not self.table_exists(namespace, name):
            raise IcebergError(
                f"no such table: {'.'.join(namespace)}.{name}")
        md = _meta_dir(tdir)
        with open(os.path.join(md, "version-hint.text")) as fh:
            version = int(fh.read().strip())
        return {
            "metadata-location": os.path.join(
                md, f"v{version}.metadata.json"),
            "metadata": _load_metadata(tdir),
            "config": {},
        }

    def rename_table(self, source: dict, destination: dict) -> None:
        """``POST /v1/tables/rename`` — identifiers are the spec's
        ``{"namespace": [...], "name": ...}`` shape."""
        src = self._table_dir(source["namespace"], source["name"])
        dst = self._table_dir(destination["namespace"],
                              destination["name"])
        if not self.table_exists(source["namespace"], source["name"]):
            raise IcebergError(f"no such table: {source}")
        if not self.namespace_exists(destination["namespace"]):
            raise IcebergError(
                f"no such namespace: {destination['namespace']}")
        if os.path.exists(dst):
            raise IcebergError(f"table already exists: {destination}")
        os.rename(src, dst)
        # the moved tree's metadata still records the OLD location —
        # commit a metadata-only version with the new one (metadata
        # files are immutable versions, so this is an update, not an
        # edit; all tier paths are table-relative, nothing else moves)
        meta = dict(_load_metadata(dst))
        meta["location"] = os.path.abspath(dst)
        _commit_metadata(dst, meta, _next_version(dst))

    def drop_table(self, namespace: list[str], name: str,
                   purge: bool = False) -> None:
        tdir = self._table_dir(namespace, name)
        if not self.table_exists(namespace, name):
            raise IcebergError(
                f"no such table: {'.'.join(namespace)}.{name}")
        if purge:
            shutil.rmtree(tdir)
        else:
            # drop from the catalog, keep the data: the metadata tree is
            # what makes a directory a table
            shutil.rmtree(_meta_dir(tdir))

    # -- reads ----------------------------------------------------------------
    def read(self, spark: SparkSession, namespace: list[str], name: str,
             **kwargs) -> DataFrame:
        """Convenience: ``read_iceberg`` through the catalog's
        metadata-location resolution (time travel / pruning kwargs pass
        through)."""
        tdir = self._table_dir(namespace, name)
        if not self.table_exists(namespace, name):
            raise IcebergError(
                f"no such table: {'.'.join(namespace)}.{name}")
        return read_iceberg(spark, tdir, **kwargs)
