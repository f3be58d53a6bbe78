"""HTTP frontend for ``RestShapedCatalog`` — the Iceberg REST Catalog
OpenAPI routes served over a real socket (stdlib ``http.server``,
loopback). Round-11's catalog was REST-*shaped* (spec response bodies as
in-process methods); this serves those same methods so any HTTP client
can create/load/list/rename/drop namespaces and tables against the
native tier, with the spec's ``ErrorModel`` JSON on failures.

Routes (Iceberg REST Catalog OpenAPI, ``rest-catalog-open-api.yaml``;
``{ns}`` is the multipart namespace joined by the spec's ``%1F`` unit
separator):

    GET    /v1/config
    GET    /v1/namespaces[?parent={ns}]     POST /v1/namespaces
    GET    /v1/namespaces/{ns}              HEAD /v1/namespaces/{ns}
    DELETE /v1/namespaces/{ns}
    POST   /v1/namespaces/{ns}/properties
    GET    /v1/namespaces/{ns}/tables       POST /v1/namespaces/{ns}/tables
    GET    /v1/namespaces/{ns}/tables/{t}   HEAD /v1/namespaces/{ns}/tables/{t}
    DELETE /v1/namespaces/{ns}/tables/{t}[?purgeRequested=true]
    POST   /v1/tables/rename

The create-table route takes the spec's wire schema
(``{"schema": {"type": "struct", "fields": [...]}}``) and performs a
METADATA-ONLY staged create (no snapshot — real REST creates work this
way); data commits stay with the snapshot-committing writers against
the warehouse paths, exactly as documented on ``RestShapedCatalog``.
An optional ``"partition-by"`` key carries this tier's partition-spec
form (names or ``[column, transform]`` pairs).

Serving model: ``ThreadingHTTPServer`` on an ephemeral loopback port in
a daemon thread — the test/embedding process owns the lifecycle
(``start()``/``stop()``). Filesystem atomicity (metadata.json O_EXCL)
remains the commit protocol, so concurrent requests are as safe as the
underlying tier.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .iceberg import IcebergError
from .icecatalog import _NS_SEP, RestShapedCatalog


def _error_body(exc: Exception, code: int) -> dict:
    """The spec's ``ErrorModel`` envelope."""
    kinds = {404: "NoSuchResourceException",
             409: "AlreadyExistsException",
             400: "BadRequestException"}
    return {"error": {"message": str(exc), "type": kinds.get(code, "Error"),
                      "code": code}}


def _status_of(exc: IcebergError) -> int:
    msg = str(exc)
    if "already exists" in msg or "not empty" in msg or "child" in msg:
        return 409
    if "no such" in msg or "unknown" in msg:
        return 404
    return 400


def _split_ns(raw: str) -> list[str]:
    return urllib.parse.unquote(raw).split(_NS_SEP)


class _Handler(BaseHTTPRequestHandler):
    catalog: RestShapedCatalog  # bound by serve()

    # -- plumbing -------------------------------------------------------------
    def log_message(self, *a):  # no stderr noise under pytest
        pass

    def _send(self, code: int, body: dict | None = None) -> None:
        payload = b"" if body is None else json.dumps(
            body, sort_keys=True).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(payload)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        return json.loads(self.rfile.read(n).decode("utf-8"))

    def _route(self):
        """-> (segments, query dict) of the request path under /v1/."""
        parsed = urllib.parse.urlsplit(self.path)
        parts = [p for p in parsed.path.split("/") if p]
        if not parts or parts[0] != "v1":
            raise IcebergError(f"no such route: {parsed.path}")
        return parts[1:], dict(urllib.parse.parse_qsl(parsed.query))

    def _dispatch(self) -> None:
        try:
            seg, q = self._route()
            handler = self._resolve(seg, q)
            if handler is None:
                self._send(404, _error_body(
                    IcebergError(f"no such route: {self.path}"), 404))
                return
            code, body = handler()
            self._send(code, body)
        except IcebergError as exc:
            code = _status_of(exc)
            self._send(code, _error_body(exc, code))
        except (ValueError, KeyError, TypeError) as exc:
            self._send(400, _error_body(exc, 400))

    do_GET = do_POST = do_DELETE = do_HEAD = _dispatch

    # -- routing --------------------------------------------------------------
    def _resolve(self, seg: list[str], q: dict):
        cat, m = self.catalog, self.command

        if seg == ["config"] and m == "GET":
            return lambda: (200, cat.config())

        if seg == ["namespaces"]:
            if m == "GET":
                parent = _split_ns(q["parent"]) if "parent" in q else None
                return lambda: (200, cat.list_namespaces(parent))
            if m == "POST":
                b = self._body()
                return lambda: (200, cat.create_namespace(
                    b["namespace"], b.get("properties")))

        if len(seg) == 2 and seg[0] == "namespaces":
            ns = _split_ns(seg[1])
            if m == "GET":
                return lambda: (200, cat.load_namespace_metadata(ns))
            if m == "HEAD":
                return lambda: ((204, None) if cat.namespace_exists(ns)
                                else (404, None))
            if m == "DELETE":
                return lambda: (cat.drop_namespace(ns), (204, None))[1]

        if (len(seg) == 3 and seg[0] == "namespaces"
                and seg[2] == "properties" and m == "POST"):
            ns = _split_ns(seg[1])
            b = self._body()
            return lambda: (200, cat.update_namespace_properties(
                ns, b.get("removals"), b.get("updates")))

        if len(seg) == 3 and seg[0] == "namespaces" and seg[2] == "tables":
            ns = _split_ns(seg[1])
            if m == "GET":
                return lambda: (200, cat.list_tables(ns))
            if m == "POST":
                b = self._body()
                pby = [tuple(e) if isinstance(e, list) else e
                       for e in b.get("partition-by") or []] or None
                return lambda: (200, cat.create_table_staged(
                    ns, b["name"], b["schema"], partition_by=pby,
                    format_version=int(b.get("format-version", 1))))

        if len(seg) == 4 and seg[0] == "namespaces" and seg[2] == "tables":
            ns, name = _split_ns(seg[1]), urllib.parse.unquote(seg[3])
            if m == "GET":
                return lambda: (200, cat.load_table(ns, name))
            if m == "HEAD":
                return lambda: ((204, None) if cat.table_exists(ns, name)
                                else (404, None))
            if m == "DELETE":
                purge = q.get("purgeRequested", "").lower() == "true"
                return lambda: (cat.drop_table(ns, name, purge=purge),
                                (204, None))[1]

        if seg == ["tables", "rename"] and m == "POST":
            b = self._body()
            return lambda: (cat.rename_table(b["source"],
                                             b["destination"]),
                            (204, None))[1]

        return None


class CatalogHTTPServer:
    """Own the served catalog's lifecycle: ``start()`` binds an
    ephemeral loopback port and serves in a daemon thread, ``stop()``
    shuts the socket down. Usable as a context manager."""

    def __init__(self, warehouse: str, host: str = "127.0.0.1",
                 port: int = 0):
        self.catalog = RestShapedCatalog(warehouse)
        self._host, self._port = host, port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        if self._server is None:
            raise RuntimeError("server not started")
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> str:
        handler = type("BoundHandler", (_Handler,),
                       {"catalog": self.catalog})
        self._server = ThreadingHTTPServer((self._host, self._port),
                                           handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.url

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def __enter__(self) -> "CatalogHTTPServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
