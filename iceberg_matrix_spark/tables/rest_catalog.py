"""REST catalog: spec-shaped HTTP server + client over IceLite tables.

The reference's CI-default catalog is a REST service (Lakekeeper —
/root/reference/tests/iceberg_feature_tests.py:353-367); that service
can't run here, but the PROTOCOL is the Apache Iceberg REST Catalog
OpenAPI spec, which is public and implementable. This module provides:

- :class:`RestCatalogServer` — an in-process ``ThreadingHTTPServer``
  (stdlib only, binds 127.0.0.1) implementing the spec's catalog-CRUD
  surface over a :class:`SqlCatalog` backend:

    GET  /v1/config
    GET  /v1/namespaces                         (list)
    POST /v1/namespaces                         (create)
    GET/DELETE /v1/namespaces/{ns}              (properties / drop)
    GET  /v1/namespaces/{ns}/tables             (list)
    POST /v1/namespaces/{ns}/tables             (create)
    GET/DELETE /v1/namespaces/{ns}/tables/{tbl} (load / drop?purgeRequested)
    POST /v1/namespaces/{ns}/register           (register existing table)
    POST /v1/tables/rename

  Load responses carry ``metadata-location`` + the metadata JSON, like
  the spec's LoadTableResult. Out of scope, honestly: auth (OAuth2
  endpoints), S3 signing, and multipart namespaces — the sandbox has no
  services to integrate them against.

- :class:`RestCatalog` — the client, speaking the same protocol through
  stdlib ``urllib`` and returning :class:`IceLiteTable` handles resolved
  from the served ``metadata-location``.

Because server and client share only HTTP+JSON (no Python objects), the
conformance probe exercises a real network catalog round-trip.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import quote, unquote, urlparse

from pyspark.sql import SparkSession

from iceberg_matrix_spark.tables.catalog import (
    NoSuchTableError,
    TableAlreadyExistsError,
)
from iceberg_matrix_spark.tables.metadata import _version_path, current_version
from iceberg_matrix_spark.tables.sql_catalog import SqlCatalog
from iceberg_matrix_spark.tables.table import IceLiteTable


def _meta_loc_of(t: IceLiteTable) -> str:
    """The table handle's CURRENT metadata-file path, derived from the
    handle itself. Load-bearing for rename/drop races (found by the
    catalog soak): response builders used to RE-QUERY the catalog by
    identifier after the action — a rename landing in that window 404'd
    a load/create that had already SUCCEEDED, and a mid-creation row
    served ``metadata-location: null`` that crashed the client. The
    handle's own location can't be yanked by a concurrent rename."""
    v = current_version(t.location)
    if not v:
        raise NoSuchTableError(f"{t.location!r} has no committed metadata yet")
    return _version_path(t.location, v)

# ------------------------------------------------------------------- server


class _Handler(BaseHTTPRequestHandler):
    catalog: SqlCatalog  # class attribute injected by RestCatalogServer

    # -- plumbing

    def log_message(self, *args) -> None:  # quiet
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, typ: str, msg: str) -> None:
        # spec shape: ErrorModel under "error"
        self._json(code, {"error": {"message": msg, "type": typ, "code": code}})

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n).decode()) if n else {}

    def _route(self) -> tuple[str, list[str], dict]:
        parsed = urlparse(self.path)
        parts = [unquote(p) for p in parsed.path.split("/") if p]
        query = dict(
            kv.split("=", 1) if "=" in kv else (kv, "")
            for kv in parsed.query.split("&")
            if kv
        )
        return parsed.path, parts, query

    # -- methods

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        _, parts, _ = self._route()
        try:
            if parts == ["v1", "config"]:
                self._json(200, {"defaults": {}, "overrides": {
                    "warehouse": self.catalog.warehouse}})
            elif parts == ["v1", "namespaces"]:
                self._json(200, {"namespaces": [[n] for n in self.catalog.list_namespaces()]})
            elif len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                props = self.catalog.namespace_properties(parts[2])
                self._json(200, {"namespace": [parts[2]], "properties": props})
            elif len(parts) == 4 and parts[3] == "tables":
                names = self.catalog.list_tables(parts[2])
                self._json(200, {"identifiers": [
                    {"namespace": [parts[2]], "name": n} for n in names]})
            elif len(parts) == 5 and parts[3] == "tables":
                t = self.catalog.load_table(f"{parts[2]}.{parts[4]}")
                self._json(200, {
                    "metadata-location": _meta_loc_of(t),
                    "metadata": json.loads(t.meta.to_json()),
                    "config": {},
                })
            else:
                self._error(404, "NotFoundException", self.path)
        except NoSuchTableError as e:
            self._error(404, "NoSuchTableException", str(e))
        except ValueError as e:
            self._error(404, "NoSuchNamespaceException", str(e))

    def do_POST(self) -> None:  # noqa: N802
        _, parts, _ = self._route()
        body = self._body()
        try:
            if parts == ["v1", "namespaces"]:
                ns = body["namespace"][0]
                self.catalog.create_namespace(ns, body.get("properties") or {})
                self._json(200, {"namespace": [ns], "properties": body.get("properties") or {}})
            elif len(parts) == 4 and parts[3] == "tables":
                ident = f"{parts[2]}.{body['name']}"
                t = self.catalog.create_table(
                    ident,
                    body["schema-ddl"],
                    body.get("partition-spec") or None,
                    body.get("properties") or None,
                )
                self._json(200, {
                    "metadata-location": _meta_loc_of(t),
                    "metadata": json.loads(t.meta.to_json()),
                })
            elif len(parts) == 4 and parts[3] == "register":
                ident = f"{parts[2]}.{body['name']}"
                # spec: metadata-location of an existing table
                loc = body["metadata-location"]
                table_dir = loc.rsplit("/metadata/", 1)[0]
                t = self.catalog.register_table(ident, table_dir)
                self._json(200, {
                    "metadata-location": _meta_loc_of(t),
                    "metadata": json.loads(t.meta.to_json()),
                })
            elif parts == ["v1", "tables", "rename"]:
                src = body["source"]
                dst = body["destination"]
                self.catalog.rename_table(
                    f"{src['namespace'][0]}.{src['name']}",
                    f"{dst['namespace'][0]}.{dst['name']}",
                )
                self._json(200, {})
            else:
                self._error(404, "NotFoundException", self.path)
        except TableAlreadyExistsError as e:
            self._error(409, "AlreadyExistsException", str(e))
        except NoSuchTableError as e:
            self._error(404, "NoSuchTableException", str(e))
        except ValueError as e:
            self._error(400, "BadRequestException", str(e))

    def do_DELETE(self) -> None:  # noqa: N802
        _, parts, query = self._route()
        try:
            if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                self.catalog.drop_namespace(parts[2])
                self._json(204, {})
            elif len(parts) == 5 and parts[3] == "tables":
                purge = query.get("purgeRequested", "false").lower() == "true"
                self.catalog.drop_table(f"{parts[2]}.{parts[4]}", purge=purge)
                self._json(204, {})
            else:
                self._error(404, "NotFoundException", self.path)
        except NoSuchTableError as e:
            self._error(404, "NoSuchTableException", str(e))
        except ValueError as e:
            self._error(400, "BadRequestException", str(e))


class RestCatalogServer:
    """In-process REST catalog service bound to 127.0.0.1:<ephemeral>."""

    def __init__(self, spark: SparkSession, warehouse: str):
        backend = SqlCatalog(spark, warehouse)
        handler = type("BoundHandler", (_Handler,), {"catalog": backend})
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.uri = f"http://127.0.0.1:{self._httpd.server_address[1]}"
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "RestCatalogServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# ------------------------------------------------------------------- client



def _seg(name: str) -> str:
    """Percent-encode one URL path segment — a table named "my table"
    would otherwise split the HTTP request line (and '#'/'?' would
    truncate the path to the wrong resource)."""
    return quote(str(name), safe="")


class RestCatalogError(Exception):
    pass


class RestCatalog:
    """HTTP client for the REST catalog protocol (stdlib urllib)."""

    def __init__(self, spark: SparkSession, uri: str):
        self.spark = spark
        self.uri = uri.rstrip("/")
        self.config = self._request("GET", "/v1/config")

    def _request(self, method: str, path: str, body: dict | None = None) -> dict:
        req = urllib.request.Request(
            self.uri + path,
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                raw = resp.read()
        except urllib.error.HTTPError as exc:
            try:
                err = json.loads(exc.read().decode())["error"]
            except Exception:  # noqa: BLE001 - non-JSON error body
                raise RestCatalogError(f"{method} {path}: HTTP {exc.code}") from exc
            typ = err.get("type", "")
            if typ == "NoSuchTableException":
                raise NoSuchTableError(err["message"]) from exc
            if typ == "AlreadyExistsException":
                raise TableAlreadyExistsError(err["message"]) from exc
            raise RestCatalogError(f"{typ}: {err.get('message')}") from exc
        return json.loads(raw.decode()) if raw else {}

    @staticmethod
    def _split(identifier: str) -> tuple[str, str]:
        ns, _, tbl = identifier.rpartition(".")
        if not ns:
            raise ValueError(f"identifier must be namespace.table: {identifier}")
        return ns, tbl

    # namespace surface

    def create_namespace(self, name: str, properties: dict | None = None) -> None:
        self._request(
            "POST", "/v1/namespaces",
            {"namespace": [name], "properties": properties or {}},
        )

    def drop_namespace(self, name: str) -> None:
        self._request("DELETE", f"/v1/namespaces/{_seg(name)}")

    def list_namespaces(self) -> list[str]:
        out = self._request("GET", "/v1/namespaces")
        return [ns[0] for ns in out["namespaces"]]

    def namespace_properties(self, name: str) -> dict:
        return self._request("GET", f"/v1/namespaces/{_seg(name)}")["properties"]

    def list_tables(self, namespace: str) -> list[str]:
        out = self._request("GET", f"/v1/namespaces/{_seg(namespace)}/tables")
        return [ident["name"] for ident in out["identifiers"]]

    # table surface

    def create_table(
        self,
        identifier: str,
        schema_ddl: str,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
        defaults: dict | None = None,
    ) -> IceLiteTable:
        if defaults:
            # the REST create body has no defaults field yet — refuse
            # rather than silently dropping a declared DEFAULT
            raise ValueError(
                "column DEFAULTs are not supported through the REST catalog"
            )
        ns, tbl = self._split(identifier)
        out = self._request(
            "POST",
            f"/v1/namespaces/{_seg(ns)}/tables",
            {
                "name": tbl,
                "schema-ddl": schema_ddl,
                "partition-spec": partition_by or [],
                "properties": properties or {},
            },
        )
        return self._table_from_load(out)

    def register_table(self, identifier: str, metadata_location: str) -> IceLiteTable:
        ns, tbl = self._split(identifier)
        out = self._request(
            "POST",
            f"/v1/namespaces/{_seg(ns)}/register",
            {"name": tbl, "metadata-location": metadata_location},
        )
        return self._table_from_load(out)

    def load_table(self, identifier: str) -> IceLiteTable:
        ns, tbl = self._split(identifier)
        out = self._request("GET", f"/v1/namespaces/{_seg(ns)}/tables/{_seg(tbl)}")
        return self._table_from_load(out)

    def metadata_location(self, identifier: str) -> str:
        ns, tbl = self._split(identifier)
        out = self._request("GET", f"/v1/namespaces/{_seg(ns)}/tables/{_seg(tbl)}")
        return out["metadata-location"]

    def table_exists(self, identifier: str) -> bool:
        try:
            self.load_table(identifier)
            return True
        except NoSuchTableError:
            return False

    def rename_table(self, identifier: str, new_identifier: str) -> None:
        ns, tbl = self._split(identifier)
        new_ns, new_tbl = self._split(new_identifier)
        self._request(
            "POST",
            "/v1/tables/rename",
            {
                "source": {"namespace": [ns], "name": tbl},
                "destination": {"namespace": [new_ns], "name": new_tbl},
            },
        )

    def drop_table(self, identifier: str, purge: bool = False) -> None:
        ns, tbl = self._split(identifier)
        self._request(
            "DELETE",
            f"/v1/namespaces/{_seg(ns)}/tables/{_seg(tbl)}?purgeRequested={'true' if purge else 'false'}",
        )

    def _table_from_load(self, out: dict) -> IceLiteTable:
        loc = out.get("metadata-location")
        if not loc:
            # a server that builds its response non-atomically can serve
            # null mid-creation — typed not-there-yet, never AttributeError
            raise NoSuchTableError("load response carried no metadata-location")
        table_dir = loc.rsplit("/metadata/", 1)[0]
        try:
            return IceLiteTable(self.spark, table_dir)
        except FileNotFoundError as exc:
            # same mid-creation window as DbApiCatalog.load_table: the
            # server can serve a claimed row whose initial metadata is
            # not on disk yet — typed not-there-yet, never a raw IO error
            raise NoSuchTableError(
                f"served location {table_dir!r} has no metadata yet"
            ) from exc
