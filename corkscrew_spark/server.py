"""`corkscrew serve` — the API server facade over QueryEngine.

Parity: internal/server/api_server.go. The reference serves gRPC
(CorkscrewAPI: ExecuteQuery :127-180, HealthCheck :182-194, GetStatus
:196-245, ListProviders :56-75); grpcio isn't available in this
environment, so the same methods are exposed as JSON-over-HTTP with the
reference's envelope semantics preserved exactly:

  * engine/execution failures return HTTP 200 with an ``error`` field in
    the body (the reference returns a populated-Error response, not a
    transport error);
  * a missing query is a transport-level error (gRPC InvalidArgument →
    HTTP 400);
  * result rows are ``{"values": {col: str}}`` maps with ``""`` for NULL
    (the reference stringifies every cell the same way), plus
    columns / row_count / execution_time_ms.

Endpoints:
  POST /v1/query      {"query": sql, "params": {...}, "limit": n}
  POST /v1/estimate   {"query": sql, "params": {...}} — metadata-only
                      scan preview (the governor's dry-run half)
  GET  /v1/health
  GET  /v1/status
  GET  /v1/providers
  POST /v1/grpc/<Method>   binary protobuf CorkscrewAPI envelopes
                           (proto_wire.py codec; server_grpc.py also
                           binds the same handlers to real grpcio
                           where that package is installed)
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from corkscrew_spark.engine import QueryEngine, QueryValidationError

API_VERSION = "2.0.0"
PROVIDERS = ("aws", "azure", "gcp", "kubernetes")
#: server-side row cap so a SELECT * on a huge table cannot OOM the
#: driver — the reference's req.Limit applied post-hoc; here it bounds
#: the collect itself
MAX_ROWS = 10_000


class ApiServer:
    def __init__(self, spark: SparkSession, max_rows: int = MAX_ROWS,
                 warehouse: dict[str, str] | None = None,
                 max_scan_bytes: int | None = None):
        self.spark = spark
        # max_scan_bytes arms the engine's scan-budget governor: a
        # request whose metadata-only estimate reads past it gets the
        # standard error envelope (ScanBudgetExceeded is a
        # QueryValidationError), never a scan
        self.engine = QueryEngine(spark, max_scan_bytes=max_scan_bytes)
        # warehouse table dirs served with data skipping: the API's SQL
        # queries prune through zone maps/blooms exactly like the CLI's
        for name, path in (warehouse or {}).items():
            self.engine.register_warehouse(name, path)
        self.start_time = time.monotonic()
        self.request_count = 0
        self.error_count = 0
        self.max_rows = max_rows
        # counters only — queries themselves run CONCURRENTLY. Safe
        # because the engine's skipping path registers each statement's
        # pruned read under a unique one-statement temp view and never
        # mutates the shared warehouse views (engine._skipping_rewrite),
        # and Spark sessions accept concurrent job submission. The old
        # design serialized every query behind one lock, making the
        # HTTP thread pool pointless under load.
        self._lock = threading.Lock()

    def _bump(self, attr: str) -> None:
        with self._lock:
            setattr(self, attr, getattr(self, attr) + 1)

    # -- method handlers (transport-independent) ----------------------------

    def execute_query(self, body: dict) -> tuple[int, dict]:
        sql = body.get("query", "")
        if not sql:
            self._bump("error_count")
            return 400, {"error": "query is required"}
        limit = int(body.get("limit") or 0)
        cap = min(limit, self.max_rows) if limit > 0 else self.max_rows
        t0 = time.perf_counter()
        try:
            res = self.engine.execute(sql, body.get("params"))
            rows = res.df.limit(cap).collect()
        except QueryValidationError as ex:
            self._bump("error_count")
            return 200, {"error": f"Query execution failed: {ex}"}
        except Exception as ex:  # runtime failure after validation
            self._bump("error_count")
            return 200, {"error": f"Query execution failed: {str(ex).splitlines()[0]}"}
        duration_ms = int((time.perf_counter() - t0) * 1000)
        out_rows = [
            {"values": {c: ("" if v is None else str(v)) for c, v in zip(res.columns, row)}}
            for row in rows
        ]
        return 200, {
            "rows": out_rows,
            "columns": res.columns,
            "row_count": len(out_rows),
            "execution_time_ms": duration_ms,
        }

    def estimate_query(self, body: dict) -> tuple[int, dict]:
        """POST /v1/estimate: the metadata-only scan preview — the
        dry-run half of the admission loop over HTTP, so a scheduler
        can ask 'what would this cost' before submitting (the governor
        refuses on exactly these numbers). Zero data I/O: zone-map
        walks over recorded per-file stats only."""
        sql = body.get("query", "")
        if not sql:
            self._bump("error_count")
            return 400, {"error": "query is required"}
        try:
            est = self.engine.estimate_statement(sql, body.get("params"))
        except QueryValidationError as ex:
            self._bump("error_count")
            return 200, {"error": f"Estimate failed: {ex}"}
        # statement totals alongside the per-table rows (r10): the
        # aggregate governor refuses on the SUM, which the per-table
        # dict alone cannot express (a twice-read table counts twice)
        return 200, {"tables": est["tables"],
                     "estimable": bool(est["tables"]),
                     "statement_bytes_kept": est["bytes_kept"],
                     "statement_reads": est["reads"],
                     "max_scan_bytes": self.engine.max_scan_bytes}

    def health_check(self) -> tuple[int, dict]:
        return 200, {
            "status": "HEALTHY",
            "version": API_VERSION,
            "timestamp": time.time(),
            "details": {"uptime": f"{time.monotonic() - self.start_time:.2f} seconds"},
        }

    def get_status(self) -> tuple[int, dict]:
        return 200, {
            "overall_status": "HEALTHY",
            "timestamp": time.time(),
            "system_stats": {
                "uptime_seconds": int(time.monotonic() - self.start_time),
                "total_requests": self.request_count,
                "total_errors": self.error_count,
            },
        }

    def discover_idms(self) -> tuple[int, dict]:
        """DiscoverIDMSServices endpoint parity
        (internal/server/api_server.go:248-295): the identity-service
        catalog envelope with per-provider counts."""
        from corkscrew_spark.ingest import idms

        try:
            result = idms.discover_idms_services(self.spark)
        except Exception as ex:  # noqa: BLE001 — error envelope parity
            self._bump("error_count")
            return 500, {"success": False,
                         "error": f"IDMS discovery failed: {ex}"}
        return 200, {"success": True, **result}

    def get_schemas(self) -> tuple[int, dict]:
        """GetSchemas parity: the machine-readable core-table schemas
        (cmd/corkscrew/main.go:700-713 --output json path)."""
        from corkscrew_spark.schema import schemas_json

        return 200, {"schemas": schemas_json()}

    def discover_schema(self, resource_type: str) -> tuple[int, dict]:
        """DiscoverResourceSchema parity (plugins/azure-provider/
        resource_graph.go:112-127): sample live rows of one resource
        type from the registered ``resources`` view and walk the
        property JSON into dotted-path PropertyDefs."""
        from corkscrew_spark.schema import infer_resource_schema

        if not resource_type:
            return 400, {"success": False,
                         "error": "missing ?type=<resource_type>"}
        try:
            df = self.spark.table("resources")
            result = infer_resource_schema(df, resource_type)
        except Exception as ex:  # noqa: BLE001 — error envelope parity
            self._bump("error_count")
            return 500, {"success": False,
                         "error": f"schema discovery failed: {ex}"}
        return 200, {"success": True, **result}

    def list_providers(self) -> tuple[int, dict]:
        return 200, {
            "providers": [
                {"name": p, "status": "available", "description": f"{p} provider"}
                for p in PROVIDERS
            ]
        }

    # -- HTTP transport ------------------------------------------------------

    def make_http_server(self, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code: int, payload: dict) -> None:
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                api._bump("request_count")
                if self.path == "/v1/health":
                    self._send(*api.health_check())
                elif self.path == "/v1/status":
                    self._send(*api.get_status())
                elif self.path == "/v1/providers":
                    self._send(*api.list_providers())
                elif self.path == "/v1/discover-idms":
                    self._send(*api.discover_idms())
                elif self.path == "/v1/schemas":
                    self._send(*api.get_schemas())
                elif self.path.startswith("/v1/discover-schema"):
                    from urllib.parse import parse_qs, urlparse

                    qs = parse_qs(urlparse(self.path).query)
                    self._send(*api.discover_schema(
                        (qs.get("type") or [""])[0]))
                else:
                    api._bump("error_count")
                    self._send(404, {"error": f"no such endpoint: {self.path}"})

            def do_POST(self):
                api._bump("request_count")
                if self.path.startswith("/v1/grpc/"):
                    self._grpc_binary(self.path[len("/v1/grpc/"):])
                    return
                if self.path not in ("/v1/query", "/v1/estimate"):
                    api._bump("error_count")
                    self._send(404, {"error": f"no such endpoint: {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                    body = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    api._bump("error_count")
                    self._send(400, {"error": "invalid JSON body"})
                    return
                if self.path == "/v1/estimate":
                    self._send(*api.estimate_query(body))
                    return
                self._send(*api.execute_query(body))

            def _grpc_binary(self, method: str) -> None:
                """POST /v1/grpc/<Method>: the CorkscrewAPI proto
                envelope as raw binary protobuf (proto/api.proto:8-22)
                — protoc-compatible bytes in, protoc-compatible bytes
                out, for clients scripted against the reference's
                message stubs. Content-Length frames the message (no
                gRPC length prefix needed over HTTP/1.1)."""
                from corkscrew_spark import server_grpc

                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n)
                try:
                    data = server_grpc.call_method(
                        server_grpc.GrpcMethods(api), method, body)
                except KeyError:
                    api._bump("error_count")
                    self._send(404, {"error": f"no such RPC: {method}"})
                    return
                except server_grpc.InvalidArgument as ex:
                    # handler-validated failure: execute_query already
                    # counted it — bumping again would double-count
                    self._send(400, {"error": str(ex)})
                    return
                except ValueError as ex:  # malformed protobuf bytes
                    api._bump("error_count")
                    self._send(400, {"error": f"invalid request body: {ex}"})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/x-protobuf")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        return ThreadingHTTPServer((host, port), Handler)


def serve(spark: SparkSession, host: str = "127.0.0.1", port: int = 8032,
          api: "ApiServer | None" = None) -> None:
    """Blocking serve loop (the CLI `serve` verb). ``api`` lets a caller
    that already built an ApiServer (e.g. to hang a gRPC listener off
    the same stats/engine) share it with the HTTP transport."""
    httpd = (api or ApiServer(spark)).make_http_server(host, port)
    print(f"corkscrew API listening on http://{host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()
