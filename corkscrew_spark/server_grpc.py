"""gRPC transport for the API server (CorkscrewAPI service).

Parity: internal/server/api_server.go serves protobuf gRPC
(proto/api.proto:8-22); corkscrew_spark.server.ApiServer carries the
same six method handlers transport-independently. This module binds
those handlers to real gRPC when ``grpcio`` is importable: grpcio's
``method_handlers_generic_handler`` accepts arbitrary ``bytes <->
object`` serializer callables, so the hand-written proto3 codec in
``proto_wire.py`` stands in for protoc-generated stubs — the on-wire
bytes are identical.

Where grpcio is NOT installed (this sandbox), the same binary envelopes
are served over ``POST /v1/grpc/<Method>`` by the HTTP server
(``server.make_http_server``), and ``call_method`` below executes the
full request-bytes → handler → response-bytes pipeline in-process; the
transport tests cover that path and skip only the socket-level grpcio
round-trip.

Envelope semantics match the reference exactly: engine failures return
a populated ``error`` field (never a transport error), a missing query
is INVALID_ARGUMENT, rows are stringified ``{values: {col: str}}`` maps
with "" for NULL (api_server.go:127-180).
"""

from __future__ import annotations

import time

from corkscrew_spark import proto_wire as pw


class InvalidArgument(ValueError):
    """Raised by a method handler for a request that fails validation
    AFTER the handler has accounted for it (error_count already bumped)
    — distinct from a wire-decode ValueError, which the transport must
    count itself."""


def _now_ts() -> dict:
    t = time.time()
    seconds = int(t)
    return {"seconds": seconds, "nanos": int((t - seconds) * 1e9)}


class GrpcMethods:
    """The six CorkscrewAPI RPCs as dict-in/dict-out callables over an
    ``ApiServer`` (message dicts shaped by proto_wire descriptors)."""

    def __init__(self, api) -> None:
        self.api = api

    def ExecuteQuery(self, req: dict) -> dict:
        body = {"query": req.get("query", ""),
                "params": req.get("parameters") or None,
                "limit": req.get("limit", 0)}
        code, payload = self.api.execute_query(body)
        if code == 400:
            # transport-level error: gRPC INVALID_ARGUMENT (see call site)
            raise InvalidArgument(payload.get("error", "invalid request"))
        if "error" in payload:
            return {"error": payload["error"]}
        return {
            "rows": [{"values": r["values"]} for r in payload["rows"]],
            "columns": payload["columns"],
            "row_count": payload["row_count"],
            "execution_time_ms": payload["execution_time_ms"],
        }

    def HealthCheck(self, req: dict) -> dict:
        _, payload = self.api.health_check()
        return {
            "status": pw.HEALTH_STATUS.get(payload["status"], 0),
            "version": payload["version"],
            "timestamp": _now_ts(),
            "details": payload.get("details", {}),
        }

    def GetStatus(self, req: dict) -> dict:
        _, payload = self.api.get_status()
        stats = payload.get("system_stats", {})
        return {
            "overall_status": pw.HEALTH_STATUS.get(
                payload["overall_status"], 0),
            "system_stats": {
                "uptime_seconds": stats.get("uptime_seconds", 0),
                "total_requests": stats.get("total_requests", 0),
                "total_errors": stats.get("total_errors", 0),
            },
            "timestamp": _now_ts(),
        }

    def ListProviders(self, req: dict) -> dict:
        _, payload = self.api.list_providers()
        out = []
        for p in payload["providers"]:
            info = {"name": p["name"], "description": p["description"]}
            if req.get("include_status"):
                info["status"] = {"available": p["status"] == "available",
                                  "initialized": True,
                                  "last_check": _now_ts()}
            out.append(info)
        return {"providers": out}

    def GetProviderInfo(self, req: dict) -> dict:
        name = req.get("provider", "")
        _, payload = self.api.list_providers()
        for p in payload["providers"]:
            if p["name"] == name:
                return {"provider_info": {
                    "name": p["name"], "description": p["description"],
                    "status": {"available": True, "initialized": True},
                }}
        return {"error": f"unknown provider: {name}"}

    def DiscoverIDMSServices(self, req: dict) -> dict:
        code, payload = self.api.discover_idms()
        if not payload.get("success"):
            return {"success": False,
                    "error": payload.get("error", "discovery failed")}
        services = [
            {"provider": s.get("provider", ""),
             "service_type": s.get("service_type", ""),
             "name": s.get("name", ""),
             "region": s.get("region", ""),
             "endpoint": s.get("endpoint", ""),
             "status": s.get("status", ""),
             "metadata": {k: str(v) for k, v in
                          (s.get("metadata") or {}).items()}}
            for s in payload.get("services", [])
        ]
        return {"success": True, "services": services,
                "total_found": payload.get("total_found", len(services)),
                "duration_ms": payload.get("duration_ms", 0),
                "discovered_at": _now_ts()}


def call_method(methods: GrpcMethods, name: str, request_bytes: bytes) -> bytes:
    """One full RPC in-process: decode request bytes with the method's
    descriptor, run the handler, encode the response — exactly the
    pipeline grpcio drives through its serializer hooks. Shared by the
    HTTP binary endpoint and the grpcio servicer."""
    if name not in pw.SERVICE_METHODS:
        raise KeyError(f"unknown RPC {name!r}")
    req_desc, resp_desc = pw.SERVICE_METHODS[name]
    request = pw.decode(request_bytes, req_desc)
    response = getattr(methods, name)(request)
    return pw.encode(response, resp_desc)


def make_grpc_server(api, host: str = "127.0.0.1", port: int = 0):
    """Real grpcio server bound to the CorkscrewAPI service. Raises
    ImportError where grpcio isn't installed (the HTTP binary endpoint
    covers that case). Returns (server, bound_port)."""
    import grpc  # noqa: PLC0415 — optional dependency gate

    methods = GrpcMethods(api)

    def unary(name):
        req_desc, resp_desc = pw.SERVICE_METHODS[name]

        def handler(request: dict, context):
            api.request_count += 1
            try:
                return getattr(methods, name)(request)
            except InvalidArgument as ex:
                # handler already counted the error
                context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(ex))
            except ValueError as ex:
                api.error_count += 1
                context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(ex))

        def deserialize(b, d=req_desc):
            try:
                return pw.decode(b, d)
            except ValueError:
                # malformed wire bytes never reach the handler — the
                # transport counts them (matches the HTTP binary path)
                api.request_count += 1
                api.error_count += 1
                raise

        return grpc.unary_unary_rpc_method_handler(
            handler,
            request_deserializer=deserialize,
            response_serializer=lambda m, d=resp_desc: pw.encode(m, d),
        )

    generic = grpc.method_handlers_generic_handler(
        pw.SERVICE_NAME, {name: unary(name) for name in pw.SERVICE_METHODS})
    from concurrent import futures

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
    server.add_generic_rpc_handlers((generic,))
    bound = server.add_insecure_port(f"{host}:{port}")
    return server, bound
