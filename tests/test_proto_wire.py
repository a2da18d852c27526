"""proto3 wire codec + gRPC-envelope transport tests.

Layered: (1) byte-exact vectors hand-assembled from the public proto3
wire spec (what protoc emits for the same message — proves stub
compatibility), (2) encode/decode round-trips across every api.proto
message, (3) the full RPC pipeline in-process (call_method), (4) the
HTTP binary endpoint, (5) a real grpcio socket round-trip when grpcio
is installed (skipped here — the sandbox has no grpcio).
"""

from __future__ import annotations

import http.client
import threading

import pytest

from corkscrew_spark import proto_wire as pw


class TestWireFormat:
    def test_varint_roundtrip(self):
        for v in (0, 1, 127, 128, 300, 2 ** 21, 2 ** 63 - 1):
            buf = pw.encode_varint(v)
            got, pos = pw.decode_varint(buf, 0)
            assert got == v and pos == len(buf)
        # protoc's canonical 300 encoding
        assert pw.encode_varint(300) == b"\xac\x02"

    def test_negative_int_is_64bit_twos_complement(self):
        buf = pw.encode(
            {"limit": -1}, pw.API_EXECUTE_QUERY_REQUEST)
        # tag 4<<3|0 = 0x20 then ten 0xff.. varint bytes ending 0x01
        assert buf == b"\x20" + b"\xff" * 9 + b"\x01"
        back = pw.decode(buf, pw.API_EXECUTE_QUERY_REQUEST)
        assert back["limit"] == -1

    def test_execute_query_request_protoc_bytes(self):
        """Byte-exact vector assembled from the proto3 wire spec —
        identical to protoc stub output for the same message."""
        msg = {"query": "SELECT 1", "limit": 5}
        assert pw.encode(msg, pw.API_EXECUTE_QUERY_REQUEST) == \
            b"\x0a\x08SELECT 1\x20\x05"

    def test_map_field_bytes(self):
        msg = {"parameters": {"a": "b"}}
        assert pw.encode(msg, pw.API_EXECUTE_QUERY_REQUEST) == \
            b"\x1a\x06\x0a\x01a\x12\x01b"
        back = pw.decode(b"\x1a\x06\x0a\x01a\x12\x01b",
                         pw.API_EXECUTE_QUERY_REQUEST)
        assert back["parameters"] == {"a": "b"}

    def test_defaults_omitted_and_filled(self):
        # proto3: zero values encode to nothing; decode fills them back
        assert pw.encode({"query": "", "limit": 0},
                         pw.API_EXECUTE_QUERY_REQUEST) == b""
        back = pw.decode(b"", pw.API_EXECUTE_QUERY_REQUEST)
        assert back == {"query": "", "output_format": "",
                        "parameters": {}, "limit": 0}

    def test_unknown_fields_skipped(self):
        # field 99 (varint) + field 1 — decoder must skip the unknown
        buf = pw.encode_varint((99 << 3) | 0) + pw.encode_varint(7) \
            + b"\x0a\x02hi"
        back = pw.decode(buf, pw.API_EXECUTE_QUERY_REQUEST)
        assert back["query"] == "hi"

    def test_nested_and_repeated_roundtrip(self):
        msg = {
            "rows": [{"values": {"c1": "1", "c2": ""}},
                     {"values": {"c1": "x", "c2": "y"}}],
            "columns": ["c1", "c2"],
            "row_count": 2,
            "execution_time_ms": 1234,
        }
        buf = pw.encode(msg, pw.API_EXECUTE_QUERY_RESPONSE)
        back = pw.decode(buf, pw.API_EXECUTE_QUERY_RESPONSE)
        assert back["rows"] == msg["rows"]
        assert back["columns"] == ["c1", "c2"]
        assert back["row_count"] == 2 and back["execution_time_ms"] == 1234
        assert back["error"] == ""

    def test_every_service_message_roundtrips(self):
        samples = {
            "ListProviders": ({"include_status": True},
                              {"providers": [{"name": "aws",
                                              "description": "d",
                                              "supported_services": ["s3"],
                                              "capabilities": {"x": "1"},
                                              "status": {"available": True}}]}),
            "GetProviderInfo": ({"provider": "aws"},
                                {"provider_info": {"name": "aws"},
                                 "error": ""}),
            "HealthCheck": ({}, {"status": 1, "version": "2.0.0",
                                 "timestamp": {"seconds": 5, "nanos": 1},
                                 "details": {"uptime": "9s"}}),
            "GetStatus": ({"include_providers": True},
                          {"overall_status": 1,
                           "system_stats": {"uptime_seconds": 3,
                                            "total_requests": 7}}),
            "ExecuteQuery": ({"query": "SELECT 1"},
                             {"columns": ["a"], "row_count": 1}),
            "DiscoverIDMSServices": (
                {"force_refresh": True},
                {"success": True, "total_found": 1,
                 "services": [{"provider": "aws", "name": "iam",
                               "metadata": {"k": "v"}}]}),
        }
        def check(sent, got):
            """Every sent field survives the round-trip (decoded dicts
            additionally carry proto3 defaults for unsent fields)."""
            for k, v in sent.items():
                if isinstance(v, dict) and v and all(
                        isinstance(x, dict) for x in v.values()):
                    check(v, got[k])          # nested message-ish dict
                elif isinstance(v, list) and v and isinstance(v[0], dict):
                    assert len(got[k]) == len(v)
                    for s, g in zip(v, got[k]):
                        check(s, g)           # repeated message
                elif isinstance(v, dict) and not v:
                    assert got[k] == {}
                elif isinstance(v, dict):
                    check(v, got[k])
                else:
                    assert got[k] == v, k

        for rpc, (req, resp) in samples.items():
            req_d, resp_d = pw.SERVICE_METHODS[rpc]
            for msg, d in ((req, req_d), (resp, resp_d)):
                check(msg, pw.decode(pw.encode(msg, d), d))


@pytest.fixture(scope="module")
def api(spark):
    from corkscrew_spark.catalog import register_tables
    from corkscrew_spark.server import ApiServer

    register_tables(spark, "/root/testdata/sf0.001")
    return ApiServer(spark)


class TestRpcPipeline:
    """call_method = decode -> handler -> encode, the exact pipeline
    grpcio drives through its serializer hooks."""

    def test_execute_query(self, api):
        from corkscrew_spark import server_grpc

        m = server_grpc.GrpcMethods(api)
        req = pw.encode({"query": "SELECT 1 AS one, NULL AS nothing"},
                        pw.API_EXECUTE_QUERY_REQUEST)
        resp = pw.decode(server_grpc.call_method(m, "ExecuteQuery", req),
                         pw.API_EXECUTE_QUERY_RESPONSE)
        assert resp["error"] == "" and resp["row_count"] == 1
        assert resp["columns"] == ["one", "nothing"]
        assert resp["rows"][0]["values"] == {"one": "1", "nothing": ""}

    def test_execute_query_engine_error_in_envelope(self, api):
        from corkscrew_spark import server_grpc

        m = server_grpc.GrpcMethods(api)
        req = pw.encode({"query": "DROP TABLE orders"},
                        pw.API_EXECUTE_QUERY_REQUEST)
        resp = pw.decode(server_grpc.call_method(m, "ExecuteQuery", req),
                         pw.API_EXECUTE_QUERY_RESPONSE)
        assert "Query execution failed" in resp["error"]
        assert resp["row_count"] == 0  # populated-error envelope, not raise

    def test_missing_query_is_invalid_argument(self, api):
        from corkscrew_spark import server_grpc

        m = server_grpc.GrpcMethods(api)
        with pytest.raises(ValueError):
            server_grpc.call_method(m, "ExecuteQuery", b"")

    def test_health_status_providers(self, api):
        from corkscrew_spark import server_grpc

        m = server_grpc.GrpcMethods(api)
        h = pw.decode(server_grpc.call_method(m, "HealthCheck", b""),
                      pw.API_HEALTH_CHECK_RESPONSE)
        assert h["status"] == pw.HEALTH_STATUS["HEALTHY"]
        assert h["timestamp"]["seconds"] > 0

        s = pw.decode(server_grpc.call_method(m, "GetStatus", b""),
                      pw.API_GET_STATUS_RESPONSE)
        assert s["overall_status"] == pw.HEALTH_STATUS["HEALTHY"]

        req = pw.encode({"include_status": True},
                        pw.API_LIST_PROVIDERS_REQUEST)
        p = pw.decode(server_grpc.call_method(m, "ListProviders", req),
                      pw.API_LIST_PROVIDERS_RESPONSE)
        names = {x["name"] for x in p["providers"]}
        assert {"aws", "azure", "gcp", "kubernetes"} <= names
        assert all(x["status"]["available"] for x in p["providers"])

    def test_unknown_rpc(self, api):
        from corkscrew_spark import server_grpc

        with pytest.raises(KeyError):
            server_grpc.call_method(server_grpc.GrpcMethods(api),
                                    "NoSuchRpc", b"")


class TestHttpBinaryEndpoint:
    def test_binary_protobuf_over_http(self, api):
        httpd = api.make_http_server(port=0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            body = pw.encode({"query": "SELECT 2 AS two"},
                             pw.API_EXECUTE_QUERY_REQUEST)
            conn.request("POST", "/v1/grpc/ExecuteQuery", body=body,
                         headers={"Content-Type": "application/x-protobuf"})
            r = conn.getresponse()
            assert r.status == 200
            assert r.getheader("Content-Type") == "application/x-protobuf"
            resp = pw.decode(r.read(), pw.API_EXECUTE_QUERY_RESPONSE)
            assert resp["rows"][0]["values"] == {"two": "2"}

            # unknown RPC -> 404; empty query -> 400 INVALID_ARGUMENT
            conn.request("POST", "/v1/grpc/Nope", body=b"")
            assert conn.getresponse().status == 404
            errs_before = api.error_count
            conn.request("POST", "/v1/grpc/ExecuteQuery", body=b"")
            assert conn.getresponse().status == 400
            # handler-validated failure counts exactly ONCE
            assert api.error_count == errs_before + 1
            # malformed protobuf (truncated varint) -> 400, counted by
            # the transport (the handler never ran)
            conn.request("POST", "/v1/grpc/HealthCheck", body=b"\x08")
            r = conn.getresponse()
            assert r.status == 400
            assert b"invalid request body" in r.read()
            assert api.error_count == errs_before + 2
        finally:
            httpd.shutdown()


import importlib.util  # noqa: E402


@pytest.mark.skipif(importlib.util.find_spec("grpc") is None,
                    reason="grpcio not installed")
class TestGrpcSocket:
    """Real grpcio round-trip — runs wherever grpcio is installed (the
    generic-handler server needs no protoc stubs)."""

    def test_execute_query_over_grpc(self, api):
        import grpc

        from corkscrew_spark import server_grpc

        server, port = server_grpc.make_grpc_server(api)
        server.start()
        try:
            channel = grpc.insecure_channel(f"127.0.0.1:{port}")
            stub = channel.unary_unary(
                f"/{pw.SERVICE_NAME}/ExecuteQuery",
                request_serializer=lambda m: pw.encode(
                    m, pw.API_EXECUTE_QUERY_REQUEST),
                response_deserializer=lambda b: pw.decode(
                    b, pw.API_EXECUTE_QUERY_RESPONSE),
            )
            resp = stub({"query": "SELECT 3 AS three"})
            assert resp["rows"][0]["values"] == {"three": "3"}
        finally:
            server.stop(0)


class TestTruncationSafety:
    """Round-5 hardening: a message truncated mid-field must raise
    ValueError, never silently decode a short slice to wrong values
    (varint truncation already raised; this pins the length-delimited
    and fixed-width paths too)."""

    def test_truncated_string_field_raises(self):
        full = pw.encode({"query": "SELECT count(*) FROM resources"},
                         pw.API_EXECUTE_QUERY_REQUEST)
        with pytest.raises(ValueError, match="truncated"):
            pw.decode(full[:-5], pw.API_EXECUTE_QUERY_REQUEST)

    def test_truncated_nested_message_raises(self):
        full = pw.encode(
            {"status": 1, "timestamp": {"seconds": 1700000000, "nanos": 5}},
            pw.API_HEALTH_CHECK_RESPONSE)
        with pytest.raises(ValueError, match="truncated"):
            pw.decode(full[:-1], pw.API_HEALTH_CHECK_RESPONSE)

    def test_truncated_unknown_len_field_raises(self):
        # unknown field 15, LEN wire type, claims 10 bytes but has 2
        buf = pw._tag(15, 2) + pw.encode_varint(10) + b"xy"
        with pytest.raises(ValueError, match="truncated"):
            pw.decode(buf, pw.API_EXECUTE_QUERY_REQUEST)

    def test_truncated_unknown_fixed_width_raises(self):
        # unknown field 15 with I64/I32 wire types, short payloads
        for wt, width in ((1, 8), (5, 4)):
            buf = pw._tag(15, wt) + b"\x00" * (width - 1)
            with pytest.raises(ValueError, match="truncated"):
                pw.decode(buf, pw.API_EXECUTE_QUERY_REQUEST)

    def test_every_prefix_raises_or_decodes_consistently(self):
        """Fuzz: for every strict prefix of a rich valid message, decode
        either raises ValueError (truncation detected) or returns a dict
        whose encodable content is a prefix-consistent submessage — it
        must never raise anything else or crash the transport layer."""
        msg = {
            "rows": [{"values": {"id": "i-1", "region": "eu-west-1"}},
                     {"values": {"id": "i-2"}}],
            "columns": ["id", "region"],
            "row_count": 2,
            "execution_time_ms": 1234,
        }
        full = pw.encode(msg, pw.API_EXECUTE_QUERY_RESPONSE)
        assert pw.decode(full, pw.API_EXECUTE_QUERY_RESPONSE)["row_count"] == 2
        outcomes = {"raised": 0, "decoded": 0}
        for cut in range(len(full)):
            try:
                pw.decode(full[:cut], pw.API_EXECUTE_QUERY_RESPONSE)
                outcomes["decoded"] += 1
            except ValueError:
                outcomes["raised"] += 1
        # both outcomes occur (field boundaries decode, mid-field raises)
        assert outcomes["raised"] > 0 and outcomes["decoded"] > 0
