"""API server facade: real HTTP round-trips against a live server thread
(api_server.go ExecuteQuery :127-180, HealthCheck, GetStatus,
ListProviders — same envelope semantics over JSON/HTTP)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from corkscrew_spark.catalog import register_tables
from corkscrew_spark.server import ApiServer


@pytest.fixture(scope="module")
def api(spark, sf_dir):
    register_tables(spark, sf_dir)
    server = ApiServer(spark)
    httpd = server.make_http_server(port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url: str, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as ex:
        return ex.code, json.loads(ex.read())


def test_execute_query_rows_and_stats(api):
    code, doc = _post(f"{api}/v1/query", {
        "query": "SELECT r_regionkey, r_name FROM region WHERE r_regionkey < :k ORDER BY r_regionkey",
        "params": {"k": 2},
    })
    assert code == 200
    assert doc["columns"] == ["r_regionkey", "r_name"]
    assert doc["row_count"] == 2
    assert doc["rows"][0]["values"]["r_regionkey"] == "0"
    assert doc["execution_time_ms"] >= 0


def test_execute_query_limit(api):
    code, doc = _post(f"{api}/v1/query",
                      {"query": "SELECT n_name FROM nation", "limit": 3})
    assert code == 200 and doc["row_count"] == 3


def test_error_envelope_engine_failure_is_http_200(api):
    code, doc = _post(f"{api}/v1/query", {"query": "DELETE FROM region"})
    assert code == 200
    assert "Query execution failed" in doc["error"]
    code, doc = _post(f"{api}/v1/query", {"query": "SELECT * FROM no_such_table"})
    assert code == 200 and "error" in doc


def test_missing_query_is_http_400(api):
    code, doc = _post(f"{api}/v1/query", {})
    assert code == 400 and doc["error"] == "query is required"


def test_null_values_render_empty_string(api):
    code, doc = _post(f"{api}/v1/query",
                      {"query": "SELECT CAST(NULL AS STRING) AS gone"})
    assert code == 200
    assert doc["rows"][0]["values"]["gone"] == ""


def test_health_status_providers(api):
    code, doc = _get(f"{api}/v1/health")
    assert code == 200 and doc["status"] == "HEALTHY" and "uptime" in doc["details"]
    code, doc = _get(f"{api}/v1/status")
    assert code == 200
    assert doc["system_stats"]["total_requests"] > 0
    assert doc["system_stats"]["total_errors"] > 0  # from the error tests
    code, doc = _get(f"{api}/v1/providers")
    assert code == 200
    assert {p["name"] for p in doc["providers"]} == {"aws", "azure", "gcp", "kubernetes"}


def test_unknown_endpoint_404(api):
    code, doc = _get_404(f"{api}/v1/nope")
    assert code == 404


def _get_404(url: str):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as ex:
        return ex.code, json.loads(ex.read())


def test_schemas_endpoint(spark):
    import json as _json
    import threading
    import urllib.request

    from corkscrew_spark.server import ApiServer

    srv = ApiServer(spark).make_http_server()
    port = srv.server_address[1]
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/schemas", timeout=30) as resp:
        doc = _json.loads(resp.read())
    t.join(timeout=30)
    srv.server_close()
    tables = {t_["table"] for t_ in doc["schemas"]}
    assert {"resources", "relationships"} <= tables


def test_discover_schema_endpoint(spark):
    import json as _json
    import threading
    import urllib.request

    from corkscrew_spark.server import ApiServer

    rows = [
        ("r1", "aws_s3_bucket", "us-east-1", {"env": "prod"},
         _json.dumps({"versioning": True, "config": {"tier": "IA"}})),
        ("r2", "aws_s3_bucket", "eu-west-1", None,
         _json.dumps({"versioning": False})),
    ]
    spark.createDataFrame(
        rows, "id string, type string, region string, "
              "tags map<string,string>, attributes string"
    ).createOrReplaceTempView("resources")

    srv = ApiServer(spark).make_http_server()
    port = srv.server_address[1]
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/discover-schema?type=aws_s3_bucket",
            timeout=60) as resp:
        doc = _json.loads(resp.read())
    t.join(timeout=60)
    srv.server_close()
    assert doc["success"] is True and doc["sample_count"] == 2
    assert doc["properties"]["versioning"]["required"] is True
    assert doc["properties"]["config.tier"]["type"] == "string"
    assert doc["common_tags"] == ["env"]


def test_served_warehouse_table_reads_through_skipping(spark, tmp_path):
    """An ApiServer built with warehouse dirs serves SQL over them with
    data skipping: HTTP query results equal the plain scan, and the
    engine holds the registration."""
    from pyspark.sql import functions as F

    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(400).select(F.col("id").alias("k")).repartitionByRange(
        4, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    srv = ApiServer(spark, warehouse={"wt": path})
    assert "wt" in srv.engine._warehouse
    httpd = srv.make_http_server(port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        status, body = _post(
            f"{base}/v1/query",
            {"query": "SELECT COUNT(*) AS n FROM wt WHERE k >= 350"})
        assert status == 200
        assert body["rows"][0]["values"]["n"] == "50"
    finally:
        httpd.shutdown()


def test_concurrent_queries_see_consistent_views(spark, tmp_path):
    """Queries execute CONCURRENTLY (no global lock): the engine's
    one-statement pruned views mean simultaneous requests — one with a
    selective predicate, one unpredicated — can never observe each
    other's pruning. Under the old repoint design the unpredicated
    query could silently read the other's file subset."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(800).select(F.col("id").alias("k")).repartitionByRange(
        8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    srv = ApiServer(spark, warehouse={"wt": path})
    httpd = srv.make_http_server(port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        def pruned(_):
            return _post(f"{base}/v1/query", {
                "query": "SELECT COUNT(*) AS n FROM wt WHERE k >= 700"})

        def full(_):
            return _post(f"{base}/v1/query", {
                "query": "SELECT COUNT(*) AS n FROM wt"})

        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(
                lambda i: pruned(i) if i % 2 else full(i), range(16)))
        for i, (status, body) in enumerate(results):
            assert status == 200 and "error" not in body, body
            want = "100" if i % 2 else "800"
            assert body["rows"][0]["values"]["n"] == want, (i, body)
        assert srv.request_count == 16 and srv.error_count == 0
    finally:
        httpd.shutdown()


def test_estimate_endpoint_dry_run(spark, tmp_path):
    """POST /v1/estimate returns the metadata-only scan preview the
    governor refuses on — the admission loop's dry-run over HTTP."""
    from pyspark.sql import functions as F

    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(800).select(F.col("id").alias("k")).repartitionByRange(
        8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    srv = ApiServer(spark, warehouse={"et": path},
                    max_scan_bytes=123_456_789)
    httpd = srv.make_http_server(port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        status, body = _post(f"{base}/v1/estimate", {
            "query": "SELECT * FROM et WHERE k >= 700"})
        assert status == 200 and body["estimable"]
        e = body["tables"]["et"]
        assert e["fallback"] is None
        assert 0 < e["files_kept"] < e["files_total"] == 8
        assert body["max_scan_bytes"] == 123_456_789
        # a bare scan previews its full-scan cost (what the governor
        # would enforce on)
        status, body = _post(f"{base}/v1/estimate", {
            "query": "SELECT * FROM et"})
        assert status == 200
        assert body["tables"]["et"]["files_kept"] == 8
        # missing query -> 400; unattributable -> estimable false
        status, body = _post(f"{base}/v1/estimate", {})
        assert status == 400
        status, body = _post(f"{base}/v1/estimate", {
            "query": "SELECT 1"})
        assert status == 200 and not body["estimable"]
    finally:
        httpd.shutdown()


def test_scan_budget_surfaces_through_error_envelope(spark, tmp_path):
    """ApiServer(max_scan_bytes=...) refuses over-budget queries with
    the standard HTTP-200 error envelope (ScanBudgetExceeded is a
    QueryValidationError), and under-budget queries run."""
    from pyspark.sql import functions as F

    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(50_000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).repartitionByRange(8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    est = skipping.estimate_scan(path, [("k", ">=", 49_000)])
    srv = ApiServer(spark, warehouse={"wt": path},
                    max_scan_bytes=est["bytes_kept"] + 1)
    httpd = srv.make_http_server(port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        status, body = _post(f"{base}/v1/query", {
            "query": "SELECT COUNT(*) AS n FROM wt WHERE k >= 49000"})
        assert status == 200 and body["rows"][0]["values"]["n"] == "1000"
        status, body = _post(f"{base}/v1/query", {
            "query": "SELECT COUNT(*) AS n FROM wt WHERE k >= 0"})
        assert status == 200 and "budget" in body["error"]
    finally:
        httpd.shutdown()
