"""End-to-end scan pipeline: resources upserted, metadata appended."""

from __future__ import annotations

from corkscrew_spark.ingest import pipeline


def test_run_scan_persists_all_tables(spark, tmp_path):
    out = str(tmp_path / "wh")
    s1 = pipeline.run_scan(spark, out, ["s3", "iam"], ["us-east-1"])
    assert s1["status"] == "completed" and s1["total_resources"] > 0
    assert s1["new_resources"] == s1["total_resources"]

    res = spark.read.parquet(f"{out}/resources")
    assert res.count() == s1["total_resources"]
    meta = spark.read.parquet(f"{out}/scan_metadata")
    assert meta.count() == 1
    api = spark.read.parquet(f"{out}/api_action_metadata")
    assert api.count() == 2  # (s3, iam) × us-east-1

    # the warehouse is hive-partitioned by service so re-scans are
    # partition-scoped merges, not full-table rewrites
    import os
    assert sorted(e for e in os.listdir(f"{out}/resources")
                  if e.startswith("service=")) \
        == ["service=iam", "service=s3"]
    iam_files = {
        f: os.stat(os.path.join(f"{out}/resources/service=iam", f)).st_mtime_ns
        for f in os.listdir(f"{out}/resources/service=iam")
        if f.endswith(".parquet")}

    # second scan widens services: upsert keeps ids unique, metadata appends
    s2 = pipeline.run_scan(spark, out, ["s3", "lambda"], ["us-east-1"])
    res2 = spark.read.parquet(f"{out}/resources")
    assert res2.count() == s2["total_resources"] > s1["total_resources"]
    assert res2.select("id").distinct().count() == res2.count()
    assert spark.read.parquet(f"{out}/scan_metadata").count() == 2
    # iam wasn't in the second scan -> its partition files are untouched
    iam_after = {
        f: os.stat(os.path.join(f"{out}/resources/service=iam", f)).st_mtime_ns
        for f in os.listdir(f"{out}/resources/service=iam")
        if f.endswith(".parquet")}
    assert iam_after == iam_files


def test_scan_with_relationship_extraction(spark, tmp_path):
    from corkscrew_spark.ingest import pipeline

    out = str(tmp_path / "wh")
    pipeline.run_scan(spark, out, ["ec2", "iam"], ["us-east-1"],
                      with_relationships=True)
    edges = spark.read.parquet(f"{out}/relationships")
    assert edges.count() > 0
    cols = set(edges.columns)
    assert {"from_id", "to_id", "relationship_type", "provider"} <= cols
    # parent chains from the fake fleet surface as contained_in edges
    assert edges.filter("relationship_type = 'contained_in'").count() >= 0


def test_run_scan_expectations_gate(spark, tmp_path):
    """Expectations validate the batch BEFORE it merges: violations
    surface as summary warnings/failed_resources; strict mode aborts
    with nothing written."""
    import os

    import pytest

    out = str(tmp_path / "gated")
    rules = [
        {"name": "id_present", "not_null": "id"},
        {"name": "ids_unique", "unique": "id"},
        {"name": "impossible", "expr": "provider = 'nope'"},  # always fails
    ]
    # strict: abort, no warehouse writes at all
    with pytest.raises(ValueError, match="scan aborted by expectations"):
        pipeline.run_scan(spark, out, ["s3"], ["us-east-1"],
                          expectations=rules, strict_expectations=True)
    assert not os.path.exists(f"{out}/resources")

    # lenient: scan completes, violations recorded in the summary row
    s = pipeline.run_scan(spark, out, ["s3"], ["us-east-1"],
                          expectations=rules)
    assert s["status"] == "completed"
    assert "impossible" in s["warnings"]
    assert s["failed_resources"] == s["total_resources"]  # every row fails
    meta = spark.read.parquet(f"{out}/scan_metadata").collect()[0]
    assert "impossible" in meta.warnings

    # all-passing rules leave warnings empty
    s2 = pipeline.run_scan(spark, out, ["s3"], ["us-east-1"],
                           expectations=rules[:2])
    assert s2["warnings"] is None and s2["failed_resources"] == 0


def test_zero_resource_healthy_cell_gets_success_row(spark, tmp_path):
    """A cell that scans successfully but returns nothing must still get
    a success telemetry row — monitoring distinguishes 'scanned and
    empty' from 'never scanned'."""
    def factory(service, region):
        import boto3
        from botocore.stub import Stubber
        client = boto3.client(service, region_name=region,
                              aws_access_key_id="testing",
                              aws_secret_access_key="testing")
        st = Stubber(client)
        st.add_response("list_buckets", {"Buckets": [], "Owner": {"ID": "o"}},
                        {})
        st.activate()
        return client

    out = str(tmp_path / "wh")
    summary = pipeline.run_scan(spark, out, ["s3"], ["eu-north-1"],
                                client_factory=factory)
    assert summary["status"] == "completed"
    api = spark.read.parquet(f"{out}/api_action_metadata").collect()
    assert len(api) == 1
    assert api[0].success and api[0].resource_count == 0
    assert api[0].service == "s3" and api[0].region == "eu-north-1"
