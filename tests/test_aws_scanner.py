"""Executor-side scanner plumbing: work fan-out, pagination, extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from corkscrew_spark.ingest import aws_scanner
from corkscrew_spark.schema import RESOURCE_SCHEMA


def test_scan_schema_and_determinism(spark):
    df = aws_scanner.scan(spark, ["s3", "dynamodb"], ["us-east-1", "eu-west-1"],
                          rate_per_sec=0)
    assert df.schema == RESOURCE_SCHEMA
    a = sorted(r.id for r in df.collect())
    b = sorted(r.id for r in aws_scanner.scan(
        spark, ["s3", "dynamodb"], ["us-east-1", "eu-west-1"], rate_per_sec=0).collect())
    assert a == b and len(a) >= 48  # ≥12 per (service, region) cell
    assert len(set(a)) == len(a), "ids must be unique"


def test_scan_extraction_fields(spark):
    df = aws_scanner.scan(spark, ["s3"], ["us-east-1"], rate_per_sec=0)
    row = df.orderBy("name").first()
    assert row.provider == "aws" and row.service == "s3"
    assert row.type == "AWS::S3::Bucket"
    assert row.arn.startswith("arn:aws:s3:us-east-1:")
    assert row.tags and row.tags["env"] in ("prod", "dev")
    assert row.raw_data and "Checksum" in row.raw_data
    assert row.scanned_at is not None


def test_scan_unknown_service_skipped(spark):
    df = aws_scanner.scan(spark, ["s3", "nosuchservice"], ["us-east-1"],
                          rate_per_sec=0)
    assert df.filter(F.col("service") == "nosuchservice").count() == 0
    assert df.count() > 0


def test_describe_enrichment(spark):
    listed = aws_scanner.scan(spark, ["s3"], ["us-east-1"], rate_per_sec=0)
    enriched = aws_scanner.describe_resources(listed)
    assert enriched.schema == RESOURCE_SCHEMA
    rows = enriched.collect()
    assert len(rows) == listed.count()
    for r in rows[:5]:
        assert r.attributes and "Description" in r.attributes
        assert "Describe" in r.raw_data and "Checksum" in r.raw_data


def test_search_source(spark):
    df = aws_scanner.search(spark, "service:s3 region:us-east-1 tag:env=prod")
    assert df.schema == RESOURCE_SCHEMA
    rows = df.collect()
    assert rows and all(r.service == "s3" and r.tags["env"] == "prod" for r in rows)
    # free-text narrows by name
    one = aws_scanner.search(spark, "service:s3 region:us-east-1 0001")
    assert one.count() == 1


def test_parse_arn():
    ref = aws_scanner.parse_arn("arn:aws:s3:us-east-1:111111111111:bucket/my-b")
    assert ref == {"service": "s3", "region": "us-east-1",
                   "account": "111111111111", "name": "my-b"}
    assert aws_scanner.parse_arn("not-an-arn")["service"] is None


class TestAwsRelationshipExtraction:
    def test_field_and_parent_edges(self, spark):
        import json
        from corkscrew_spark.ingest import aws_scanner

        rows = [
            ("i-1", "AWS::EC2::Instance", "subnet-parent-9", json.dumps({
                "VpcId": "vpc-0a1b",
                "SubnetIds": ["subnet-1", "subnet-2"],
                "IamInstanceProfile": {"RoleArn":
                    "arn:aws:iam::123:role/app-role"},
                "KmsKeyId": "arn:aws:kms:us-east-1:123:key/k1",
                "Name": "not-a-ref",
            })),
            ("f-1", "AWS::Lambda::Function", None, json.dumps({
                "ExecutionRole": "arn:aws:iam::123:role/lambda-exec",
                "SelfRef": "f-1",
            })),
            ("b-1", "AWS::S3::Bucket", None, None),
        ]
        res = spark.createDataFrame(
            rows, "id string, type string, parent_id string, raw_data string")
        edges = {(r.from_id, r.to_id, r.relationship_type)
                 for r in aws_scanner.extract_relationships(res).collect()}
        assert ("i-1", "vpc-0a1b", "contained_in") in edges
        assert ("i-1", "subnet-1", "deployed_in") in edges
        assert ("i-1", "subnet-2", "deployed_in") in edges
        assert ("i-1", "arn:aws:iam::123:role/app-role", "assumes") in edges
        assert ("i-1", "arn:aws:kms:us-east-1:123:key/k1",
                "encrypted_with") in edges
        assert ("i-1", "subnet-parent-9", "contained_in") in edges
        assert ("f-1", "arn:aws:iam::123:role/lambda-exec", "assumes") in edges
        # non-reference values and self references never become edges
        assert not any(t == "not-a-ref" or f == t for f, t, _ in edges)

    def test_schema_matches_relationship_contract(self, spark):
        from corkscrew_spark.ingest import aws_scanner
        from corkscrew_spark.schema import RELATIONSHIP_SCHEMA

        res = spark.createDataFrame(
            [("i-1", "t", None, '{"VpcId": "vpc-1"}')],
            "id string, type string, parent_id string, raw_data string")
        out = aws_scanner.extract_relationships(res)
        assert [f.name for f in out.schema.fields] == [
            f.name for f in RELATIONSHIP_SCHEMA.fields]


class TestStubbedRealClient:
    """S6 proof against REAL SDK shapes: the scan loop drives genuine
    botocore clients (response validation, operation model, paginator
    token protocol) wrapped in botocore.stub.Stubber — no network, no
    fake paginator. The factory closure is cloudpickled by value to each
    executor worker, where it builds + activates the stub."""

    @staticmethod
    def _make_factory():
        # Nested closure: its qualname isn't importable, so Spark's
        # cloudpickle serializes it (and everything it does) BY VALUE —
        # executor workers never need the test module on their path.
        def factory(service, region):
            import datetime as _dt

            import boto3
            from botocore.stub import Stubber

            client = boto3.client(
                service, region_name=region,
                aws_access_key_id="testing",
                aws_secret_access_key="testing")
            st = Stubber(client)
            if service == "s3":
                st.add_response("list_buckets", {
                    "Buckets": [
                        {"Name": f"bkt-{region}-a",
                         "CreationDate": _dt.datetime(2024, 1, 1)},
                        {"Name": f"bkt-{region}-b",
                         "CreationDate": _dt.datetime(2024, 1, 2)},
                    ],
                    "Owner": {"ID": "owner-1"},
                }, {})
            elif service == "ec2":
                # two pages linked by NextToken — exercises the real
                # paginator's token protocol end-to-end
                st.add_response("describe_instances", {
                    "Reservations": [{"Instances": [{
                        "InstanceId": f"i-{region}-001",
                        "State": {"Name": "running"},
                        "Tags": [{"Key": "env", "Value": "prod"}],
                        "VpcId": "vpc-1", "SubnetId": "subnet-1",
                    }]}],
                    "NextToken": "page-2",
                }, {})
                st.add_response("describe_instances", {
                    "Reservations": [{"Instances": [{
                        "InstanceId": f"i-{region}-002",
                        "State": {"Name": "stopped"},
                    }]}],
                }, {"NextToken": "page-2"})
            else:
                raise AssertionError(f"unexpected service {service}")
            st.activate()
            return client

        return factory

    def test_scan_through_stubbed_botocore(self, spark):
        df = aws_scanner.scan(
            spark, ["s3", "ec2"], ["us-east-1", "eu-west-1"],
            rate_per_sec=0, client_factory=self._make_factory())
        assert df.schema == RESOURCE_SCHEMA
        rows = {r.name: r for r in df.collect()}
        # 2 buckets + 2 instances per region
        assert len(rows) == 8
        assert rows["bkt-us-east-1-a"].type == "AWS::S3::Bucket"
        inst = rows["i-eu-west-1-001"]
        assert inst.type == "AWS::EC2::Instance"
        assert inst.state == "running" and inst.tags["env"] == "prod"
        # page 2 (reached only via the real NextToken round-trip)
        assert rows["i-eu-west-1-002"].state == "stopped"
        assert all(r.provider == "aws" for r in rows.values())

    def test_run_scan_pipeline_with_stubbed_client(self, spark, tmp_path):
        from corkscrew_spark.ingest import pipeline

        out = str(tmp_path / "warehouse")
        summary = pipeline.run_scan(
            spark, out, ["s3", "ec2"], ["us-east-1"],
            client_factory=self._make_factory())
        assert summary["total_resources"] == 4
        res = spark.read.parquet(f"{out}/resources")
        assert res.count() == 4
        assert {r.service for r in res.collect()} == {"s3", "ec2"}


class TestScanFaultModes:
    """Round-5: the reference's failure modes driven through the real-
    botocore Stubber seam (plugins/aws-provider/tests/
    failure_mode_test.go): throttling retries with backoff, permission
    errors record-and-continue, partial pages keep their good items —
    and a fault never kills the task."""

    @staticmethod
    def _denied_s3_good_ec2():
        def factory(service, region):
            import boto3
            from botocore.stub import Stubber
            client = boto3.client(service, region_name=region,
                                  aws_access_key_id="testing",
                                  aws_secret_access_key="testing")
            st = Stubber(client)
            if service == "s3":
                st.add_client_error("list_buckets",
                                    service_error_code="AccessDenied",
                                    service_message="not authorized",
                                    http_status_code=403)
            else:
                st.add_response("describe_instances", {
                    "Reservations": [{"Instances": [
                        {"InstanceId": f"i-{region}-ok",
                         "State": {"Name": "running"}}]}],
                }, {})
            st.activate()
            return client

        return factory

    def test_access_denied_records_error_and_continues(self, spark):
        raw = aws_scanner.scan_with_errors(
            spark, ["s3", "ec2"], ["us-east-1"], rate_per_sec=0,
            client_factory=self._denied_s3_good_ec2()).collect()
        errors = [r for r in raw if r.error_code is not None]
        good = [r for r in raw if r.error_code is None]
        assert len(errors) == 1
        assert errors[0].service == "s3"
        assert errors[0].error_code == "AccessDenied"
        assert "not authorized" in errors[0].error_message
        assert [r.name for r in good] == ["i-us-east-1-ok"]
        # the resources-only surface silently drops the failed cell
        names = [r.name for r in aws_scanner.scan(
            spark, ["s3", "ec2"], ["us-east-1"], rate_per_sec=0,
            client_factory=self._denied_s3_good_ec2()).collect()]
        assert names == ["i-us-east-1-ok"]

    def test_throttling_retries_then_succeeds(self, spark):
        def make_factory():
            calls = {}

            def factory(service, region):
                import datetime as _dt

                import boto3
                from botocore.stub import Stubber
                n = calls.get((service, region), 0)
                calls[(service, region)] = n + 1
                client = boto3.client(service, region_name=region,
                                      aws_access_key_id="testing",
                                      aws_secret_access_key="testing")
                st = Stubber(client)
                if n < 2:  # first two attempts throttled
                    st.add_client_error(
                        "list_buckets",
                        service_error_code="ThrottlingException",
                        http_status_code=400)
                else:
                    st.add_response("list_buckets", {
                        "Buckets": [{"Name": "bkt-after-retry",
                                     "CreationDate": _dt.datetime(2024, 1, 1)}],
                        "Owner": {"ID": "o"},
                    }, {})
                st.activate()
                return client

            return factory

        raw = aws_scanner.scan_with_errors(
            spark, ["s3"], ["us-east-1"], rate_per_sec=0,
            client_factory=make_factory(), retry_base_s=0.01).collect()
        assert [r.error_code for r in raw] == [None]
        assert raw[0].name == "bkt-after-retry"

    def test_throttling_exhausts_to_error_row(self, spark):
        def factory(service, region):
            import boto3
            from botocore.stub import Stubber
            client = boto3.client(service, region_name=region,
                                  aws_access_key_id="testing",
                                  aws_secret_access_key="testing")
            st = Stubber(client)
            st.add_client_error("list_buckets",
                                service_error_code="SlowDown",
                                http_status_code=503)
            st.activate()
            return client

        raw = aws_scanner.scan_with_errors(
            spark, ["s3"], ["us-east-1"], rate_per_sec=0,
            client_factory=factory, max_retries=1,
            retry_base_s=0.01).collect()
        assert len(raw) == 1
        assert raw[0].error_code == "SlowDown"
        assert raw[0].id == "error:s3:us-east-1"

    def test_partial_page_keeps_good_items(self, spark):
        """A page with no result items (the partial-result shape) must
        not drop the other pages' resources."""
        def factory(service, region):
            import datetime as _dt

            import boto3
            from botocore.stub import Stubber
            client = boto3.client(service, region_name=region,
                                  aws_access_key_id="testing",
                                  aws_secret_access_key="testing")
            st = Stubber(client)
            st.add_response("describe_instances", {
                "Reservations": [{"Instances": [
                    {"InstanceId": "i-001",
                     "LaunchTime": _dt.datetime(2024, 1, 1)}]}],
                "NextToken": "p2",
            }, {})
            st.add_response("describe_instances", {"Reservations": []},
                            {"NextToken": "p2"})
            st.activate()
            return client

        rows = aws_scanner.scan(
            spark, ["ec2"], ["us-east-1"], rate_per_sec=0,
            client_factory=factory).collect()
        assert [r.name for r in rows] == ["i-001"]

    def test_run_scan_accounts_errors_in_metadata(self, spark, tmp_path):
        from corkscrew_spark.ingest import pipeline

        out = str(tmp_path / "wh")
        summary = pipeline.run_scan(
            spark, out, ["s3", "ec2"], ["us-east-1"],
            client_factory=self._denied_s3_good_ec2())
        assert summary["status"] == "completed_with_errors"
        assert "s3/us-east-1: AccessDenied" in summary["error_messages"]
        # only the healthy cell's resources merged
        res = spark.read.parquet(f"{out}/resources")
        assert {r.service for r in res.collect()} == {"ec2"}
        # the failed cell landed in api_action_metadata as a failed op
        api = spark.read.parquet(f"{out}/api_action_metadata")
        err = [r for r in api.collect() if not r.success]
        assert len(err) == 1
        assert (err[0].service, err[0].status_code, err[0].error_code) == (
            "s3", 403, "AccessDenied")
        ok = [r for r in api.collect() if r.success]
        assert {r.service for r in ok} == {"ec2"}
