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
