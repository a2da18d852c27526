"""Synthetic `aws_resources` fixture for the reference-dialect pack.

The reference's shipped ccc-storage pack queries scan an `aws_resources`
table of S3 buckets whose `raw_data` JSON carries encryption / public-
access-block / versioning / lifecycle / policy detail. This view derives
such a fleet deterministically from the TPC-H `customer` table (already
registered by catalog.register_tables), so the same rows are
reconstructable in any engine from pure column arithmetic — which is what
lets the driver's DuckDB oracle recompute the expected pack results
independently.

Per-bucket variation (k = c_custkey):
  encryption alg    aws:kms when k%3<2 else AES256
  kms key id        .../key/trusted-(k%4)   (params trust trusted-0/1)
  public acc. block BlockPublicAcls k%2=0, BlockPublicPolicy k%3>0,
                    IgnorePublicAcls k%5>0, RestrictPublicBuckets k%7>0
  versioning        Enabled when k%2=0 else Suspended; MfaDelete k%6=0
  lifecycle rules   present when k%3=0
  delete-deny pol.  present when k%5=0
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: number of buckets in the fixture fleet
FLEET = 400

S3_FIXTURE_VIEW_SQL = f"""
SELECT
  'arn:aws:s3:::bucket-' || CAST(c_custkey AS STRING) AS id,
  'bucket-' || CAST(c_custkey AS STRING) AS name,
  'arn:aws:s3:::bucket-' || CAST(c_custkey AS STRING) AS arn,
  'AWS::S3::Bucket' AS type,
  CASE WHEN c_custkey % 2 = 0 THEN 'us-east-1' ELSE 'eu-west-1' END AS region,
  '111111111111' AS account_id,
  map('env', CASE WHEN c_custkey % 2 = 0 THEN 'prod' ELSE 'dev' END) AS tags,
  CONCAT(
    '{{"ServerSideEncryptionConfiguration":{{"Rules":[{{"ApplyServerSideEncryptionByDefault":{{"SSEAlgorithm":"',
    CASE WHEN c_custkey % 3 < 2 THEN 'aws:kms' ELSE 'AES256' END,
    '","KMSMasterKeyID":"arn:aws:kms:us-east-1:111111111111:key/trusted-',
    CAST(c_custkey % 4 AS STRING),
    '"}}}}]}},"PublicAccessBlockConfiguration":{{"BlockPublicAcls":"',
    CASE WHEN c_custkey % 2 = 0 THEN 'true' ELSE 'false' END,
    '","BlockPublicPolicy":"', CASE WHEN c_custkey % 3 > 0 THEN 'true' ELSE 'false' END,
    '","IgnorePublicAcls":"', CASE WHEN c_custkey % 5 > 0 THEN 'true' ELSE 'false' END,
    '","RestrictPublicBuckets":"', CASE WHEN c_custkey % 7 > 0 THEN 'true' ELSE 'false' END,
    '"}},"Versioning":{{"Status":"',
    CASE WHEN c_custkey % 2 = 0 THEN 'Enabled' ELSE 'Suspended' END,
    '","MfaDelete":"', CASE WHEN c_custkey % 6 = 0 THEN 'Enabled' ELSE 'Disabled' END, '"}}',
    CASE WHEN c_custkey % 3 = 0
         THEN ',"LifecycleConfiguration":{{"Rules":[{{"ID":"expire-old"}}]}}' ELSE '' END,
    CASE WHEN c_custkey % 5 = 0
         THEN ',"Policy":"Deny s3:DeleteBucket via bucket policy"' ELSE '' END,
    '}}'
  ) AS raw_data,
  TIMESTAMP '2024-01-01 00:00:00' AS scanned_at
FROM customer
WHERE c_custkey <= {FLEET}
"""

#: the two key ARNs the fixture treats as trusted (k%4 in {{0,1}} pass)
TRUSTED_KEYS = [
    "arn:aws:kms:us-east-1:111111111111:key/trusted-0",
    "arn:aws:kms:us-east-1:111111111111:key/trusted-1",
]


def register_s3_fixture(spark: SparkSession) -> None:
    """Create/replace the `aws_resources` temp view (requires the TPC-H
    tables to be registered first)."""
    spark.sql(S3_FIXTURE_VIEW_SQL).createOrReplaceTempView("aws_resources")
