"""Deterministic synthetic cloud-resource generator (FIXTURES.md shapes).

The file-based provider of the rebuild plan (SURVEY.md §7 step 7): a
scan source that needs no cloud credentials, used to exercise the
compliance/changes/drift subsystems on cloud-shaped data.

Everything is generated distributed (spark.range + column expressions,
seeded modular arithmetic — no Python row loops, no RNG state), so the
same generator scales from the 30-row test fixture to a billion-row
load-test corpus by changing ``n``.

The three S3 bucket archetypes reproduce the reference's de-facto golden
fixture (insert_test_data.sql): compliant / insecure / partial, so each
compliance control yields deterministic PASS/FAIL/mixed rows.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corkscrew_spark.schema import CHANGE_TYPES, SEVERITIES

SERVICES = ("s3", "ec2", "iam", "lambda", "rds", "dynamodb")
TYPES = {
    "s3": "AWS::S3::Bucket",
    "ec2": "AWS::EC2::Instance",
    "iam": "AWS::IAM::User",
    "lambda": "AWS::Lambda::Function",
    "rds": "AWS::RDS::DBInstance",
    "dynamodb": "AWS::DynamoDB::Table",
}
REGIONS = ("us-east-1", "us-east-1", "us-east-1", "us-west-2", "eu-west-1")
ACCOUNTS = ("111111111111", "222222222222")

_COMPLIANT = json.dumps({
    "Versioning": {"Status": "Enabled", "MfaDelete": "Disabled"},
    "ServerSideEncryptionConfiguration": {"Rules": [{"ApplyServerSideEncryptionByDefault": {
        "SSEAlgorithm": "aws:kms",
        "KMSMasterKeyID": "arn:aws:kms:us-east-1:123:key/trusted-key-123"}}]},
    "PublicAccessBlock": {"PublicAccessBlockConfiguration": {
        "BlockPublicAcls": True, "BlockPublicPolicy": True,
        "IgnorePublicAcls": True, "RestrictPublicBuckets": True}},
    "Policy": "{\"Statement\":[{\"Effect\":\"Deny\",\"Action\":\"s3:DeleteBucket\"}]}",
    "LifecycleConfiguration": {"Rules": [{"Status": "Enabled"}]},
    "Logging": {"LoggingEnabled": {"TargetBucket": "audit-logs"}},
})
_INSECURE = json.dumps({"Versioning": {"Status": "Suspended"}})
_PARTIAL = json.dumps({
    "Versioning": {"Status": "Enabled"},
    "ServerSideEncryptionConfiguration": {"Rules": [{"ApplyServerSideEncryptionByDefault": {
        "SSEAlgorithm": "AES256"}}]},
})


def resources(spark: SparkSession, n: int = 300) -> DataFrame:
    """n resources across 6 services / 5 (skewed) regions / 2 accounts.

    S3 rows cycle through the three compliance archetypes; EC2 rows get a
    parent chain (instance → subnet-ish parent) for graph/drift tests.
    """
    i = F.col("id_n")
    svc = F.element_at(F.array(*[F.lit(s) for s in SERVICES]), (i % 6 + 1).cast("int"))
    rtype = F.element_at(F.array(*[F.lit(TYPES[s]) for s in SERVICES]), (i % 6 + 1).cast("int"))
    region = F.element_at(
        F.array(*[F.lit(r) for r in REGIONS]), (F.pmod(i * 7, 5) + 1).cast("int")
    )
    account = F.element_at(F.array(*[F.lit(a) for a in ACCOUNTS]), (i % 2 + 1).cast("int"))
    name = F.concat(svc, F.lit("-res-"), i.cast("string"))
    rid = F.concat(F.lit("arn:aws:"), svc, F.lit(":"), region, F.lit(":"), account,
                   F.lit(":"), name)
    # archetype cycles over the row's ordinal WITHIN its service (i//6):
    # services repeat with period 6, so a global i%3 would pin every s3
    # row (i ≡ 0 mod 6) to one archetype instead of cycling all three.
    archetype = F.floor(i / 6) % 3
    raw = (
        F.when(svc != "s3", F.lit(None).cast("string"))
        .when(archetype == 0, F.lit(_COMPLIANT))
        .when(archetype == 1, F.lit(_INSECURE))
        .otherwise(F.lit(_PARTIAL))
    )
    env = F.when(archetype == 0, "Production").when(archetype == 1, "Dev").otherwise("Staging")
    # parent chain: every ec2 row points at the previous iam row's id (dense
    # deterministic chains without a self-join)
    parent_svc = F.lit("iam")
    parent_i = (i - 2)
    parent = F.when(
        (svc == "ec2") & (parent_i >= 0),
        F.concat(F.lit("arn:aws:"), parent_svc, F.lit(":"),
                 F.element_at(F.array(*[F.lit(r) for r in REGIONS]),
                              (F.pmod(parent_i * 7, 5) + 1).cast("int")),
                 F.lit(":"),
                 F.element_at(F.array(*[F.lit(a) for a in ACCOUNTS]),
                              (parent_i % 2 + 1).cast("int")),
                 F.lit(":iam-res-"), parent_i.cast("string")),
    )
    base_ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    return (
        spark.range(n).withColumnRenamed("id", "id_n")
        .select(
            rid.alias("id"),
            rid.alias("arn"),
            name.alias("name"),
            rtype.alias("type"),
            svc.alias("service"),
            F.lit("aws").alias("provider"),
            region.alias("region"),
            account.alias("account_id"),
            parent.alias("parent_id"),
            F.create_map(F.lit("Environment"), env, F.lit("Team"),
                         F.concat(F.lit("team-"), (i % 4).cast("string"))).alias("tags"),
            F.to_json(F.struct(
                F.when(archetype == 0, "true").otherwise("false").alias("encryption_enabled"),
                F.when(archetype != 1, "true").otherwise("false").alias("versioning_enabled"),
            )).alias("attributes"),
            raw.alias("raw_data"),
            F.when(i % 10 == 9, "stopped").otherwise("running").alias("state"),
            (base_ts + F.make_interval(hours=(i % 720).cast("int"))).alias("created_at"),
            (base_ts + F.make_interval(hours=(i % 720 + 24).cast("int"))).alias("modified_at"),
            F.to_timestamp(F.lit("2024-02-01 00:00:00")).alias("scanned_at"),
        )
    )


def relationships(spark: SparkSession, res: DataFrame) -> DataFrame:
    """Edges: containment from parent_id + deterministic 'uses' edges.

    Derived FROM the resource table (one scan, two projections) — matches
    the reference's relationship extraction pass (relationships.go:30-92).
    """
    contained = (
        res.filter(F.col("parent_id").isNotNull())
        .select(
            F.col("id").alias("from_id"),
            F.col("parent_id").alias("to_id"),
            F.lit("contained_in").alias("relationship_type"),
            F.lit("aws").alias("provider"),
            F.to_json(F.struct(F.lit("ParentId").alias("field_name"))).alias("properties"),
        )
    )
    # ring of 'uses' edges among lambda fns → guarantees cycles for the
    # traversal cycle-guard tests
    lam = res.filter(F.col("service") == "lambda").select("id")
    w = lam.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    cnt = w.count()
    nxt = w.select(F.col("id").alias("to_id"), (F.col("rn") % cnt + 1).alias("rn"))
    uses = (
        w.join(nxt, "rn")
        .select(
            F.col("id").alias("from_id"),
            "to_id",
            F.lit("uses").alias("relationship_type"),
            F.lit("aws").alias("provider"),
            F.to_json(F.struct(F.lit("Ring").alias("field_name"))).alias("properties"),
        )
    )
    return contained.unionByName(uses).select(
        "from_id", "to_id", "relationship_type", "provider",
        F.lit(None).cast("string").alias("relationship_subtype"),
        "properties",
        F.lit(None).cast("string").alias("from_resource_type"),
        F.lit(None).cast("string").alias("to_resource_type"),
        F.lit("outbound").alias("direction"),
        F.to_timestamp(F.lit("2024-02-01 00:00:00")).alias("created_at"),
        F.to_timestamp(F.lit("2024-02-01 00:00:00")).alias("discovered_at"),
    )


def change_events(spark: SparkSession, res: DataFrame, per_resource: int = 5) -> DataFrame:
    """per_resource change events per resource over 30 days, cycling
    through change types/severities, with keyword-bearing changed_fields
    to exercise impact scoring (base_change_tracker.go:133-250)."""
    ids = res.select("id", "name", "type", "service", "region")
    seq = spark.range(per_resource).withColumnRenamed("id", "k")
    j = ids.crossJoin(F.broadcast(seq))
    i = F.xxhash64("id") + F.col("k")
    ctype = F.element_at(F.array(*[F.lit(c) for c in CHANGE_TYPES]),
                         (F.pmod(i, 6) + 1).cast("int"))
    sev = F.element_at(F.array(*[F.lit(s) for s in SEVERITIES]),
                       (F.pmod(i, 4) + 1).cast("int"))
    fields = F.element_at(
        F.array(
            F.lit('["iam_policy"]'),
            F.lit('["network_acl","public_access"]'),
            F.lit('["encryption_key"]'),
            F.lit('["cpu_size","memory_size"]'),
            F.lit('["description"]'),
        ),
        (F.pmod(i, 5) + 1).cast("int"),
    )
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(
        hours=F.pmod(i, 720).cast("int")
    )
    return j.select(
        F.concat(F.lit("ce-"), F.abs(i).cast("string")).alias("id"),
        F.lit("aws").alias("provider"),
        F.col("id").alias("resource_id"),
        F.col("name").alias("resource_name"),
        F.col("type").alias("resource_type"),
        "service",
        F.lit(None).cast("string").alias("project"),
        "region",
        ctype.alias("change_type"),
        sev.alias("severity"),
        ts.alias("timestamp"),
        ts.alias("detected_at"),
        F.to_json(F.struct(F.lit("old").alias("v"))).alias("previous_state"),
        F.to_json(F.struct(F.lit("new").alias("v"))).alias("current_state"),
        fields.alias("changed_fields"),
        F.lit(None).cast("string").alias("change_metadata"),
    )
