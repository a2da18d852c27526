"""Executor-side AWS scanner — the reflection scanner, Spark-shaped.

The reference's UnifiedScanner reflects over AWS SDK clients to find
``List*``/``Describe*`` operations, invokes them with pagination, and
extracts id/name/ARN/tags from the response structs
(plugins/aws-provider/pkg/scanner/unified_scanner.go:99-495). The Spark
equivalent: the (service, region) cross product becomes a work DataFrame,
``repartition`` spreads it across executors, and each partition runs the
Python introspection loop — boto3's operation model replaces Go
reflection (botocore publishes the same List-operation metadata the Go
SDK exposes via types), ``get_paginator`` replaces the NextToken loop
(unified_scanner.go:243-314), and a token bucket inside the partition
function reproduces the reference's rate-limited concurrent scan
(aws_provider.go:1033-1175).

Real boto3 clients are opt-in (``use_sdk=True`` — they need credentials
and network on every executor); by default a deterministic fake SDK
serves hash-derived pages through the same pagination protocol — every piece of Spark plumbing (work-list
partitioning, pagination, field extraction, RESOURCE_SCHEMA conformance,
rate limiting) is exercised for real; only the HTTPS call is simulated.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import StringType, StructField, StructType

from corkscrew_spark.ingest.operation_cache import OperationCache
from corkscrew_spark.schema import RESOURCE_SCHEMA

#: scan output rows = resources plus an error side-channel: a failed
#: (service, region) cell yields ONE error row (error_code set, resource
#: fields null) instead of killing the task — the reference's scan keeps
#: going and records the failure per service
#: (plugins/aws-provider/tests/failure_mode_test.go).
SCAN_RESULT_SCHEMA = StructType(
    RESOURCE_SCHEMA.fields
    + [StructField("error_code", StringType(), True),
       StructField("error_message", StringType(), True)]
)

#: ``type`` value marking an error row (never merged into resources).
SCAN_ERROR_TYPE = "Corkscrew::ScanError"

#: Shared provider fault policy (see ingest/faults.py); re-exported here
#: because the AWS scanner grew them first and pipeline.run_scan maps
#: codes to HTTP status classes through these names.
from corkscrew_spark.ingest.faults import (  # noqa: E402
    ACCESS_DENIED_CODES,
    THROTTLE_CODES,
    call_with_retry,
)

#: service → (list operation, result key, id field) — the curated subset the
#: reference hand-templates schemas for (schema_generator.go:152-418).
LIST_OPERATIONS: dict[str, tuple[str, str, str]] = {
    "s3": ("list_buckets", "Buckets", "Name"),
    "ec2": ("describe_instances", "Reservations", "InstanceId"),
    "lambda": ("list_functions", "Functions", "FunctionName"),
    "rds": ("describe_db_instances", "DBInstances", "DBInstanceIdentifier"),
    "dynamodb": ("list_tables", "TableNames", ""),
    "iam": ("list_users", "Users", "UserName"),
}

TYPE_NAMES = {
    "s3": "AWS::S3::Bucket",
    "ec2": "AWS::EC2::Instance",
    "lambda": "AWS::Lambda::Function",
    "rds": "AWS::RDS::DBInstance",
    "dynamodb": "AWS::DynamoDB::Table",
    "iam": "AWS::IAM::User",
}


def _boto3_client(service: str, region: str):
    """Real SDK client, or None when boto3 isn't importable. Only called
    on the opt-in ``use_sdk`` path — creating a client needs credentials
    and the paginate calls need network, so the default scan never tries."""
    try:
        import boto3  # noqa: PLC0415

        return boto3.client(service, region_name=region)
    except ImportError:
        return None


class _FakePaginator:
    """Deterministic page server speaking the boto3 paginator protocol."""

    def __init__(self, service: str, region: str, result_key: str, id_field: str,
                 n_items: int, page_size: int = 10):
        self._svc, self._region = service, region
        self._key, self._id = result_key, id_field
        self._n, self._page = n_items, page_size

    def paginate(self) -> Iterator[dict]:
        for start in range(0, self._n, self._page):
            items = []
            for i in range(start, min(start + self._page, self._n)):
                name = f"{self._svc}-{self._region}-{i:04d}"
                digest = hashlib.sha256(name.encode()).hexdigest()[:12]
                if not self._id:  # list_tables-style: bare string entries
                    items.append(name)
                else:
                    item = {
                        self._id: name,
                        "Arn": f"arn:aws:{self._svc}:{self._region}:111111111111:{name}",
                        "Tags": [{"Key": "env", "Value": ("prod", "dev")[i % 2]}],
                        "State": {"Name": ("running", "stopped")[i % 5 == 0]}
                        if self._svc == "ec2" else "available",
                        "Checksum": digest,
                    }
                    # realistic reference fields (the shapes the real
                    # APIs return) so relationship extraction has edges
                    # to find — same fields the reference's reflection
                    # walks (relationships.go:52-91)
                    if self._svc == "ec2":
                        item.update({
                            "VpcId": f"vpc-{digest[:8]}",
                            "SubnetId": f"subnet-{digest[:8]}",
                            "SecurityGroupIds": [f"sg-{digest[:8]}"],
                        })
                    elif self._svc == "lambda":
                        item["VpcConfig"] = {
                            "SubnetIds": [f"subnet-{digest[:8]}"]}
                    elif self._svc == "rds":
                        item["KmsKeyId"] = (
                            f"arn:aws:kms:{self._region}:111111111111:"
                            f"key/{digest}")
                    items.append(item)
            yield {self._key: items}


class _FakeClient:
    """Stands in for boto3.client when the SDK is absent: same method
    surface as the paginator path of the real scan loop."""

    def __init__(self, service: str, region: str):
        self._svc, self._region = service, region
        # deterministic per-(service, region) fleet size, 12..35
        h = int(hashlib.sha256(f"{service}|{region}".encode()).hexdigest(), 16)
        self._n = 12 + h % 24

    def get_paginator(self, op_name: str) -> _FakePaginator:
        _, key, id_field = LIST_OPERATIONS[self._svc]
        return _FakePaginator(self._svc, self._region, key, id_field, self._n)


class _TokenBucket:
    """Client-side rate limit (aws_provider.go:1033-1175): at most `rate`
    API calls per second per partition, enforced by sleeping."""

    def __init__(self, rate: float):
        self._min_gap = 1.0 / rate if rate > 0 else 0.0
        self._last = 0.0

    def take(self) -> None:
        if self._min_gap:
            now = time.monotonic()
            wait = self._last + self._min_gap - now
            if wait > 0:
                time.sleep(wait)
            self._last = time.monotonic()


def _extract(service: str, region: str, item, scanned_at: dt.datetime) -> Row:
    """Field extraction (unified_scanner.go:316-495): pull id/name/arn/tags
    out of a response struct, keep the full payload as raw_data JSON."""
    if isinstance(item, str):  # bare-name listings (dynamodb list_tables)
        item = {"Name": item}
    _, _, id_field = LIST_OPERATIONS[service]
    name = str(item.get(id_field) or item.get("Name") or item.get("Id") or "")
    arn = item.get("Arn") or f"arn:aws:{service}:{region}:111111111111:{name}"
    tags = {
        t["Key"]: t["Value"]
        for t in item.get("Tags", [])
        if isinstance(t, dict) and "Key" in t
    }
    state = item.get("State")
    if isinstance(state, dict):
        state = state.get("Name")
    return Row(
        id=arn,
        arn=arn,
        name=name,
        type=TYPE_NAMES.get(service, f"AWS::{service}::Resource"),
        service=service,
        provider="aws",
        region=region,
        account_id="111111111111",
        parent_id=None,
        tags=tags or None,
        attributes=None,
        raw_data=json.dumps(item, default=str, sort_keys=True),
        state=str(state) if state is not None else None,
        created_at=None,
        modified_at=None,
        scanned_at=scanned_at,
        error_code=None,
        error_message=None,
    )


def _error_row(service: str, region: str, scanned_at: dt.datetime,
               code: str, message: str, provider: str = "aws",
               account_id: str | None = "111111111111") -> Row:
    """One row per failed scan cell — resource fields null, error fields
    set; pipeline.run_scan routes these into api_action_metadata
    (success=false) instead of the resources table. Shared by the
    Azure/GCP sources (provider/account overridden)."""
    return Row(
        id=f"error:{service}:{region}",
        arn=None,
        name=f"{service} List failed",
        type=SCAN_ERROR_TYPE,
        service=service, provider=provider, region=region,
        account_id=account_id,
        parent_id=None, tags=None, attributes=None, raw_data=None,
        state=None, created_at=None, modified_at=None,
        scanned_at=scanned_at,
        error_code=code,
        error_message=message[:512],
    )


#: per-Python-worker operation cache (operation_cache.go:22-126) — each
#: executor worker process caches the page lists of the cells it owns, so
#: a re-scan within the TTL skips the API round-trips entirely.
_OPERATION_CACHE = OperationCache(max_size_mb=64, ttl_seconds=300.0)


def _scan_partition(rows: Iterator[Row], rate_per_sec: float,
                    scanned_at: dt.datetime, use_sdk: bool,
                    use_cache: bool = True,
                    client_factory=None,
                    max_retries: int = 3,
                    retry_base_s: float = 0.2) -> Iterator[Row]:
    bucket = _TokenBucket(rate_per_sec)
    for work in rows:
        service, region = work.service, work.region
        if service not in LIST_OPERATIONS:
            continue
        op_name, result_key, _ = LIST_OPERATIONS[service]

        def fetch_pages(service=service, region=region, op_name=op_name):
            if client_factory is not None:
                client = client_factory(service, region)
            else:
                client = (_boto3_client(service, region)
                          if use_sdk else None) or _FakeClient(service, region)
            pages = []
            for page in client.get_paginator(op_name).paginate():
                bucket.take()  # one token per API page, like the Go limiter
                pages.append(page)
            return pages

        def fetch_once():
            if use_cache and client_factory is None:
                # Injected factories bypass the cache: two distinct
                # factories can share a __qualname__ (closures from one
                # helper, functools.partial), so no cache key reliably
                # identifies them — serving one factory's pages as
                # another's would be a silent wrong-data bug. The cache
                # exists to amortize real API calls, which only the
                # sdk/fake paths make repeatedly.
                return _OPERATION_CACHE.get_or_fetch(
                    service, op_name, {"region": region, "sdk": use_sdk},
                    fetch_pages)
            return fetch_pages()

        # Failure-mode contract (unified_scanner.go error paths +
        # failure_mode_test.go): throttling retries the whole List with
        # exponential backoff; any other error — or exhausted retries —
        # records ONE error row for the cell and the scan moves on. A
        # fault never kills the task, so one denied service can't sink
        # a 1000-cell fan-out.
        pages, err = call_with_retry(fetch_once, max_retries, retry_base_s)
        if err is not None:
            yield _error_row(service, region, scanned_at, *err)
            continue
        for page in pages:
            items = page.get(result_key, [])
            if service == "ec2":  # reservations wrap instances — keep ALL of them
                items = [i for r in items for i in r.get("Instances", [r])]
            for item in items:
                yield _extract(service, region, item, scanned_at)


def scan_with_errors(spark: SparkSession, services: list[str],
                     regions: list[str], rate_per_sec: float = 50.0,
                     parallelism: int | None = None, use_sdk: bool = False,
                     scanned_at: dt.datetime | None = None,
                     client_factory=None, max_retries: int = 3,
                     retry_base_s: float = 0.2) -> DataFrame:
    """``scan`` including the error side-channel: SCAN_RESULT_SCHEMA rows
    where a failed (service, region) cell appears as one error row
    (``error_code`` set) instead of a dead task. ``pipeline.run_scan``
    splits this into the resources merge and api_action_metadata error
    accounting. Retry policy: throttling codes retry up to
    ``max_retries`` with exponential backoff from ``retry_base_s``;
    everything else records immediately."""
    work = [Row(service=s, region=r) for s in services for r in regions]
    n = parallelism or min(len(work), spark.sparkContext.defaultParallelism)
    scanned_at = scanned_at or dt.datetime.now(dt.timezone.utc)
    work_df = spark.createDataFrame(work).repartition(n)
    return spark.createDataFrame(
        work_df.rdd.mapPartitions(
            lambda it: _scan_partition(it, rate_per_sec, scanned_at, use_sdk,
                                       client_factory=client_factory,
                                       max_retries=max_retries,
                                       retry_base_s=retry_base_s)
        ),
        SCAN_RESULT_SCHEMA,
    )


def scan(spark: SparkSession, services: list[str], regions: list[str],
         rate_per_sec: float = 50.0, parallelism: int | None = None,
         use_sdk: bool = False, scanned_at: dt.datetime | None = None,
         client_factory=None) -> DataFrame:
    """BatchScan (aws_provider.go:575-677): fan (service × region) work
    items across executors, paginate each, normalize to RESOURCE_SCHEMA.

    The work list is repartitioned so each task owns a few (service,
    region) cells — at real scale the long pole is API latency, so
    parallelism should approach |services|×|regions| with the token
    bucket keeping each partition under the per-account API rate limit.

    ``use_sdk=True`` opts into real boto3 clients (needs credentials +
    network on every executor); the default serves deterministic fake
    pages through the same pagination protocol. ``client_factory`` is
    the dependency-injection seam between the two: a picklable
    ``(service, region) -> client`` callable built on each executor —
    tests use it to run REAL botocore clients wrapped in
    ``botocore.stub.Stubber`` through the whole scan loop, proving the
    paginator-protocol handling against genuine SDK response shapes
    without network.

    Failed cells are silently DROPPED from this resources-only surface
    (after the shared throttle-retry policy); callers that must account
    for failures — the pipeline does — use ``scan_with_errors``.
    """
    # Real scan start time by default, so upsert newest-wins ordering and
    # retention on scanned_at are meaningful across runs; tests pass a
    # fixed value for determinism.
    return (
        scan_with_errors(spark, services, regions, rate_per_sec,
                         parallelism, use_sdk, scanned_at, client_factory)
        .filter(F.col("error_code").isNull())
        .drop("error_code", "error_message")
    )


def describe_resources(resources: DataFrame, batch_hint: int = 64) -> DataFrame:
    """S4's Describe phase: enrich listed refs with per-resource detail
    (cmd/corkscrew/main.go:471-585 — List gives cheap refs, Describe adds
    raw_data/tags/relationships). Spark shape: mapInPandas over the
    listed rows so one Python worker amortizes a client per batch and the
    enriched frame keeps RESOURCE_SCHEMA — no join-back needed because
    enrichment is row-aligned. The fake derives detail deterministically
    from the id; with use_sdk the same loop would call Describe* APIs.
    """

    def enrich(batches):
        for pdf in batches:
            details = []
            for rid in pdf["id"]:
                digest = hashlib.sha256(str(rid).encode()).hexdigest()
                details.append(json.dumps({
                    "Description": {"Detail": digest[:16], "Encrypted": digest[0] < "8"},
                }, sort_keys=True))
            out = pdf.copy()
            base = out["raw_data"].fillna("{}")
            out["raw_data"] = [
                json.dumps({**json.loads(b), "Describe": json.loads(d)}, sort_keys=True)
                for b, d in zip(base, details)
            ]
            out["attributes"] = details
            yield out

    return resources.mapInPandas(enrich, schema=RESOURCE_SCHEMA)


# ---------------------------------------------------------------------------
# S8 — Resource Explorer search (indexed search source)
# ---------------------------------------------------------------------------

def parse_search_query(query_string: str) -> dict[str, str]:
    """`service:s3 region:us-east-1 tag:env=prod free text` → criteria
    (resource_explorer.go:77-106 builds the same SearchInput)."""
    crit: dict[str, str] = {}
    free: list[str] = []
    for tok in query_string.split():
        k, sep, v = tok.partition(":")
        if sep and k in ("service", "region", "type", "tag"):
            crit[k] = v
        else:
            free.append(tok)
    if free:
        crit["text"] = " ".join(free)
    return crit


def parse_arn(arn: str) -> dict[str, str | None]:
    """ARN → ref fields (resource_explorer.go:184-229):
    arn:partition:service:region:account:resource[/name]."""
    parts = arn.split(":", 5)
    if len(parts) < 6 or parts[0] != "arn":
        return {"service": None, "region": None, "account": None, "name": None}
    resource = parts[5]
    name = resource.rsplit("/", 1)[-1] if "/" in resource else resource
    return {"service": parts[2], "region": parts[3] or None,
            "account": parts[4] or None, "name": name}


def search(spark: SparkSession, query_string: str,
           services: list[str] | None = None,
           regions: list[str] | None = None) -> DataFrame:
    """Indexed-search source: the query string narrows WHICH cells to scan
    (source-level pushdown — Resource Explorer evaluates the query
    server-side) and the residual criteria filter the result. Output
    schema matches every other source, so `search` is a drop-in
    alternative to `scan` (SURVEY §2.1 S8: "same output schema")."""
    from pyspark.sql import functions as F

    crit = parse_search_query(query_string)
    svc = [crit["service"]] if "service" in crit else (services or sorted(LIST_OPERATIONS))
    reg = [crit["region"]] if "region" in crit else (regions or ["us-east-1"])
    df = scan(spark, svc, reg)
    if "type" in crit:
        df = df.filter(F.col("type") == crit["type"])
    if "tag" in crit:
        k, _, v = crit["tag"].partition("=")
        df = df.filter(F.col("tags")[k] == v)
    if "text" in crit:
        df = df.filter(F.col("name").contains(crit["text"]))
    return df


#: field-name → relationship type (plugins/aws-provider/relationships.go:
#: 466-494 initRelationshipPatterns). Matching is the reference's
#: case-insensitive substring test on the field name.
RELATIONSHIP_PATTERNS: tuple[tuple[str, str], ...] = (
    ("vpcid", "contained_in"),
    ("subnetid", "deployed_in"),
    ("securitygroup", "protected_by"),
    ("rolearn", "assumes"),
    ("executionrole", "assumes"),
    ("servicerole", "assumes"),
    ("targetgrouparn", "targets"),
    ("loadbalancerarn", "load_balanced_by"),
    ("clusterarn", "belongs_to"),
    ("dbname", "stores_data_in"),
    ("topicarn", "publishes_to"),
    ("queueurl", "sends_messages_to"),
    ("streamarn", "streams_to"),
    ("kmskeyid", "encrypted_with"),
    ("kmsarn", "encrypted_with"),
    ("policyarn", "governed_by"),
    ("instanceid", "runs_on"),
    ("volumeid", "uses"),
    ("networkinterface", "uses"),
    ("elasticip", "uses"),
)

#: `"Key": "value"` and `"Key": ["v1", "v2"]` pairs in a JSON blob —
#: the distributed analog of relationships.go's struct-field reflection
#: (:52-91 extractFromStruct).
_JSON_STR_PAIR_RE = r'"([A-Za-z0-9_]+)"\s*:\s*"([^"]+)"'
_JSON_LIST_PAIR_RE = r'"([A-Za-z0-9_]+)"\s*:\s*\[([^\]\[{}]*)\]'


def extract_relationships(resources: DataFrame,
                          properties_col: str = "raw_data") -> DataFrame:
    """Typed relationship edges from scanned AWS resources —
    RelationshipExtractor parity (plugins/aws-provider/relationships.go:
    30-110): reference fields inside the property blob become
    (from_id, to_id, relationship_type) edges; ``parent_id`` becomes a
    contained_in edge.

    Spark shape: one regexp pass pulls (key, value) pairs out of the
    JSON text (string values and string lists), explode, then a
    broadcast theta-join against the ~20-row pattern table on the
    reference's contains(lower(key), pattern) rule. Map-side except the
    tiny broadcast — no per-resource Python, no reflection, linear in
    blob bytes at any fleet size. Targets are kept when they look like
    resource references (ARNs or typed ids) and differ from the source.

    Returns RELATIONSHIP_SCHEMA-shaped rows.
    """
    spark = resources.sparkSession
    pat = spark.createDataFrame(
        list(RELATIONSHIP_PATTERNS), "pattern string, rel_type string")

    blob = F.coalesce(F.col(properties_col), F.lit(""))
    strings = F.arrays_zip(
        F.regexp_extract_all(blob, F.lit(_JSON_STR_PAIR_RE), F.lit(1)),
        F.regexp_extract_all(blob, F.lit(_JSON_STR_PAIR_RE), F.lit(2)),
    )
    lists = F.arrays_zip(
        F.regexp_extract_all(blob, F.lit(_JSON_LIST_PAIR_RE), F.lit(1)),
        F.regexp_extract_all(blob, F.lit(_JSON_LIST_PAIR_RE), F.lit(2)),
    )
    pairs = (
        resources.select(
            F.col("id"), F.col("type").alias("from_type"),
            F.explode(F.concat(strings, lists)).alias("kv"),
        )
        .select(
            "id", "from_type",
            F.col("kv.0").alias("key"),
            F.explode(
                F.filter(
                    F.transform(
                        F.split(F.col("kv.1"), ","),
                        lambda v: F.trim(F.translate(v, '"', "")),
                    ),
                    lambda v: v != "",
                )
            ).alias("target"),
        )
    )
    matched = pairs.join(
        F.broadcast(pat),
        F.lower(F.col("key")).contains(F.col("pattern")),
    )
    field_edges = (
        matched
        .filter(
            (F.col("target") != F.col("id"))
            & (F.col("target").startswith("arn:")
               | F.col("target").rlike(r"^[a-z]+-[0-9a-f-]+$"))
        )
        .select(
            F.col("id").alias("from_id"),
            F.col("target").alias("to_id"),
            F.col("rel_type").alias("relationship_type"),
            F.lit("aws").alias("provider"),
            F.lit(None).cast("string").alias("relationship_subtype"),
            F.to_json(F.struct(
                F.col("key").alias("source_field"))).alias("properties"),
            F.col("from_type").alias("from_resource_type"),
            F.lit(None).cast("string").alias("to_resource_type"),
            F.lit("outbound").alias("direction"),
        )
    )
    parent_edges = (
        resources.filter(F.col("parent_id").isNotNull())
        .select(
            F.col("id").alias("from_id"),
            F.col("parent_id").alias("to_id"),
            F.lit("contained_in").alias("relationship_type"),
            F.lit("aws").alias("provider"),
            F.lit(None).cast("string").alias("relationship_subtype"),
            F.to_json(F.struct(
                F.lit("parent_id").alias("source_field"))).alias("properties"),
            F.col("type").alias("from_resource_type"),
            F.lit(None).cast("string").alias("to_resource_type"),
            F.lit("outbound").alias("direction"),
        )
    )
    now = F.current_timestamp()
    return (
        field_edges.unionByName(parent_edges)
        .dropDuplicates(["from_id", "to_id", "relationship_type"])
        .withColumn("created_at", now)
        .withColumn("discovered_at", now)
    )
