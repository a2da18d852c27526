"""Core table schemas — the universal resource model as Spark StructTypes.

Parity map (SURVEY.md §1): unified resource tables
(internal/db/unified_schema.go:93-220), relationship edges (:223-272),
scan metadata (:275-336), API telemetry (:339-414), change events
(plugins/aws-provider/change_storage.go:44-64), drift baselines (:67-79),
and the compliance output contract
(pkg/query/compliance/executor.go:371-394).

Type conventions: tags is a flat string map in the reference proto →
MapType(String,String); nested JSON blobs stay JSON-encoded strings
queried with get_json_object (columnar-friendly, schema-on-read).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


S = StringType()
I = IntegerType()
L = LongType()
B = BooleanType()
TS = TimestampType()
TAGS = MapType(StringType(), StringType())

#: aws_resources (unified_schema.go:93-145)
RESOURCE_SCHEMA = StructType([
    _f("id", S, False),
    _f("arn", S),
    _f("name", S, False),
    _f("type", S, False),
    _f("service", S),
    _f("provider", S),
    _f("region", S),
    _f("account_id", S),
    _f("parent_id", S),
    _f("tags", TAGS),
    _f("attributes", S),   # JSON string
    _f("raw_data", S),     # JSON string
    _f("state", S),
    _f("created_at", TS),
    _f("modified_at", TS),
    _f("scanned_at", TS),
])

#: cloud_relationships (unified_schema.go:223-272)
RELATIONSHIP_SCHEMA = StructType([
    _f("from_id", S, False),
    _f("to_id", S, False),
    _f("relationship_type", S, False),
    _f("provider", S, False),
    _f("relationship_subtype", S),
    _f("properties", S),   # JSON string
    _f("from_resource_type", S),
    _f("to_resource_type", S),
    _f("direction", S),
    _f("created_at", TS),
    _f("discovered_at", TS),
])

#: scan_metadata (unified_schema.go:275-336)
SCAN_METADATA_SCHEMA = StructType([
    _f("id", S, False),
    _f("provider", S, False),
    _f("scan_type", S),
    _f("services", S),     # JSON list
    _f("regions", S),      # JSON list
    _f("accounts", S),     # JSON list
    _f("total_resources", I),
    _f("new_resources", I),
    _f("updated_resources", I),
    _f("deleted_resources", I),
    _f("failed_resources", I),
    _f("scan_start_time", TS, False),
    _f("scan_end_time", TS),
    _f("duration_ms", L),
    _f("initiated_by", S),
    _f("scan_reason", S),
    _f("error_messages", S),
    _f("warnings", S),
    _f("metadata", S),
    _f("status", S),
])

#: api_action_metadata (unified_schema.go:339-414), telemetry columns only
API_ACTION_SCHEMA = StructType([
    _f("id", S, False),
    _f("provider", S, False),
    _f("correlation_id", S),
    _f("service", S, False),
    _f("operation_name", S, False),
    _f("operation_type", S),
    _f("execution_time", TS, False),
    _f("region", S),
    _f("account_id", S),
    _f("success", B, False),
    _f("status_code", I),
    _f("duration_ms", L),
    _f("resource_count", I),
    _f("error_code", S),
    _f("error_message", S),
    _f("rate_limit_remaining", I),
    _f("request_charge", DoubleType()),
    _f("created_at", TS),
])

CHANGE_TYPES = ("CREATE", "UPDATE", "DELETE", "POLICY_CHANGE", "TAG_CHANGE", "STATE_CHANGE")
SEVERITIES = ("LOW", "MEDIUM", "HIGH", "CRITICAL")

#: change_events (change_storage.go:44-64)
CHANGE_EVENT_SCHEMA = StructType([
    _f("id", S, False),
    _f("provider", S),
    _f("resource_id", S, False),
    _f("resource_name", S),
    _f("resource_type", S),
    _f("service", S),
    _f("project", S),
    _f("region", S),
    _f("change_type", S, False),
    _f("severity", S),
    _f("timestamp", TS, False),
    _f("detected_at", TS),
    _f("previous_state", S),   # JSON ResourceState
    _f("current_state", S),    # JSON ResourceState
    _f("changed_fields", S),   # JSON string array
    _f("change_metadata", S),
])

#: drift_baselines (change_storage.go:67-79) — resources snapshot is held
#: relationally (baseline_resources) instead of one giant JSON map: at
#: 100 TB a per-baseline JSON blob cannot be diffed distributed.
DRIFT_BASELINE_SCHEMA = StructType([
    _f("id", S, False),
    _f("name", S, False),
    _f("description", S),
    _f("provider", S, False),
    _f("created_at", TS, False),
    _f("version", S),
    _f("active", B),
])

BASELINE_RESOURCE_SCHEMA = StructType([
    _f("baseline_id", S, False),
    _f("resource_id", S, False),
    _f("resource_type", S),
    _f("properties", S),   # JSON string map
    _f("tags", TAGS),
    _f("status", S),
    _f("checksum", S),
])

COMPLIANCE_STATUSES = ("PASS", "FAIL", "WARNING", "ERROR")
COMPLIANCE_SEVERITIES = ("CRITICAL", "HIGH", "MEDIUM", "LOW", "INFO")

#: compliance result contract (executor.go:371-394,490-567)
COMPLIANCE_RESULT_SCHEMA = StructType([
    _f("resource_id", S, False),
    _f("resource_name", S),
    _f("resource_type", S),
    _f("control_id", S, False),
    _f("control_name", S),
    _f("status", S, False),
    _f("severity", S),
    _f("details", S),
    _f("region", S),
    _f("remediation", S),
])

CORE_TABLES = {
    "resources": RESOURCE_SCHEMA,
    "relationships": RELATIONSHIP_SCHEMA,
    "scan_metadata": SCAN_METADATA_SCHEMA,
    "api_action_metadata": API_ACTION_SCHEMA,
    "change_events": CHANGE_EVENT_SCHEMA,
    "drift_baselines": DRIFT_BASELINE_SCHEMA,
    "baseline_resources": BASELINE_RESOURCE_SCHEMA,
}


# ---------------------------------------------------------------------------
# Dialect DDL rendering (cmd/corkscrew/main.go:715-793 printSchemaSQL /
# getSQLType parity): render the core tables as CREATE TABLE statements
# for duckdb (default), postgres, or sqlite.
# ---------------------------------------------------------------------------

#: Spark type → proto-ish type key, mirroring what the reference's plugin
#: schemas carry (unified_schema.go column types).
_TYPE_KEY = {
    "string": "string",
    "int": "int32",
    "bigint": "int64",
    "float": "float",
    "double": "double",
    "boolean": "bool",
    "timestamp": "timestamp",
}

_DIALECT_TYPES = {
    "postgres": {
        "string": "TEXT", "int32": "BIGINT", "int64": "BIGINT",
        "float": "DOUBLE PRECISION", "double": "DOUBLE PRECISION",
        "bool": "BOOLEAN", "timestamp": "TIMESTAMP", "json": "JSONB",
        "default": "TEXT",
    },
    "sqlite": {
        "string": "TEXT", "int32": "INTEGER", "int64": "INTEGER",
        "float": "REAL", "double": "REAL",
        "bool": "INTEGER", "timestamp": "TEXT", "json": "TEXT",
        "default": "TEXT",
    },
    "duckdb": {
        "string": "VARCHAR", "int32": "INTEGER", "int64": "BIGINT",
        "float": "FLOAT", "double": "DOUBLE",
        "bool": "BOOLEAN", "timestamp": "TIMESTAMP", "json": "JSON",
        "default": "VARCHAR",
    },
}

#: columns the reference stores as JSON blobs (schema-on-read strings on
#: the Spark side) — rendered with the dialect's JSON type.
_JSON_COLUMNS = {"attributes", "raw_data", "tags", "properties", "details",
                 "metadata", "labels", "annotations"}


def sql_type(field, dialect: str = "duckdb") -> str:
    """Dialect SQL type for one StructField (getSQLType parity)."""
    types = _DIALECT_TYPES.get(dialect, _DIALECT_TYPES["duckdb"])
    simple = field.dataType.simpleString()
    if field.name in _JSON_COLUMNS or simple.startswith("map"):
        return types["json"]
    return types.get(_TYPE_KEY.get(simple, "default"), types["default"])


def table_ddl(name: str, schema: StructType, dialect: str = "duckdb") -> str:
    """CREATE TABLE statement for one core table in the given dialect."""
    cols = [
        f"  {f.name} {sql_type(f, dialect)}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    ]
    return f"CREATE TABLE IF NOT EXISTS {name} (\n" + ",\n".join(cols) + "\n);"


def schemas_json() -> list[dict]:
    """JSON-friendly schema listing (--output json parity)."""
    return [
        {
            "table": name,
            "columns": [
                {
                    "name": f.name,
                    "type": f.dataType.simpleString(),
                    "nullable": f.nullable,
                }
                for f in schema.fields
            ],
        }
        for name, schema in CORE_TABLES.items()
    ]


# ---------------------------------------------------------------------------
# Sampled property-schema inference (Azure resource_graph.go parity)
# ---------------------------------------------------------------------------

#: mixed-type resolution priority (resource_graph.go:935-970
#: inferPropertyType): containers beat scalars, string beats numerics.
_INFER_PRIORITY = ("object", "array", "string", "number", "integer",
                   "boolean", "unknown")


def _walk_json(value, prefix: str, seen: dict) -> None:
    """Dotted-path recursive type walk (analyzeProperties parity,
    resource_graph.go:893-930): every nested object contributes both an
    'object' entry for its own path and entries for its children."""
    for key, val in value.items():
        path = f"{prefix}.{key}" if prefix else key
        types = seen.setdefault(path, set())
        if isinstance(val, bool):      # bool before int: bool is an int in Python
            types.add("boolean")
        elif isinstance(val, str):
            types.add("string")
        elif isinstance(val, int):
            types.add("integer")
        elif isinstance(val, float):
            types.add("number")
        elif isinstance(val, dict):
            types.add("object")
            _walk_json(val, path, seen)
        elif isinstance(val, list):
            types.add("array")
        else:
            types.add("unknown")


def infer_resource_schema(df, resource_type: str, sample_n: int = 10,
                          properties_col: str = "attributes",
                          type_col: str = "type") -> dict:
    """Discover a resource type's property schema from ``sample_n`` live
    rows — DiscoverResourceSchema parity (plugins/azure-provider/
    resource_graph.go:112-127 samples 10 resources, extractSchemaFromSamples
    at :850-907 walks the property JSON into dotted-path PropertyDefs).

    The sample fetch is the distributed part (filter + LIMIT push into
    the scan); the walk runs driver-side over <= sample_n parsed blobs —
    bounded work by construction, the same design point as the
    reference. ``required`` means present in every sampled resource
    (the reference *intends* this; its ``len(types) == len(samples)``
    comparison at :900 actually counts distinct types — reproduced
    faithfully in spirit, not in bug).

    Returns {resource_type, sample_count, locations, common_tags,
    properties: {path: {name, type, required, examples}}}.
    """
    import json as _json

    from pyspark.sql import functions as F  # local: schema.py stays import-light

    rows = (
        df.filter(F.col(type_col) == resource_type)
        .select("region", "tags", properties_col)
        .limit(sample_n)
        .collect()
    )
    locations: set[str] = set()
    tag_keys: set[str] = set()
    # path -> (types, presence) where presence counts samples containing it
    path_types: dict[str, set] = {}
    path_presence: dict[str, int] = {}
    for row in rows:
        if row.region:
            locations.add(row.region)
        if row.tags:
            tag_keys.update(row.tags.keys())
        blob = row[properties_col]
        if not blob:
            continue
        try:
            parsed = _json.loads(blob)
        except (TypeError, ValueError):
            continue
        if not isinstance(parsed, dict):
            continue
        seen: dict = {}
        _walk_json(parsed, "", seen)
        for path, types in seen.items():
            path_types.setdefault(path, set()).update(types)
            path_presence[path] = path_presence.get(path, 0) + 1

    def _resolve(types: set) -> str:
        for t in _INFER_PRIORITY:
            if t in types:
                return t
        return "unknown"

    return {
        "resource_type": resource_type,
        "sample_count": len(rows),
        "locations": sorted(locations),
        "common_tags": sorted(tag_keys),
        "properties": {
            path: {
                "name": path,
                "type": _resolve(types),
                "required": bool(rows) and path_presence.get(path, 0) == len(rows),
                "examples": [],
            }
            for path, types in sorted(path_types.items())
        },
    }


def shred_json(df, json_col: str, sample_n: int = 100,
               prefix: str = "", drop_source: bool = True):
    """Schema-on-read → columnar: infer a typed StructType for a JSON
    string column from a bounded sample, then parse the WHOLE column
    once with ``from_json`` and star-expand the struct into top-level
    columns (``prefix`` guards collisions).

    This is the shredding step that turns the reference's JSON-blob
    columns (attributes / raw_data / properties) into pruned, pushed-
    down columnar reads: after shredding, a query touching two fields
    scans two Parquet columns instead of re-parsing every blob per
    predicate. Inference cost is bounded (``limit(sample_n)`` sampled
    through Spark's JSON schema inference); the shred itself is map-only
    whole-stage codegen at any scale. Fields absent from the sample
    parse as NULL (schema-on-read semantics preserved).
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    sample = [r[0] for r in df.select(json_col).dropna()
              .limit(sample_n).collect()]
    if not sample:
        # No shredded columns to add, but honor drop_source so the
        # output schema doesn't depend on whether the sample was empty.
        return df.drop(json_col) if drop_source else df
    inferred = spark.read.json(
        spark.sparkContext.parallelize(sample, 1)).schema
    bad = [f.name for f in inferred.fields
           if f.name.startswith("_corrupt_record")]
    fields = [f.name for f in inferred.fields if f.name not in bad]
    parsed = df.withColumn("__shred", F.from_json(F.col(json_col), inferred))
    out = parsed.select(
        "*",
        *[F.col(f"__shred.{name}").alias(f"{prefix}{name}")
          for name in fields],
    ).drop("__shred")
    return out.drop(json_col) if drop_source else out
