"""The five JSON helper macros, as Spark SQL functions.

Parity with the reference's DuckDB macros (pkg/query/json_helpers.go:20-105):

  extract_json(json, path)          → STRING, NULL-safe on invalid JSON
  json_path(json, path)             → raw JSON value as STRING
  has_tag(tags_json, key, value)    → BOOLEAN
  count_tags(tags_json)             → INT (0 for NULL/invalid)
  safe_json_extract(json, path, d)  → STRING with default

Registered as SQL UDFs (CREATE FUNCTION ... RETURN <expr>) so pack SQL
written against the macro names runs unmodified AND stays JVM-side —
each macro body is a builtin expression, so Catalyst inlines it into
whole-stage codegen; nothing here drops to Python.

Like the reference (json_helpers.go:108-152), registration runs a small
self-test and raises if any case misbehaves.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_MACROS: dict[str, str] = {
    # get_json_object is already NULL-safe for invalid JSON (returns NULL).
    "extract_json": (
        "CREATE OR REPLACE TEMPORARY FUNCTION extract_json(j STRING, p STRING) "
        "RETURNS STRING RETURN get_json_object(j, p)"
    ),
    "json_path": (
        "CREATE OR REPLACE TEMPORARY FUNCTION json_path(j STRING, p STRING) "
        "RETURNS STRING RETURN get_json_object(j, p)"
    ),
    "has_tag": (
        "CREATE OR REPLACE TEMPORARY FUNCTION has_tag(tags STRING, k STRING, v STRING) "
        "RETURNS BOOLEAN RETURN get_json_object(tags, concat('$.', k)) = v"
    ),
    "count_tags": (
        "CREATE OR REPLACE TEMPORARY FUNCTION count_tags(tags STRING) "
        "RETURNS INT RETURN coalesce(size(json_object_keys(tags)), 0)"
    ),
    "safe_json_extract": (
        "CREATE OR REPLACE TEMPORARY FUNCTION safe_json_extract(j STRING, p STRING, d STRING) "
        "RETURNS STRING RETURN coalesce(get_json_object(j, p), d)"
    ),
}

#: (sql, expected) — mirrors the reference's validation set.
_SELF_TEST: list[tuple[str, object]] = [
    ("SELECT extract_json('{\"a\": \"x\"}', '$.a')", "x"),
    ("SELECT extract_json('not json', '$.a')", None),
    ("SELECT json_path('{\"a\": {\"b\": 2}}', '$.a.b')", "2"),
    ("SELECT has_tag('{\"env\": \"prod\"}', 'env', 'prod')", True),
    ("SELECT has_tag('{\"env\": \"prod\"}', 'env', 'dev')", False),
    ("SELECT count_tags('{\"a\":1,\"b\":2}')", 2),
    ("SELECT count_tags('broken')", 0),
    ("SELECT safe_json_extract('broken', '$.a', 'dflt')", "dflt"),
]


def register_json_helpers(spark: SparkSession, self_test: bool = True) -> None:
    for ddl in _MACROS.values():
        spark.sql(ddl)
    if self_test:
        for sql, expected in _SELF_TEST:
            got = spark.sql(sql).collect()[0][0]
            if got != expected:
                raise RuntimeError(f"JSON helper self-test failed: {sql!r} -> {got!r}, want {expected!r}")
