"""DuckDB→Spark dialect shim: string-level unit tests + the verbatim
reference pack executing end-to-end through the executor."""

from __future__ import annotations

import pytest

from corkscrew_spark.compliance.dialect import duckdb_to_spark


def test_function_renames():
    out = duckdb_to_spark(
        "SELECT json_extract_string(d, '$.a'), json_extract(d, '$.b'), "
        "array_to_string(array_filter(xs, x -> x IS NOT NULL), ', '), "
        "unnest(split(s, ','))"
    )
    assert "get_json_object(d, '$.a')" in out
    assert "get_json_object(d, '$.b')" in out
    assert "array_join(filter(xs, x -> x IS NOT NULL), ', ')" in out
    assert "explode(split(s, ','))" in out


def test_json_object_top_level_and_nested():
    out = duckdb_to_spark("SELECT json_object('a', x, 'b', json_object('c', y))")
    assert out == "SELECT to_json(named_struct('a', x, 'b', named_struct('c', y)))"


def test_array_literal_with_tricky_contents():
    out = duckdb_to_spark(
        "SELECT ARRAY[CASE WHEN a THEN 'has ] bracket' END, 'x'] AS arr"
    )
    assert out == "SELECT array(CASE WHEN a THEN 'has ] bracket' END, 'x') AS arr"


def test_literals_and_comments_untouched():
    sql = "SELECT 'unnest(split(x))' AS s -- json_object(should stay)\nFROM t;"
    out = duckdb_to_spark(sql)
    assert "'unnest(split(x))'" in out
    assert "json_object(should stay)" in out
    assert not out.endswith(";")


def test_shared_constructs_pass_through():
    sql = "SELECT split_part(arn, '/', -1), a || b FROM t WHERE x LIKE '%y%'"
    assert duckdb_to_spark(sql) == sql


def test_unbalanced_parens_raise():
    with pytest.raises(ValueError, match="unbalanced"):
        duckdb_to_spark("SELECT json_object('a', x")


def test_translated_reference_sql_is_valid_spark(spark):
    """Each verbatim reference control query parses and analyzes in Spark
    after translation (with the fixture view + params bound)."""
    from corkscrew_spark.compliance.fixtures import TRUSTED_KEYS, register_s3_fixture
    from corkscrew_spark.compliance.pack import PackLoader
    from corkscrew_spark.catalog import register_tables
    from corkscrew_spark.engine import QueryEngine

    register_tables(spark, "/root/testdata/sf0.001")
    register_s3_fixture(spark)
    pack = PackLoader().load("cfi/ccc/ccc-storage")
    assert pack.dialect == "duckdb"
    assert len(pack.queries) == 3
    engine = QueryEngine(spark)
    params = {"trusted_kms_keys": ",".join(TRUSTED_KEYS), "retention_period_days": 90}
    for q in pack.queries:
        bound = {k: v for k, v in params.items() if f":{k}" in q.sql}
        engine.validate(duckdb_to_spark(q.sql), bound)


def test_reference_pack_end_to_end(spark):
    """The verbatim reference ccc-storage pack produces conforming
    contract rows with both PASS and FAIL per control."""
    from corkscrew_spark.compliance import ComplianceExecutor
    from corkscrew_spark.compliance.fixtures import TRUSTED_KEYS, register_s3_fixture
    from corkscrew_spark.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    register_s3_fixture(spark)
    run = ComplianceExecutor(spark).run_pack(
        "cfi/ccc/ccc-storage", {"trusted_kms_keys": TRUSTED_KEYS}
    )
    assert not run.errors
    rows = run.results.groupBy("control_id", "status").count().collect()
    got = {(r["control_id"], r["status"]) for r in rows}
    for cid in ("CCC.ObjStor.C01", "CCC.ObjStor.C02", "CCC.ObjStor.C03"):
        assert (cid, "PASS") in got and (cid, "FAIL") in got
    # metadata-filled contract columns
    one = run.results.filter("control_id = 'CCC.ObjStor.C01'").first()
    assert one["control_name"].startswith("Prevent Requests")
    assert one["resource_type"] == "aws:s3"
    assert one["resource_name"].startswith("bucket-")
