"""Upsert-by-key and retention sinks over plain parquet."""

from __future__ import annotations

import datetime as dt

from corkscrew_spark import warehouse


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, val string, scanned_at timestamp")


def test_merge_upsert_insert_then_update(spark, tmp_path):
    path = str(tmp_path / "resources")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    n = warehouse.merge_upsert(spark, path, _df(spark, [("a", "v1", t0), ("b", "v1", t0)]), ["id"])
    assert n == 2
    # update a, insert c; b untouched
    n = warehouse.merge_upsert(spark, path, _df(spark, [("a", "v2", t1), ("c", "v1", t1)]), ["id"])
    assert n == 3
    got = {r.id: r.val for r in spark.read.parquet(path).collect()}
    assert got == {"a": "v2", "b": "v1", "c": "v1"}


def test_merge_upsert_tie_prefers_update(spark, tmp_path):
    path = str(tmp_path / "t")
    t0 = dt.datetime(2024, 1, 1)
    warehouse.merge_upsert(spark, path, _df(spark, [("a", "old", t0)]), ["id"])
    warehouse.merge_upsert(spark, path, _df(spark, [("a", "new", t0)]), ["id"])
    assert spark.read.parquet(path).collect()[0].val == "new"


def test_retention_delete(spark, tmp_path):
    path = str(tmp_path / "events")
    rows = [(f"e{i}", "x", dt.datetime(2024, 1, 1 + i)) for i in range(10)]
    warehouse.merge_upsert(spark, path, _df(spark, rows), ["id"])
    kept = warehouse.retention_delete(spark, path, "scanned_at", "2024-01-06")
    assert kept == 5
    assert spark.read.parquet(path).count() == 5
