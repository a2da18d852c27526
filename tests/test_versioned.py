"""Versioned tables: snapshot isolation, time travel, conflicts, vacuum."""

from __future__ import annotations

import os

import pytest

from corkscrew_spark import versioned


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


class TestVersioned:
    def test_versions_and_time_travel(self, spark, tmp_path):
        p = str(tmp_path / "t")
        v1 = versioned.write_version(_df(spark, [(1, "a")]), p, commit_ts=100.0)
        v2 = versioned.write_version(_df(spark, [(1, "b"), (2, "c")]), p,
                                     commit_ts=200.0)
        assert (v1, v2) == (1, 2)
        assert {r.v for r in versioned.read_version(spark, p).collect()} == {"b", "c"}
        assert {r.v for r in versioned.read_version(spark, p, version=1).collect()} == {"a"}
        assert {r.v for r in
                versioned.read_version(spark, p, as_of_ts=150.0).collect()} == {"a"}
        assert {r.v for r in
                versioned.read_version(spark, p, as_of_ts=250.0).collect()} == {"b", "c"}
        with pytest.raises(ValueError, match="no version at or before"):
            versioned.read_version(spark, p, as_of_ts=50.0)

    def test_history_log(self, spark, tmp_path):
        p = str(tmp_path / "t")
        versioned.write_version(_df(spark, [(1, "a")]), p)
        versioned.upsert_version(spark, p, _df(spark, [(1, "z")]), ["k"],
                                 order_col="v")
        h = versioned.history(p)
        assert [e["op"] for e in h] == ["overwrite", "upsert"]
        assert [e["version"] for e in h] == [1, 2]
        assert h[0]["rows"] == 1

    def test_upsert_merges_by_key(self, spark, tmp_path):
        p = str(tmp_path / "t")
        versioned.write_version(_df(spark, [(1, "a"), (2, "b")]), p)
        versioned.upsert_version(spark, p, _df(spark, [(2, "z2"), (3, "c")]),
                                 ["k"], order_col="v")
        got = {r.k: r.v for r in versioned.read_version(spark, p).collect()}
        assert got == {1: "a", 2: "z2", 3: "c"}
        # old snapshot still intact (readers keep their version)
        old = {r.k for r in versioned.read_version(spark, p, version=1).collect()}
        assert old == {1, 2}

    def test_concurrent_writer_conflict(self, spark, tmp_path):
        p = str(tmp_path / "t")
        versioned.write_version(_df(spark, [(1, "a")]), p)
        # a racing writer claimed v=2 first
        os.mkdir(os.path.join(p, "v=2"))
        with pytest.raises(versioned.VersionConflict):
            versioned.write_version(_df(spark, [(9, "x")]), p)

    def test_vacuum_keeps_manifest_lineage(self, spark, tmp_path):
        p = str(tmp_path / "t")
        for i in range(4):
            versioned.write_version(_df(spark, [(i, str(i))]), p)
        dropped = versioned.vacuum(p, keep_last=2)
        assert dropped == [1, 2]
        assert len(versioned.history(p)) == 4  # lineage survives
        with pytest.raises(ValueError, match="vacuumed"):
            versioned.read_version(spark, p, version=1)
        assert versioned.read_version(spark, p, version=4).count() == 1


class TestEngineTimeTravel:
    def test_version_as_of_clause(self, spark, tmp_path):
        from corkscrew_spark import versioned
        from corkscrew_spark.engine import QueryEngine

        path = str(tmp_path / "vt")
        versioned.write_version(
            spark.createDataFrame([(1, "a")], "id long, v string"), path)
        versioned.write_version(
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            path)
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_versioned("items", path)
        # latest view
        assert eng.execute("SELECT COUNT(*) AS n FROM items").rows()[0].n == 2
        # explicit version travel
        r = eng.execute(
            "SELECT COUNT(*) AS n FROM items VERSION AS OF 1").rows()
        assert r[0].n == 1
        # timestamp travel: as-of far future resolves to latest
        r = eng.execute(
            "SELECT COUNT(*) AS n FROM items TIMESTAMP AS OF '2099-01-01'"
        ).rows()
        assert r[0].n == 2

    def test_unregistered_table_clause_untouched(self, spark, tmp_path):
        from corkscrew_spark.engine import QueryEngine, QueryValidationError
        import pytest as _pytest

        eng = QueryEngine(spark, register_helpers=False)
        with _pytest.raises(QueryValidationError):
            eng.execute("SELECT * FROM nosuch VERSION AS OF 1")

    def test_clause_inside_literal_or_comment_not_rewritten(self, spark, tmp_path):
        """`items VERSION AS OF 1` inside a string literal or comment is
        data/prose, not a time-travel clause — it must survive verbatim
        (regression: the rewrite was literal-blind)."""
        from corkscrew_spark import versioned
        from corkscrew_spark.engine import QueryEngine

        path = str(tmp_path / "lit")
        versioned.write_version(
            spark.createDataFrame([(1, "a")], "id long, v string"), path)
        versioned.write_version(
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            path)
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_versioned("items", path)
        r = eng.execute(
            "SELECT 'items VERSION AS OF 1' AS s, COUNT(*) AS n "
            "FROM items -- items VERSION AS OF 1\nGROUP BY s").rows()
        assert r[0].s == "items VERSION AS OF 1" and r[0].n == 2

    def test_rejected_query_registers_no_views(self, spark, tmp_path):
        """validate_readonly runs BEFORE the time-travel rewrite: a
        denied statement must not register `name__v<N>` views as a side
        effect."""
        from corkscrew_spark import versioned
        from corkscrew_spark.engine import QueryEngine, QueryValidationError
        import pytest as _pytest

        path = str(tmp_path / "gate")
        versioned.write_version(
            spark.createDataFrame([(1,)], "id long"), path)
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_versioned("gated", path)
        with _pytest.raises(QueryValidationError):
            eng.execute("DELETE FROM gated VERSION AS OF 1")
        assert not spark.catalog.tableExists("gated__v1")
