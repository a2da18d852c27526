"""Engine surface tests: read-only gate, param binding, macros, formatters."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from corkscrew_spark import formatter
from corkscrew_spark.catalog import register_tables
from corkscrew_spark.engine import (
    QueryEngine,
    QueryValidationError,
    bind_params,
    quote_literal,
)
from corkscrew_spark.functions.json_helpers import register_json_helpers


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    register_tables(spark, sf_dir)
    return QueryEngine(spark)


# --- read-only gate -------------------------------------------------------

@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE region",
        "DELETE FROM region",
        "UPDATE region SET r_name = 'x'",
        "INSERT INTO region VALUES (9, 'x')",
        "CREATE TABLE t (a INT)",
        "TRUNCATE TABLE region",
        "SELECT * FROM region; DROP TABLE region",
        "/* sneaky */ DROP TABLE region",
    ],
)
def test_gate_denies_mutations(engine, bad):
    with pytest.raises(QueryValidationError):
        engine.validate(bad)


def test_gate_allows_select_and_cte(engine):
    assert engine.validate("SELECT 1 AS one")
    assert engine.validate("WITH t AS (SELECT 1 AS a) SELECT * FROM t")


def test_unknown_table_suggestion(engine):
    with pytest.raises(QueryValidationError, match="Did you mean.*region"):
        engine.validate("SELECT * FROM regionn")


# --- parameter binding ----------------------------------------------------

def test_quote_literal_escapes():
    assert quote_literal("O'Brien") == "'O\\'Brien'"
    assert quote_literal(None) == "NULL"
    assert quote_literal([1, 2]) == "(1, 2)"
    assert quote_literal([]) == "(NULL)"
    assert quote_literal(True) == "TRUE"


def test_bind_params_in_list_both_styles():
    sql = "SELECT * FROM t WHERE a IN (:ids) AND b IN :ids AND c = :name"
    out = bind_params(sql, {"ids": [1, 2], "name": "x'y"})
    assert out == "SELECT * FROM t WHERE a IN (1, 2) AND b IN (1, 2) AND c = 'x\\'y'"


def test_bind_params_missing_raises():
    with pytest.raises(QueryValidationError, match="missing parameter"):
        bind_params("SELECT :nope", {})


def test_bind_params_double_quoted_strings_opaque():
    """Spark's default lexer treats double-quoted text as a STRING
    literal: params inside must not substitute, literal content must
    not trip the read-only gate, and IN((..)) text inside any literal
    must come back byte-identical (r9 review findings)."""
    from corkscrew_spark.engine import validate_readonly

    out = bind_params('SELECT "cost is :amt" AS note FROM t', {"amt": 5})
    assert '"cost is :amt"' in out
    out = bind_params("SELECT 'IN ((a))' AS s, \"IN ((b))\" AS w FROM t",
                      None)
    assert "'IN ((a))'" in out and '"IN ((b))"' in out
    validate_readonly('SELECT "DROP zone" AS z FROM t')  # must not raise
    # user-written struct constructor stays intact (the old whole-text
    # normalization rewrote it to a two-element array)
    assert bind_params("SELECT array((1,2)) FROM t", None) == \
        "SELECT array((1,2)) FROM t"


def test_bind_params_not_in_empty_list_refused():
    with pytest.raises(QueryValidationError, match="NOT IN"):
        bind_params("SELECT * FROM t WHERE x NOT IN (:ids)", {"ids": []})
    # plain IN with an empty list stays the matches-nothing literal
    out = bind_params("SELECT * FROM t WHERE x IN (:ids)", {"ids": []})
    assert "IN ((NULL))" in out or "IN (NULL)" in out


def test_quote_literal_nonfinite_float_refused():
    with pytest.raises(QueryValidationError, match="non-finite"):
        quote_literal(float("inf"))
    with pytest.raises(QueryValidationError, match="non-finite"):
        quote_literal(float("nan"))


def test_injection_attempt_binds_as_inert_literal(engine):
    # A malicious param value arrives as a single quoted literal: the
    # quote is escaped so the statement stays ONE read-only SELECT, the
    # keyword scan sees only blanked-literal text, and execution simply
    # matches no rows. The table survives.
    res = engine.execute(
        "SELECT * FROM region WHERE r_name = :n",
        {"n": "x'; DROP TABLE region; --"},
    )
    assert res.rows() == []
    assert engine.spark.table("region").count() > 0


# --- execution + stats ----------------------------------------------------

def test_execute_roundtrip(engine):
    res = engine.execute(
        "SELECT r_name FROM region WHERE r_regionkey = :k", {"k": 0}
    )
    assert res.columns == ["r_name"]
    assert len(res.rows()) == 1
    assert res.duration_s >= 0


def test_execute_stream_iterates(engine):
    it = engine.execute_stream("SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    assert [r["n_nationkey"] for r in it][:3] == [0, 1, 2]


# --- JSON macros ----------------------------------------------------------

def test_json_macros_self_test(spark):
    register_json_helpers(spark, self_test=True)  # raises on any mismatch


def test_macros_inline_in_sql(engine):
    row = engine.execute(
        "SELECT count_tags('{\"a\":1,\"b\":2}') AS n, "
        "safe_json_extract('nope', '$.x', 'fallback') AS s"
    ).rows()[0]
    assert row["n"] == 2 and row["s"] == "fallback"


# --- formatters -----------------------------------------------------------

def test_formatters(engine):
    df = engine.execute(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 2"
    ).df
    table = formatter.format_table(df)
    assert "r_name" in table and table.count("\n") >= 5 and "(2 rows)" in table
    csv_text = formatter.format_csv(df)
    assert csv_text.splitlines()[0] == "r_regionkey,r_name"
    data = json.loads(formatter.format_json(df))
    assert len(data) == 2 and set(data[0]) == {"r_regionkey", "r_name"}


def test_readonly_gate_ignores_literals(engine):
    """Keywords inside string literals (prose, LIKE patterns) must not
    trip the gate; real mutating statements still must."""
    import pytest

    from corkscrew_spark.engine import QueryValidationError, validate_readonly

    validate_readonly("SELECT 'Set an env tag' AS remediation")
    validate_readonly("SELECT * FROM t WHERE policy LIKE '%s3:DeleteBucket%'")
    validate_readonly("SELECT 'DROP TABLE users' AS phrase")
    with pytest.raises(QueryValidationError):
        validate_readonly("DELETE FROM t WHERE x = 'harmless'")
    with pytest.raises(QueryValidationError):
        validate_readonly("SELECT 1; DROP TABLE t")


def test_readonly_gate_comment_opener_inside_literal_cannot_hide_dml():
    """A `--` or `/*` inside a quoted literal must not start a comment:
    literal-blind comment stripping would swallow the rest of the
    statement and hide DML from the keyword scan (e.g. CTE-prefixed
    INSERT, which Spark accepts — an arbitrary write through the
    'read-only' gate)."""
    import pytest

    from corkscrew_spark.engine import QueryValidationError, validate_readonly

    with pytest.raises(QueryValidationError, match="INSERT"):
        validate_readonly("WITH a AS (SELECT '--') INSERT INTO t SELECT * FROM a")
    with pytest.raises(QueryValidationError, match="INSERT"):
        validate_readonly(
            "WITH a AS (SELECT '/*') INSERT OVERWRITE DIRECTORY '/tmp/x' SELECT * FROM a"
        )
    with pytest.raises(QueryValidationError, match="DROP"):
        validate_readonly("SELECT '--'; DROP TABLE t")
    # comment-opener-in-literal in a legitimately read-only query stays fine
    validate_readonly("SELECT '--' AS dashes, '/* not a comment */' AS c")
    validate_readonly("SELECT 1 -- a real trailing comment\n")
    validate_readonly("/* leading comment */ SELECT 1")


def test_register_tables_repoints_views_across_sf_dirs(spark):
    """Views are session-global; switching sf_dirs and back must re-point
    them (regression: a cached registration left views aimed at the last
    sf_dir, so engine-SQL consumers silently read the wrong scale)."""
    from corkscrew_spark.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    n_small = spark.sql("select count(*) n from orders").collect()[0].n
    register_tables(spark, "/root/testdata/sf0.01")
    n_big = spark.sql("select count(*) n from orders").collect()[0].n
    assert n_big > n_small
    register_tables(spark, "/root/testdata/sf0.001")  # cached path
    assert spark.sql("select count(*) n from orders").collect()[0].n == n_small


def test_register_tables_partial_cache_repoints_views(spark):
    """The loop path (requested tables ⊄ cached set) must also re-point
    memoized views — regression: only the fully-cached branch applied
    the _ACTIVE_VIEW check, so a superset registration after switching
    sf_dirs silently kept views on the other scale."""
    from corkscrew_spark.catalog import register_tables

    register_tables(spark, "/root/testdata/sf0.001", tables=("orders",))
    n_small = spark.sql("select count(*) n from orders").collect()[0].n
    register_tables(spark, "/root/testdata/sf0.01")
    assert spark.sql("select count(*) n from orders").collect()[0].n > n_small
    # superset of sf0.001's cached {orders} -> takes the loop path
    register_tables(spark, "/root/testdata/sf0.001",
                    tables=("orders", "customer"))
    assert spark.sql("select count(*) n from orders").collect()[0].n == n_small
    # restore full registrations for neighbouring tests
    register_tables(spark, "/root/testdata/sf0.001")


class TestWarehouseSkipping:
    """register_warehouse wires zone-map data skipping into the SQL
    surface: single-table conjunctive WHEREs read through
    skipping.read_skipping, everything else (and every failure mode)
    falls back to the plain view — result identity is structural."""

    @pytest.fixture()
    def table(self, spark, tmp_path):
        from corkscrew_spark import skipping

        path = str(tmp_path / "tbl")
        df = spark.range(800).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
            F.concat(F.lit("s"), (F.col("id") % 13).cast("string")
                     ).alias("s"))
        df.repartitionByRange(8, "k").write.parquet(path)
        skipping.compute_stats(spark, path, ["k"])
        return path

    def _files_opened(self, eng, sql):
        return eng.execute(sql.replace(
            "SELECT *", "SELECT DISTINCT input_file_name() AS f",
            1)).df.count()

    def test_pruned_sql_equals_plain_and_opens_fewer_files(
            self, spark, table):
        from corkscrew_spark.engine import QueryEngine

        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("wtbl", table)
        sql = "SELECT * FROM wtbl WHERE k >= 700 ORDER BY k"
        got = [tuple(r) for r in eng.execute(sql).rows()]
        plain = [tuple(r) for r in spark.read.parquet(table)
                 .filter("k >= 700").orderBy("k").collect()]
        assert got == plain and len(got) == 100
        assert self._files_opened(
            eng, "SELECT * FROM wtbl WHERE k >= 700") <= 2  # of 8 files
        # the view is restored: a predicate-free query sees every row
        assert eng.execute("SELECT COUNT(*) AS n FROM wtbl"
                           ).rows()[0].n == 800

    def test_unprunable_shapes_fall_back_to_plain_view(
            self, spark, table):
        from corkscrew_spark.engine import QueryEngine

        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("wtbl", table)
        for sql in (
            "SELECT * FROM wtbl WHERE k >= 700 OR v = 1",
            "SELECT * FROM wtbl w1, wtbl w2 WHERE w1.k = w2.k AND w1.k >= 790",
            "SELECT * FROM wtbl WHERE k + 0 >= 700",
        ):
            got = eng.execute(sql).df.count()
            n = spark.sql(sql.replace(
                "wtbl", f"parquet.`{table}`")).count()
            assert got == n, sql

    def test_alias_and_mixed_conjuncts_prune_on_parsable_subset(
            self, spark, table):
        from corkscrew_spark.engine import QueryEngine

        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("wtbl", table)
        sql = ("SELECT w.k, w.v FROM wtbl w "
               "WHERE w.k BETWEEN 750 AND 760 AND upper(w.s) LIKE 'S%' "
               "ORDER BY w.k")
        got = [r.k for r in eng.execute(sql).rows()]
        assert got == list(range(750, 761))
        assert self._files_opened(
            eng, "SELECT * FROM wtbl w WHERE w.k BETWEEN 750 AND 760 "
                 "AND upper(w.s) LIKE 'S%'") <= 2

    def test_case_plus_range_prunes_on_the_clean_conjunct(
            self, spark, table):
        """Round-7 retention: a WHERE mixing a CASE expression with
        clean top-level conjuncts keeps pruning on the clean ones
        (the round-6 fix stood down wholesale), and the f5057ad
        wrong-rows repro shape still extracts nothing."""
        from corkscrew_spark.engine import QueryEngine

        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("wtbl", table)
        sql = ("SELECT k, v FROM wtbl WHERE k >= 700 AND "
               "CASE WHEN v = 1 AND s = 's1' OR v = 2 THEN 1 ELSE 0 "
               "END = 1 ORDER BY k")
        got = [tuple(r) for r in eng.execute(sql).rows()]
        plain = [tuple(r) for r in spark.sql(
            sql.replace("wtbl", f"parquet.`{table}`")).collect()]
        assert got == plain and len(got) > 0
        exec_sql, views = eng._skipping_rewrite(sql)
        assert views  # the k >= 700 conjunct survived the CASE
        for v in views:
            spark.catalog.dropTempView(v)
        # CASE-only WHERE (the f5057ad repro shape): no rewrite, and
        # the engine result equals the plain scan
        bad = ("SELECT k FROM wtbl WHERE CASE WHEN v = 1 AND s = 's0' "
               "OR v = 2 AND k = 3 THEN 1 ELSE 0 END = 0")
        assert eng._skipping_rewrite(bad) == (bad, [])
        assert eng.execute(bad).df.count() == spark.sql(
            bad.replace("wtbl", f"parquet.`{table}`")).count()

    def test_env_flag_disables_skipping(self, spark, table, monkeypatch):
        from corkscrew_spark.engine import QueryEngine

        monkeypatch.setenv("CORKSCREW_DATA_SKIPPING", "0")
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("wtbl", table)
        sql = "SELECT * FROM wtbl WHERE k >= 700"
        assert eng._skipping_rewrite(sql) == (sql, [])
        assert eng.execute(sql).df.count() == 100

    def test_execute_stream_prunes_and_restores(self, spark, table):
        from corkscrew_spark.engine import QueryEngine

        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("wtbl", table)
        rows = list(eng.execute_stream(
            "SELECT k FROM wtbl WHERE k >= 795 ORDER BY k"))
        assert [r.k for r in rows] == list(range(795, 800))
        assert eng.execute("SELECT COUNT(*) AS n FROM wtbl"
                           ).rows()[0].n == 800


class TestCteSkipping:
    """WITH statements prune per segment: each CTE body and the final
    query run the extraction on their own text (the reference's
    compliance-pack shape — DuckDB prunes inside CTE bodies)."""

    @pytest.fixture()
    def table(self, spark, tmp_path):
        from corkscrew_spark import skipping

        path = str(tmp_path / "tbl")
        spark.range(800).selectExpr("id AS k", "id % 10 AS d"
                                    ).repartitionByRange(
            8, "k").write.parquet(path)
        skipping.compute_stats(spark, path, ["k"])
        return path

    def test_cte_body_prunes_and_result_identical(self, spark, table):
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("ctbl", table)
        sql = ("WITH hot AS (SELECT k, d FROM ctbl WHERE k >= 700) "
               "SELECT d, COUNT(*) AS n FROM hot GROUP BY d ORDER BY d")
        res = eng.execute(sql)
        plain = spark.sql(sql.replace("ctbl", f"parquet.`{table}`"))
        assert sorted(map(tuple, res.df.collect())) \
            == sorted(map(tuple, plain.collect()))
        opened = [f for f in res.df.inputFiles() if "tbl" in f]
        assert 0 < len(opened) < 8  # the CTE body's scan was pruned

    def test_two_segments_prune_independently(self, spark, table):
        """Two CTE bodies read the SAME table under DIFFERENT
        predicates — each gets its own pruned view (impossible under
        the old one-view-per-table repoint)."""
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("ctbl", table)
        sql = ("WITH lo AS (SELECT k FROM ctbl WHERE k < 50), "
               "hi AS (SELECT k FROM ctbl WHERE k >= 750) "
               "SELECT (SELECT COUNT(*) FROM lo) AS nlo, "
               "(SELECT COUNT(*) FROM hi) AS nhi")
        exec_sql, views = eng._skipping_rewrite(sql)
        assert len(views) == 2 and views[0] != views[1]
        row = spark.sql(exec_sql).first()
        assert (row.nlo, row.nhi) == (50, 50)
        for v in views:
            spark.catalog.dropTempView(v)
        # estimate reports the WIDER scan across segments
        est = eng.estimate_scan(sql)
        assert est["ctbl"]["files_kept"] >= 1

    def test_cte_shadowing_stands_down(self, spark, table):
        """A CTE named like the warehouse table shadows it — pruning
        must not engage anywhere in the statement."""
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("ctbl", table)
        sql = ("WITH ctbl AS (SELECT * FROM ctbl WHERE k >= 700) "
               "SELECT COUNT(*) AS n FROM ctbl")
        assert eng._skipping_rewrite(sql) == (sql, [])
        assert eng.execute(sql).rows()[0].n == 100

    def test_recursive_cte_untouched(self, spark, table):
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("ctbl", table)
        sql = ("WITH RECURSIVE seq(x) AS (SELECT 1 UNION ALL "
               "SELECT x + 1 FROM seq WHERE x < 3) "
               "SELECT COUNT(*) AS n FROM seq")
        assert eng._skipping_rewrite(sql) == (sql, [])


def test_concurrent_statement_never_sees_anothers_pruning(spark, tmp_path):
    """The skipping rewrite must be invisible to every other statement
    on the same SparkSession: while engine A's pruned statement is in
    flight (pruned views registered, not yet dropped), engine B — and a
    direct spark.sql on the shared view — must resolve the FULL table,
    not A's subset. The old repoint-then-restore design failed exactly
    this window."""
    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(800).selectExpr("id AS k").repartitionByRange(
        8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    a = QueryEngine(spark, register_helpers=False)
    b = QueryEngine(spark, register_helpers=False)
    a.register_warehouse("shared", path)
    b.register_warehouse("shared", path)
    sql_a = "SELECT COUNT(*) AS n FROM shared WHERE k >= 700"
    # freeze A mid-statement: rewrite done, pruned views live
    exec_a, views_a = a._skipping_rewrite(sql_a)
    assert views_a
    try:
        # B's unpredicated statement (would read a 700+ subset under
        # the repoint design) sees the whole table
        assert b.execute("SELECT COUNT(*) AS n FROM shared"
                         ).rows()[0].n == 800
        # and so does a bare spark.sql on the shared view
        assert spark.sql("SELECT COUNT(*) AS n FROM shared"
                         ).first().n == 800
        # B's own pruned statement gets a DIFFERENT view name — the
        # two in-flight statements cannot collide
        exec_b, views_b = b._skipping_rewrite(
            "SELECT COUNT(*) AS n FROM shared WHERE k < 100")
        assert views_b and set(views_b).isdisjoint(views_a)
        assert spark.sql(exec_b).first().n == 100
        for v in views_b:
            spark.catalog.dropTempView(v)
        # A's frozen statement still executes against its own pruning
        assert spark.sql(exec_a).first().n == 100
    finally:
        for v in views_a:
            spark.catalog.dropTempView(v)
    # nothing leaked into the session catalog
    leftovers = [t.name for t in spark.catalog.listTables()
                 if "__skip_" in t.name]
    assert leftovers == []


def test_read_table_default_path_prunes(spark, tmp_path):
    from corkscrew_spark import skipping, warehouse

    path = str(tmp_path / "tbl")
    spark.range(400).select(F.col("id").alias("k")).repartitionByRange(
        4, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    preds = [("k", "between", (100, 150))]
    got = warehouse.read_table(spark, path, preds)
    want = spark.read.parquet(path).filter(
        skipping.predicate_filter(preds))
    assert sorted(r.k for r in got.collect()) \
        == sorted(r.k for r in want.collect())
    opened = got.select(F.input_file_name()).distinct().count()
    assert opened < 4
    # forced off: same rows, full listing
    off = warehouse.read_table(spark, path, preds, use_stats=False)
    assert off.count() == got.count()


class TestJoinSkipping:
    """Inner-join chains prune each registered warehouse table on its
    explicitly-qualified conjuncts; outer joins and self-joins fall
    back to plain views (soundness over coverage)."""

    @pytest.fixture()
    def two_tables(self, spark, tmp_path):
        from corkscrew_spark import skipping

        facts = str(tmp_path / "facts")
        dims = str(tmp_path / "dims")
        spark.range(800).select(
            F.col("id").alias("k"), (F.col("id") % 10).alias("d")
        ).repartitionByRange(8, "k").write.parquet(facts)
        spark.range(10).select(
            F.col("id").alias("d"),
            F.concat(F.lit("dim"), F.col("id").cast("string")).alias("nm")
        ).coalesce(1).write.parquet(dims)
        skipping.compute_stats(spark, facts, ["k"])
        skipping.compute_stats(spark, dims, ["d"])
        return facts, dims

    def test_join_prunes_fact_side(self, spark, two_tables):
        facts, dims = two_tables
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("facts", facts)
        eng.register_warehouse("dims", dims)
        sql = ("SELECT f.k, d.nm FROM facts f JOIN dims d ON f.d = d.d "
               "WHERE f.k >= 700 AND d.nm IS NOT NULL ORDER BY f.k")
        got = [tuple(r) for r in eng.execute(sql).rows()]
        plain = [tuple(r) for r in spark.sql(
            f"SELECT f.k, d.nm FROM parquet.`{facts}` f "
            f"JOIN parquet.`{dims}` d ON f.d = d.d "
            "WHERE f.k >= 700 AND d.nm IS NOT NULL ORDER BY f.k"
        ).collect()]
        assert got == plain and len(got) == 100
        # the fact reference is rewritten to a uniquely-named pruned
        # one-statement view; the SHARED view is never touched, so a
        # concurrent reader mid-statement always sees the full table
        exec_sql, views = eng._skipping_rewrite(sql)
        assert views and exec_sql != sql
        fact_view = next(v for v in views if v.startswith("facts__skip_"))
        opened = spark.sql(
            f"SELECT DISTINCT input_file_name() AS f FROM {fact_view}"
        ).count()
        assert opened <= 2  # of 8 range-clustered fact files
        assert spark.sql("SELECT COUNT(*) AS n FROM facts"
                         ).first().n == 800  # shared view: untouched
        for v in views:
            spark.catalog.dropTempView(v)

    def test_left_join_prunes_preserved_side_only(self, spark,
                                                  two_tables):
        """The preserved (left) side of a LEFT JOIN prunes on its own
        qualified conjuncts — its rows are never null-extended, so the
        re-applied WHERE filters them identically. The RIGHT side
        never prunes, even with its own conjuncts: a dropped match
        null-extends instead, and `d.col IS NULL` would wrongly
        ACCEPT it (the classic trap, exercised below)."""
        facts, dims = two_tables
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("facts", facts)
        eng.register_warehouse("dims", dims)
        sql = ("SELECT f.k, d.nm FROM facts f LEFT JOIN dims d "
               "ON f.d = d.d AND d.d >= 5 "
               "WHERE f.k >= 700 AND d.nm IS NULL ORDER BY f.k")
        got = [tuple(r) for r in eng.execute(sql).rows()]
        plain = [tuple(r) for r in spark.sql(
            sql.replace("facts", f"parquet.`{facts}`")
               .replace("dims", f"parquet.`{dims}`")).collect()]
        assert got == plain and len(got) == 50  # d < 5: null-extended
        exec_sql, views = eng._skipping_rewrite(sql)
        assert views and all(v.startswith("facts__skip_") for v in views)
        for v in views:
            spark.catalog.dropTempView(v)
        # a dims-qualified conjunct must never prune dims under LEFT
        sql2 = ("SELECT f.k FROM facts f LEFT JOIN dims d ON f.d = d.d "
                "WHERE f.k >= 700 AND d.d >= 5")
        _s, views2 = eng._skipping_rewrite(sql2)
        assert all(v.startswith("facts__skip_") for v in views2)
        for v in views2:
            spark.catalog.dropTempView(v)

    def test_right_full_and_self_join_never_rewrite(self, spark,
                                                    two_tables):
        facts, dims = two_tables
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("facts", facts)
        eng.register_warehouse("dims", dims)
        for sql in (
            # RIGHT/FULL null-extend EARLIER tables: stand down entirely
            "SELECT f.k FROM facts f RIGHT JOIN dims d ON f.d = d.d "
            "WHERE f.k >= 700",
            "SELECT f.k FROM facts f FULL OUTER JOIN dims d "
            "ON f.d = d.d WHERE f.k >= 700",
            # self-join: one reference's predicate must not prune the
            # other's rows
            "SELECT a.k FROM facts a JOIN facts b ON a.d = b.d "
            "WHERE a.k >= 700",
        ):
            assert eng._skipping_rewrite(sql) == (sql, []), sql
            assert eng.execute(sql).df.count() > 0


def test_warehouse_view_survives_directory_swap(spark, tmp_path):
    """merge_upsert swaps table directories; a view captured at
    registration would read dead file paths. The engine re-points
    referenced warehouse views per query, so post-merge SQL sees the
    merged state with no re-registration."""
    from corkscrew_spark import skipping, warehouse

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, v string, ts long"
    ).write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("swp", path)
    assert eng.execute("SELECT COUNT(*) AS n FROM swp").rows()[0].n == 2
    warehouse.merge_upsert(
        spark, path,
        spark.createDataFrame([(2, "b2", 2), (3, "c", 2)],
                              "k long, v string, ts long"),
        keys=["k"], order_col="ts")
    r = eng.execute("SELECT v FROM swp WHERE k = 2").rows()
    assert [x.v for x in r] == ["b2"]
    assert eng.execute("SELECT COUNT(*) AS n FROM swp").rows()[0].n == 3


class TestScanBudget:
    """max_scan_bytes arms admission control: a query whose
    METADATA-ONLY estimate says it reads past the budget is refused
    before any file opens; unestimable queries run normally."""

    @pytest.fixture()
    def table(self, spark, tmp_path):
        from corkscrew_spark import skipping

        path = str(tmp_path / "tbl")
        spark.range(800).selectExpr("id AS k").repartitionByRange(
            8, "k").write.parquet(path)
        skipping.compute_stats(spark, path, ["k"])
        return path

    def _engine(self, spark, table, budget):
        eng = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=budget)
        eng.register_warehouse("bt", table)
        return eng

    def test_selective_query_runs_wide_query_refused(self, spark, table):
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        est = skipping.estimate_scan(table, [("k", ">=", 700)])
        # budget sits between the selective scan and the near-full one
        eng = self._engine(spark, table, est["bytes_kept"] + 1)
        assert eng.execute("SELECT COUNT(*) AS n FROM bt WHERE k >= 700"
                           ).rows()[0].n == 100
        with pytest.raises(ScanBudgetExceeded, match="budget"):
            eng.execute("SELECT COUNT(*) AS n FROM bt WHERE k >= 0")
        # the DNF path enforces too
        with pytest.raises(ScanBudgetExceeded):
            eng.execute("SELECT COUNT(*) AS n FROM bt "
                        "WHERE k < 400 OR k >= 400")
        # and execute_stream goes through the same gate
        with pytest.raises(ScanBudgetExceeded):
            eng.execute_stream("SELECT k FROM bt WHERE k >= 0")

    def test_bare_full_scan_is_refused(self, spark, table):
        """A resolvable reference with NO extractable conjuncts — the
        bare `SELECT * FROM big_table` — estimates at full scan and is
        enforced (review finding: the most obviously over-budget query
        used to bypass admission control entirely), while the same
        shape under a big-enough budget runs."""
        from corkscrew_spark.engine import ScanBudgetExceeded

        eng = self._engine(spark, table, 1)
        with pytest.raises(ScanBudgetExceeded, match="budget"):
            eng.execute("SELECT COUNT(*) AS n FROM bt")
        big = self._engine(spark, table, 10 ** 12)
        assert big.execute("SELECT COUNT(*) AS n FROM bt"
                           ).rows()[0].n == 800

    def test_governed_only_table_enforced_at_full_scan(
            self, spark, table, monkeypatch):
        """A pruning-opted-out table (CORKSCREW_DATA_SKIPPING=0 at
        registration) reads PLAIN, so the governor must enforce — and
        estimate_scan must report — the full-scan bytes even when the
        WHERE has minable conjuncts: a budget between the pruned and
        full estimates refuses the query instead of admitting a scan
        that will not actually be pruned (r8 advisor finding)."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        pruned = skipping.estimate_scan(table, [("k", ">=", 700)])
        full = skipping.estimate_scan(table, [])
        assert pruned["bytes_kept"] < full["bytes_kept"]
        mid = (pruned["bytes_kept"] + full["bytes_kept"]) // 2
        q = "SELECT COUNT(*) AS n FROM bt WHERE k >= 700"

        monkeypatch.setenv("CORKSCREW_DATA_SKIPPING", "0")
        eng = self._engine(spark, table, mid)
        with pytest.raises(ScanBudgetExceeded, match="budget"):
            eng.execute(q)
        # the dry-run agrees with the admission verdict (full scan)
        est = eng.estimate_scan(q)["bt"]
        assert est["files_kept"] == est["files_total"]
        monkeypatch.delenv("CORKSCREW_DATA_SKIPPING")
        ok = self._engine(spark, table, mid)
        assert ok.execute(q).rows()[0].n == 100  # pruned: admitted

    def test_self_join_and_left_right_side_enforced_full(self, spark,
                                                         table,
                                                         tmp_path):
        """A self-joined table and the right side of a LEFT join can't
        have conjuncts ATTRIBUTED (pruning would be unsound) — but the
        read is still a whole-table scan, so the governor enforces
        their full-scan estimate instead of waving them through."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        eng = self._engine(spark, table, 1)
        with pytest.raises(ScanBudgetExceeded):
            eng.execute(
                "SELECT COUNT(*) AS n FROM bt a JOIN bt b ON a.k = b.k "
                "WHERE a.k >= 700")
        big = self._engine(spark, table, 10 ** 12)
        assert big.execute(
            "SELECT COUNT(*) AS n FROM bt a JOIN bt b ON a.k = b.k "
            "WHERE a.k >= 700").rows()[0].n == 100
        # LEFT join: the preserved side's pruned estimate fits the
        # budget, but the null-extendable right side reads its WHOLE
        # table — the governor must count that scan too
        dim = str(tmp_path / "dim")
        spark.range(800).selectExpr("id AS k", "id % 3 AS tier"
                                    ).repartitionByRange(
            8, "k").write.parquet(dim)
        skipping.compute_stats(spark, dim, ["k"])
        est = skipping.estimate_scan(table, [("k", ">=", 700)])
        gov = self._engine(spark, table, est["bytes_kept"] + 1)
        gov.register_warehouse("dimt", dim)
        with pytest.raises(ScanBudgetExceeded, match="dimt"):
            gov.execute(
                "SELECT COUNT(*) AS n FROM bt a LEFT JOIN dimt d "
                "ON a.k = d.k WHERE a.k >= 700")

    def test_unattributable_shapes_governed_bare(self, spark, table):
        # r10: shapes the resolvers reject for PRUNING (RIGHT joins
        # null-extend earlier tables; comma joins are outside the
        # accepted grammar) still surface as bare full-scan rows for
        # the governor — they used to execute ungoverned (r9 verdict
        # item 1). Same statement under a generous budget runs and
        # returns the plain-scan answer.
        from corkscrew_spark.engine import ScanBudgetExceeded

        eng = self._engine(spark, table, 1)
        with pytest.raises(ScanBudgetExceeded, match="bt"):
            eng.execute(
                "SELECT COUNT(*) AS n FROM bt a RIGHT JOIN bt b "
                "ON a.k = b.k WHERE b.k >= 700")
        big = self._engine(spark, table, 10 ** 12)
        assert big.execute(
            "SELECT COUNT(*) AS n FROM bt a RIGHT JOIN bt b "
            "ON a.k = b.k WHERE b.k >= 700").rows()[0].n == 100
        # and a ScanBudgetExceeded is a QueryValidationError, so API
        # servers surface it through the existing error envelope
        from corkscrew_spark.engine import QueryValidationError

        assert issubclass(ScanBudgetExceeded, QueryValidationError)

    def test_no_budget_means_no_gate(self, spark, table):
        eng = self._engine(spark, table, None)
        assert eng.execute("SELECT COUNT(*) AS n FROM bt WHERE k >= 0"
                           ).rows()[0].n == 800

    def test_governor_survives_skipping_opt_out(self, spark, table,
                                                monkeypatch):
        """CORKSCREW_DATA_SKIPPING=0 disables the pruning OPTIMIZATION;
        it must not disarm the admission CONTROL (review finding: the
        governor reached tables only through the pruning-enabled set,
        so the debug flag silently admitted every over-budget scan)."""
        from corkscrew_spark.engine import ScanBudgetExceeded

        monkeypatch.setenv("CORKSCREW_DATA_SKIPPING", "0")
        eng = self._engine(spark, table, 1)  # 1-byte budget
        assert not eng._warehouse_skip  # pruning is off...
        with pytest.raises(ScanBudgetExceeded):  # ...the governor isn't
            eng.execute("SELECT COUNT(*) AS n FROM bt WHERE k >= 700")
        big = self._engine(spark, table, 10 ** 12)
        assert big.execute("SELECT COUNT(*) AS n FROM bt WHERE k >= 700"
                           ).rows()[0].n == 100

    def test_refusal_leaks_no_views(self, spark, table):
        from corkscrew_spark.engine import ScanBudgetExceeded

        eng = self._engine(spark, table, 1)
        with pytest.raises(ScanBudgetExceeded):
            eng.execute("SELECT COUNT(*) FROM bt WHERE k >= 0")
        assert not [t.name for t in spark.catalog.listTables()
                    if "__skip_" in t.name]


def test_view_refresh_gated_on_table_signature(spark, tmp_path):
    """The per-query view refresh re-creates the view (listing +
    schema-inference footer read) ONLY when the table's signature
    (dir mtime/inode + commit-log identity) moved — an unchanged
    table costs two os.stat calls, not a listing. Observable via a
    marker view: while the table is unchanged the engine must leave
    the session's view alone; any write path (swap-based merge,
    plain append) must move the signature and re-point it."""
    from pyspark.sql import functions as F

    from corkscrew_spark import warehouse

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)],
                          "k long, v string, ts long").write.parquet(path)
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("sig", path)
    assert eng.execute("SELECT COUNT(*) AS n FROM sig").rows()[0].n == 2
    # plant a marker view over the same name: with the table unchanged
    # the engine must NOT clobber it (refresh skipped)
    spark.createDataFrame([(99,)], "k long").createOrReplaceTempView("sig")
    assert eng.execute("SELECT COUNT(*) AS n FROM sig").rows()[0].n == 1
    # a swap-based merge moves the signature: refresh re-points
    warehouse.merge_upsert(
        spark, path,
        spark.createDataFrame([(3, "c", 2)], "k long, v string, ts long"),
        keys=["k"], order_col="ts")
    assert eng.execute("SELECT COUNT(*) AS n FROM sig").rows()[0].n == 3
    # a plain append (no commit log involvement) also moves it
    spark.createDataFrame([(4, "d", 3)], "k long, v string, ts long"
                          ).write.mode("append").parquet(path)
    assert eng.execute("SELECT COUNT(*) AS n FROM sig").rows()[0].n == 4
    # and the pruned path still sees fresh data end-to-end
    assert eng.execute("SELECT v FROM sig WHERE k = 4"
                       ).rows()[0].v == "d"


def test_engine_estimate_scan(spark, tmp_path):
    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(800).selectExpr("id AS k").repartitionByRange(
        8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("est", path)
    est = eng.estimate_scan(
        "SELECT COUNT(*) FROM est WHERE k >= :lo", {"lo": 700})
    assert set(est) == {"est"}
    e = est["est"]
    assert e["fallback"] is None
    assert e["files_total"] == 8 and 0 < e["files_kept"] <= 2
    assert 0 < e["bytes_kept"] < e["bytes_total"]
    # a resolvable reference with no conjuncts reports the trivial
    # full-scan estimate — exactly what the governor enforces on
    bare = eng.estimate_scan("SELECT COUNT(*) FROM est")
    assert bare["est"]["fallback"] is None
    assert bare["est"]["files_kept"] == bare["est"]["files_total"] == 8
    assert bare["est"]["bytes_kept"] == bare["est"]["bytes_total"] > 0
    # top-level ORs estimate through the DNF planner with a union bound
    dnf = eng.estimate_scan("SELECT * FROM est WHERE k < 50 OR k >= 750")
    assert dnf["est"]["files_kept"] == 2
    assert dnf["est"]["rows_est_upper"] == 200.0
    # an unparsable disjunct can't prune, so the honest estimate is the
    # full scan the read will actually perform
    und = eng.estimate_scan(
        "SELECT * FROM est WHERE k = 1 OR upper('x') = 'X'")
    assert und["est"]["files_kept"] == und["est"]["files_total"] == 8
    # a self-join can't attribute conjuncts but still reads the whole
    # table: one deduplicated full-scan estimate
    sj = eng.estimate_scan(
        "SELECT COUNT(*) FROM est a JOIN est b ON a.k = b.k")
    assert sj["est"]["files_kept"] == sj["est"]["files_total"] == 8
    # r10: shapes the resolvers reject for pruning (RIGHT/FULL/comma)
    # still estimate as deduplicated bare full scans — the governor
    # enforces on exactly these rows (r9 verdict item 1)
    rj = eng.estimate_scan(
        "SELECT COUNT(*) FROM est a RIGHT JOIN est b ON a.k = b.k")
    assert rj["est"]["files_kept"] == rj["est"]["files_total"] == 8


def test_warehouse_names_resolve_case_insensitively(spark, tmp_path):
    """Spark resolves view names case-insensitively; the skipping
    registry must too — `FROM Estate` has to find the registration
    made as 'estate' (and still prune)."""
    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(400).selectExpr("id AS k").repartitionByRange(
        4, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("estate", path)
    sql = "SELECT COUNT(*) AS n FROM Estate WHERE k >= 300"
    exec_sql, views = eng._skipping_rewrite(sql)
    assert views and exec_sql != sql
    for v in views:
        spark.catalog.dropTempView(v)
    assert eng.execute(sql).rows()[0].n == 100
    est = eng.estimate_scan("SELECT * FROM ESTATE WHERE k >= 300")
    assert est and est["estate"]["files_kept"] < est["estate"]["files_total"]


def test_view_freshness_survives_skipping_opt_out(spark, tmp_path,
                                                  monkeypatch):
    """CORKSCREW_DATA_SKIPPING=0 disables PRUNING only: the per-query
    view refresh is a correctness feature (directory swaps invalidate
    a view's cached file listing) and must keep working."""
    from corkscrew_spark import warehouse

    monkeypatch.setenv("CORKSCREW_DATA_SKIPPING", "0")
    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a", 1)], "k long, v string, ts long"
                          ).write.parquet(path)
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("offt", path)
    assert "offt" not in eng._warehouse_skip  # no pruning
    assert eng.execute("SELECT COUNT(*) AS n FROM offt").rows()[0].n == 1
    warehouse.merge_upsert(
        spark, path,
        spark.createDataFrame([(2, "b", 2)], "k long, v string, ts long"),
        keys=["k"], order_col="ts")
    # the swap replaced every file; the refresh must re-point the view
    assert eng.execute("SELECT COUNT(*) AS n FROM offt").rows()[0].n == 2


def test_engine_prunes_top_level_or(spark, tmp_path):
    from corkscrew_spark import skipping

    path = str(tmp_path / "tbl")
    spark.range(800).selectExpr("id AS k", "id % 7 AS v"
                                ).repartitionByRange(8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("ort", path)
    sql = ("SELECT * FROM ort WHERE k < 50 OR (k >= 750 AND v = 1) "
           "ORDER BY k")
    exec_sql, views = eng._skipping_rewrite(sql)  # DNF path engaged
    assert views and exec_sql != sql
    for v in views:
        spark.catalog.dropTempView(v)
    got = [tuple(r) for r in eng.execute(sql).rows()]
    plain = [tuple(r) for r in spark.sql(
        f"SELECT * FROM parquet.`{path}` WHERE k < 50 OR "
        "(k >= 750 AND v = 1) ORDER BY k").collect()]
    assert got == plain and len(got) > 0
    # a bare unparsable disjunct still stands down entirely
    bad = "SELECT * FROM ort WHERE k < 50 OR upper('x') = 'X'"
    assert eng._skipping_rewrite(bad) == (bad, [])


def test_listing_cache_pinned_on_signature(spark, tmp_path, monkeypatch):
    """Round-8: the file listing behind plan_skip is cached per table
    keyed on the freshness signature — N governed queries on an
    unchanged table pay ONE directory walk; any commit (here: a
    merge_upsert swap) invalidates it; CORKSCREW_VIEW_SIG=0 opts out
    entirely (external writers)."""
    from corkscrew_spark import skipping, warehouse

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(100)],
        "k long, v string, ts long"
    ).repartitionByRange(4, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("lct", path)
    walks = []
    real = skipping._list_data_files
    monkeypatch.setattr(skipping, "_list_data_files",
                        lambda p: walks.append(p) or real(p))
    for _ in range(3):
        assert eng.execute("SELECT COUNT(*) AS n FROM lct WHERE k >= 90"
                           ).rows()[0].n == 10
    # one walk for the cache fill; nothing re-lists while unchanged
    # (compute_stats already ran, so plan_skip's own path is the only
    # consumer left)
    assert len([w for w in walks if w == path]) == 1
    warehouse.merge_upsert(
        spark, path,
        spark.createDataFrame([(95, "x", 2)], "k long, v string, ts long"),
        keys=["k"], order_col="ts")
    skipping.compute_stats(spark, path, ["k"])
    n = len([w for w in walks if w == path])
    assert eng.execute("SELECT v FROM lct WHERE k = 95"
                       ).rows()[0].v == "x"
    assert len([w for w in walks if w == path]) > n  # invalidated
    # env opt-out: every statement walks for itself
    monkeypatch.setenv("CORKSCREW_VIEW_SIG", "0")
    m = len([w for w in walks if w == path])
    eng.execute("SELECT COUNT(*) AS n FROM lct WHERE k >= 90")
    eng.execute("SELECT COUNT(*) AS n FROM lct WHERE k >= 90")
    assert len([w for w in walks if w == path]) >= m + 2


def test_view_sig_opt_out_refreshes_every_query(spark, tmp_path,
                                                monkeypatch):
    """CORKSCREW_VIEW_SIG=0 restores the refresh-every-query behavior
    for tables written by jobs outside this package: an out-of-band
    append into an existing partition subdirectory moves neither the
    dir mtime nor the commit log, so only the opt-out sees it."""
    import shutil

    monkeypatch.setenv("CORKSCREW_VIEW_SIG", "0")
    path = tmp_path / "tbl"
    spark.createDataFrame([(1, "eu")], "k long, region string"
                          ).write.partitionBy("region").parquet(str(path))
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("ext", str(path), skipping=False)
    assert eng.execute("SELECT COUNT(*) AS n FROM ext").rows()[0].n == 1
    # out-of-band writer: copy the existing part file INSIDE the
    # partition dir (new file, same dir mtime semantics as a foreign
    # job's direct write; the top dir and commit log never move)
    part = path / "region=eu"
    src = next(p for p in part.iterdir() if p.suffix == ".parquet")
    shutil.copy(src, part / "part-foreign.parquet")
    assert eng.execute("SELECT COUNT(*) AS n FROM ext").rows()[0].n == 2


def test_concurrent_time_travel_correct_and_bounded(spark, tmp_path):
    """The lock-free server runs statements in parallel on ONE engine:
    a statement-scoped snapshot GC landing mid-flight for another
    thread may cost that thread pruning, never rows — every concurrent
    time-travel/warehouse query must return correct results with no
    iteration/registry exceptions, and the registry must be collected
    afterward."""
    from concurrent.futures import ThreadPoolExecutor

    from corkscrew_spark import skipping, versioned

    vt = str(tmp_path / "vt")
    for ts in (1, 2, 3):
        versioned.write_version(
            spark.createDataFrame([(k, ts) for k in range(ts * 10)],
                                  "k long, ts long"), vt)
    wt = str(tmp_path / "wt")
    spark.range(800).selectExpr("id AS k").repartitionByRange(
        8, "k").write.parquet(wt)
    skipping.compute_stats(spark, wt, ["k"])
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_versioned("vt", vt)
    eng.register_warehouse("wt", wt)

    def run(i: int) -> tuple[int, int]:
        v = (i % 3) + 1
        if i % 2:
            n = eng.execute(
                f"SELECT COUNT(*) AS n FROM vt VERSION AS OF {v}"
            ).rows()[0].n
            return i, n - v * 10  # 0 when correct
        n = eng.execute("SELECT COUNT(*) AS n FROM wt WHERE k >= 700"
                        ).rows()[0].n
        return i, n - 100

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(run, range(24)))
    assert all(delta == 0 for _i, delta in results), results
    assert not eng._snapshots  # collected after the last statement


def test_time_travel_registry_bounded(spark, tmp_path):
    """Arbitrary VERSION AS OF literals must not grow the warehouse
    registry: snapshot registrations are statement-scoped, collected
    after execution (round-7 advice: a long-lived server paid a regex
    search + two os.stats per accumulated entry on every query)."""
    from corkscrew_spark import versioned

    p = str(tmp_path / "vt")
    for ts in (1, 2, 3):
        versioned.write_version(
            spark.createDataFrame([(ts, "a", ts)],
                                  "k long, v string, ts long"), p)
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_versioned("vt", p)
    base = len(eng._warehouse)
    for v in (1, 2, 3, 1, 2):
        got = eng.execute(
            f"SELECT COUNT(*) AS n FROM vt VERSION AS OF {v}").rows()
        assert got[0].n == 1
        assert len(eng._warehouse) == base  # collected after execute
    assert not eng._snapshots
    # r11: the dry-run resolves time travel too — its registrations
    # must be released the same way (a monitoring loop calling
    # estimate_statement per query must not grow the registry)
    for v in (1, 2, 3, 1):
        est = eng.estimate_statement(
            f"SELECT COUNT(*) AS n FROM vt VERSION AS OF {v}")
        assert est["reads"] == 1
    assert not any(eng._snap_refs.values())
    eng.execute("SELECT COUNT(*) AS n FROM vt")  # triggers the GC
    assert len(eng._warehouse) == base
    assert not eng._snapshots


def test_time_travel_qualified_refs_and_bad_args(spark, tmp_path):
    """r9 review: (a) the snapshot view aliases BACK to the original
    table name so qualified references keep resolving; an explicit
    user alias wins; (b) bad AS OF arguments surface as
    QueryValidationError (validate()'s contract), not raw ValueError;
    (c) the session catalog does not grow one temp view per distinct
    literal forever."""
    from corkscrew_spark import versioned

    p = str(tmp_path / "vt")
    for ts in (1, 2):
        versioned.write_version(
            spark.createDataFrame([(ts, ts)], "k long, ts long"), p)
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_versioned("vt", p)
    # qualified column through the implicit alias-back
    got = eng.execute("SELECT vt.k FROM vt VERSION AS OF 1").rows()
    assert [r.k for r in got] == [1]
    # explicit user alias (bare and AS forms)
    got = eng.execute("SELECT x.k FROM vt VERSION AS OF 2 x").rows()
    assert [r.k for r in got] == [2]
    got = eng.execute("SELECT x.k FROM vt VERSION AS OF 2 AS x").rows()
    assert [r.k for r in got] == [2]
    with pytest.raises(QueryValidationError, match="time travel"):
        eng.execute("SELECT * FROM vt VERSION AS OF 999")
    with pytest.raises(QueryValidationError, match="time travel"):
        eng.execute("SELECT * FROM vt TIMESTAMP AS OF 'not-a-ts'")
    # catalog bounded: snapshot views are dropped once released
    eng.execute("SELECT COUNT(*) AS n FROM vt VERSION AS OF 1").rows()
    eng.execute("SELECT COUNT(*) AS n FROM vt VERSION AS OF 2").rows()
    leftover = [t.name for t in spark.catalog.listTables()
                if t.name.startswith("vt__v")]
    assert leftover == []


def test_engine_prunes_derived_table_body(spark, tmp_path):
    """Round-8: `FROM (SELECT … WHERE …) t` — the non-CTE spelling of
    the compliance-pack shape — prunes through the default SQL path:
    the derived body is its own statement span, extraction runs on it,
    and the executed plan opens strictly fewer files. Result identity
    with the plain read holds; the governor enforces through it too."""
    from corkscrew_spark import skipping
    from corkscrew_spark.engine import ScanBudgetExceeded

    path = str(tmp_path / "tbl")
    spark.range(800).selectExpr("id AS k", "id % 7 AS v"
                                ).repartitionByRange(8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("dt", path)
    sql = ("SELECT v, COUNT(*) AS n FROM "
           "(SELECT v FROM dt WHERE k >= 700) t "
           "GROUP BY v ORDER BY v")
    res = eng.execute(sql)
    got = [tuple(r) for r in res.rows()]
    plain = [tuple(r) for r in spark.sql(
        f"SELECT v, COUNT(*) AS n FROM (SELECT v FROM "
        f"parquet.`{path}` WHERE k >= 700) t GROUP BY v ORDER BY v"
    ).collect()]
    assert got == plain and len(got) == 7
    opened = len(res.df.inputFiles())
    assert 0 < opened < 8
    # inside a WITH final query too (CTE segmentation composes)
    wsql = ("WITH base AS (SELECT 1 AS one) "
            "SELECT t.v, COUNT(*) AS n FROM "
            "(SELECT v FROM dt WHERE k >= 700) t "
            "GROUP BY t.v ORDER BY t.v")
    wres = eng.execute(wsql)
    assert len(wres.df.inputFiles()) == opened
    assert [tuple(r) for r in wres.rows()] == plain
    # the governor enforces through derived bodies: a wide inner
    # SELECT is refused, the selective one admitted
    est = skipping.estimate_scan(path, [("k", ">=", 700)])
    gov = QueryEngine(spark, register_helpers=False,
                      max_scan_bytes=est["bytes_kept"] + 1)
    gov.register_warehouse("dt", path)
    assert [tuple(r) for r in gov.execute(sql).rows()] == plain
    with pytest.raises(ScanBudgetExceeded):
        gov.execute("SELECT COUNT(*) AS n FROM "
                    "(SELECT v FROM dt WHERE k >= 0) t")


def test_read_table_disjunctive_path(spark, tmp_path):
    from corkscrew_spark import skipping, warehouse

    path = str(tmp_path / "tbl")
    spark.range(800).selectExpr("id AS k").repartitionByRange(
        8, "k").write.parquet(path)
    skipping.compute_stats(spark, path, ["k"])
    branches = [[("k", "<", 50)], [("k", ">=", 750)]]
    got = warehouse.read_table(spark, path, predicates_any=branches)
    assert got.count() == 100
    plan = skipping.plan_skip_any(path, branches)
    assert plan["pruned"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not both"):
        warehouse.read_table(spark, path, predicates=[("k", "<", 1)],
                             predicates_any=branches)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    #: WHERE-clause building blocks spanning every extraction outcome:
    #: prunable conjuncts, unparsable terms (functions, arithmetic,
    #: LIKE), CASE spans, IS NULL — the fuzz asserts RESULT IDENTITY
    #: between the engine's pruned execution and a plain scan for any
    #: AND/OR mix, which is the one property the whole skipping stack
    #: must never lose.
    _FUZZ_TERMS = st.sampled_from([
        "k >= 700", "k < 50", "k BETWEEN 100 AND 200", "v = 3",
        "s = 's1'", "k IN (3, 5, 750)", "s LIKE 's1%'",
        "upper(s) = 'S1'", "v IS NOT NULL", "k + 0 > 10",
        "CASE WHEN v = 1 AND k > 10 OR v = 2 THEN 1 ELSE 0 END = 1",
        "k = 799", "s IS NULL",
    ])

    @pytest.fixture(scope="module")
    def fuzz_table(spark, tmp_path_factory):
        from corkscrew_spark import skipping

        path = str(tmp_path_factory.mktemp("fuzz") / "tbl")
        spark.range(800).selectExpr(
            "id AS k", "id % 7 AS v",
            "concat('s', id % 13) AS s"
        ).repartitionByRange(8, "k").write.parquet(path)
        skipping.compute_stats(spark, path, ["k", "v", "s"],
                               bloom_cols=["s"])
        return path

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def test_fuzz_engine_pruning_identity(spark, fuzz_table, data):
        terms = data.draw(st.lists(_FUZZ_TERMS, min_size=1, max_size=4))
        ops = data.draw(st.lists(st.sampled_from(["AND", "OR"]),
                                 min_size=len(terms) - 1,
                                 max_size=len(terms) - 1))
        where = terms[0]
        for op, t in zip(ops, terms[1:]):
            where += f" {op} {t}"
        if data.draw(st.booleans()):
            where = f"({where})"
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("fz", fuzz_table)
        sql = f"SELECT k, v, s FROM fz WHERE {where} ORDER BY k"
        got = [tuple(r) for r in eng.execute(sql).rows()]
        want = [tuple(r) for r in spark.sql(
            sql.replace("fz", f"parquet.`{fuzz_table}`")).collect()]
        assert got == want, where

    @settings(max_examples=15, deadline=None)
    @given(data=st.data())
    def test_fuzz_engine_set_operator_identity(spark, fuzz_table, data):
        """r10: result identity for random set-operator statements —
        each branch prunes independently; UNION [ALL]/INTERSECT/EXCEPT
        of exact branch results must equal the plain-scan statement."""
        op = data.draw(st.sampled_from(
            ["UNION ALL", "UNION", "INTERSECT", "EXCEPT"]))
        w1 = data.draw(_FUZZ_TERMS)
        w2 = data.draw(_FUZZ_TERMS)
        paren = data.draw(st.booleans())
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("fz", fuzz_table)
        b1 = f"SELECT k, v, s FROM fz WHERE {w1}"
        b2 = f"SELECT k, v, s FROM fz WHERE {w2}"
        sql = (f"({b1}) {op} ({b2}) ORDER BY k, v, s" if paren
               else f"{b1} {op} {b2} ORDER BY k, v, s")
        got = [tuple(r) for r in eng.execute(sql).rows()]
        want = [tuple(r) for r in spark.sql(
            sql.replace("fz", f"parquet.`{fuzz_table}`")).collect()]
        assert got == want, sql

    @settings(max_examples=12, deadline=None)
    @given(data=st.data())
    def test_fuzz_engine_subquery_identity(spark, fuzz_table, data):
        """r10: result identity through the recursive subquery-body
        resolver — random EXISTS/IN bodies (optionally nested one
        level, optionally paren-wrapped) must match the plain scan."""
        w_outer = data.draw(_FUZZ_TERMS)
        w_body = data.draw(_FUZZ_TERMS)
        head = data.draw(st.sampled_from(["EXISTS", "IN"]))
        wrap = data.draw(st.booleans())
        nest = data.draw(st.booleans())
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("fz", fuzz_table)
        if head == "EXISTS":
            body = "SELECT 1 FROM fz b WHERE b.v = o.v"
            if nest:
                body += (" AND b.k IN (SELECT k FROM fz WHERE "
                         f"{w_body})")
            pred = f"EXISTS ({body})" if not wrap \
                else f"EXISTS (({body}))"
        else:
            body = f"SELECT v FROM fz WHERE {w_body}"
            if nest:
                body += " AND k IN (SELECT k FROM fz WHERE k < 400)"
            pred = f"v IN ({body})"
        sql = (f"SELECT k, v, s FROM fz o WHERE {w_outer} AND {pred} "
               "ORDER BY k")
        got = [tuple(r) for r in eng.execute(sql).rows()]
        want = [tuple(r) for r in spark.sql(
            sql.replace("fz", f"parquet.`{fuzz_table}`")).collect()]
        assert got == want, sql
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


class TestExistsSubqueryPruning:
    """EXISTS / IN-subquery bodies prune and are governed (r8 verdict
    item 1): the body is a self-contained SELECT whose result is
    preserved under pruning w.r.t. its own WHERE — however the outer
    predicate consumes it — and the enclosing statement is resolved
    against a masked copy so sibling conjuncts keep pruning too."""

    @pytest.fixture()
    def eng(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from corkscrew_spark import skipping

        big = str(tmp_path / "big")
        small = str(tmp_path / "small")
        spark.range(800).select(
            F.col("id").alias("k"), (F.col("id") % 10).alias("fk")
        ).repartitionByRange(8, "k").write.parquet(big)
        spark.range(20).select(
            F.col("id").alias("fk"), (F.col("id") * 2).alias("x")
        ).write.parquet(small)
        skipping.compute_stats(spark, big, ["k"])
        skipping.compute_stats(spark, small, ["fk"])
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("big_t", big)
        eng.register_warehouse("small_t", small)
        return eng, big, small

    def test_exists_body_prunes_and_identical(self, spark, eng):
        from corkscrew_spark import skipping

        engine, big, small = eng
        q = """SELECT COUNT(*) AS n FROM small_t s
               WHERE s.fk < 100 AND EXISTS (
                   SELECT 1 FROM big_t b
                   WHERE b.fk = s.fk AND b.k >= 700)"""
        r = engine.execute(q)
        assert r.rows()[0].n == 10
        opened = [f for f in r.df.inputFiles() if "/big/" in f]
        assert 0 < len(opened) < len(skipping._list_data_files(big))
        # dry-run agrees: body table pruned, outer full (fk < 100
        # keeps everything on this data)
        est = engine.estimate_scan(q)
        assert 0 < est["big_t"]["files_kept"] < est["big_t"]["files_total"]
        assert est["small_t"]["files_kept"] == est["small_t"]["files_total"]

    def test_in_subquery_prunes(self, spark, eng):
        from corkscrew_spark import skipping

        engine, big, small = eng
        q = """SELECT CAST(SUM(x) AS BIGINT) AS sx FROM small_t
               WHERE fk IN (SELECT fk FROM big_t WHERE k >= 790)"""
        r = engine.execute(q)
        # k in [790, 800) -> fk = k % 10 covers 0..9
        assert r.rows()[0].sx == sum(i * 2 for i in range(10))
        opened = [f for f in r.df.inputFiles() if "/big/" in f]
        assert 0 < len(opened) < len(skipping._list_data_files(big))

    def test_correlated_unqualified_column_not_attributed(
            self, spark, eng):
        """A body referencing an OUTER column unqualified must not
        attribute it to the inner table: `x` below belongs to small_t
        only, so pruning big_t on it would filter a nonexistent
        column. The query must run, return the plain-scan answer, and
        read big_t in full."""
        from corkscrew_spark import skipping

        engine, big, small = eng
        q = """SELECT COUNT(*) AS n FROM small_t s
               WHERE EXISTS (
                   SELECT 1 FROM big_t b WHERE b.fk = s.fk AND x < 10)"""
        r = engine.execute(q)
        plain = spark.sql(f"""
            SELECT COUNT(*) AS n FROM parquet.`{small}` s
            WHERE EXISTS (SELECT 1 FROM parquet.`{big}` b
                          WHERE b.fk = s.fk AND x < 10)""").collect()
        assert r.rows()[0].n == plain[0].n
        opened = [f for f in r.df.inputFiles() if "/big/" in f]
        assert len(opened) == len(skipping._list_data_files(big))

    def test_depth2_subquery_body_prunes_and_governed(self, spark, eng):
        """r10 (r9 stretch #8): bodies recurse — a table read inside
        `EXISTS (… WHERE x IN (SELECT …))` prunes on the innermost
        WHERE and is governed; previously depth-2 bodies' tables
        stayed unresolved."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        engine, big, small = eng
        q = """SELECT COUNT(*) AS n FROM small_t s
               WHERE EXISTS (
                   SELECT 1 FROM small_t s2
                   WHERE s2.fk = s.fk AND s2.fk IN (
                       SELECT fk FROM big_t WHERE k >= 700))"""
        r = engine.execute(q)
        assert r.rows()[0].n == 10  # k in [700,800) -> fk covers 0..9
        opened = [f for f in r.df.inputFiles() if "/big/" in f]
        assert 0 < len(opened) < len(skipping._list_data_files(big))
        est = engine.estimate_scan(q)
        assert 0 < est["big_t"]["files_kept"] < est["big_t"]["files_total"]
        # governance: the innermost bare scan is refused
        pruned = skipping.estimate_scan(big, [("k", ">=", 700)])
        full = skipping.estimate_scan(big, [])
        small_full = skipping.estimate_scan(small, [])
        mid = (pruned["bytes_kept"] + full["bytes_kept"]) // 2
        # the statement reads small_t TWICE (outer + body) plus the
        # pruned big_t — the aggregate ceiling must clear that sum
        budget = max(mid, 2 * small_full["bytes_kept"]
                     + pruned["bytes_kept"] + 1)
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=budget)
        gov.register_warehouse("big_t", big)
        gov.register_warehouse("small_t", small)
        assert gov.execute(q).rows()[0].n == 10  # pruned body admitted
        with pytest.raises(ScanBudgetExceeded, match="big_t|STATEMENT"):
            gov.execute("""SELECT COUNT(*) AS n FROM small_t s
               WHERE EXISTS (
                   SELECT 1 FROM small_t s2
                   WHERE s2.fk = s.fk AND s2.fk IN (
                       SELECT fk FROM big_t))""")

    def test_union_inside_subquery_body_prunes(self, spark, eng):
        """r10 review: a set statement INSIDE a subquery body splits
        into branch regions — each branch prunes on its own WHERE
        instead of the body standing down to a bare governed scan."""
        from corkscrew_spark import skipping

        engine, big, small = eng
        q = """SELECT COUNT(*) AS n FROM small_t
               WHERE fk IN (SELECT fk FROM big_t WHERE k >= 790
                            UNION SELECT fk FROM big_t WHERE k < 10)"""
        r = engine.execute(q)
        assert r.rows()[0].n == 10  # both windows cover fk 0..9
        opened = [f for f in r.df.inputFiles() if "/big/" in f]
        assert 0 < len(opened) < len(skipping._list_data_files(big))

    def test_double_paren_subquery_body_prunes(self, spark, eng):
        """r10 review: a redundantly parenthesized body —
        `EXISTS ((SELECT …))`, or `IN ((SELECT scalar))` where Spark
        gives the inner parens SCALAR-subquery semantics — was not
        recognized as a subquery at all, so the whole statement stood
        down. subquery_spans tolerates the wrapping layer and the
        engine strips it from the body text; either way the body is a
        self-contained SELECT whose pruning preserves its result, so
        results stay identical and the body scan prunes."""
        from corkscrew_spark import skipping

        engine, big, small = eng
        q = """SELECT COUNT(*) AS n FROM small_t s
               WHERE EXISTS ((SELECT 1 FROM big_t b
                              WHERE b.fk = s.fk AND b.k >= 700))"""
        r = engine.execute(q)
        assert r.rows()[0].n == 10
        opened = [f for f in r.df.inputFiles() if "/big/" in f]
        assert 0 < len(opened) < len(skipping._list_data_files(big))
        # IN ((SELECT scalar)): Spark's scalar-in-list semantics —
        # result must match the plain-scan answer, body still prunes
        q = """SELECT CAST(SUM(x) AS BIGINT) AS sx FROM small_t
               WHERE fk IN ((SELECT MAX(fk) FROM big_t
                             WHERE k >= 790))"""
        r = engine.execute(q)
        assert r.rows()[0].sx == 18  # max fk over k in [790,800) is 9
        # the scalar subquery runs as its own subquery job, so the
        # main plan's inputFiles can't witness it — the dry-run does:
        est = engine.estimate_scan(q)
        assert 0 < est["big_t"]["files_kept"] < est["big_t"]["files_total"]

    def test_governor_refuses_exists_body_full_scan(self, spark, eng):
        """`SELECT … FROM small WHERE EXISTS (SELECT … FROM big …)` —
        the one statement shape (r8 verdict) where a 100 TB scan could
        slip past both skipping and the byte-budget governor. A budget
        between big's pruned and full estimates now admits the
        selective body and refuses the unconstrained one."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        engine, big, small = eng
        pruned = skipping.estimate_scan(big, [("k", ">=", 700)])
        full = skipping.estimate_scan(big, [])
        small_full = skipping.estimate_scan(small, [])
        mid = (pruned["bytes_kept"] + full["bytes_kept"]) // 2
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=max(mid,
                                             small_full["bytes_kept"] + 1))
        gov.register_warehouse("big_t", big)
        gov.register_warehouse("small_t", small)
        ok = gov.execute("""SELECT COUNT(*) AS n FROM small_t s
            WHERE EXISTS (SELECT 1 FROM big_t b
                          WHERE b.fk = s.fk AND b.k >= 700)""")
        assert ok.rows()[0].n == 10
        with pytest.raises(ScanBudgetExceeded, match="big_t"):
            gov.execute("""SELECT COUNT(*) AS n FROM small_t s
                WHERE EXISTS (SELECT 1 FROM big_t b
                              WHERE b.fk = s.fk)""")


class TestSetOperatorGovernance:
    """UNION/INTERSECT/EXCEPT branches prune and are governed, and
    comma-list / RIGHT / FULL-join reads surface as bare governed
    rows (r9 verdict item 1 — the last statement shapes that executed
    both unpruned and ungoverned; the reference's own
    all_cloud_resources view and pass∪fail compliance idiom are
    UNION ALL over per-provider tables)."""

    @pytest.fixture()
    def eng(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from corkscrew_spark import skipping

        big = str(tmp_path / "big")
        big2 = str(tmp_path / "big2")
        spark.range(800).select(
            F.col("id").alias("k"), (F.col("id") % 10).alias("fk")
        ).repartitionByRange(8, "k").write.parquet(big)
        spark.range(600).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("fk")
        ).repartitionByRange(8, "k").write.parquet(big2)
        skipping.compute_stats(spark, big, ["k"])
        skipping.compute_stats(spark, big2, ["k"])
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("big_a", big)
        eng.register_warehouse("big_b", big2)
        return eng, big, big2

    def test_union_branches_prune_and_identical(self, spark, eng):
        from corkscrew_spark import skipping

        engine, big, big2 = eng
        q = """SELECT k, fk FROM big_a WHERE k >= 700
               UNION ALL
               SELECT k, fk FROM big_b WHERE k < 75
               ORDER BY k"""
        r = engine.execute(q)
        rows = r.rows()
        assert len(rows) == 175
        assert [x.k for x in rows[:3]] == [0, 1, 2]
        for path in (big, big2):
            opened = [f for f in r.df.inputFiles() if path in f]
            assert 0 < len(opened) < len(
                skipping._list_data_files(path)), path
        est = engine.estimate_scan(q)
        for t in ("big_a", "big_b"):
            assert 0 < est[t]["files_kept"] < est[t]["files_total"]

    def test_intersect_except_branches_prune(self, spark, eng):
        from corkscrew_spark import skipping

        engine, big, big2 = eng
        q = """SELECT k FROM big_a WHERE k >= 500
               INTERSECT
               SELECT k FROM big_b WHERE k >= 550"""
        r = engine.execute(q)
        assert r.df.count() == 50  # k in [550, 600)
        for path in (big, big2):
            opened = [f for f in r.df.inputFiles() if path in f]
            assert 0 < len(opened) < len(
                skipping._list_data_files(path)), path
        q = """SELECT k FROM big_a WHERE k >= 500
               EXCEPT
               SELECT k FROM big_b WHERE k >= 550"""
        assert engine.execute(q).df.count() == 250  # [500,550)+[600,800)

    def test_parenthesized_branches_with_tail_prune(self, spark, eng):
        from corkscrew_spark import skipping

        engine, big, big2 = eng
        q = """(SELECT k FROM big_a WHERE k >= 700)
               UNION ALL
               (SELECT k FROM big_b WHERE k < 75)
               ORDER BY k LIMIT 10"""
        r = engine.execute(q)
        assert [x.k for x in r.rows()] == list(range(10))
        for path in (big, big2):
            opened = [f for f in r.df.inputFiles() if path in f]
            assert 0 < len(opened) < len(
                skipping._list_data_files(path)), path

    def test_cte_body_union_prunes(self, spark, eng):
        from corkscrew_spark import skipping

        engine, big, big2 = eng
        q = """WITH u AS (
                   SELECT k FROM big_a WHERE k >= 700
                   UNION ALL
                   SELECT k FROM big_b WHERE k < 75)
               SELECT COUNT(*) AS n FROM u"""
        r = engine.execute(q)
        assert r.rows()[0].n == 175
        for path in (big, big2):
            opened = [f for f in r.df.inputFiles() if path in f]
            assert 0 < len(opened) < len(
                skipping._list_data_files(path)), path

    def test_governor_refuses_bare_union_branch(self, spark, eng):
        """A budget between big_a's pruned and full estimates admits
        the dated union and refuses the window-less one — each branch
        is estimated like a bare scan (r9: with the byte-budget armed,
        each branch of a UNION over 100 TB tables was admitted
        without an estimate)."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        engine, big, big2 = eng
        pruned = skipping.estimate_scan(big, [("k", ">=", 700)])
        pruned_b = skipping.estimate_scan(big2, [("k", "<", 75)])
        full = skipping.estimate_scan(big, [])
        mid = (pruned["bytes_kept"] + full["bytes_kept"]) // 2
        budget = max(mid, pruned["bytes_kept"]
                     + pruned_b["bytes_kept"] + 1)
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=budget)
        gov.register_warehouse("big_a", big)
        gov.register_warehouse("big_b", big2)
        ok = gov.execute("""SELECT COUNT(*) AS n FROM big_a
                            WHERE k >= 700
                            UNION ALL
                            SELECT COUNT(*) AS n FROM big_b
                            WHERE k < 75""")
        assert sorted(r.n for r in ok.rows()) == [75, 100]
        with pytest.raises(ScanBudgetExceeded, match="big_a"):
            gov.execute("""SELECT COUNT(*) AS n FROM big_a
                           UNION ALL
                           SELECT COUNT(*) AS n FROM big_b""")

    def test_governor_statement_aggregate_ceiling(self, spark, eng):
        """r10: the budget caps the STATEMENT'S total I/O — two reads
        each individually under budget must still be refused when
        their SUM crosses it (N references at budget−ε admitted N×
        the budget before)."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        engine, big, big2 = eng
        a_full = skipping.estimate_scan(big, [])["bytes_kept"]
        b_full = skipping.estimate_scan(big2, [])["bytes_kept"]
        # each full scan fits alone; the union of both does not
        budget = max(a_full, b_full) + 1
        assert budget < a_full + b_full
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=budget)
        gov.register_warehouse("big_a", big)
        gov.register_warehouse("big_b", big2)
        assert gov.execute("SELECT COUNT(*) AS n FROM big_a"
                           ).rows()[0].n == 800
        assert gov.execute("SELECT COUNT(*) AS n FROM big_b"
                           ).rows()[0].n == 600
        with pytest.raises(ScanBudgetExceeded, match="STATEMENT"):
            gov.execute("""SELECT COUNT(*) AS n FROM big_a
                           UNION ALL
                           SELECT COUNT(*) AS n FROM big_b""")
        # joins hit the same ceiling through the join-chain resolver
        with pytest.raises(ScanBudgetExceeded, match="STATEMENT"):
            gov.execute("SELECT COUNT(*) AS n FROM big_a "
                        "JOIN big_b ON big_a.k = big_b.k")

    def test_governor_refuses_comma_list_and_right_full(
            self, spark, eng):
        """`FROM a, b`, RIGHT and FULL joins: attribution is unsound
        for pruning, but every member is a whole-table read — each
        surfaces as a bare governed row and is refused under a
        too-small budget (r9: these shapes executed unpruned AND
        ungoverned)."""
        from corkscrew_spark.engine import ScanBudgetExceeded

        engine, big, big2 = eng
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=1)
        gov.register_warehouse("big_a", big)
        gov.register_warehouse("big_b", big2)
        for q in (
            "SELECT COUNT(*) AS n FROM big_a, big_b WHERE big_a.k = big_b.k",
            "SELECT COUNT(*) AS n FROM big_a RIGHT JOIN big_b "
            "ON big_a.k = big_b.k",
            "SELECT COUNT(*) AS n FROM big_a FULL OUTER JOIN big_b "
            "ON big_a.k = big_b.k",
            "SELECT COUNT(*) AS n FROM big_a CROSS JOIN big_b",
        ):
            with pytest.raises(ScanBudgetExceeded, match="big_"):
                gov.execute(q)
        # dry-run agrees: full-scan rows for both members
        est = engine.estimate_scan(
            "SELECT COUNT(*) AS n FROM big_a, big_b "
            "WHERE big_a.k = big_b.k")
        for t in ("big_a", "big_b"):
            assert est[t]["files_kept"] == est[t]["files_total"]

    def test_table_statement_and_union_table_governed(self, spark, eng):
        """`TABLE t` (Spark's whole-table statement, an allowed
        read-only start) and `… UNION ALL TABLE t` are full scans
        with no FROM for the resolvers — they surface through
        loose_table_refs position-0 handling and are refused under a
        tiny budget."""
        from corkscrew_spark.engine import ScanBudgetExceeded

        engine, big, big2 = eng
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=1)
        gov.register_warehouse("big_a", big)
        gov.register_warehouse("big_b", big2)
        with pytest.raises(ScanBudgetExceeded, match="big_a"):
            gov.execute("TABLE big_a")
        with pytest.raises(ScanBudgetExceeded, match="big_"):
            gov.execute("SELECT k, fk FROM big_b WHERE k < 10 "
                        "UNION ALL TABLE big_a")
        # ungoverned they still run
        assert engine.execute("TABLE big_a").df.count() == 800

    def test_estimate_statement_matches_enforcement(self, spark, eng):
        """r10: the dry-run exposes the SAME statement total the
        aggregate governor refuses on — per-table rows can each be
        under budget while the sum is not, and estimate_statement
        must say so (the divergence the review flagged)."""
        from corkscrew_spark import skipping

        engine, big, big2 = eng
        a_full = skipping.estimate_scan(big, [])["bytes_kept"]
        b_full = skipping.estimate_scan(big2, [])["bytes_kept"]
        q = ("SELECT COUNT(*) AS n FROM big_a UNION ALL "
             "SELECT COUNT(*) AS n FROM big_b")
        est = engine.estimate_statement(q)
        assert est["reads"] == 2
        assert est["bytes_kept"] == a_full + b_full
        assert set(est["tables"]) == {"big_a", "big_b"}
        # a twice-read table counts twice in the total, once (widest)
        # in the per-table dict
        est2 = engine.estimate_statement(
            "SELECT COUNT(*) AS n FROM big_a WHERE k >= 700 "
            "UNION ALL SELECT COUNT(*) AS n FROM big_a")
        assert est2["reads"] == 2
        assert est2["bytes_kept"] > est2["tables"]["big_a"]["bytes_kept"] \
            or est2["tables"]["big_a"]["bytes_kept"] == a_full
        # estimate_scan keeps its historical shape
        assert engine.estimate_scan(q) == est["tables"]

    def test_comma_list_still_executes_unpruned(self, spark, eng):
        """Without a budget the loose shapes run exactly as before —
        resolution never rewrites them (attribution unsound), so
        results are the plain-scan answer."""
        engine, big, big2 = eng
        r = engine.execute(
            "SELECT COUNT(*) AS n FROM big_a, big_b "
            "WHERE big_a.k = big_b.k AND big_a.k >= 550")
        assert r.rows()[0].n == 50


class TestFallbackGovernance:
    """r10 verdict #1: a registered table with NO skipping stats (or
    fully-invalidated ones) produced a fallback estimate that the
    armed governor neither refused nor counted — the last way an
    unestimated 100 TB read was admitted silently. Fallback estimates
    now count at their honest full-scan bytes (the listing's actual
    size sum) in BOTH the per-reference refusal and the
    statement-total ceiling, with env
    CORKSCREW_SCAN_BUDGET_ALLOW_NOSTATS=1 as the legacy opt-out."""

    @pytest.fixture()
    def pair(self, spark, tmp_path):
        """(nostats_path, fresh_path): same data, one table never saw
        compute_stats."""
        from corkscrew_spark import skipping

        nostats = str(tmp_path / "nostats")
        fresh = str(tmp_path / "fresh")
        df = spark.range(800).selectExpr("id AS k")
        df.repartitionByRange(8, "k").write.parquet(nostats)
        df.repartitionByRange(8, "k").write.parquet(fresh)
        skipping.compute_stats(spark, fresh, ["k"])
        return nostats, fresh

    def test_nostats_table_refused_and_fresh_twin_admitted(
            self, spark, pair):
        """A mid-band budget refuses the stats-less table (full-scan
        fallback bytes) while admitting the SAME query over its
        stats-fresh twin (pruned estimate) — the purpose of the
        feature."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        nostats, fresh = pair
        full = skipping.estimate_scan(nostats, [])
        assert full["fallback"] is not None
        assert full["bytes_kept"] == full["bytes_total"] > 0
        pruned = skipping.estimate_scan(fresh, [("k", ">=", 700)])
        mid = (pruned["bytes_kept"] + full["bytes_kept"]) // 2
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=mid)
        gov.register_warehouse("t_nostats", nostats)
        gov.register_warehouse("t_fresh", fresh)
        with pytest.raises(ScanBudgetExceeded,
                           match="stats are unavailable"):
            gov.execute("SELECT COUNT(*) AS n FROM t_nostats "
                        "WHERE k >= 700")
        assert gov.execute("SELECT COUNT(*) AS n FROM t_fresh "
                           "WHERE k >= 700").rows()[0].n == 100
        # the refusal names the remedy
        with pytest.raises(ScanBudgetExceeded, match="compute_stats"):
            gov.execute("SELECT COUNT(*) AS n FROM t_nostats")

    def test_env_opt_out_restores_legacy_exemption(
            self, spark, pair, monkeypatch):
        from corkscrew_spark.engine import ScanBudgetExceeded

        nostats, _fresh = pair
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=1)
        gov.register_warehouse("t_nostats", nostats)
        with pytest.raises(ScanBudgetExceeded):
            gov.execute("SELECT COUNT(*) AS n FROM t_nostats")
        monkeypatch.setenv("CORKSCREW_SCAN_BUDGET_ALLOW_NOSTATS", "1")
        assert gov.execute("SELECT COUNT(*) AS n FROM t_nostats"
                           ).rows()[0].n == 800

    def test_corrupt_stats_counted_like_missing(self, spark, pair):
        """A corrupt _column_stats.json must degrade like a MISSING
        one — plain read, governed at the fallback full-scan bytes —
        instead of raising into the engine's advisory except-continue
        and silently exempting the table from admission control."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        _nostats, fresh = pair
        with open(skipping._stats_path(fresh), "w") as fh:
            fh.write("{not json")
        assert skipping.load_stats(fresh) is None
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=1)
        gov.register_warehouse("t_corrupt", fresh)
        with pytest.raises(ScanBudgetExceeded,
                           match="stats are unavailable"):
            gov.execute("SELECT COUNT(*) AS n FROM t_corrupt "
                        "WHERE k >= 700")
        # ungoverned it still runs (plain read, real filter applied)
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("t_corrupt2", fresh)
        assert eng.execute("SELECT COUNT(*) AS n FROM t_corrupt2 "
                           "WHERE k >= 700").rows()[0].n == 100

    def test_dry_run_shows_the_bytes_enforcement_refuses(
            self, spark, pair, monkeypatch):
        """estimate_statement must carry the fallback bytes in its
        total (parity: dry-run == enforcement), and drop them only
        under the same env opt-out that disarms enforcement."""
        from corkscrew_spark import skipping

        nostats, _fresh = pair
        full = skipping.estimate_scan(nostats, [])
        eng = QueryEngine(spark, register_helpers=False)
        eng.register_warehouse("t_nostats", nostats)
        q = "SELECT COUNT(*) AS n FROM t_nostats"
        est = eng.estimate_statement(q)
        assert est["reads"] == 1
        assert est["bytes_kept"] == full["bytes_total"]
        assert est["tables"]["t_nostats"]["fallback"] is not None
        monkeypatch.setenv("CORKSCREW_SCAN_BUDGET_ALLOW_NOSTATS", "1")
        assert eng.estimate_statement(q)["bytes_kept"] == 0

    def test_self_reference_weighted_per_scan(self, spark, pair):
        """r10 advice: `FROM t a JOIN t b` is TWO scans of t — the
        statement total must count t's bytes twice (the KQL twin
        already multiplied by nrefs; the SQL surface deduped)."""
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        _nostats, fresh = pair
        full = skipping.estimate_scan(fresh, [])["bytes_kept"]
        q = ("SELECT COUNT(*) AS n FROM t_a a JOIN t_a b "
             "ON a.k = b.k")
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=full + 1)
        gov.register_warehouse("t_a", fresh)
        with pytest.raises(ScanBudgetExceeded, match="STATEMENT"):
            gov.execute(q)
        est = gov.estimate_statement(q)
        assert est["reads"] == 2
        assert est["bytes_kept"] == 2 * full
        ok = QueryEngine(spark, register_helpers=False,
                         max_scan_bytes=2 * full + 1)
        ok.register_warehouse("t_a", fresh)
        assert ok.execute(q).rows()[0].n == 800


class TestTimeTravelGovernance:
    """r10 verdict stretch #7: a time-traveled read resolves through a
    `name__vN` warehouse entry pointing at the SNAPSHOT's immutable
    data dir, so the armed governor must estimate — and refuse — the
    snapshot's own files, never the live table's; and the r11
    fallback rule applies to stats-less snapshots identically."""

    @pytest.fixture()
    def vt(self, spark, tmp_path):
        """v1 = 800 rows over 8 files (big), v2 = 50 rows in 1 file
        (small, the live view); both with snapshot zone maps."""
        from corkscrew_spark import skipping, versioned

        p = str(tmp_path / "vt")
        versioned.write_version(
            spark.range(800).selectExpr("id AS k")
            .repartitionByRange(8, "k"), p)
        versioned.write_version(
            spark.range(50).selectExpr("id AS k").coalesce(1), p)
        versioned.compute_stats_version(spark, p, ["k"], version=1)
        versioned.compute_stats_version(spark, p, ["k"], version=2)
        v1 = skipping.estimate_scan(f"{p}/v=1/data", [])["bytes_kept"]
        v2 = skipping.estimate_scan(f"{p}/v=2/data", [])["bytes_kept"]
        assert v2 < v1
        return p, v1, v2

    def test_budget_enforced_on_snapshot_files(self, spark, vt):
        from corkscrew_spark import skipping
        from corkscrew_spark.engine import ScanBudgetExceeded

        p, v1_full, v2_full = vt
        budget = (v1_full + v2_full) // 2
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=budget)
        gov.register_versioned("vt", p)
        # the small snapshot fits the budget; the big one must be
        # refused ON ITS OWN estimate even though the live view (= v2)
        # is tiny — estimating the live table here would admit an
        # 800-row history scan under a 50-row budget
        assert gov.execute("SELECT COUNT(*) AS n FROM vt "
                           "VERSION AS OF 2").rows()[0].n == 50
        with pytest.raises(ScanBudgetExceeded, match="budget"):
            gov.execute("SELECT COUNT(*) AS n FROM vt VERSION AS OF 1")
        # a selective predicate prunes through the SNAPSHOT's zone
        # maps and is admitted under the same budget
        pruned = skipping.estimate_scan(
            f"{p}/v=1/data", [("k", ">=", 700)])["bytes_kept"]
        assert pruned < budget
        r = gov.execute("SELECT COUNT(*) AS n FROM vt "
                        "VERSION AS OF 1 WHERE k >= 700")
        assert r.rows()[0].n == 100
        # dry-run parity: the estimate resolves the snapshot too
        est = gov.estimate_statement(
            "SELECT COUNT(*) AS n FROM vt VERSION AS OF 1")
        assert est["bytes_kept"] == v1_full

    def test_stats_less_snapshot_governed_at_fallback(
            self, spark, tmp_path):
        """A snapshot that never saw compute_stats_version is the
        stats-less table case: counted at full fallback bytes (r11),
        with the remedy in the refusal."""
        from corkscrew_spark import versioned
        from corkscrew_spark.engine import ScanBudgetExceeded

        p = str(tmp_path / "vns")
        versioned.write_version(
            spark.range(400).selectExpr("id AS k")
            .repartitionByRange(4, "k"), p)
        gov = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=1)
        gov.register_versioned("vns", p)
        with pytest.raises(ScanBudgetExceeded,
                           match="stats are unavailable"):
            gov.execute("SELECT COUNT(*) AS n FROM vns "
                        "VERSION AS OF 1 WHERE k >= 390")
        big = QueryEngine(spark, register_helpers=False,
                          max_scan_bytes=10 ** 12)
        big.register_versioned("vns", p)
        assert big.execute("SELECT COUNT(*) AS n FROM vns "
                           "VERSION AS OF 1 WHERE k >= 390"
                           ).rows()[0].n == 10


def test_readonly_gate_spaced_leading_parens():
    """r10 advice: lstrip('(') alone left whitespace between parens,
    spuriously rejecting `( (SELECT …) UNION (SELECT …) )`."""
    from corkscrew_spark.engine import (QueryValidationError,
                                        validate_readonly)

    validate_readonly("( (SELECT 1) UNION (SELECT 2) )")
    validate_readonly("(  ( SELECT 1 ) )")
    with pytest.raises(QueryValidationError):
        validate_readonly("( ( DELETE FROM t ) )")


def test_time_travel_same_table_twice_keeps_distinct_names(spark, tmp_path):
    """r10 review: the implicit alias-back (`vt__v1 AS vt`) made TWO
    unaliased time-travel references to the SAME table alias to one
    name, so `FROM vt VERSION AS OF 1 JOIN vt VERSION AS OF 2` — a
    shape that worked when views kept distinct names — became
    ambiguous. Multi-travel statements keep the distinct `name__v<N>`
    view names (qualify by alias or view name, as with any self-join);
    single-travel statements keep the alias-back."""
    from corkscrew_spark import versioned

    p = str(tmp_path / "vt")
    for ts in (1, 2):
        versioned.write_version(
            spark.createDataFrame([(k, ts) for k in range(ts + 1)],
                                  "k long, ts long"), p)
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_versioned("vt", p)
    # unaliased self-join across versions: distinct view names resolve
    got = eng.execute(
        "SELECT COUNT(*) AS n FROM vt VERSION AS OF 1 "
        "JOIN vt VERSION AS OF 2 ON vt__v1.k = vt__v2.k").rows()
    assert got[0].n == 2  # v1 has k in {0,1}, v2 in {0,1,2}
    # one user alias + one bare ref: the bare one still resolves by
    # its view name (no implicit alias minted for either)
    got = eng.execute(
        "SELECT COUNT(*) AS n FROM vt VERSION AS OF 1 a "
        "JOIN vt VERSION AS OF 2 ON a.k = vt__v2.k").rows()
    assert got[0].n == 2
    # single time-travel reference: alias-back unchanged
    got = eng.execute("SELECT vt.k FROM vt VERSION AS OF 1 "
                      "ORDER BY vt.k").rows()
    assert [r.k for r in got] == [0, 1]
    # a PLAIN reference alongside a travel clause collides with the
    # alias-back the same way a second clause would: the snapshot
    # keeps its distinct view name
    got = eng.execute(
        "SELECT COUNT(*) AS n FROM vt JOIN vt VERSION AS OF 1 "
        "ON vt.k = vt__v1.k").rows()
    assert got[0].n == 2  # current (3 rows: k 0,1,2) ⋈ v1 (k 0,1)
    # …and so does a DERIVED-TABLE ALIAS spelled like the name
    got = eng.execute(
        "SELECT COUNT(*) AS n FROM (SELECT 1 AS k) vt "
        "JOIN vt VERSION AS OF 1 ON vt.k = vt__v1.k").rows()
    assert got[0].n == 1
    assert not eng._snapshots


def test_time_travel_create_vs_gc_race(spark, tmp_path):
    """r10 review (TOCTOU): _resolve_time_travel used to create the
    temp view BEFORE refcounting it, while _gc_snapshots dropped views
    AFTER releasing the lock — a GC racing a same-literal resolution
    could drop the view the resolver just created. Both are one
    critical section now; hammer the exact interleaving (shared
    literals, GC triggered by every statement) and require zero
    spurious failures."""
    from concurrent.futures import ThreadPoolExecutor

    from corkscrew_spark import versioned

    p = str(tmp_path / "vt")
    for ts in (1, 2):
        versioned.write_version(
            spark.createDataFrame([(k, ts) for k in range(ts * 5)],
                                  "k long, ts long"), p)
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_versioned("vt", p)

    def run(i: int) -> int:
        v = (i % 2) + 1
        n = eng.execute(
            f"SELECT COUNT(*) AS n FROM vt VERSION AS OF {v}"
        ).rows()[0].n
        return n - v * 5  # 0 when correct

    with ThreadPoolExecutor(max_workers=12) as ex:
        deltas = list(ex.map(run, range(36)))
    assert deltas == [0] * 36
    assert not eng._snapshots


def test_two_engines_mixed_workload_stress(spark, tmp_path):
    """r12 (verdict stretch): two QueryEngine instances share one
    SparkSession while 12 threads interleave register_warehouse /
    VERSION AS OF travel / estimate_scan / plain queries across both.
    Engine state (warehouse registry, snapshot refcounts, listing
    caches) is per-instance; the session catalog is shared — so the
    invariants are: every result exact, zero snapshot leaks on BOTH
    engines, and neither instance's cache serves the other's tables."""
    from concurrent.futures import ThreadPoolExecutor

    from corkscrew_spark import skipping as skip
    from corkscrew_spark import versioned

    wt = str(tmp_path / "wt")
    (spark.range(200).selectExpr("id AS k", "id % 7 AS g")
     .coalesce(4).write.parquet(wt))
    skip.compute_stats(spark, wt, ["k"])
    vt = str(tmp_path / "vt")
    for ts in (1, 2):
        versioned.write_version(
            spark.createDataFrame([(k, ts) for k in range(ts * 5)],
                                  "k long, ts long"), vt)

    e1 = QueryEngine(spark, register_helpers=False)
    e2 = QueryEngine(spark, register_helpers=False)
    for e, base in ((e1, "a"), (e2, "b")):
        e.register_warehouse(f"wt_{base}", wt)
        e.register_versioned(f"vt_{base}", vt)

    def run(i: int) -> str | None:
        eng, base = ((e1, "a") if i % 2 == 0 else (e2, "b"))
        op = i % 4
        if op == 0:
            # fresh registration under a unique name, then query it
            eng.register_warehouse(f"t_{base}_{i}", wt)
            n = eng.execute(
                f"SELECT COUNT(*) AS n FROM t_{base}_{i} "
                "WHERE k >= 100").rows()[0].n
            return None if n == 100 else f"register {i}: {n}"
        if op == 1:
            v = (i // 4) % 2 + 1
            n = eng.execute(
                f"SELECT COUNT(*) AS n FROM vt_{base} "
                f"VERSION AS OF {v}").rows()[0].n
            return None if n == v * 5 else f"travel {i}: {n}"
        if op == 2:
            est = eng.estimate_scan(
                f"SELECT k FROM wt_{base} WHERE k >= 150")
            ok = (f"wt_{base}" in est
                  and est[f"wt_{base}"]["files_kept"] >= 1)
            return None if ok else f"estimate {i}: {est}"
        n = eng.execute(
            f"SELECT SUM(k) AS s FROM wt_{base} WHERE g = 3"
        ).rows()[0].s
        exp = sum(k for k in range(200) if k % 7 == 3)
        return None if n == exp else f"query {i}: {n}"

    with ThreadPoolExecutor(max_workers=12) as ex:
        errs = [e for e in ex.map(run, range(48)) if e]
    assert errs == []
    assert not e1._snapshots and not e2._snapshots
    # the per-instance registries never bled into each other
    assert all(k.startswith(("wt_a", "vt_a", "t_a_"))
               for k in (set(e1._warehouse) | set(e1._versioned)))
    assert all(k.startswith(("wt_b", "vt_b", "t_b_"))
               for k in (set(e2._warehouse) | set(e2._versioned)))
