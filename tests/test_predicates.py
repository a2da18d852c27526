"""SQL conjunct extraction (predicates.py): everything it returns must
be a top-level conjunct of the WHERE (soundness for data skipping), and
everything uncertain must yield nothing."""

from __future__ import annotations

import datetime as dt

from corkscrew_spark.predicates import extract_predicates, single_table


def _both(sql):
    st = single_table(sql)
    assert st is not None, sql
    return extract_predicates(sql, *st)


class TestSingleTable:
    def test_plain_and_aliased(self):
        assert single_table("SELECT * FROM t WHERE a=1") == ("t", None)
        assert single_table("SELECT x FROM t u WHERE u.a=1") == ("t", "u")
        assert single_table("SELECT x FROM t AS u") == ("t", "u")
        assert single_table(
            "SELECT * FROM `my t` m WHERE m.x=1") == ("my t", "m")

    def test_multi_table_shapes_yield_none(self):
        for sql in (
            "SELECT * FROM t JOIN s ON t.k = s.k WHERE a=1",
            "SELECT * FROM t, s WHERE a=1",
            "SELECT * FROM (SELECT * FROM t) WHERE a=1",
            "SELECT * FROM t WHERE a = (SELECT max(x) FROM s)",
            "WITH x AS (SELECT 1) SELECT * FROM t WHERE a=1",
            "SELECT * FROM t WHERE EXISTS (SELECT 1)",
            "SELECT * FROM t UNION ALL SELECT * FROM s",
            "SELECT * FROM db.t WHERE a=1",
            "SELECT 1",
        ):
            assert single_table(sql) is None, sql


class TestExtraction:
    def test_simple_conjuncts(self):
        assert _both("SELECT * FROM t WHERE a >= 5 AND b = 'x'") == [
            ("a", ">=", 5), ("b", "=", "x")]
        assert _both("SELECT * FROM t WHERE 5 < a") == [("a", ">", 5)]
        assert _both("SELECT * FROM t WHERE a = -2.5") == [
            ("a", "=", -2.5)]
        assert _both("SELECT * FROM t WHERE a IS NULL") == [
            ("a", "is_null", None)]
        assert _both("SELECT * FROM t WHERE a IS NOT NULL") == [
            ("a", "is_not_null", None)]

    def test_between_in_and_typed_literals(self):
        assert _both(
            "SELECT * FROM t u WHERE u.a BETWEEN 1 AND 3") == [
            ("a", "between", (1, 3))]
        assert _both("SELECT * FROM t WHERE k IN (1, 2, 3)") == [
            ("k", "in", [1, 2, 3])]
        assert _both(
            "SELECT * FROM t WHERE d >= DATE '2024-01-05' "
            "AND ts < TIMESTAMP '2024-01-05 10:00:00'") == [
            ("d", ">=", dt.date(2024, 1, 5)),
            ("ts", "<", dt.datetime(2024, 1, 5, 10, 0))]
        # two BETWEENs: their ANDs must bind to the BETWEEN, not split
        assert _both(
            "SELECT * FROM t WHERE a BETWEEN 1 AND 3 "
            "AND b BETWEEN 4 AND 5 AND c=1") == [
            ("a", "between", (1, 3)), ("b", "between", (4, 5)),
            ("c", "=", 1)]

    def test_top_level_or_extracts_nothing(self):
        assert _both("SELECT * FROM t WHERE a = 1 OR b = 2") == []

    def test_unparsable_conjuncts_dropped_parsable_kept(self):
        assert _both(
            "SELECT a, count(*) FROM t WHERE (a > 1) AND b LIKE 'x%' "
            "GROUP BY a ORDER BY a") == [("a", ">", 1)]
        assert _both(
            "SELECT * FROM t WHERE a > 1 AND (b = 2 OR c = 3)") == [
            ("a", ">", 1)]
        assert _both("SELECT * FROM t WHERE k + 0 >= 7") == []
        assert _both("SELECT * FROM t WHERE upper(b) = 'X'") == []
        assert _both("SELECT * FROM t WHERE a != 3") == []  # no != prune
        assert _both("SELECT * FROM t WHERE NOT a = 3") == []

    def test_foreign_qualifier_rejected(self):
        # a qualifier that is neither the table nor its alias could be
        # a lateral/correlated name — never attribute it to this table
        assert _both("SELECT * FROM t WHERE o.a = 1") == []
        # an alias REPLACES the name (Spark rejects t.a once t is
        # aliased u) — honoring the raw name would mis-attribute in
        # `FROM a x JOIN b a` where one table's alias is another's name
        assert extract_predicates(
            "SELECT * FROM t u WHERE t.a = 1", "t", "u") == []
        assert extract_predicates(
            "SELECT * FROM t u WHERE u.a = 1", "t", "u") == [
            ("a", "=", 1)]

    def test_exotic_escapes_refused(self):
        # quote_literal only ever writes \\ and \'; anything else
        # decodes differently in Spark's lexer (\n -> newline) and
        # must contribute nothing
        assert _both(r"SELECT * FROM t WHERE a = 'x\ny'") == []
        assert _both(r"SELECT * FROM t WHERE a = 'x\ty' AND b = 1") == [
            ("b", "=", 1)]

    def test_alias_shadowing_never_misattributes(self):
        sql = ("SELECT * FROM a x JOIN b a ON x.k = a.k "
               "WHERE a.col = 5 AND x.v = 1")
        # qualifier `a` binds to table b (its alias), never to table a
        assert extract_predicates(sql, "a", "x",
                                  qualified_only=True) == [("v", "=", 1)]
        assert extract_predicates(sql, "b", "a",
                                  qualified_only=True) == [("col", "=", 5)]

    def test_string_escaping_dialects(self):
        assert _both(
            "SELECT * FROM t WHERE a = 'it''s' AND b = 'p\\'q'") == [
            ("a", "=", "it's"), ("b", "=", "p'q")]

    def test_where_in_subquery_not_confused(self):
        # single-table guard already bails on the two-FROM shape, and
        # the raw extractor must not pick up the inner WHERE either
        sql = ("SELECT * FROM t WHERE a IN "
               "(SELECT x FROM s WHERE s.y = 9)")
        assert single_table(sql) is None
        assert extract_predicates(sql, "t", None) == []

    def test_order_by_and_limit_not_swallowed(self):
        assert _both(
            "SELECT * FROM t WHERE a = 1 ORDER BY b LIMIT 5") == [
            ("a", "=", 1)]


class TestInnerJoinTables:
    def test_accepts_pure_inner_chains(self):
        from corkscrew_spark.predicates import inner_join_tables as ijt

        assert ijt("SELECT * FROM a JOIN b ON a.k = b.k WHERE a.x=1") \
            == [("a", None), ("b", None)]
        assert ijt("SELECT * FROM a x INNER JOIN b AS y ON x.k = y.k "
                   "JOIN c ON c.k = x.k WHERE x.v > 2") \
            == [("a", "x"), ("b", "y"), ("c", None)]

    def test_rejects_everything_else(self):
        from corkscrew_spark.predicates import inner_join_tables as ijt

        for sql in (
            "SELECT * FROM a LEFT JOIN b ON a.k=b.k",
            "SELECT * FROM a FULL OUTER JOIN b ON a.k=b.k",
            "SELECT * FROM a CROSS JOIN b",
            "SELECT * FROM a JOIN b USING (k)",
            "SELECT * FROM a, b WHERE a.k=b.k",
            "SELECT * FROM a JOIN (SELECT * FROM b) s ON a.k=s.k",
            "SELECT * FROM a WHERE x=1",  # single table: not a chain
            "SELECT * FROM a JOIN b ON a.k=b.k UNION SELECT * FROM c",
            "WITH c AS (SELECT 1) SELECT * FROM a JOIN b ON a.k=b.k",
        ):
            assert ijt(sql) is None, sql

    def test_qualified_only_extraction(self):
        from corkscrew_spark.predicates import extract_predicates

        sql = ("SELECT * FROM a x JOIN b ON x.k = b.k "
               "WHERE x.v > 2 AND b.w = 3 AND v2 = 5")
        # per-table, explicitly-qualified conjuncts only: the bare `v2`
        # could belong to either table and must never be attributed
        assert extract_predicates(sql, "a", "x", qualified_only=True) \
            == [("v", ">", 2)]
        assert extract_predicates(sql, "b", None, qualified_only=True) \
            == [("w", "=", 3)]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _COLS = st.sampled_from(["k", "v", "day", "big_col_2"])
    _NUMS = st.one_of(st.integers(-10**6, 10**6),
                      st.floats(-1e6, 1e6, allow_nan=False,
                                allow_infinity=False).map(
                          lambda f: round(f, 3)))
    _STRS = st.text(
        alphabet=st.characters(
            codec="ascii", exclude_characters="\x00"),
        max_size=12)

    def _render(pred) -> str:
        from corkscrew_spark.engine import quote_literal

        col, op, v = pred
        if op in ("<", "<=", ">", ">=", "="):
            return f"{col} {'=' if op == '=' else op} {quote_literal(v)}"
        if op == "between":
            return (f"{col} BETWEEN {quote_literal(v[0])} "
                    f"AND {quote_literal(v[1])}")
        if op == "in":
            return f"{col} IN ({', '.join(quote_literal(m) for m in v)})"
        return f"{col} IS NULL" if op == "is_null" else f"{col} IS NOT NULL"

    _PRED = st.one_of(
        st.tuples(_COLS, st.sampled_from(["<", "<=", ">", ">=", "="]),
                  st.one_of(_NUMS, _STRS)),
        st.tuples(_COLS, st.just("between"), st.tuples(_NUMS, _NUMS)),
        st.tuples(_COLS, st.just("in"),
                  st.lists(st.one_of(_NUMS, _STRS), min_size=1,
                           max_size=4)),
        st.tuples(_COLS, st.sampled_from(["is_null", "is_not_null"]),
                  st.none()),
    )

    @settings(max_examples=300, deadline=None)
    @given(preds=st.lists(_PRED, min_size=1, max_size=5))
    def test_roundtrip_through_quote_literal(preds):
        """Render arbitrary conjuncts with the engine's own literal
        quoting, parse them back, and require EXACT recovery — the
        extractor and the binder must agree on one escaping dialect, or
        a bound :param value would prune on the wrong string."""
        sql = "SELECT * FROM t WHERE " + " AND ".join(
            _render(p) for p in preds)
        got = extract_predicates(sql, "t", None)
        assert got == [tuple(p) for p in preds]
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


class TestDisjuncts:
    def test_dnf_extraction(self):
        from corkscrew_spark.predicates import extract_disjuncts

        assert extract_disjuncts(
            "SELECT * FROM t WHERE k < 10 OR k >= 700", "t") == [
            [("k", "<", 10)], [("k", ">=", 700)]]
        assert extract_disjuncts(
            "SELECT * FROM t WHERE (k < 10 AND v = 1) OR k >= 700",
            "t") == [[("k", "<", 10), ("v", "=", 1)], [("k", ">=", 700)]]
        # a subset of a disjunct's conjuncts is sound
        assert extract_disjuncts(
            "SELECT * FROM t WHERE (k < 10 AND upper(s)='X') OR k > 7",
            "t") == [[("k", "<", 10)], [("k", ">", 7)]]

    def test_dnf_stand_downs(self):
        from corkscrew_spark.predicates import extract_disjuncts

        for sql in (
            "SELECT * FROM t WHERE k < 10",              # no OR
            "SELECT * FROM t WHERE k < 10 OR upper(s) = 'X'",  # bare disj.
            "SELECT * FROM t WHERE k < 10 OR (v = 1 OR v = 2)",
        ):
            assert extract_disjuncts(sql, "t") is None, sql
        # an unqualified disjunct in multi-table mode is unattributable
        assert extract_disjuncts(
            "SELECT * FROM a x JOIN b ON x.k=b.k "
            "WHERE x.v = 1 OR w = 2", "a", "x",
            qualified_only=True) is None


class TestCaseExpressions:
    def test_case_conjunct_extracts_nothing_from_inside(self):
        """CASE nests AND/OR without parens: splitting through it mints
        predicates the WHERE does not imply (high-severity review
        finding — verified wrong-rows repro before the fix, f5057ad).
        The span collapser swallows CASE…END whole: the conjunct it
        sits in contributes nothing, ever."""
        from corkscrew_spark.predicates import extract_disjuncts

        bad = ("SELECT * FROM t WHERE CASE WHEN a = 1 AND q = 2 "
               "OR y = 2 AND z = 3 THEN 1 ELSE 0 END = 0")
        assert extract_predicates(bad, "t") == []
        assert extract_disjuncts(bad, "t") is None
        bad2 = ("SELECT * FROM t WHERE CASE WHEN a = 1 AND q = 2 "
                "AND b = 3 THEN 1 ELSE 0 END = 0")
        assert extract_predicates(bad2, "t") == []
        # a column literally named `case` (unmatched span — no END)
        # stands the whole clause down, never crashes
        assert extract_predicates(
            "SELECT * FROM t WHERE case = 1 AND k = 2", "t") == []
        # a depth-0 END (column named `end`) drops only ITS term —
        # a real span always opens with CASE, so no span can be
        # mis-delimited; the sibling keeps pruning (r9 review fix)
        assert extract_predicates(
            "SELECT * FROM t WHERE k = 1 AND end = 2", "t") == [
            ("k", "=", 1)]

    def test_clean_conjuncts_next_to_case_keep_pruning(self):
        """The round-6 wholesale stand-down dropped pruning for ANY
        WHERE containing a CASE; the span collapser keeps the clean
        top-level conjuncts (VERDICT r6 item 4)."""
        from corkscrew_spark.predicates import extract_disjuncts

        sql = ("SELECT * FROM t WHERE k >= 5 AND CASE WHEN a = 1 "
               "AND q = 2 OR y = 3 THEN 1 ELSE 0 END = 1 AND v = 2")
        assert extract_predicates(sql, "t") == [
            ("k", ">=", 5), ("v", "=", 2)]
        # nested CASE: END closes the innermost span
        nested = ("SELECT * FROM t WHERE k >= 5 AND CASE WHEN "
                  "CASE WHEN a = 1 AND b = 2 THEN 1 END = 1 "
                  "THEN 1 ELSE 0 END = 0")
        assert extract_predicates(nested, "t") == [("k", ">=", 5)]
        # DNF: each branch keeps its clean conjuncts; the CASE-only
        # branch would be unconstrained, so that shape stands down
        ok = ("SELECT * FROM t WHERE (k < 10 AND CASE WHEN v = 1 "
              "OR v = 2 THEN 1 ELSE 0 END = 1) OR k >= 700")
        assert extract_disjuncts(ok, "t") == [
            [("k", "<", 10)], [("k", ">=", 700)]]
        assert extract_disjuncts(
            "SELECT * FROM t WHERE CASE WHEN a = 1 THEN 1 END = 1 "
            "OR k > 5", "t") is None

    def test_case_crossing_paren_stands_down(self):
        # malformed: the CASE span escapes its enclosing parenthesis;
        # collapsing would unbalance the splitters' depth tracking
        assert extract_predicates(
            "SELECT * FROM t WHERE (k = 1 AND CASE WHEN a THEN 1) "
            "END = 0", "t") == []

    def test_fully_parenthesized_clauses_still_extract(self):
        from corkscrew_spark.predicates import extract_disjuncts

        assert extract_predicates(
            "SELECT * FROM t WHERE (a = 1 AND b = 2)", "t") == [
            ("a", "=", 1), ("b", "=", 2)]
        assert extract_disjuncts(
            "SELECT * FROM t WHERE (k < 10 OR k >= 700)", "t") == [
            [("k", "<", 10)], [("k", ">=", 700)]]


class TestBareCaseKeywordColumns:
    """A column unquoted-named end/when/then/else (non-reserved in
    Spark; `end` is common in period tables) must drop ONLY its own
    term — the old whole-statement stand-down erased clean siblings'
    pruning, and under an armed governor refused admissible queries on
    the resulting bare full-scan estimate."""

    def test_end_column_keeps_sibling_pruning(self):
        from corkscrew_spark.predicates import (extract_disjuncts,
                                                extract_predicates)

        q = "SELECT * FROM spans WHERE end >= 5 AND tenant = 'x'"
        assert extract_predicates(q, "spans") == [("tenant", "=", "x")]
        q2 = "SELECT * FROM t WHERE (end > 1 AND k = 2) OR k = 3"
        assert extract_disjuncts(q2, "t") == [[("k", "=", 2)],
                                              [("k", "=", 3)]]
        # a real CASE span still collapses whole, siblings keep
        q3 = ("SELECT * FROM t WHERE CASE WHEN a = 1 THEN 1 ELSE 0 "
              "END = 1 AND tenant = 'x'")
        assert extract_predicates(q3, "t") == [("tenant", "=", "x")]
        # a column named `case` (opens an unmatched span) still stands
        # the whole clause down — only the CLOSING keywords are safe
        q4 = "SELECT * FROM t WHERE case = 1 AND k = 2"
        assert extract_predicates(q4, "t") == []


class TestRewriteTableRefs:
    """rewrite_table_refs splices pruned-view names into the FROM/JOIN
    positions of shapes single_table/inner_join_tables accept, keeping
    qualified column refs resolvable via an appended alias."""

    def test_unaliased_single_table_gets_alias_back(self):
        from corkscrew_spark.predicates import rewrite_table_refs

        out = rewrite_table_refs(
            "SELECT t.k FROM t WHERE t.k >= 7", {"t": "t__skip_1"})
        assert out == "SELECT t.k FROM t__skip_1 AS t WHERE t.k >= 7"

    def test_aliased_ref_keeps_its_alias(self):
        from corkscrew_spark.predicates import rewrite_table_refs

        out = rewrite_table_refs(
            "SELECT w.k FROM t w WHERE w.k >= 7", {"t": "t__skip_2"})
        assert out == "SELECT w.k FROM t__skip_2 w WHERE w.k >= 7"
        out = rewrite_table_refs(
            "SELECT w.k FROM t AS w WHERE w.k >= 7", {"t": "t__skip_2"})
        assert out == "SELECT w.k FROM t__skip_2 AS w WHERE w.k >= 7"

    def test_join_chain_rewrites_each_mapped_ref(self):
        from corkscrew_spark.predicates import rewrite_table_refs

        sql = ("SELECT f.k, d.nm FROM facts f JOIN dims d "
               "ON f.d = d.d WHERE f.k >= 700")
        out = rewrite_table_refs(sql, {"facts": "facts__skip_3"})
        assert out == ("SELECT f.k, d.nm FROM facts__skip_3 f JOIN dims d "
                       "ON f.d = d.d WHERE f.k >= 700")
        both = rewrite_table_refs(sql, {"facts": "fx", "dims": "dx"})
        assert both == ("SELECT f.k, d.nm FROM fx f JOIN dx d "
                        "ON f.d = d.d WHERE f.k >= 700")

    def test_case_insensitive_match_preserves_original_spelling(self):
        from corkscrew_spark.predicates import rewrite_table_refs

        out = rewrite_table_refs(
            "SELECT * FROM Estate WHERE k = 1", {"estate": "v9"})
        assert out == "SELECT * FROM v9 AS Estate WHERE k = 1"

    def test_backquoted_ref(self):
        from corkscrew_spark.predicates import rewrite_table_refs

        out = rewrite_table_refs(
            "SELECT * FROM `estate` WHERE k = 1", {"estate": "v9"})
        assert out == "SELECT * FROM v9 AS `estate` WHERE k = 1"

    def test_name_inside_literals_and_columns_untouched(self):
        from corkscrew_spark.predicates import rewrite_table_refs

        out = rewrite_table_refs(
            "SELECT t FROM t WHERE s = 'FROM t'", {"t": "v1"})
        assert out == "SELECT t FROM v1 AS t WHERE s = 'FROM t'"

    def test_no_mapped_ref_or_unlexable_returns_none(self):
        from corkscrew_spark.predicates import rewrite_table_refs

        assert rewrite_table_refs(
            "SELECT * FROM other WHERE k = 1", {"t": "v1"}) is None
        assert rewrite_table_refs(
            "SELECT * FROM t WHERE s = $$", {"t": "v1"}) is None


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # columns k/v are "clean"; p0..p3 exist ONLY inside CASE spans —
    # the property is that no predicate is ever minted from them
    _CLEAN = st.sampled_from([
        ("k >= 5", ("k", ">=", 5)),
        ("v = 2", ("v", "=", 2)),
        ("k BETWEEN 1 AND 9", ("k", "between", (1, 9))),
        ("v IN (1, 2)", ("v", "in", [1, 2])),
    ])
    _BOOL_OP = st.sampled_from(["AND", "OR"])
    _PCOND = st.sampled_from(["p0 = 1", "p1 > 2", "p2 <= 3", "p3 = 0"])

    @st.composite
    def _case_term(draw, depth=0):
        conds = draw(st.lists(_PCOND, min_size=1, max_size=3))
        ops = draw(st.lists(_BOOL_OP, min_size=len(conds) - 1,
                            max_size=len(conds) - 1))
        cond = conds[0]
        for op, c in zip(ops, conds[1:]):
            cond += f" {op} {c}"
        inner = ("1" if depth else
                 draw(st.one_of(st.just("1"), _case_term(depth=1))))
        tail = draw(st.sampled_from(["", " ELSE 0"]))
        cmp = draw(st.sampled_from(["= 1", "= 0", ">= 1"]))
        return f"CASE WHEN {cond} THEN {inner}{tail} END {cmp}"

    @settings(max_examples=300, deadline=None)
    @given(clean=st.lists(_CLEAN, min_size=0, max_size=3),
           cases=st.lists(_case_term(), min_size=1, max_size=2),
           data=st.data())
    def test_case_fuzz_never_mints_predicates_from_inside_a_span(
            clean, cases, data):
        """For any AND-mix of clean conjuncts and CASE…END terms, the
        extraction is EXACTLY the clean conjuncts — nothing from inside
        a CASE span ever leaks out (that was the f5057ad wrong-rows
        hole), and the clean terms are never lost (the round-7
        retention win)."""
        terms = [t for t, _p in clean] + list(cases)
        order = data.draw(st.permutations(range(len(terms))))
        where = " AND ".join(terms[i] for i in order)
        got = extract_predicates(f"SELECT * FROM t WHERE {where}", "t")
        assert sorted(map(repr, got)) \
            == sorted(repr(p) for _t, p in clean)
        assert not any(c.startswith("p") for c, _op, _v in got)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


class TestStatementSegments:
    """statement_segments: CTE bodies + final query as independently
    prunable spans, with CTE names for shadow exclusion."""

    def test_spans_and_names(self):
        from corkscrew_spark.predicates import statement_segments

        sql = ("WITH a AS (SELECT * FROM t WHERE k > 5), "
               "b AS (SELECT * FROM a) SELECT * FROM b")
        segs = statement_segments(sql)
        assert segs is not None
        spans, names = segs
        assert names == {"a", "b"}
        texts = [sql[s:e] for s, e in spans]
        assert texts[0] == "SELECT * FROM t WHERE k > 5"
        assert texts[1] == "SELECT * FROM a"
        assert texts[2] == "SELECT * FROM b"

    def test_column_alias_list_and_nested_parens(self):
        from corkscrew_spark.predicates import statement_segments

        sql = ("WITH a (x, y) AS (SELECT k, (v + 1) FROM t "
               "WHERE k IN (1, 2)) SELECT max(x) FROM a")
        spans, names = statement_segments(sql)
        assert names == {"a"}
        assert sql[slice(*spans[0])].startswith("SELECT k, (v + 1)")
        assert sql[slice(*spans[1])] == "SELECT max(x) FROM a"

    def test_not_with_or_recursive_or_malformed(self):
        from corkscrew_spark.predicates import statement_segments

        assert statement_segments("SELECT * FROM t") is None
        assert statement_segments(
            "WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r") is None
        assert statement_segments("WITH a AS (SELECT 1") is None  # unbalanced
        assert statement_segments("WITH a AS SELECT 1") is None
        assert statement_segments("WITH a AS (SELECT 1)") is None  # no final
        # a CTE literally NAMED recursive is a normal CTE
        segs = statement_segments(
            "WITH recursive AS (SELECT 1 AS x) SELECT * FROM recursive")
        assert segs is not None and segs[1] == {"recursive"}


class TestDerivedTableSpans:
    """derived_table_spans: depth-1 `FROM (SELECT …) t` bodies as
    independently prunable spans — the non-CTE spelling of the
    compliance-pack shape."""

    def test_from_and_join_positions(self):
        from corkscrew_spark.predicates import derived_table_spans

        sql = ("SELECT * FROM (SELECT a FROM t WHERE k > 5) d "
               "WHERE a > 1")
        [s] = derived_table_spans(sql)
        assert sql[slice(*s)].strip() == "SELECT a FROM t WHERE k > 5"
        sql2 = ("SELECT * FROM big b JOIN "
                "(SELECT x FROM dim WHERE v = 1) d ON b.x = d.x")
        [s2] = derived_table_spans(sql2)
        assert sql2[slice(*s2)].strip() == "SELECT x FROM dim WHERE v = 1"
        # two derived tables: both spans, in order, disjoint
        sql3 = ("SELECT * FROM (SELECT a FROM t WHERE k > 1) x JOIN "
                "(SELECT b FROM u WHERE j < 2) y ON x.a = y.b")
        got = derived_table_spans(sql3)
        assert len(got) == 2 and got[0][1] <= got[1][0]

    def test_non_table_subqueries_never_match(self):
        from corkscrew_spark.predicates import derived_table_spans

        assert derived_table_spans(
            "SELECT * FROM t WHERE k IN (SELECT k FROM u)") == []
        assert derived_table_spans(
            "SELECT * FROM t WHERE EXISTS (SELECT 1 FROM u)") == []
        # LATERAL sits between the keyword and the paren: correlated
        # subqueries are structurally excluded
        assert derived_table_spans(
            "SELECT * FROM t JOIN LATERAL (SELECT 1) x") == []
        # scalar subquery in the SELECT list: not in table position
        assert derived_table_spans(
            "SELECT (SELECT max(k) FROM u) FROM t") == []
        # unions/plain parens in table position don't start with SELECT
        assert derived_table_spans(
            "SELECT * FROM ((SELECT 1) UNION ALL (SELECT 2)) t") == []

    def test_depth_one_only_and_unbalanced(self):
        from corkscrew_spark.predicates import derived_table_spans

        sql = ("SELECT * FROM (SELECT * FROM "
               "(SELECT a FROM t WHERE k > 5) i) o")
        [s] = derived_table_spans(sql)  # outer body only, whole
        assert sql[slice(*s)].strip().startswith("SELECT * FROM (SELECT")
        assert derived_table_spans("SELECT * FROM (SELECT a FROM t") == []


class TestJoinChainTables:
    """join_chain_tables: INNER/LEFT chains with per-table prunability
    (preserved sides only); inner_join_tables stays inner-strict."""

    def test_left_chain_prunability(self):
        from corkscrew_spark.predicates import (
            inner_join_tables,
            join_chain_tables,
        )

        sql = ("SELECT * FROM f LEFT JOIN d ON f.k = d.k "
               "WHERE f.x >= 1")
        assert join_chain_tables(sql) == [
            ("f", None, True), ("d", None, False)]
        assert inner_join_tables(sql) is None  # inner-strict surface
        sql2 = ("SELECT * FROM a JOIN b ON a.k = b.k "
                "LEFT OUTER JOIN c AS x ON x.k = a.k WHERE a.v = 1")
        assert join_chain_tables(sql2) == [
            ("a", None, True), ("b", None, True), ("x", None, False)] \
            or join_chain_tables(sql2) == [
            ("a", None, True), ("b", None, True), ("c", "x", False)]

    def test_right_full_cross_still_bail(self):
        from corkscrew_spark.predicates import join_chain_tables

        for sql in (
            "SELECT * FROM a RIGHT JOIN b ON a.k = b.k",
            "SELECT * FROM a FULL OUTER JOIN b ON a.k = b.k",
            "SELECT * FROM a CROSS JOIN b",
            "SELECT * FROM a LEFT JOIN b USING (k)",
            "SELECT * FROM a, b WHERE a.k = b.k",
            "SELECT * FROM a LEFT JOIN (SELECT 1) s ON true",
        ):
            assert join_chain_tables(sql) is None, sql

    def test_inner_chain_all_prunable(self):
        from corkscrew_spark.predicates import (
            inner_join_tables,
            join_chain_tables,
        )

        sql = ("SELECT * FROM a x INNER JOIN b AS y ON x.k = y.k "
               "JOIN c ON c.k = x.k WHERE x.v > 2")
        assert join_chain_tables(sql) == [
            ("a", "x", True), ("b", "y", True), ("c", None, True)]
        assert inner_join_tables(sql) == [
            ("a", "x"), ("b", "y"), ("c", None)]


class TestSubquerySpans:
    """subquery_spans + mask_subqueries: the EXISTS/IN-subquery halves
    of statement decomposition — the last statement shape (r8 verdict)
    where a scan escaped both pruning and admission control."""

    def test_exists_body_and_mask(self):
        from corkscrew_spark.predicates import (extract_predicates,
                                                mask_subqueries,
                                                single_table,
                                                subquery_spans)

        sql = ("SELECT * FROM small s WHERE s.fk < 100 AND EXISTS "
               "(SELECT 1 FROM big b WHERE b.k >= 700) AND s.v = 3")
        [(ms, bs, be, me)] = subquery_spans(sql)
        assert sql[bs:be].strip().startswith("SELECT 1 FROM big")
        assert sql[ms:ms + 6] == "EXISTS" and sql[me - 1] == ")"
        masked = mask_subqueries(sql, [(ms, me)])
        assert len(masked) == len(sql)
        # enclosing statement now resolves and keeps sibling conjuncts
        assert single_table(masked) == ("small", "s")
        got = extract_predicates(masked, "small", "s")
        assert ("fk", "<", 100) in got and ("v", "=", 3) in got
        # the body is its own single-table statement
        assert single_table(sql[bs:be]) == ("big", "b")
        assert extract_predicates(sql[bs:be], "big", "b") == [
            ("k", ">=", 700)]

    def test_in_select_and_not_exists(self):
        from corkscrew_spark.predicates import (mask_subqueries,
                                                single_table,
                                                subquery_spans)

        sql = ("SELECT * FROM t WHERE t.id IN "
               "(SELECT uid FROM u WHERE tier = 1)")
        [(ms, bs, be, me)] = subquery_spans(sql)
        assert sql[ms:ms + 2] == "IN"
        assert single_table(sql[bs:be]) == ("u", None)
        # NOT stays outside the span: `NOT <mask>` is an unparseable
        # conjunct the splitters skip
        sql2 = ("SELECT * FROM t WHERE NOT EXISTS "
                "(SELECT 1 FROM u WHERE u.x = 1) AND t.k > 5")
        [(m2, b2, e2, x2)] = subquery_spans(sql2)
        assert sql2[m2:m2 + 6] == "EXISTS"
        masked = mask_subqueries(sql2, [(m2, x2)])
        assert single_table(masked) == ("t", None)

    def test_outermost_only_and_literal_in_list(self):
        from corkscrew_spark.predicates import subquery_spans

        # nested subquery: only the OUTER body is reported; the inner
        # one belongs to a subquery_spans call on that body's text
        sql = ("SELECT * FROM a WHERE EXISTS (SELECT 1 FROM b WHERE "
               "EXISTS (SELECT 1 FROM c))")
        [(_m, bs, be, _e)] = subquery_spans(sql)
        inner = subquery_spans(sql[bs:be])
        assert len(inner) == 1
        assert sql[bs:be][inner[0][1]:inner[0][2]].startswith(
            "SELECT 1 FROM c")
        # IN over a literal list is NOT a subquery
        assert subquery_spans("SELECT * FROM t WHERE k IN (1, 2)") == []
        # unbalanced parens: stand down entirely
        assert subquery_spans(
            "SELECT * FROM t WHERE EXISTS (SELECT 1 FROM b") == []


class TestSetOperatorSpans:
    """predicates.set_operator_spans — branch delimitation only; the
    soundness argument (each branch a self-contained SELECT) lives in
    the engine tests that certify pruning + governance through it."""

    def test_basic_union_all(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = ("SELECT a FROM t1 WHERE k > 5 "
               "UNION ALL SELECT a FROM t2 WHERE k < 3")
        spans = set_operator_spans(sql)
        assert [sql[s:e] for s, e in spans] == [
            "SELECT a FROM t1 WHERE k > 5",
            "SELECT a FROM t2 WHERE k < 3"]

    def test_three_branches_mixed_ops(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = ("SELECT a FROM t1 INTERSECT SELECT a FROM t2 "
               "EXCEPT SELECT a FROM t3")
        assert len(set_operator_spans(sql)) == 3

    def test_parenthesized_branches_unwrap_with_tail(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = ("(SELECT a FROM t1 WHERE k>5) UNION "
               "(SELECT a FROM t2) ORDER BY a LIMIT 3")
        assert [sql[s:e] for s, e in set_operator_spans(sql)] == [
            "SELECT a FROM t1 WHERE k>5", "SELECT a FROM t2"]

    def test_nested_set_statement_in_parens_kept_whole(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = ("SELECT a FROM t1 UNION "
               "(SELECT a FROM t2 INTERSECT SELECT a FROM t3)")
        spans = set_operator_spans(sql)
        # the parenthesized branch unwraps to a set statement the
        # engine re-splits via its worklist
        assert [sql[s:e] for s, e in spans] == [
            "SELECT a FROM t1",
            "SELECT a FROM t2 INTERSECT SELECT a FROM t3"]

    def test_star_except_column_list_is_not_a_set_op(self):
        from corkscrew_spark.predicates import set_operator_spans

        assert set_operator_spans(
            "SELECT * EXCEPT (b) FROM t WHERE k > 5") is None

    def test_minus_separates_only_before_select(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = "SELECT a FROM t1 MINUS SELECT a FROM t2"
        assert len(set_operator_spans(sql)) == 2
        # a column named minus never splits
        assert set_operator_spans("SELECT minus FROM t") is None
        assert set_operator_spans(
            "SELECT a, minus FROM t WHERE minus > 3") is None

    def test_depth_gt_zero_union_ignored(self):
        from corkscrew_spark.predicates import set_operator_spans

        # subquery / recursive-CTE unions sit inside parens
        assert set_operator_spans(
            "SELECT * FROM t WHERE k IN "
            "(SELECT k FROM a UNION SELECT k FROM b)") is None

    def test_union_values_stands_down(self):
        from corkscrew_spark.predicates import set_operator_spans

        assert set_operator_spans(
            "SELECT a FROM t UNION VALUES (1)") is None

    def test_scalar_subquery_tail_never_shrunk_away(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = ("(SELECT a FROM t1) UNION "
               "SELECT (SELECT max(k) FROM t3) FROM t2")
        assert [sql[s:e] for s, e in set_operator_spans(sql)] == [
            "SELECT a FROM t1",
            "SELECT (SELECT max(k) FROM t3) FROM t2"]


class TestLooseTableRefs:
    def test_comma_list_with_aliases(self):
        from corkscrew_spark.predicates import loose_table_refs

        assert loose_table_refs(
            "SELECT * FROM a, b x, c AS y WHERE a.k = b.k") == [
            ("a", None), ("b", "x"), ("c", "y")]

    def test_right_full_cross_members(self):
        from corkscrew_spark.predicates import loose_table_refs

        assert loose_table_refs(
            "SELECT * FROM a RIGHT JOIN b ON a.k=b.k "
            "FULL JOIN c ON 1=1") == [
            ("a", None), ("b", None), ("c", None)]

    def test_table_functions_and_qualified_names_skipped(self):
        from corkscrew_spark.predicates import loose_table_refs

        assert loose_table_refs("SELECT * FROM unnest(x) u, db.t2") == []
        # EXTRACT's FROM sits at depth >= 1
        assert loose_table_refs(
            "SELECT extract(month FROM ts) FROM a") == [("a", None)]

    def test_comma_members_after_non_ident_item_still_surface(self):
        """r10 advice: when the FIRST comma-list item is not a plain
        identifier (table function, derived table, db-qualified name),
        the scan used to return [] and every LATER member stayed
        ungoverned — the skipped item is jumped, the rest surface."""
        from corkscrew_spark.predicates import loose_table_refs

        assert loose_table_refs(
            "SELECT * FROM unnest(x) u, b") == [("b", None)]
        assert loose_table_refs(
            "SELECT * FROM (SELECT 1 AS k) d, b y") == [("b", "y")]
        assert loose_table_refs(
            "SELECT * FROM db.t1 a, b") == [("b", None)]
        # skipped members mid-list too, and refs on both sides kept
        assert loose_table_refs(
            "SELECT * FROM a, unnest(x) u, c AS z") == [
            ("a", None), ("c", "z")]
        # a derived table's INNER refs stay unexposed (depth > 0)
        assert loose_table_refs(
            "SELECT * FROM (SELECT k FROM inner_t) d, b") == [
            ("b", None)]

    def test_table_statement_head(self):
        from corkscrew_spark.predicates import (loose_table_refs,
                                                set_operator_spans)

        assert loose_table_refs("TABLE big") == [("big", None)]
        # `table` anywhere else is a column/alias, never a ref
        assert loose_table_refs("SELECT table FROM x") == [("x", None)]
        sql = "SELECT a FROM t1 UNION ALL TABLE t2"
        assert [sql[s:e] for s, e in set_operator_spans(sql)] == [
            "SELECT a FROM t1", "TABLE t2"]

    def test_scalar_subquery_tail_does_not_block_shrink(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = ("(SELECT a FROM t1 WHERE k>5) UNION (SELECT a FROM t2) "
               "ORDER BY (SELECT max(k) FROM t3)")
        assert [sql[s:e] for s, e in set_operator_spans(sql)] == [
            "SELECT a FROM t1 WHERE k>5", "SELECT a FROM t2"]

    def test_paren_table_branch_head(self):
        from corkscrew_spark.predicates import set_operator_spans

        sql = "SELECT a FROM t1 UNION (TABLE t2)"
        assert [sql[s:e] for s, e in set_operator_spans(sql)] == [
            "SELECT a FROM t1", "TABLE t2"]

    def test_double_paren_subquery_recognized(self):
        from corkscrew_spark.predicates import (enclosing_paren_span,
                                                subquery_spans)

        sql = "SELECT * FROM s WHERE fk IN ((SELECT fk FROM b WHERE k > 1))"
        subs = subquery_spans(sql)
        assert len(subs) == 1
        _ms, bs, be, _me = subs[0]
        body = sql[bs:be]
        s0, e0 = enclosing_paren_span(body)
        assert body[s0:e0] == "SELECT fk FROM b WHERE k > 1"
        # no parens: identity span
        assert enclosing_paren_span("SELECT 1") == (0, 8)
        # half-open parens: stand down to identity
        assert enclosing_paren_span("(SELECT 1") == (0, 9)
