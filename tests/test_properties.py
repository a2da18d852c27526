"""Property-based tests (hypothesis) — beyond the reference's strategy.

The reference has no randomized testing (SURVEY.md §5.7); these pin the
engine's parameter-binding safety and the text-normalization invariants
under arbitrary input, where example-based tests only cover the cases
someone thought of.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from corkscrew_spark.engine import QueryEngine, bind_params, quote_literal

# printable-ish text incl. quotes/backslashes/newlines/unicode
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    max_size=60,
)


@pytest.fixture(scope="module")
def engine(spark):
    return QueryEngine(spark, register_helpers=False)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(value=TEXT)
def test_string_param_roundtrips_exactly(engine, value):
    """Any string bound via :param must come back byte-identical — the
    injection-safety property: no quoting/escape sequence in the value
    can alter the statement."""
    got = engine.spark.sql(bind_params("SELECT :v AS v", {"v": value})).collect()[0].v
    assert got == value


@settings(max_examples=50, deadline=None)
@given(values=st.lists(st.one_of(st.integers(min_value=-10**9, max_value=10**9), TEXT),
                       min_size=0, max_size=5))
def test_in_list_expansion_shape(values):
    """List params expand to a parenthesized literal list (empty → (NULL),
    which matches nothing) without disturbing surrounding SQL."""
    sql = bind_params("SELECT * FROM t WHERE x IN (:ids) AND y = 1", {"ids": values})
    assert sql.startswith("SELECT * FROM t WHERE x IN (") and sql.endswith("AND y = 1")
    if not values:
        assert "IN (NULL)" in sql
    else:
        assert sql.count(",") >= len(values) - 1


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(value=TEXT)
def test_quote_literal_never_escapes_statement(engine, value):
    """The quoted literal is one expression: SELECT <lit> AS a, 2 AS b
    always yields exactly (value, 2) — appended clauses can't leak in."""
    row = engine.spark.sql(f"SELECT {quote_literal(value)} AS a, 2 AS b").collect()[0]
    assert row.a == value and row.b == 2


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(doc=TEXT)
def test_fingerprint_invariants(spark, doc):
    """normalized() is idempotent and fingerprint survives case +
    surrounding-whitespace changes (the dedup key property)."""
    from pyspark.sql import functions as F

    from corkscrew_spark.operators import text as T

    df = spark.createDataFrame([(doc,)], "t string").select(
        T.normalized("t").alias("n1"),
        T.normalized(T.normalized("t")).alias("n2"),
        T.fingerprint("t").alias("f"),
        T.fingerprint(F.upper("t")).alias("f_upper"),
        T.fingerprint(F.concat(F.lit("  "), "t", F.lit("\t"))).alias("f_pad"),
    )
    r = df.collect()[0]
    assert r.n1 == r.n2
    assert r.f == r.f_upper == r.f_pad


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_fuzzy_join_blocking_complete(spark, data):
    """Property: blocked fuzzy_join == brute-force cross join, for random
    corpora with random single/double edits of corpus strings as probes."""
    from pyspark.sql import functions as F

    from corkscrew_spark.operators.fuzzy import fuzzy_join

    alphabet = "abcdef "
    words = data.draw(st.lists(
        st.text(alphabet=alphabet, min_size=1, max_size=12),
        min_size=2, max_size=8, unique=True))
    # probes: corpus words with a random deletion/substitution applied
    probes = []
    for i, w in enumerate(words[:4]):
        pos = data.draw(st.integers(min_value=0, max_value=max(0, len(w) - 1)))
        if data.draw(st.booleans()) and len(w) > 1:
            p = w[:pos] + w[pos + 1:]          # deletion
        else:
            p = w[:pos] + "z" + w[pos + 1:]    # substitution
        probes.append((100 + i, p))
    corpus = [(i, w) for i, w in enumerate(words)]

    l = spark.createDataFrame(probes, ["lid", "ls"])
    r = spark.createDataFrame(corpus, ["rid", "rs"])
    got = {(x.lid, x.rid, x.distance)
           for x in fuzzy_join(l, r, "lid", "ls", "rid", "rs",
                               max_dist=2).collect()}
    want = {(x.lid, x.rid, x.d)
            for x in l.crossJoin(r)
            .withColumn("d", F.levenshtein("ls", "rs"))
            .filter(F.col("d") <= 2)
            .select("lid", "rid", F.col("d").cast("long").alias("d"))
            .collect()}
    assert got == want


# ---------------------------------------------------------------------------
# proto3 wire codec (proto_wire.py)
# ---------------------------------------------------------------------------

_pw_strings = st.text(max_size=40)
_pw_maps = st.dictionaries(st.text(min_size=1, max_size=20),
                           st.text(max_size=20), max_size=5)


@given(st.integers(min_value=0, max_value=2 ** 64 - 1))
def test_varint_roundtrip_any_u64(v):
    from corkscrew_spark import proto_wire as pw

    got, pos = pw.decode_varint(pw.encode_varint(v), 0)
    assert got == v


@given(st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1))
def test_int64_field_roundtrip(v):
    from corkscrew_spark import proto_wire as pw

    desc = {5: ("execution_time_ms", "int64")}
    back = pw.decode(pw.encode({"execution_time_ms": v}, desc), desc)
    assert back["execution_time_ms"] == v


@given(st.fixed_dictionaries({
    "query": _pw_strings,
    "output_format": _pw_strings,
    "parameters": _pw_maps,
    "limit": st.integers(min_value=0, max_value=2 ** 31 - 1),
}))
def test_execute_query_request_roundtrip(msg):
    from corkscrew_spark import proto_wire as pw

    back = pw.decode(pw.encode(msg, pw.API_EXECUTE_QUERY_REQUEST),
                     pw.API_EXECUTE_QUERY_REQUEST)
    assert back == msg


@given(st.lists(st.fixed_dictionaries({"values": _pw_maps}), max_size=4),
       st.lists(_pw_strings, max_size=4),
       _pw_strings)
def test_execute_query_response_roundtrip(rows, columns, error):
    from corkscrew_spark import proto_wire as pw

    msg = {"rows": rows, "columns": columns,
           "row_count": len(rows), "error": error,
           "execution_time_ms": 0}
    back = pw.decode(pw.encode(msg, pw.API_EXECUTE_QUERY_RESPONSE),
                     pw.API_EXECUTE_QUERY_RESPONSE)
    assert back == msg


@given(st.binary(max_size=64))
def test_decode_never_hangs_or_crashes_uncontrolled(buf):
    """Arbitrary bytes either decode (unknown fields skipped, defaults
    filled) or raise ValueError — never an unbounded loop or another
    exception type."""
    from corkscrew_spark import proto_wire as pw

    try:
        out = pw.decode(buf, pw.API_EXECUTE_QUERY_REQUEST)
        assert set(out) == {"query", "output_format", "parameters", "limit"}
    except (ValueError, UnicodeDecodeError):
        pass


# ---------------------------------------------------------------------------
# Partition-scoped merge == flat merge (warehouse.py)
# ---------------------------------------------------------------------------

_regions = ("eu", "us", "ap", "")
# one row per key per batch: duplicate (key, ts) rows in one batch tie
# in the keep-newest window and BOTH paths pick arbitrarily — that's
# merge semantics, not a layout property, so keep it out of the test
_batch = st.dictionaries(
    st.sampled_from("abcdefgh"),                       # key
    st.tuples(st.sampled_from(_regions),               # partition value
              st.integers(min_value=0, max_value=9),   # payload
              st.integers(min_value=0, max_value=5)),  # order ts
    min_size=1, max_size=8).map(
        lambda d: [(k, r, v, ts) for k, (r, v, ts) in sorted(d.items())])


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=st.lists(_batch, min_size=2, max_size=3))
def test_scoped_merge_equals_flat_merge(spark, tmp_path_factory, batches):
    """Differential invariant: a sequence of partition-scoped merges
    reaches exactly the same table contents as the same sequence of
    flat (full-rewrite) merges — partitioning is a layout decision,
    never a semantics one. Keys are region-qualified so merge locality
    holds (a key lives in one partition), as the API requires."""
    import datetime as _dt

    from corkscrew_spark import warehouse

    base = tmp_path_factory.mktemp("scoped_vs_flat")
    scoped, flat = str(base / "scoped"), str(base / "flat")

    def df(rows):
        return spark.createDataFrame(
            [(f"{k}-{r or 'null'}", r, v, _dt.datetime(2024, 1, 1 + ts))
             for k, r, v, ts in rows],
            "id string, region string, v int, scanned_at timestamp")

    for rows in batches:
        warehouse.merge_upsert(spark, scoped, df(rows), ["id"],
                               partition_cols=["region"], count_rows=False)
        warehouse.merge_upsert(spark, flat, df(rows), ["id"],
                               count_rows=False)

    def snap(path):
        # '' partition values read back as null under the hive layout;
        # normalize both sides to compare semantics, not encoding
        return sorted((r.id, r.region or "", r.v)
                      for r in spark.read.parquet(path).collect())

    assert snap(scoped) == snap(flat)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=st.lists(_batch, min_size=2, max_size=3),
       deletes=st.sets(st.sampled_from("abcdefgh"), max_size=4))
def test_scoped_cdc_equals_flat_cdc(spark, tmp_path_factory, batches,
                                    deletes):
    """CDC differential: tombstone batches reach identical tables through
    the scoped and flat paths — including partitions deleted empty."""
    import datetime as _dt

    from corkscrew_spark import warehouse

    base = tmp_path_factory.mktemp("cdc_scoped_vs_flat")
    scoped, flat = str(base / "scoped"), str(base / "flat")

    def df(rows, ts_off=0, op=None):
        return spark.createDataFrame(
            [(f"{k}-{r or 'null'}", r, v,
              _dt.datetime(2024, 1, 1 + ts + ts_off),
              op or "UPSERT")
             for k, r, v, ts in rows],
            "id string, region string, v int, scanned_at timestamp, "
            "op string")

    for rows in batches:
        for path, pc in ((scoped, ["region"]), (flat, None)):
            warehouse.merge_upsert_cdc(spark, path, df(rows), ["id"],
                                       partition_cols=pc,
                                       count_rows=False)
    # tombstone every selected key in every region it may inhabit
    del_rows = [(k, r, 0, 5) for k in sorted(deletes) for r in _regions]
    if del_rows:
        for path, pc in ((scoped, ["region"]), (flat, None)):
            warehouse.merge_upsert_cdc(
                spark, path, df(del_rows, ts_off=10, op="DELETE"),
                ["id"], partition_cols=pc, count_rows=False)

    def snap(path):
        from pyspark.errors import AnalysisException
        try:
            return sorted((r.id, r.region or "", r.v)
                          for r in spark.read.parquet(path).collect())
        except AnalysisException:
            return []

    assert snap(scoped) == snap(flat)


# ---------------------------------------------------------------------------
# KQL compiler robustness (kql.py)
# ---------------------------------------------------------------------------

_KQL_FRAGMENTS = st.lists(st.sampled_from([
    "where value > 5", "where lang == 'en'", "where doc_id == 1",
    "project doc_id, lang", "project-away text", "extend d = value * 2",
    "summarize n = count() by lang", "order by doc_id asc", "take 3",
    "distinct lang", "count", "top 2 by value",
    "where lang =~ 'EN'", "where source has 'web'",
    "summarize m = max(value)", "extend b = bin(ts, 1h)",
]), min_size=0, max_size=4)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(table=st.sampled_from(["documents", "events"]),
       frags=_KQL_FRAGMENTS)
def test_kql_random_pipelines_compile_or_kqlerror(spark, table, frags):
    """Random stage compositions either compile to a runnable plan or
    raise KqlError — never an AnalysisException / AttributeError /
    executor-side crash. (Stages may reference columns a prior
    projection dropped; that must still be a *typed* failure.)"""
    from corkscrew_spark.catalog import register_tables
    from corkscrew_spark.kql import KqlError, kql_to_df

    t = register_tables(spark, "/root/testdata/sf0.001")
    q = " | ".join([table] + frags)
    try:
        df = kql_to_df(q, t)
        df.limit(1).collect()  # end-to-end: the plan actually runs
    except KqlError:
        pass
    except Exception as ex:
        from pyspark.errors import AnalysisException
        # a column dropped by an earlier stage surfaces as Spark's
        # UNRESOLVED_COLUMN at analysis — acceptable, positioned error
        assert isinstance(ex, AnalysisException), (q, type(ex), ex)
