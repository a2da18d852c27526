"""KQL-surface queries — raw Kusto pipeline strings compiled by
``corkscrew_spark.kql`` and oracle-checked against DuckDB SQL.

The reference accepts raw KQL for its Azure provider
(``plugins/azure-provider/resource_graph.go:71-118``); these queries
prove the translator end-to-end on the synthetic tables: the *string*
goes in, the compiled DataFrame's results hash-match an independently
written SQL oracle. Verbatim reference query strings are additionally
exercised in ``tests/test_kql.py``.

Scale: each compiles to ordinary filter/groupBy/explode/join plans —
Catalyst pushdown and broadcast selection apply to the translated plan
exactly as to hand-written DataFrame code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from corkscrew_spark.catalog import register_tables
from corkscrew_spark.kql import kql_to_df
from corkscrew_spark.plans.queries import query


@query(
    "kql_events_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*)                        AS n,
           COUNT(DISTINCT user_id)         AS users,
           ROUND(SUM(value), 2)            AS total
    FROM events
    WHERE value >= 0 AND event_type <> 'purchase'
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def kql_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`where`+`summarize count()/dcount()/sum() by`+`order by asc` from a
    raw KQL string (resource_graph.go:83-110 summarize semantics)."""
    return kql_to_df(
        """
        events
        | where value >= 0 and event_type != 'purchase'
        | summarize n = count(), users = dcount(user_id),
                    total = round(sum(value), 2) by event_type
        | order by event_type asc
        """,
        register_tables(spark, sf_dir),
    )


@query(
    "kql_docs_tokens",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (
        SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE lang = 'en'
    )
    WHERE length(tok) >= 6
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 15
    """,
)
def kql_docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`extend split()`+`mv-expand`+`strlen` from a raw KQL string
    (resource_graph.go:134-137 mv-expand/extend usage)."""
    return kql_to_df(
        """
        documents
        | where lang == 'en'
        | extend toks = split(text, ' ')
        | mv-expand tok = toks
        | where strlen(tok) >= 6
        | summarize n = count() by tok
        | order by n desc, tok asc
        | limit 15
        """,
        register_tables(spark, sf_dir),
    )


@query(
    "kql_join_spend",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.n_orders, o.spend
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey             AS c_custkey,
               COUNT(*)              AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS spend
        FROM orders GROUP BY o_custkey
    ) o USING (c_custkey)
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey ASC
    """,
)
def kql_join_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`join kind=leftouter (subquery) on key` from a raw KQL string
    (resource_graph.go:268-280 leftouter join shape), with an aliased
    summarize-by key renaming the join column."""
    return kql_to_df(
        """
        customer
        | where c_mktsegment == 'BUILDING'
        | join kind=leftouter (
            orders
            | summarize n_orders = count(),
                        spend = round(sum(o_totalprice), 2) by c_custkey = o_custkey
        ) on c_custkey
        | project c_custkey, c_name, n_orders, spend
        | order by c_custkey asc
        """,
        register_tables(spark, sf_dir),
    )


@query(
    "kql_time_bins",
    oracle="""
    SELECT date_trunc('day', ts)          AS day,
           COUNT(*)                       AS n,
           COUNT(DISTINCT event_type)     AS types
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15'
    GROUP BY date_trunc('day', ts)
    ORDER BY day ASC
    LIMIT 10
    """,
)
def kql_time_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KQL time bucketing from a raw string: unquoted datetime literal in
    the filter, `startofday()` as the summarize key — resourcechanges
    timeline shape (resource_graph.go:193-198)."""
    return kql_to_df(
        """
        events
        | where ts >= datetime(2024-01-15T00:00:00Z)
        | summarize n = count(), types = dcount(event_type) by day = startofday(ts)
        | order by day asc
        | limit 10
        """,
        register_tables(spark, sf_dir),
    )
