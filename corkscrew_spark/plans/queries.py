"""Named query library — the oracle-checked operator surface.

Each entry demonstrates one operator family from the reference's declared
SQL surface (SURVEY.md §2.3-§2.8), re-expressed as a DataFrame program on
the driver-provided synthetic tables, together with an equivalent ANSI-SQL
oracle string that DuckDB runs on the same parquet files.

Reference parity notes are in each docstring as file:line cites into
/root/reference (the semantics being reproduced, not the code).

Determinism rules (both engines must produce hash-identical results):
* every aggregate / computed column is explicitly aliased, same name both
  sides (driver sorts columns by name before hashing);
* floating aggregates are ROUNDed (2dp for sums, 4dp for avgs) — the two
  engines sum doubles in different orders, rounding absorbs the ulp drift;
* any LIMIT/top-k has a total deterministic ordering (unique tie-break key);
* raw nanosecond timestamps are never returned (Spark truncates parquet ns
  to µs); dates / date_trunc values are returned instead;
* integer SUMs are cast to BIGINT (DuckDB widens to HUGEINT, Spark to LONG);
* a trailing ORDER BY that feeds no LIMIT is omitted on the Spark side
  (r12): the driver's value-hash is order-insensitive, and a global sort
  costs a range exchange whose partition-boundary sampling RE-EXECUTES the
  upstream plan — for map-only tails that doubles the query (measured 2.0×
  on text_classifier_score/text_repetition at sf0.1). Oracles keep their
  ORDER BY (DuckDB cost is not measured). Sorts that ARE the demonstrated
  operator, or that tie-break a LIMIT/top-k, stay.

Scale notes: dimension tables (region/nation/supplier/part at these SFs)
are broadcast explicitly; fact-fact joins shuffle on their keys and rely on
AQE for skew; nothing here collects to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corkscrew_spark.catalog import register_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return register_tables(spark, sf_dir)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5)
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                           AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
           ROUND(AVG(l_quantity), 4)                                AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                           AS avg_price,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate rollup (telemetry-rollup shape, graph_loader.go:531-592).

    Scale: single shuffle on a low-cardinality key with map-side partial
    aggregation; filter reaches the parquet scan (PushedFilters).
    """
    li = _t(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "region_rollup",
    oracle="""
    SELECT r_name,
           COUNT(*)                   AS customer_count,
           ROUND(SUM(c_acctbal), 2)   AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY customer_count DESC, r_name
    """,
)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY count + sort (graph_loader.go:361-376) over a dim join chain.

    nation/region are broadcast — the customer fact never shuffles for the
    join, only for the final tiny aggregation.
    """
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("customer_count"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "top_customers",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(o_totalprice), 2) AS total_spend,
           COUNT(*)                    AS order_count
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + deterministic top-N (converter.go:308-323 shape).

    Aggregates on the join key first; the ORDER BY runs on the already
    reduced per-customer rollup, so the sort is over |customers| rows,
    and Spark executes LIMIT as a TakeOrderedAndProject (no global sort).
    """
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count("*").alias("order_count"),
        )
        .orderBy(F.desc("total_spend"), "c_custkey")
        .limit(10)
    )


@query(
    "count_distinct_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id)  AS unique_users,
           CAST(MIN(ts) AS DATE)    AS first_seen,
           CAST(MAX(ts) AS DATE)    AS last_seen,
           COUNT(*)                 AS event_count
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def count_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT)+MIN/MAX per group — the resource_counts_by_provider
    view (unified_schema.go:469-481)."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("unique_users"),
            F.min(F.to_date("ts")).alias("first_seen"),
            F.max(F.to_date("ts")).alias("last_seen"),
            F.count("*").alias("event_count"),
        )
    )


@query(
    "telemetry_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*)                                                   AS total_calls,
           CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS successful_calls,
           ROUND(AVG(value), 4)                                       AS avg_duration,
           ROUND(MAX(value), 2)                                       AS max_duration,
           CAST(MAX(ts) AS DATE)                                      AS last_execution
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05'
    GROUP BY event_type
    ORDER BY total_calls DESC, event_type
    """,
)
def telemetry_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The API-telemetry rollup, exactly graph_loader.go:531-592: COUNT,
    conditional SUM, AVG, MAX, last-execution — with the time-range
    predicate pushed to the scan."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.filter(F.col("ts") >= F.lit("2024-01-05"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("total_calls"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
            .cast("long")
            .alias("successful_calls"),
            F.round(F.avg("value"), 4).alias("avg_duration"),
            F.round(F.max("value"), 2).alias("max_duration"),
            F.max(F.to_date("ts")).alias("last_execution"),
        )
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (SURVEY §2.3)
# ---------------------------------------------------------------------------

@query(
    "filter_project_sort",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part
    WHERE p_retailprice > 910 AND p_size >= 25
    ORDER BY p_name, p_partkey
    """,
)
def filter_project_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality/range filter + projection + sort (graph_loader.go:299-313).
    Both predicates and the 4-column projection push into the parquet scan."""
    p = _t(spark, sf_dir)["part"]
    return (
        p.filter((F.col("p_retailprice") > 910) & (F.col("p_size") >= 25))
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy("p_name", "p_partkey")
    )


@query(
    "filter_range_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1999-01-01'
    ORDER BY o_orderkey
    LIMIT 50
    """,
)
def filter_range_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic AND-filter builder + LIMIT (converter.go:84-103): chained
    filters with a deterministic ORDER BY under the LIMIT."""
    o = _t(spark, sf_dir)["orders"]
    return (
        o.filter((F.col("o_orderstatus") == "O") & (F.col("o_orderdate") >= F.lit("1999-01-01")))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.to_date("o_orderdate").alias("order_date"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


@query(
    "like_filter",
    oracle="""
    SELECT lang, COUNT(*) AS doc_count, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE text LIKE '%spark%' AND source LIKE 'src1%'
    GROUP BY lang
    ORDER BY lang
    """,
)
def like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / string predicates (bucket_deletion_protection.sql:37-39)."""
    d = _t(spark, sf_dir)["documents"]
    return (
        d.filter(F.col("text").like("%spark%") & F.col("source").like("src1%"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "time_range_agg",
    oracle="""
    SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
           COUNT(*)             AS events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15'
    GROUP BY 1
    ORDER BY day
    """,
)
def time_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range predicate (graph_loader.go:543; change_storage.go:498-506)
    with a per-day rollup; fixed literal cutoff keeps the oracle stable.

    Scans through load_table_between so the range bound is applied to the
    raw nanos column and pushed into the parquet scan (row-group pruning)
    instead of filtering after the ns→µs conversion."""
    from corkscrew_spark.catalog import load_table_between

    ev = load_table_between(spark, sf_dir, "events", "ts", start="2024-01-15")
    return (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count("*").alias("events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "in_list_filter",
    oracle="""
    SELECT user_id, COUNT(*) AS error_signup_events
    FROM events
    WHERE event_type IN ('error', 'signup')
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    ORDER BY user_id
    """,
)
def in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamically-built IN-list predicates (change_storage.go:509-539)."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.filter(F.col("event_type").isin("error", "signup"))
        .groupBy("user_id")
        .agg(F.count("*").alias("error_signup_events"))
        .filter(F.col("error_signup_events") >= 3)
    )


@query(
    "case_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END   AS bucket,
           COUNT(*)                AS order_count,
           ROUND(SUM(o_totalprice), 2) AS bucket_value
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-expression severity/status derivation
    (bucket_deletion_protection.sql:82-92)."""
    o = _t(spark, sf_dir)["orders"]
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("bucket_value"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ---------------------------------------------------------------------------

@query(
    "left_join_histogram",
    oracle="""
    SELECT order_count, COUNT(*) AS num_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY order_count
    ORDER BY order_count
    """,
)
def left_join_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers
    (compliance CTE joins, bucket_deletion_protection.sql:66-69)."""
    t = _t(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_cust.groupBy("order_count")
        .agg(F.count("*").alias("num_customers"))
    )


@query(
    "semi_join",
    oracle="""
    SELECT n_name, COUNT(*) AS active_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence check as LEFT SEMI join (relationships.go:377-386)."""
    t = _t(spark, sf_dir)
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("active_customers"))
    )


@query(
    "anti_join",
    oracle="""
    SELECT n_name, COUNT(*) AS inactive_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-06-01'
    )
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti semantics — the untrusted-keys NULL-check pattern
    (untrusted_kms_keys.sql:26-34) expressed as a proper anti join.
    The date filter keeps the result non-empty at every scale factor
    (at sf>=0.01 every customer has at least one all-time order)."""
    t = _t(spark, sf_dir)
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("2000-06-01"))
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("inactive_customers"))
    )


@query(
    "self_join_pairs",
    oracle="""
    SELECT n_name,
           a.s_suppkey AS supp_a,
           b.s_suppkey AS supp_b
    FROM supplier a
    JOIN supplier b ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    JOIN nation ON a.s_nationkey = n_nationkey
    ORDER BY n_name, supp_a, supp_b
    """,
)
def self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-membership pairwise edges — peers-in-VPC / co-located
    (relationships.go:396-464): self-join on the grouping attribute with
    an ordering predicate to emit each unordered pair once."""
    t = _t(spark, sf_dir)
    a = t["supplier"].select(
        F.col("s_suppkey").alias("supp_a"), F.col("s_nationkey").alias("nk_a")
    )
    b = t["supplier"].select(
        F.col("s_suppkey").alias("supp_b"), F.col("s_nationkey").alias("nk_b")
    )
    return (
        a.join(b, (F.col("nk_a") == F.col("nk_b")) & (F.col("supp_a") < F.col("supp_b")))
        .join(F.broadcast(t["nation"]), F.col("nk_a") == F.col("n_nationkey"))
        .select("n_name", "supp_a", "supp_b")
    )


# ---------------------------------------------------------------------------
# Set ops / pagination / windows (SURVEY §2.6, §2.7)
# ---------------------------------------------------------------------------

@query(
    "union_branches",
    oracle="""
    SELECT 'C' || CAST(c_custkey AS VARCHAR) AS id, c_name AS name,
           'customer' AS kind, ROUND(c_acctbal, 2) AS balance
    FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS id, s_name AS name,
           'supplier' AS kind, ROUND(s_acctbal, 2) AS balance
    FROM supplier
    ORDER BY kind, id
    """,
)
def union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL cross-entity view with column renaming — the
    all_cloud_resources view (unified_schema.go:432-462)."""
    t = _t(spark, sf_dir)
    cust = (
        t["customer"]
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("id"),
            F.col("c_name").alias("name"),
            F.lit("customer").alias("kind"),
            F.round("c_acctbal", 2).alias("balance"),
        )
    )
    supp = t["supplier"].select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
        F.round("s_acctbal", 2).alias("balance"),
    )
    return cust.unionByName(supp)


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination via ROW_NUMBER (change_storage.go:558-566):
    deterministic tie-break on the unique key; one shuffle on the
    partition key, no global sort."""
    o = _t(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_lag",
    oracle="""
    SELECT user_id, event_id,
           ROUND(value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 2) AS value_delta
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-resource change timeline with state diffs — GetChangeHistory +
    lag() (change_storage.go:249-272). Window ordering carries the unique
    event_id tie-break so both engines agree under equal timestamps."""
    ev = _t(spark, sf_dir)["events"].filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar functions: JSON / regex / strings (SURVEY §2.6 F1-F8)
# ---------------------------------------------------------------------------

@query(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction — the extract_json/json_path macro family
    (pkg/query/json_helpers.go:20-105) via the JVM-side get_json_object."""
    ev = _t(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).cast("long").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


@query(
    "regex_extract",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, 'spark'))) AS BIGINT) AS spark_mentions,
           COUNT(*) AS docs
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction over text (resource_graph.go:130-147 KQL
    extract_all; relationships.go:497-509 ARN regexes)."""
    d = _t(spark, sf_dir)["documents"]
    mentions = F.size(F.expr("regexp_extract_all(text, 'spark', 0)"))
    return (
        d.groupBy("lang")
        .agg(
            F.sum(mentions).cast("long").alias("spark_mentions"),
            F.count("*").alias("docs"),
        )
    )


@query(
    "string_functions",
    oracle="""
    SELECT split_part(source, 'c', -1)          AS src_num,
           COUNT(*)                             AS docs,
           CAST(MIN(doc_id) AS BIGINT)          AS first_doc
    FROM documents
    WHERE CONTAINS(text, 'merge')
    GROUP BY 1
    ORDER BY src_num
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: split_part w/ negative index + contains
    (untrusted_kms_keys.sql:5,29-30)."""
    d = _t(spark, sf_dir)["documents"]
    return (
        d.filter(F.col("text").contains("merge"))
        .groupBy(F.element_at(F.split("source", "c"), -1).alias("src_num"))
        .agg(
            F.count("*").alias("docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )
