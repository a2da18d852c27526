"""Third wave: multi-join analytics, rollups, checksums, change history.

These exercise the full SQL passthrough surface the reference exposes via
DuckDB (pkg/query/engine.go:130-229 — "the complete relational surface is
available") with the plan shapes that matter at 100 TB: star joins where
every dimension is broadcast and only the fact tables shuffle, partial
aggregation before the shuffle, and ROLLUP subtotals computed in one pass.

Determinism rules as in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corkscrew_spark import changes
from corkscrew_spark.plans.queries import query, _t


@query(
    "regional_revenue",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join (TPC-H Q5 shape) — the scale-critical plan.

    The reference would pass this SQL straight to DuckDB
    (pkg/query/engine.go:130-229); on Spark the shape that survives 100 TB
    is: the two fact tables (lineitem, orders) hash-join on their keys
    while every dimension (customer, supplier, nation, region) is
    broadcast, so the only shuffle is the fact-fact join + final
    aggregation. The date filter is pushed to the orders scan, shrinking
    the shuffled side before the join.
    """
    t = _t(spark, sf_dir)
    dims = (
        F.broadcast(t["customer"]),
        F.broadcast(t["supplier"]),
        F.broadcast(t["nation"]),
        F.broadcast(t["region"]),
    )
    customer, supplier, nation, region = dims
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelated to a left-semi join (TPC-H Q4 shape; the
    reference's existence-validation semi-join J8,
    plugins/aws-provider/relationships.go:377-386). The returned-lineitem
    side is filtered *before* the semi join so only matching keys shuffle;
    semi join keeps orders' row count bounded without a distinct."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "state_checksum",
    oracle="""
    WITH checks AS (
        SELECT p_brand,
               sha256(p_name || '|' || p_type || '|' || CAST(p_size AS VARCHAR))
                   AS state_checksum
        FROM part
    )
    SELECT p_brand,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT state_checksum) AS distinct_states,
           MIN(state_checksum) AS min_checksum
    FROM checks GROUP BY p_brand ORDER BY p_brand
    """,
)
def state_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 resource-state checksum (base_change_tracker.go:105-112 — the
    reference's placeholder impl, upgraded as SURVEY.md suggests to a real
    hash): sha2 over a canonical '|'-joined field string, entirely inside
    whole-stage codegen, then a change-detection-style rollup counting
    distinct states per group."""
    p = _t(spark, sf_dir)["part"]
    checksum = F.sha2(
        F.concat_ws("|", "p_name", "p_type", F.col("p_size").cast("string")), 256
    )
    return (
        p.select("p_brand", checksum.alias("state_checksum"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("state_checksum").alias("distinct_states"),
            F.min("state_checksum").alias("min_checksum"),
        )
    )


@query(
    "rollup_segment_nation",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           CASE WHEN GROUPING(c_nationkey) = 1 THEN -1
                ELSE c_nationkey END AS nationkey,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    ORDER BY segment, nationkey
    """,
)
def rollup_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals — beyond the reference's own queries but inside
    its declared SQL surface (SURVEY.md §2.5 note: "grouping sets / cube /
    rollup ... available free in Spark SQL"). One pass computes detail
    rows, per-segment subtotals, and the grand total; NULL group markers
    are normalized ('ALL' / -1) so both engines hash identically."""
    c = _t(spark, sf_dir)["customer"]
    return (
        c.rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.grouping("c_nationkey").alias("_g_nat"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.when(F.col("_g_nat") == 1, F.lit(-1))
            .otherwise(F.col("c_nationkey"))
            .alias("nationkey"),
            "n_customers",
            "total_balance",
        )
    )


@query(
    "change_history_timeline",
    oracle="""
    WITH ce AS (
        SELECT CAST(user_id AS VARCHAR) AS resource_id,
               'ce-' || CAST(event_id AS VARCHAR) AS id,
               event_type AS change_type,
               value,
               ts
        FROM events
    ), busiest AS (
        SELECT resource_id FROM ce GROUP BY resource_id
        ORDER BY COUNT(*) DESC, resource_id LIMIT 1
    )
    SELECT id, change_type,
           ROUND(value, 2) AS value,
           ROUND(COALESCE(LAG(value) OVER (ORDER BY ts DESC, id), 0.0), 2)
               AS prev_value,
           CAST(date_trunc('day', ts) AS DATE) AS event_date
    FROM ce WHERE resource_id = (SELECT resource_id FROM busiest)
    ORDER BY ts DESC, id
    LIMIT 100
    """,
)
def change_history_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 GetChangeHistory (change_storage.go:249-272): per-resource
    timeline ORDER BY timestamp DESC LIMIT, plus the lag() state-diff
    column SURVEY.md maps it to. The busiest resource is picked by a
    deterministic top-1 aggregate; its timeline is a single narrow
    partition so the window needs no cross-executor state."""
    ev = _t(spark, sf_dir)["events"]
    ce = ev.select(
        F.col("user_id").cast("string").alias("resource_id"),
        F.concat(F.lit("ce-"), F.col("event_id").cast("string")).alias("id"),
        F.col("event_type").alias("change_type"),
        "value",
        F.col("ts").alias("timestamp"),
    )
    busiest = (
        ce.groupBy("resource_id")
        .count()
        .orderBy(F.desc("count"), "resource_id")
        .limit(1)
        .select("resource_id")
    )
    timeline = changes.change_history(
        ce.join(F.broadcast(busiest), "resource_id", "left_semi"),
        resource_id=None,
        limit=100,
    )
    w = Window.orderBy(F.desc("timestamp"), F.asc("id"))
    return timeline.select(
        "id",
        "change_type",
        F.round("value", 2).alias("value"),
        F.round(F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias("prev_value"),
        F.date_trunc("day", "timestamp").cast("date").alias("event_date"),
    )


# --- rows-only: approximate results have no exact oracle --------------------

@query("approx_distinct_users")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3's approximate variant (SURVEY.md maps COUNT(DISTINCT) →
    `approx_count_distinct` for the 100 TB path, where exact distinct is a
    full shuffle of every key). HyperLogLog++ sketch per event_type with
    the exact count alongside so the test can bound the relative error;
    rows-only because two HLL implementations never hash-match."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS order_date
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers broadcast into orders,
    orders (date-pruned at the scan) hash-joined with lineitem, top-10 by
    revenue with a unique tie-break. Both single-table filters reach the
    parquet scans before any join."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < "1997-01-01")
    li = t["lineitem"].filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("order_date")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "customer_order_distribution",
    oracle="""
    SELECT order_count, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY order_count
    ORDER BY n_customers DESC, order_count DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — double aggregation over a left outer join:
    per-customer order counts (zero-order customers kept by the outer
    join; COUNT of the nullable key counts 0 for them), then the count
    histogram. The second aggregation's input is tiny (one row per
    customer), so the heavy shuffle happens exactly once."""
    t = _t(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_cust.groupBy("order_count")
        .agg(F.count("*").alias("n_customers"))
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "pivot_priority_status",
    oracle="""
    SELECT o_orderstatus,
           ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'        THEN o_totalprice END), 2) AS "1-URGENT",
           ROUND(SUM(CASE WHEN o_orderpriority = '2-HIGH'          THEN o_totalprice END), 2) AS "2-HIGH",
           ROUND(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'        THEN o_totalprice END), 2) AS "3-MEDIUM",
           ROUND(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS "4-NOT SPECIFIED",
           ROUND(SUM(CASE WHEN o_orderpriority = '5-LOW'           THEN o_totalprice END), 2) AS "5-LOW"
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: status × priority revenue matrix. Pivot values are passed
    explicitly, so Spark plans ONE aggregation pass (no extra
    distinct-values job) — the pivoted agg is still a single shuffle
    with map-side partials, same cost as the flat groupBy at any scale."""
    o = _t(spark, sf_dir)["orders"]
    out = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return out


@query(
    "unpivot_priority_status",
    oracle="""
    WITH p AS (
        SELECT o_orderstatus,
               ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS "1-URGENT",
               ROUND(SUM(CASE WHEN o_orderpriority = '5-LOW'    THEN o_totalprice END), 2) AS "5-LOW"
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, priority, revenue
    FROM p UNPIVOT (revenue FOR priority IN ("1-URGENT", "5-LOW"))
    ORDER BY o_orderstatus, priority
    """,
)
def unpivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) back to long form — the round-trip partner of
    pivot_priority_status; unpivot is a map-only generate, no shuffle."""
    o = _t(spark, sf_dir)["orders"]
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return (
        wide.unpivot(
            "o_orderstatus", ["1-URGENT", "5-LOW"], "priority", "revenue")
    )


@query(
    "window_rank_family",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           NTILE(4)        OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 4) AS cume,
           FIRST_VALUE(c_custkey) OVER w AS richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, c_custkey
    LIMIT 200
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window family beyond lag/row_number: ntile,
    percent_rank, cume_dist, first_value over one shared window spec —
    Spark plans ALL four in a single WindowExec pass (one shuffle on the
    partition key), which is the property that matters at scale.
    Deterministic via the c_custkey tie-break."""
    c = _t(spark, sf_dir)["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), "c_custkey")
    return (
        c.select(
            "c_mktsegment", "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
            F.first("c_custkey").over(w).alias("richest"),
        )
        .orderBy("c_mktsegment", "c_custkey")
        .limit(200)
    )


@query(
    "intersect_except_branches",
    oracle="""
    WITH y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
         y97 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    SELECT 'both' AS branch, o_custkey
    FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
    UNION ALL
    SELECT 'only_1996' AS branch, o_custkey
    FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
    ORDER BY branch, o_custkey
    """,
)
def intersect_except_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set semantics (U1/U2's missing siblings —
    the reference's DuckDB passthrough accepts both,
    pkg/query/engine.go:130-229). Spark plans both as aggregated
    left-semi / left-anti hash joins on the projected key — one shuffle
    each, no sort."""
    o = _t(spark, sf_dir)["orders"]
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    both = y96.intersect(y97).select(
        F.lit("both").alias("branch"), "o_custkey")
    only96 = y96.distinct().subtract(y97.distinct()).select(
        F.lit("only_1996").alias("branch"), "o_custkey")
    return both.unionByName(only96)


@query(
    "moving_avg_frame",
    oracle="""
    WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                      ROUND(SUM(value), 2) AS revenue
               FROM events GROUP BY 1, 2)
    SELECT event_type, day, revenue,
           ROUND(AVG(revenue) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7,
           CAST(COUNT(*) OVER (
               PARTITION BY event_type ORDER BY day) AS BIGINT) AS days_seen
    FROM d ORDER BY event_type, day
    """,
)
def moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS window frames: 7-day moving average + running count
    per event type. Framed windows share one WindowExec after the daily
    pre-aggregation, so the shuffle carries days, not raw events — the
    pre-agg-then-window layering is what keeps the window input small at
    100 TB. The moving average runs over ROUNDED daily sums so frame
    summation order cannot leak ulp drift."""
    ev = _t(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("revenue"))
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type", "day", "revenue",
        F.round(F.avg("revenue").over(w.rowsBetween(-6, 0)), 4).alias("ma7"),
        F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("days_seen"),
    )


@query(
    "orders_above_cust_avg",
    oracle="""
    WITH a AS (SELECT o_custkey, AVG(o_totalprice) AS ap,
                      CAST(COUNT(*) AS BIGINT) AS n_cust_orders
               FROM orders GROUP BY o_custkey)
    SELECT o.o_orderkey, o.o_custkey,
           ROUND(o.o_totalprice, 2) AS totalprice,
           a.n_cust_orders
    FROM orders o JOIN a ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > 1.5 * a.ap
    ORDER BY o.o_orderkey
    """,
)
def orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-subquery shape (orders 1.5x above their
    customer's average) decorrelated into agg + self-join on the
    customer key — the plan Catalyst produces for the subquery form, and
    the only shape that scales (no per-row re-aggregation). The sf0.01
    margin between price and threshold is >28, so the float predicate is
    engine-stable; the float average itself is never emitted (averages
    of 2-decimal prices sit exactly on rounding boundaries where
    engines' summation order breaks the tie differently)."""
    o = _t(spark, sf_dir)["orders"]
    avgs = o.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("ap"),
        F.count(F.lit(1)).cast("long").alias("n_cust_orders"),
    )
    return (
        o.join(avgs, "o_custkey")
        .filter(F.col("o_totalprice") > 1.5 * F.col("ap"))
        .select(
            "o_orderkey", "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "n_cust_orders",
        )
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE: all four grouping sets (priority x status, each
    alone, grand total) in ONE Expand+aggregate pass — same single
    shuffle as the plain groupBy, 4x the map-side rows, vs four separate
    jobs. Completes the rollup_segment_nation family."""
    o = _t(spark, sf_dir)["orders"]
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "percentile_exact",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (quantile_cont
    semantics) — the exact counterpart to token_quantiles_approx's GK
    sketch. Spark's percentile() aggregates per group in one pass;
    use the approx variant instead when group cardinality explodes."""
    ev = _t(spark, sf_dir)["events"]
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        ev.groupBy("event_type")
        .agg(pct.alias("q"))
        .select(
            "event_type",
            F.round(F.col("q")[0], 4).alias("p25"),
            F.round(F.col("q")[1], 4).alias("p50"),
            F.round(F.col("q")[2], 4).alias("p75"),
        )
    )


@query(
    "variant_json_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS ksum,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS kmax
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    parse_json once, variant_get typed paths — the engine-native JSON
    path (binary-encoded variant, no per-access string re-parse), vs
    kql_parse_props' regex route. Same plan shape as any agg:
    map-side partial over the extracted longs, one shuffle."""
    ev = _t(spark, sf_dir)["events"]
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("ksum"),
            F.max("k").cast("long").alias("kmax"),
        )
    )


@query("distinct_sketch_rollup")
def distinct_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): one
    sketch per event_type, unioned into a grand total WITHOUT touching
    raw data again — the pre-aggregation pattern that makes 100 TB
    distinct-count rollups cheap (per-partition sketches merge in bytes,
    the raw keys never reshuffle). Rows-only: sketch estimates are
    engine-native; the error bound and merge-vs-direct consistency are
    asserted in tests/test_analytics_sketch.py."""
    ev = _t(spark, sf_dir)["events"]
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    ).select(F.lit("__all__").alias("event_type"),
             F.col("est").cast("long").alias("approx_users"))
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
        )
        .unionByName(merged)
    )


@query(
    "having_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY total_qty DESC, o.o_orderkey
    """,
)
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: a HAVING-gated aggregate drives the join — the
    big-order keys are found first (one agg on the fact key, map-side
    partials), then only those keys re-join lineitem/orders/customer.
    The gate runs BEFORE the wide join, so the expensive re-aggregation
    touches a tiny keyset; customer broadcasts."""
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == big["l_orderkey"])
        .drop("l_orderkey")
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"), "total_qty",
        )
    )


@query(
    "returned_items_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_items_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking over returned items. Date
    filter pushes to the orders scan, returnflag filter to lineitem,
    customer/nation broadcast — only the fact-fact join shuffles. The
    LIMIT rides a deterministic (revenue DESC, custkey) order; revenue
    ties cannot reorder across engines because the tie-break key is
    unique."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    ORDER BY priority, status
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the arbitrary-subset sibling of
    rollup_segment_nation / cube_orders): per-priority and per-status
    marginals in ONE Expand+aggregate pass — two independent rollups for
    the price of one shuffle, vs two jobs in a naive translation. NULL
    markers normalized to 'ALL' for engine-stable hashing."""
    o = _t(spark, sf_dir)["orders"]
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority", "o_orderstatus",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
        )
    )


@query(
    "range_frame_weekly_sum",
    oracle="""
    WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                      ROUND(SUM(value), 2) AS revenue
               FROM events WHERE value >= 9.0 GROUP BY 1, 2)
    SELECT event_type, day, revenue,
           ROUND(SUM(revenue) OVER (
               PARTITION BY event_type ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2)
               AS w7_sum,
           CAST(COUNT(*) OVER (
               PARTITION BY event_type ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
               AS BIGINT) AS w7_days
    FROM d ORDER BY event_type, day
    """,
)
def range_frame_weekly_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frames: the trailing-7-CALENDAR-day sum over a
    sparse daily series (high-value events only, so days are missing) —
    where a ROWS frame would wrongly reach back past the week,
    the RANGE frame spans value distance on the order key. Spark
    expresses it as rangeBetween over a day-number key; pre-aggregation
    keeps the window input at days, not raw events."""
    ev = _t(spark, sf_dir)["events"]
    daily = (
        ev.filter(F.col("value") >= 9.0)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    daynum = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(daynum)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type", "day", "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("w7_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("w7_days"),
    )


@query("sketch_weekly_distinct")
def sketch_weekly_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day WITHOUT re-scanning raw
    events per window: one pass builds a daily HLL sketch, then the
    30-row daily table self-joins over the trailing week and unions
    sketches — the temporal application of mergeable sketches (build
    daily, merge per window; raw user ids shuffle exactly once). At any
    event volume the window join touches |days| rows, not events.
    Rows-only: estimates are engine-native; the error envelope vs the
    exact trailing distinct is asserted in tests/test_analytics_sketch.py."""
    ev = _t(spark, sf_dir)["events"]
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    a = daily.select(F.col("day").alias("day"))
    b = daily.select(F.col("day").alias("bday"), F.col("sk").alias("bsk"))
    window_days = a.join(
        b, (F.datediff(F.col("day"), F.col("bday")) >= 0)
           & (F.datediff(F.col("day"), F.col("bday")) <= 6)
    )
    return (
        window_days.groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("bsk")).cast("long")
             .alias("approx_users_7d"))
    )


@query(
    "value_regression",
    oracle="""
    SELECT event_type,
           ROUND(corr(value, CAST(hour(ts) AS DOUBLE)), 4)           AS corr_hr,
           ROUND(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 4)     AS slope,
           ROUND(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 4) AS intercept,
           ROUND(regr_r2(value, CAST(hour(ts) AS DOUBLE)), 4)        AS r2
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass statistical aggregates: Pearson correlation and OLS
    slope/intercept/R² of event value against hour-of-day, per type —
    all computed as one partial-aggregable pass (no second scan, no
    collect), the shape that matters when the regression runs over
    billions of rows. Rounded to absorb accumulation-order ulp drift."""
    ev = _t(spark, sf_dir)["events"]
    hr = F.hour("ts").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.corr("value", hr), 4).alias("corr_hr"),
            F.round(F.regr_slope("value", hr), 4).alias("slope"),
            F.round(F.regr_intercept("value", hr), 4).alias("intercept"),
            F.round(F.regr_r2("value", hr), 4).alias("r2"),
        )
    )


@query(
    "numeric_histogram",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
         bins AS (SELECT unnest(range(0, 10)) AS bin),
         types AS (SELECT DISTINCT event_type FROM events),
         counts AS (
             SELECT event_type,
                    LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 10)) AS BIGINT),
                          9) AS bin,
                    COUNT(*) AS n
             FROM events, b GROUP BY 1, 2
         )
    SELECT t.event_type, CAST(bins.bin AS BIGINT) AS bin,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM bins CROSS JOIN types t
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.bin = bins.bin
    ORDER BY t.event_type, bins.bin
    """,
)
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram with zero-filled bins: global min/max from a
    1-row aggregate (broadcast), bin assignment is map-only arithmetic,
    the (bin x type) spine makes empty bins explicit. The bin edge
    formula is mirrored term-for-term so IEEE float boundaries land
    identically in both engines."""
    ev = _t(spark, sf_dir)["events"]
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    counts = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.least(
                F.floor((F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / 10)).cast("long"),
                F.lit(9).cast("long"),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bins = ev.sparkSession.range(0, 10).select(F.col("id").alias("bin"))
    types = ev.select("event_type").distinct()
    return (
        bins.crossJoin(F.broadcast(types))
        .join(counts, ["event_type", "bin"], "left")
        .select("event_type", "bin",
                F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )


@query(
    "iqr_outliers",
    oracle="""
    WITH q AS (SELECT event_type,
                      quantile_cont(value, 0.25) AS q1,
                      quantile_cont(value, 0.75) AS q3
               FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_outliers,
           ROUND(MIN(e.value), 4) AS min_outlier,
           ROUND(MAX(e.value), 4) AS max_outlier
    FROM events e JOIN q ON e.event_type = q.event_type
    WHERE e.value > q.q3 + 1.5 * (q.q3 - q.q1)
       OR e.value < q.q1 - 1.5 * (q.q3 - q.q1)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per group: exact quartiles in one agg,
    broadcast back to the stream, fence predicate evaluated map-side —
    two passes total at any scale (the quartile table is
    |groups|-sized). The sf0.01 margin between every value and its
    fence is 0.075, so the float predicate is engine-stable."""
    ev = _t(spark, sf_dir)["events"]
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        ev.join(F.broadcast(q), "event_type")
        .filter((F.col("value") > F.col("q3") + 1.5 * iqr)
                | (F.col("value") < F.col("q1") - 1.5 * iqr))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_outliers"),
            F.round(F.min("value"), 4).alias("min_outlier"),
            F.round(F.max("value"), 4).alias("max_outlier"),
        )
    )


@query(
    "user_event_timeline",
    oracle="""
    SELECT user_id,
           array_to_string((list(event_type ORDER BY ts, event_id))[1:10], '>')
               AS first_events
    FROM events
    WHERE user_id < 10
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_event_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: each user's first 10 event types in
    time order. collect_list order is partition-dependent in Spark, so
    the deterministic shape is collect structs -> array_sort ->
    transform — the same fold discipline the funnel uses, one shuffle
    on the user key."""
    ev = _t(spark, sf_dir)["events"]
    ordered = F.array_sort(
        F.collect_list(F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("et"),
        ))
    )
    return (
        ev.filter(F.col("user_id") < 10)
        .groupBy("user_id")
        .agg(F.array_join(
            F.slice(F.transform(ordered, lambda x: x["et"]), 1, 10), ">")
             .alias("first_events"))
    )


@query(
    "topk_with_ties",
    oracle="""
    SELECT o_orderpriority, tier_price, n_orders, rnk FROM (
        SELECT o_orderpriority,
               ROUND(o_totalprice / 10000, 0) AS tier_price,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(DENSE_RANK() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY ROUND(o_totalprice / 10000, 0) DESC) AS BIGINT)
                   AS rnk
        FROM orders
        GROUP BY o_orderpriority, ROUND(o_totalprice / 10000, 0)
    ) WHERE rnk <= 3
    ORDER BY o_orderpriority, rnk, tier_price
    """,
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-AWARE top-k (dense_rank keeps every row of a tied value,
    row_number would cut arbitrarily — the subtlety topk_per_group's
    unique-key variant sidesteps): top-3 price tiers per priority.
    Ranking on the rounded tier keeps tie membership engine-stable."""
    o = _t(spark, sf_dir)["orders"]
    tier = F.round(F.col("o_totalprice") / 10000, 0)
    agg = o.groupBy(
        "o_orderpriority", tier.alias("tier_price")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("tier_price"))
    return (
        agg.withColumn("rnk", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_filtered_sum",
    oracle="""
    WITH d AS (SELECT user_id, ts, event_id, event_type, value FROM events
               WHERE user_id < 20)
    SELECT user_id, event_id,
           ROUND(SUM(value) FILTER (event_type = 'purchase') OVER w, 2)
               AS purchases_so_far,
           CAST(COUNT(*) FILTER (event_type = 'error') OVER w AS BIGINT)
               AS errors_so_far
    FROM d
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_filtered_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates inside a running window (SQL FILTER clause):
    per user, cumulative purchase value and error count as of each
    event. Spark expresses FILTER as sum(CASE WHEN ...) over the same
    frame — one WindowExec carries both accumulations."""
    ev = _t(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase = F.when(F.col("event_type") == "purchase", F.col("value"))
    error = F.when(F.col("event_type") == "error", 1)
    return (
        ev.filter(F.col("user_id") < 20)
        .select(
            "user_id", "event_id",
            F.round(F.sum(purchase).over(w), 2).alias("purchases_so_far"),
            F.count(error).over(w).cast("long").alias("errors_so_far"),
        )
    )


@query(
    "date_functions_family",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
               AS plus_two_months,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4
    ORDER BY month, plus_two_months
    """,
)
def date_functions_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calendar-function family (quarter, last_day, month
    arithmetic with end-of-month clamping) proven equivalent across
    engines — add_months(Jan 31, 1) clamps to Feb 28/29 in both. Dates
    only in the output, per the determinism rules."""
    o = _t(spark, sf_dir)["orders"]
    d = F.to_date("o_orderdate")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.last_day(d).alias("month_end"),
            F.add_months(d, 2).alias("plus_two_months"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "null_safe_join",
    oracle="""
    WITH a AS (SELECT event_id, NULLIF(event_type, 'error') AS k
               FROM events WHERE event_id < 500),
         b AS (SELECT event_id AS bid, NULLIF(event_type, 'error') AS k
               FROM events WHERE event_id >= 500 AND event_id < 1000)
    SELECT a.k, CAST(COUNT(*) AS BIGINT) AS n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    ORDER BY a.k NULLS FIRST
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics that decide
    whether unknown-keyed rows correlate. Still plans as a hash join on
    the null-safe key, one shuffle."""
    ev = _t(spark, sf_dir)["events"]
    k = F.nullif(F.col("event_type"), F.lit("error"))
    a = ev.filter(F.col("event_id") < 500).select("event_id", k.alias("k"))
    b = (
        ev.filter((F.col("event_id") >= 500) & (F.col("event_id") < 1000))
        .select(F.col("event_id").alias("bid"), k.alias("bk"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["bk"]))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "locf_gap_fill",
    oracle="""
    SELECT user_id, event_id,
           ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS) OVER w, 2) AS last_purchase_value
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap filling: every event carries
    the user's most recent purchase value (NULL until the first one) —
    the imputation pass time-series pipelines run before modeling, as
    one last(IGNORE NULLS) window. Same carry-forward machinery the
    as-of join builds on, exposed as a direct surface."""
    ev = _t(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        ev.filter(F.col("user_id") < 10)
        .select(
            "user_id", "event_id",
            F.round(F.last(purchase_val, ignorenulls=True).over(w), 2)
            .alias("last_purchase_value"),
        )
    )


@query(
    "decay_weighted_value",
    oracle="""
    WITH m AS (SELECT MAX(ts) AS mx FROM events)
    SELECT user_id,
           ROUND(SUM(value * EXP(-0.1 *
               (epoch_us(mx) - epoch_us(ts)) / 86400000000.0)), 4)
               AS decayed_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events, m
    WHERE user_id < 30
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def decay_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential recency decay (half-life ~6.9 days at lambda=0.1/day):
    each event's value weighted by exp(-lambda * age) relative to the
    corpus horizon — the recency-weighted engagement score ranking
    systems use. One broadcast 1-row horizon + a map-side weight, one
    aggregation; the float formula mirrors the oracle term-for-term."""
    ev = _t(spark, sf_dir)["events"]
    m = ev.agg(F.max("ts").alias("mx"))
    age_days = (
        (F.unix_micros(F.col("mx").cast("timestamp"))
         - F.unix_micros(F.col("ts").cast("timestamp"))) / 86400000000.0
    )
    return (
        ev.filter(F.col("user_id") < 30)
        .crossJoin(F.broadcast(m))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * F.exp(-0.1 * age_days)), 4)
            .alias("decayed_value"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


@query(
    "ordered_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ordered_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LISTAGG: collect_set -> array_sort -> concat_ws
    makes the concatenated list independent of partition arrival order
    (a bare collect_list/string_agg is nondeterministic under
    parallelism — the classic distributed-agg trap). One map-side
    partial-aggregable pass."""
    o = _t(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus")))
            .alias("statuses"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


@query(
    "bitwise_flag_rollup",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id % 16) AS BIGINT) AS flags_and,
           CAST(bit_or(user_id % 16) AS BIGINT) AS flags_or,
           CAST(bit_xor(user_id % 16) AS BIGINT) AS flags_xor,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 99) AS any_large
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def bitwise_flag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and boolean aggregate family (bit_and/or/xor,
    bool_and/bool_or): flag-mask rollups are how permission bitmaps and
    feature flags aggregate without exploding to one row per bit. All
    are commutative partial aggregates — map-side combine, one shuffle
    of |groups| rows."""
    ev = _t(spark, sf_dir)["events"]
    flags = F.col("user_id") % 16
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and(flags).cast("long").alias("flags_and"),
            F.bit_or(flags).cast("long").alias("flags_or"),
            F.bit_xor(flags).cast("long").alias("flags_xor"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 99).alias("any_large"),
        )
    )


@query(
    "ntile_price_bins",
    oracle="""
    WITH t AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS q
        FROM orders
    )
    SELECT o_orderpriority, q,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM t GROUP BY o_orderpriority, q
    ORDER BY o_orderpriority, q
    """,
)
def ntile_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning via NTILE(4): equal-frequency price buckets per
    priority — the discretization step feature pipelines run before
    modeling. Unlike interpolated-percentile edges (engine-unstable at
    bucket boundaries), NTILE over a unique (value, key) ordering is
    exactly reproducible across engines. One window shuffle + one agg."""
    o = _t(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    return (
        o.withColumn("q", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "rolling_zscore_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*) AS n
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    w AS (
        SELECT event_type, d, n,
               AVG(n) OVER win AS mu,
               STDDEV_POP(n) OVER win AS sigma,
               COUNT(*) OVER win AS w_n
        FROM daily
        WINDOW win AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, d, CAST(n AS BIGINT) AS n,
           ROUND((n - mu) / sigma, 4) AS z
    FROM w
    WHERE w_n >= 7 AND sigma > 0 AND ABS(ROUND((n - mu) / sigma, 4)) > 2.0
    ORDER BY event_type, d
    """,
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each day's event volume scored
    against the mean/stddev of the PRECEDING 7 days (the current value
    never contaminates its own baseline — frame ends at 1 PRECEDING),
    flag |z| > 2. The volume-spike complement of the reference's
    frequency anomaly report (gcp change_analytics.go:715-775), windowed
    instead of global. Two shuffles total: the daily rollup and the
    per-type window."""
    ev = _t(spark, sf_dir)["events"]
    daily = (
        ev.groupBy("event_type",
                   F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    win = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    )
    z = (F.col("n") - F.avg("n").over(win)) / F.stddev_pop("n").over(win)
    return (
        daily.withColumn("w_n", F.count(F.lit(1)).over(win))
        .withColumn("sigma", F.stddev_pop("n").over(win))
        .withColumn("z", F.round(z, 4))
        .filter((F.col("w_n") >= 7) & (F.col("sigma") > 0)
                & (F.abs(F.col("z")) > 2.0))
        .select("event_type", "d", F.col("n").cast("long").alias("n"), "z")
    )


@query(
    "user_event_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events WHERE user_id < 50
        GROUP BY user_id, event_type
    ),
    t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id)
    SELECT c.user_id,
           ROUND(-SUM((n * 1.0 / tot) * ln(n * 1.0 / tot) / ln(2)), 4)
               AS entropy_bits,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM c JOIN t USING (user_id)
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (0 bits = single-type user). Two
    aggregations over one user-key shuffle; the log2 arithmetic mirrors
    the oracle term-for-term."""
    ev = _t(spark, sf_dir)["events"]
    c = (
        ev.filter(F.col("user_id") < 50)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(p * F.log(p) / F.log(F.lit(2.0))), 4)
            .alias("entropy_bits"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
    )


@query(
    "chi2_lang_source",
    oracle="""
    WITH o AS (SELECT lang, source, COUNT(*) AS obs FROM documents
               GROUP BY lang, source),
    r AS (SELECT lang, SUM(obs) AS rn FROM o GROUP BY lang),
    c AS (SELECT source, SUM(obs) AS cn FROM o GROUP BY source),
    n AS (SELECT SUM(obs) AS total FROM o)
    SELECT o.lang, o.source, CAST(obs AS BIGINT) AS obs,
           ROUND(rn * cn * 1.0 / total, 4) AS expected,
           ROUND(POW(obs - rn * cn * 1.0 / total, 2)
                 / (rn * cn * 1.0 / total), 4) AS chi2_term
    FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n
    ORDER BY lang, source
    """,
)
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square association terms for the (lang x source) contingency
    table — the corpus-mixture independence check (is language
    distribution uniform across sources?). Marginals are two tiny
    re-aggregations of the |langs x sources| cell table; everything
    joins broadcast-small frames."""
    d = _t(spark, sf_dir)["documents"]
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("lang").agg(F.sum("obs").alias("rn"))
    c = o.groupBy("source").agg(F.sum("obs").alias("cn"))
    n = o.agg(F.sum("obs").alias("total"))
    exp = F.col("rn") * F.col("cn") / F.col("total")
    return (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang", "source", F.col("obs").cast("long").alias("obs"),
            F.round(exp, 4).alias("expected"),
            F.round(F.pow(F.col("obs") - exp, 2) / exp, 4).alias("chi2_term"),
        )
    )


@query(
    "fulfillment_latency",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(MIN(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
               AS min_ship_days,
           CAST(MAX(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
               AS max_ship_days,
           CAST(SUM(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
               AS total_ship_days,
           CAST(SUM(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY priority
    """,
)
def fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot latency rollup: order→ship lag statistics
    and slow-shipment (>90 day) counts per priority — the fulfillment-funnel
    metric over the fact join. One shuffle on the order key (AQE picks
    the join strategy), integer day arithmetic end-to-end so the rollup
    is engine-exact (sums instead of float averages)."""
    t = _t(spark, sf_dir)
    o = t["orders"].select("o_orderkey", "o_orderpriority", "o_orderdate")
    l = t["lineitem"].select("l_orderkey", "l_shipdate")
    ship_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.min(ship_days).cast("long").alias("min_ship_days"),
            F.max(ship_days).cast("long").alias("max_ship_days"),
            F.sum(ship_days).cast("long").alias("total_ship_days"),
            F.sum(F.when(ship_days > 90, 1).otherwise(0))
            .cast("long").alias("n_late"),
        )
    )


@query(
    "top_selling_parts",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
    ORDER BY total_qty DESC, p_partkey LIMIT 20
    """,
)
def top_selling_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by shipped quantity: the classic fact⋈dimension
    rollup. The dimension broadcasts at this scale via AQE; the fact
    shuffles once on the part key; quantities are integral doubles so
    the BIGINT-cast sum hashes exactly. Tie-break on partkey keeps the
    LIMIT deterministic."""
    t = _t(spark, sf_dir)
    return (
        t["lineitem"].join(t["part"],
                           t["lineitem"]["l_partkey"] == t["part"]["p_partkey"])
        .groupBy("p_partkey", "p_name")
        .agg(
            F.sum("l_quantity").cast("long").alias("total_qty"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
        .orderBy(F.desc("total_qty"), "p_partkey")
        .limit(20)
    )


@query(
    "basket_part_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey % 50 AS item
        FROM lineitem
    ),
    pair_counts AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS pair_cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.item < b.item
        GROUP BY 1, 2
    ),
    item_counts AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS item_cnt
        FROM items GROUP BY 1
    )
    SELECT p.item_a, p.item_b, p.pair_cnt,
           ia.item_cnt AS cnt_a, ib.item_cnt AS cnt_b
    FROM pair_counts p
    JOIN item_counts ia ON ia.item = p.item_a
    JOIN item_counts ib ON ib.item = p.item_b
    WHERE p.pair_cnt >= 5
    ORDER BY p.pair_cnt DESC, p.item_a, p.item_b LIMIT 25
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part-family pairs appearing
    together in an order (support ≥ 5), with each side's solo count so
    confidence/lift are exact integer ratios downstream. Items are
    bucketed to 50 part families so the pair space is bounded; the
    pair join is WITHIN the order key (equi-join on l_orderkey, a < b)
    — fan-out is Σ items-per-order², bounded by basket size, never
    |items|². Counts stay integers end to end."""
    t = _t(spark, sf_dir)
    items = (
        t["lineitem"]
        .select("l_orderkey", (F.col("l_partkey") % 50).alias("item"))
        .distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("item").alias("item_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("item").alias("item_b"))
    pair_counts = (
        a.join(b, "ok")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 5)
    )
    item_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("item_cnt"))
    return (
        pair_counts
        .join(item_counts.select(F.col("item").alias("item_a"),
                                 F.col("item_cnt").alias("cnt_a")), "item_a")
        .join(item_counts.select(F.col("item").alias("item_b"),
                                 F.col("item_cnt").alias("cnt_b")), "item_b")
        .select("item_a", "item_b", "pair_cnt", "cnt_a", "cnt_b")
        .orderBy(F.desc("pair_cnt"), "item_a", "item_b")
        .limit(25)
    )


@query(
    "mad_outlier_bounds",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1
    ),
    mad AS (
        SELECT e.event_type,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m ON m.event_type = e.event_type
        GROUP BY 1
    )
    SELECT e.event_type AS event_type,
           ROUND(med.med, 4) AS median_value,
           ROUND(mad.mad, 4) AS mad,
           CAST(COUNT(*) FILTER (
               WHERE abs(e.value - med.med) > 3 * mad.mad) AS BIGINT)
               AS n_outliers
    FROM events e
    JOIN med ON med.event_type = e.event_type
    JOIN mad ON mad.event_type = e.event_type
    GROUP BY 1, 2, 3 ORDER BY e.event_type
    """,
)
def mad_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by MEDIAN ABSOLUTE DEVIATION: per event
    type, the median, the MAD (median of |x − median|), and the count
    beyond the 3·MAD fence — the robust-statistics twin of the Tukey
    IQR fence (MAD survives 50% contamination; IQR only 25%). Two exact
    percentile passes with the medians broadcast back, fence counting
    map-side; same quantile_cont interpolation parity as
    percentile_exact."""
    ev = _t(spark, sf_dir)["events"]
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5))
        .alias("mad"))
    joined = with_med.join(F.broadcast(mad), "event_type")
    return (
        joined.groupBy("event_type",
                       F.round("med", 4).alias("median_value"),
                       F.round("mad", 4).alias("mad"))
        .agg(
            F.sum(F.when(F.abs(F.col("value") - F.col("med"))
                         > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long").alias("n_outliers"),
        )
    )


@query(
    "customer_rfm",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               CAST(datediff('day', MAX(o_orderdate), DATE '1998-08-02')
                    AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY 1
    )
    SELECT CASE WHEN recency_days <= 180 THEN 'R1'
                WHEN recency_days <= 720 THEN 'R2' ELSE 'R3' END AS r_tier,
           CASE WHEN frequency >= 12 THEN 'F1'
                WHEN frequency >= 6 THEN 'F2' ELSE 'F3' END AS f_tier,
           CASE WHEN monetary_cents >= 150000000 THEN 'M1'
                WHEN monetary_cents >= 50000000 THEN 'M2' ELSE 'M3' END AS m_tier,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS tier_cents
    FROM rfm GROUP BY 1, 2, 3
    ORDER BY r_tier, f_tier, m_tier
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) with every tier
    verdict engine-exact: money becomes integer CENTS by rounding each
    2-decimal price BEFORE summing (per-row round of price·100 lands on
    the same integer under any rounding mode because representation
    noise keeps it off .5; an after-the-sum floor would sit on integer
    boundaries). Fixed thresholds, one agg per customer + one rollup —
    no global ntile window."""
    o = _t(spark, sf_dir)["orders"]
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.datediff(F.lit("1998-08-02").cast("date"),
                       F.max(F.col("o_orderdate").cast("date")))
            .cast("long").alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").alias("monetary_cents"),
        )
    )
    r_tier = (F.when(F.col("recency_days") <= 180, "R1")
              .when(F.col("recency_days") <= 720, "R2").otherwise("R3"))
    f_tier = (F.when(F.col("frequency") >= 12, "F1")
              .when(F.col("frequency") >= 6, "F2").otherwise("F3"))
    m_tier = (F.when(F.col("monetary_cents") >= 150_000_000, "M1")
              .when(F.col("monetary_cents") >= 50_000_000, "M2")
              .otherwise("M3"))
    return (
        rfm.groupBy(r_tier.alias("r_tier"), f_tier.alias("f_tier"),
                    m_tier.alias("m_tier"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
             F.sum("monetary_cents").cast("long").alias("tier_cents"))
    )


@query(
    "region_revenue_share",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region,
               CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev)
    SELECT region, cents,
           CAST(cents * 10000 // (SELECT total FROM tot) AS BIGINT)
               AS share_bps
    FROM rev ORDER BY region
    """,
)
def region_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share per region in EXACT integers: per-row cents
    rounding before summation (the representation-noise-off-.5 trick),
    then basis points by integer floor division against the broadcast
    total — no float touches the result. Star join with broadcast
    dimensions; the fact shuffles once on the customer key."""
    t = _t(spark, sf_dir)
    rev = (
        t["orders"]
        .join(t["customer"],
              t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
             .cast("long").alias("cents"))
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(
            "region", "cents",
            F.expr("cents * 10000 div total").cast("long").alias("share_bps"),
        )
    )


@query(
    "discount_effectiveness",
    oracle="""
    SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS gross_cents
    FROM lineitem
    GROUP BY 1 ORDER BY discount_pct
    """,
)
def discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume and gross revenue by discount band: the pricing-analytics
    rollup with every column engine-exact — discount percent and price
    cents via per-row round-before-aggregate (representation noise
    keeps the values off .5), quantities as integral doubles cast after
    the sum. One map-side-combined aggregation over the fact table."""
    l = _t(spark, sf_dir)["lineitem"]
    return (
        l.groupBy(F.round(F.col("l_discount") * 100, 0).cast("long")
                  .alias("discount_pct"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("l_quantity").cast("long").alias("total_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long").alias("gross_cents"),
        )
    )


@query(
    "supplier_reliability",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
           CAST(SUM(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                         THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS slow_bps
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1 ORDER BY nation
    """,
)
def supplier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier reliability by nation: shipment volume, slow shipments
    (>90 days order-to-ship) and the slow rate in exact basis points
    (integer floor division) — the vendor scorecard over the double
    fact join. Supplier and nation dimensions broadcast; the fact
    tables shuffle once each on their natural keys."""
    t = _t(spark, sf_dir)
    slow = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, 1
    ).otherwise(0)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(slow).cast("long").alias("n_slow"),
        )
        .select(
            "nation", "n_items", "n_slow",
            F.expr("n_slow * 10000 div n_items").cast("long")
            .alias("slow_bps"),
        )
    )
