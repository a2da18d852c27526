"""Graph queries over an edge table derived from the synthetic star schema.

The reference's graph subsystem walks a typed edge table with recursive
CTEs (graph_loader.go:402-464). Here the edge set is derived from the
testdata's natural containment hierarchy —

    order O<k>  --placed_by-->  customer C<k>   (directed toward parents)
    customer C<k> --located_in--> nation N<k>
    supplier S<k> --located_in--> nation N<k>
    nation  N<k> --contained_in--> region R<k>

— and traversed with the iterative-join operators in operators/graph.py.
The DuckDB oracles express the identical semantics as recursive CTEs, so
the differential check covers the one operator family the reference gets
"for free" from its embedded engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corkscrew_spark.catalog import register_tables
from corkscrew_spark.operators import graph
from corkscrew_spark.plans.queries import query

#: Shared edge definition, kept in exact sync between engines.
_EDGE_SQL_DUCK = """
    SELECT 'C' || CAST(c_custkey AS VARCHAR) AS src,
           'N' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
    UNION ALL
    SELECT 'S' || CAST(s_suppkey AS VARCHAR),
           'N' || CAST(s_nationkey AS VARCHAR) FROM supplier
    UNION ALL
    SELECT 'N' || CAST(n_nationkey AS VARCHAR),
           'R' || CAST(n_regionkey AS VARCHAR) FROM nation
"""

_EDGE_WITH_ORDERS_DUCK = _EDGE_SQL_DUCK + """
    UNION ALL
    SELECT 'O' || CAST(o_orderkey AS VARCHAR),
           'C' || CAST(o_custkey AS VARCHAR) FROM orders
"""


def _edge(df: DataFrame, src_prefix: str, src_col: str, dst_prefix: str, dst_col: str) -> DataFrame:
    return df.select(
        F.concat(F.lit(src_prefix), F.col(src_col).cast("string")).alias("src"),
        F.concat(F.lit(dst_prefix), F.col(dst_col).cast("string")).alias("dst"),
    )


def containment_edges(spark: SparkSession, sf_dir: str, with_orders: bool = False) -> DataFrame:
    t = register_tables(spark, sf_dir)
    e = (
        _edge(t["customer"], "C", "c_custkey", "N", "c_nationkey")
        .unionByName(_edge(t["supplier"], "S", "s_suppkey", "N", "s_nationkey"))
        .unionByName(_edge(t["nation"], "N", "n_nationkey", "R", "n_regionkey"))
    )
    if with_orders:
        e = e.unionByName(_edge(t["orders"], "O", "o_orderkey", "C", "o_custkey"))
    return e


@query(
    "graph_khop",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL_DUCK}),
    bidir AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    walk AS (
        SELECT 'C1' AS node, 0 AS distance
        UNION ALL
        SELECT b.dst, w.distance + 1
        FROM walk w JOIN bidir b ON b.src = w.node
        WHERE w.distance < 3
    )
    SELECT node, CAST(MIN(distance) AS INT) AS distance
    FROM walk GROUP BY node ORDER BY distance, node
    """,
)
def graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop neighborhood, bidirectional, min distance — the recursive-CTE
    neighborhood query (graph_loader.go:435-464) as iterative BFS joins."""
    edges = containment_edges(spark, sf_dir)
    return graph.k_hop(edges, ["C1"], max_depth=3, directed=False)


@query(
    "graph_khop_cte",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL_DUCK}),
    bidir AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    walk AS (
        SELECT 'C1' AS node, 0 AS distance
        UNION ALL
        SELECT b.dst, w.distance + 1
        FROM walk w JOIN bidir b ON b.src = w.node
        WHERE w.distance < 3
    )
    SELECT node, CAST(MIN(distance) AS INT) AS distance
    FROM walk GROUP BY node ORDER BY distance, node
    """,
)
def graph_khop_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_khop on the SECOND backend: Spark 4 ``WITH RECURSIVE``
    (operators/graph_cte.py) instead of iterative joins — the engine
    itself runs the recursion the reference hands to DuckDB
    (graph_loader.go:435-464), hash-checked against the same oracle so
    the driver certifies the CTE plan, not just its iterative twin."""
    from corkscrew_spark.operators.graph_cte import k_hop_cte

    edges = containment_edges(spark, sf_dir)
    return (
        k_hop_cte(edges, ["C1"], max_depth=3, directed=False)
    )


@query(
    "graph_shortest_path",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_SQL_DUCK}),
    bidir AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    walk AS (
        SELECT 'C1' AS node, ['C1'] AS path, 0 AS depth
        UNION ALL
        SELECT b.dst, list_append(w.path, b.dst), w.depth + 1
        FROM walk w JOIN bidir b ON b.src = w.node
        WHERE w.depth < 4 AND NOT list_contains(w.path, b.dst)
    )
    SELECT CAST(depth AS INT) AS depth, array_to_string(path, '->') AS path_str
    FROM walk
    WHERE node = (SELECT 'R' || CAST(n_regionkey AS VARCHAR)
                  FROM customer JOIN nation ON c_nationkey = n_nationkey
                  WHERE c_custkey = 1)
    ORDER BY depth, path LIMIT 1
    """,
)
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest path with hop sequence — recursive path CTE with cycle
    guard + ORDER BY depth LIMIT 1 (graph_loader.go:402-433).

    Target = C1's own region node: the containment graph is a forest of
    per-region components, so an arbitrary fixed target would be
    unreachable at most scale factors; the region is always 2 hops away,
    and the BFS still proves min-depth + lexicographic tie-breaking.
    """
    t = register_tables(spark, sf_dir)
    target = (
        t["customer"]
        .filter(F.col("c_custkey") == 1)
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.concat(F.lit("R"), F.col("n_regionkey").cast("string")))
        .first()[0]
    )
    edges = containment_edges(spark, sf_dir)
    hit = graph.shortest_path(edges, "C1", target, max_depth=4, directed=False)
    return hit.select("depth", F.array_join("path", "->").alias("path_str"))


@query(
    "graph_topo_levels",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGE_WITH_ORDERS_DUCK}),
    sources AS (
        SELECT DISTINCT src AS node FROM edges
        WHERE src NOT IN (SELECT dst FROM edges)
    ),
    walk AS (
        SELECT node, 0 AS lvl FROM sources
        UNION ALL
        SELECT e.dst, w.lvl + 1 FROM walk w JOIN edges e ON e.src = w.node
    ),
    levels AS (SELECT node, MAX(lvl) AS level FROM walk GROUP BY node)
    SELECT CAST(level AS INT) AS level, COUNT(*) AS node_count
    FROM levels GROUP BY level ORDER BY level
    """,
)
def graph_topo_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological (longest-path) layering of the containment DAG —
    dependency ordering (discovery/resource_graph.go:580-626), summarized
    as nodes-per-level."""
    edges = containment_edges(spark, sf_dir, with_orders=True)
    levels = graph.topo_levels(edges, max_depth=10)
    return (
        levels.groupBy("level")
        .agg(F.count("*").alias("node_count"))
    )



def _pagerank_oracle(iters: int = 8, d: float = 0.85) -> str:
    """Unrolled power-iteration oracle: recursive CTEs cannot aggregate
    in the recursive term, but a FIXED iteration count unrolls into
    chained CTEs — one contribution agg + one dangling sum per round,
    mirroring operators/graph.pagerank term-for-term (same IEEE ops in
    the same order; summation order inside SUM() is engine-arbitrary on
    BOTH sides, which ROUND(…, 8) absorbs)."""
    parts = [f"""
    WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({_EDGE_WITH_ORDERS_DUCK}) t),
    nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
    r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""]
    for k in range(iters):
        parts.append(f""",
    c{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank / deg.deg) AS contrib
             FROM r{k} r JOIN e ON e.src = r.node
             JOIN deg ON deg.node = r.node
             GROUP BY 1),
    d{k} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0) AS dang FROM r{k}
             WHERE node NOT IN (SELECT node FROM deg)),
    r{k + 1} AS MATERIALIZED (SELECT nodes.node,
                 (1 - {d}) / (SELECT n FROM nn)
                 + {d} * (COALESCE(c.contrib, 0)
                          + (SELECT dang FROM d{k}) / (SELECT n FROM nn))
                     AS rank
                 FROM nodes LEFT JOIN c{k} c ON c.node = nodes.node)""")
    parts.append(f"""
    SELECT node, ROUND(rank, 8) AS rank FROM r{iters}
    ORDER BY ROUND(rank, 8) DESC, node LIMIT 20
    """)
    return "".join(parts)


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by PageRank over the containment graph (orders
    included): nations and regions accumulate rank from the entities
    that point at them. The oracle UNROLLS the fixed 8-round power
    iteration into chained CTEs (recursive CTEs cannot aggregate in the
    recursive term, a fixed count needs no recursion), mirroring the
    Spark math term-for-term; invariants (mass conservation, symmetry,
    hub dominance) are additionally asserted in tests/test_graph.py."""
    e = containment_edges(spark, sf_dir, with_orders=True)
    return (
        graph.pagerank(e, iters=8)
        .select("node", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


@query(
    "graph_triangles",
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                WHERE l_linenumber <= 4),
         e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
               FROM lp a JOIN lp b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM e e1
               JOIN e e2 ON e2.a = e1.b
               JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT node, triangles FROM (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
            SELECT x AS node FROM t
            UNION ALL SELECT y FROM t
            UNION ALL SELECT z FROM t
        ) GROUP BY node
    ) ORDER BY triangles DESC, node LIMIT 50
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 parts by triangle count in the co-purchase graph (parts
    linked when bought in the same order). Degree-ordered wedge
    enumeration (operators/graph.triangle_count) bounds join fan-out by
    the max degree AFTER low->high orientation — O(|E|^1.5) total work
    even on power-law co-purchase graphs, where the naive 3-way join
    explodes on hub products. Zero-triangle nodes are dropped by the
    LIMIT's triangles DESC ordering at these SFs only if ties push them
    out; the tie-break on node keeps the cut deterministic."""
    li = register_tables(spark, sf_dir)["lineitem"]
    # First 4 lines per order: caps the co-purchase clique at C(4,2)
    # edges per order, keeping the graph sparse enough that the wedge
    # pass stays proportional to |E|^1.5 rather than order-size^2 x |O|
    # (the operator itself handles any density; this bounds the DEMO
    # graph the same way the oracle does).
    lp = (li.filter(F.col("l_linenumber") <= 4)
          .select("l_orderkey", "l_partkey").distinct())
    b = lp.withColumnRenamed("l_partkey", "p2")
    edges = (
        lp.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )
    return (
        graph.triangle_count(edges)
        .filter(F.col("triangles") > 0)
        .orderBy(F.desc("triangles"), "node")
        .limit(50)
    )


@query(
    "graph_weighted_sssp",
    oracle="""
    WITH RECURSIVE g AS (
        SELECT CAST(p_partkey AS BIGINT) AS node,
               CAST(p_size AS BIGINT) AS w
        FROM part WHERE p_partkey < 64
    ),
    edges AS (
        SELECT a.node AS src, b.node AS dst, b.w
        FROM g a JOIN g b ON b.node = a.node + 1 AND a.node % 8 != 7
        UNION ALL
        SELECT a.node, b.node, b.w
        FROM g a JOIN g b ON b.node = a.node + 8
    ),
    walk AS (
        SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist,
               CAST(0 AS BIGINT) AS hops
        UNION ALL
        SELECT e.dst, w.dist + e.w, w.hops + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < 14
    )
    SELECT node, dist, hops FROM (
        SELECT node, dist, hops,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY dist, hops) AS rn
        FROM walk
    ) WHERE rn = 1
    ORDER BY node
    """,
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source weighted shortest distances over a deterministic
    8x8 grid DAG (nodes = first 64 parts, right/down edges weighted by
    the destination's p_size): Bellman-Ford rounds
    (operators/graph.weighted_shortest_paths) vs the oracle's exhaustive
    recursive path enumeration — tractable for DuckDB only because the
    grid is a DAG with <= C(14,7) distinct paths; the Spark side is the
    formulation that scales to arbitrary graphs. Integer weights keep
    the hash exact."""
    p = register_tables(spark, sf_dir)["part"]
    g = p.filter(F.col("p_partkey") < 64).select(
        F.col("p_partkey").cast("long").alias("node"),
        F.col("p_size").cast("long").alias("w"),
    )
    right = (
        g.alias("a")
        .filter(F.col("a.node") % 8 != 7)
        .join(g.alias("b"), F.col("b.node") == F.col("a.node") + 1)
        .select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"),
                F.col("b.w").alias("weight"))
    )
    down = (
        g.alias("a")
        .join(g.alias("b"), F.col("b.node") == F.col("a.node") + 8)
        .select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"),
                F.col("b.w").alias("weight"))
    )
    edges = right.unionByName(down)
    return (
        graph.weighted_shortest_paths(edges, source="0", max_rounds=16)
        .select(F.col("node").cast("long").alias("node"),
                F.col("dist").cast("long").alias("dist"), "hops")
    )



def _hits_oracle(iters: int = 6) -> str:
    """Unrolled HITS oracle mirroring operators/graph.hits term-for-term:
    per round authority = SUM(hub)/|E| per target then hub =
    SUM(authority) per source (sparse frames — only nodes reached by the
    joins carry scores), constant 1/|E| rescale instead of per-round
    norms, one L2 normalization at the very end. ROUND(…, 6) absorbs
    engine-arbitrary summation order."""
    parts = ["""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({edges}) t WHERE src != dst),
    nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
    ne AS MATERIALIZED (SELECT COUNT(*) AS m FROM e),
    h0 AS MATERIALIZED (SELECT node, 1.0 AS hub FROM nodes)"""]
    for k in range(iters):
        parts.append(f""",
    a{k} AS MATERIALIZED (
        SELECT e.dst AS node, SUM(h.hub) / (SELECT m FROM ne) AS authority
        FROM h{k} h JOIN e ON e.src = h.node GROUP BY 1),
    h{k + 1} AS MATERIALIZED (
        SELECT e.src AS node, SUM(a.authority) AS hub
        FROM a{k} a JOIN e ON e.dst = a.node GROUP BY 1)""")
    last = iters - 1
    parts.append(f""",
    scores AS MATERIALIZED (
        SELECT nodes.node,
               COALESCE(h.hub, 0) AS hub,
               COALESCE(a.authority, 0) AS authority
        FROM nodes LEFT JOIN h{iters} h ON h.node = nodes.node
        LEFT JOIN a{last} a ON a.node = nodes.node),
    norms AS MATERIALIZED (
        SELECT sqrt(SUM(hub * hub)) AS hn,
               sqrt(SUM(authority * authority)) AS an
        FROM scores)
    SELECT node,
           ROUND(CASE WHEN (SELECT hn FROM norms) > 0
                      THEN hub / (SELECT hn FROM norms) ELSE 0 END, 6) AS hub,
           ROUND(CASE WHEN (SELECT an FROM norms) > 0
                      THEN authority / (SELECT an FROM norms) ELSE 0 END, 6)
               AS authority
    FROM scores
    ORDER BY ROUND(CASE WHEN (SELECT an FROM norms) > 0
                        THEN authority / (SELECT an FROM norms)
                        ELSE 0 END, 6) DESC, node
    LIMIT 20
    """)
    return "".join(parts).replace("{edges}", _EDGE_WITH_ORDERS_DUCK)


@query("graph_hits", oracle=_hits_oracle())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 authorities in the containment graph under HITS
    (operators/graph.hits): containers that many high-hub entities point
    at. The oracle unrolls the fixed 6 mutually-recursive rounds into
    MATERIALIZED chained CTEs mirroring the Spark math term-for-term
    (sparse frames, constant 1/|E| rescale, end-only L2 normalization);
    numpy power-iteration equality is additionally asserted in
    tests/test_graph.py."""
    e = containment_edges(spark, sf_dir, with_orders=True)
    return (
        graph.hits(e, iters=6)
        .select("node", F.round("hub", 6).alias("hub"),
                F.round("authority", 6).alias("authority"))
        .orderBy(F.desc("authority"), "node")
        .limit(20)
    )



def _lpa_oracle(iters: int = 4) -> str:
    """Unrolled label-propagation oracle mirroring
    operators/graph.label_propagation exactly: per round each node
    adopts the most frequent label among neighbors + self, ties to the
    smallest label (ROW_NUMBER over cnt DESC, community ASC). All
    integer counts and string labels — hash-exact, no float anywhere."""
    parts = ["""
    WITH base AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({edges}) t WHERE src != dst),
    und AS MATERIALIZED (
        SELECT src, dst FROM base
        UNION SELECT dst, src FROM base),
    l0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS community FROM und)"""]
    for k in range(iters):
        parts.append(f""",
    v{k} AS MATERIALIZED (
        SELECT u.dst AS node, l.community
        FROM und u JOIN l{k} l ON l.node = u.src
        UNION ALL SELECT node, community FROM l{k}),
    c{k} AS MATERIALIZED (
        SELECT node, community, COUNT(*) AS cnt FROM v{k} GROUP BY 1, 2),
    l{k + 1} AS MATERIALIZED (
        SELECT node, community FROM (
            SELECT node, community,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY cnt DESC, community) AS rn
            FROM c{k}) WHERE rn = 1)""")
    parts.append(f"""
    SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM l{iters} GROUP BY 1
    ORDER BY n_nodes DESC, community LIMIT 25
    """)
    return "".join(parts).replace("{edges}", _EDGE_WITH_ORDERS_DUCK)


@query("graph_communities", oracle=_lpa_oracle())
def graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes under deterministic label propagation over the
    customer–nation–region containment graph (orders included). LPA
    splits the connected graph at sparse cuts — the community view the
    reference's relationship graph lacks. The oracle unrolls the fixed
    4 vote-argmax rounds into MATERIALIZED chained CTEs — integer
    counts and string labels throughout, so the hash check is exact;
    determinism + planted-community recovery are additionally pinned in
    tests/test_graph.py."""
    e = containment_edges(spark, sf_dir, with_orders=True)
    return (
        graph.label_propagation(e, iters=4)
        .groupBy("community")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "community")
        .limit(25)
    )


@query(
    "motif_open_triads",
    oracle=f"""
    WITH e AS (SELECT DISTINCT src, dst FROM ({_EDGE_WITH_ORDERS_DUCK}) t),
    triads AS (
        SELECT DISTINCT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM e e1 JOIN e e2 ON e2.src = e1.dst
        WHERE NOT EXISTS (
            SELECT 1 FROM e e3 WHERE e3.src = e1.src AND e3.dst = e2.dst)
    )
    SELECT substr(b, 1, 1) AS mid_kind, CAST(COUNT(*) AS BIGINT) AS n_triads
    FROM triads GROUP BY 1 ORDER BY mid_kind
    """,
)
def motif_open_triads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Motif search through the pattern compiler
    (graph.find_motifs): open directed 2-paths —
    ``(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)`` — rolled up by the kind
    of the middle node. The pattern compiles to two aliased edge scans
    equi-joined on the shared variable plus one anti join for the
    negation; the oracle spells the same joins out as SQL."""
    e = containment_edges(spark, sf_dir, with_orders=True)
    triads = graph.find_motifs(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    return (
        triads.groupBy(F.substring("b", 1, 1).alias("mid_kind"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triads"))
    )


def _ppr_oracle(iters: int = 6, d: float = 0.85) -> str:
    """Unrolled PERSONALIZED-PageRank oracle: seeds come from the same
    top-3-by-error-volume CTE the Spark side uses, the per-node reset
    column is CASE node-in-seeds, and the fixed rounds unroll exactly
    like _pagerank_oracle with reset replacing the uniform 1/N."""
    parts = ["""
    WITH ev AS MATERIALIZED (
        SELECT 'N' || CAST(user_id % 25 AS VARCHAR) AS nation_id,
               COUNT(*) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY 1),
    seeds AS MATERIALIZED (
        SELECT nation_id FROM ev ORDER BY n_errors DESC, nation_id LIMIT 3),
    e AS MATERIALIZED (
        SELECT DISTINCT dst AS src, src AS dst FROM ({edges}) t),
    nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
    rs AS MATERIALIZED (
        SELECT node,
               CASE WHEN node IN (SELECT nation_id FROM seeds)
                    THEN 1.0 / 3 ELSE 0.0 END AS reset
        FROM nodes),
    r0 AS MATERIALIZED (SELECT node, reset AS rank FROM rs)"""]
    for k in range(iters):
        parts.append(f""",
    c{k} AS MATERIALIZED (
        SELECT e.dst AS node, SUM(r.rank / deg.deg) AS contrib
        FROM r{k} r JOIN e ON e.src = r.node
        JOIN deg ON deg.node = r.node GROUP BY 1),
    d{k} AS MATERIALIZED (
        SELECT COALESCE(SUM(rank), 0) AS dang FROM r{k}
        WHERE node NOT IN (SELECT node FROM deg)),
    r{k + 1} AS MATERIALIZED (
        SELECT rs.node,
               (1 - {d}) * rs.reset
               + {d} * (COALESCE(c.contrib, 0)
                        + (SELECT dang FROM d{k}) * rs.reset) AS rank
        FROM rs LEFT JOIN c{k} c ON c.node = rs.node)""")
    parts.append(f"""
    SELECT node, ROUND(rank, 8) AS rank FROM r{iters}
    ORDER BY ROUND(rank, 8) DESC, node LIMIT 20
    """)
    return "".join(parts).replace("{edges}", _EDGE_WITH_ORDERS_DUCK)


@query("blast_radius_rank", oracle=_ppr_oracle())
def blast_radius_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius RANKING: personalized PageRank seeded at the top-3
    error-hotspot nations, walked over the REVERSED containment graph so
    rank flows downstream to the customers and orders nearest the
    changed set — the continuous-score companion to blast_radius's hop
    counts. Seeds stay in-plan as a 3-row broadcast (no driver collect
    — the seed subtree schedules inside the ranks-build job); the
    oracle recomputes the seeds and unrolls the 6 fixed rounds into
    MATERIALIZED CTEs."""
    t = register_tables(spark, sf_dir)
    seeds_df = (
        t["events"].filter(F.col("event_type") == "error")
        .select(F.concat(F.lit("N"), (F.col("user_id") % 25).cast("string"))
                .alias("nation_id"))
        .groupBy("nation_id").agg(F.count(F.lit(1)).alias("n_errors"))
        .orderBy(F.desc("n_errors"), "nation_id")
        .limit(3)
    )
    e = containment_edges(spark, sf_dir, with_orders=True)
    reversed_e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        graph.pagerank(reversed_e, iters=6,
                       reset_df=seeds_df.select("nation_id"))
        .select("node", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


@query(
    "graph_degree_distribution",
    oracle=f"""
    WITH base AS (SELECT DISTINCT src, dst FROM ({{edges}}) t),
    und AS (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM und GROUP BY 1)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1 ORDER BY degree
    """.replace("{edges}", _EDGE_WITH_ORDERS_DUCK),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected degree histogram of the containment graph — the first
    diagnostic of any graph workload (power-law tail ⇒ salt the hub
    keys; bounded degrees ⇒ plain shuffles are safe). Two aggregations
    on natural keys; output is |distinct degrees| rows."""
    e = containment_edges(spark, sf_dir, with_orders=True)
    base = e.select("src", "dst").distinct()
    und = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )


@query(
    "graph_summary",
    oracle=f"""
    WITH e AS (SELECT DISTINCT src, dst FROM ({{edges}}) t WHERE src != dst),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    recip AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
    ),
    sinks AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
        WHERE node NOT IN (SELECT src FROM e)
    ),
    sources AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
        WHERE node NOT IN (SELECT dst FROM e)
    )
    SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT)     AS n_edges,
           (SELECT n FROM recip)                        AS n_reciprocal,
           (SELECT n FROM sources)                      AS n_sources,
           (SELECT n FROM sinks)                        AS n_sinks
    """.replace("{edges}", _EDGE_WITH_ORDERS_DUCK),
)
def graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row structural summary of the directed graph: node/edge
    counts, reciprocal edge pairs (A→B with B→A), pure sources and pure
    sinks — the shape facts that pick the right algorithm variants
    (reciprocity ≈ 0 and deep sink fan-in here say: treat as a DAG-ish
    hierarchy). Each stat is one join or anti-join on the deduped edge
    relation; all integers."""
    e = containment_edges(spark, sf_dir, with_orders=True)
    base = (
        e.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        base.select(F.col("src").alias("node"))
        .unionByName(base.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rev = base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # One composed plan instead of five sequential driver count() actions:
    # the five 1-row aggregates cross-join into the single output row, so
    # Spark schedules their subtrees inside one job (idle-capacity overlap)
    # and the driver round-trips once. Values are the identical counts.
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = base.agg(F.count(F.lit(1)).alias("n_edges"))
    n_recip = base.join(rev, ["src", "dst"]).agg(
        F.count(F.lit(1)).alias("n_reciprocal"))
    n_sources = nodes.join(base.select(F.col("dst").alias("node")).distinct(),
                           "node", "left_anti").agg(
        F.count(F.lit(1)).alias("n_sources"))
    n_sinks = nodes.join(base.select(F.col("src").alias("node")).distinct(),
                         "node", "left_anti").agg(
        F.count(F.lit(1)).alias("n_sinks"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(n_recip))
        .crossJoin(F.broadcast(n_sources)).crossJoin(F.broadcast(n_sinks))
    )
