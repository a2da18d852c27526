"""corkscrew_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference cloud-config scanner
(jlgore/corkscrew), re-expressed Spark-first.

The reference delegates all SQL to an embedded single-node engine; here the
same query surface is declared through the Spark DataFrame/SQL API so that
Catalyst/Tungsten handle optimization and the plans scale from local[*] to a
multi-thousand-executor cluster unchanged.

Layout:
  session     — tuned SparkSession factory (AQE, shuffle sizing, UTC)
  catalog     — table registration over parquet warehouses
  engine      — validated SQL passthrough (read-only gate, named params)
  functions   — JSON helper functions (reference: pkg/query/json_helpers.go)
  operators   — graph traversal, dedup, similarity, text analysis, multimodal
  plans       — the named query library (reference: internal/db/graph_loader.go)
  compliance  — YAML query-pack loader + executor with output contract
  changes     — change tracking, baselines, drift detection
  ingest      — batch ingestion of resource snapshots
  streaming   — structured-streaming change feed
  warehouse   — keyed upserts, retention, compaction, commit log
  versioned   — file-scoped snapshot store (time travel, vacuum)
  skipping    — zone-map + Bloom data skipping over parquet tables
"""

__version__ = "0.1.0"
