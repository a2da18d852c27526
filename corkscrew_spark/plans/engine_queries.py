"""Queries routed through the validated-SQL engine surface.

These exercise the actual passthrough machinery (gate → named-param
binding → macro expansion → Catalyst) under the driver's correctness
gate, mirroring the reference's primary entry point (§3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from corkscrew_spark.catalog import register_tables
from corkscrew_spark.engine import QueryEngine
from corkscrew_spark.plans.queries import query


@query(
    "engine_param_binding",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND CAST(json_extract_string(props, '$.k') AS INTEGER) >= 10
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def engine_param_binding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path: read-only gate + :named params (IN-list expansion,
    engine.go:441-456) + the extract_json macro (json_helpers.go) running
    inlined in whole-stage codegen."""
    register_tables(spark, sf_dir)
    eng = QueryEngine(spark)
    return eng.execute(
        """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(extract_json(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        FROM events
        WHERE event_type IN (:etypes)
          AND CAST(extract_json(props, '$.k') AS INT) >= :min_k
        GROUP BY event_type
        ORDER BY event_type
        """,
        {"etypes": ["click", "view", "purchase"], "min_k": 10},
    ).df
