"""Spark-vs-DuckDB differential tests over every oracle-backed query.

This mirrors the driver's correctness gate (same normalization: sort
columns by name, compare values order-insensitively) at sf0.001 so
failures surface locally before the per-round verify at sf0.01.
"""

from __future__ import annotations

import pytest

from corkscrew_spark.plans.queries import ORACLE, QUERIES
from corkscrew_spark.testing import compare_to_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    compare_to_oracle(spark, name, sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    """Every registered query must run and have a stable, non-empty schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ sketch must stay within a loose multiple of its configured
    rsd (2%) against the exact distinct count computed in the same pass."""
    from corkscrew_spark.plans.queries import QUERIES

    rows = QUERIES["approx_distinct_users"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(3, 0.1 * r.exact_users), r
