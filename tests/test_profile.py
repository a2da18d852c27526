"""profile_columns: one-pass column profiler exact values."""

from __future__ import annotations

import pytest

from corkscrew_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5), (4, "b", 2.5)],
        ["k", "s", "v"],
    )


def test_exact_profile(spark, sample):
    rows = {r.col_name: r for r in profile_columns(sample).collect()}
    assert set(rows) == {"k", "s", "v"}
    k = rows["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (4, 0, 4)
    assert (k.min_value, k.max_value) == ("1", "4")
    s = rows["s"]
    assert (s.n_rows, s.n_null, s.n_distinct) == (4, 1, 2)
    assert (s.min_value, s.max_value) == ("a", "b")
    v = rows["v"]
    assert (v.n_null, v.n_distinct) == (1, 2)
    assert (v.min_value, v.max_value) == ("1.5", "2.5")


def test_column_subset_order(spark, sample):
    rows = profile_columns(sample, ["v", "k"]).collect()
    assert [r.col_name for r in rows] == ["v", "k"]


def test_approx_single_pass(spark, sample):
    rows = {r.col_name: r for r in
            profile_columns(sample, approx=True).collect()}
    # HLL at this cardinality is exact
    assert rows["k"].n_distinct == 4
    # approx plan must not contain an Expand (the exact-distinct cost)
    plan = profile_columns(sample, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_empty_columns_raise(spark, sample):
    with pytest.raises(ValueError):
        profile_columns(sample, [])


class TestLayoutAdvisor:
    def test_recommendations(self, spark):
        from corkscrew_spark.operators import profile
        import pyspark.sql.functions as F
        df = spark.range(20000).select(
            (F.col("id") % 5).cast("string").alias("region"),      # partition
            F.col("id").cast("string").alias("resource_id"),        # bucket
            (F.col("id") % 300).cast("string").alias("mid_card"),   # none
            F.when(F.col("id") % 10 == 0, "hot")                    # skewed
            .otherwise(F.col("id").cast("string")).alias("owner"),
        )
        got = {r.column: r for r in profile.layout_advisor(
            df, ["region", "resource_id", "mid_card", "owner"],
            partition_max_card=100).collect()}
        assert got["region"].advice == "PARTITION"
        assert got["resource_id"].advice == "BUCKET"
        assert got["mid_card"].advice == "NONE"
        assert "SALT_OR_SKEW_JOIN" in got["owner"].advice
        assert got["region"].n_distinct == 5

    def test_empty_candidates_raise(self, spark):
        from corkscrew_spark.operators import profile
        import pytest as _pytest
        with _pytest.raises(ValueError):
            profile.layout_advisor(spark.range(1), [])
