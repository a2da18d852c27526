"""Scale tripwires: no registered query may plan a cartesian product or
row-at-a-time Python evaluation (BatchEvalPython). Arrow-batched paths
(ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas) are the sanctioned
Python escape hatches and stay allowed."""

from __future__ import annotations

import pytest

from corkscrew_spark.plans.queries import QUERIES

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_forbidden_plan_nodes(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in FORBIDDEN:
        assert node not in plan, f"{name} plans {node}"
