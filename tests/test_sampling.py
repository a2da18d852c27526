"""Deterministic hash sampling: reproducibility, repartition-invariance,
fraction accuracy, stratification, incremental-append stability."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from corkscrew_spark.operators import sampling


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(10_000).select(
        F.col("id"),
        (F.pmod(F.col("id"), 4)).cast("string").alias("grp"),
    )


def test_threshold_hex():
    assert sampling.threshold_hex(0.0) == "00000000"
    assert sampling.threshold_hex(1.0) == "ffffffff"
    assert sampling.threshold_hex(0.5) == "80000000"
    with pytest.raises(ValueError):
        sampling.threshold_hex(1.5)


def test_fraction_accuracy_and_determinism(corpus):
    s1 = sampling.hash_sample(corpus, "id", 0.2, seed="s")
    n = s1.count()
    assert abs(n / 10_000 - 0.2) < 0.02
    # identical on re-run and under repartitioning
    ids = {r.id for r in s1.collect()}
    ids2 = {r.id for r in sampling.hash_sample(corpus.repartition(13), "id", 0.2,
                                               seed="s").collect()}
    assert ids == ids2


def test_seed_changes_membership(corpus):
    a = {r.id for r in sampling.hash_sample(corpus, "id", 0.2, seed="a").collect()}
    b = {r.id for r in sampling.hash_sample(corpus, "id", 0.2, seed="b").collect()}
    assert a != b and abs(len(a) - len(b)) < 600


def test_membership_stable_under_append(corpus, spark):
    """A row's membership must not change when the corpus grows — the
    property RNG sampling loses and incremental pipelines need."""
    small = corpus.filter("id < 1000")
    in_small = {r.id for r in sampling.hash_sample(small, "id", 0.3, seed="v1").collect()}
    in_full = {r.id for r in sampling.hash_sample(corpus, "id", 0.3, seed="v1").collect()}
    assert in_small == {i for i in in_full if i < 1000}


def test_stratified_fractions(corpus):
    out = sampling.stratified_hash_sample(
        corpus, "id", "grp", {"0": 0.1, "1": 0.5}, default=1.0, seed="s"
    )
    got = {r["grp"]: r["n"] for r in
           out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert abs(got["0"] / 2500 - 0.1) < 0.04
    assert abs(got["1"] / 2500 - 0.5) < 0.04
    assert got["2"] == 2500 and got["3"] == 2500  # default keeps all


def test_plan_is_map_only(corpus):
    plan = (sampling.hash_sample(corpus, "id", 0.1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, "sampling must not shuffle"
