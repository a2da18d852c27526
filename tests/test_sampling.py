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


def test_mixture_fractions_hit_target(corpus, spark):
    # grp sizes: 2500 each; target 50/25/25 over three strata → binding
    # stratum is '0' (2500/0.5 = 5000 is the min scale).
    weights = {"0": 0.5, "1": 0.25, "2": 0.25}
    fr = sampling.mixture_fractions(corpus, "grp", weights)
    assert fr["0"] == 1.0
    assert abs(fr["1"] - 0.5) < 1e-12 and abs(fr["2"] - 0.5) < 1e-12

    out = sampling.mixture_sample(corpus, "id", "grp", weights, seed="m")
    got = {r["grp"]: r["n"] for r in
           out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert "3" not in got  # unweighted stratum dropped
    assert got["0"] == 2500  # binding stratum fully kept
    total = sum(got.values())
    assert abs(got["0"] / total - 0.5) < 0.05
    assert abs(got["1"] / total - 0.25) < 0.05


def test_mixture_validations(corpus):
    with pytest.raises(ValueError, match="absent"):
        sampling.mixture_fractions(corpus, "grp", {"nope": 1.0})
    with pytest.raises(ValueError, match="positive"):
        sampling.mixture_fractions(corpus, "grp", {"0": -1.0})
    with pytest.raises(ValueError, match="non-empty"):
        sampling.mixture_fractions(corpus, "grp", {})


def test_mixture_stable_under_repartition(corpus):
    weights = {"0": 0.6, "1": 0.4}
    a = {r["id"] for r in
         sampling.mixture_sample(corpus, "id", "grp", weights, "s").collect()}
    b = {r["id"] for r in
         sampling.mixture_sample(corpus.repartition(13), "id", "grp",
                                 weights, "s").collect()}
    assert a == b


def test_global_shuffle_total_order_and_permutation(corpus, spark):
    out = sampling.global_shuffle(corpus, "id", seed="ep0", num_partitions=7)
    rows = out.select(
        F.spark_partition_id().alias("pid"), "_shuffle_key", "id"
    ).collect()
    # Concatenating partitions in pid order yields a globally sorted key
    # sequence (range exchange → partition p's keys all precede p+1's).
    seq = [r["_shuffle_key"] for r in sorted(
        rows, key=lambda r: (r["pid"], r["_shuffle_key"]))]
    assert seq == sorted(seq)
    by_pid: dict[int, list[str]] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["_shuffle_key"])
    maxes = [max(v) for _, v in sorted(by_pid.items())]
    mins = [min(v) for _, v in sorted(by_pid.items())]
    assert all(maxes[i] <= mins[i + 1] for i in range(len(maxes) - 1))
    # It is a permutation: every input row exactly once.
    assert sorted(r["id"] for r in rows) == list(range(10_000))
    # Deterministic: a differently-partitioned input yields the identical
    # global order.
    again = sampling.global_shuffle(corpus.repartition(5), "id", "ep0", 7)
    seq2 = [r["_shuffle_key"] for r in sorted(
        again.select(F.spark_partition_id().alias("pid"), "_shuffle_key").collect(),
        key=lambda r: (r["pid"], r["_shuffle_key"]))]
    assert seq2 == seq


def test_fixed_per_stratum_exact_sizes_and_stability(spark):
    from corkscrew_spark.operators import sampling as sp

    df = spark.createDataFrame(
        [(i, "a" if i < 40 else "b") for i in range(50)], "id long, g string"
    )
    out1 = sp.fixed_per_stratum_sample(df, "id", "g", k=10, seed="s")
    sizes = {r.g: r.n for r in out1.groupBy("g").agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")).collect()}
    assert sizes == {"a": 10, "b": 10}
    # stability: same seed -> same membership even after repartitioning
    out2 = sp.fixed_per_stratum_sample(df.repartition(7), "id", "g", k=10, seed="s")
    assert sorted(r.id for r in out1.collect()) == sorted(r.id for r in out2.collect())
    # k larger than stratum: whole stratum kept
    out3 = sp.fixed_per_stratum_sample(df, "id", "g", k=100, seed="s")
    assert out3.count() == 50


class TestWeightedFixedSample:
    def test_exact_k_and_determinism(self, spark):
        from corkscrew_spark.operators.sampling import weighted_fixed_sample
        rows = [(i, "s", float(1 + i % 5)) for i in range(100)]
        df = spark.createDataFrame(rows, ["k", "g", "w"])
        a = {r.k for r in weighted_fixed_sample(df, "k", "g", "w", 10, seed=3).collect()}
        b = {r.k for r in weighted_fixed_sample(df, "k", "g", "w", 10, seed=3).collect()}
        assert a == b and len(a) == 10
        c = {r.k for r in weighted_fixed_sample(df, "k", "g", "w", 10, seed=4).collect()}
        assert a != c  # seed moves the member set

    def test_small_stratum_returns_all(self, spark):
        from corkscrew_spark.operators.sampling import weighted_fixed_sample
        df = spark.createDataFrame([(1, "g", 1.0), (2, "g", 9.0)], ["k", "g", "w"])
        assert weighted_fixed_sample(df, "k", "g", "w", 10).count() == 2

    def test_weight_bias(self, spark):
        """Items with 10x weight must be picked far more often across seeds."""
        from corkscrew_spark.operators.sampling import weighted_fixed_sample
        rows = [(i, "g", 10.0 if i < 20 else 1.0) for i in range(200)]
        df = spark.createDataFrame(rows, ["k", "g", "w"])
        heavy = 0
        for seed in range(8):
            picks = {r.k for r in
                     weighted_fixed_sample(df, "k", "g", "w", 20, seed=seed).collect()}
            heavy += len([k for k in picks if k < 20])
        # heavy items are 10% of the population with 10x weight -> ~52%
        # of picks in expectation; require well above the unweighted 10%
        assert heavy / (8 * 20) > 0.3, heavy
