"""DataSketches HLL invariants for distinct_sketch_rollup: merging
per-group sketches estimates the union like a directly-built sketch
does (within the sketch's own envelope — union promotion means the two
are close, not bit-identical), and estimates stay within the error
envelope of exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_merge_equals_direct(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 600 else "b") for i in range(1000)], "uid long, grp string"
    )
    merged = (
        df.groupBy("grp").agg(F.hll_sketch_agg("uid").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    direct = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("est")).first().est
    assert abs(merged - direct) <= 0.02 * 1000
    assert abs(merged - 1000) <= 0.05 * 1000


def test_hll_estimate_error_bound(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").alias("uid"))
    est = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("e")).first().e
    assert abs(est - n) <= 0.05 * n


def test_sketch_rollup_shape(spark, sf_dir):
    from corkscrew_spark.plans.queries import QUERIES

    rows = QUERIES["distinct_sketch_rollup"](spark, sf_dir).collect()
    by_type = {r.event_type: r.approx_users for r in rows}
    assert "__all__" in by_type
    # the union can never estimate below the largest member
    assert by_type["__all__"] >= max(v for k, v in by_type.items() if k != "__all__") * 0.95


def test_hll_sketch_survives_parquet_roundtrip(spark, tmp_path):
    """Sketches are plain binary columns: persist per-group sketches,
    reopen, merge — the build-once/merge-often warehouse pattern."""
    path = str(tmp_path / "sketches")
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 4)) for i in range(2000)], "uid long, grp string"
    )
    df.groupBy("grp").agg(F.hll_sketch_agg("uid").alias("sk")) \
        .write.mode("overwrite").parquet(path)
    reopened = spark.read.parquet(path)
    est = reopened.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")).first().e
    assert abs(est - 2000) <= 0.05 * 2000


def test_sketch_weekly_distinct_error_bound(spark, sf_dir):
    """The merged-sketch trailing-week estimate stays within 5% of the
    exact trailing-week distinct computed from raw events."""
    from collections import defaultdict
    from datetime import timedelta

    from corkscrew_spark.plans.queries import QUERIES

    got = {r.day: r.approx_users_7d for r in
           QUERIES["sketch_weekly_distinct"](spark, sf_dir).collect()}
    by_day = defaultdict(set)
    for r in spark.read.parquet(f"{sf_dir}/events.parquet") \
            .selectExpr("CAST(ts AS DATE) AS day", "user_id").collect():
        by_day[r.day].add(r.user_id)
    for day, est in got.items():
        exact = len(set().union(*(by_day.get(day - timedelta(days=k), set())
                                  for k in range(7))))
        assert abs(est - exact) <= max(3, 0.05 * exact), (day, est, exact)
