"""ONE end-to-end scenario mirroring EXAMPLES.md, hop by hop:

faked cloud scan → partition-scoped warehouse merge → zone-map/bloom
statistics → pruned reads through BOTH default read paths (DataFrame +
engine SQL) → a second scan (scoped delta) → O(delta) stats refresh →
sorted compaction (bloom opt-in carried) → the verbatim reference
compliance pack over the scanned estate → drift report between scans.

The seam under test is STATS CARRY: statistics must survive scoped
merges (stale, never wrong), refresh in O(delta), and survive
compaction — with result identity asserted at every hop. This is where
an integration regression would hide: each subsystem is green alone.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from corkscrew_spark import changes, skipping, warehouse
from corkscrew_spark.engine import QueryEngine
from corkscrew_spark.ingest import pipeline


def _rows(df):
    return sorted(map(tuple, df.select("id", "region", "service").collect()))


def test_scan_to_drift_chain(spark, tmp_path):
    out = str(tmp_path / "estate")
    res_path = os.path.join(out, "resources")

    # -- hop 1: scan (faked SDK) + partition-scoped merge ---------------
    s1 = pipeline.run_scan(spark, out, ["s3", "rds"],
                           ["us-east-1", "eu-west-1"])
    assert s1["total_resources"] > 0
    baseline_df = spark.read.parquet(res_path)
    n1 = baseline_df.count()
    assert n1 == s1["total_resources"]
    _brow, bsnap = changes.create_baseline(baseline_df, "pre-delta")
    bsnap = bsnap.localCheckpoint(eager=True)  # pin pre-delta state

    # -- hop 2: statistics over the fresh layout ------------------------
    skipping.compute_stats(spark, res_path, ["id", "region"],
                           bloom_cols=["id"])
    stats = skipping.load_stats(res_path)
    assert stats["types"]["id"] == "string"  # type-gated comparisons
    # deterministic probe: lexicographically-first id is an rds arn,
    # whose service partition the second scan will NOT touch
    target = baseline_df.orderBy("id").first().id
    assert ":rds:" in target
    preds = [("id", "=", target)]

    # -- hop 3: pruned point lookup == plain scan (DataFrame path) ------
    plan = skipping.plan_skip(res_path, preds)
    assert plan["fallback"] is None and plan["pruned"]
    got = warehouse.read_table(spark, res_path, preds)
    plain = spark.read.parquet(res_path).filter(F.col("id") == target)
    assert _rows(got) == _rows(plain) and got.count() == 1

    # -- hop 4: delta scan -> scoped merge stales ONLY its partition ----
    s2 = pipeline.run_scan(spark, out, ["s3"], ["ap-south-1"])
    assert s2["total_resources"] > 0
    plan2 = skipping.plan_skip(res_path, preds)
    stale_or_unknown = set(plan2["stale"]) | set(plan2["unknown"])
    assert stale_or_unknown, "scoped merge must invalidate s3 stats"
    assert all(rel.startswith("service=s3/") for rel in stale_or_unknown)
    # identity survives staleness (stats only cost I/O, never rows)
    assert warehouse.read_table(spark, res_path, preds).count() == 1
    # the untouched rds partition's records stayed FRESH: every kept
    # non-stale file is an rds file the bloom couldn't rule out
    fresh_kept = set(plan2["kept"]) - stale_or_unknown
    assert fresh_kept
    assert all(rel.startswith("service=rds/") for rel in fresh_kept)
    assert plan2["fallback"] is None

    # -- hop 5: O(delta) refresh, then compaction carries the bloom -----
    seen = []
    real = skipping._per_file_stats

    def _spy(path, df, cols, bloom=None):
        rec = real(path, df, cols, bloom)
        seen.extend(rec)
        return rec

    skipping._per_file_stats = _spy
    try:
        skipping.refresh_stats(spark, res_path)
    finally:
        skipping._per_file_stats = real
    assert seen and all(rel.startswith("service=s3/") for rel in seen), \
        "refresh must rescan only the invalidated/new s3 files"
    plan3 = skipping.plan_skip(res_path, preds)
    assert not plan3["stale"] and not plan3["unknown"]

    n_total = spark.read.parquet(res_path).count()
    warehouse.compact_table(spark, res_path, partition_cols=["service"],
                            sort_cols=["id"], stats_cols=["id", "region"])
    stats_after = skipping.load_stats(res_path)
    assert stats_after["bloom"], "compaction must carry the bloom opt-in"
    assert stats_after["ts_ns"] > stats["ts_ns"]
    assert spark.read.parquet(res_path).count() == n_total
    plan4 = skipping.plan_skip(res_path, preds)
    assert plan4["fallback"] is None and not plan4["stale"]
    assert warehouse.read_table(spark, res_path, preds).count() == 1

    # -- hop 6: the engine SQL read path over the maintained table ------
    eng = QueryEngine(spark, register_helpers=False)
    eng.register_warehouse("estate", res_path)
    r = eng.execute("SELECT COUNT(*) AS n FROM estate WHERE id = :id",
                    {"id": target}).rows()
    assert r[0].n == 1
    opened = eng.execute(
        "SELECT DISTINCT input_file_name() AS f FROM estate "
        "WHERE id = :id", {"id": target}).df.count()
    total_files = len(skipping._list_data_files(res_path))
    assert 0 < opened < total_files

    # -- hop 7: the verbatim reference compliance pack on the estate ----
    from corkscrew_spark.compliance import ComplianceExecutor
    from corkscrew_spark.compliance.fixtures import TRUSTED_KEYS

    spark.read.parquet(res_path).createOrReplaceTempView("aws_resources")
    run = ComplianceExecutor(spark).run_pack(
        "cfi/ccc/ccc-storage", {"trusted_kms_keys": TRUSTED_KEYS})
    assert not run.errors
    pack_rows = run.results.collect()
    assert pack_rows, "scanned estate must produce compliance rows"
    assert {r.control_id for r in pack_rows} <= {
        "CCC.ObjStor.C01", "CCC.ObjStor.C02", "CCC.ObjStor.C03"}

    # -- hop 8: drift between the scans ----------------------------------
    drift = changes.detect_drift(bsnap, spark.read.parquet(res_path))
    new_ids = {r.resource_id for r in
               drift.filter(F.col("drift_type") == "NEW").collect()}
    assert new_ids == {
        r.id for r in spark.read.parquet(res_path)
        .filter(F.col("region") == "ap-south-1").select("id").collect()}
    # nothing pre-existing drifted: the delta scan only ADDED resources
    assert drift.filter(F.col("drift_type") == "DELETED").count() == 0
