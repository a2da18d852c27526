#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized through the noop sink — full execution on the
executors, no driver-side collect in the timed path.

Build-once/probe-many contract (see BASELINE.md "Bench measurement
contract"): the ANN quantizer training (_IVF_CENTROIDS/_PQ_CODEBOOKS),
the BPE merge learning (_BPE_MERGES) and the engine certificate
fixtures (_cert_fixture) are memoized per process — run 1 of BENCH_RUNS
pays the build inside its recorded time, min-of-N reflects the warmed
probe path. No query RESULT is ever cached; every timed run computes
from the parquet inputs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from corkscrew_spark.session import get_spark, sf_dir  # noqa: E402


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    data_dir = sf_dir()
    sf = float(os.path.basename(data_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="corkscrew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from corkscrew_spark.plans.queries import QUERIES

    # Warmup: JVM/codegen spin-up on a trivial action so per-query numbers
    # measure the plans, not session bring-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Python-worker warmup: daemon + one worker per core, so the first
    # Arrow-boundary query (mapInPandas/pandas-UDF paths) doesn't absorb
    # the pool spin-up into its recorded time (it is one-time environment
    # cost, same class as the JVM warmup above, not plan cost).
    _materialize(
        spark.range(64, numPartitions=spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda batches: batches, "id long")
    )

    # Host-speed calibration: a FIXED CPU-bound job (identical across
    # rounds and trees) timed min-of-3. Cross-round bench deltas divide
    # by this anchor to separate host drift from code regressions —
    # rounds 6 and 7 both burned adjudication time proving 20-30% suite
    # swings were the machine; now the evidence is a recorded number.
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr(
            "sum(crc32(cast(id as string)))").collect()
        calib = min(calib, time.perf_counter() - t0)
    calib = round(calib, 3)

    # min-of-N per query: first touch pays one-time whole-stage-codegen
    # compilation + file-footer reads; the min reflects the plan's actual
    # cost, which is what a long-running cluster session sees.
    runs = max(1, int(os.environ.get("BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            _materialize(fn(spark, data_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # Ingest throughput: the ONLY numbers BASELINE.md publishes are scan
    # rates (10 000 resources ≈ 2 min for the reference's AWS scan).
    # Drive the same pipeline shape — (service × region) fan-out through
    # the paginator protocol, normalize, keyed upsert, telemetry append —
    # at ~10k fake resources and report resources/sec. API latency is
    # faked on both sides of that comparison; this measures the ENGINE
    # half (distribution, normalization, upsert), which is the half that
    # differs between the Go worker pool and Spark executors.
    import shutil
    import tempfile

    from corkscrew_spark.ingest import aws_scanner, pipeline

    scan_dir = tempfile.mkdtemp(prefix="bench-scan-")
    try:
        services = list(aws_scanner.LIST_OPERATIONS)
        regions = [f"bench-region-{i}" for i in range(70)]
        t0 = time.perf_counter()
        summary = pipeline.run_scan(spark, scan_dir, services, regions)
        scan_sec = time.perf_counter() - t0
        scan = {
            "resources": int(summary["total_resources"]),
            "sec": round(scan_sec, 3),
            "rps": round(summary["total_resources"] / scan_sec, 1),
        }
    except Exception as ex:  # noqa: BLE001 — the metric must never sink the bench
        scan = {"error": str(ex)[:120]}
    finally:
        shutil.rmtree(scan_dir, ignore_errors=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_detail.json"), "w") as fh:
        json.dump({"metric": "query_suite_wall", "value": total, "unit": "sec",
                   "queries": timings, "scan": scan, "sf": sf,
                   "calib_sec": calib, "runs": runs}, fh)

    # The driver keeps only the last 2000 chars of stdout and parses the
    # final line as JSON (BENCH_r02 came back "parsed": null when the full
    # per-query dict outgrew that buffer). Emit the slowest queries only,
    # capped so the line always fits; the full dict is in bench_detail.json.
    by_cost = sorted(timings, key=timings.get, reverse=True)
    shown: dict[str, float] = {}
    for name in by_cost:
        trial = dict(shown, **{name: timings[name]})
        line = json.dumps(
            {"metric": "query_suite_wall", "value": total, "unit": "sec",
             "queries": trial, "scan": scan, "sf": sf,
             "calib_sec": calib, "runs": runs, "n_queries": len(timings)},
            separators=(",", ":"),
        )
        if len(line) > 1500:
            break
        shown = trial
    print(
        json.dumps(
            {"metric": "query_suite_wall", "value": total, "unit": "sec",
             "queries": shown, "scan": scan, "sf": sf,
             "calib_sec": calib, "runs": runs, "n_queries": len(timings)},
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
