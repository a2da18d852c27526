#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized through the noop sink — full execution on the
executors, no driver-side collect in the timed path.
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
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_detail.json"), "w") as fh:
        json.dump({"metric": "query_suite_wall", "value": total, "unit": "sec",
                   "queries": timings, "sf": sf}, fh)

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
             "queries": trial, "sf": sf, "n_queries": len(timings)},
            separators=(",", ":"),
        )
        if len(line) > 1500:
            break
        shown = trial
    print(
        json.dumps(
            {"metric": "query_suite_wall", "value": total, "unit": "sec",
             "queries": shown, "sf": sf, "n_queries": len(timings)},
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
