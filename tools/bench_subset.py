#!/usr/bin/env python
"""Time a subset of registered queries through the noop sink.

Usage:
    python tools/bench_subset.py name1,name2,... [--runs 3] [--sf DIR] [--json OUT]

Same methodology as bench.py (warm JVM, min-of-N through the noop sink,
job-description labels) so numbers are comparable to bench_detail files,
without paying for the full 233-query suite on every iteration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated query names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", type=str, default=None)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    from corkscrew_spark.plans.queries import QUERIES
    from corkscrew_spark.session import get_spark, sf_dir

    data_dir = args.sf or sf_dir()
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr(
            "sum(crc32(cast(id as string)))").collect()
        calib = min(calib, time.perf_counter() - t0)

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench-subset: {name}")
            t0 = time.perf_counter()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)

    payload = {"queries": out, "calib_sec": round(calib, 3),
               "runs": args.runs, "sf_dir": data_dir,
               "total": round(sum(out.values()), 3)}
    print(json.dumps(payload))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(payload, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
