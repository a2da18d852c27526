#!/usr/bin/env python
"""Spot scale-step: time a named subset of registered queries across
scale-factor directories and print the growth ratios.

The full-suite decade run (bench.py at .benchdata/sf1) is the broad
net; this tool is the targeted follow-up — after a scale fix, measure
JUST the affected queries one more decade up (sf1 → sf10) without
paying for 200 queries at sf10. Methodology matches bench.py: warmup
action, min-of-N per query, noop-sink materialization (no driver
collect in the timed path).

Usage:
  python tools/scale_step.py \
      --queries fuzzy_match_parts,semdedup_embeddings \
      --dirs /root/repo/.benchdata/sf1,/root/repo/.benchdata/sf10 \
      [--runs 2] [--out scale_step.json]

Prints one JSON line: {"dirs": [...], "queries": {name: {dir: sec}},
"ratios": {name: r}} where r is last-dir / first-dir wall growth.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from corkscrew_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated registered query names")
    ap.add_argument("--dirs", required=True,
                    help="comma-separated SF dirs, smallest first")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    args.runs = max(1, args.runs)

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    dirs = [d.strip() for d in args.dirs.split(",") if d.strip()]

    from corkscrew_spark.plans.queries import QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    spark = get_spark(app_name="scale-step")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for d in dirs:
        for n in names:
            best = float("inf")
            err = None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                try:
                    QUERIES[n](spark, d).write.format("noop") \
                        .mode("overwrite").save()
                except Exception as ex:  # noqa: BLE001 — record, keep going
                    err = f"{type(ex).__name__}: {str(ex)[:200]}"
                    break
                best = min(best, time.perf_counter() - t0)
            # a completed earlier run is still a valid min-of-k timing;
            # only report the error when NO run finished
            results[n][d] = round(best, 3) if best != float("inf") else err
            print(f"{os.path.basename(d.rstrip('/'))} {n}: "
                  f"{results[n][d]}", file=sys.stderr)

    ratios = {}
    for n in names:
        first, last = results[n][dirs[0]], results[n][dirs[-1]]
        if isinstance(first, float) and isinstance(last, float) and first > 0:
            ratios[n] = round(last / first, 2)
    line = json.dumps({"dirs": dirs, "runs": args.runs,
                       "queries": results, "ratios": ratios})
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
