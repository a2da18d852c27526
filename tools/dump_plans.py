#!/usr/bin/env python
"""Dump .explain('formatted') for named registered queries to
plans/$PLAN_ROUND/ (default r13).

Usage: python tools/dump_plans.py <suffix> name1,name2,...
Writes plans/<round>/<name>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from corkscrew_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    from corkscrew_spark.plans.queries import QUERIES

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("PLAN_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
