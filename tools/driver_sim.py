#!/usr/bin/env python
"""Simulate the round driver's correctness gate locally.

Runs each of the first N entries of __spark_entry__.queries() at sf0.01
with a VANILLA SparkSession (the driver does not use our tuned factory)
and compares against oracle_sql() via DuckDB using the same
column-sort + row-sort + value comparison the driver applies.

Usage: python tools/driver_sim.py [--window 50] [--only name1,name2] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--sf", type=str, default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from corkscrew_spark.testing import compare_frames, duckdb_connection

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = (
        [n.strip() for n in args.only.split(",") if n.strip()]
        if args.only
        else list(qs)[: args.window]
    )

    failures = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            if name in oracles:
                con = duckdb_connection(args.sf)
                try:
                    odf = con.execute(oracles[name]).fetchdf()
                finally:
                    con.close()
                compare_frames(sdf, odf, name)
                status = f"green ({len(sdf)} rows)"
            else:
                status = f"rows-only ({len(sdf)} rows)"
                if len(sdf) == 0:
                    failures.append((name, "0 rows from rows-only query"))
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failures.append((name, traceback.format_exc(limit=5)))
        print(f"[{i + 1}/{len(names)}] {name}: {status} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    for name, tb in failures:
        print(f"--- {name} ---\n{tb}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
