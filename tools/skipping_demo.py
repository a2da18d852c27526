#!/usr/bin/env python
"""Measured data-skipping evidence: clustered copy of sf lineitem,
zone maps + bloom, then pruned read vs full scan.

Builds a date-clustered copy of ``$SPARK_GRAFT_SF_DIR/lineitem.parquet``
in a temp dir (the layout ``compact_table(sort_cols=['l_shipdate'])``
produces), computes stats, and times a one-week range read and an
l_orderkey point lookup both ways. Prints one JSON line; results are
asserted equal before any timing is believed.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from corkscrew_spark import skipping  # noqa: E402
from corkscrew_spark.session import get_spark  # noqa: E402


def _t(fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=1,
                    help="explode lineitem N x (10 = sf1-sized from "
                         "the sf0.1 dir) — distinct order keys, same "
                         "date distribution, so range clustering and "
                         "bloom point lookups measure at N x the rows")
    ap.add_argument("--files", type=int, default=32)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="skipping-demo",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="skipdemo-")
    path = os.path.join(work, "lineitem")
    n_files = args.files
    try:
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        if args.scale > 1:
            # N distinct copies with disjoint order keys: row count and
            # keyspace scale together, the ship-date histogram is
            # unchanged — exactly what a larger SF looks like to range
            # pruning and to the per-file bloom filters
            rep = spark.range(args.scale).select(F.col("id").alias("__r"))
            li = (li.crossJoin(F.broadcast(rep))
                  .withColumn("l_orderkey",
                              F.col("l_orderkey") * args.scale
                              + F.col("__r"))
                  .drop("__r"))
        (li.repartitionByRange(n_files, "l_shipdate")
         .sortWithinPartitions("l_shipdate")
         .write.parquet(path))
        # count from the parquet just written (footer metadata) —
        # li.count() would re-execute the whole --scale explode
        n_rows = spark.read.parquet(path).count()
        # size the bloom for the actual per-file distinct count
        m_bits = skipping.bloom_bits_for(n_rows // n_files)
        skipping.compute_stats(spark, path, ["l_shipdate"],
                               bloom_cols=["l_orderkey"],
                               bloom_bits=m_bits)

        import datetime as dt

        lo, hi = li.agg(F.min("l_shipdate"), F.max("l_shipdate")).first()
        mid = lo + (hi - lo) / 2  # a week in the middle of the data
        range_preds = [("l_shipdate", "between",
                        (mid, mid + dt.timedelta(days=6)))]
        key = li.select("l_orderkey").head().l_orderkey
        point_preds = [("l_orderkey", "=", int(key))]

        flt_r = skipping.predicate_filter(range_preds)
        flt_p = skipping.predicate_filter(point_preds)
        full = spark.read.parquet(path)

        # correctness gate before timing
        for preds, flt in ((range_preds, flt_r), (point_preds, flt_p)):
            a = skipping.read_skipping(spark, path, preds).count()
            b = full.filter(flt).count()
            assert a == b, (preds, a, b)

        # time a decode-forcing aggregate: count() is metadata-bound
        # (parquet aggregate pushdown answers it from footers), so it
        # measures planning overhead, not the scan the pruning saves.
        # Both sides create their DataFrame INSIDE the timer — the
        # pruned path pays plan_skip + per-file-path analysis per call,
        # so the full side must pay its own creation too
        def _sum(df):
            return df.agg(F.sum("l_extendedprice")).collect()

        out = {
            "rows": full.count(),
            "range": {
                "est": skipping.estimate_scan(path, range_preds),
                "full_s": _t(lambda: _sum(
                    spark.read.parquet(path).filter(flt_r))),
                "skip_s": _t(lambda: _sum(skipping.read_skipping(
                    spark, path, range_preds))),
            },
            "point": {
                "est": skipping.estimate_scan(path, point_preds),
                "full_s": _t(lambda: _sum(
                    spark.read.parquet(path).filter(flt_p))),
                "skip_s": _t(lambda: _sum(skipping.read_skipping(
                    spark, path, point_preds))),
            },
        }
        for blk in ("range", "point"):
            e = out[blk].pop("est")
            out[blk]["files"] = f"{e['files_kept']}/{e['files_total']}"
            out[blk]["bytes_pct"] = round(
                100 * e["bytes_kept"] / e["bytes_total"], 1)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
