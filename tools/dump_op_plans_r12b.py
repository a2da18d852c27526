#!/usr/bin/env python
"""Dump operator-level plans for the round-12b dedup wave.

The registered queries checkpoint these intermediates, so the final
query explain hides the changed subtrees; this dumps the operator
frames themselves. Usage: python tools/dump_op_plans_r12b.py <suffix>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12")

    from corkscrew_spark.catalog import register_tables
    from corkscrew_spark.operators import dedup
    from corkscrew_spark.session import get_spark

    spark = get_spark(app_name="op-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    d = register_tables(spark, sf)["documents"]

    frames = {
        "op_shingle_set": dedup.shingle_set(d, "doc_id", "text", 3),
        "op_minhash_signatures": dedup.minhash_signatures(d, "doc_id", "text"),
        "op_band_signatures": dedup.band_signatures(d, "doc_id", "text"),
        "op_simhash": dedup.simhash(d, "doc_id", "text"),
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, df in frames.items():
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
