#!/usr/bin/env python
"""Generate a larger-SF bench dataset by key-remapped replication.

The driver's testdata is read-only and tops out at sf0.1; the scaling
curve SCALE.md needs (does suite wall grow linearly with data?) wants
one more decade. This synthesizes sfN (default sf1 = 10x sf0.1) by
unioning K shifted replicas of sf0.1: every surrogate key is offset by
`replica * (max_key + 1)` CONSISTENTLY across fact and dimension
tables, so referential joins (lineitem->orders->customer,
lineitem->part/supplier, embeddings<->documents) hold in every replica
and key cardinalities scale with rows — the shuffle/join shapes a real
10x table would produce. Region/nation stay single-copy (fixed tiny
dims, as in TPC-H at every SF). Timestamps are left untouched: the
time RANGE is the generator's fixed window, so 10x data means 10x
density per day, which is exactly how a busier deployment scales.
Documents/events text is replicated verbatim — fine for timing (dedup
finds 10x duplicates; the operators' cost shape is unchanged).

NOT for correctness runs: the DuckDB oracle comparisons stay on the
driver's own sf0.01.

Usage: python tools/gen_sf.py [--replicas 10] [--src /root/testdata/sf0.1]
                              [--out /root/repo/.benchdata/sf1]
Output layout matches TESTDATA.md (`{out}/{table}.parquet`), so
SPARK_GRAFT_SF_DIR=<out> python bench.py just works.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from corkscrew_spark.session import get_spark  # noqa: E402

#: per-table (shift_columns). Offsets are per KEY FAMILY so references
#: stay aligned: the same family offset applies wherever the key
#: appears (o_custkey shifts by the customer family's stride, etc.).
KEY_FAMILIES = {
    "customer": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supplier": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orders": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "events": [("events", "event_id")],
    "users": [("events", "user_id")],
    "documents": [("documents", "doc_id")],
    "embeddings": [("embeddings", "vec_id")],
}

SINGLE_COPY = ("region", "nation")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

#: similarity-bearing columns get a PER-REPLICA token transform
#: (every word suffixed with the replica index) — verbatim replication
#: would make every document/part-name have 9 exact clones, inflating
#: near-dup pair counts ~quadratically (fuzzy join buckets, MinHash
#: bands) in a way real 10x data never does; suffixing every token
#: keeps each replica's shingle/gram profile distinct, so near-dup
#: DENSITY per item stays what it was at sf0.1 and the similarity
#: operators scale the way they would on a genuinely larger corpus.
TEXT_PERTURB = {"documents": ("text",), "part": ("p_name",)}


def replicate(df: DataFrame, shifts: list[tuple[str, int]],
              replicas: int, text_cols: tuple = (),
              vec_cols: tuple = ()) -> DataFrame:
    """Union `replicas` copies of df, each copy's key columns offset by
    replica * stride. One narrow projection per replica — map-only."""
    parts = []
    for i in range(replicas):
        cols = []
        for name in df.columns:
            stride = next((s for c, s in shifts if c == name), None)
            if stride is not None and i > 0:
                cols.append((F.col(name) + F.lit(i * stride))
                            .cast(dict(df.dtypes)[name]).alias(name))
            elif name in text_cols and i > 0:
                # FIXED-WIDTH letter tags, one char per base-26 digit:
                # numeric tags alias gram-wise across replicas ("…1" is
                # a substring of "…19") and so do mixed-width letter
                # tags ("…b" of "…bb") — a constant width sized to the
                # replica count keeps every replica's suffix grams
                # disjoint from every other's at any scale step
                width = 1
                while 26 ** width < replicas:
                    width += 1
                tag, k = "", i
                for _ in range(width):
                    tag = chr(ord("a") + k % 26) + tag
                    k //= 26
                cols.append(F.regexp_replace(
                    F.col(name), r"(\w+)", "$1" + tag).alias(name))
            elif name in vec_cols and i > 0:
                # deterministic directional noise (~2-3% relative):
                # identical vectors would give every point 9 exact
                # twins — degenerate ties no real embedding set has;
                # pure scaling is useless (cosine is scale-invariant)
                def _noise_fn(rep):
                    # PySpark counts EVERY parameter (defaults too)
                    # when matching the higher-order-function arity, so
                    # capture the replica index in a closure
                    return lambda x, idx: (
                        x + F.sin(idx.cast("double") * 0.7 + rep)
                        .cast("float") * F.lit(0.03))

                cols.append(F.transform(F.col(name), _noise_fn(i))
                            .cast(dict(df.dtypes)[name]).alias(name))
            else:
                cols.append(F.col(name))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    if not 1 <= args.replicas <= 26 ** 2:
        ap.error("--replicas must be in [1, 676]")

    spark = get_spark(app_name="gen-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    # stride per key family = max over every column the family touches
    # (+1), so no replica's keys can collide with another's
    strides: dict[str, int] = {}
    src_df = {t: spark.read.parquet(f"{args.src}/{t}.parquet")
              for t in TABLES}
    for fam, sites in KEY_FAMILIES.items():
        mx = 0
        for table, col in sites:
            got = src_df[table].agg(F.max(col)).first()[0]
            mx = max(mx, int(got or 0))
        strides[fam] = mx + 1

    per_table: dict[str, list[tuple[str, int]]] = {t: [] for t in TABLES}
    for fam, sites in KEY_FAMILIES.items():
        for table, col in sites:
            per_table[table].append((col, strides[fam]))

    import glob
    import shutil
    import tempfile

    for t in TABLES:
        dst = f"{args.out}/{t}.parquet"
        df = src_df[t]
        if t not in SINGLE_COPY:
            df = replicate(df, per_table[t], args.replicas,
                           text_cols=TEXT_PERTURB.get(t, ()),
                           vec_cols=("embedding",)
                           if t == "embeddings" else ())
            if t == "documents":
                # keep the derived length column consistent with the
                # perturbed text (quality filters read it)
                df = df.withColumn("n_chars",
                                   F.length("text").cast("long"))
        # ONE file per table, exactly the driver's layout — the loader
        # reads `{dir}/{name}.parquet` as a FILE (catalog._nanos_columns
        # footer-probes it with pyarrow); Spark still parallelizes the
        # read by row groups / maxPartitionBytes
        tmp = tempfile.mkdtemp(prefix=f"gensf_{t}_", dir=args.out)
        try:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            [part] = glob.glob(f"{tmp}/part-*.parquet")
            if os.path.exists(dst):
                os.remove(dst)
            shutil.move(part, dst)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(f"{t}: {spark.read.parquet(dst).count():,} rows -> {dst}")
    print("done")


if __name__ == "__main__":
    main()
