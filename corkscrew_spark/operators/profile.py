"""Column profiler: one-pass per-column statistics over any table.

The reference surfaces per-table schema/statistics through its schema
service and `corkscrew info` (cmd/corkscrew/main.go:471-530,
internal/server/api_server.go GetStats); this generalizes that to the
data-profiling pass a warehouse runs after ingest — null counts,
cardinalities, min/max — as ONE aggregation job regardless of how many
columns are profiled.

Scale shape: all per-column aggregates live in a single ``agg()`` so the
scan happens once, with map-side partial aggregation. Exact
``countDistinct`` over k columns makes Catalyst plan one Expand (row
duplication ×k) — the standard exact-profile cost; ``approx=True``
switches to ``approx_count_distinct`` HLL sketches, which keep the plan
a single non-expanded pass and stay mergeable across partitions (the
100 TB default). Output is long-format (one row per column) so profiles
of arbitrarily wide tables stay a fixed-schema result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None,
                    approx: bool = False) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns (col_name, n_rows, n_null, n_distinct, min_value, max_value)
    with min/max rendered as strings so heterogeneous column types share
    one result schema. ``n_distinct`` excludes NULLs.
    """
    cols = columns if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns: no columns to profile")
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx
        else (lambda c: F.countDistinct(c))
    )
    structs = [
        F.struct(
            F.lit(name).alias("col_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
            .cast("long").alias("n_null"),
            distinct(F.col(name)).cast("long").alias("n_distinct"),
            F.min(F.col(name)).cast("string").alias("min_value"),
            F.max(F.col(name)).cast("string").alias("max_value"),
        ).alias(f"__p_{name}")
        for name in cols
    ]
    return (
        df.agg(*structs)
        .select(F.explode(F.array(*[F.col(f"__p_{n}") for n in cols]))
                .alias("p"))
        .select("p.*")
    )
