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
    if approx:
        # HLL sketches have binary buffers: the whole profile stays ONE
        # non-expanded hash-aggregation pass.
        structs = [
            F.struct(
                F.lit(name).alias("col_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
                .cast("long").alias("n_null"),
                F.approx_count_distinct(F.col(name))
                .cast("long").alias("n_distinct"),
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
    # Exact path, two global aggregations instead of one combined agg:
    # mixing k countDistincts with string-buffered min/max makes Catalyst
    # plan the distinct-rewrite Expand as a SortAggregate (string/decimal
    # aggregation buffers disqualify hash agg), which SORTS the k-times
    # expanded relation — the dominant cost. Separated, the min/max agg
    # is ungrouped (no sort, no Expand) and the distinct agg's Expand
    # carries only long count buffers, so it stays a HashAggregate.
    # Both results are single rows; the crossJoin is free.
    base = df.agg(*[
        F.struct(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
            .cast("long").alias("n_null"),
            F.min(F.col(name)).cast("string").alias("min_value"),
            F.max(F.col(name)).cast("string").alias("max_value"),
        ).alias(f"__b_{name}")
        for name in cols
    ])
    dist = df.agg(*[
        F.countDistinct(F.col(name)).cast("long").alias(f"__d_{name}")
        for name in cols
    ])
    structs = [
        F.struct(
            F.lit(name).alias("col_name"),
            F.col(f"__b_{name}.n_rows").alias("n_rows"),
            F.col(f"__b_{name}.n_null").alias("n_null"),
            F.col(f"__d_{name}").alias("n_distinct"),
            F.col(f"__b_{name}.min_value").alias("min_value"),
            F.col(f"__b_{name}.max_value").alias("max_value"),
        )
        for name in cols
    ]
    return (
        base.crossJoin(dist)
        .select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
    )


def profile_skew(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join/shuffle-key skew diagnostic: per-key row counts for the
    ``top_k`` heaviest keys plus each key's share of the total and its
    ratio to the MEAN key load — the number that predicts whether a
    shuffle on this key stalls on one straggler task (ratio ≫ 1 means
    salt it or let AQE skew-join split it; pairs with
    warehouse.salted_join).

    One count aggregation (map-side partial) + a broadcast 1-row total;
    no sort of the full relation (top-k via TakeOrderedAndProject).

    Returns (key, n_rows, pct_of_total, skew_factor) with the two floats
    rounded to 4.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") * 100.0 / F.col("__total"), 4)
            .alias("pct_of_total"),
            F.round(F.col("n_rows") * F.col("__n_keys")
                    / F.col("__total"), 4).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), "key")
        .limit(top_k)
    )


def layout_advisor(df: DataFrame, candidate_cols: list[str],
                   partition_max_card: int = 1000,
                   bucket_min_card: int = 10_000,
                   skew_threshold: float = 4.0) -> DataFrame:
    """Physical-layout recommendations from data statistics: for each
    candidate column, ONE profiling pass (cardinality via HLL, null
    share, heaviest-key skew factor) feeds the standard layout rules —

    * low cardinality (≤ ``partition_max_card``) and low skew →
      ``PARTITION``: directory pruning, safe file counts;
    * high cardinality (≥ ``bucket_min_card``) → ``BUCKET``: join/agg
      co-location where directories would explode;
    * heaviest key ≥ ``skew_threshold``× the mean load →
      ``SALT_OR_SKEW_JOIN`` rides along as a warning whatever the
      cardinality says;
    * otherwise ``NONE`` (mid-cardinality columns make poor layout
      keys: too many directories, too little co-location value).

    The stats pass is |cols| aggregations + one heaviest-key lookup per
    column over the count relation — metadata-sized output. This is
    the advisor half of warehouse.write_partitioned / write_bucketed /
    salted_join; it recommends, the caller decides.

    Returns (column, n_distinct, null_pct, skew_factor, advice).
    """
    if not candidate_cols:
        raise ValueError("layout_advisor: no candidate columns")
    out_rows = []
    total = df.count()
    for col in candidate_cols:
        counts = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("n"))
        stats = counts.agg(
            F.count(F.lit(1)).alias("card"),
            F.max("n").alias("top"),
            F.sum(F.when(F.col("k").isNull(), F.col("n")).otherwise(0))
            .alias("nulls"),
        ).collect()[0]
        card = int(stats.card)
        skew = float(stats.top) * card / total if total else 0.0
        null_pct = 100.0 * int(stats.nulls or 0) / total if total else 0.0
        if card <= partition_max_card and skew < skew_threshold:
            advice = "PARTITION"
        elif card >= bucket_min_card:
            advice = "BUCKET"
        else:
            advice = "NONE"
        if skew >= skew_threshold:
            advice += "+SALT_OR_SKEW_JOIN"
        out_rows.append((col, card, round(null_pct, 2), round(skew, 2),
                         advice))
    return df.sparkSession.createDataFrame(
        out_rows,
        "column string, n_distinct long, null_pct double, "
        "skew_factor double, advice string")
