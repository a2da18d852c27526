"""Deterministic, engine-portable sampling for corpus pipelines.

``df.sample()`` is RNG-seeded per partition — repartition the input and
the sample changes, and no other engine can reproduce it. Corpus work
(held-out splits, decontamination spot-checks, per-source quotas) wants
sampling that is a PURE FUNCTION of the row key: stable under
repartitioning, re-runs, engine swaps, and incremental appends (a row's
membership never changes as the corpus grows).

Mechanism: md5(seed || key) is uniform over 128 bits; take the first 8
hex chars and compare against the hex threshold
floor(fraction × 16^8). md5 renders identically in every engine, so the
driver's DuckDB oracle reproduces the exact member set byte-for-byte.
All JVM-side Column expressions — sampling 100 TB is a map-only scan
with the filter pushed to the parquet reader's row batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8


def threshold_hex(fraction: float) -> str:
    """8-hex-digit threshold: keys whose md5 prefix sorts strictly below
    it are in the sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _HEX_SPAN), _HEX_SPAN - 1), "08x")


def sample_key(key_col: str | Column, seed: str = "") -> Column:
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.substring(F.md5(F.concat(F.lit(seed), col.cast("string"))), 1, 8)


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                seed: str = "") -> DataFrame:
    """Uniform deterministic sample: ~``fraction`` of rows, membership a
    pure function of (seed, key)."""
    return df.filter(sample_key(key_col, seed) < threshold_hex(fraction))


def stratified_hash_sample(df: DataFrame, key_col: str, strata_col: str,
                           fractions: dict[str, float], default: float = 0.0,
                           seed: str = "") -> DataFrame:
    """Per-stratum fractions (e.g. keep 100% of rare languages, 1% of
    English) — one map-only pass, no shuffle, no per-stratum jobs."""
    thresh: Column = F.lit(threshold_hex(default))
    for stratum, fraction in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(threshold_hex(fraction))
        ).otherwise(thresh)
    return df.filter(sample_key(key_col, seed) < thresh)


def mixture_fractions(df: DataFrame, strata_col: str,
                      weights: dict[str, float]) -> dict[str, float]:
    """Per-stratum keep fractions that hit a target mixture at maximal
    output size (the data-mixing step of a training pipeline: "40% web,
    30% books, 30% code").

    The binding stratum is the one that runs out first relative to its
    weight: scale = min_s(count_s / weight_s); keep fraction_s =
    scale * weight_s / count_s (the binding stratum keeps 100%). One tiny
    groupBy-count (|strata| rows) is collected to the driver — sanctioned:
    it is dimension-sized, not data-sized, at any corpus scale.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] in weights
    }
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"strata absent from the data: {missing}")
    scale = min(counts[s] / w for s, w in weights.items())
    return {s: min((scale * w) / counts[s], 1.0) for s, w in weights.items()}


def mixture_sample(df: DataFrame, key_col: str, strata_col: str,
                   weights: dict[str, float], seed: str = "") -> DataFrame:
    """Deterministic mixture sample: output strata proportions match
    `weights` (up to hash-sampling noise), strata outside `weights` are
    dropped, and membership is a pure function of (seed, key) — stable
    under repartitioning and engine swaps like hash_sample."""
    fractions = mixture_fractions(df, strata_col, weights)
    return stratified_hash_sample(
        df, key_col, strata_col, fractions, default=0.0, seed=seed)


def shuffle_key(key_col: str | Column, seed: str = "") -> Column:
    """Full 32-hex md5 of (seed, key): a deterministic total-order
    shuffle rank (ties only on duplicate keys)."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(F.concat(F.lit(seed), col.cast("string")))


def global_shuffle(df: DataFrame, key_col: str, seed: str = "",
                   num_partitions: int | None = None) -> DataFrame:
    """Deterministic global shuffle for training-data writes.

    Orders the corpus by md5(seed || key) — a reproducible permutation
    that breaks source/time locality before sequence packing or
    epoch-order writes. Planned as repartitionByRange on the hash (range
    exchange with sampled bounds) + per-partition sort, so the total
    order is achieved with one shuffle and NO single-task global sort;
    output files written in partition order concatenate to the full
    permutation. Reshuffling with a new seed is one more scan.
    """
    keyed = df.withColumn("_shuffle_key", shuffle_key(key_col, seed))
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        keyed.repartitionByRange(n, "_shuffle_key")
        .sortWithinPartitions("_shuffle_key")
    )


def fixed_per_stratum_sample(df: DataFrame, key_col: str, strata_col: str,
                             k: int, seed: str = "") -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen uniformly and
    DETERMINISTICALLY: rank rows inside each stratum by their md5 sample
    key and keep the first k — a reservoir sample whose membership is a
    pure function of (seed, key), stable under repartitioning, re-runs,
    and engine choice (the oracle replays the identical ranking).

    One per-stratum window over the hash order — strata partition the
    window, so no global funnel; use this over fraction-based
    stratified_hash_sample when downstream needs exact group sizes
    (eval set construction, per-language caps).
    """
    w = Window.partitionBy(strata_col).orderBy(
        sample_key(key_col, seed), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_fixed_sample(df: DataFrame, key_col: str, strata_col: str,
                          weight_col, k: int, seed: int = 0) -> DataFrame:
    """Weighted reservoir sampling, deterministic: exactly
    min(k, |stratum|) rows per stratum, selection probability
    proportional to weight (Efraimidis–Spirakis A-ES, Inf. Process.
    Lett. 2006 — public algorithm), with membership a pure function of
    (seed, key).

    priority = ln(u) / w with u a two-round LCG mix of (key, seed) —
    rank by priority DESC is equivalent to the classic u^(1/w) keys,
    but needs one transcendental instead of two. Two multiply-mod
    rounds (modulus 2^31, intermediates < 2^63 so BIGINT arithmetic
    never overflows) make distinct seeds produce decorrelated uniforms;
    a single additive seed would shift every u by the same constant and
    leave most rankings untouched. All arithmetic is integer + one IEEE
    ln, so any engine replays the member set. One shuffle on the
    stratum key (the top-k window); map-side priority computation.
    """
    m = F.lit(2147483648).cast("long")
    a = F.lit(1103515245).cast("long")
    c = F.lit(12345).cast("long")
    x0 = F.col(key_col).cast("long") % m
    x1 = (x0 * a + c + F.lit(int(seed) * 1000003).cast("long")) % m
    x2 = (x1 * a + c) % m
    u = (x2.cast("double") + 0.5) / 2147483648.0
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    pri = F.log(u) / w
    ranked = df.withColumn("__pri", pri).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy(strata_col)
            .orderBy(F.desc("__pri"), key_col)
        ),
    )
    return ranked.filter(F.col("__rk") <= k).drop("__pri", "__rk")
