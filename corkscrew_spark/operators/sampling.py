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

from pyspark.sql import Column, DataFrame
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
