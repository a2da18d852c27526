"""Distributed LIMIT/OFFSET pagination.

The reference paginates with SQL ``LIMIT n OFFSET m`` (DuckDB executes it
as a top-(m+n) heap; change_storage.go:558-566). Spark's DataFrame API has
no OFFSET, and the naive translation — a partition-less ``row_number()``
window over the full input — funnels EVERY filtered row through one task
to assign row numbers. At 100 TB that is a single-core sort of the whole
relation.

The scale-safe shape: since offset+limit is capped (the reference caps
limit at 10 000), ``orderBy().limit(offset + limit)`` first — Catalyst
plans that as TakeOrderedAndProject (per-partition top-k, then a driver
merge of k-row heaps; no global shuffle, no single-task sort) — and only
then run the row_number window over the ≤ offset+limit surviving rows,
where a single partition is the correct, bounded plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def limit_offset(df: DataFrame, order: Sequence[Column], limit: int, offset: int = 0) -> DataFrame:
    """Rows (offset, offset+limit] of ``df`` under ``order``.

    ``order`` must be a total order (include a unique tie-break column)
    for pages to be stable — same contract as the reference's
    ``ORDER BY ts DESC, id``.
    """
    order = list(order)
    if offset <= 0:
        return df.orderBy(*order).limit(limit)
    capped = df.orderBy(*order).limit(offset + limit)
    w = Window.orderBy(*order)
    return (
        capped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )
