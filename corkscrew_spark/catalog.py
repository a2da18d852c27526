"""Catalog: register parquet tables as Spark views.

The reference keeps one unified warehouse file and registers unified views
over provider tables (internal/db/unified_schema.go:429-487). Here the
warehouse is a directory of parquet tables; registration is cheap view
creation, so every query gets predicate pushdown + column pruning into the
parquet scans for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Driver-provided synthetic tables (TESTDATA.md).
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read(spark: SparkSession, path: str) -> DataFrame:
    """Read one parquet table, tolerating nanosecond timestamp columns.

    Spark 4 rejects parquet TIMESTAMP(NANOS) outright; with the legacy
    conf it surfaces them as LongType nanos, which we convert to proper
    TimestampType via integer division (ns → µs, no double round-trip, so
    no precision loss at 1.7e18-scale epoch values).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def _nanos_columns(path: str) -> list[str]:
    import pyarrow.parquet as pq

    cols = []
    schema = pq.read_schema(path)
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            cols.append(field.name)
    return cols


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _read(spark, path)
    for c in _nanos_columns(path):
        # ns→µs with integer `div` (no float): truncation matches how any
        # µs-precision engine compares against these values.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table_between(spark: SparkSession, sf_dir: str, name: str,
                       ts_col: str, start: str | None = None,
                       end: str | None = None) -> DataFrame:
    """Time-range scan with pushdown on nanosecond-timestamp tables.

    A range predicate applied AFTER the ns→µs conversion cannot reach the
    parquet scan (the scan reads the raw long; the converted column is a
    derived expression — only IsNotNull pushes). This helper converts the
    bounds to raw epoch-nanos instead and filters the long column BEFORE
    the cast, so the comparison pushes down as a plain bigint range and
    parquet row-group min/max statistics prune the scan — the difference
    between reading a day and reading the whole table at 100 TB.

    Bound semantics match filtering the converted column when bounds are
    whole microseconds (truncation can't move a value across the bound).
    """
    import datetime as _dt
    from zoneinfo import ZoneInfo

    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _read(spark, path)
    ns_cols = _nanos_columns(path)
    # String bounds compare in the session timezone (same semantics Spark
    # gives `col >= "2024-01-15"` on the converted column).
    tz = ZoneInfo(spark.conf.get("spark.sql.session.timeZone", "UTC") or "UTC")

    def _ns(bound: str) -> int:
        # Integer arithmetic throughout: float timestamp() can truncate
        # sub-second bounds 1µs low, moving boundary rows across the
        # pushed-down range.
        t = _dt.datetime.fromisoformat(bound).replace(tzinfo=tz)
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        return ((t - epoch) // _dt.timedelta(microseconds=1)) * 1000

    if ts_col in ns_cols:
        if start is not None:
            df = df.filter(F.col(ts_col) >= F.lit(_ns(start)))
        if end is not None:
            df = df.filter(F.col(ts_col) <= F.lit(_ns(end)))
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if ts_col not in ns_cols:
        if start is not None:
            df = df.filter(F.col(ts_col) >= F.lit(start))
        if end is not None:
            df = df.filter(F.col(ts_col) <= F.lit(end))
    return df


#: Memo of registered table sets: (session id, sf_dir) → {name: DataFrame}.
#: Registration costs a footer read + view creation per table; queries call
#: register_tables() freely, so cache it (parquet files are immutable here).
_REGISTRY: dict[tuple[int, str], dict[str, DataFrame]] = {}

#: Which sf_dir each session's temp VIEW currently points at. View names
#: are session-global while the DataFrame memo is per (session, sf_dir):
#: after register_tables(spark, sfA) then register_tables(spark, sfB),
#: a later register_tables(spark, sfA) must RE-POINT the views back to
#: sfA even though its DataFrames are memoized — otherwise view-based
#: consumers (engine SQL, packs) silently read sfB.
_ACTIVE_VIEW: dict[tuple[int, str], str] = {}


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view; returns the DataFrames.

    Views (not materialized caches): every downstream query plans straight
    against the parquet scan, keeping pushdown/pruning intact. Callers that
    reuse a small table many times can ``.cache()`` the returned df.
    """
    abs_dir = os.path.abspath(sf_dir)
    key = (id(spark), abs_dir)
    cached = _REGISTRY.get(key)
    if cached is not None and set(tables) <= set(cached):
        for name, df in cached.items():
            if _ACTIVE_VIEW.get((id(spark), name)) != abs_dir:
                df.createOrReplaceTempView(name)
                _ACTIVE_VIEW[(id(spark), name)] = abs_dir
        return cached
    out: dict[str, DataFrame] = dict(cached or {})
    for name in tables:
        if name in out:
            # Memoized DataFrame, but the session-global view may still
            # point at another sf_dir from an interleaved registration.
            if _ACTIVE_VIEW.get((id(spark), name)) != abs_dir:
                out[name].createOrReplaceTempView(name)
                _ACTIVE_VIEW[(id(spark), name)] = abs_dir
            continue
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        _ACTIVE_VIEW[(id(spark), name)] = abs_dir
        out[name] = df
    _REGISTRY[key] = out
    return out
