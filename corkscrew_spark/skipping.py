"""File-statistics data skipping (zone maps) for parquet tables.

Delta-lake-style min/max pruning on NON-partition columns: a one-pass
Spark job records per-data-file column statistics (min, max, null
count, row count) into ``_column_stats.json`` inside the table
directory, and ``read_skipping`` consults them to open ONLY the files
whose [min, max] range can satisfy a conjunctive predicate. Hive
partition pruning eliminates directories by partition VALUE; zone maps
eliminate files by DATA range — together with ``warehouse.zorder_write``
/ ``compact_table(sort_cols=...)`` clustering, a selective predicate on
a 100 TB table touches a handful of files instead of every footer.

Correctness never depends on the statistics:

* the real predicate is always re-applied to whatever is read, so a
  stale or wrong zone map can only cost extra I/O, never wrong rows;
* files NOT present in the stats (appended since) are always read;
* partitions written since the stats snapshot (per the table's
  ``_commits.jsonl``, see ``warehouse._log_commit``) are always read,
  and a full-rewrite commit drops back to a plain scan;
* an all-null file is skipped for comparison predicates (SQL
  comparisons never match NULL) but kept for ``is_null``.

Reference parity: the reference delegates scans to DuckDB, whose
parquet reader prunes row groups via zone maps automatically
(duckdb row-group min/max statistics; the reference's storage layer at
``internal/storage`` inherits it). At 100 TB the same decision must
happen BEFORE listing/opening files — materialized file-level
statistics are the distributed analogue (Delta data skipping /
Iceberg manifest column bounds).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import os
import time
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATS_FILE = "_column_stats.json"
_COMMIT_LOG = "_commits.jsonl"

#: Supported predicate operators, AND-combined: ``(col, op, value)``;
#: ``between`` takes ``value=(lo, hi)`` inclusive; ``is_null`` ignores
#: ``value``.
_OPS = ("<", "<=", ">", ">=", "=", "between", "is_null")


def _norm(v):
    """JSON-safe, order-preserving scalar encoding. Timestamps and
    dates become ISO-8601 strings (lexicographic order == temporal
    order), Decimal becomes float; numbers and strings pass through."""
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _decimal.Decimal):
        return float(v)
    return v


def _stats_path(path: str) -> str:
    return os.path.join(path, _STATS_FILE)


def _file_rel(path: str, uri: str) -> str:
    """input_file_name() URI -> relpath under the table dir. The URI
    percent-encodes the on-disk name once, so one unquote restores it
    (a disk name already containing hive-escaped ``%3A`` arrives as
    ``%253A`` and round-trips correctly)."""
    p = urllib.parse.unquote(urllib.parse.urlparse(uri).path)
    return os.path.relpath(p, os.path.abspath(path))


def compute_stats(spark: SparkSession, path: str,
                  cols: list[str]) -> dict:
    """One distributed pass recording per-file zone maps for ``cols``.

    ``groupBy(input_file_name())`` makes the aggregate exactly
    file-grained; map-side partial aggregation reduces each file to one
    row before the (tiny, #files-sized) shuffle, and column pruning
    means only ``cols`` are decoded. The JSON goes through a tmp file +
    ``os.replace`` so readers never see a torn stats file. Returns the
    stats dict that was written."""
    files = _per_file_stats(path, spark.read.parquet(path), cols)
    _fill_empty_files(files, _list_data_files(path), cols)
    stats = {"ts_ns": time.time_ns(), "cols": list(cols), "files": files}
    tmp = _stats_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(stats, fh)
    os.replace(tmp, _stats_path(path))  # atomic on POSIX
    return stats


def _per_file_stats(path: str, df: DataFrame,
                    cols: list[str]) -> dict[str, dict]:
    """min/max/null-count/rows per data file of ``df`` — one row per
    file after map-side partial aggregation (metadata-sized result)."""
    df = df.select(F.input_file_name().alias("__file"), *cols)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
        ]
    rows = df.groupBy("__file").agg(*aggs).collect()
    files: dict[str, dict] = {}
    for r in rows:
        rec = {"rows": r["__rows"], "stats": {}}
        for c in cols:
            rec["stats"][c] = [_norm(r[f"__min_{c}"]),
                               _norm(r[f"__max_{c}"]),
                               int(r[f"__nulls_{c}"] or 0)]
        files[_file_rel(path, r["__file"])] = rec
    return files


def _fill_empty_files(files: dict, expected: list[str],
                      cols: list[str]) -> None:
    """Zero-row part files never surface in the input_file_name
    aggregation (no rows to group); give them explicit empty records so
    they don't stay perpetually 'unknown'. An empty file matches no
    predicate, so pruning it is exact: all-NULL bounds prune every
    comparison and a 0 null count prunes is_null."""
    for rel in expected:
        if rel not in files:
            files[rel] = {"rows": 0,
                          "stats": {c: [None, None, 0] for c in cols}}


def refresh_stats(spark: SparkSession, path: str) -> dict:
    """Incremental zone-map maintenance: recompute statistics ONLY for
    files the snapshot doesn't cover — appended (unknown) files and
    files under partitions invalidated by scoped merges — and drop
    entries for files gone from disk. Cost is O(delta), not O(table):
    the steady-state upkeep for a continuously-ingested table, where
    ``compute_stats`` is the one-off bootstrap. Falls back to a full
    recompute after a full-rewrite commit (everything changed anyway).
    Returns the refreshed stats dict."""
    stats = load_stats(path)
    if stats is None:
        raise FileNotFoundError(
            f"{path}/{_STATS_FILE} missing — run compute_stats first")
    cols = stats["cols"]
    changed = _invalidated_since(path, stats["ts_ns"])
    if changed is None:
        return compute_stats(spark, path, cols)
    stale_pfx = tuple(r + "/" for r in changed)
    current = _list_data_files(path)
    todo = [rel for rel in current
            if rel not in stats["files"]
            or (stale_pfx and rel.startswith(stale_pfx))]
    files = {rel: rec for rel, rec in stats["files"].items()
             if rel in set(current)}
    if todo:
        sub = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, rel) for rel in todo])
        files.update(_per_file_stats(path, sub, cols))
        _fill_empty_files(files, todo, cols)
    out = {"ts_ns": time.time_ns(), "cols": cols, "files": files}
    tmp = _stats_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(out, fh)
    os.replace(tmp, _stats_path(path))
    return out


def load_stats(path: str) -> dict | None:
    p = _stats_path(path)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _file_may_match(rec: dict, predicates: list[tuple]) -> bool:
    """Can any row of a file with zone map ``rec`` satisfy the AND of
    ``predicates``? Conservative: unknown column / type mismatch /
    unparseable bound => True (read the file)."""
    for col, op, value in predicates:
        cs = rec["stats"].get(col)
        if cs is None:
            continue  # no stats for this column: cannot prune on it
        mn, mx, nulls = cs
        if op == "is_null":
            if nulls == 0:
                return False
            continue
        if mn is None and mx is None:
            return False  # all-NULL file: comparisons never match
        try:
            if op == "between":
                lo, hi = _norm(value[0]), _norm(value[1])
                if mx < lo or mn > hi:
                    return False
            else:
                v = _norm(value)
                if ((op == "=" and not (mn <= v <= mx))
                        or (op == "<" and not (mn < v))
                        or (op == "<=" and not (mn <= v))
                        or (op == ">" and not (mx > v))
                        or (op == ">=" and not (mx >= v))):
                    return False
        except TypeError:
            continue  # incomparable types: never prune on a guess
    return True


def _predicate_column(col: str, op: str, value):
    c = F.col(col)
    if op == "is_null":
        return c.isNull()
    if op == "between":
        return c.between(F.lit(value[0]), F.lit(value[1]))
    return {"<": c < F.lit(value), "<=": c <= F.lit(value),
            ">": c > F.lit(value), ">=": c >= F.lit(value),
            "=": c == F.lit(value)}[op]


def predicate_filter(predicates: list[tuple]):
    """The AND of ``predicates`` as a Column — ALWAYS re-applied on top
    of the pruned read so stats can only cost I/O, never rows."""
    out = F.lit(True)
    for col, op, value in predicates:
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}; one of {_OPS}")
        out = out & _predicate_column(col, op, value)
    return out


def _list_data_files(path: str) -> list[str]:
    """Current data-file relpaths — driver-side metadata walk, the same
    listing any parquet scan performs (skips dot/underscore dirs and
    the staging/trash siblings, which live OUTSIDE the table dir)."""
    out = []
    base = os.path.abspath(path)
    for root, dirs, names in os.walk(base):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for name in names:
            if name.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(root, name), base))
    return sorted(out)


def _invalidated_since(path: str, ts_ns: int) -> list[str] | None:
    """Partition relpaths whose EXISTING files may have changed since
    ``ts_ns`` per the commit log; None when a full rewrite invalidates
    everything. Unlike ``warehouse.changed_partitions_since`` this is
    op-aware: ``append`` commits are ignored — an append only ADDS
    uniquely-named files (caught by the unknown-file net), it never
    rewrites a file a zone map describes."""
    log = os.path.join(path, _COMMIT_LOG)
    if not os.path.exists(log):
        return []  # no log: rewrites rename files, unknown-net catches
    touched: set[str] = set()
    with open(log) as fh:
        for line in fh:
            rec = json.loads(line)
            if rec["ts_ns"] <= ts_ns or rec["op"] == "append":
                continue
            if rec["partitions"] is None:
                return None
            touched.update(rec["partitions"])
    return sorted(touched)


def plan_skip(path: str, predicates: list[tuple],
              stats: dict | None = None) -> dict:
    """The pruning decision, file by file, without reading anything:
    ``{"kept": [...], "pruned": [...], "stale": [...], "unknown": [...],
    "fallback": reason|None}``. ``kept`` includes stale and unknown
    files (they must be read); ``fallback`` is set when the whole table
    must be scanned (no stats, or a full rewrite since the snapshot)."""
    stats = stats if stats is not None else load_stats(path)
    if stats is None:
        return {"kept": None, "pruned": [], "stale": [], "unknown": [],
                "fallback": "no stats file"}
    changed = _invalidated_since(path, stats["ts_ns"])
    if changed is None:
        return {"kept": None, "pruned": [], "stale": [], "unknown": [],
                "fallback": "full rewrite since stats snapshot"}
    stale_rels = tuple(changed)
    kept, pruned, stale, unknown = [], [], [], []
    for rel in _list_data_files(path):
        if stale_rels and rel.startswith(
                tuple(r + "/" for r in stale_rels)):
            stale.append(rel)
            kept.append(rel)
            continue
        rec = stats["files"].get(rel)
        if rec is None:
            unknown.append(rel)  # appended after the snapshot
            kept.append(rel)
        elif _file_may_match(rec, predicates):
            kept.append(rel)
        else:
            pruned.append(rel)
    return {"kept": kept, "pruned": pruned, "stale": stale,
            "unknown": unknown, "fallback": None}


def estimate_scan(path: str, predicates: list[tuple],
                  stats: dict | None = None) -> dict:
    """Metadata-only scan-cost estimate for a predicate: how many
    files/bytes the pruned read will open vs the whole table, and the
    known row count behind the kept files (stale/unknown files have no
    trustworthy stats row count). The admission-control half of data
    skipping: a scheduler can refuse or re-cluster a query that would
    open 95% of a 100 TB table."""
    stats = stats if stats is not None else load_stats(path)
    plan = plan_skip(path, predicates, stats=stats)
    all_files = _list_data_files(path)
    bytes_total = sum(
        os.path.getsize(os.path.join(path, rel)) for rel in all_files)
    if plan["fallback"] is not None:
        return {"files_total": len(all_files), "files_kept": len(all_files),
                "bytes_total": bytes_total, "bytes_kept": bytes_total,
                "rows_known_kept": None, "fallback": plan["fallback"]}
    fresh = set(plan["kept"]) - set(plan["stale"]) - set(plan["unknown"])
    return {
        "files_total": len(all_files),
        "files_kept": len(plan["kept"]),
        "bytes_total": bytes_total,
        "bytes_kept": sum(os.path.getsize(os.path.join(path, rel))
                          for rel in plan["kept"]),
        "rows_known_kept": sum(stats["files"][rel]["rows"]
                               for rel in fresh),
        "fallback": None,
    }


def read_skipping(spark: SparkSession, path: str,
                  predicates: list[tuple],
                  stats: dict | None = None) -> DataFrame:
    """Predicate-filtered read that opens only the files the zone maps
    cannot rule out. ``predicates`` is an AND-list of
    ``(col, op, value)`` with ops from ``_OPS``. Falls back to a plain
    scan when stats are missing or invalidated; in every path the real
    predicate is re-applied, so the result is ALWAYS identical to
    ``spark.read.parquet(path).filter(...)`` — stats only change how
    many files are opened."""
    flt = predicate_filter(predicates)
    plan = plan_skip(path, predicates, stats=stats)
    if plan["fallback"] is not None:
        return spark.read.parquet(path).filter(flt)
    if not plan["kept"]:
        # nothing can match: typed-empty via one footer, no data read
        return spark.read.parquet(path).filter(F.lit(False))
    paths = [os.path.join(path, rel) for rel in plan["kept"]]
    return (spark.read.option("basePath", path).parquet(*paths)
            .filter(flt))
