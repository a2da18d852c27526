"""Versioned parquet tables: snapshot isolation + time travel.

The reference keeps one mutable DuckDB file; the warehouse here keeps
parquet snapshots. This module adds the missing storage discipline — the
snapshot-log pattern of Delta Lake / Iceberg (public designs), reduced
to its load-bearing core so it stays dependency-free and testable:

* Every write lands in an immutable ``v=N`` directory; readers resolve
  the version from a manifest written via atomic rename, so a reader
  sees one consistent snapshot, never a half-written mix.
* Writers claim version N by atomically creating its directory —
  optimistic concurrency: two racing writers cannot both win the same
  version; the loser raises ``VersionConflict`` and can re-derive from
  the new latest (Delta's commit-conflict semantics).
* Time travel: read any retained version by number or "as of" a
  timestamp (audit/repro — what did the estate look like yesterday?).
* ``vacuum`` drops old snapshot directories but never the manifest
  history rows (cheap lineage of what happened when).

On a real deployment these call sites map 1:1 onto Delta tables; this
keeps the semantics runnable with zero extra dependencies, like
warehouse.merge_upsert's directory-swap.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_versions.json"


class VersionConflict(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def read_manifest(path: str) -> list[dict]:
    p = _manifest_path(path)
    if not os.path.exists(p):
        return []
    with open(p) as fh:
        return json.load(fh)


def _write_manifest(path: str, entries: list[dict]) -> None:
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh, indent=1)
    os.replace(tmp, _manifest_path(path))  # atomic on POSIX


def latest_version(path: str) -> int | None:
    entries = read_manifest(path)
    return entries[-1]["version"] if entries else None


def write_version(df: DataFrame, path: str, op: str = "overwrite",
                  commit_ts: float | None = None) -> int:
    """Commit ``df`` as the next snapshot; returns the version number.

    Optimistic concurrency: the ``v=N`` directory is claimed with an
    atomic mkdir before any data is written; a racing writer that
    claimed it first surfaces as ``VersionConflict``.
    """
    os.makedirs(path, exist_ok=True)
    version = (latest_version(path) or 0) + 1
    vdir = os.path.join(path, f"v={version}")
    try:
        os.mkdir(vdir)  # atomic claim
    except FileExistsError as ex:
        raise VersionConflict(
            f"version {version} at {path} was committed concurrently"
        ) from ex
    df.write.mode("overwrite").parquet(os.path.join(vdir, "data"))
    rows = df.sparkSession.read.parquet(os.path.join(vdir, "data")).count()
    entries = read_manifest(path)
    entries.append({
        "version": version,
        "ts": commit_ts if commit_ts is not None else time.time(),
        "op": op,
        "rows": rows,
    })
    _write_manifest(path, entries)
    return version


def read_version(spark: SparkSession, path: str, version: int | None = None,
                 as_of_ts: float | None = None) -> DataFrame:
    """Read a snapshot: latest by default, a specific ``version``, or the
    newest version committed at or before ``as_of_ts`` (time travel)."""
    entries = read_manifest(path)
    if not entries:
        raise FileNotFoundError(f"no versions at {path}")
    if version is not None and as_of_ts is not None:
        raise ValueError("pass version or as_of_ts, not both")
    if version is None:
        pool = (
            [e for e in entries if e["ts"] <= as_of_ts]
            if as_of_ts is not None else entries
        )
        if not pool:
            raise ValueError(
                f"no version at or before ts={as_of_ts} (earliest: "
                f"{entries[0]['ts']})")
        version = pool[-1]["version"]
    known = {e["version"] for e in entries}
    if version not in known:
        raise ValueError(f"unknown version {version} (have {sorted(known)})")
    vdir = os.path.join(path, f"v={version}", "data")
    if not os.path.exists(vdir):
        raise ValueError(f"version {version} was vacuumed")
    return spark.read.parquet(vdir)


def history(path: str) -> list[dict]:
    """The commit log, oldest first (Delta DESCRIBE HISTORY analog)."""
    return list(read_manifest(path))


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop snapshot data older than the last ``keep_last`` versions.
    Manifest rows are kept (lineage survives); returns dropped versions."""
    import shutil

    entries = read_manifest(path)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    keep = {e["version"] for e in entries[-keep_last:]}
    dropped = []
    for e in entries[:-keep_last] if keep_last else entries:
        v = e["version"]
        vdir = os.path.join(path, f"v={v}")
        if v not in keep and os.path.exists(vdir):
            shutil.rmtree(vdir)
            dropped.append(v)
    return dropped


def upsert_version(spark: SparkSession, path: str, updates: DataFrame,
                   keys: list[str], order_col: str = "scanned_at") -> int:
    """Keyed merge committed as a new snapshot: newest ``order_col`` per
    key wins (update beats existing on ties). The versioned sibling of
    warehouse.merge_upsert — history stays queryable."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tagged = updates.withColumn("_src", F.lit(1))
    if latest_version(path) is not None:
        existing = read_version(spark, path).withColumn("_src", F.lit(0))
        merged = existing.unionByName(tagged)
    else:
        merged = tagged
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc("_src"))
    # No checkpoint needed: the merge writes a NEW v=N+1 directory while
    # the plan reads the prior snapshots, which stay in place.
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    return write_version(result, path, op="upsert")
