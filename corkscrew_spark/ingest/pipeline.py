"""Orchestrated scan pipeline — discover → scan → persist → log.

S14's driver-side control flow (internal/orchestrator/orchestrator.go:
116-320) plus the single-writer persistence discipline SURVEY.md §3.2
calls for: exactly one code path writes the warehouse (the reference
lets plugins and CLI write the same DuckDB file independently —
split-brain this rebuild deliberately avoids). Resources land through
merge_upsert (K1), scan runs append to scan_metadata (K5), and per-
(service, region) API telemetry appends to api_action_metadata (K6) —
each derived from the scanned DataFrame with Spark aggregations, not
driver loops (A5: "do it in Spark, not driver").
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corkscrew_spark import warehouse
from corkscrew_spark.ingest import aws_scanner
from corkscrew_spark.schema import API_ACTION_SCHEMA, SCAN_METADATA_SCHEMA


class ExpectationsViolated(ValueError):
    """Raised by run_scan(strict_expectations=True) when the batch
    fails its gate — typed so callers (the CLI) never have to
    string-match the message."""


def run_scan(spark: SparkSession, out_dir: str, services: list[str],
             regions: list[str], use_sdk: bool = False,
             scan_id: str | None = None,
             with_relationships: bool = False,
             client_factory=None,
             expectations: list[dict] | None = None,
             strict_expectations: bool = False) -> dict:
    """One full scan run. Returns the scan summary dict (also persisted
    as the scan_metadata row). ``with_relationships=True`` additionally
    extracts typed edges from the scanned blobs (RelationshipExtractor
    parity) into ``out_dir/relationships``. ``client_factory`` passes
    through to aws_scanner.scan (the stubbed-real-client test seam).

    ``expectations`` (warehouse.validate_expectations rules) gate the
    batch BEFORE it merges: violations land in the summary's
    ``warnings``, and ``failed_resources`` records the LARGEST
    violation count across rules — a lower bound on distinct failing
    rows (a row violating several rules counts once; exact row
    attribution would need a second scan). With ``strict_expectations``
    a violated rule aborts the scan (ExpectationsViolated) and nothing
    is written — the publish gate a warehouse runs so one bad scan
    can't poison the keyed table. The batch is persisted across the
    validation+merge double-use so real SDK calls never re-fire, and
    unpersisted even when the merge fails.
    """
    scan_id = scan_id or f"scan-{uuid.uuid4().hex[:12]}"
    t0 = time.monotonic()
    started = dt.datetime.now()

    # The raw scan (resources + error side-channel) is persisted for its
    # multiple uses below (split, validate, merge) so API calls — real,
    # stubbed, or faked — fire exactly once per cell.
    raw = aws_scanner.scan_with_errors(
        spark, services, regions, use_sdk=use_sdk,
        client_factory=client_factory).persist()
    resources = raw.filter(F.col("error_code").isNull()).drop(
        "error_code", "error_message")
    # failed cells: metadata-sized (bounded by |services| x |regions|)
    error_cells = (
        raw.filter(F.col("error_code").isNotNull())
        .select("service", "region", "error_code", "error_message")
        .collect()
    )
    warnings = None
    failed_rows = 0
    persisted = True
    try:
        if expectations:
            report = warehouse.validate_expectations(
                resources, expectations).collect()  # rule-sized, not data-sized
            violated = [r for r in report if not r.passed]
            if violated:
                msgs = [f"{r.rule}: {r.violations} violation(s)"
                        for r in violated]
                if strict_expectations:
                    raise ExpectationsViolated(
                        "scan aborted by expectations: " + "; ".join(msgs))
                warnings = json.dumps(msgs)
                # lower bound on distinct failing rows (see docstring)
                failed_rows = int(max(r.violations for r in violated))
        res_path = os.path.join(out_dir, "resources")
        before = (
            spark.read.parquet(res_path).count()
            if os.path.exists(res_path) else 0
        )
        # Partition the warehouse by service so each scan's upsert is
        # PARTITION-SCOPED: scanning two services rewrites two
        # directories, never the whole table (a resource id embeds its
        # service, so keyed merge locality holds). First run lays out
        # the hive directories.
        total = warehouse.merge_upsert(spark, res_path, resources,
                                       keys=["id"],
                                       partition_cols=["service"])
        # per-cell counts for THIS scan's telemetry — metadata-sized
        # (bounded by |services| x |regions|), collected while the batch
        # is persisted. Sourcing from the batch, not the merged table,
        # attributes to this scan only its own resources (a re-scan of
        # one service must not re-claim other scans' rows) and saves a
        # full table re-read.
        cell_counts = (
            resources.groupBy("service", "region")
            .agg(F.count(F.lit(1)).cast("int").alias("resource_count"))
            .collect()
        )
    finally:
        if persisted:
            raw.unpersist()

    if with_relationships:
        edges = aws_scanner.extract_relationships(spark.read.parquet(res_path))
        warehouse.merge_upsert(
            spark, os.path.join(out_dir, "relationships"), edges,
            keys=["from_id", "to_id", "relationship_type"],
            order_col="discovered_at")

    # per-(service, region) telemetry (A5): one success row per healthy
    # cell counted from THIS scan's batch, one failure row per faulted
    # cell with the SDK error code and a matching HTTP status class —
    # the reference's per-operation error accounting
    # (failure_mode_test.go asserts exactly this shape).
    def _api_row(service, region, *, success, resource_count=0,
                 status_code=200, error_code=None, error_message=None):
        return {
            "id": f"{scan_id}-{service}-{region}"
                  + ("" if success else "-error"),
            "provider": "aws",
            "correlation_id": scan_id,
            "service": service,
            "operation_name": "List",
            "operation_type": "list",
            "execution_time": started,
            "region": region,
            "account_id": "111111111111",
            "success": success,
            "status_code": status_code,
            "duration_ms": 0,
            "resource_count": resource_count,
            "error_code": error_code,
            "error_message": error_message,
            "rate_limit_remaining": None,
            "request_charge": None,
            "created_at": started,
        }

    # one success row per HEALTHY cell — including cells that succeeded
    # with zero resources (monitoring must distinguish 'scanned and
    # empty' from 'never scanned'); unknown services never scan at all
    # and get no row, failed cells get the failure row below
    counts = {(c.service, c.region): c.resource_count for c in cell_counts}
    failed = {(c.service, c.region) for c in error_cells}
    healthy = [
        (s, r)
        for s in services if s in aws_scanner.LIST_OPERATIONS
        for r in regions
        if (s, r) not in failed
    ]
    api_rows = [
        _api_row(s, r, success=True, resource_count=counts.get((s, r), 0))
        for s, r in healthy
    ] + [
        _api_row(
            c.service, c.region, success=False,
            status_code=(
                403 if c.error_code in aws_scanner.ACCESS_DENIED_CODES
                else 429 if c.error_code in aws_scanner.THROTTLE_CODES
                else 500),
            error_code=c.error_code, error_message=c.error_message)
        for c in error_cells
    ]
    warehouse.append(
        spark.createDataFrame(api_rows, API_ACTION_SCHEMA),
        os.path.join(out_dir, "api_action_metadata"),
    )

    duration_ms = int((time.monotonic() - t0) * 1000)
    new = max(total - before, 0)
    summary = {
        "id": scan_id,
        "provider": "aws",
        "scan_type": "batch",
        "services": json.dumps(sorted(services)),
        "regions": json.dumps(sorted(regions)),
        "accounts": json.dumps(["111111111111"]),
        "total_resources": total,
        "new_resources": new,
        "updated_resources": total - new if before else 0,
        "deleted_resources": 0,
        "failed_resources": failed_rows,
        "scan_start_time": started,
        "scan_end_time": dt.datetime.now(),
        "duration_ms": duration_ms,
        "initiated_by": "cli",
        "scan_reason": None,
        "error_messages": json.dumps(
            [f"{c.service}/{c.region}: {c.error_code}"
             for c in error_cells]) if error_cells else None,
        "warnings": warnings,
        "metadata": None,
        "status": "completed_with_errors" if error_cells else "completed",
    }
    warehouse.append(
        spark.createDataFrame([summary], SCAN_METADATA_SCHEMA),
        os.path.join(out_dir, "scan_metadata"),
    )
    return summary
