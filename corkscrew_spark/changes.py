"""Change tracking, baselines, and drift detection.

Reference parity (SURVEY.md §2.7):
  C1  query_changes    — dynamic filter builder (change_storage.go:485-568)
  C2  change_history   — per-resource timeline (change_storage.go:249-272)
  C3  create_baseline  — snapshot (aws_change_tracker.go:378-441)
  C4  detect_drift     — baseline vs live full-outer compare
                         (aws_change_tracker.go:260-332,750-811)
  C6  impact scoring   — keyword-weighted risk (base_change_tracker.go:115-312)

Scale shape: drift is ONE full-outer join on resource id plus exploded
map compares — no per-resource driver loops; the reference's
map[id]ResourceState JSON blob becomes a relational baseline_resources
table so the diff distributes.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from corkscrew_spark.operators.paging import limit_offset
from corkscrew_spark.schema import CHANGE_TYPES, SEVERITIES


# ---------------------------------------------------------------------------
# C1/C2 — change queries
# ---------------------------------------------------------------------------

def query_changes(
    events: DataFrame,
    provider: str | None = None,
    start: str | datetime | None = None,
    end: str | datetime | None = None,
    change_types: Sequence[str] | None = None,
    resource_ids: Sequence[str] | None = None,
    resource_types: Sequence[str] | None = None,
    severities: Sequence[str] | None = None,
    sort_by: str = "timestamp",
    descending: bool = True,
    limit: int = 1000,
    offset: int = 0,
) -> DataFrame:
    """Dynamic AND-filter change query with validated sort + pagination.

    Mirrors the reference's SQL builder incl. its guardrails: unknown sort
    columns fall back to timestamp, limit is capped at 10000
    (base_change_tracker.go:50-93).
    """
    if change_types:
        bad = set(change_types) - set(CHANGE_TYPES)
        if bad:
            raise ValueError(f"invalid change types: {sorted(bad)}")
    if severities:
        bad = set(severities) - set(SEVERITIES)
        if bad:
            raise ValueError(f"invalid severities: {sorted(bad)}")
    limit = min(max(limit, 1), 10_000)
    if sort_by not in events.columns:
        sort_by = "timestamp"

    df = events
    if provider:
        df = df.filter(F.col("provider") == provider)
    if start is not None:
        df = df.filter(F.col("timestamp") >= F.lit(start))
    if end is not None:
        df = df.filter(F.col("timestamp") <= F.lit(end))
    if change_types:
        df = df.filter(F.col("change_type").isin(list(change_types)))
    if resource_ids:
        df = df.filter(F.col("resource_id").isin(list(resource_ids)))
    if resource_types:
        df = df.filter(F.col("resource_type").isin(list(resource_types)))
    if severities:
        df = df.filter(F.col("severity").isin(list(severities)))

    order = [F.desc(sort_by) if descending else F.asc(sort_by), F.asc("id")]
    return limit_offset(df, order, limit, offset)


def change_history(events: DataFrame, resource_id: str | None, limit: int = 1000) -> DataFrame:
    """Per-resource timeline, newest first (change_storage.go:249-272).

    ``resource_id=None`` skips the filter for callers that already
    narrowed the input (e.g. by a semi join against a computed id set).
    """
    if resource_id is not None:
        events = events.filter(F.col("resource_id") == resource_id)
    return events.orderBy(F.desc("timestamp"), F.asc("id")).limit(limit)


# ---------------------------------------------------------------------------
# C6 — impact scoring
# ---------------------------------------------------------------------------

#: keyword → (category, weight) — the reference's keyword tables
#: (base_change_tracker.go:133-250) collapsed to column expressions.
_IMPACT_RULES: list[tuple[str, str, int]] = [
    ("iam|policy|role|permission", "security", 40),
    ("public|acl|network|firewall", "security", 35),
    ("encrypt|kms|key", "security", 30),
    ("cpu|memory|size|instance_type", "cost", 15),
    ("replica|backup|availability", "availability", 20),
]


def with_impact_scores(events: DataFrame) -> DataFrame:
    """Attach category flags + a weighted risk score per event.

    changed_fields is a JSON string array; matching runs as JVM regex over
    the raw string (cheaper than parse+explode for scoring, identical
    result for flat arrays)."""
    fields = F.coalesce(F.col("changed_fields"), F.lit(""))
    score = F.lit(0)
    sec = F.lit(False)
    cost = F.lit(False)
    avail = F.lit(False)
    for pattern, category, weight in _IMPACT_RULES:
        hit = fields.rlike(pattern)
        score = score + F.when(hit, weight).otherwise(0)
        if category == "security":
            sec = sec | hit
        elif category == "cost":
            cost = cost | hit
        else:
            avail = avail | hit
    type_bump = (
        F.when(F.col("change_type") == "DELETE", 25)
        .when(F.col("change_type") == "POLICY_CHANGE", 20)
        .otherwise(0)
    )
    total = score + type_bump
    return events.withColumns(
        {
            "security_impact": sec,
            "cost_impact": cost,
            "availability_impact": avail,
            "risk_score": F.least(total, F.lit(100)),
            "risk_level": F.when(total >= 60, "CRITICAL")
            .when(total >= 40, "HIGH")
            .when(total >= 20, "MEDIUM")
            .otherwise("LOW"),
        }
    )


# ---------------------------------------------------------------------------
# C3/C4 — baseline + drift
# ---------------------------------------------------------------------------

def create_baseline(resources: DataFrame, name: str, provider: str = "aws",
                    baseline_id: str | None = None) -> tuple[DataFrame, DataFrame]:
    """Snapshot → (baseline_row, baseline_resources).

    The per-resource state is kept relational (id, properties JSON, tags
    map, checksum) — sha2 over the canonical struct, the checksum the
    reference stubs out (base_change_tracker.go:105-112)."""
    bid = baseline_id or f"bl-{uuid.uuid4().hex[:12]}"
    snap = resources.select(
        F.lit(bid).alias("baseline_id"),
        F.col("id").alias("resource_id"),
        F.col("type").alias("resource_type"),
        F.coalesce(F.col("attributes"), F.lit("{}")).alias("properties"),
        F.col("tags"),
        F.col("state").alias("status"),
        F.sha2(
            F.to_json(F.struct("id", "type", "attributes", "tags", "state")), 256
        ).alias("checksum"),
    )
    row = resources.sparkSession.createDataFrame(
        [(bid, name, None, provider, datetime.utcnow(), "1.0", True)],
        "id string, name string, description string, provider string, "
        "created_at timestamp, version string, active boolean",
    )
    return row, snap


DRIFT_TYPES = ("DELETED", "NEW", "PROPERTY_CHANGE", "MISSING_PROPERTY", "TAG_CHANGE",
               "MISSING_TAG", "STATE_CHANGE")


def detect_drift(baseline_resources: DataFrame, current: DataFrame) -> DataFrame:
    """Baseline vs live comparison → one row per drift item.

    Distributed shape: full-outer join on resource id for presence drift;
    exploded property/tag maps full-outer-joined on (id, key) for value
    drift — the reference's per-resource Go map loops
    (aws_change_tracker.go:750-811) become two set operations.

    Returns (resource_id, drift_type, field, baseline_value, current_value,
    severity).
    """
    cur = current.select(
        F.col("id").alias("resource_id"),
        F.coalesce(F.col("attributes"), F.lit("{}")).alias("cur_props"),
        F.col("tags").alias("cur_tags"),
        F.col("state").alias("cur_status"),
    )
    base = baseline_resources.select(
        "resource_id",
        F.col("properties").alias("base_props"),
        F.col("tags").alias("base_tags"),
        F.col("status").alias("base_status"),
    )
    joined = base.join(cur, "resource_id", "full_outer").localCheckpoint(eager=True)

    deleted = (
        joined.filter(F.col("cur_status").isNull() & F.col("base_status").isNotNull()
                      & F.col("cur_props").isNull())
        .filter(F.col("cur_tags").isNull())
        .select(
            "resource_id",
            F.lit("DELETED").alias("drift_type"),
            F.lit(None).cast("string").alias("field"),
            F.lit(None).cast("string").alias("baseline_value"),
            F.lit(None).cast("string").alias("current_value"),
            F.lit("HIGH").alias("severity"),
        )
    )
    new = (
        joined.filter(F.col("base_props").isNull() & F.col("base_tags").isNull())
        .select(
            "resource_id",
            F.lit("NEW").alias("drift_type"),
            F.lit(None).cast("string").alias("field"),
            F.lit(None).cast("string").alias("baseline_value"),
            F.lit(None).cast("string").alias("current_value"),
            F.lit("MEDIUM").alias("severity"),
        )
    )
    both = joined.filter(
        F.col("base_status").isNotNull() | F.col("base_props").isNotNull()
    ).filter(F.col("cur_status").isNotNull() | F.col("cur_props").isNotNull())

    state_change = (
        both.filter(
            F.coalesce(F.col("base_status"), F.lit("")) !=
            F.coalesce(F.col("cur_status"), F.lit(""))
        )
        .select(
            "resource_id",
            F.lit("STATE_CHANGE").alias("drift_type"),
            F.lit("state").alias("field"),
            F.col("base_status").alias("baseline_value"),
            F.col("cur_status").alias("current_value"),
            F.lit("MEDIUM").alias("severity"),
        )
    )

    # properties: JSON string map → map → explode to (id, key, value)
    bprops = both.select(
        "resource_id",
        F.explode_outer(
            F.from_json("base_props", "map<string,string>")
        ).alias("field", "bval"),
    )
    cprops = both.select(
        "resource_id",
        F.explode_outer(
            F.from_json("cur_props", "map<string,string>")
        ).alias("field", "cval"),
    )
    pj = bprops.filter(F.col("field").isNotNull()).join(
        cprops.filter(F.col("field").isNotNull()), ["resource_id", "field"], "full_outer"
    )
    prop_missing = pj.filter(F.col("cval").isNull() & F.col("bval").isNotNull()).select(
        "resource_id", F.lit("MISSING_PROPERTY").alias("drift_type"), "field",
        F.col("bval").alias("baseline_value"),
        F.lit(None).cast("string").alias("current_value"),
        F.lit("MEDIUM").alias("severity"),
    )
    prop_changed = pj.filter(
        F.col("cval").isNotNull() & F.col("bval").isNotNull() & (F.col("cval") != F.col("bval"))
    ).select(
        "resource_id", F.lit("PROPERTY_CHANGE").alias("drift_type"), "field",
        F.col("bval").alias("baseline_value"), F.col("cval").alias("current_value"),
        F.when(F.col("field").rlike("encrypt|public|policy|iam"), "HIGH")
        .otherwise("LOW").alias("severity"),
    )

    btags = both.select("resource_id", F.explode_outer("base_tags").alias("field", "bval"))
    ctags = both.select("resource_id", F.explode_outer("cur_tags").alias("field", "cval"))
    tj = btags.filter(F.col("field").isNotNull()).join(
        ctags.filter(F.col("field").isNotNull()), ["resource_id", "field"], "full_outer"
    )
    tag_missing = tj.filter(F.col("cval").isNull() & F.col("bval").isNotNull()).select(
        "resource_id", F.lit("MISSING_TAG").alias("drift_type"), "field",
        F.col("bval").alias("baseline_value"),
        F.lit(None).cast("string").alias("current_value"),
        F.lit("LOW").alias("severity"),
    )
    tag_changed = tj.filter(
        F.col("cval").isNotNull() & F.col("bval").isNotNull() & (F.col("cval") != F.col("bval"))
    ).select(
        "resource_id", F.lit("TAG_CHANGE").alias("drift_type"), "field",
        F.col("bval").alias("baseline_value"), F.col("cval").alias("current_value"),
        F.lit("LOW").alias("severity"),
    )

    return (
        deleted.unionByName(new)
        .unionByName(state_change)
        .unionByName(prop_missing)
        .unionByName(prop_changed)
        .unionByName(tag_missing)
        .unionByName(tag_changed)
    )


def drift_summary(drift: DataFrame, total_resources: int) -> DataFrame:
    """Severity rollup + compliance score (aws_change_tracker.go:268-332):
    score = (total - drifted)/total*100."""
    drifted = drift.select("resource_id").distinct().count()
    score = round((total_resources - drifted) / total_resources * 100, 2) if total_resources else 100.0
    return (
        drift.groupBy("drift_type", "severity")
        .agg(F.count("*").alias("items"))
        .withColumn("drifted_resources", F.lit(drifted))
        .withColumn("compliance_score", F.lit(score))
        .orderBy("drift_type", "severity")
    )


def detect_anomalies(events: DataFrame, resource_col: str = "resource_id",
                     service_col: str = "service",
                     freq_threshold: int = 1000,
                     resource_threshold: int = 50) -> DataFrame:
    """Change-pattern anomaly report — ChangeAnalytics parity
    (plugins/gcp-provider/change_analytics.go:715-775: frequency_spike,
    service_concentration, resource_hotspot), re-expressed as three
    aggregations unioned into one frame instead of the reference's
    collect-10k-rows-and-loop. Each detector is a groupBy on its natural
    key plus a broadcast 1-row total — nothing leaves the executors, so
    the same report runs over billions of change events.

    Returns (anomaly_type, subject, observed, threshold, severity,
    confidence) ordered for deterministic hashing by the caller.
    """
    total = events.agg(F.count(F.lit(1)).alias("__total"))
    spike = (
        total.filter(F.col("__total") > freq_threshold)
        .select(
            F.lit("frequency_spike").alias("anomaly_type"),
            F.lit("__total__").alias("subject"),
            F.col("__total").cast("long").alias("observed"),
            F.lit(freq_threshold).cast("long").alias("threshold"),
            F.lit("HIGH").alias("severity"),
            F.lit(0.8).alias("confidence"),
        )
    )
    concentration = (
        events.groupBy(F.col(service_col).alias("subject"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * 2 > F.col("__total"))
        .select(
            F.lit("service_concentration").alias("anomaly_type"),
            "subject",
            F.col("n").cast("long").alias("observed"),
            (F.col("__total") / 2).cast("long").alias("threshold"),
            F.lit("MEDIUM").alias("severity"),
            F.lit(0.7).alias("confidence"),
        )
    )
    hotspot = (
        events.groupBy(F.col(resource_col).alias("subject"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > resource_threshold)
        .select(
            F.lit("resource_hotspot").alias("anomaly_type"),
            "subject",
            F.col("n").cast("long").alias("observed"),
            F.lit(resource_threshold).cast("long").alias("threshold"),
            F.lit("MEDIUM").alias("severity"),
            F.lit(0.9).alias("confidence"),
        )
    )
    return spike.unionByName(concentration).unionByName(hotspot)


def top_changed_resources(events: DataFrame, resource_col: str = "resource_id",
                          type_col: str = "change_type",
                          ts_col: str = "timestamp", k: int = 25) -> DataFrame:
    """Most-changed resources with per-resource summaries —
    createResourceSummary / sortResourceSummaries parity
    (change_analytics.go:794-843): change count, activity span, distinct
    change types, and the dominant change type (ties broken
    lexicographically so the result is engine-stable). One shuffle on the
    resource key + a tiny per-resource window for the dominant type.
    """
    per_type = events.groupBy(
        F.col(resource_col).alias("resource_id"),
        F.col(type_col).alias("change_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("resource_id").orderBy(F.desc("n"), "change_type")
    dominant = (
        per_type.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("resource_id", F.col("change_type").alias("dominant_type"))
    )
    summary = events.groupBy(F.col(resource_col).alias("resource_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_changes"),
        F.min(ts_col).alias("first_change"),
        F.max(ts_col).alias("last_change"),
        F.countDistinct(type_col).cast("long").alias("n_change_types"),
    )
    return (
        summary.join(dominant, "resource_id")
        .orderBy(F.desc("n_changes"), "resource_id")
        .limit(k)
    )
