"""Change tracking / baseline / drift tests over the synthetic provider."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corkscrew_spark import changes
from corkscrew_spark.ingest import synthetic


@pytest.fixture(scope="module")
def world(spark):
    res = synthetic.resources(spark, 60).localCheckpoint(eager=True)
    ev = synthetic.change_events(spark, res, per_resource=4).localCheckpoint(eager=True)
    return res, ev


def test_query_changes_filters_and_pagination(world):
    _res, ev = world
    page1 = changes.query_changes(ev, change_types=["DELETE", "CREATE"], limit=10).collect()
    assert 0 < len(page1) <= 10
    assert all(r["change_type"] in ("DELETE", "CREATE") for r in page1)
    page2 = changes.query_changes(ev, change_types=["DELETE", "CREATE"], limit=10,
                                  offset=10).collect()
    assert {r["id"] for r in page1}.isdisjoint({r["id"] for r in page2})


def test_query_changes_rejects_bad_enums(world):
    _res, ev = world
    with pytest.raises(ValueError, match="invalid change types"):
        changes.query_changes(ev, change_types=["NOPE"])


def test_change_history_newest_first(world):
    res, ev = world
    rid = res.select("id").first()["id"]
    hist = changes.change_history(ev, rid).collect()
    assert len(hist) == 4
    ts = [r["timestamp"] for r in hist]
    assert ts == sorted(ts, reverse=True)


def test_impact_scores_keywords(spark):
    df = spark.createDataFrame(
        [
            ("a", '["iam_policy"]', "UPDATE"),
            ("b", '["description"]', "UPDATE"),
            ("c", '["encryption_key"]', "DELETE"),
        ],
        "id string, changed_fields string, change_type string",
    )
    got = {r["id"]: r for r in changes.with_impact_scores(df).collect()}
    assert got["a"]["security_impact"] and got["a"]["risk_score"] == 40
    assert not got["b"]["security_impact"] and got["b"]["risk_score"] == 0
    assert got["c"]["risk_score"] == 30 + 25 and got["c"]["risk_level"] == "HIGH"


def test_baseline_and_drift_roundtrip(spark, world):
    res, _ev = world
    _row, snap = changes.create_baseline(res, "t0")
    # no changes yet -> no drift
    assert changes.detect_drift(snap, res).count() == 0

    # mutate: drop one resource, change state of another, retag a third
    ids = [r["id"] for r in res.orderBy("id").limit(3).collect()]
    current = (
        res.filter(F.col("id") != ids[0])
        .withColumn(
            "state",
            F.when(F.col("id") == ids[1], F.lit("terminated")).otherwise(F.col("state")),
        )
        .withColumn(
            "tags",
            F.when(F.col("id") == ids[2],
                   F.create_map(F.lit("Environment"), F.lit("Mutated"))).otherwise(F.col("tags")),
        )
    )
    drift = changes.detect_drift(snap, current)
    kinds = {(r["resource_id"], r["drift_type"]) for r in drift.collect()}
    assert (ids[0], "DELETED") in kinds
    assert (ids[1], "STATE_CHANGE") in kinds
    assert (ids[2], "TAG_CHANGE") in kinds
    assert (ids[2], "MISSING_TAG") in kinds  # Team tag disappeared

    summary = changes.drift_summary(drift, res.count()).collect()
    assert summary and all(0 <= r["compliance_score"] <= 100 for r in summary)


def test_detect_anomalies_thresholds(spark):
    from pyspark.sql import Row

    from corkscrew_spark import changes

    # 60 changes on r-hot (> 50 threshold), 120 total (not > 1000: no
    # spike), svc-a holds 100/120 (> half: concentration).
    rows = (
        [Row(resource_id="r-hot", service="svc-a") for _ in range(60)]
        + [Row(resource_id=f"r-{i}", service="svc-a") for i in range(40)]
        + [Row(resource_id=f"q-{i}", service="svc-b") for i in range(20)]
    )
    ev = spark.createDataFrame(rows)
    got = {(r.anomaly_type, r.subject): r.observed
           for r in changes.detect_anomalies(ev).collect()}
    assert got[("resource_hotspot", "r-hot")] == 60
    assert got[("service_concentration", "svc-a")] == 100
    assert not any(t == "frequency_spike" for t, _ in got)
    # exactly-at-threshold cases do NOT fire (strict >)
    ev2 = spark.createDataFrame(
        [Row(resource_id="r", service="a") for _ in range(50)]
        + [Row(resource_id=f"x{i}", service="b") for i in range(50)]
    )
    got2 = {r.anomaly_type for r in changes.detect_anomalies(ev2).collect()}
    assert "resource_hotspot" not in got2          # 50 is not > 50
    assert "service_concentration" not in got2     # 50*2 == 100, not >


def test_top_changed_resources_dominant_tiebreak(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from corkscrew_spark import changes

    t = datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [Row(resource_id="r1", change_type=c, timestamp=t)
         for c in ("UPDATE", "DELETE", "UPDATE", "DELETE")]  # tie 2-2
        + [Row(resource_id="r2", change_type="CREATE", timestamp=t)]
    )
    got = {r.resource_id: r for r in
           changes.top_changed_resources(ev, k=10).collect()}
    assert got["r1"].dominant_type == "DELETE"     # lexicographic tie-break
    assert got["r1"].n_changes == 4 and got["r1"].n_change_types == 2
    assert got["r2"].dominant_type == "CREATE"
