"""Structured-streaming change feed tests (file source → memory sink)."""

from __future__ import annotations

import json
import time

from corkscrew_spark.streaming import change_stream


def _write_events(path, events):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"batch-{time.time_ns()}.json", "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _event(i, ctype="UPDATE", sev="LOW", service="s3", ts="2024-01-01T00:00:00"):
    return {
        "id": f"ce-{i}",
        "provider": "aws",
        "resource_id": f"r-{i % 5}",
        "change_type": ctype,
        "severity": sev,
        "service": service,
        "timestamp": ts,
    }


def test_stream_filter_and_backlog(spark, tmp_path):
    src = tmp_path / "changes"
    _write_events(src, [_event(i) for i in range(8)]
                  + [_event(100 + i, ctype="DELETE", sev="CRITICAL") for i in range(3)])
    stream = change_stream.read_change_stream(spark, str(src))
    assert stream.isStreaming
    critical = change_stream.monitor_changes(stream, severities=["CRITICAL"])
    q = change_stream.start_to_memory(critical, "critical_feed")
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM critical_feed").collect()
    assert len(got) == 3
    assert all(r["change_type"] == "DELETE" for r in got)

    # incremental: a new file is picked up by the next availableNow run
    _write_events(src, [_event(200, ctype="DELETE", sev="CRITICAL")])
    q2 = change_stream.start_to_memory(critical, "critical_feed2")
    q2.awaitTermination(60)
    assert spark.sql("SELECT count(*) c FROM critical_feed2").collect()[0]["c"] == 4


def test_windowed_counts(spark, tmp_path):
    src = tmp_path / "w"
    _write_events(
        src,
        [_event(i, ts="2024-01-01T00:10:00") for i in range(4)]
        + [_event(10 + i, ts="2024-01-01T02:10:00", sev="HIGH") for i in range(2)],
    )
    stream = change_stream.read_change_stream(spark, str(src))
    agg = change_stream.windowed_change_counts(stream, window="1 hour")
    q = change_stream.start_to_memory(agg, "win_counts", output_mode="complete")
    q.awaitTermination(60)
    rows = {(str(r["window_start"]), r["severity"]): r["events"]
            for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert rows[("2024-01-01 00:00:00", "LOW")] == 4
    assert rows[("2024-01-01 02:00:00", "HIGH")] == 2


def test_parquet_sink_exactly_once(spark, tmp_path):
    """start_to_parquet: checkpointed file-source offsets — a second run
    with the same checkpoint processes only files it hasn't seen."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write_events(src, [_event(i) for i in range(5)])
    stream = change_stream.read_change_stream(spark, str(src))
    q = change_stream.start_to_parquet(stream, str(out), str(ckpt), once=True)
    q.awaitTermination(60)
    assert spark.read.parquet(str(out)).count() == 5

    _write_events(src, [_event(100 + i) for i in range(3)])
    q2 = change_stream.start_to_parquet(
        change_stream.read_change_stream(spark, str(src)), str(out), str(ckpt), once=True)
    q2.awaitTermination(60)
    assert spark.read.parquet(str(out)).count() == 8  # 5 old NOT reprocessed


def test_session_change_bursts(spark, tmp_path):
    src = tmp_path / "sess"
    # r-0: three events within the 30-min gap → one burst; then one event
    # 2h later → a separate burst. r-1: a single event.
    _write_events(
        src,
        [_event(0, ts="2024-01-01T00:00:00"),
         _event(5, ts="2024-01-01T00:10:00", ctype="DELETE"),
         _event(10, ts="2024-01-01T00:25:00"),
         _event(15, ts="2024-01-01T02:30:00"),
         _event(1, ts="2024-01-01T00:00:00")],
    )
    stream = change_stream.read_change_stream(spark, str(src))
    agg = change_stream.session_change_bursts(stream, gap="30 minutes")
    q = change_stream.start_to_memory(agg, "bursts", output_mode="complete")
    q.awaitTermination(60)
    rows = {(r["resource_id"], str(r["burst_start"])): r
            for r in spark.sql("SELECT * FROM bursts").collect()}
    assert len(rows) == 3
    burst = rows[("r-0", "2024-01-01 00:00:00")]
    assert burst["events"] == 3
    assert burst["change_types"] == ["DELETE", "UPDATE"]
    # session extends 30 min past the last merged event
    assert str(burst["burst_end"]) == "2024-01-01 00:55:00"
    assert rows[("r-0", "2024-01-01 02:30:00")]["events"] == 1
    assert rows[("r-1", "2024-01-01 00:00:00")]["events"] == 1


def test_correlate_streams_time_bounded(spark, tmp_path):
    """Stream-stream join pairs changes with after-the-fact alerts on the
    same resource inside the correlation window, and only those."""
    chg_dir, alr_dir = tmp_path / "chg", tmp_path / "alr"
    _write_events(chg_dir, [
        _event(1, ts="2024-01-01T00:00:00"),
        _event(2, ts="2024-01-01T01:00:00"),
    ])
    # r-1 alert 5 min after change 1 (in window); r-2 alert 40 min after
    # change 2 (outside the 10-minute bound); r-3 alert with no change.
    _write_events(alr_dir, [
        _event(101, sev="HIGH", ts="2024-01-01T00:05:00"),
        _event(102, sev="HIGH", ts="2024-01-01T01:40:00"),
        _event(103, sev="LOW", ts="2024-01-01T02:00:00"),
    ])
    # ids 1 and 101 share resource r-1 (i % 5); 2/102 share r-2; 103 -> r-3
    joined = change_stream.correlate_streams(
        change_stream.read_change_stream(spark, str(chg_dir)),
        change_stream.read_change_stream(spark, str(alr_dir)),
        within="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("corr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT change_id, alert_id FROM corr_test").collect()
    got = sorted((r.change_id, r.alert_id) for r in rows)
    assert got == [("ce-1", "ce-101")]


def test_streaming_upsert_sink(spark, tmp_path):
    """Micro-batches merge into a keyed table; replayed keys keep the
    newest row (idempotent under at-least-once delivery)."""
    import json as _json

    from corkscrew_spark.streaming import change_stream

    src = tmp_path / "in"
    src.mkdir()
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")

    rows1 = [
        {"id": "r1", "state": "CREATING", "scanned_at": "2025-01-01T00:00:00"},
        {"id": "r2", "state": "ACTIVE", "scanned_at": "2025-01-01T00:00:00"},
    ]
    (src / "b1.json").write_text("\n".join(map(_json.dumps, rows1)))
    schema = "id string, state string, scanned_at timestamp"
    stream = spark.readStream.schema(schema).json(str(src))
    q = change_stream.start_upsert_sink(stream, table, ck, ["id"])
    q.awaitTermination(60)

    got = {r.id: r.state for r in spark.read.parquet(table).collect()}
    assert got == {"r1": "CREATING", "r2": "ACTIVE"}

    rows2 = [
        {"id": "r1", "state": "ACTIVE", "scanned_at": "2025-01-02T00:00:00"},
        {"id": "r3", "state": "ACTIVE", "scanned_at": "2025-01-02T00:00:00"},
        # stale duplicate of r2 — must NOT regress the stored row
        {"id": "r2", "state": "DELETED", "scanned_at": "2024-12-01T00:00:00"},
    ]
    (src / "b2.json").write_text("\n".join(map(_json.dumps, rows2)))
    q = change_stream.start_upsert_sink(stream, table, ck, ["id"])
    q.awaitTermination(60)

    got = {r.id: (r.state) for r in spark.read.parquet(table).collect()}
    assert got == {"r1": "ACTIVE", "r2": "ACTIVE", "r3": "ACTIVE"}


def test_upsert_sink_partition_scoped(spark, tmp_path):
    """partition_cols on the streaming sink: each micro-batch merges
    only its partitions; a service absent from the batch keeps its
    partition files byte-identical across the merge."""
    import json as _json
    import os

    from corkscrew_spark.streaming import change_stream

    src = tmp_path / "in"
    src.mkdir()
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")
    schema = "id string, service string, state string, scanned_at timestamp"

    rows1 = [
        {"id": "a", "service": "s3", "state": "ACTIVE",
         "scanned_at": "2025-01-01T00:00:00"},
        {"id": "b", "service": "ec2", "state": "ACTIVE",
         "scanned_at": "2025-01-01T00:00:00"},
    ]
    (src / "b1.json").write_text("\n".join(map(_json.dumps, rows1)))
    stream = spark.readStream.schema(schema).json(str(src))
    q = change_stream.start_upsert_sink(stream, table, ck, ["id"],
                                        partition_cols=["service"])
    q.awaitTermination(60)
    ec2_dir = os.path.join(table, "service=ec2")
    before = {f: os.stat(os.path.join(ec2_dir, f)).st_mtime_ns
              for f in os.listdir(ec2_dir) if f.endswith(".parquet")}
    assert before

    rows2 = [{"id": "a", "service": "s3", "state": "DELETING",
              "scanned_at": "2025-01-02T00:00:00"}]
    (src / "b2.json").write_text("\n".join(map(_json.dumps, rows2)))
    q = change_stream.start_upsert_sink(stream, table, ck, ["id"],
                                        partition_cols=["service"])
    q.awaitTermination(60)

    after = {f: os.stat(os.path.join(ec2_dir, f)).st_mtime_ns
             for f in os.listdir(ec2_dir) if f.endswith(".parquet")}
    assert after == before  # ec2 untouched by the s3-only batch
    got = {r.id: r.state for r in spark.read.parquet(table).collect()}
    assert got == {"a": "DELETING", "b": "ACTIVE"}


def test_continuous_compliance_on_resource_feed(spark, tmp_path):
    """A pack evaluated per micro-batch through foreachBatch: violations
    surface with the batch id, and the result contract holds."""
    import json

    from corkscrew_spark.compliance.pack import PackLoader
    from corkscrew_spark.streaming import compliance_stream
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    # a minimal pack whose single control reads the streamed view
    packdir = tmp_path / "packs" / "live" / "open-buckets"
    (packdir / "queries").mkdir(parents=True)
    (packdir / "manifest.yaml").write_text(
        "metadata:\n"
        "  namespace: live/open-buckets\n"
        "  name: Live bucket checks\n"
        "  version: \"1.0.0\"\n"
        "  description: streaming demo\n"
        "queries:\n"
        "  - id: public-bucket\n"
        "    name: No public buckets\n"
        "    severity: CRITICAL\n"
        "    file: queries/public_bucket.sql\n")
    (packdir / "queries" / "public_bucket.sql").write_text(
        "SELECT id AS resource_id, name AS resource_name,\n"
        "       'bucket' AS resource_type,\n"
        "       'public-bucket' AS control_id,\n"
        "       'No public buckets' AS control_name,\n"
        "       CASE WHEN acl = 'public' THEN 'FAIL' ELSE 'PASS' END AS status,\n"
        "       CASE WHEN acl = 'public' THEN 'CRITICAL' ELSE 'INFO' END AS severity,\n"
        "       acl AS details\n"
        "FROM resources\n")

    src = tmp_path / "feed"
    src.mkdir()
    with open(src / "b1.json", "w") as fh:
        fh.write(json.dumps({"id": "b-1", "name": "logs", "acl": "private"}) + "\n")
        fh.write(json.dumps({"id": "b-2", "name": "www", "acl": "public"}) + "\n")

    schema = StructType([
        StructField("id", StringType()), StructField("name", StringType()),
        StructField("acl", StringType()),
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    out = str(tmp_path / "results")
    q = compliance_stream.start_continuous_compliance(
        stream, "live/open-buckets", out, str(tmp_path / "ckpt"),
        loader=PackLoader([str(tmp_path / "packs")]),
        available_now=True)
    q.awaitTermination(180)

    rows = {r.resource_id: r for r in spark.read.parquet(out).collect()}
    assert rows["b-2"].status == "FAIL" and rows["b-2"].severity == "CRITICAL"
    assert rows["b-1"].status == "PASS"
    assert rows["b-2"].batch_id == 0 and rows["b-2"].evaluated_at is not None

    # a second file picked up incrementally carries the next batch id
    with open(src / "b2.json", "w") as fh:
        fh.write(json.dumps({"id": "b-3", "name": "tmp", "acl": "public"}) + "\n")
    q2 = compliance_stream.start_continuous_compliance(
        stream, "live/open-buckets", out, str(tmp_path / "ckpt"),
        loader=PackLoader([str(tmp_path / "packs")]),
        available_now=True)
    q2.awaitTermination(180)
    rows = {r.resource_id: r for r in spark.read.parquet(out).collect()}
    assert rows["b-3"].status == "FAIL" and rows["b-3"].batch_id == 1


def test_stream_static_inventory_enrichment(spark, tmp_path):
    """Change events enriched with warehouse attributes per micro-batch;
    unmatched resources keep NULL inventory columns."""
    import json

    from corkscrew_spark.streaming import change_stream
    from pyspark.sql.types import StringType, StructField, StructType

    inventory = spark.createDataFrame(
        [("r-1", "s3", {"env": "prod"}), ("r-2", "ec2", {"env": "dev"})],
        "id string, service string, tags map<string,string>")

    src = tmp_path / "changes"
    src.mkdir()
    with open(src / "c1.json", "w") as fh:
        fh.write(json.dumps({"resource_id": "r-1", "change_type": "UPDATE"}) + "\n")
        fh.write(json.dumps({"resource_id": "r-9", "change_type": "DELETE"}) + "\n")
    schema = StructType([StructField("resource_id", StringType()),
                         StructField("change_type", StringType())])
    stream = spark.readStream.schema(schema).json(str(src))
    enriched = change_stream.enrich_with_inventory(
        stream, inventory, columns=["service", "tags"])
    q = (enriched.writeStream.format("memory").queryName("enr_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.resource_id: r for r in spark.sql("select * from enr_t").collect()}
    assert rows["r-1"].inv_service == "s3" and rows["r-1"].inv_tags["env"] == "prod"
    assert rows["r-9"].inv_service is None  # unmatched stays, NULL-enriched


def test_streaming_cdc_sink_propagates_deletes(spark, tmp_path):
    import json
    from corkscrew_spark.streaming import change_stream
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    src = tmp_path / "cdc_feed"
    src.mkdir()
    with open(src / "b1.json", "w") as fh:
        fh.write(json.dumps({"id": "r1", "scanned_at": 1, "state": "up",
                             "op": "CREATE"}) + "\n")
        fh.write(json.dumps({"id": "r2", "scanned_at": 1, "state": "up",
                             "op": "CREATE"}) + "\n")
    schema = StructType([
        StructField("id", StringType()), StructField("scanned_at", LongType()),
        StructField("state", StringType()), StructField("op", StringType()),
    ])
    table = str(tmp_path / "live")
    q = change_stream.start_upsert_sink(
        spark.readStream.schema(schema).json(str(src)), table,
        str(tmp_path / "ck"), keys=["id"], op_col="op")
    q.awaitTermination(120)
    assert spark.read.parquet(table).count() == 2

    with open(src / "b2.json", "w") as fh:
        fh.write(json.dumps({"id": "r1", "scanned_at": 2, "state": None,
                             "op": "DELETE"}) + "\n")
        fh.write(json.dumps({"id": "r2", "scanned_at": 2, "state": "down",
                             "op": "UPDATE"}) + "\n")
    q = change_stream.start_upsert_sink(
        spark.readStream.schema(schema).json(str(src)), table,
        str(tmp_path / "ck"), keys=["id"], op_col="op")
    q.awaitTermination(120)
    rows = {r.id: r.state for r in spark.read.parquet(table).collect()}
    assert rows == {"r2": "down"}  # r1 deleted, r2 updated


def test_kql_compiles_onto_streaming_frames(spark, tmp_path):
    """r11: the KQL compiler is SOURCE-AGNOSTIC — map-only stages
    (where/extend/project and summarize-by in update mode) compose
    onto a streaming DataFrame exactly as onto a batch one, so a
    Kusto-style monitoring pipeline runs unchanged over a live feed.
    Batch-parity asserted on identical input."""
    from corkscrew_spark.kql import kql_to_df

    src = tmp_path / "changes"
    _write_events(src, [_event(i, sev="CRITICAL" if i % 3 == 0
                               else "LOW") for i in range(9)])
    stream = change_stream.read_change_stream(spark, str(src))
    pipeline = """
        S
        | where severity == 'CRITICAL' and change_type == 'UPDATE'
        | extend svc = toupper(service)
        | summarize n = count() by svc, resource_id
    """
    agg = kql_to_df(pipeline, {"S": stream})
    assert agg.isStreaming
    q = change_stream.start_to_memory(agg, "kql_feed",
                                      output_mode="complete")
    q.awaitTermination(60)
    got = {(r["svc"], r["resource_id"]): r["n"]
           for r in spark.sql("SELECT * FROM kql_feed").collect()}
    want = {(r["svc"], r["resource_id"]): r["n"]
            for r in kql_to_df(
                pipeline,
                {"S": spark.read.schema(stream.schema)
                 .json(str(src))}).collect()}
    assert got == want and sum(got.values()) == 3
