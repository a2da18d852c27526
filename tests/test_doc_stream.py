"""Streaming corpus ingestion: watermarked exact dedup + quality gating
on a live document feed (streaming/doc_stream.py)."""

from __future__ import annotations

import json

from corkscrew_spark.streaming import change_stream, doc_stream


def _write_docs(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"batch-{len(list(path.iterdir()))}.json"
    with open(f, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_stream_dedup_drops_in_flight_duplicates(spark, tmp_path):
    src = tmp_path / "docs"
    _write_docs(src, [
        {"doc_id": 1, "text": "alpha beta gamma", "source": "a",
         "ingested_at": "2024-01-01T00:00:00Z"},
        {"doc_id": 2, "text": "Alpha  beta GAMMA!", "source": "b",  # same fingerprint
         "ingested_at": "2024-01-01T00:05:00Z"},
        {"doc_id": 3, "text": "entirely different text", "source": "a",
         "ingested_at": "2024-01-01T00:10:00Z"},
    ])
    stream = doc_stream.read_doc_stream(spark, str(src))
    deduped = doc_stream.dedup_doc_stream(stream, watermark="1 hour")
    q = change_stream.start_to_memory(deduped, "doc_dedup")
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, fingerprint FROM doc_dedup ORDER BY doc_id").collect()
    # doc 2 normalizes to doc 1's fingerprint and is dropped in-flight
    assert [r["doc_id"] for r in rows] == [1, 3]
    assert len({r["fingerprint"] for r in rows}) == 2


def test_stream_dedup_matches_batch_decisions(spark, tmp_path):
    """The streaming keep-set must agree with batch exact_duplicates on
    the same landed data."""
    from corkscrew_spark.operators import dedup

    src = tmp_path / "docs2"
    rows = [
        {"doc_id": i, "text": f"text number {i % 4}", "source": "s",
         "ingested_at": f"2024-01-01T00:{i:02d}:00Z"}
        for i in range(12)
    ]
    _write_docs(src, rows)
    stream = doc_stream.read_doc_stream(spark, str(src))
    q = change_stream.start_to_memory(
        doc_stream.dedup_doc_stream(stream, watermark="1 hour"), "doc_dedup2"
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM doc_dedup2").collect()}
    batch = spark.createDataFrame([(r["doc_id"], r["text"]) for r in rows],
                                  "doc_id long, text string")
    groups = dedup.exact_duplicates(batch, "doc_id", "text").collect()
    batch_keep = {g["keep_id"] for g in groups}
    # every duplicated fingerprint keeps exactly its first (min-id) arrival
    assert batch_keep <= kept
    assert len(kept) == 4  # one per distinct text


def test_quality_gate_filters_short_and_lowscore(spark, tmp_path):
    src = tmp_path / "docs3"
    good = " ".join(["the quick brown fox jumps over it and"] * 4)  # 32 tokens
    _write_docs(src, [
        {"doc_id": 1, "text": good, "source": "s",
         "ingested_at": "2024-01-01T00:00:00Z"},
        {"doc_id": 2, "text": "too short", "source": "s",
         "ingested_at": "2024-01-01T00:01:00Z"},
    ])
    stream = doc_stream.read_doc_stream(spark, str(src))
    gated = doc_stream.quality_gate(stream, min_tokens=5, min_quality=0.3)
    q = change_stream.start_to_memory(gated, "doc_gate")
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, n_tokens FROM doc_gate").collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_tokens"] == 32


def test_streaming_value_bars_match_batch(spark, tmp_path):
    """The streaming bars equal temporal.ohlc_bars on the same events."""
    import json

    from corkscrew_spark.operators import temporal
    from corkscrew_spark.streaming import doc_stream
    from pyspark.sql import functions as F
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType, TimestampType)

    src = tmp_path / "events_in"
    src.mkdir()
    rows = [
        (0, "2024-01-01T10:00:05", "a", 10.0),
        (1, "2024-01-01T10:00:05", "a", 50.0),
        (2, "2024-01-01T10:30:00", "a", 99.0),
        (3, "2024-01-01T11:10:00", "a", 7.0),
        (4, "2024-01-01T10:15:00", "b", 3.0),
    ]
    with open(src / "batch.json", "w") as fh:
        for eid, ts, k, v in rows:
            fh.write(json.dumps(
                {"event_id": eid, "ts": ts, "k": k, "value": v}) + "\n")

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("k", StringType()),
        StructField("value", DoubleType()),
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    bars = doc_stream.streaming_value_bars(
        stream, "ts", "value", "event_id", by=("k",))
    out = tmp_path / "bars_out"
    q = (
        bars.writeStream.format("memory").queryName("bars_t")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.k, r.bar_ts): (r.open, r.high, r.low, r.close, r.n_events)
           for r in spark.sql("select * from bars_t").collect()}

    batch_df = spark.createDataFrame(
        [(e, ts.replace("T", " "), k, v) for e, ts, k, v in rows],
        "event_id long, ts string, k string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {(r.k, r.bar_ts): (r.open, r.high, r.low, r.close, r.n_events)
            for r in temporal.ohlc_bars(
                batch_df, "ts", "value", "event_id", by=("k",)).collect()}
    assert got == want and len(got) == 3
