"""Structured-streaming change feed.

The reference streams change events over Go channels with a poll loop
(StreamChanges/MonitorChanges, aws_change_tracker.go:212-258,335-371) and
pushes K8s informer events the same way (informer_cache.go:78-134). The
Spark-native shape is a file-source stream over the change-event landing
directory: ingest jobs append JSON/parquet files, the stream discovers
them incrementally (exactly-once per file via checkpointed source
offsets), filters/enriches, and lands in sinks or in-memory tables.

No watermarks/event-time windows are required for reference parity
(SURVEY.md §2.9) — ``windowed_change_counts`` adds them anyway as the
Spark-idiomatic late-data-safe rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from corkscrew_spark.schema import CHANGE_EVENT_SCHEMA


def read_change_stream(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """Streaming DataFrame over a change-event landing directory."""
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if fmt == "json":
        return reader.json(path)
    if fmt == "parquet":
        return reader.parquet(path)
    raise ValueError(f"unsupported stream format: {fmt}")


def monitor_changes(
    stream: DataFrame,
    change_types: list[str] | None = None,
    severities: list[str] | None = None,
    services: list[str] | None = None,
) -> DataFrame:
    """Criteria-filtered live feed — MonitorChanges parity (the reference's
    matchesFilter loop becomes pushed-down stream predicates)."""
    df = stream
    if change_types:
        df = df.filter(F.col("change_type").isin(change_types))
    if severities:
        df = df.filter(F.col("severity").isin(severities))
    if services:
        df = df.filter(F.col("service").isin(services))
    return df


def windowed_change_counts(stream: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed rollup with late-data watermarking: counts per
    (window, change_type, severity). State is bounded by the watermark —
    the streaming analog of the drift summary rollup."""
    return (
        stream.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window), "change_type", "severity")
        .agg(F.count("*").alias("events"))
        .select(
            F.col("window.start").alias("window_start"),
            "change_type",
            "severity",
            "events",
        )
    )


def session_change_bursts(stream: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Session-window rollup: change events for the same resource that
    arrive within ``gap`` of each other merge into one burst — the
    "a deploy touched this resource 14 times in 20 minutes" signal that
    fixed windows split arbitrarily. Session windows require the
    watermark (state closes once event time passes session end + delay);
    state per key is one open session, not a backlog."""
    return (
        stream.withWatermark("timestamp", watermark)
        .groupBy(F.session_window("timestamp", gap), "resource_id")
        .agg(
            F.count("*").alias("events"),
            F.collect_set("change_type").alias("change_types"),
        )
        .select(
            F.col("session_window.start").alias("burst_start"),
            F.col("session_window.end").alias("burst_end"),
            "resource_id",
            "events",
            F.array_sort("change_types").alias("change_types"),
        )
    )


def start_to_memory(df: DataFrame, table_name: str, once: bool = True,
                    output_mode: str = "append"):
    """Run the stream into an in-memory sink (tests/dev); availableNow
    processes the current backlog then stops cleanly. Use
    output_mode='complete' for aggregated streams."""
    writer: DataStreamWriter = (
        df.writeStream.format("memory").queryName(table_name).outputMode(output_mode)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_to_parquet(df: DataFrame, path: str, checkpoint: str,
                     processing_interval: str = "30 seconds",
                     once: bool = False):
    """Production sink: append parquet with checkpointed exactly-once file
    tracking (the durable equivalent of the reference's auto-save,
    aws_provider.go:647-650). ``once`` drains the backlog and stops —
    the batch-drain mode used by tests and catch-up jobs."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


def correlate_streams(changes: DataFrame, alerts: DataFrame,
                      within: str = "10 minutes",
                      watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream join: each change event paired with the alert-feed
    events for the same resource that occur within ``within`` AFTER it —
    the "which alert did this change trigger" correlation the reference
    answers only after landing both feeds in the warehouse
    (internal/changes/change_storage.go QueryChanges + manual join).

    Structured Streaming requirements encoded here: BOTH sides carry an
    event-time watermark and the join condition bounds the alert's event
    time relative to the change's, so the state store can evict rows
    once the watermark passes — state stays O(events inside the
    correlation window), not O(stream length).
    """
    c = (
        changes.withWatermark("timestamp", watermark)
        .select(
            F.col("id").alias("change_id"),
            F.col("resource_id").alias("c_resource_id"),
            F.col("change_type"),
            F.col("timestamp").alias("c_ts"),
        )
    )
    a = (
        alerts.withWatermark("timestamp", watermark)
        .select(
            F.col("id").alias("alert_id"),
            F.col("resource_id").alias("a_resource_id"),
            F.col("severity").alias("alert_severity"),
            F.col("timestamp").alias("a_ts"),
        )
    )
    return c.join(
        a,
        F.expr(
            "c_resource_id = a_resource_id AND "
            f"a_ts >= c_ts AND a_ts <= c_ts + interval {within}"
        ),
    ).select(
        "change_id", "alert_id", F.col("c_resource_id").alias("resource_id"),
        "change_type", "alert_severity", "c_ts", "a_ts",
    )


def start_upsert_sink(df: DataFrame, path: str, checkpoint: str,
                      keys: list[str], order_col: str = "scanned_at",
                      once: bool = True, op_col: str | None = None,
                      delete_value: str = "DELETE",
                      partition_cols: list[str] | None = None):
    """CDC-style sink: merge each micro-batch into the keyed warehouse
    table via foreachBatch + warehouse.merge_upsert — the streaming
    complement of the batch upsert path (reference auto-save upserts the
    latest resource state per key; this keeps a live table current from
    a change stream). Newest ``order_col`` per key wins, so replays and
    at-least-once delivery stay idempotent. On Delta the same call site
    becomes MERGE; the parquet path keeps it dependency-free.

    ``op_col`` opts into DELETE propagation: rows whose op equals
    ``delete_value`` are tombstones that remove their key when they are
    the newest version (warehouse.merge_upsert_cdc) — the full
    CREATE/UPDATE/DELETE change-event vocabulary lands correctly.

    ``partition_cols`` makes every micro-batch merge PARTITION-SCOPED
    (warehouse.merge_upsert semantics): a batch touching two services
    rewrites two directories of a 100 TB table, never the table — the
    setting that keeps a continuously-merging sink viable at scale.
    """
    from corkscrew_spark import warehouse

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # count_rows=False: the sink discards the return value, and the
        # post-merge count is a full-table metadata read per micro-batch
        if op_col is not None:
            warehouse.merge_upsert_cdc(batch_df.sparkSession, path, batch_df,
                                       keys, order_col=order_col,
                                       op_col=op_col,
                                       delete_value=delete_value,
                                       partition_cols=partition_cols,
                                       count_rows=False)
        else:
            warehouse.merge_upsert(batch_df.sparkSession, path, batch_df,
                                   keys, order_col=order_col,
                                   partition_cols=partition_cols,
                                   count_rows=False)

    writer = (
        df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_with_inventory(stream: DataFrame, inventory: DataFrame,
                          key: str = "resource_id",
                          inventory_key: str = "id",
                          columns: list[str] | None = None) -> DataFrame:
    """Stream-static enrichment: attach warehouse inventory attributes
    (owner tags, account, type detail) to each live change event.

    The static side re-resolves PER MICRO-BATCH (Spark re-plans the
    static relation each trigger), so a warehouse refresh lands on the
    stream without a restart. The join broadcasts when the inventory
    fits, otherwise shuffles only the micro-batch — either way the
    streaming side never accumulates join state (no watermark needed;
    that is the stream-static contract vs stream-stream joins).
    """
    cols = columns or [c for c in inventory.columns if c != inventory_key]
    right = inventory.select(
        F.col(inventory_key).alias("__ik"),
        *[F.col(c).alias(f"inv_{c}") for c in cols],
    )
    return stream.join(right, stream[key] == right["__ik"], "left").drop("__ik")
