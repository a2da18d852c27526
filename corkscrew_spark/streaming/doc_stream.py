"""Streaming corpus ingestion: dedup + quality gating on a document feed.

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; a continuously-ingested corpus needs the same decisions ON ARRIVAL
so duplicates never land in the warehouse at all. Structured Streaming
shapes:

  * exact streaming dedup — ``dropDuplicatesWithinWatermark`` on the
    content fingerprint: state holds one entry per fingerprint and the
    watermark EVICTS entries once no earlier event can still arrive, so
    state is bounded by the dedup horizon (e.g. "a duplicate within 24h
    is dropped"), not by stream length. This is the semantics an
    unbounded corpus feed actually wants — an all-time exact guarantee
    would mean unbounded state on any engine.
  * quality gating — the same pure-Column text features as the batch
    path, applied as stream predicates (stateless, pushed to the source
    scan).

The fingerprint is md5 over normalized text (operators/text.py), so the
streaming keep-set is consistent with the batch ``exact_duplicates``
decisions on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from corkscrew_spark.operators import text

#: landing schema for a streamed document feed
DOC_STREAM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("source", StringType()),
    StructField("ingested_at", TimestampType()),
])


def read_doc_stream(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """Streaming DataFrame over a document landing directory (exactly-once
    per file via checkpointed source offsets, like the change feed)."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if fmt == "json":
        return reader.json(path)
    if fmt == "parquet":
        return reader.parquet(path)
    raise ValueError(f"unsupported stream format: {fmt}")


def dedup_doc_stream(stream: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Keep the first arrival of each content fingerprint within the
    watermark horizon; later duplicates are dropped in-flight.

    State shape: one row per distinct fingerprint still inside the
    horizon — bounded, watermark-evicted. The fingerprint column stays in
    the output so downstream batch jobs can join streaming decisions
    against batch dedup runs."""
    return (
        stream.withColumn("fingerprint", text.fingerprint("text"))
        .withWatermark("ingested_at", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def quality_gate(stream: DataFrame, min_tokens: int = 5,
                 min_quality: float = 0.5) -> DataFrame:
    """Stateless quality filter on the live feed: token floor + composite
    quality threshold, same expressions as the batch text_quality query."""
    return (
        stream.withColumn("n_tokens", text.token_count("text"))
        .withColumn("quality_score", text.quality_score("text"))
        .filter((F.col("n_tokens") >= min_tokens)
                & (F.col("quality_score") >= min_quality))
    )


def start_near_dup_flagging(stream: DataFrame, index: DataFrame,
                            out_path: str, checkpoint: str,
                            id_col: str = "doc_id", text_col: str = "text",
                            n: int = 3, num_hashes: int = 32, bands: int = 8,
                            threshold: float = 0.8, once: bool = True):
    """On-arrival near-dup flagging against an indexed corpus at rest.

    Each micro-batch runs the exact BATCH operators
    (dedup.flag_against_index: band join + Jaccard verify) via
    foreachBatch — the sanctioned Structured Streaming shape for logic
    whose aggregations (MinHash groupBys) pure streaming can't express
    statelessly. Reusing the batch code verbatim guarantees streaming
    decisions match what a batch re-run over the same files would say.
    Per-batch cost scales with batch size × band collision rate, never
    with corpus size; exactly-once lands on the checkpointed sink.

    Returns the StreamingQuery; flagged (doc_id, corpus_doc, jaccard)
    rows append to ``out_path`` as parquet.
    """
    from corkscrew_spark.operators import dedup

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        flagged = dedup.flag_against_index(
            batch_df, index, id_col, text_col,
            n=n, num_hashes=num_hashes, bands=bands, threshold=threshold)
        flagged.write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_value_bars(stream: DataFrame, ts_col: str, value_col: str,
                         tiebreak_col: str, by: tuple[str, ...] = (),
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming OHLC bars: the event-time windowed form of
    ``operators/temporal.ohlc_bars`` — open/high/low/close + count per
    (group, tumbling window), with late data folded in until the
    watermark closes the bar. State per open bar is ONE row of five
    commutative partial aggregates (min_by/max_by carry the (ts, id)
    total order), so memory is bounded by |groups| x |open windows|,
    never by stream length — the stream and batch paths compute the
    same bars from the same events.
    """
    ordk = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*by, F.window(ts_col, window))
        .agg(
            F.min_by(value_col, ordk).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, ordk).alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            *by, F.col("window.start").alias("bar_ts"),
            "open", "high", "low", "close", "n_events",
        )
    )
