"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The 100 TB design: media bytes live in a BinaryType column (or an object
-store path for >~100 MB objects) beside a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch, not per row, and the pipeline partitions on (kind, shard) so one
task never holds more than a batch of decoded media in memory.

The actual codec calls (PIL/ffmpeg/torchaudio) are STUBBED in this
environment — ``decoder_available()`` gates them and the default
"decoder" is a deterministic fake driven by the content hash, so every
piece of Spark plumbing (schemas, UDF signatures, batch shapes,
partitioning) is real and testable without the native libs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media table schema.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("decoder", StringType(), False),
    ]
)


def decoder_available() -> bool:
    """True when a real image decoder is importable (PIL). This container
    ships none, so pipelines fall back to the deterministic fake."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_features(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real embedding: md5-seeded values in
    [0,1). Stable across runs/executors — tests rely on that."""
    out: list[float] = []
    h = content or b""
    counter = 0
    while len(out) < dim:
        digest = hashlib.md5(h + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in digest)
        counter += 1
    return out[:dim]


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (bytes derived from the id).

    Generated distributed — spark.range + JVM expressions, no driver row
    loop — so the same generator serves a 64-row test and a billion-row
    load test. ``unhex(repeat(sha2(id), 8))`` is byte-identical to
    ``hashlib.sha256(str(i)).digest() * 8``.
    """
    i = F.col("id")
    return spark.range(n).select(
        i.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (i % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.repeat(F.sha2(i.cast("string"), 256), 8)).alias("content"),
        F.struct(
            F.lit("fake").alias("format"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, dim: int = 16, batch_hint: int = 256,
                     shards: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Real pipeline shape: repartition by a shard of the id so decoded
    batches distribute evenly (binary blobs skew partition bytes), then
    one mapInPandas pass. With PIL present this is where decode+model
    would run; here the deterministic fake keeps the dataflow honest.

    ``shards`` sizes the repartition; default is the session parallelism,
    which is right for corpus-scale media tables. Pass a small value for
    small inputs — every shard costs a Python worker.
    """
    use_real = decoder_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                # Real decode path (PIL etc.) would go here; not shipped
                # in this environment.
                raise NotImplementedError("real decoder path not available in this build")
            feats = [_fake_features(c, dim) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decoder": "fake-md5",
                }
            )

    n = shards or max(media.sparkSession.sparkContext.defaultParallelism, 4)
    return (
        media.repartition(n, F.col("media_id"))
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage (stub): with no decoder, passes content through
    and rewrites metadata — the schema/partitioning contract the real
    implementation must keep."""
    if decoder_available():
        raise NotImplementedError("real resize path not available in this build")
    return media.filter(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling (stub): emits one synthetic frame row per
    ``every_ms`` of metadata duration via posexplode — the real ffmpeg
    path would substitute actual frame bytes per emitted row."""
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest((F.col("meta.duration_ms") / every_ms).cast("long") - 1, F.lit(0).cast("long")),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(frames).alias("frame_idx", "_t"),
            (F.col("_t") * every_ms).alias("frame_ts_ms"),
            F.col("content").alias("frame_content"),  # stub: source bytes
        )
        .drop("_t")
    )
