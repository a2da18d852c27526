"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The 100 TB design: media bytes live in a BinaryType column (or an object
-store path for >~100 MB objects) beside a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch, not per row, and the pipeline partitions on (kind, shard) so one
task never holds more than a batch of decoded media in memory.

The actual codec calls (PIL/ffmpeg/torchaudio) are PLUGGABLE: bind a
real decoder with ``set_decoder(obj)`` (any picklable object exposing
``features``/``resize``/``frames`` — see ``MediaDecoder``); when PIL is
importable a ``PILImageDecoder`` binds itself automatically. Without
either, pipelines fall back to a deterministic fake driven by the
content hash, so every piece of Spark plumbing (schemas, UDF
signatures, batch shapes, partitioning) is real and testable without
the native libs — ``require_decoder()`` is the loud gate for callers
that must not silently run on fakes.
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


class MediaDecoder:
    """Duck-typed decoder contract (subclassing optional). A decoder is
    any PICKLABLE object (it ships to executors inside the mapInPandas
    closure via cloudpickle) exposing:

    - ``name`` (str): recorded in the output ``decoder`` column;
    - ``features(content: bytes, kind: str, meta: dict, dim: int)
      -> list[float]``: the decode→embed step;
    - ``resize(content: bytes, meta: dict, width: int, height: int)
      -> tuple[bytes, dict]`` (optional): re-encoded bytes + new meta;
    - ``frames(content: bytes, meta: dict, every_ms: int)
      -> list[bytes]`` (optional): sampled frame payloads.

    Bind with ``set_decoder``; methods a decoder omits fall back to the
    deterministic stub behavior for that stage.
    """

    name = "abstract"


class PILImageDecoder(MediaDecoder):
    """Reference real-decoder binding: decodes with Pillow when the
    wheel exists (it does NOT in this sandbox — the class is exercised
    there via the injected-fake contract test, and auto-binds wherever
    ``import PIL`` works). Features are the mean-pooled grayscale grid:
    cheap, deterministic, and enough to prove the decode path."""

    name = "pil"

    def features(self, content: bytes, kind: str, meta: dict,
                 dim: int) -> list[float]:
        import io
        import math

        from PIL import Image

        if kind != "image":
            return _fake_features(content, dim)
        img = Image.open(io.BytesIO(content)).convert("L")
        side = max(1, int(math.isqrt(dim)))
        img = img.resize((side, side))
        px = [p / 255.0 for p in img.getdata()]
        return (px + [0.0] * dim)[:dim]

    def resize(self, content: bytes, meta: dict, width: int,
               height: int) -> tuple[bytes, dict]:
        import io

        from PIL import Image

        src = Image.open(io.BytesIO(content))
        # .format survives only on parser-produced images — capture it
        # BEFORE .resize(), which returns a derived image with format None
        fmt = src.format or "PNG"
        buf = io.BytesIO()
        src.resize((width, height)).save(buf, format=fmt)
        return buf.getvalue(), {**meta, "format": fmt.lower(),
                                "width": width, "height": height}


class PPMImageDecoder(MediaDecoder):
    """REAL image decoding with no native deps: binary P6 PPM (the
    netpbm format — `P6\\n<w> <h>\\n<maxval>\\n` header + raw RGB
    triples) parsed with numpy alone. This is the in-sandbox proof of
    the decode path: actual pixels come out of actual bytes through
    the same seam a PIL/ffmpeg binding uses, so the Spark plumbing is
    exercised against a genuine decoder, not a hash fake.

    Features: grayscale mean-pool to a √dim×√dim grid, row-major,
    zero-padded to dim. Resize: nearest-neighbor index sampling,
    re-emitted as P6. Non-image kinds and undecodable bytes fall back
    to the hash fake (features) / passthrough (resize) so a mixed
    corpus never kills the job."""

    name = "ppm"

    @staticmethod
    def _decode(content: bytes):
        import numpy as np

        if not content or not content.startswith(b"P6"):
            return None
        try:
            # header: magic, width, height, maxval — whitespace/comment
            # separated, then ONE whitespace byte before the raster
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(content) and content[pos:pos + 1].isspace():
                    pos += 1
                if content[pos:pos + 1] == b"#":  # comment to EOL
                    pos = content.index(b"\n", pos) + 1
                    continue
                start = pos
                while (pos < len(content)
                       and not content[pos:pos + 1].isspace()):
                    pos += 1
                fields.append(int(content[start:pos]))
            pos += 1  # the single whitespace after maxval
            w, h, maxval = fields
            if maxval > 255 or len(content) - pos < w * h * 3:
                return None  # 2-byte samples / truncated raster
            raster = np.frombuffer(content, dtype=np.uint8,
                                   count=w * h * 3, offset=pos)
            return raster.reshape(h, w, 3), maxval
        except (ValueError, IndexError):  # malformed header bytes
            return None

    def features(self, content: bytes, kind: str, meta: dict,
                 dim: int) -> list[float]:
        import math

        import numpy as np

        decoded = self._decode(content) if kind == "image" else None
        if decoded is None:
            return _fake_features(content, dim)
        px, maxval = decoded
        gray = px.mean(axis=2) / float(maxval)
        side = max(1, int(math.isqrt(dim)))
        h, w = gray.shape
        # mean-pool onto a side×side grid (block boundaries by even split)
        ys = np.linspace(0, h, side + 1).astype(int)
        xs = np.linspace(0, w, side + 1).astype(int)
        pooled = [gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                       xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                  for i in range(side) for j in range(side)]
        return ([float(v) for v in pooled] + [0.0] * dim)[:dim]

    def resize(self, content: bytes, meta: dict, width: int,
               height: int) -> tuple[bytes, dict]:
        import numpy as np

        decoded = self._decode(content)
        if decoded is None:  # not P6: passthrough, metadata-only resize
            return content, {**meta, "width": width, "height": height}
        px, maxval = decoded
        h, w = px.shape[:2]
        yi = (np.arange(height) * h // height).clip(0, h - 1)
        xi = (np.arange(width) * w // width).clip(0, w - 1)
        out = px[yi][:, xi]
        header = f"P6\n{width} {height}\n{maxval}\n".encode()
        return (header + out.tobytes(),
                {**meta, "format": "ppm", "width": width, "height": height})


class WavAudioDecoder(MediaDecoder):
    """REAL audio decoding with no native deps: RIFF/WAVE PCM (the
    canonical uncompressed audio container — ``RIFF`` header, ``fmt ``
    chunk, ``data`` chunk) parsed with numpy alone. The SECOND real
    decoder behind the ``set_decoder`` seam (round-10 stretch #8): the
    PPM decoder proved pixels come out of bytes; this proves the seam
    is FORMAT-GENERIC — a completely different modality (8/16/32-bit
    PCM, mono or multichannel with mixdown) flows through the same
    Spark plumbing (schema, Arrow batches, partitioning) untouched.

    Features: the first dim/2 slots are windowed RMS energy, the
    second dim/2 are windowed zero-crossing rate — the two classic
    cheap audio descriptors, deterministic and verifiable against a
    stdlib-``wave`` reference decode in tests. Non-audio kinds and
    undecodable bytes fall back to the hash fake so a mixed corpus
    never kills the job (same contract as PPMImageDecoder)."""

    name = "wav"

    @staticmethod
    def _decode(content: bytes):
        """(mono float32 samples in [-1, 1], sample_rate) or None."""
        import numpy as np

        if (not content or len(content) < 44
                or content[:4] != b"RIFF" or content[8:12] != b"WAVE"):
            return None
        try:
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(content):
                cid = content[pos:pos + 4]
                sz = int.from_bytes(content[pos + 4:pos + 8], "little")
                body = content[pos + 8:pos + 8 + sz]
                if cid == b"fmt " and len(body) >= 16:
                    fmt = (int.from_bytes(body[0:2], "little"),
                           int.from_bytes(body[2:4], "little"),
                           int.from_bytes(body[4:8], "little"),
                           int.from_bytes(body[14:16], "little"))
                elif cid == b"data":
                    data = body
                pos += 8 + sz + (sz & 1)  # chunks are word-aligned
            if fmt is None or data is None:
                return None
            audio_fmt, n_ch, sr, bits = fmt
            if audio_fmt != 1 or n_ch < 1 or sr <= 0:
                return None  # PCM only (no float/ADPCM/extensible)
            if bits == 16:
                x = np.frombuffer(
                    data, dtype="<i2", count=len(data) // 2
                ).astype(np.float32) / 32768.0
            elif bits == 8:  # 8-bit WAV is UNSIGNED, midpoint 128
                x = (np.frombuffer(data, dtype=np.uint8)
                     .astype(np.float32) - 128.0) / 128.0
            elif bits == 32:
                x = np.frombuffer(
                    data, dtype="<i4", count=len(data) // 4
                ).astype(np.float32) / 2147483648.0
            else:
                return None
            if x.size == 0:
                return None
            if n_ch > 1:  # mixdown: mean over interleaved channels
                usable = (x.size // n_ch) * n_ch
                if usable == 0:
                    return None
                x = x[:usable].reshape(-1, n_ch).mean(axis=1)
            return x, sr
        except (ValueError, IndexError):
            return None

    def features(self, content: bytes, kind: str, meta: dict,
                 dim: int) -> list[float]:
        import numpy as np

        decoded = self._decode(content) if kind == "audio" else None
        if decoded is None:
            return _fake_features(content, dim)
        x, _sr = decoded
        half = max(1, dim // 2)
        edges = np.linspace(0, x.size, half + 1).astype(int)
        rms: list[float] = []
        zcr: list[float] = []
        for i in range(half):
            seg = x[edges[i]:max(edges[i + 1], edges[i] + 1)]
            rms.append(float(np.sqrt(np.mean(seg * seg))))
            zcr.append(float(np.mean(
                np.signbit(seg[1:]) != np.signbit(seg[:-1])))
                if seg.size > 1 else 0.0)
        return ((rms + zcr) + [0.0] * dim)[:dim]


_DECODER: MediaDecoder | None = None
_PIL_PROBED = False


def set_decoder(decoder: MediaDecoder | None) -> None:
    """Bind (or with ``None`` unbind) the process-wide media decoder.
    The object must be picklable — it is captured into mapInPandas
    closures and cloudpickled to every executor."""
    global _DECODER, _PIL_PROBED
    _DECODER = decoder
    _PIL_PROBED = True  # an explicit bind (or unbind) overrides auto-probe


def get_decoder() -> MediaDecoder | None:
    """The bound decoder: explicit ``set_decoder`` wins; otherwise a
    ``PILImageDecoder`` auto-binds once if PIL is importable; else None
    (deterministic-fake mode)."""
    global _DECODER, _PIL_PROBED
    if not _PIL_PROBED:
        _PIL_PROBED = True
        try:
            import PIL  # noqa: F401

            _DECODER = PILImageDecoder()
        except ImportError:
            _DECODER = None
    return _DECODER


def decoder_available() -> bool:
    """True when a real decoder is bound (injected or PIL auto-bound)."""
    return get_decoder() is not None


def require_decoder() -> MediaDecoder:
    """The loud gate for pipelines that must not run on the fake: raise
    with binding instructions when no real decoder exists."""
    dec = get_decoder()
    if dec is None:
        raise NotImplementedError(
            "no real media decoder available in this environment: install "
            "Pillow or bind one with "
            "corkscrew_spark.operators.multimodal.set_decoder(obj)")
    return dec


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


def synth_ppm_media(spark, n: int = 64, width: int = 8,
                    height: int = 8) -> DataFrame:
    """Fake media table whose image rows are REAL decodable P6 PPMs
    (header + sha2-derived raster bytes), generated distributed the
    same way as synth_media — so the PPMImageDecoder path can be
    tested end-to-end on genuine pixels with no codec wheel."""
    npix = width * height * 3
    reps = (npix + 31) // 32  # sha2-256 digest = 32 bytes
    header = f"P6\n{width} {height}\n255\n".encode()
    i = F.col("id")
    raster = F.substring(
        F.unhex(F.repeat(F.sha2(i.cast("string"), 256), reps)), 1, npix)
    return spark.range(n).select(
        i.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (i % 3 + 1).cast("int"),
        ).alias("kind"),
        F.when(i % 3 == 0, F.concat(F.lit(header), raster))
         .otherwise(F.unhex(F.repeat(F.sha2(i.cast("string"), 256), 8)))
         .alias("content"),
        F.struct(
            F.when(i % 3 == 0, F.lit("ppm")).otherwise(F.lit("fake"))
             .alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def synth_wav_media(spark, n: int = 64, ms: int = 100,
                    sr: int = 8000) -> DataFrame:
    """Fake media table whose AUDIO rows are REAL decodable RIFF/WAVE
    PCM files (constant 44-byte header for a fixed (sr, length) +
    sha2-derived 16-bit sample bytes — deterministic noise is still
    valid PCM), generated distributed with pure JVM expressions like
    synth_ppm_media — so the WavAudioDecoder path runs end-to-end on
    genuine audio bytes with no codec wheel."""
    import struct

    data_sz = (sr * ms // 1000) * 2  # 16-bit mono
    reps = (data_sz + 31) // 32  # sha2-256 digest = 32 bytes
    header = (b"RIFF" + struct.pack("<I", 36 + data_sz) + b"WAVE"
              + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr,
                                      sr * 2, 2, 16)
              + b"data" + struct.pack("<I", data_sz))
    i = F.col("id")
    payload = F.substring(
        F.unhex(F.repeat(F.sha2(i.cast("string"), 256), reps)),
        1, data_sz)
    return spark.range(n).select(
        i.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (i % 3 + 1).cast("int"),
        ).alias("kind"),
        F.when(i % 3 == 1, F.concat(F.lit(header), payload))
         .otherwise(F.unhex(F.repeat(F.sha2(i.cast("string"), 256), 8)))
         .alias("content"),
        F.struct(
            F.when(i % 3 == 1, F.lit("wav")).otherwise(F.lit("fake"))
             .alias("format"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(ms).cast("long").alias("duration_ms"),
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
    dec = get_decoder()  # resolved on the driver, cloudpickled to workers
    if dec is not None and not hasattr(dec, "features"):
        dec = None  # contract: a stage the decoder omits runs the stub
    dec_name = getattr(dec, "name", type(dec).__name__) if dec else "fake-md5"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if dec is not None:
                feats = [dec.features(c, k, m, dim) for c, k, m in
                         zip(pdf["content"], pdf["kind"], pdf["meta"])]
            else:
                feats = [_fake_features(c, dim) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decoder": dec_name,
                }
            )

    n = shards or max(media.sparkSession.sparkContext.defaultParallelism, 4)
    return (
        media.repartition(n, F.col("media_id"))
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage. With a bound decoder exposing ``resize`` the
    re-encode runs Arrow-batched through mapInPandas (same output
    schema); otherwise the stub passes content through and rewrites
    metadata — the schema/partitioning contract the real implementation
    keeps."""
    dec = get_decoder()
    images = media.filter(F.col("kind") == "image")
    if dec is not None and hasattr(dec, "resize"):

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = [dec.resize(c, m, width, height)
                       for c, m in zip(pdf["content"], pdf["meta"])]
                pdf = pdf.copy()
                pdf["content"] = [b for b, _ in out]
                pdf["meta"] = [m for _, m in out]
                yield pdf

        return images.mapInPandas(run, schema=images.schema)
    return images.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: with a bound decoder exposing ``frames``
    the payloads come from the real demuxer (Arrow-batched, one row per
    sampled frame); the stub emits one synthetic frame row per
    ``every_ms`` of metadata duration via posexplode with the source
    bytes as payload — identical output schema either way."""
    dec = get_decoder()
    videos = media.filter(F.col("kind") == "video")
    if dec is not None and hasattr(dec, "frames"):
        # media_id's type follows the SOURCE schema (string-keyed
        # corpora exist): hardcoding `long` here worked in stub mode —
        # which preserves the type via select/posexplode — but made the
        # real-decoder path Arrow-schema-mismatch the moment a decoder
        # exposing `frames` was bound (review finding)
        id_type = media.schema["media_id"].dataType.simpleString()
        schema = (f"media_id {id_type}, frame_idx int, frame_ts_ms long, "
                  "frame_content binary")

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mid, c, m in zip(pdf["media_id"], pdf["content"],
                                     pdf["meta"]):
                    for i, fb in enumerate(dec.frames(c, m, every_ms)):
                        rows.append((mid, i, i * every_ms, fb))
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "frame_ts_ms",
                                   "frame_content"])

        return videos.mapInPandas(run, schema=schema)
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest((F.col("meta.duration_ms") / every_ms).cast("long") - 1, F.lit(0).cast("long")),
    )
    return (
        videos
        .select(
            "media_id",
            F.posexplode(frames).alias("frame_idx", "_t"),
            (F.col("_t") * every_ms).alias("frame_ts_ms"),
            F.col("content").alias("frame_content"),  # stub: source bytes
        )
        .drop("_t")
    )
