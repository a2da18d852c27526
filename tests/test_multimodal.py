"""Multimodal plumbing tests (decode stubbed; dataflow real)."""

from __future__ import annotations

import pytest

from corkscrew_spark.operators import multimodal


def test_extract_features_schema_and_determinism(spark):
    media = multimodal.synth_media(spark, 30)
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert feats.schema == multimodal.FEATURE_SCHEMA
    by_id = {r["media_id"]: r["feature"] for r in rows}
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media, dim=8).collect()}
    assert by_id == again  # deterministic across runs
    assert all(len(v) == 8 for v in by_id.values())


def test_resize_rewrites_metadata(spark):
    media = multimodal.synth_media(spark, 9)
    out = multimodal.resize_images(media, 32, 24).collect()
    assert out and all(r["meta"]["width"] == 32 and r["meta"]["height"] == 24 for r in out)
    assert all(r["kind"] == "image" for r in out)


def test_sample_frames_counts(spark):
    media = multimodal.synth_media(spark, 9)  # duration 1000ms each
    out = multimodal.sample_frames(media, every_ms=500).collect()
    videos = [r for r in media.collect() if r["kind"] == "video"]
    assert len(out) == 2 * len(videos)  # 1000ms / 500ms = 2 frames each
    assert {r["frame_idx"] for r in out} == {0, 1}


def test_injected_decoder_contract(spark):
    """set_decoder routes all three stages through the bound decoder —
    the seam a real PIL/ffmpeg binding plugs into (decode itself is the
    only thing faked; schemas, Arrow batching, partitioning are the
    production path). The class is function-local so cloudpickle ships
    it BY VALUE — exactly how a user-site decoder that isn't installed
    on the executors would travel."""

    class ContractDecoder(multimodal.MediaDecoder):
        name = "contract-fake"

        def features(self, content, kind, meta, dim):
            return [float(len(content or b"") % 7)] * dim

        def resize(self, content, meta, width, height):
            return (b"resized:" + (content or b"")[:4],
                    {**meta, "width": width, "height": height})

        def frames(self, content, meta, every_ms):
            n = max(1, int(meta["duration_ms"] // every_ms))
            return [b"frame:%d" % i for i in range(n)]

    multimodal.set_decoder(ContractDecoder())
    try:
        assert multimodal.decoder_available()
        assert multimodal.require_decoder().name == "contract-fake"
        media = multimodal.synth_media(spark, 12)
        feats = multimodal.extract_features(media, dim=4, shards=2).collect()
        assert len(feats) == 12
        assert all(r["decoder"] == "contract-fake" for r in feats)
        assert all(len(r["feature"]) == 4 for r in feats)
        # content is 256 bytes for every synth row → 256 % 7 == 4.0
        assert all(v == 4.0 for r in feats for v in r["feature"])
        imgs = multimodal.resize_images(media, 32, 24).collect()
        assert imgs and all(bytes(r["content"]).startswith(b"resized:")
                            for r in imgs)
        assert all(r["meta"]["width"] == 32 and r["meta"]["height"] == 24
                   for r in imgs)
        frames = multimodal.sample_frames(media, every_ms=500).collect()
        assert frames and all(
            bytes(r["frame_content"]) == b"frame:%d" % r["frame_idx"]
            for r in frames)
    finally:
        multimodal.set_decoder(None)


def test_ppm_decoder_real_pixels_through_spark(spark):
    """REAL decode, no codec wheel: P6 PPM bytes generated distributed
    (synth_ppm_media) are parsed to pixels by PPMImageDecoder inside
    the Arrow mapInPandas stage; features must equal a driver-side
    reference decode of the same bytes, and resize must emit a valid
    P6 whose raster is exact nearest-neighbor sampling."""
    dec = multimodal.PPMImageDecoder()
    multimodal.set_decoder(dec)
    try:
        media = multimodal.synth_ppm_media(spark, 15, width=8, height=8)
        rows = {r["media_id"]: r for r in media.collect()}
        feats = {r["media_id"]: r for r in
                 multimodal.extract_features(media, dim=9, shards=2)
                 .collect()}
        assert len(feats) == 15
        for mid, r in feats.items():
            src = rows[mid]
            expect = dec.features(bytes(src["content"]), src["kind"],
                                  src["meta"].asDict(), 9)
            assert r["decoder"] == "ppm"
            assert r["feature"] == [pytest.approx(v, abs=1e-6)
                                    for v in expect]
        # image rows decode for real (not the hash fallback): their
        # features are block means of actual raster bytes
        img = next(r for r in rows.values() if r["kind"] == "image")
        px, maxval = multimodal.PPMImageDecoder._decode(
            bytes(img["content"]))
        assert px.shape == (8, 8, 3) and maxval == 255
        resized = {r["media_id"]: r for r in
                   multimodal.resize_images(media, 4, 2).collect()}
        for mid, r in resized.items():
            out = bytes(r["content"])
            assert out.startswith(b"P6\n4 2\n255\n")
            rp, _ = multimodal.PPMImageDecoder._decode(out)
            sp, _ = multimodal.PPMImageDecoder._decode(
                bytes(rows[mid]["content"]))
            import numpy as np
            yi = (np.arange(2) * 8 // 2).clip(0, 7)
            xi = (np.arange(4) * 8 // 4).clip(0, 7)
            assert (rp == sp[yi][:, xi]).all()
            assert r["meta"]["width"] == 4 and r["meta"]["height"] == 2
    finally:
        multimodal._PIL_PROBED = False
        multimodal._DECODER = None


def test_ppm_decoder_handles_comments_and_garbage():
    """Header comments parse; truncated/alien bytes return None (the
    mixed-corpus fallback), never raise."""
    import numpy as np

    raster = bytes(range(2 * 2 * 3))
    ppm = b"P6\n# a comment\n2 2\n255\n" + raster
    px, maxval = multimodal.PPMImageDecoder._decode(ppm)
    assert maxval == 255
    assert (px == np.frombuffer(raster, np.uint8).reshape(2, 2, 3)).all()
    assert multimodal.PPMImageDecoder._decode(b"JFIF....") is None
    assert multimodal.PPMImageDecoder._decode(b"P6\n2 2\n255\nshort") is None
    assert multimodal.PPMImageDecoder._decode(b"P6\n2 2\n65535\n" +
                                              raster * 2) is None


def test_wav_decoder_matches_stdlib_wave_reference(tmp_path):
    """The pure-numpy RIFF/WAVE parser is checked against the stdlib
    `wave` WRITER (the canonical encoder): a known 16-bit mono signal
    round-trips to the exact float samples, stereo mixes down to the
    channel mean, 8-bit unsigned centers on 128, and garbage/
    truncated/float-PCM bytes return None — never raise."""
    import io
    import struct
    import wave

    import numpy as np

    dec = multimodal.WavAudioDecoder()

    def _wav(frames: bytes, ch: int = 1, width: int = 2,
             sr: int = 8000) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(width)
            w.setframerate(sr)
            w.writeframes(frames)
        return buf.getvalue()

    samples = [0, 16384, -16384, 32767, -32768, 1]
    x, sr = dec._decode(_wav(struct.pack("<6h", *samples)))
    assert sr == 8000
    assert x == pytest.approx([s / 32768.0 for s in samples])
    # stereo mixdown = interleaved channel mean
    stereo = struct.pack("<4h", 1000, 3000, -2000, -4000)
    x2, _ = dec._decode(_wav(stereo, ch=2))
    assert x2 == pytest.approx([2000 / 32768.0, -3000 / 32768.0])
    # 8-bit WAV is unsigned with midpoint 128
    x3, _ = dec._decode(_wav(bytes([128, 255, 0]), width=1))
    assert x3 == pytest.approx([0.0, 127 / 128.0, -1.0])
    # non-PCM / malformed inputs: None, not an exception
    assert dec._decode(b"JFIF....") is None
    assert dec._decode(b"RIFF\x00\x00\x00\x00WAVE") is None
    ieee = bytearray(_wav(struct.pack("<2h", 1, 2)))
    ieee[20:22] = struct.pack("<H", 3)  # IEEE-float format tag
    assert dec._decode(bytes(ieee)) is None
    # features: windowed RMS halves then zero-crossing halves
    wav = _wav(struct.pack("<4h", 16384, -16384, 16384, -16384))
    f = dec.features(wav, "audio", {}, 4)
    assert f[0] == pytest.approx(0.5) and f[1] == pytest.approx(0.5)
    assert f[2] == pytest.approx(1.0) and f[3] == pytest.approx(1.0)
    # non-audio kind: deterministic fake, same as unbound mode
    assert dec.features(wav, "image", {}, 4) == \
        multimodal._fake_features(wav, 4)


def test_wav_decoder_real_samples_through_spark(spark):
    """REAL audio decode, no codec wheel: WAV bytes generated
    distributed (synth_wav_media) are parsed to PCM samples by
    WavAudioDecoder inside the Arrow mapInPandas stage — the same
    seam the image decoders use, proving it format-generic; features
    must equal a driver-side reference decode of the same bytes."""
    dec = multimodal.WavAudioDecoder()
    multimodal.set_decoder(dec)
    try:
        media = multimodal.synth_wav_media(spark, 15, ms=50)
        rows = {r["media_id"]: r for r in media.collect()}
        feats = {r["media_id"]: r for r in
                 multimodal.extract_features(media, dim=8, shards=2)
                 .collect()}
        assert len(feats) == 15
        for mid, r in feats.items():
            src = rows[mid]
            expect = dec.features(bytes(src["content"]), src["kind"],
                                  src["meta"].asDict(), 8)
            assert r["decoder"] == "wav"
            assert r["feature"] == [pytest.approx(v, abs=1e-6)
                                    for v in expect]
        # audio rows decode for real: 50ms at 8kHz = 400 samples
        aud = next(r for r in rows.values() if r["kind"] == "audio")
        x, sr = multimodal.WavAudioDecoder._decode(
            bytes(aud["content"]))
        assert sr == 8000 and x.size == 400
        # and their features differ from the hash fake (real decode)
        f = feats[aud["media_id"]]["feature"]
        assert f != pytest.approx(multimodal._fake_features(
            bytes(aud["content"]), 8))
    finally:
        multimodal._PIL_PROBED = False
        multimodal._DECODER = None


def test_no_decoder_fake_mode_and_loud_gate(spark):
    """Without a bound decoder (and no PIL wheel — this sandbox) the
    stages run the deterministic fake and require_decoder raises with
    binding instructions; with PIL present the auto-bind path takes
    over and this test self-skips."""
    import pytest

    multimodal.set_decoder(None)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: auto-bind covers the real path")
    except ImportError:
        pass
    try:
        assert not multimodal.decoder_available()
        with pytest.raises(NotImplementedError, match="set_decoder"):
            multimodal.require_decoder()
        feats = multimodal.extract_features(
            multimodal.synth_media(spark, 6), dim=4, shards=2).collect()
        assert all(r["decoder"] == "fake-md5" for r in feats)
    finally:
        # restore auto-probe for other tests
        multimodal._PIL_PROBED = False
        multimodal._DECODER = None


def test_sample_frames_string_media_id_real_decoder(spark):
    """r10 review: the real-decoder frames path must derive media_id's
    output type from the SOURCE schema — it hardcoded `long`, so a
    string-keyed corpus worked in stub mode but Arrow-schema-mismatched
    the moment a decoder exposing ``frames`` was bound."""
    from pyspark.sql import functions as F

    class FrameDecoder(multimodal.MediaDecoder):
        name = "frames-fake"

        def frames(self, content, meta, every_ms):
            n = max(1, int(meta["duration_ms"] // every_ms))
            return [b"f:%d" % i for i in range(n)]

    media = multimodal.synth_media(spark, 9).withColumn(
        "media_id", F.concat(F.lit("doc-"), F.col("media_id")))
    multimodal.set_decoder(FrameDecoder())
    try:
        out = multimodal.sample_frames(media, every_ms=500)
        assert out.schema["media_id"].dataType.simpleString() == "string"
        rows = out.collect()
        videos = media.filter(F.col("kind") == "video").count()
        assert len(rows) == 2 * videos
        assert all(r["media_id"].startswith("doc-") for r in rows)
        # stub mode (no decoder) preserves the same type for the same
        # source — the two paths must agree
        multimodal.set_decoder(None)
        multimodal._PIL_PROBED = True  # keep the stub path, no auto-bind
        stub = multimodal.sample_frames(media, every_ms=500)
        assert stub.schema["media_id"].dataType.simpleString() == "string"
    finally:
        multimodal._PIL_PROBED = False
        multimodal.set_decoder(None)
