"""Multimodal plumbing tests (decode stubbed; dataflow real)."""

from __future__ import annotations

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
