"""Multimodal stage plumbing tests (stubbed decode, real Ray actor-pool
batch transforms over binary columns)."""

from __future__ import annotations

import pytest

from html_parser_ray.stages.multimodal import (
    FrameSampleStage,
    ImageFeatureStage,
    build_frame_sample_pipeline,
    build_media_feature_pipeline,
    synth_media_table,
)


def test_synth_media_deterministic():
    a = synth_media_table(20)
    b = synth_media_table(20)
    assert a.equals(b)
    assert a.column("media_type").to_pylist().count("image") > 0
    assert all(len(p) >= 256 for p in a.column("payload").to_pylist())


def test_image_feature_stage_local():
    t = synth_media_table(12)
    out = ImageFeatureStage()(t)
    assert out.num_rows == 12
    decoded = out.column("decoded").to_pylist()
    types = t.column("media_type").to_pylist()
    for d, ty in zip(decoded, types):
        assert d == (ty == "image")
    feats = out.column("feature").to_pylist()
    assert all(len(f) == 32 for f in feats)
    # deterministic
    out2 = ImageFeatureStage()(t)
    assert out.equals(out2)


def test_frame_sample_stage_local():
    t = synth_media_table(12)
    out = FrameSampleStage(num_frames=3)(t)
    n_videos = t.column("media_type").to_pylist().count("video")
    assert out.num_rows == 3 * n_videos
    assert all(ts > 0 for ts in out.column("frame_ts_ms").to_pylist())
    assert all(len(f) == 16 for f in out.column("frame").to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_media_pipelines_on_ray():
    import ray.data

    t = synth_media_table(30)
    ds = ray.data.from_arrow(t)
    feats = build_media_feature_pipeline(ds, concurrency=2).take_all()
    assert len(feats) == 30

    ds2 = ray.data.from_arrow(t)
    frames = build_frame_sample_pipeline(ds2, concurrency=2, num_frames=2).take_all()
    n_videos = t.column("media_type").to_pylist().count("video")
    assert len(frames) == 2 * n_videos
