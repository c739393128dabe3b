"""Multimodal stage tests: REAL PNG/WAV decode through the Ray actor-pool
batch transforms (video frame-grab is REAL since round 3: animated-GIF
decode via functions/gifcodec.py; non-GIF payloads keep the declared hash
fallback, flagged decoded=False)."""

from __future__ import annotations

import numpy as np
import pytest

from html_parser_ray.functions import codecs
from html_parser_ray.stages.multimodal import (
    AudioFeatureStage,
    FrameSampleStage,
    ImageFeatureStage,
    build_audio_feature_pipeline,
    build_frame_sample_pipeline,
    build_media_feature_pipeline,
    synth_media_table,
)


def test_synth_media_deterministic_and_real_payloads():
    a = synth_media_table(20)
    b = synth_media_table(20)
    assert a.equals(b)
    types = a.column("media_type").to_pylist()
    payloads = a.column("payload").to_pylist()
    # image rows are genuine PNGs, audio rows genuine WAVs
    for t, p in zip(types, payloads):
        if t == "image":
            assert codecs.is_png(p)
            img = codecs.decode_png(p)
            assert img.ndim == 3 and img.shape[2] == 3
        elif t == "audio":
            assert codecs.is_wav(p)
            sig, rate = codecs.decode_wav(p)
            assert rate == 8000 and len(sig) > 0


def test_image_feature_stage_real_decode():
    t = synth_media_table(12)
    out = ImageFeatureStage()(t)
    assert out.num_rows == 12
    decoded = out.column("decoded").to_pylist()
    types = t.column("media_type").to_pylist()
    # every image row REALLY decodes now (payloads are valid PNGs)
    for d, ty in zip(decoded, types):
        assert d == (ty == "image")
    feats = out.column("feature").to_pylist()
    assert all(len(f) == 32 for f in feats)
    out2 = ImageFeatureStage()(t)
    assert out.equals(out2)


def test_image_features_reflect_pixels():
    """Same dims, different pixels -> different features (a hash fake would
    also differ, but here the *structure* tracks brightness)."""
    dark = codecs.encode_png(np.zeros((16, 16, 3), dtype=np.uint8))
    light = codecs.encode_png(np.full((16, 16, 3), 255, dtype=np.uint8))
    import pyarrow as pa

    t = pa.table(
        {
            "media_id": ["a", "b"],
            "media_type": ["image", "image"],
            "payload": [dark, light],
        }
    )
    out = ImageFeatureStage()(t)
    fa, fb = out.column("feature").to_pylist()
    assert fa[:16] == [0.0] * 16  # dark grid cells
    assert all(x > 0.95 for x in fb[:16])  # light grid cells


def test_image_fallback_for_corrupt_png():
    """Truncated headers and corrupt IDAT streams (zlib.error, not
    ValueError) must fall back flagged, not kill the batch."""
    import numpy as np
    import pyarrow as pa

    good = codecs.encode_png(np.full((8, 8, 3), 128, dtype=np.uint8))
    t = pa.table(
        {
            "media_id": ["ok", "truncated", "corrupt-idat"],
            "media_type": ["image"] * 3,
            "payload": [good, good[:40], good[:30] + b"\x00" * 20 + good[50:]],
        }
    )
    out = ImageFeatureStage()(t)
    assert out.column("decoded").to_pylist() == [True, False, False]


def test_image_fallback_for_non_png():
    import pyarrow as pa

    t = pa.table(
        {
            "media_id": ["x"],
            "media_type": ["image"],
            "payload": [b"\xff\xd8\xff not-actually-jpeg"],
        }
    )
    out = ImageFeatureStage()(t)
    assert out.column("decoded").to_pylist() == [False]
    assert len(out.column("feature").to_pylist()[0]) == 32


def test_audio_feature_stage_real_decode():
    t = synth_media_table(12)
    out = AudioFeatureStage()(t)
    decoded = out.column("decoded").to_pylist()
    types = t.column("media_type").to_pylist()
    for d, ty in zip(decoded, types):
        assert d == (ty == "audio")
    for ty, rate, n in zip(
        types,
        out.column("sample_rate").to_pylist(),
        out.column("n_samples").to_pylist(),
    ):
        if ty == "audio":
            assert rate == 8000 and n > 0
    # sine payloads carry real energy
    feats = out.column("feature").to_pylist()
    for ty, f in zip(types, feats):
        if ty == "audio":
            assert max(f[:8]) > 0.05


def test_frame_sample_stage_local():
    t = synth_media_table(12)
    out = FrameSampleStage(num_frames=3)(t)
    n_videos = t.column("media_type").to_pylist().count("video")
    assert out.num_rows == 3 * n_videos
    assert all(ts > 0 for ts in out.column("frame_ts_ms").to_pylist())
    # round 3: video payloads are REAL animated GIFs, sampled frames come
    # back as real PNG re-encodings (decoded=True, GIF in -> PNG out)
    assert all(out.column("decoded").to_pylist())
    from html_parser_ray.functions import codecs

    for f in out.column("frame").to_pylist():
        img = codecs.decode_png(f)
        assert img.shape == (24, 32, 3)


def test_frame_sample_stage_nongif_falls_back():
    import pyarrow as pa

    t = pa.table(
        {
            "media_id": ["v0"],
            "media_type": ["video"],
            "payload": [b"\x00\x01not-a-gif"],
            "meta_width": pa.array([320], type=pa.int32()),
            "meta_height": pa.array([240], type=pa.int32()),
            "meta_duration_ms": pa.array([1000], type=pa.int32()),
        }
    )
    out = FrameSampleStage(num_frames=2)(t)
    assert out.num_rows == 2
    assert not any(out.column("decoded").to_pylist())
    assert all(len(f) == 16 for f in out.column("frame").to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_media_pipelines_on_ray():
    import ray.data

    t = synth_media_table(30)
    ds = ray.data.from_arrow(t)
    feats = build_media_feature_pipeline(ds, concurrency=2).take_all()
    assert len(feats) == 30
    n_images = t.column("media_type").to_pylist().count("image")
    assert sum(1 for r in feats if r["decoded"]) == n_images

    ds2 = ray.data.from_arrow(t)
    audio = build_audio_feature_pipeline(ds2, concurrency=2).take_all()
    n_audio = t.column("media_type").to_pylist().count("audio")
    assert sum(1 for r in audio if r["decoded"]) == n_audio

    ds3 = ray.data.from_arrow(t)
    frames = build_frame_sample_pipeline(ds3, concurrency=2, num_frames=2).take_all()
    n_videos = t.column("media_type").to_pylist().count("video")
    assert len(frames) == 2 * n_videos


def test_frame_stage_total_on_missing_duration_and_typed_when_empty():
    """A video with missing/zero duration metadata must still emit its
    frames (duration recovered from the decoded clip, else stub at ts=0),
    and a batch with no video rows must emit a TYPED empty table (a
    null-typed media_id column diverges block schemas)."""
    import pyarrow as pa

    stage = FrameSampleStage(num_frames=2)
    media = synth_media_table(30, seed=42)
    vids = media.filter(
        pa.compute.equal(media.column("media_type"), "video")
    ).slice(0, 1)
    # null out the duration metadata
    cols = {c: vids.column(c) for c in vids.column_names}
    cols["meta_duration_ms"] = pa.array([None], type=vids.schema.field("meta_duration_ms").type)
    no_dur = pa.table(cols)
    out = stage(no_dur)
    assert out.num_rows == 2  # still total: frames recovered from the clip
    assert out.column("media_id").to_pylist() == [vids.column("media_id")[0].as_py()] * 2

    images_only = media.filter(
        pa.compute.equal(media.column("media_type"), "image")
    )
    empty_out = stage(images_only)
    assert empty_out.num_rows == 0
    assert empty_out.schema.field("media_id").type == pa.string()  # not null-typed
