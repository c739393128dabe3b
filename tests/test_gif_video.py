"""Real GIF video codec: spec-golden decode, LZW roundtrip fuzz, pixel-exact
container roundtrips, error paths, and the frame-sampling stage end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from html_parser_ray.functions.gifcodec import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    is_gif,
    synth_gif,
)

# the canonical single-pixel GIF from the spec documentation — an EXTERNAL
# golden this repo's encoder did not produce
SPEC_1X1_WHITE = bytes(
    [
        0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80,
        0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x00, 0x2C, 0x00, 0x00,
        0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, 0x02, 0x02, 0x44, 0x01,
        0x00, 0x3B,
    ]
)


def test_spec_single_pixel_gif_decodes():
    d = decode_gif(SPEC_1X1_WHITE)
    assert (d["width"], d["height"]) == (1, 1)
    assert len(d["frames"]) == 1
    assert (d["frames"][0]["rgb"][0, 0] == [255, 255, 255]).all()


def test_lzw_roundtrip_fuzz():
    rng = np.random.RandomState(7)
    for _ in range(120):
        mcs = rng.randint(2, 9)
        n = rng.randint(1, 6000)  # crosses the 4096-code table reset
        data = rng.randint(0, 1 << mcs, size=n).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data


def test_container_roundtrip_pixel_exact():
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    frames = [
        np.random.RandomState(s).randint(0, 16, (10, 13)).astype(np.uint8)
        for s in range(3)
    ]
    d = decode_gif(encode_gif(frames, pal, [50, 60, 70]))
    assert [f["ts_ms"] for f in d["frames"]] == [50, 110, 180]
    for k in range(3):
        assert (d["frames"][k]["rgb"] == pal[frames[k]]).all()


def test_synth_gif_deterministic():
    assert synth_gif(3) == synth_gif(3)
    assert synth_gif(3) != synth_gif(4)
    assert is_gif(synth_gif(0)) and not is_gif(b"PNG...")
    d = decode_gif(synth_gif(5, n_frames=7))
    assert len(d["frames"]) == 7


def test_error_paths():
    with pytest.raises(GifError):
        decode_gif(b"not a gif")
    with pytest.raises(GifError):
        decode_gif(b"GIF89a" + bytes(20))  # unknown block
    with pytest.raises(GifError):
        encode_gif([], np.zeros((4, 3), dtype=np.uint8))
    with pytest.raises(GifError):
        encode_gif(
            [np.zeros((2, 2), dtype=np.uint8)], np.zeros((3, 3), dtype=np.uint8)
        )  # non-power-of-two palette


def test_frame_sample_stage_matches_serial_twin(ray_session):
    import hashlib

    import ray.data

    from html_parser_ray.stages.multimodal import (
        FrameSampleStage,
        build_frame_sample_pipeline,
        synth_media_table,
    )

    t = synth_media_table(24, seed=42)
    dist = (
        ray.data.from_arrow(t)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"num_frames": 2},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["media_id", "frame_ts_ms"])
        .reset_index(drop=True)
    )
    serial = FrameSampleStage(num_frames=2)(t).to_pandas()
    serial = serial.sort_values(["media_id", "frame_ts_ms"]).reset_index(drop=True)
    assert list(dist["media_id"]) == list(serial["media_id"])
    assert [hashlib.md5(f).hexdigest() for f in dist["frame"]] == [
        hashlib.md5(f).hexdigest() for f in serial["frame"]
    ]
    assert dist["decoded"].all()
