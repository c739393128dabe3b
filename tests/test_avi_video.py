"""RIFF/AVI codec (functions/avicodec.py): byte-level roundtrip exactness,
container strictness, timestamp model, and the FrameSampleStage routing —
the round-4 graduation of the non-GIF video path (VERDICT r3 item 6)."""

from __future__ import annotations

import numpy as np
import pytest

from html_parser_ray.functions import avicodec as av


def test_roundtrip_pixel_exact_with_padding():
    rng = np.random.RandomState(3)
    # w=33 -> 99-byte rows padded to 100: exercises DIB 4-byte row alignment
    frames = [rng.randint(0, 256, (10, 33, 3), dtype=np.uint8) for _ in range(5)]
    enc = av.encode_avi(frames, fps_rate=10)
    dec = av.decode_avi(enc)
    assert dec["width"] == 33 and dec["height"] == 10
    assert [f["ts_ms"] for f in dec["frames"]] == [0, 100, 200, 300, 400]
    for a, f in zip(frames, dec["frames"]):
        assert np.array_equal(a, f["rgb"])


def test_container_structure_is_real_riff():
    enc = av.encode_avi([np.zeros((4, 4, 3), dtype=np.uint8)], fps_rate=5)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"AVI "
    # declared RIFF size covers the whole payload exactly
    import struct

    assert 8 + struct.unpack_from("<I", enc, 4)[0] == len(enc)
    for fourcc in (b"hdrl", b"avih", b"strh", b"strf", b"movi", b"00db", b"idx1"):
        assert fourcc in enc, fourcc


def test_timebase_from_rate_scale():
    frames = [np.zeros((4, 4, 3), dtype=np.uint8)] * 4
    dec = av.decode_avi(av.encode_avi(frames, fps_rate=30, fps_scale=1))
    assert [f["ts_ms"] for f in dec["frames"]] == [0, 33, 66, 100]
    dec = av.decode_avi(av.encode_avi(frames, fps_rate=24000, fps_scale=1001))
    assert [f["ts_ms"] for f in dec["frames"]] == [0, 41, 83, 125]


def test_strict_errors():
    enc = av.encode_avi([np.zeros((6, 6, 3), dtype=np.uint8)] * 2, fps_rate=8)
    with pytest.raises(av.AviError):
        av.decode_avi(enc[:-20])  # truncated
    with pytest.raises(av.AviError):
        av.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")  # wrong form type
    # corrupt biBitCount -> unsupported encoding, not silent garbage
    i = enc.find(b"strf")
    bad = bytearray(enc)
    bad[i + 8 + 14] = 32
    with pytest.raises(av.AviError, match="unsupported"):
        av.decode_avi(bytes(bad))
    with pytest.raises(av.AviError):
        av.encode_avi([])


def test_synth_deterministic():
    a = av.synth_avi(99, n_frames=4)
    b = av.synth_avi(99, n_frames=4)
    assert a == b
    assert av.synth_avi(100, n_frames=4) != a
    assert av.is_avi(a)


def test_frame_stage_decodes_avi_and_gif():
    import pyarrow as pa
    import pyarrow.compute as pc

    from html_parser_ray.functions import codecs
    from html_parser_ray.stages.multimodal import FrameSampleStage, synth_media_table

    tbl = synth_media_table(60, seed=42)
    # both containers present among video rows
    vids = [
        p
        for p, t in zip(
            tbl.column("payload").to_pylist(), tbl.column("media_type").to_pylist()
        )
        if t == "video"
    ]
    assert any(av.is_avi(p) for p in vids)
    assert any(p[:6] in (b"GIF89a", b"GIF87a") for p in vids)

    out = FrameSampleStage(num_frames=3)(tbl)
    assert pc.min(out.column("decoded")).as_py() is True  # zero hash fallbacks
    # every emitted frame is a decodable PNG of the source clip's dims
    for mid, frame in zip(
        out.column("media_id").to_pylist()[:6], out.column("frame").to_pylist()[:6]
    ):
        img = codecs.decode_png(frame)
        assert img.shape == (24, 32, 3), mid


def test_frame_stage_sampled_frame_matches_codec_directly():
    """The stage must pick the LAST frame whose timestamp <= sample offset —
    verified against a direct decode (no stage code in the oracle path)."""
    import pyarrow as pa

    from html_parser_ray.functions import codecs
    from html_parser_ray.stages.multimodal import FrameSampleStage

    clip = av.synth_avi(5, w=16, h=8, n_frames=5, fps=4)  # ts 0,250,500,750,1000
    dur = av.decode_avi(clip)["frames"][-1]["ts_ms"]
    tbl = pa.table(
        {
            "media_id": ["v0"],
            "media_type": ["video"],
            "payload": pa.array([clip], type=pa.binary()),
            "meta_width": pa.array([16], type=pa.int32()),
            "meta_height": pa.array([8], type=pa.int32()),
            "meta_duration_ms": pa.array([dur], type=pa.int32()),
        }
    )
    out = FrameSampleStage(num_frames=4)(tbl)
    dec = av.decode_avi(clip)
    for ts, frame in zip(
        out.column("frame_ts_ms").to_pylist(), out.column("frame").to_pylist()
    ):
        expect = dec["frames"][0]
        for f in dec["frames"]:
            if f["ts_ms"] <= ts:
                expect = f
            else:
                break
        assert np.array_equal(codecs.decode_png(frame), expect["rgb"]), ts


# ---- property-based roundtrip ----------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    n=st.integers(1, 5),
    rate=st.integers(1, 120),
    scale=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(w, h, n, rate, scale, seed):
    """encode -> decode is pixel-exact and timestamp-exact for ANY dims
    (incl. odd widths exercising DIB row padding), frame counts and
    rate/scale timebases."""
    import numpy as np

    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    dec = av.decode_avi(av.encode_avi(frames, fps_rate=rate, fps_scale=scale))
    assert dec["width"] == w and dec["height"] == h
    assert len(dec["frames"]) == n
    for k, (a, f) in enumerate(zip(frames, dec["frames"])):
        assert np.array_equal(a, f["rgb"])
        assert f["ts_ms"] == (k * 1000 * scale) // rate
