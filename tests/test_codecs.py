"""Real-codec tests: PNG and WAV round-trips plus decoder edge cases."""

from __future__ import annotations

import numpy as np
import pytest

from html_parser_ray.functions import codecs


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(img))
    assert out.shape == (17, 23, 3)
    assert (out == img).all()


def test_png_roundtrip_grey_and_rgba():
    rng = np.random.RandomState(1)
    grey = rng.randint(0, 256, (8, 5), dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(grey))
    assert out.shape == (8, 5, 1)
    assert (out[:, :, 0] == grey).all()
    rgba = rng.randint(0, 256, (6, 9, 4), dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(rgba))
    assert (out == rgba).all()


def test_png_all_filter_types():
    """Decode a PNG whose scanlines use Sub/Up/Average/Paeth filters.

    Built by hand: encode with filter 0, then re-filter the raw stream with
    each filter type and verify the decoder inverts it.
    """
    import struct
    import zlib

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (6, 7, 3), dtype=np.uint8)
    h, w, c = img.shape
    stride = w * c

    def paeth(a, b, cc):
        p = a + b - cc
        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    filters = [0, 1, 2, 3, 4, 2]
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        ftype = filters[y]
        raw.append(ftype)
        for x in range(stride):
            left = int(line[x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if ftype == 0:
                v = line[x]
            elif ftype == 1:
                v = line[x] - left
            elif ftype == 2:
                v = line[x] - up
            elif ftype == 3:
                v = line[x] - ((left + up) >> 1)
            else:
                v = line[x] - paeth(left, up, ul)
            raw.append(int(v) & 0xFF)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    out = codecs.decode_png(payload)
    assert (out == img).all()


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png at all")
    # 16-bit depth
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        codecs.decode_png(bad)


def test_resize_nearest():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = codecs.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 1)
    assert up[0, 0, 0] == img[0, 0, 0] and up[7, 7, 0] == img[3, 3, 0]
    down = codecs.resize_nearest(img, 2, 2)
    assert down.shape == (2, 2, 1)


def test_wav_roundtrip():
    rate = 8000
    t = np.arange(rate // 10) / rate
    sig = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
    out, orate = codecs.decode_wav(codecs.encode_wav(sig, rate))
    assert orate == rate
    assert (out == sig).all()


def test_audio_features_shape_and_energy():
    rate = 8000
    loud = (np.sin(np.arange(800) * 0.5) * 30000).astype(np.int16)
    quiet = (np.sin(np.arange(800) * 0.5) * 300).astype(np.int16)
    f_loud = codecs.audio_energy_features(loud, rate, frames=8)
    f_quiet = codecs.audio_energy_features(quiet, rate, frames=8)
    assert f_loud.shape == (16,)
    assert f_loud[:8].mean() > f_quiet[:8].mean() * 10


def test_image_grid_features_real_signal():
    """Features must reflect real pixel content: an image with a bright left
    half scores higher in left grid cells than right."""
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:, :16] = 250
    f = codecs.image_grid_features(img, grid=4).reshape(-1)
    cells = f[:16].reshape(4, 4)
    assert cells[:, :2].mean() > 0.9
    assert cells[:, 2:].mean() < 0.1
