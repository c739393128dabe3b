"""Multimodal (image/audio/video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``...). Round-2 status:

- **image**: REAL PNG decode (stdlib zlib + numpy unfilter,
  functions/codecs.py) -> nearest-neighbor resize -> grid luminance/profile
  features. Non-PNG payloads fall back to a deterministic hash fake and are
  flagged ``decoded=False``.
- **audio**: REAL PCM16 WAV decode (stdlib ``wave``) -> per-frame RMS +
  zero-crossing features.
- **video**: frame-sampling plumbing is real (offsets, flat_map shape); the
  frame GRAB is a declared stub — no video codec library ships in this
  container.

Ray-side design: actor-pool ``map_batches`` stages with load-once state,
small batch sizes for large binary payloads (batch x concurrency x payload
must fit worker heap), Arrow binary columns end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from html_parser_ray.functions import avicodec
from html_parser_ray.functions import codecs
from html_parser_ray.functions import gifcodec

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table with REAL payloads: images are valid PNGs
    (gradient + seeded noise), audio rows are valid PCM16 WAVs (seeded sine
    mix), and video rows are valid ANIMATED GIF89a clips (seeded palette,
    moving gradient, real per-frame delays — functions/gifcodec.py)."""
    import random

    kinds = ["image", "audio", "video"]
    ids, types, payloads, ws, hs, durs = [], [], [], [], [], []
    for i in range(n):
        rng = random.Random((seed << 16) ^ i)
        nprng = np.random.RandomState((seed * 1_000_003 + i) % (2**31))
        kind = kinds[i % 3]
        ids.append(f"media-{i:06d}")
        types.append(kind)
        if kind == "image":
            w, h = rng.choice([(32, 24), (48, 32), (64, 48)])
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((xx * 255 // max(1, w - 1)) + nprng.randint(0, 32, (h, w))) % 256
            rgb = np.stack([img, 255 - img, (yy * 255 // max(1, h - 1))], axis=2)
            payloads.append(codecs.encode_png(rgb.astype(np.uint8)))
            ws.append(w)
            hs.append(h)
            durs.append(0)
        elif kind == "audio":
            rate = 8000
            dur_ms = rng.randint(50, 200)
            t = np.arange(int(rate * dur_ms / 1000)) / rate
            freq = rng.choice([220.0, 440.0, 880.0])
            sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * nprng.randn(len(t))
            payloads.append(
                codecs.encode_wav((sig * 32767 * 0.5).astype(np.int16), rate)
            )
            ws.append(0)
            hs.append(0)
            durs.append(dur_ms)
        else:
            n_frames = rng.randint(4, 9)
            # alternate the two REAL containers so both codec paths stay
            # exercised by every media query (GIF89a+LZW and RIFF/AVI DIB)
            if (i // 3) % 2 == 0:
                gif = gifcodec.synth_gif(
                    (seed << 8) ^ i, w=32, h=24, n_frames=n_frames
                )
                meta = gifcodec.decode_gif(gif)
                payloads.append(gif)
                ws.append(meta["width"])
                hs.append(meta["height"])
                durs.append(meta["frames"][-1]["ts_ms"])
            else:
                avi = avicodec.synth_avi(
                    (seed << 8) ^ i, w=32, h=24, n_frames=n_frames, fps=8
                )
                meta_a = avicodec.decode_avi(avi)
                payloads.append(avi)
                ws.append(meta_a["width"])
                hs.append(meta_a["height"])
                durs.append(meta_a["frames"][-1]["ts_ms"])
    return pa.table(
        {
            "media_id": ids,
            "media_type": types,
            "payload": payloads,
            "meta_width": pa.array(ws, type=pa.int32()),
            "meta_height": pa.array(hs, type=pa.int32()),
            "meta_duration_ms": pa.array(durs, type=pa.int32()),
        }
    )


def _decode_stub(payload: bytes, salt: bytes) -> np.ndarray:
    """Fallback for undecodable payloads: deterministic pseudo-features from
    the payload hash (keeps the pipeline total; rows are flagged)."""
    h = hashlib.blake2b(salt + payload, digest_size=32).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32)


class ImageFeatureStage:
    """Actor stage: REAL PNG decode + resize + grid features.

    Load-once state: model key + target size. Small default batch size —
    binary payloads can be large (memory-aware sizing per SURVEY §4.2).
    Output ``feature`` is 32 floats: 4x4 grid luminance means (16) + 4-point
    row/column profiles (8) + 8 header stats (dims, channels, mean/std,
    min/max, payload size).
    """

    DEFAULT_BATCH_SIZE = 16
    FEATURE_LEN = 32

    def __init__(self, model_name: str = "img-feat-grid-v1", target_size: int = 32):
        self.model_name = model_name
        self.target_size = target_size
        self._salt = hashlib.sha256(model_name.encode()).digest()[:8]

    def _features(self, payload: bytes) -> tuple[list[float], bool]:
        if codecs.is_png(payload):
            try:
                img = codecs.decode_png(payload)
                img = codecs.resize_nearest(img, self.target_size, self.target_size)
                grid = codecs.image_grid_features(img, grid=4)  # 24 floats
                h, w, c = img.shape
                mean = float(img.mean()) / 255.0
                std = float(img.std()) / 255.0
                head = [
                    float(h) / 1024.0,
                    float(w) / 1024.0,
                    float(c) / 4.0,
                    mean,
                    std,
                    float(img.min()) / 255.0,
                    float(img.max()) / 255.0,
                    float(len(payload)) / 1e6,
                ]
                return [float(x) for x in grid] + head, True
            except Exception:
                # ValueError (unsupported shape), zlib.error (corrupt IDAT),
                # struct.error (truncated header) — any of these means "not
                # decodable": fall through to the flagged fallback rather
                # than killing the batch
                pass
        vec = _decode_stub(payload, self._salt)[: self.FEATURE_LEN]
        return [float(x) for x in vec], False

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = []
        ok = []
        for t, p in zip(types, payloads):
            if t != "image" or not p:
                feats.append([0.0] * self.FEATURE_LEN)
                ok.append(False)
                continue
            vec, decoded = self._features(p)
            feats.append(vec)
            ok.append(decoded)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "decoded": pa.array(ok, type=pa.bool_()),
            }
        )


class AudioFeatureStage:
    """Actor stage: REAL PCM16 WAV decode + frame energy/ZCR features."""

    DEFAULT_BATCH_SIZE = 32
    FRAMES = 8

    def __init__(self, frames: int = FRAMES):
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, rates, samples, ok = [], [], [], []
        for t, p in zip(types, payloads):
            if t != "audio" or not p or not codecs.is_wav(p):
                feats.append([0.0] * (2 * self.frames))
                rates.append(0)
                samples.append(0)
                ok.append(False)
                continue
            try:
                sig, rate = codecs.decode_wav(p)
            except Exception:
                feats.append([0.0] * (2 * self.frames))
                rates.append(0)
                samples.append(0)
                ok.append(False)
                continue
            vec = codecs.audio_energy_features(sig, rate, self.frames)
            feats.append([float(x) for x in vec])
            rates.append(rate)
            samples.append(len(sig))
            ok.append(True)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "sample_rate": pa.array(rates, type=pa.int32()),
                "n_samples": pa.array(samples, type=pa.int64()),
                "decoded": pa.array(ok, type=pa.bool_()),
            }
        )


class FrameSampleStage:
    """Actor stage: sample N frames per video — REAL decode since round 3.

    Emits one row per sampled frame (a flat_map-shaped batch transform). Two
    real containers decode byte-level: animated GIF (container + LZW,
    functions/gifcodec.py) and uncompressed-DIB RIFF/AVI
    (functions/avicodec.py, round 4): the frame whose timestamp covers each
    sample offset is composited and re-encoded as a PNG (codec composition —
    GIF/AVI in, PNG out), ``decoded=True``. Payloads in formats this
    container has no codec for fall back to the DECLARED deterministic hash
    stub with ``decoded=False`` — the row stays total either way.
    """

    def __init__(self, num_frames: int = 4):
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        durs = batch.column("meta_duration_ms").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_ts, out_frame, out_dec = [], [], [], []
        for mid, t, dur, p in zip(ids, types, durs, payloads):
            if t != "video":
                continue
            clip = None
            if p is not None and gifcodec.is_gif(p):
                try:
                    clip = gifcodec.decode_gif(p)
                except gifcodec.GifError:
                    clip = None
            elif p is not None and avicodec.is_avi(p):
                try:
                    clip = avicodec.decode_avi(p)
                except avicodec.AviError:
                    clip = None
            if not dur:
                # missing/zero duration metadata must not drop the video
                # (the row stays total): recover the span from the decoded
                # clip's last frame, else stub at ts=0
                if clip is not None and clip["frames"]:
                    dur = int(clip["frames"][-1]["ts_ms"]) + 1
                else:
                    dur = 0
            for k in range(self.num_frames):
                ts = (dur * (k + 1)) // (self.num_frames + 1)
                out_id.append(mid)
                out_ts.append(ts)
                if clip is not None:
                    frame = clip["frames"][0]
                    for f in clip["frames"]:
                        if f["ts_ms"] <= ts:
                            frame = f
                        else:
                            break
                    out_frame.append(codecs.encode_png(frame["rgb"]))
                    out_dec.append(True)
                else:
                    out_frame.append(
                        hashlib.blake2b(
                            (p or b"") + ts.to_bytes(8, "big"), digest_size=16
                        ).digest()
                    )
                    out_dec.append(False)
        return pa.table(
            {
                # explicit type: an empty list would infer a null column
                # and diverge the block schema (the empty-block footgun)
                "media_id": pa.array(out_id, type=pa.string()),
                "frame_ts_ms": pa.array(out_ts, type=pa.int32()),
                "frame": pa.array(out_frame, type=pa.binary()),
                "decoded": pa.array(out_dec, type=pa.bool_()),
            }
        )


def build_media_feature_pipeline(ds, concurrency: int = 4, batch_size: int | None = None):
    """Compose the image feature pipeline over a media-schema Dataset."""
    return ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size or ImageFeatureStage.DEFAULT_BATCH_SIZE,
        concurrency=concurrency,
    )


def build_audio_feature_pipeline(ds, concurrency: int = 4, batch_size: int | None = None):
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size or AudioFeatureStage.DEFAULT_BATCH_SIZE,
        concurrency=concurrency,
    )


def build_frame_sample_pipeline(ds, concurrency: int = 4, num_frames: int = 4):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"num_frames": num_frames},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )
