"""Multimodal (image/audio/video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``...). The decode /
resize / feature-extract / frame-sample kernels require codec libraries that
are NOT in this container, so the pixel/sample work is STUBBED behind
deterministic fakes — but the Ray-side plumbing is real and tested: actor-pool
``map_batches`` stages with load-once model state, small batch sizes for large
binary payloads, Arrow binary columns end to end.

Swap the ``_decode_stub`` internals for PIL/ffmpeg/torchaudio calls without
touching the stage signatures.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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
    """Deterministic fake media table (binary payloads = seeded bytes)."""
    import random

    kinds = ["image", "audio", "video"]
    ids, types, payloads, ws, hs, durs = [], [], [], [], [], []
    for i in range(n):
        rng = random.Random((seed << 16) ^ i)
        kind = kinds[i % 3]
        ids.append(f"media-{i:06d}")
        types.append(kind)
        payloads.append(rng.randbytes(rng.randint(256, 4096)))
        ws.append(rng.choice([320, 640, 1280]) if kind != "audio" else 0)
        hs.append(rng.choice([240, 480, 720]) if kind != "audio" else 0)
        durs.append(rng.randint(1000, 60000) if kind != "image" else 0)
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
    """STUB decoder: deterministic pseudo-pixels from the payload hash.

    A real implementation would be ``PIL.Image.open(io.BytesIO(payload))`` /
    an ffmpeg frame grab. Raises nothing — the fake always "decodes".
    """
    h = hashlib.blake2b(salt + payload, digest_size=32).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32)


class ImageFeatureStage:
    """Actor stage: decode (stub) + resize (stub) + embed (stub) images.

    Load-once state: the "model" key. Small default batch size — binary
    payloads can be large, and batch_size x concurrency x payload must fit in
    worker heap (memory-aware sizing per SURVEY §4.2).
    """

    DEFAULT_BATCH_SIZE = 16

    def __init__(self, model_name: str = "img-feat-stub-v0", target_size: int = 224):
        self.model_name = model_name
        self.target_size = target_size
        self._salt = hashlib.sha256(model_name.encode()).digest()[:8]

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = []
        ok = []
        for t, p in zip(types, payloads):
            if t != "image" or not p:
                feats.append([0.0] * 32)
                ok.append(False)
                continue
            vec = _decode_stub(p, self._salt)
            feats.append([float(x) for x in vec])
            ok.append(True)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "decoded": pa.array(ok, type=pa.bool_()),
            }
        )


class FrameSampleStage:
    """Actor stage: sample N frame offsets per video (stub frame grab).

    Emits one row per sampled frame — a flat_map-shaped batch transform.
    """

    def __init__(self, num_frames: int = 4):
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        durs = batch.column("meta_duration_ms").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_ts, out_frame = [], [], []
        for mid, t, dur, p in zip(ids, types, durs, payloads):
            if t != "video" or not dur:
                continue
            for k in range(self.num_frames):
                ts = (dur * (k + 1)) // (self.num_frames + 1)
                out_id.append(mid)
                out_ts.append(ts)
                out_frame.append(
                    hashlib.blake2b(
                        p + ts.to_bytes(8, "big"), digest_size=16
                    ).digest()
                )
        return pa.table(
            {
                "media_id": out_id,
                "frame_ts_ms": pa.array(out_ts, type=pa.int32()),
                "frame": pa.array(out_frame, type=pa.binary()),
            }
        )


def build_media_feature_pipeline(ds, concurrency: int = 4, batch_size: int | None = None):
    """Compose the media feature pipeline over a media-schema Dataset."""
    return ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size or ImageFeatureStage.DEFAULT_BATCH_SIZE,
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
