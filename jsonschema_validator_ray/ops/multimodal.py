"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container — clearly marked below); everything Ray-side is real and tested:
schemas, batch sizing for large payloads, actor signatures, output layout.
Swap ``_decode_image_stub`` for a real decoder (PIL/torchvision/ffmpeg) on a
cluster that has one.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),          # opaque encoded bytes
    ("width", pa.int32()),             # typed metadata (nullable for audio)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthetic_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        t = types[i % 3]
        rows["media_id"].append(i)
        rows["media_type"].append(t)
        rows["payload"].append(rng.bytes(256 + (i % 7) * 128))
        rows["width"].append(64 + 32 * (i % 4) if t != "audio" else None)
        rows["height"].append(64 + 32 * ((i + 1) % 4) if t != "audio" else None)
        rows["sample_rate"].append(16000 if t == "audio" else None)
        rows["duration_ms"].append(1000 + i * 10 if t != "image" else None)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decode (no image libs in this container).

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))`` → RGB array.
    The fake derives a (h, w, 3) uint8 array from a payload digest so tests
    are deterministic and the downstream plumbing sees realistic shapes."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(digest, "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height or 64, width or 64, 3),
                        dtype=np.uint8)


class ImageFeatureStage:
    """Actor-pool stage: decode → resize → mean-pool color features.

    ``__init__`` is where a real model/codec loads once per actor; here it
    only sets the target size. Use SMALL ``batch_size`` (e.g. 32-128) for
    binary payload columns so batch × concurrency fits worker heaps."""

    def __init__(self, target: int = 32):
        self.target = target

    def _resize_nn(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        yi = (np.arange(self.target) * h // self.target)
        xi = (np.arange(self.target) * w // self.target)
        return img[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats = [], []
        for mid, mtype, payload, w, h in zip(
                batch["media_id"].to_pylist(), batch["media_type"].to_pylist(),
                batch["payload"].to_pylist(), batch["width"].to_pylist(),
                batch["height"].to_pylist()):
            if mtype != "image":
                continue
            img = _decode_image_stub(payload, w, h)
            small = self._resize_nn(img)
            feats.append(small.reshape(-1, 3).mean(axis=0).astype(np.float32))
            ids.append(mid)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "rgb_mean": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class AudioFrameSampleStage:
    """Actor-pool stage: frame-sample an audio payload (STUB decode — derives
    a waveform from the payload bytes; real impl: soundfile/ffmpeg)."""

    def __init__(self, frame_ms: int = 100):
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_frames, rms = [], [], []
        for mid, mtype, payload, sr, dur in zip(
                batch["media_id"].to_pylist(), batch["media_type"].to_pylist(),
                batch["payload"].to_pylist(), batch["sample_rate"].to_pylist(),
                batch["duration_ms"].to_pylist()):
            if mtype != "audio":
                continue
            wave = np.frombuffer(payload, np.uint8).astype(np.float32) / 255.0
            frames = max(1, (dur or 1000) // self.frame_ms)
            ids.append(mid)
            n_frames.append(frames)
            rms.append(float(np.sqrt(np.mean(wave ** 2))))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(n_frames, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
        })


def extract_image_features(ds, target: int = 32, concurrency=(1, 4),
                           batch_size: int = 64):
    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()
    return ds.map_batches(ImageFeatureStage,
                          fn_constructor_kwargs={"target": target},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_audio_frames(ds, frame_ms: int = 100, concurrency=(1, 4),
                        batch_size: int = 64):
    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()
    return ds.map_batches(AudioFrameSampleStage,
                          fn_constructor_kwargs={"frame_ms": frame_ms},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
