"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

Decode resolution order (probed once per actor, never per batch):

1. Optional libraries (PIL for images, soundfile for audio) when importable.
2. REAL pure-python/numpy decoders for public uncompressed formats that need
   no external library: PPM ``P6`` images, PCM WAV audio (stdlib ``wave``)
   and YUV4MPEG2 ``C444`` video (y4m). The synthetic test corpus emits
   exactly these formats, so the real decode paths are exercised in this
   container.
3. A clearly-marked deterministic STUB for anything else (e.g. JPEG without
   PIL, compressed MP4-style video) — the Ray-side plumbing (schemas,
   small-batch sizing, actor signature, output layout) is real regardless.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

try:                                # optional, probed once at import
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None
try:
    import soundfile as _soundfile
except ImportError:
    _soundfile = None

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),          # opaque encoded bytes
    ("width", pa.int32()),             # typed metadata (nullable for audio)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767)
                      .astype("<i2").tobytes())
    return buf.getvalue()


def synthetic_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic media rows for tests: images are REAL PPM payloads,
    audio rows are REAL PCM WAV payloads, video rows are REAL YUV4MPEG2
    (y4m, C444) payloads — so all three genuine decoders run in this
    container; only compressed formats (JPEG/MP4) fall back to the
    labeled stubs."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        t = types[i % 3]
        rows["media_id"].append(i)
        rows["media_type"].append(t)
        w = 64 + 32 * (i % 4) if t != "audio" else None
        h = 64 + 32 * ((i + 1) % 4) if t != "audio" else None
        if t == "image":
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows["payload"].append(_encode_ppm(img))
        elif t == "audio":
            samples = rng.normal(0, 0.2, 16000 // 4).astype(np.float32)
            rows["payload"].append(_encode_wav(samples, 16000))
        else:
            frames = rng.integers(0, 256, size=(4 + (i // 3) % 3, h, w, 3),
                                  dtype=np.uint8)
            rows["payload"].append(_encode_y4m(frames))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(16000 if t == "audio" else None)
        rows["duration_ms"].append(1000 + i * 10 if t != "image" else None)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decode of a binary PPM (``P6``) image — pure numpy, no deps."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = []
    pos = 2
    while len(parts) < 3:                    # width, height, maxval
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        if payload[pos:pos + 1] == b"#":     # comment line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM comment")
            pos = nl + 1
            continue
        end = pos
        while end < len(payload) and not payload[end:end + 1].isspace():
            end += 1
        if end == pos or end >= len(payload):
            raise ValueError("truncated PPM header")
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1                                 # single whitespace before raster
    w, h, _maxval = parts
    if w <= 0 or h <= 0 or len(payload) - pos < w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(payload, np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a PCM WAV payload via stdlib ``wave`` → (float32
    mono samples in [-1, 1], sample_rate)."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        sr = f.getframerate()
        nch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def _encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """REAL encode of (n, h, w, 3) uint8 YCbCr frames as YUV4MPEG2 ``C444``
    (uncompressed planar, one Y/Cb/Cr plane per frame) — the same
    no-external-library approach as the PPM path, so the genuine video
    decode runs in this container."""
    n, h, w, _ = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for i in range(n):
        out.append(b"FRAME\n")
        # planar: all Y, then all Cb, then all Cr
        out.append(frames[i].transpose(2, 0, 1).astype(np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """REAL decode of a YUV4MPEG2 ``C444`` payload — pure numpy, no deps.
    Returns (n_frames, h, w, 3) uint8 YCbCr. Raises ValueError on anything
    truncated, malformed, or in an unsupported colorspace (caller falls
    back to the labeled stub)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m header")
    w = h = None
    cspace = "420jpeg"     # y4m default when the C tag is absent (tagless
    #                        headers must reject as 'C420jpeg', not 'CC…')
    for tok in payload[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cspace = tok[1:].decode("ascii", "replace")
    if not w or not h or w <= 0 or h <= 0:
        raise ValueError("missing y4m dimensions")
    if cspace != "444":
        raise ValueError(f"unsupported y4m colorspace C{cspace}")
    frame_bytes = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed y4m frame marker")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or len(payload) - (fnl + 1) < frame_bytes:
            raise ValueError("truncated y4m frame")
        plane = np.frombuffer(payload, np.uint8, count=frame_bytes,
                              offset=fnl + 1).reshape(3, h, w)
        frames.append(plane.transpose(1, 2, 0))
        pos = fnl + 1 + frame_bytes
    if not frames:
        raise ValueError("y4m payload has no frames")
    return np.stack(frames)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decode for formats with no available
    decoder (e.g. JPEG without PIL). Derives a (h, w, 3) uint8 array from a
    payload digest so tests are deterministic and downstream plumbing sees
    realistic shapes."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(digest, "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height or 64, width or 64, 3),
                        dtype=np.uint8)


def decode_image(payload: bytes, width: int | None = None,
                 height: int | None = None) -> np.ndarray:
    """Decode an image payload: PIL when importable → PPM decoder → stub."""
    if _PIL_Image is not None:
        try:
            return np.asarray(
                _PIL_Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception:
            pass
    if payload.startswith(b"P6"):
        try:
            return decode_ppm(payload)
        except ValueError:      # truncated/malformed header → stub fallback
            pass
    return _decode_image_stub(payload, width, height)


def decode_audio(payload: bytes,
                 sample_rate: int | None = None) -> tuple[np.ndarray, int]:
    """Decode an audio payload: soundfile → stdlib WAV → stub waveform."""
    if _soundfile is not None:
        try:
            x, sr = _soundfile.read(io.BytesIO(payload), dtype="float32")
            if x.ndim > 1:
                x = x.mean(axis=1)
            return x, sr
        except Exception:
            pass
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    # STUB: derive a waveform from the payload bytes
    x = np.frombuffer(payload, np.uint8).astype(np.float32) / 255.0
    return x, sample_rate or 16000


def _decode_video_stub(payload: bytes, width: int, height: int,
                       n_frames: int = 4) -> np.ndarray:
    """STUB — deterministic fake decode for compressed video formats with no
    available decoder in this container (labeled, like the JPEG stub)."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "little"))
    return rng.integers(0, 256, size=(n_frames, height or 64, width or 64, 3),
                        dtype=np.uint8)


def decode_video(payload: bytes, width: int | None = None,
                 height: int | None = None) -> np.ndarray:
    """Decode a video payload: y4m decoder → labeled stub. Returns
    (n_frames, h, w, 3) uint8."""
    if payload.startswith(b"YUV4MPEG2"):
        try:
            return decode_y4m(payload)
        except ValueError:      # truncated/malformed → stub fallback
            pass
    return _decode_video_stub(payload, width, height)


def _resize_nn(img: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index-grid gather (pure numpy,
    both directions) — shared by the feature and resize stages so the
    sampling rule can never diverge between them."""
    h, w = img.shape[:2]
    yi = np.arange(target_h) * h // target_h
    xi = np.arange(target_w) * w // target_w
    return img[yi][:, xi]


class ImageFeatureStage:
    """Actor-pool stage: decode → resize → mean-pool color features.

    ``__init__`` is where a real model/codec loads once per actor; here it
    only sets the target size. Use SMALL ``batch_size`` (e.g. 32-128) for
    binary payload columns so batch × concurrency fits worker heaps."""

    def __init__(self, target: int = 32):
        self.target = target

    def _resize_nn(self, img: np.ndarray) -> np.ndarray:
        return _resize_nn(img, self.target, self.target)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, dws, dhs = [], [], [], []
        for mid, mtype, payload, w, h in zip(
                batch["media_id"].to_pylist(), batch["media_type"].to_pylist(),
                batch["payload"].to_pylist(), batch["width"].to_pylist(),
                batch["height"].to_pylist()):
            if mtype != "image":
                continue
            img = decode_image(payload, w, h)
            small = self._resize_nn(img)
            feats.append(small.reshape(-1, 3).mean(axis=0).astype(np.float32))
            ids.append(mid)
            # DECODED dims (from the payload header, not the metadata
            # columns) — lets callers verify the parse really happened
            dhs.append(int(img.shape[0]))
            dws.append(int(img.shape[1]))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "rgb_mean": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
            "dec_width": pa.array(dws, pa.int64()),
            "dec_height": pa.array(dhs, pa.int64()),
        })


class ImageResizeStage:
    """Actor-pool stage: decode → nearest-neighbor resize to a fixed
    ``(target_h, target_w)`` → RE-ENCODE as PPM. Image in, image out — the
    training-prep normalize shape (every image leaves at one resolution),
    unlike :class:`ImageFeatureStage` which pools to a feature vector.

    The resize is an integer index-grid gather (pure numpy, no deps) and the
    PPM re-encode is byte-deterministic, so downstream stages — and the gate
    oracle — can verify outputs by exact payload comparison. Non-image rows
    pass through untouched (width/height metadata updated only for images),
    keeping the stage composable in a mixed-media pipeline."""

    def __init__(self, target_w: int = 48, target_h: int = 48):
        self.target_w = int(target_w)
        self.target_h = int(target_h)

    def _resize_nn(self, img: np.ndarray) -> np.ndarray:
        return _resize_nn(img, self.target_h, self.target_w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mtypes, payloads, ws, hs, ows, ohs = [], [], [], [], [], [], []
        for mid, mtype, payload, w, h in zip(
                batch["media_id"].to_pylist(), batch["media_type"].to_pylist(),
                batch["payload"].to_pylist(), batch["width"].to_pylist(),
                batch["height"].to_pylist()):
            ids.append(mid)
            mtypes.append(mtype)
            if mtype != "image":
                payloads.append(payload)
                ws.append(w)
                hs.append(h)
                ows.append(w)
                ohs.append(h)
                continue
            img = decode_image(payload, w, h)
            payloads.append(_encode_ppm(self._resize_nn(img)))
            ws.append(self.target_w)
            hs.append(self.target_h)
            # ORIGINAL decoded dims (payload header, not metadata columns)
            ohs.append(int(img.shape[0]))
            ows.append(int(img.shape[1]))
        out = pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(mtypes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "orig_width": pa.array(ows, pa.int32()),
            "orig_height": pa.array(ohs, pa.int32()),
        })
        # true pass-through composability: every OTHER input column (e.g.
        # sample_rate / duration_ms for audio rows) rides along unchanged,
        # so downstream audio/video stages still find their metadata
        for name in batch.column_names:
            if name not in out.column_names:
                out = out.append_column(name, batch[name])
        return out


class AudioFrameSampleStage:
    """Actor-pool stage: frame-sample an audio payload (decode resolution:
    soundfile → stdlib PCM WAV → stub waveform)."""

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
            samples, srate = decode_audio(payload, sr)
            frames = max(1, int(len(samples) * 1000 / max(srate, 1))
                         // self.frame_ms) if len(samples) else 1
            ids.append(mid)
            n_frames.append(frames)
            rms.append(float(np.sqrt(np.mean(samples ** 2)))
                       if len(samples) else 0.0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(n_frames, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
        })


class VideoFrameSampleStage:
    """Actor-pool stage: decode a video payload (y4m → labeled stub) and
    sample every ``stride``-th frame; emits decoded dims + per-sampled-frame
    mean luma. Small batches — video payloads are the largest binary
    column."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, ns, dws, dhs, luma = [], [], [], [], [], []
        for mid, mtype, payload, w, h in zip(
                batch["media_id"].to_pylist(), batch["media_type"].to_pylist(),
                batch["payload"].to_pylist(), batch["width"].to_pylist(),
                batch["height"].to_pylist()):
            if mtype != "video":
                continue
            frames = decode_video(payload, w, h)
            sampled = frames[::self.stride]
            ids.append(mid)
            nf.append(int(frames.shape[0]))
            ns.append(int(sampled.shape[0]))
            dhs.append(int(frames.shape[1]))
            dws.append(int(frames.shape[2]))
            # plane 0 is Y (luma) in the y4m planar layout
            luma.append(sampled[..., 0].reshape(ns[-1], -1)
                        .mean(axis=1).astype(np.float32))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
            "n_sampled": pa.array(ns, pa.int64()),
            "dec_width": pa.array(dws, pa.int64()),
            "dec_height": pa.array(dhs, pa.int64()),
            "luma_mean": pa.array([v.tolist() for v in luma],
                                  pa.list_(pa.float32())),
        })


def sample_video_frames(ds, stride: int = 2, concurrency=(1, 4),
                        batch_size: int = 16):
    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()
    return ds.map_batches(VideoFrameSampleStage,
                          fn_constructor_kwargs={"stride": stride},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def extract_image_features(ds, target: int = 32, concurrency=(1, 4),
                           batch_size: int = 64):
    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()
    return ds.map_batches(ImageFeatureStage,
                          fn_constructor_kwargs={"target": target},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def resize_images(ds, target_w: int = 48, target_h: int = 48,
                  concurrency=(1, 4), batch_size: int = 64):
    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()
    return ds.map_batches(ImageResizeStage,
                          fn_constructor_kwargs={"target_w": target_w,
                                                 "target_h": target_h},
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
