"""Multimodal column plumbing — image/audio as opaque binary + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): ``decode_fn`` defaults to a deterministic fake that derives
"features" from the payload bytes, and a real decoder can be injected. The
Ray-side plumbing — schema, actor-pool stage, batch sizing for large binary
payloads, output layout — is real and tested.

Scale notes: binary payloads dominate batch memory, so the stages run with
small ``batch_size`` and actor pools sized by ``concurrency``; outputs drop
the payload column as early as possible (prune at the first map).
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=64, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                ["image/jpeg" if i % 3 == 0 else "audio/wav" if i % 3 == 1 else "video/mp4" for i in range(n)],
                pa.string(),
            ),
            "width": pa.array([64 + i % 32 for i in range(n)], pa.int32()),
            "height": pa.array([48 + i % 32 for i in range(n)], pa.int32()),
            "duration_ms": pa.array([0 if i % 3 == 0 else 1000 + i for i in range(n)], pa.int32()),
        }
    )


def deterministic_fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: 8-dim 'feature vector' derived from md5(payload) bytes.

    Replace with a real decoder (PIL / torchaudio / pyav) in environments
    that have one; the pipeline shape does not change."""
    h = hashlib.md5(payload).digest()
    return (np.frombuffer(h[:8], dtype=np.uint8).astype(np.float64) / 255.0)


class MediaFeatureExtract:
    """Actor-pool map_batches stage: decode + featurize binary media.

    ``decode_fn(payload, kind) -> np.ndarray`` is loaded once per actor in
    __init__ (where a real model/codec would be initialized)."""

    def __init__(
        self, decode_fn: Callable[[bytes, str], np.ndarray] | None = None
    ) -> None:
        self.decode = decode_fn or deterministic_fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = [self.decode(p, k).tolist() for p, k in zip(payloads, kinds)]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
            }
        )


def media_features_ds(
    media: rd.Dataset,
    decode_fn: Callable[[bytes, str], np.ndarray] | None = None,
    batch_size: int = 64,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Binary media -> feature rows; payload column dropped at this stage."""
    if concurrency is None:
        from search_engine_ray.util import default_pool_size

        concurrency = min(2, default_pool_size())
    return media.map_batches(
        MediaFeatureExtract,
        fn_constructor_args=(decode_fn,),
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads dominate memory
        concurrency=concurrency,
    )


def frame_sample_ds(
    media: rd.Dataset, every_ms: int = 500, batch_size: int = 64, concurrency: int = 2
) -> rd.Dataset:
    """Video -> sampled frame rows (media_id, frame_idx, ts_ms). The frame
    DECODE is stubbed; the fan-out (flat_map shape, one row per frame) is the
    real plumbing a video pipeline needs."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        m_out, f_out, t_out = [], [], []
        for m, knd, dur in zip(ids, kinds, durs):
            if knd != "video":
                continue
            for fi, ts in enumerate(range(0, int(dur), every_ms)):
                m_out.append(m)
                f_out.append(fi)
                t_out.append(ts)
        return pa.table(
            {
                "media_id": pa.array(m_out, pa.int64()),
                "frame_idx": pa.array(f_out, pa.int64()),
                "ts_ms": pa.array(t_out, pa.int64()),
            }
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


class MediaResize:
    """Actor-pool stage: image resize to fit a bounding box, preserving
    aspect ratio. The PIXEL work is stubbed (no image libs here): the
    payload passes through a deterministic byte marker so tests can pin
    lineage; the real plumbing — actor pool, payload-in/payload-out
    schema, metadata math, small batches — is what a real resampler
    plugs into (inject ``resize_fn(payload, w, h, tw, th) -> bytes``)."""

    def __init__(self, max_w: int, max_h: int, resize_fn=None) -> None:
        self.max_w, self.max_h = max_w, max_h
        self.resize = resize_fn or (
            lambda payload, w, h, tw, th: hashlib.md5(payload).digest() + payload
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(
            np.minimum(self.max_w / np.maximum(w, 1), self.max_h / np.maximum(h, 1)),
            1.0,
        )
        nw = np.maximum(np.rint(w * scale), 1).astype(np.int32)
        nh = np.maximum(np.rint(h * scale), 1).astype(np.int32)
        payloads = batch.column("payload").to_pylist()
        out = [
            self.resize(p, int(ow), int(oh), int(tw), int(th))
            for p, ow, oh, tw, th in zip(payloads, w, h, nw, nh)
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(out, pa.binary()),
                "width": pa.array(nw, pa.int32()),
                "height": pa.array(nh, pa.int32()),
            }
        )


def media_resize_ds(
    media: rd.Dataset,
    max_w: int = 32,
    max_h: int = 32,
    resize_fn=None,
    batch_size: int = 64,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Images resized to fit (max_w, max_h) with aspect ratio kept; never
    upscaled. Non-image rows pass through the same stage untouched in
    metadata (scale capped at 1.0 applies only when larger)."""
    if concurrency is None:
        from search_engine_ray.util import default_pool_size

        concurrency = min(2, default_pool_size())
    return media.map_batches(
        MediaResize,
        fn_constructor_args=(max_w, max_h, resize_fn),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
