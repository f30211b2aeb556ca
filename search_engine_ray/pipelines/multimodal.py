"""Multimodal column plumbing — image/audio as opaque binary + typed metadata.

Pixel work is REAL for P6 PPM (pure-numpy decode → nearest-neighbor
resize → encode; pixel-true tested — the one raster format that needs no
external libraries). Compressed formats (JPEG/PNG/WAV/MP4) remain
STUBBED: PIL/libvips/ffmpeg are absent from this container, so
``decode_fn``/``resize_fn`` default to deterministic fakes for them and a
real codec injects through the same signature. The Ray-side plumbing —
schema, actor-pool stage, batch sizing for large binary payloads, output
layout — is identical either way and fully tested.

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
    """Deterministic synthetic media rows. Image rows carry REAL P6 PPM
    payloads (random pixels at the row's width x height — decodable and
    resizable with the pure-numpy codec below); audio/video rows carry
    opaque seeded bytes (no codecs in this container)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    widths = [64 + i % 32 for i in range(n)]
    heights = [48 + i % 32 for i in range(n)]
    payloads = [
        fake_ppm_payload(widths[i], heights[i], seed + i)
        if i % 3 == 0
        else rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                [
                    "image/x-portable-pixmap"
                    if i % 3 == 0
                    else "audio/wav"
                    if i % 3 == 1
                    else "video/mp4"
                    for i in range(n)
                ],
                pa.string(),
            ),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array([0 if i % 3 == 0 else 1000 + i for i in range(n)], pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# REAL pixel work — P6 PPM, the one raster format that needs no external
# libraries (round-3 upgrade of the decode stub: PIL/libvips/ffmpeg remain
# absent from this container, but an uncompressed format makes the decode →
# resize → encode path genuinely pixel-true; compressed formats still go
# through an injected ``resize_fn``).
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "P6 is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8. Plain header (no comments),
    maxval 255 — exactly what ``encode_ppm`` writes."""
    import re

    # exactly ONE whitespace byte terminates the header (raster bytes may
    # themselves look like whitespace — never strip into the raster)
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", buf)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    raster = np.frombuffer(buf, np.uint8, count=w * h * 3, offset=m.end())
    return raster.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (index-map gather; the classic
    sample-at-pixel-center rule: src = floor((dst + 0.5) * s/t))."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return arr[ys[:, None], xs[None, :]]


def ppm_resize_fn(payload: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Real decode → resize → encode for P6 payloads; anything else —
    including an arbitrary binary payload whose first bytes happen to be
    'P6' (~1/65536 of random rows, a certainty at crawl scale) or a
    truncated/corrupt PPM — falls back to the deterministic marker stub
    instead of killing the stage."""
    if payload.startswith(b"P6"):
        try:
            return encode_ppm(resize_nearest(decode_ppm(payload), tw, th))
        except (ValueError, IndexError):
            pass
    return hashlib.md5(payload).digest() + payload


def fake_ppm_payload(w: int, h: int, seed: int) -> bytes:
    """Deterministic random-pixel P6 image."""
    rng = np.random.default_rng(seed)
    return encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


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
    aspect ratio. P6 PPM payloads get REAL pixel work (pure-numpy decode →
    nearest-neighbor resize → encode, pixel-true tested); other formats
    fall back to a deterministic byte marker unless a real codec is
    injected (``resize_fn(payload, w, h, tw, th) -> bytes`` — no
    JPEG/PNG libraries exist in this container). The plumbing — actor
    pool, payload-in/payload-out schema, metadata math, small batches —
    is identical either way."""

    def __init__(self, max_w: int, max_h: int, resize_fn=None) -> None:
        self.max_w, self.max_h = max_w, max_h
        self.resize = resize_fn or ppm_resize_fn

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
