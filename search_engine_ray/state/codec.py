"""Posting-list codec: delta + LEB128 varint, fully numpy-vectorized.

Replaces the reference's fixed 4-byte big-endian uint32 postings
(hash.ts:567-575, binary-file-storage.ts:45-57) with the standard compressed
layout (delta-encoded doc-id gaps, varint bytes) used by public inverted-index
designs (e.g. the block-max WAND literature — Ding & Suel, SIGIR'11).

Encode and decode are O(total bytes) with numpy loops bounded at 10
iterations (max varint length for uint64) — no per-value Python.
"""

from __future__ import annotations

import numpy as np


def encode_varints_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode; also return per-value byte offsets (len+1 array) so a
    concatenation of many posting lists can be sliced back per list."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # bytes needed per value
    nb = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += tmp > 0
        tmp = tmp >> np.uint64(7)
    offsets = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(nb, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    cur = v.copy()
    pos = offsets[:-1].copy()
    remaining = nb.copy()
    while True:
        m = remaining > 0
        if not m.any():
            break
        byte = (cur[m] & np.uint64(0x7F)).astype(np.uint8)
        byte[remaining[m] > 1] |= 0x80
        out[pos[m]] = byte
        cur[m] = cur[m] >> np.uint64(7)
        pos[m] += 1
        remaining[m] -= 1
    return out.tobytes(), offsets


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array."""
    return encode_varints_with_offsets(values)[0]


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte string -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(len(ends), dtype=np.uint64)
    max_len = int(lengths.max())
    for k in range(max_len):
        m = lengths > k
        out[m] |= (b[starts[m] + k] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(
            7 * k
        )
    return out


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta-encode an ascending doc_id array, then varint."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    deltas = np.diff(d, prepend=0)
    if len(deltas) and (deltas[1:] <= 0).any():
        raise ValueError("doc_ids must be strictly ascending")
    return encode_varints(deltas.astype(np.uint64))


def decode_doc_ids(buf: bytes) -> np.ndarray:
    deltas = decode_varints(buf).astype(np.int64)
    return np.cumsum(deltas)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return encode_varints(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_varints(buf).astype(np.int32)


def block_boundaries(n: int, block_size: int) -> list[tuple[int, int]]:
    """[(start, end), ...] block index ranges for block-max metadata."""
    return [(i, min(i + block_size, n)) for i in range(0, n, block_size)]
