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


# ---------------------------------------------------------------------------
# Elias-Fano doc-id codec (opt-in alternative to delta+varint)
# ---------------------------------------------------------------------------
# Quasi-succinct posting representation (Elias '74; Vigna, WSDM'13 —
# "Quasi-succinct indices"): an ascending sequence of n values with
# universe u is split at l = floor(log2(u/n)) bits; the low l bits of each
# value are stored verbatim in a packed bitstream, the high bits as a unary
# bitmap of (value >> l) + index. Total ~ n*(2 + log2(u/n)) bits — within
# half a bit per posting of the information-theoretic minimum, and 2-4x
# smaller than delta+varint on dense lists (varint's floor is 8 bits per
# posting; EF's is ~2). Used by Lucene (IndexedDISI) and PISA.
#
# Per-list layout (byte-aligned, self-describing):
#   [n: LEB128 varint] [l: 1 byte] [lows: ceil(n*l/8) bytes, LSB-first]
#   [highs: ceil((n + (last >> l) + 1)/8) bytes, LSB-first unary bitmap]
#
# l is clamped to 56 so (low << bit_shift) fits in one uint64 during the
# vectorized scatter (bit_shift <= 7); a clamp only pads the high bitmap
# and cannot occur below 2^56 (~7e16) doc ids.

_EF_MAX_L = 56


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized int bit_length for uint64 (0 -> 0)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    out = np.zeros(len(x), dtype=np.int64)
    cur = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = cur >= (np.uint64(1) << np.uint64(s))
        out[m] += s
        cur[m] >>= np.uint64(s)
    out[x > 0] += 1
    return out


def ef_encode_multi(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Elias-Fano-encode MANY ascending lists in one vectorized pass.

    ``values`` holds the lists back-to-back; ``starts``/``ends`` are the
    per-list slice bounds and must tile ``values`` contiguously (the merge
    stage's layout). Returns (buffer, per-list byte offsets, len+1) so the
    buffer can be sliced into a per-group binary column exactly like
    ``encode_varints_with_offsets``.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    ng = len(starts)
    n_g = ends - starts
    if (n_g < 0).any():
        raise ValueError("ends must be >= starts")
    N = int(n_g.sum())
    if N != len(v) or (ng and (starts[0] != 0 or ends[-1] != len(v))) or (
        ng > 1 and (starts[1:] != ends[:-1]).any()
    ):
        raise ValueError("starts/ends must tile values contiguously")

    last = np.zeros(ng, dtype=np.uint64)
    nz = n_g > 0
    last[nz] = v[ends[nz] - 1]
    u = last + np.uint64(1)
    q = np.ones(ng, dtype=np.uint64)
    q[nz] = u[nz] // n_g[nz].astype(np.uint64)
    l_g = np.minimum(_bit_length_u64(q) - 1, _EF_MAX_L)
    l_g[~nz] = 0

    # header: n as varint + l byte
    hdr_bytes, hdr_off = encode_varints_with_offsets(n_g.astype(np.uint64))
    nvlen = np.diff(hdr_off) if ng else np.zeros(0, np.int64)
    lb_g = (n_g * l_g + 7) >> 3
    hb_g = np.zeros(ng, dtype=np.int64)
    hb_g[nz] = (
        n_g[nz] + (last[nz] >> l_g[nz].astype(np.uint64)).astype(np.int64) + 1 + 7
    ) >> 3
    size_g = nvlen + 1 + lb_g + hb_g
    offsets = np.zeros(ng + 1, dtype=np.int64)
    np.cumsum(size_g, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    if not ng:
        return b"", offsets

    # scatter the n varints
    hv = np.frombuffer(hdr_bytes, dtype=np.uint8)
    rep = np.repeat(np.arange(ng), nvlen)
    intra = np.arange(len(hv)) - np.repeat(hdr_off[:-1], nvlen)
    out[offsets[:-1][rep] + intra] = hv
    # l bytes
    out[offsets[:-1] + nvlen] = l_g.astype(np.uint8)

    if N:
        low_base = offsets[:-1] + nvlen + 1  # first byte of the lows section
        high_base = low_base + lb_g
        gi = np.repeat(np.arange(ng), n_g)
        pos_in_g = np.arange(N, dtype=np.int64) - np.repeat(starts, n_g)
        l_v = l_g[gi]
        l_vu = l_v.astype(np.uint64)
        low = v & ((np.uint64(1) << l_vu) - np.uint64(1))

        bitpos = (low_base[gi] << 3) + pos_in_g * l_v
        B = bitpos >> 3
        s = (bitpos & 7).astype(np.uint64)
        shifted = low << s  # l <= 56, s <= 7: fits uint64
        for j in range(8):
            m = (8 * j) < (l_v + s.astype(np.int64))
            m &= l_v > 0
            if not m.any():
                break
            np.bitwise_or.at(
                out,
                B[m] + j,
                ((shifted[m] >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(
                    np.uint8
                ),
            )

        high = (v >> l_vu).astype(np.int64)
        hpos = (high_base[gi] << 3) + high + pos_in_g
        np.bitwise_or.at(
            out,
            hpos >> 3,
            (np.uint8(1) << (hpos & 7).astype(np.uint8)),
        )
    return out.tobytes(), offsets


def ef_encode(doc_ids: np.ndarray) -> bytes:
    """Elias-Fano-encode one ascending doc_id array (self-describing)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if len(d) and ((d[0] < 0) or (np.diff(d) <= 0).any()):
        raise ValueError("doc_ids must be strictly ascending and non-negative")
    buf, _ = ef_encode_multi(
        d.astype(np.uint64),
        np.array([0], np.int64),
        np.array([len(d)], np.int64),
    )
    return buf


def ef_decode(buf: bytes) -> np.ndarray:
    """Decode one Elias-Fano buffer -> ascending int64 doc_id array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.int64)
    n = 0
    shift = 0
    i = 0
    while True:
        byte = int(b[i])
        n |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            break
        shift += 7
    l = int(b[i])
    i += 1
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lb = (n * l + 7) >> 3
    lows = b[i : i + lb]
    highs = b[i + lb :]
    pos = np.flatnonzero(np.unpackbits(highs, bitorder="little"))[:n].astype(
        np.int64
    )
    if len(pos) != n:
        raise ValueError("corrupt Elias-Fano buffer: missing high bits")
    high = pos - np.arange(n, dtype=np.int64)
    if l:
        padded = np.concatenate([lows, np.zeros(8, np.uint8)])
        bp = np.arange(n, dtype=np.int64) * l
        B = bp >> 3
        s = (bp & 7).astype(np.uint64)
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(8):
            acc |= padded[B + j].astype(np.uint64) << np.uint64(8 * j)
        low = (acc >> s) & ((np.uint64(1) << np.uint64(l)) - np.uint64(1))
    else:
        low = np.zeros(n, dtype=np.uint64)
    return ((high.astype(np.uint64) << np.uint64(l)) | low).astype(np.int64)


def decode_doc_ids_any(buf: bytes, codec: str) -> np.ndarray:
    """Decode a doc_ids buffer under the named codec ("varint" | "ef")."""
    if codec == "ef":
        return ef_decode(buf)
    if codec == "varint":
        return decode_doc_ids(buf)
    raise ValueError(f"unknown postings codec: {codec!r}")
