"""Text-analysis primitives for training-data pipelines — all vectorized.

Operates on Arrow batches; used by pipelines/text.py map_batches stages.
Language-ID is a stop-word-profile heuristic (n-gram-free, deterministic);
fingerprints are md5 (matches DuckDB's md5() for oracle checks); shingles /
MinHash / SimHash are the standard public constructions (Broder 1997;
Charikar 2002).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from search_engine_ray.tokenize import tokenize_arrow

# tiny per-language stop-word profiles (public common-word lists)
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is a that for on with as are it".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit für auf".split()),
    "fr": frozenset("le la les et de un une est pour dans que sur avec".split()),
    "es": frozenset("el la los las y de un una es para en que con por".split()),
}


def token_lists(texts: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    return tokenize_arrow(texts)


def token_counts(texts) -> np.ndarray:
    return pc.list_value_length(token_lists(texts)).to_numpy(zero_copy_only=False)


def md5_fingerprints(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def md5_fingerprints_arrow(arr: pa.Array | pa.ChunkedArray) -> list[str]:
    """md5 hex per string, hashed straight off the Arrow utf8 data buffer
    via memoryview slices — identical output to ``md5_fingerprints`` but
    ~1.8x faster on document-sized strings (skips to_pylist's per-row
    Python-str materialization + re-encode; md5's C core is the remaining
    cost). Falls back to the list path when the array has nulls."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return []
    if arr.null_count:
        return md5_fingerprints(arr.fill_null("").to_pylist())
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ]
    mv = memoryview(arr.buffers()[2])
    md5 = hashlib.md5
    return [
        md5(mv[s:e]).hexdigest()
        for s, e in zip(off[:-1].tolist(), off[1:].tolist())
    ]


def md5_digests_arrow(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Raw 16-byte md5 digest per string as an (n, 16) uint8 array — the
    binary twin of ``md5_fingerprints_arrow`` (same buffer walk, same
    hash), for call sites that SHUFFLE on the fingerprint: two uint64
    halves sort/group far faster than 32-char hex strings, and the hex
    form is exactly reconstructible (hexlify) where an oracle pins it."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 16), np.uint8)
    if arr.null_count:
        arr = arr.fill_null("")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ]
    mv = memoryview(arr.buffers()[2])
    md5 = hashlib.md5
    return np.frombuffer(
        b"".join(
            md5(mv[s:e]).digest()
            for s, e in zip(off[:-1].tolist(), off[1:].tolist())
        ),
        np.uint8,
    ).reshape(n, 16)


def md5_id_u32(ids: np.ndarray) -> np.ndarray:
    """Per-id md5-uniform as uint32: ``int(md5(str(int(id))).hexdigest()[:8],
    16)`` for every id, byte-identical to the per-row hashlib expression the
    samplers' SQL oracles pin (DuckDB ``md5(CAST(id AS VARCHAR))``), but the
    decimal rendering happens as ONE Arrow int64->utf8 cast and the digest is
    read as 4 big-endian bytes — no per-row ``str()``/``hexdigest()``/f-string.
    Lexicographic order on fixed-width lowercase hex equals numeric order, so
    every ``hexdigest()[:8] < threshold_hex`` compare becomes ``u32 < thr``
    and every first-nibble membership test becomes ``u32 >> 28 in nibbles``.
    md5's C core remains the per-row cost (~0.4 us/id)."""
    n = len(ids)
    if n == 0:
        return np.zeros(0, np.uint32)
    s = pc.cast(pa.array(np.ascontiguousarray(ids), pa.int64()), pa.string())
    off = np.frombuffer(s.buffers()[1], dtype=np.int32)[s.offset : s.offset + n + 1]
    mv = memoryview(s.buffers()[2])
    md5 = hashlib.md5
    from_bytes = int.from_bytes
    return np.fromiter(
        (
            from_bytes(md5(mv[a:b]).digest()[:4], "big")
            for a, b in zip(off[:-1].tolist(), off[1:].tolist())
        ),
        dtype=np.uint32,
        count=n,
    )


def md5_prefix64_arrow(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """First 8 md5-digest bytes per string as big-endian uint64 — equal to
    ``int(md5(s).hexdigest()[:16], 16)`` (and ``>> 4`` gives the 15-hex /
    60-bit prefix), hashed straight off the Arrow utf8 data buffer like
    ``md5_digests_arrow``: no ``to_pylist`` per-row Python-str
    materialization, no hex-string detour. For the oracle-pinned md5
    call sites (winnow fingerprints, CDC boundaries); the non-oracle
    scale paths use the fully-vectorized ``_hash_utf8_array`` family."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    if arr.null_count:
        arr = arr.fill_null("")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ]
    mv = memoryview(arr.buffers()[2])
    md5 = hashlib.md5
    from_bytes = int.from_bytes
    return np.fromiter(
        (
            from_bytes(md5(mv[a:b]).digest()[:8], "big")
            for a, b in zip(off[:-1].tolist(), off[1:].tolist())
        ),
        dtype=np.uint64,
        count=n,
    )


def quality_metrics(texts: pa.Array) -> dict[str, np.ndarray]:
    """Per-doc quality features: char count, token count, mean token length,
    short-token ratio. Deterministic and SQL-mirrorable."""
    toks = token_lists(texts)
    n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_len = pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = len(texts)
    sum_len = np.bincount(parents, weights=flat_len, minlength=n).astype(np.int64)
    short = np.bincount(
        parents, weights=(flat_len < 2).astype(np.float64), minlength=n
    ).astype(np.int64)
    # integer outputs only: ratios are derivable and integers hash exactly
    # across engines (no float-rounding boundary hazards in oracle checks)
    return {
        "n_chars": pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64),
        "n_tokens": n_tokens,
        "sum_token_len": sum_len,
        "n_short": short,
    }


def lang_scores(texts: pa.Array) -> list[str]:
    """Most-probable language by stop-word profile hit count; 'und'
    (undetermined) when no profile scores > 0. Fully vectorized: one
    utf8_lower + one is_in + one bincount per language over the flattened
    token array; ties resolve to the first language in sorted order (the
    strictly-greater update rule)."""
    toks = token_lists(texts)
    n = len(toks)
    flat = pc.utf8_lower(toks.flatten())
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    langs = sorted(LANG_PROFILES)
    scores = np.zeros((len(langs), n), dtype=np.int64)
    for li, lang in enumerate(langs):
        hit = pc.is_in(
            flat, value_set=pa.array(sorted(LANG_PROFILES[lang]))
        ).to_numpy(zero_copy_only=False)
        scores[li] = np.bincount(parents, weights=hit.astype(np.float64), minlength=n)
    best = np.argmax(scores, axis=0)  # first max wins == sorted-order priority
    best_score = scores[best, np.arange(n)]
    lang_arr = np.array(langs)
    return np.where(best_score > 0, lang_arr[best], "und").tolist()


# ---------------------------------------------------------------------------
# Shingles / MinHash / SimHash
# ---------------------------------------------------------------------------

# prime just above 2^32: shingle hashes and coefficients are < 2^32, so
# a*h + b fits exactly in uint64 — fully vectorized universal hashing
_PRIME = np.uint64(4294967311)


# rolling shingle hash: crc32 per token, folded with a 32-bit polynomial
# recurrence acc = acc*P + h (mod 2^32). Values stay < 2^32 (required by
# the minhash universal-hash a*h+b mod prime trick in uint64).
_SHINGLE_P = np.uint64(1_000_003)
_SHINGLE_MASK = np.uint64(0xFFFFFFFF)


def _token_crc32(strings) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in strings),
        dtype=np.uint64,
        count=len(strings),
    )


def shingle_hashes(words: list[str], k: int = 3) -> np.ndarray:
    """Distinct k-token shingle hashes for ONE doc (reference implementation
    of ``shingle_hashes_batch`` — byte-identical values, tested). Docs
    shorter than k fold ALL tokens into one shingle; empty docs yield none."""
    h = _token_crc32(words)
    n = len(h)
    if not n:
        return h
    with np.errstate(over="ignore"):
        if n < k:
            acc = np.uint64(0)
            for j in range(n):
                acc = (acc * _SHINGLE_P + h[j]) & _SHINGLE_MASK
            return np.array([acc], dtype=np.uint64)
        acc = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = (acc * _SHINGLE_P + h[j : n - k + 1 + j]) & _SHINGLE_MASK
    return np.unique(acc)


def shingle_hashes_batch(
    toks: pa.ListArray | pa.ChunkedArray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT k-token-shingle hashes for a whole batch, fully
    vectorized: one utf8_lower + dictionary_encode over the flattened
    tokens, crc32 once per DISTINCT token, then the rolling fold runs as k
    whole-array ops and per-doc dedup as one lexsort + run-length mask.

    Returns ``(hashes, starts)``: flat uint64 hashes with doc i owning the
    (ascending-sorted) slice ``hashes[starts[i]:starts[i+1]]``;
    ``len(starts) == n_docs + 1``. Matches ``shingle_hashes`` applied to
    each doc's lowercased tokens (ASCII corpora; pc.utf8_lower)."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_docs = len(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.utf8_lower(toks.flatten()).dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    h = _token_crc32(enc.dictionary.to_pylist())[idx] if len(idx) else np.zeros(
        0, np.uint64
    )
    lens = np.diff(offs)
    doc_ids = np.arange(n_docs, dtype=np.int64)

    parts_h: list[np.ndarray] = []
    parts_p: list[np.ndarray] = []
    with np.errstate(over="ignore"):
        # full windows for docs with >= k tokens
        full = lens >= k
        n_sh = np.where(full, lens - k + 1, 0)
        total = int(n_sh.sum())
        if total:
            sel = np.flatnonzero(full)
            prev = np.concatenate(([0], np.cumsum(n_sh[sel])[:-1]))
            pos = np.arange(total) - np.repeat(prev, n_sh[sel])
            start = np.repeat(offs[sel], n_sh[sel]) + pos
            acc = np.zeros(total, dtype=np.uint64)
            for j in range(k):
                acc = (acc * _SHINGLE_P + h[start + j]) & _SHINGLE_MASK
            parts_h.append(acc)
            parts_p.append(np.repeat(doc_ids[sel], n_sh[sel]))
        # short docs (0 < len < k): ONE shingle folding all tokens —
        # k-1 vectorized passes, one per length class
        for ln in range(1, k):
            sel = np.flatnonzero(lens == ln)
            if not len(sel):
                continue
            acc = np.zeros(len(sel), dtype=np.uint64)
            for j in range(ln):
                acc = (acc * _SHINGLE_P + h[offs[sel] + j]) & _SHINGLE_MASK
            parts_h.append(acc)
            parts_p.append(doc_ids[sel])

    if not parts_h:
        return np.zeros(0, np.uint64), np.zeros(n_docs + 1, np.int64)
    hs = np.concatenate(parts_h)
    ps = np.concatenate(parts_p)
    order = np.lexsort((hs, ps))
    hs, ps = hs[order], ps[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
    hs, ps = hs[keep], ps[keep]
    counts = np.bincount(ps, minlength=n_docs).astype(np.int64)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    return hs, starts


def positional_shingle_hashes_batch(
    toks: pa.ListArray | pa.ChunkedArray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Like ``shingle_hashes_batch`` but POSITIONAL: doc i owns
    ``hashes[starts[i]:starts[i+1]]`` in document order (no sort, no
    dedup) — the input winnowing needs. Same fold, same crc32 token
    hash, so values agree with the shingle/minhash family."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_docs = len(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.utf8_lower(toks.flatten()).dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    h = _token_crc32(enc.dictionary.to_pylist())[idx] if len(idx) else np.zeros(
        0, np.uint64
    )
    lens = np.diff(offs)
    n_out = np.where(lens >= k, lens - k + 1, np.minimum(lens, 1)).astype(np.int64)
    out_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_out, out=out_starts[1:])
    out = np.zeros(int(out_starts[-1]), dtype=np.uint64)
    with np.errstate(over="ignore"):
        full = lens >= k
        n_sh = np.where(full, lens - k + 1, 0)
        total = int(n_sh.sum())
        if total:
            sel = np.flatnonzero(full)
            prev = np.concatenate(([0], np.cumsum(n_sh[sel])[:-1]))
            pos = np.arange(total) - np.repeat(prev, n_sh[sel])
            start = np.repeat(offs[sel], n_sh[sel]) + pos
            acc = np.zeros(total, dtype=np.uint64)
            for j in range(k):
                acc = (acc * _SHINGLE_P + h[start + j]) & _SHINGLE_MASK
            out[np.repeat(out_starts[sel], n_sh[sel]) + pos] = acc
        for ln in range(1, k):
            sel = np.flatnonzero(lens == ln)
            if not len(sel):
                continue
            acc = np.zeros(len(sel), dtype=np.uint64)
            for j in range(ln):
                acc = (acc * _SHINGLE_P + h[offs[sel] + j]) & _SHINGLE_MASK
            out[out_starts[sel]] = acc
    return out, out_starts


def winnow_fingerprints(words: list[str], k: int = 3, w: int = 4) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003) fingerprint SET for ONE doc —
    reference implementation: distinct sliding-window minima (window w)
    of the positional k-gram rolling hashes; docs with fewer than w
    k-grams contribute the min over what they have."""
    # positional hashes (shingle_hashes sorts+dedups, so recompute)
    th = _token_crc32(words)
    n = len(th)
    if n == 0:
        return np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        if n < k:
            acc = np.uint64(0)
            for j in range(n):
                acc = (acc * _SHINGLE_P + th[j]) & _SHINGLE_MASK
            pos = np.array([acc], dtype=np.uint64)
        else:
            pos = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):
                pos = (pos * _SHINGLE_P + th[j : n - k + 1 + j]) & _SHINGLE_MASK
    if len(pos) <= w:
        return np.unique(pos.min(keepdims=True))
    mins = [pos[i : i + w].min() for i in range(len(pos) - w + 1)]
    return np.unique(np.array(mins, dtype=np.uint64))


def winnow_fingerprints_batch(
    toks: pa.ListArray | pa.ChunkedArray, k: int = 3, w: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Batch winnowing, fully vectorized: one global sliding-window-min
    over the flat positional hashes, valid window starts selected per doc
    (no padding, no per-doc loop), short docs via minimum.reduceat, then
    one lexsort dedup. Returns (doc_indices, fingerprints)."""
    flat, starts = positional_shingle_hashes_batch(toks, k)
    n_docs = len(starts) - 1
    m = np.diff(starts)
    parts_d: list[np.ndarray] = []
    parts_f: list[np.ndarray] = []
    big = np.flatnonzero(m > w)
    if len(big) and len(flat) >= w:
        from numpy.lib.stride_tricks import sliding_window_view

        gmins = sliding_window_view(flat, w).min(axis=1)
        n_win = m[big] - w + 1
        prev = np.concatenate(([0], np.cumsum(n_win)[:-1]))
        pos = np.arange(int(n_win.sum())) - np.repeat(prev, n_win)
        wstart = np.repeat(starts[big], n_win) + pos
        parts_f.append(gmins[wstart])
        parts_d.append(np.repeat(big, n_win))
    small = np.flatnonzero((m > 0) & (m <= w))
    if len(small):
        # reduceat over (start, end) index pairs — a bare starts list would
        # make each segment run to the NEXT small doc's start, spanning
        # other docs' hashes. The appended sentinel keeps end==len legal.
        fl2 = np.append(flat, np.uint64(0))
        pairs = np.empty(2 * len(small), dtype=np.int64)
        pairs[0::2] = starts[small]
        pairs[1::2] = starts[small] + m[small]
        parts_f.append(np.minimum.reduceat(fl2, pairs)[0::2])
        parts_d.append(small)
    if not parts_f:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    d = np.concatenate(parts_d)
    f = np.concatenate(parts_f)
    order = np.lexsort((f, d))
    d, f = d[order], f[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
    return d[keep], f[keep]


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_PRIME), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_PRIME), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm-wide MinHash signature, exact uint64 arithmetic."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    prod = (a[:, None] * shingles[None, :] + b[:, None]) % _PRIME
    return prod.min(axis=1).astype(np.uint64)


def minhash_signatures_flat(
    flat: np.ndarray, starts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perm) signatures from flat-layout shingles (the
    ``shingle_hashes_batch`` output) in ONE matrix pass: hash every shingle
    once, per-doc min via reduceat. Empty docs get all-max signatures."""
    n_docs = len(starts) - 1
    num_perm = len(a)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    lens = np.diff(starts)
    nz = np.flatnonzero(lens)
    if not len(nz) or not len(flat):
        return out
    prod = (a[:, None] * flat[None, :] + b[:, None]) % _PRIME  # (perm, N)
    # segment i of reduceat runs starts[nz[i]] .. starts[nz[i+1]]; empty
    # docs occupy zero width, so each segment is exactly doc nz[i]'s slice
    mins = np.minimum.reduceat(prod, starts[nz], axis=1)
    out[nz] = mins.T
    return out


def minhash_signatures_batch(
    per_doc_shingles: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perm) signatures for a list-of-arrays batch — identical
    values to per-doc ``minhash_signature`` (tested); wraps the flat core."""
    lens = np.array([len(s) for s in per_doc_shingles], dtype=np.int64)
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    flat = (
        np.concatenate(per_doc_shingles)
        if per_doc_shingles
        else np.zeros(0, np.uint64)
    )
    return minhash_signatures_flat(flat, starts, a, b)


_MIX = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix64 multiplier
_FNV = np.uint64(0x100000001B3)


def band_keys_batch(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) LSH band bucket keys: an FNV-style fold of each band's
    ``rows`` signature values through a 64-bit avalanche mix, fully vectorized
    (no per-doc Python). Two docs agree on a band key iff their band
    signatures agree (up to a 2^-63 hash collision, absorbed by the exact
    verify stage downstream)."""
    n_docs, num_perm = sigs.shape
    rows = num_perm // bands
    view = np.ascontiguousarray(sigs[:, : bands * rows]).reshape(n_docs, bands, rows)
    with np.errstate(over="ignore"):
        h = np.full((n_docs, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
        for r in range(rows):
            x = view[:, :, r].copy()
            x ^= x >> np.uint64(33)
            x *= _MIX
            x ^= x >> np.uint64(29)
            h = (h ^ x) * _FNV
    # top bit dropped so the key is a nonnegative int64 (Arrow-friendly)
    return (h >> np.uint64(1)).astype(np.int64)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """LSH band bucket keys for ONE signature (reference implementation of
    ``band_keys_batch``, same values row by row)."""
    return band_keys_batch(sig.reshape(1, -1), bands)[0].tolist()


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def simhash64(words: list[str]) -> int:
    """64-bit SimHash over token md5 hashes, unweighted."""
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in words:
        h = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash64_batch(toks: pa.ListArray) -> np.ndarray:
    """Per-doc 64-bit SimHash over a token-list batch, identical to
    ``simhash64`` per row but md5 is computed ONCE per distinct token in the
    batch and the per-doc sign accumulation is a bincount over the flattened
    (doc, bit) matrix — no per-doc Python loop."""
    n = len(toks)
    flat = pc.utf8_lower(toks.flatten()).to_pylist()
    if not flat:
        return np.zeros(n, dtype=np.uint64)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    hashes = np.array(
        [
            int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
            for w in uniq
        ],
        dtype=np.uint64,
    )
    bits = ((hashes[codes][:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
        np.int64
    )  # (n_tokens, 64)
    signs = 2 * bits - 1
    acc = np.zeros((n, 64), dtype=np.int64)
    np.add.at(acc, parents, signs)
    out = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Repetition metrics / string shingles (webtext quality + decontamination)
# ---------------------------------------------------------------------------


def repetition_metrics(texts: pa.Array) -> dict[str, np.ndarray]:
    """Gopher-style (Rae et al. 2021, §A1.1) token-bigram repetition
    features, fully vectorized batch-wide: total bigrams, distinct
    bigrams, and the count of the single most frequent bigram per doc.
    A high top_bigram_count / n_bigrams ratio flags boilerplate and
    degenerate repetition. No Python per-row loop: tokens are
    dictionary-encoded once, bigrams become int64 keys (code_i * V +
    code_{i+1}), and per-doc counts fall out of one lexsort +
    run-length pass over the whole batch."""
    toks = token_lists(texts)
    n = len(texts)
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.int64(len(enc.dictionary))
    n_bigrams = np.zeros(n, np.int64)
    distinct = np.zeros(n, np.int64)
    top = np.zeros(n, np.int64)
    if len(codes) >= 2:
        same = parents[:-1] == parents[1:]
        p = parents[:-1][same]
        key = codes[:-1][same] * vocab + codes[1:][same]
        n_bigrams = np.bincount(p, minlength=n).astype(np.int64)
        order = np.lexsort((key, p))
        ps, ks = p[order], key[order]
        new = np.ones(len(ps), dtype=bool)
        new[1:] = (ps[1:] != ps[:-1]) | (ks[1:] != ks[:-1])
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, len(ps))).astype(np.int64)
        run_parent = ps[starts]
        distinct = np.bincount(run_parent, minlength=n).astype(np.int64)
        np.maximum.at(top, run_parent, run_len)
    return {
        "n_bigrams": n_bigrams,
        "distinct_bigrams": distinct,
        "top_bigram_count": top,
    }


def distinct_shingle_strings(
    texts: pa.Array, k: int = 3
) -> tuple[np.ndarray, pa.Array]:
    """(parent_index, shingle) for the DISTINCT k-token space-joined
    shingle strings of each doc — the SQL-equality-preserving shingle
    form used by decontamination (unlike the crc32 rolling hashes used
    by MinHash, these compare equal across engines). Vectorized: one
    binary_join_element_wise over k shifted slices, then dictionary
    encode + lexsort dedup. Docs shorter than k tokens yield none."""
    toks = token_lists(texts)
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(flat)
    if m < k:
        return np.empty(0, np.int64), pa.array([], pa.string())
    nsh = m - k + 1
    parts = [flat.slice(i, nsh) for i in range(k)]
    sh = pc.binary_join_element_wise(*parts, " ")
    valid = parents[: nsh] == parents[k - 1 :]
    sh = sh.filter(pa.array(valid))
    p = parents[:nsh][valid]
    if not len(p):
        return p, sh
    enc = sh.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((codes, p))
    ps, cs = p[order], codes[order]
    keep = np.ones(len(ps), dtype=bool)
    keep[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
    idx = order[keep]
    return p[idx], sh.take(pa.array(idx))


def positional_shingle_strings(
    texts: pa.Array, k: int = 3
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(parent_index, position, shingle) for ALL k-token space-joined
    shingle strings of each doc, in document order (positions 0-based) —
    the positional, SQL-equality-preserving form duplicate-span removal
    needs. Same vectorized shape as ``distinct_shingle_strings`` (k
    shifted slices + one binary_join_element_wise), no dedup. Docs
    shorter than k tokens yield none."""
    toks = token_lists(texts)
    flat = toks.flatten()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    m = len(flat)
    if m < k:
        e = np.empty(0, np.int64)
        return e, e, pa.array([], pa.string())
    nsh = m - k + 1
    parts = [flat.slice(i, nsh) for i in range(k)]
    sh = pc.binary_join_element_wise(*parts, " ")
    valid = parents[:nsh] == parents[k - 1 :]
    p = parents[:nsh][valid]
    pos = (np.arange(nsh)[valid] - offs[p]).astype(np.int64)
    return p, pos, sh.filter(pa.array(valid))
