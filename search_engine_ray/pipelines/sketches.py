"""Mergeable sketch operators — approximate answers whose partials combine
associatively, the canonical 100-TB path for metrics where the exact answer
needs an all-to-all shuffle of every distinct value.

HyperLogLog (Flajolet et al. 2007, public literature): per-batch register
arrays are the combiner — a batch of any size reduces to one m-byte row per
group key, the groupby merges registers with an elementwise max, and the
estimate is computed once per key. Exact distinct counting of U values
shuffles O(U) rows; the sketch shuffles O(groups x batches) fixed-size rows
with a deterministic (hash-seeded, not sampled) result, so reruns and
retries are reproducible bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_HLL_P_DEFAULT = 12  # 4096 registers -> ~1.6% standard error, 4 KB per row


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer — a public-domain 64-bit mixer."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (w == 0 -> 64), exact:
    the 32-bit halves are exactly representable in float64 so floor(log2)
    cannot straddle an integer boundary."""
    hi = (w >> np.uint64(32)).astype(np.uint32)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = np.full(len(w), 64, dtype=np.int64)
    has_lo = lo > 0
    out[has_lo] = 63 - np.floor(np.log2(lo[has_lo])).astype(np.int64)
    has_hi = hi > 0
    out[has_hi] = 31 - np.floor(np.log2(hi[has_hi])).astype(np.int64)
    return out


def _hll_estimate(regs: np.ndarray, p: int) -> int:
    """Standard HLL estimator with the small-range linear-counting switch."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / float(np.sum(np.power(2.0, -regs.astype(np.float64))))
    if raw <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return int(round(m * np.log(m / zeros)))
    return int(round(raw))


def hll_distinct_ds(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    p: int = _HLL_P_DEFAULT,
) -> rd.Dataset:
    """(key, distinct_est) — approximate COUNT(DISTINCT val) per key.

    Per batch, one register array per key present (vectorized
    dictionary-encode + np.maximum.at); the single groupby(key) then moves
    one m-byte row per (key, batch) instead of one row per distinct value,
    and merges registers with an elementwise max — fully associative, so
    the result is independent of batching/retries (pinned by test)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = batch.column(val_col).to_numpy(zero_copy_only=False)
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_keys = len(enc.dictionary)
        if not len(vals) or not n_keys:
            # typed empty: keep the INPUT key type so empty blocks concat
            # cleanly with populated ones for non-string keys too
            return pa.table(
                {
                    key_col: pa.array([], keys.type),
                    "regs": pa.array([], pa.large_binary()),
                }
            )
        h = _splitmix64(vals.astype(np.uint64))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)
        rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
        regs = np.zeros(n_keys * m, dtype=np.uint8)
        np.maximum.at(regs, codes * m + idx, rho)
        return pa.table(
            {
                key_col: enc.dictionary,
                "regs": pa.array(
                    [regs[i * m : (i + 1) * m].tobytes() for i in range(n_keys)],
                    pa.large_binary(),
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        rows = group.column("regs").to_pylist()
        regs = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(len(rows), m)
        merged = regs.max(axis=0)
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "distinct_est": pa.array([_hll_estimate(merged, p)], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (Cormode & Muthukrishnan 2005, public
# literature) — the mergeable FREQUENCY counterpart to HLL's cardinality:
# per-batch partial sketches are (depth x width) int64 count grids that
# merge by elementwise SUM (fully associative, retry/batching invariant),
# and est(term) = min over rows overestimates the true count by at most
# (e/width) * total_tokens with probability 1 - e^-depth. Exact per-term
# counts shuffle O(vocabulary); the sketch ships one fixed-size grid per
# batch through a binary tree of Ray tasks.
# ---------------------------------------------------------------------------

_CM_ROW_POLYS = [
    1099511628211,          # FNV prime (matches _hash_utf8_array default)
    0x9E3779B97F4A7C15,     # golden-ratio odd constant
    0xC2B2AE3D27D4EB4F,     # xxhash64 prime 2
    0x165667B19E3779F9,     # xxhash64 prime 5
    0x27D4EB2F165667C5,     # xxhash64 rotl constant
]


def _cm_row_hashes(terms: pa.Array, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices for a term array — one vectorized
    polynomial-hash pass per row, mixed through SplitMix64 so rows are
    pairwise independent enough for the CM guarantee."""
    from search_engine_ray.stages.postings import _hash_utf8_array

    out = np.empty((depth, len(terms)), np.int64)
    for d in range(depth):
        h = _hash_utf8_array(
            terms, poly=np.uint64(_CM_ROW_POLYS[d % len(_CM_ROW_POLYS)]),
            add=31 + 2 * d,
        )
        out[d] = (_splitmix64(h + np.uint64(d)) % np.uint64(width)).astype(
            np.int64
        )
    return out


def count_min_token_sketch(
    docs: rd.Dataset,
    col: str = "text",
    depth: int = 4,
    width: int = 1 << 14,
    min_len: int = 2,
) -> tuple[np.ndarray, int]:
    """Merged Count-Min sketch over every token occurrence (length >=
    min_len) in ``docs[col]`` plus the total token count. Per-batch
    partials reduce in a binary tree of Ray tasks (the grid, never the
    tokens, crosses the wire)."""
    import ray
    import pyarrow.compute as pc

    from search_engine_ray.functions.textstats import token_lists

    def partial(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch.column(col))
        flat = pc.utf8_lower(toks.flatten())
        ok = pc.greater_equal(pc.utf8_length(flat), min_len)
        terms = flat.filter(ok)
        grid = np.zeros((depth, width), np.int64)
        if len(terms):
            idx = _cm_row_hashes(terms, depth, width)
            for d in range(depth):
                np.add.at(grid[d], idx[d], 1)
        return pa.table(
            {
                "grid": pa.array([grid.tobytes()], pa.large_binary()),
                "n": pa.array([len(terms)], pa.int64()),
            }
        )

    @ray.remote
    def block_sum(t: pa.Table) -> tuple[bytes, int]:
        acc = np.zeros(depth * width, np.int64)
        # empty blocks pass through map_batches with the input schema
        if "grid" not in t.column_names:
            return acc.tobytes(), 0
        for g in t.column("grid").to_pylist():
            acc += np.frombuffer(g, np.int64)
        return acc.tobytes(), int(pc.sum(t.column("n")).as_py() or 0)

    @ray.remote
    def pair_sum(a: tuple, b: tuple) -> tuple[bytes, int]:
        return (
            (np.frombuffer(a[0], np.int64) + np.frombuffer(b[0], np.int64)).tobytes(),
            a[1] + b[1],
        )

    # materialize ONCE — to_arrow_refs on a lazy dataset re-executes the
    # plan a second time for schema inference (measured in build.py)
    refs = [
        block_sum.remote(r)
        for r in docs.map_batches(partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ]
    while len(refs) > 1:
        refs = [
            pair_sum.remote(refs[i], refs[i + 1]) if i + 1 < len(refs) else refs[i]
            for i in range(0, len(refs), 2)
        ]
    grid_bytes, total = ray.get(refs[0]) if refs else (
        np.zeros(depth * width, np.int64).tobytes(), 0
    )
    return np.frombuffer(grid_bytes, np.int64).reshape(depth, width), total


def cm_estimate(grid: np.ndarray, terms: pa.Array) -> np.ndarray:
    """min-over-rows point estimates for a term array."""
    depth, width = grid.shape
    idx = _cm_row_hashes(terms, depth, width)
    ests = np.stack([grid[d][idx[d]] for d in range(depth)])
    return ests.min(axis=0)


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch (HDR-histogram binning, public technique:
# Tene's HdrHistogram / DDSketch family) — the mergeable QUANTILE
# counterpart to HLL (cardinality) and Count-Min (frequency): per-batch
# partial histograms over exponent-plus-linear-subdivision bins merge by
# elementwise SUM, and any quantile of non-negative integers is answered
# with relative error <= 1/bins_per_octave DETERMINISTICALLY (the bound is
# structural, not probabilistic: bin membership counts are exact, so the
# sketch's chosen bin always equals the bin of the exact k-th smallest
# value). Exact quantiles need a global sort or a per-distinct-value
# shuffle; the sketch ships one fixed ~8 KB row per (group, batch).
# ---------------------------------------------------------------------------


def _logbin_index(v: np.ndarray, log2_bpo: int) -> np.ndarray:
    """Bin index for non-negative int64 values, pure integer ops (exact,
    deterministic, monotonic in v): v=0 -> bin 0; v>=1 -> 1 + e*bpo + sub
    where e = floor(log2 v) and sub = floor((v - 2^e) * bpo / 2^e) via
    shifts (bpo = 2^log2_bpo). Every bin spans a value range of relative
    width <= 1/bpo of its lower edge."""
    v = v.astype(np.uint64)
    out = np.zeros(len(v), np.int64)
    pos = v > 0
    if not pos.any():
        return out
    w = v[pos]
    e = 63 - _clz64(w)  # floor(log2), exact
    d = w - (np.uint64(1) << e.astype(np.uint64))
    sh = e - log2_bpo
    sub = np.where(
        sh >= 0,
        (d >> np.maximum(sh, 0).astype(np.uint64)).astype(np.int64),
        (d << np.maximum(-sh, 0).astype(np.uint64)).astype(np.int64),
    )
    out[pos] = 1 + e * (1 << log2_bpo) + sub
    return out


def _logbin_edge(bins: np.ndarray, log2_bpo: int) -> np.ndarray:
    """Lower value edge of each bin as float64 (exact below 2^53): the
    sketch's quantile estimate. edge <= true < edge * (1 + 1/bpo)."""
    bpo = 1 << log2_bpo
    b = np.asarray(bins, np.int64) - 1
    e = np.maximum(b, 0) // bpo
    sub = np.maximum(b, 0) % bpo
    base = np.power(2.0, e.astype(np.float64))
    return np.where(b < 0, 0.0, base * (1.0 + sub.astype(np.float64) / bpo))


def logbin_quantile_sketch_ds(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    quantiles: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    log2_bpo: int = 4,
) -> rd.Dataset:
    """(key, q_pct, bin, est) — per-key quantile estimates of a
    non-negative integer column with relative error <= 1/2^log2_bpo,
    rank definition k = ceil(q * n) (the k-th smallest, 1-indexed).

    Per batch, one fixed-size int64 histogram per key present (vectorized
    dictionary-encode + np.add.at); the groupby(key) moves one ~8 KB row
    per (key, batch) — never a value — and merges by elementwise sum,
    fully associative (batching/retry invariant). est is the chosen bin's
    lower edge, so est <= exact always and bin(exact) == bin holds
    EXACTLY (pinned by the driver query's distributed cross-check)."""
    bpo = 1 << log2_bpo
    n_bins = 1 + 64 * bpo
    qs = list(quantiles)

    def partial(batch: pa.Table) -> pa.Table:
        # rows with a null key or null value are excluded (SQL aggregate
        # convention) — NaN-laden dictionary codes would otherwise cast to
        # garbage int64 and corrupt the histogram silently
        keys = batch.column(key_col)
        vals_col = batch.column(val_col)
        if keys.null_count or vals_col.null_count:
            import pyarrow.compute as _pc

            ok = _pc.and_(_pc.is_valid(keys), _pc.is_valid(vals_col))
            batch = batch.filter(ok)
            keys = batch.column(key_col)
            vals_col = batch.column(val_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = vals_col.to_numpy(zero_copy_only=False)
        enc = keys.dictionary_encode()
        n_keys = len(enc.dictionary)
        if not len(vals) or not n_keys:
            # typed empty: the key column keeps the INPUT type so blocks
            # from all-null batches concat cleanly with populated ones
            return pa.table(
                {
                    key_col: pa.array([], keys.type),
                    "hist": pa.array([], pa.large_binary()),
                }
            )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bins = _logbin_index(np.asarray(vals, np.int64), log2_bpo)
        hist = np.zeros(n_keys * n_bins, dtype=np.int64)
        np.add.at(hist, codes * n_bins + bins, 1)
        return pa.table(
            {
                key_col: enc.dictionary,
                "hist": pa.array(
                    [
                        hist[i * n_bins : (i + 1) * n_bins].tobytes()
                        for i in range(n_keys)
                    ],
                    pa.large_binary(),
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        rows = group.column("hist").to_pylist()
        hist = (
            np.frombuffer(b"".join(rows), dtype=np.int64)
            .reshape(len(rows), n_bins)
            .sum(axis=0)
        )
        cum = np.cumsum(hist)
        n = int(cum[-1])
        ks = np.maximum(np.ceil(np.array(qs) * n).astype(np.int64), 1)
        chosen = np.searchsorted(cum, ks, side="left").astype(np.int64)
        key_rep = pa.concat_arrays(
            [group.column(key_col).slice(0, 1).combine_chunks()] * len(qs)
        )
        return pa.table(
            {
                key_col: key_rep,
                "q_pct": pa.array(
                    (np.array(qs) * 100).round().astype(np.int64), pa.int64()
                ),
                "bin": pa.array(chosen, pa.int64()),
                "est": pa.array(_logbin_edge(chosen, log2_bpo), pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def hll_window_ds(
    events: rd.Dataset,
    width: str = "hour",
    val_col: str = "user_id",
    p: int = _HLL_P_DEFAULT,
) -> rd.Dataset:
    """Approximate distinct-``val_col`` per tumbling time window — the
    sketch x window composition every traffic dashboard runs (hourly
    unique users) where an exact COUNT(DISTINCT) would shuffle every
    (window, user) pair. One pre-map stamps the int64-us window key
    (pc.floor_temporal); :func:`hll_distinct_ds` then ships one m-byte
    register row per (window, batch) and merges by elementwise max.
    Output: (window_start timestamp[us], distinct_est), window-sorted."""
    import pyarrow.compute as pc

    def stamp(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=width)
        if isinstance(win, pa.ChunkedArray):
            win = win.combine_chunks()
        return pa.table(
            {
                "wus": win.cast(pa.int64()),
                val_col: batch.column(val_col),
            }
        )

    est = hll_distinct_ds(
        events.map_batches(stamp, batch_format="pyarrow"), "wus", val_col, p=p
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("wus").cast(pa.timestamp("us")),
                "distinct_est": batch.column("distinct_est"),
            }
        )

    return est.map_batches(finish, batch_format="pyarrow").sort("window_start")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries, Agarwal et al. PODS'12)
# ---------------------------------------------------------------------------
#
# Deterministic counter-based top-k complement to Count-Min: k counters,
# est(t) <= true(t) <= est(t) + n/(k+1) with NO probability of failure, and
# every term with true(t) > n/(k+1) is guaranteed a surviving counter. The
# per-batch summary is the combiner (k rows regardless of batch size); merge
# = add counters, subtract the (k+1)-th largest, drop non-positive — the
# associative merge preserves the bound, so a binary task tree reduces the
# corpus to one k-row summary without the tokens ever crossing the wire.


def _mg_compress(
    terms: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compress a (term, count) multiset to at most k counters: subtract the
    (k+1)-th largest count from every counter, keep the positive ones."""
    if len(terms) <= k:
        return terms, counts
    d = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    new = counts - d
    keep = new > 0
    return terms[keep], new[keep]


def misra_gries_sketch(
    docs: rd.Dataset,
    col: str = "text",
    k: int = 128,
    min_len: int = 2,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Merged Misra-Gries summary over every token occurrence (lowercased,
    length >= min_len) in ``docs[col]``.

    Returns (terms, est_counts, n_total): at most ``k`` surviving counters
    with deterministic guarantees est <= true <= est + n_total // (k + 1),
    and guaranteed presence of every term whose true count exceeds
    n_total // (k + 1).
    """
    import ray
    import pyarrow.compute as pc

    from search_engine_ray.functions.textstats import token_lists

    def partial(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch.column(col))
        flat = pc.utf8_lower(toks.flatten())
        ok = pc.greater_equal(pc.utf8_length(flat), min_len)
        arr = flat.filter(ok).to_numpy(zero_copy_only=False)
        n = len(arr)
        if n:
            t, c = np.unique(arr, return_counts=True)
            t, c = _mg_compress(t, c.astype(np.int64), k)
        else:
            t, c = np.array([], dtype=object), np.array([], dtype=np.int64)
        return pa.table(
            {
                "terms": pa.array([t.tolist()], pa.list_(pa.string())),
                "counts": pa.array([c.tolist()], pa.list_(pa.int64())),
                "n": pa.array([n], pa.int64()),
            }
        )

    def _merge(
        ta: np.ndarray, ca: np.ndarray, tb: np.ndarray, cb: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        t = np.concatenate([ta, tb])
        c = np.concatenate([ca, cb])
        if not len(t):
            return t, c
        uniq, inv = np.unique(t, return_inverse=True)
        summed = np.zeros(len(uniq), np.int64)
        np.add.at(summed, inv, c)
        return _mg_compress(uniq, summed, k)

    @ray.remote
    def block_sum(tbl: pa.Table) -> tuple[list, list, int]:
        t = np.array([], dtype=object)
        c = np.array([], dtype=np.int64)
        n = 0
        if "terms" not in tbl.column_names:
            return [], [], 0
        for row_t, row_c, row_n in zip(
            tbl.column("terms").to_pylist(),
            tbl.column("counts").to_pylist(),
            tbl.column("n").to_pylist(),
        ):
            t, c = _merge(t, c, np.array(row_t, dtype=object), np.array(row_c, np.int64))
            n += row_n
        return t.tolist(), c.tolist(), n

    @ray.remote
    def pair_sum(a: tuple, b: tuple) -> tuple[list, list, int]:
        t, c = _merge(
            np.array(a[0], dtype=object),
            np.array(a[1], np.int64),
            np.array(b[0], dtype=object),
            np.array(b[1], np.int64),
        )
        return t.tolist(), c.tolist(), a[2] + b[2]

    refs = [
        block_sum.remote(r)
        for r in docs.map_batches(partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ]
    while len(refs) > 1:
        refs = [
            pair_sum.remote(refs[i], refs[i + 1]) if i + 1 < len(refs) else refs[i]
            for i in range(0, len(refs), 2)
        ]
    t, c, n = ray.get(refs[0]) if refs else ([], [], 0)
    return np.array(t, dtype=object), np.array(c, np.int64), n
