"""Deduplication pipelines — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding near-dup.

Distributed shapes (no whole-dataset driver materialization anywhere):
- exact: hash-partition by text fingerprint -> per-group min(doc_id) winner
  (groupby, the D2 url-dedup pattern at corpus scale).
- n-gram Jaccard: shingle explode (each row CARRIES its doc's shingle
  count) -> ONE shuffle into coarse key buckets (``_pairs_in_buckets``:
  vectorized per-key pair emission, hot keys capped by ``max_group``
  locally) -> ONE more coarse shuffle by pair for the intersection count
  (``_pair_counts``) -> jaccard = |I| / (|A|+|B|-|I|) scored in a stateless
  map_batches. Exact, no probabilistic step, ZERO hash joins — the per-doc
  counts travel with the pairs. Doubles as the verifier for MinHash.
- MinHash+LSH: per-doc signature (one vectorized matrix pass per batch) ->
  band rows with the band index salted into the key -> the same coarse
  bucketed pair emit -> exact-jaccard verify via hash join of the
  (doc_id, shingles) dataset onto each pair side — shingle sets travel to
  their candidate pairs, never to the driver.
- SimHash: 64-bit signature per doc; near-dup pairs via 4x16-bit band
  blocking (Hamming <= 3 guaranteed caught by pigeonhole).
- embedding near-dup: EXACT all-pairs as a block cross-product — the matrix
  is split into B row blocks held in the object store and B(B+1)/2 tasks
  each compare one block pair; the driver holds only block refs. The
  LSH-bucketed variant (``embedding_neardup_lsh_pairs_ds``) is the
  approximate scale path: random-hyperplane bucketing, exact cosine within
  buckets, multi-table union for recall.
"""

from __future__ import annotations

import functools
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from search_engine_ray.functions.textstats import (
    band_keys_batch,
    md5_fingerprints_arrow,
    minhash_params,
    minhash_signatures_flat,
    shingle_hashes_batch,
    simhash64_batch,
    token_lists,
)

logger = logging.getLogger(__name__)


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def _join_partitions(est_rows: int | None = None) -> int:
    cap = max(2, _cluster_cpus() // 2)
    if est_rows is None:
        return cap
    # data-proportional: each hash-join partition should hold ~200k rows;
    # tiny inputs get few partitions (the per-partition fixed cost dominates
    # them), huge inputs cap at the CPU count and grow per-partition size
    return max(2, min(cap, est_rows // 200_000 + 1))


_SHUFFLE_ROWS_PER_BLOCK = 131_072

# Small-candidate verify: below these bounds the exact-Jaccard check skips
# the two distributed hash joins (fixed ~1.5s each at any size) and instead
# broadcasts ONLY the candidate docs' shingle sets via ray.put. Bounds cap
# the driver-held state at ~tens of MB (10k docs x ~1-2KB/set); above them
# the join path runs unchanged, so the scale path never materializes.
_BROADCAST_VERIFY_PAIRS = 100_000
_BROADCAST_VERIFY_DOCS = 10_000

# cluster_representatives: broadcast the (node, cluster) map when it fits
# (two int64 cols — ~32 MB at 2M clustered docs); beyond that, hash join.
_BROADCAST_CC_ROWS = 2_000_000


def _coalesced(rows: rd.Dataset, est_rows: int | None) -> rd.Dataset:
    """Right-size block count before an all-to-all: the sort shuffle pays a
    fixed per-block cost, so 64 tiny blocks cost ~10x more than 2 right
    blocks (measured). Blocks scale with the DATA (est_rows / 128k), capped
    at 2x cluster CPUs — at 100TB the cap keeps blocks large, at bench scale
    tiny inputs collapse to a handful of blocks. No-op when est is unknown."""
    if est_rows is None:
        return rows
    n = max(1, min(_cluster_cpus() * 2, est_rows // _SHUFFLE_ROWS_PER_BLOCK + 1))
    return rows.repartition(n)


def exact_dedup_ds(docs: rd.Dataset) -> rd.Dataset:
    """Winners of exact-text dedup: min doc_id per distinct text (D2).

    The shuffle keys are the md5 digest's two uint64 halves, not the
    32-char hex string — int keys sort/group several times faster through
    the all-to-all — and the oracle-pinned hex ``fp`` is reconstructed
    exactly (hexlify of the same digest bytes) in a stateless map after
    the aggregate."""
    import binascii

    from search_engine_ray.functions.textstats import md5_digests_arrow

    def fp(batch: pa.Table) -> pa.Table:
        d = md5_digests_arrow(batch.column("text"))
        h = d.view(">u8")  # (n, 2) big-endian halves
        # int64 bit-views, not uint64: Ray's sort-aggregate objects-encodes
        # unsigned key columns; signed keys group identically (any total
        # order works for adjacency)
        return pa.table(
            {
                "h1": pa.array(h[:, 0].astype(np.uint64).view(np.int64), pa.int64()),
                "h2": pa.array(h[:, 1].astype(np.uint64).view(np.int64), pa.int64()),
                "doc_id": batch.column("doc_id"),
            }
        )

    agg = (
        docs.map_batches(fp, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id", alias_name="keep_doc_id"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        buf = np.empty((n, 16), np.uint8)
        for col, sl in (("h1", slice(0, 8)), ("h2", slice(8, 16))):
            be = (
                batch.column(col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .view(np.uint64)
                .astype(">u8")
            )
            buf[:, sl] = be.view(np.uint8).reshape(n, 8)
        hexes = np.frombuffer(binascii.hexlify(buf.tobytes()), dtype="S32")
        return pa.table(
            {
                "fp": pa.array(hexes).cast(pa.string()),
                "keep_doc_id": batch.column("keep_doc_id"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _shingle_rows(batch: pa.Table, k: int) -> pa.Table:
    """(shingle, doc_id, n_doc) rows — one DISTINCT shingle hash per
    (doc, shingle), each row carrying its doc's total shingle count so
    downstream Jaccard scoring needs no per-doc-count join. One vectorized
    batch pass (shingle_hashes_batch), no per-doc Python."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    hs, starts = shingle_hashes_batch(token_lists(batch.column("text")), k)
    n = np.diff(starts)
    return pa.table(
        {
            "shingle": pa.array(hs.astype(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, n), pa.int64()),
            "n_doc": pa.array(np.repeat(n, n), pa.int64()),
        }
    )


def _pair_table(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (a < b) of a sorted unique id vector, vectorized."""
    m = len(ids)
    a_idx, b_idx = np.triu_indices(m, k=1)
    return ids[a_idx], ids[b_idx]


def _n_pair_buckets() -> int:
    # ~8 coarse buckets per expected CPU: enough parallelism that the emit
    # stage saturates the pool, few enough that per-group Python overhead is
    # nil. At cluster scale this tracks cluster CPUs automatically.
    try:
        return max(64, int(ray.cluster_resources().get("CPU", 8)) * 8)
    except Exception:
        return 64


def _bucketer(key_col: str, n_buckets: int, salt: int = 0x9E3779B97F4A7C15):
    """map_batches fn appending a coarse ``_bkt`` hash bucket of ``key_col``."""

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = (k * np.uint64(salt)) >> np.uint64(32)
        return batch.append_column(
            "_bkt", pa.array((b % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    return bucket


def _pairs_in_buckets(
    rows: rd.Dataset,
    key_col: str,
    max_group: int | None,
    what: str,
    payload_cols: tuple[str, ...] = (),
    est_rows: int | None = None,
) -> rd.Dataset:
    """Candidate pairs (doc_a < doc_b) sharing ``key_col``, ONE occurrence
    per shared key (so a downstream pair-count == number of shared keys).
    Each ``payload_cols`` column c (a per-doc attribute riding on the row)
    is carried onto both pair sides as ``c_a`` / ``c_b`` — this is what lets
    downstream scoring avoid hash joins entirely.

    Shape: rows are shuffled once, grouped by a COARSE bucket of the key
    (key mod n_buckets) — one Python call per bucket, not one per distinct
    key — and the per-key pair emission inside a bucket is fully vectorized
    (run-length boundaries + repeat/cumsum index algebra, no Python loop).
    ``max_group`` caps genuinely hot keys locally (all rows of a key land in
    one bucket): a key shared by that many docs carries ~no similarity
    signal — it is a stop-shingle — and quadratic emit on it would explode.
    ``rows`` must contain at most one row per (key, doc_id)."""
    n_buckets = _n_pair_buckets()
    out_names = ["doc_a", "doc_b"] + [
        f"{c}_{s}" for c in payload_cols for s in ("a", "b")
    ]

    def emit(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        pay = {
            c: group.column(c).to_numpy(zero_copy_only=False) for c in payload_cols
        }
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        n = len(keys)
        starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        cnts = np.diff(np.append(starts, n))
        ok = cnts >= 2
        if max_group is not None:
            hot = cnts > max_group
            if hot.any():
                logger.warning(
                    "%s: dropping %d hot keys (> max_group=%d, largest %d docs)",
                    what,
                    int(hot.sum()),
                    max_group,
                    int(cnts.max()),
                )
            ok &= ~hot
        starts, cnts = starts[ok], cnts[ok]
        empty = pa.table(
            {name: pa.array([], pa.int64()) for name in out_names}
        )
        if not len(starts):
            return empty
        # gather rows of surviving keys into one contiguous array
        total = int(cnts.sum())
        prev = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        sel = np.repeat(starts - prev, cnts) + np.arange(total)
        idk = ids[sel]
        # each row at in-group position p is 'doc_a' for (cnt-1-p) pairs
        pos = np.arange(total) - np.repeat(prev, cnts)
        rep = np.repeat(cnts, cnts) - 1 - pos
        npairs = int(rep.sum())
        if not npairs:
            return empty
        a_pos = np.repeat(np.arange(total), rep)
        run_prev = np.concatenate(([0], np.cumsum(rep)[:-1]))
        off = np.arange(npairs) - np.repeat(run_prev, rep)
        b_pos = a_pos + 1 + off
        cols = {
            "doc_a": pa.array(idk[a_pos], pa.int64()),
            "doc_b": pa.array(idk[b_pos], pa.int64()),
        }
        for c in payload_cols:
            vk = pay[c][order][sel]
            cols[f"{c}_a"] = pa.array(vk[a_pos], pa.int64())
            cols[f"{c}_b"] = pa.array(vk[b_pos], pa.int64())
        return pa.table(cols)

    return (
        _coalesced(rows, est_rows)
        .map_batches(_bucketer(key_col, n_buckets), batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(emit, batch_format="pyarrow")
    )


def _pair_counts(
    pairs: rd.Dataset,
    count_col: str,
    payload_cols: tuple[str, ...] = (),
    est_rows: int | None = None,
) -> rd.Dataset:
    """(doc_a, doc_b, <payload firsts>, count_col) — one row per distinct
    pair with its multiplicity, via the SAME coarse-bucket shape as
    ``_pairs_in_buckets``: one shuffle on a hash bucket of the pair, then a
    vectorized run-length count per bucket (no per-pair Python, no
    multi-column sort-based groupby). Payload columns (anything besides
    doc_a/doc_b) are per-doc attributes, constant within a pair — the run's
    first value is kept."""
    n_buckets = _n_pair_buckets()
    payload = [f"{c}_{s}" for c in payload_cols for s in ("a", "b")]

    def bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (
                a * np.uint64(0x9E3779B97F4A7C15) + b * np.uint64(0xC2B2AE3D27D4EB4F)
            ) >> np.uint64(32)
        return batch.append_column(
            "_bkt", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def count(group: pa.Table) -> pa.Table:
        a = group.column("doc_a").to_numpy(zero_copy_only=False)
        b = group.column("doc_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        n = len(a)
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        cnts = np.diff(np.append(starts, n))
        cols = {
            "doc_a": pa.array(a[starts], pa.int64()),
            "doc_b": pa.array(b[starts], pa.int64()),
        }
        for c in payload:
            v = group.column(c).to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(v[starts], pa.int64())
        cols[count_col] = pa.array(cnts, pa.int64())
        return pa.table(cols)

    return (
        _coalesced(pairs, est_rows)
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(count, batch_format="pyarrow")
    )


# A doc_id no real corpus uses. Ray's groupby-aggregate emits a SCHEMALESS
# empty block when its whole input is empty (and empty blocks skip
# map_batches untouched), which crashes downstream Acero joins ('no match
# for key field'). Unioning one sentinel pair row into the aggregate INPUT
# guarantees a non-empty, typed aggregate output; the inner join against
# real doc_ids drops the sentinel group automatically.
_SENTINEL = -(2**62)


def _sentinel_pairs(**extra: int) -> rd.Dataset:
    cols = {
        "doc_a": pa.array([_SENTINEL], pa.int64()),
        "doc_b": pa.array([_SENTINEL], pa.int64()),
    }
    for name, v in extra.items():
        cols[name] = pa.array([v], pa.int64())
    return rd.from_arrow(pa.table(cols))


def _sentinel_row(schema: pa.Schema, **cols) -> rd.Dataset:
    """One-row dataset (sentinel join key) to union into a join side so no
    join input is ever block-empty; the final stage filters the sentinel."""
    return rd.from_arrow(pa.Table.from_pylist([cols], schema=schema))


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _cast_block(t: pa.Table, schema: pa.Schema) -> pa.Table:
    return t.select(schema.names).cast(schema)


def _pin_blocks(ds: rd.Dataset, schema: pa.Schema) -> tuple[rd.Dataset, int]:
    """Drop empty blocks and cast the rest to ``schema`` (remote tasks;
    blocks never touch the driver); returns (pinned dataset, row count) —
    the count is a free byproduct and lets callers size downstream joins.

    Ray 2.49's hash-shuffle join crashes on ANY empty input block — typed or
    not ('no match for key field' in Acero) — and groupby-aggregate emits
    schemaless empty blocks for empty output partitions, while empty blocks
    skip map_batches untouched, so they cannot be fixed in-stream. The
    aggregate is a barrier anyway, so taking block refs here costs no
    pipelining. Callers must guarantee >= 1 non-empty block (the sentinel
    row does).

    materialize() first: ray 2.49's to_arrow_refs on a LAZY dataset runs
    the plan twice — once consuming the blocks and once more for a
    limit(1) schema probe, which is a near-full second pass when the plan
    tail is an all-to-all (measured: ~36% of minhash_pairs wall time)."""
    refs = ds.materialize().to_arrow_refs()
    sizes = ray.get([_block_rows.remote(r) for r in refs])
    pinned = rd.from_arrow_refs(
        [_cast_block.remote(r, schema) for r, n in zip(refs, sizes) if n]
    )
    return pinned, int(sum(sizes))


def ngram_jaccard_pairs_ds(
    docs: rd.Dataset,
    k: int = 3,
    threshold: float = 0.8,
    max_group: int | None = None,
    measure: str = "jaccard",
) -> rd.Dataset:
    """Exact k-token-shingle Jaccard pairs >= threshold (doc_a < doc_b).

    Shuffle-count analysis: shingle explode is the wide step; the pair-emit
    inside a shingle group is quadratic in group size, so ``max_group``
    (default None = exact, for oracle parity) caps genuinely hot shingles
    with a logged drop at crawl scale. Per-doc shingle counts RIDE on the
    exploded rows and onto the pairs (``payload_cols``), so the score is a
    stateless map over the pair counts — zero joins, no driver state."""
    # row estimate for shuffle block sizing: ~1 shingle per token, ~100
    # tokens/doc. count() is metadata-cheap on parquet-backed inputs.
    est = (docs.count() or 0) * 100
    shingle_ds = docs.map_batches(
        lambda b: _shingle_rows(b, k), batch_format="pyarrow"
    ).union(
        _sentinel_row(
            pa.schema(
                [("shingle", pa.int64()), ("doc_id", pa.int64()), ("n_doc", pa.int64())]
            ),
            shingle=_SENTINEL,
            doc_id=_SENTINEL,
            n_doc=0,
        )
    )
    pairs = _pairs_in_buckets(
        shingle_ds,
        "shingle",
        max_group,
        "ngram_jaccard",
        payload_cols=("n_doc",),
        est_rows=est,
    ).union(_sentinel_pairs(n_doc_a=0, n_doc_b=0))
    counted = _pair_counts(pairs, "n_inter", payload_cols=("n_doc",), est_rows=est)

    def score(batch: pa.Table) -> pa.Table:
        ni = batch.column("n_inter").to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch.column("n_doc_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch.column("n_doc_b").to_numpy(zero_copy_only=False).astype(np.float64)
        real = batch.column("doc_a").to_numpy(zero_copy_only=False) != _SENTINEL
        if measure == "containment":
            # near-subset score: |A∩B| / min(|A|,|B|) — catches quote
            # inclusion / page-within-page that symmetric Jaccard misses
            s = ni / np.maximum(np.minimum(na, nb), 1.0)
        else:
            s = ni / np.maximum(na + nb - ni, 1.0)
        keep = (s >= threshold) & real
        return pa.table(
            {
                "doc_a": batch.column("doc_a").filter(pa.array(keep)),
                "doc_b": batch.column("doc_b").filter(pa.array(keep)),
                measure: pa.array(np.round(s[keep], 4)),
            }
        )

    return counted.map_batches(score, batch_format="pyarrow")


def ngram_containment_pairs_ds(
    docs: rd.Dataset,
    k: int = 3,
    threshold: float = 0.9,
    max_group: int | None = None,
) -> rd.Dataset:
    """Near-subset pairs: containment = |A∩B| / min(|A|,|B|) >= threshold.
    Same single-shuffle-per-stage plan as ``ngram_jaccard_pairs_ds``
    (shingle-bucket pair emit -> pair-count shuffle -> stateless score);
    only the final scoring kernel differs."""
    return ngram_jaccard_pairs_ds(
        docs, k=k, threshold=threshold, max_group=max_group, measure="containment"
    )


@functools.lru_cache(maxsize=8)
def _minhash_band_state(
    num_perm: int, bands: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Permutation params + band salts, cached once per worker PROCESS.

    This state costs microseconds to build, so a plain task pool with a
    per-process lru_cache beats an actor pool: the pool's ~1.5 s actor
    spin-up per invocation dominated the whole stage at bench scale
    (measured 2.1 s -> 0.6 s). Actor pools are for EXPENSIVE per-worker
    state (models, indexes); seeded RNG arrays are not that."""
    a, b = minhash_params(num_perm)
    with np.errstate(over="ignore"):
        salt = (np.arange(bands, dtype=np.uint64) + np.uint64(1)) * (
            np.uint64(0x9E3779B97F4A7C15)
        )
    return a, b, salt


def _minhash_bands_batch(
    batch: pa.Table, num_perm: int = 128, bands: int = 32, k: int = 3
) -> pa.Table:
    """doc -> LSH band rows (band_key, doc_id), one row per band with the
    band index salted INTO the key (two docs share a band_key iff they
    agree on that band's signature slice). Deterministic across workers
    (seeded params from _minhash_band_state)."""
    a, b, band_salt = _minhash_band_state(num_perm, bands)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    # one vectorized shingle pass + one signature matrix pass for the
    # whole batch, then vectorized banded keys — no per-doc Python
    flat, starts = shingle_hashes_batch(token_lists(batch.column("text")), k)
    sigs = minhash_signatures_flat(flat, starts, a, b)
    keys = band_keys_batch(sigs, bands)  # (n_docs, bands)
    packed = (keys.astype(np.uint64) ^ band_salt[None, :]) & np.uint64(
        (1 << 63) - 1
    )
    return pa.table(
        {
            "band_key": pa.array(packed.astype(np.int64).reshape(-1), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
        }
    )


def _shingle_set_ds(docs: rd.Dataset, k: int) -> rd.Dataset:
    """(doc_id, shingles) — each doc's sorted shingle-hash set, packed as
    little-endian int64 bytes (Acero hash joins reject list-typed payload
    columns; a binary blob joins fine and unpacks zero-copy)."""

    def f(b: pa.Table) -> pa.Table:
        # shingle_hashes_batch returns each doc's slice already ascending;
        # the large_binary column is built ZERO-COPY from the flat int64
        # buffer with byte offsets — no per-doc tobytes loop
        flat, starts = shingle_hashes_batch(token_lists(b.column("text")), k)
        val_buf = pa.py_buffer(np.ascontiguousarray(flat.astype("<i8")).tobytes())
        off_buf = pa.py_buffer((starts * 8).astype("<i8").tobytes())
        sets = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), b.num_rows, [None, off_buf, val_buf]
        )
        return pa.table({"doc_id": b.column("doc_id"), "shingles": sets})

    return docs.map_batches(f, batch_format="pyarrow").union(
        _sentinel_row(
            pa.schema([("doc_id", pa.int64()), ("shingles", pa.large_binary())]),
            doc_id=_SENTINEL,
            shingles=b"",
        )
    )


def _broadcast_verify_pairs(
    cand: rd.Dataset, docs: rd.Dataset, k: int, threshold: float
) -> rd.Dataset | None:
    """Exact-Jaccard verification for a SMALL candidate set, join-free.

    The join path costs two all-to-all hash joins at a fixed ~1.5 s each
    regardless of size; when the candidate pairs reference few distinct
    docs, it is cheaper to broadcast those docs' shingle sets (one bounded
    ray.put, read once per verify batch) and verify inside map_batches —
    the same broadcast-small-side strategy the relational joins use.
    Returns None when the distinct-doc side exceeds
    ``_BROADCAST_VERIFY_DOCS`` (caller falls back to the joins); driver
    state is bounded by that cap times the per-doc set size. Output is
    bit-identical to the join path (same intersect math, same rounding)."""
    # cand is _pin_blocks output: every block non-empty and schema-cast,
    # so the concat needs no empty-block guard
    cand_tbl = pa.concat_tables(ray.get(cand.to_arrow_refs()))
    a_all = cand_tbl.column("doc_a").to_numpy(zero_copy_only=False)
    b_all = cand_tbl.column("doc_b").to_numpy(zero_copy_only=False)
    real = a_all != _SENTINEL
    ids = np.unique(np.concatenate([a_all[real], b_all[real]]))
    if len(ids) > _BROADCAST_VERIFY_DOCS:
        return None
    ids_ref = ray.put(ids)  # sorted by np.unique

    def sets_for(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = np.isin(d, want)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "shingles": pa.array([], pa.large_binary()),
            }
        )
        if not m.any():
            return empty
        sub = batch.filter(pa.array(m))
        flat, starts = shingle_hashes_batch(token_lists(sub.column("text")), k)
        val_buf = pa.py_buffer(np.ascontiguousarray(flat.astype("<i8")).tobytes())
        off_buf = pa.py_buffer((starts * 8).astype("<i8").tobytes())
        sets = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), sub.num_rows, [None, off_buf, val_buf]
        )
        return pa.table({"doc_id": sub.column("doc_id"), "shingles": sets})

    # drop zero-row blocks (possible EMPTY schema — skipped map_batches);
    # with zero REAL candidates (sentinel-only cand) every block is
    # 0-row, so the concat must be guarded, not assumed non-empty
    set_tables = [
        t
        for t in ray.get(
            docs.map_batches(sets_for, batch_format="pyarrow")
            .materialize()  # to_arrow_refs on a lazy plan runs it twice
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if set_tables:
        sets_tbl = pa.concat_tables(set_tables)
        sd = sets_tbl.column("doc_id").to_numpy(zero_copy_only=False)
        blobs = sets_tbl.column("shingles")
        mapping = {int(sd[i]): blobs[i].as_py() for i in range(len(sd))}
    else:
        mapping = {}
    sets_ref = ray.put(mapping)

    def verify(batch: pa.Table) -> pa.Table:
        m = ray.get(sets_ref)
        a_ids = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b_ids = batch.column("doc_b").to_numpy(zero_copy_only=False)
        keep_a, keep_b, jac = [], [], []
        for x, y in zip(a_ids, b_ids):
            if x == _SENTINEL:
                continue
            aa = np.frombuffer(m[int(x)], dtype="<i8")
            bb = np.frombuffer(m[int(y)], dtype="<i8")
            inter = len(np.intersect1d(aa, bb, assume_unique=True))
            union = len(aa) + len(bb) - inter
            jv = inter / union if union else 1.0
            if jv >= threshold:
                keep_a.append(int(x))
                keep_b.append(int(y))
                jac.append(round(jv, 4))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_pairs_ds(
    docs: rd.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
    threshold: float = 0.8,
    concurrency: int | None = None,
    max_group: int | None = None,
) -> rd.Dataset:
    """Candidate pairs from LSH banding, verified with EXACT shingle Jaccard.

    Verification picks its strategy by candidate size: small candidate sets
    (<= ``_BROADCAST_VERIFY_PAIRS`` pairs over <= ``_BROADCAST_VERIFY_DOCS``
    distinct docs) broadcast the needed shingle sets and verify join-free;
    larger sets use a distributed hash join — the (doc_id, shingles) dataset
    is joined onto each candidate-pair side, so each verify batch holds only
    ITS pairs' shingle sets. Recall: P[candidate | j] = 1-(1-j^r)^b; at the
    default 128/32 (r=4) a true j>=0.8 pair is missed with p < 5e-8, so the
    verified output equals the exact >=threshold pair set in practice."""
    # ``concurrency`` kept for API compat; the band stage is a task pool
    # (per-process cached state), so Ray sizes its parallelism itself.
    n_docs = docs.count() or 0
    est_band_rows = n_docs * bands
    bands_ds = docs.map_batches(
        functools.partial(_minhash_bands_batch, num_perm=num_perm, bands=bands, k=k),
        batch_format="pyarrow",
    )

    cand = _pair_counts(
        _pairs_in_buckets(
            bands_ds, "band_key", max_group, "minhash_lsh", est_rows=est_band_rows
        ).union(_sentinel_pairs()),
        "n_bands",
        est_rows=est_band_rows,
    )
    cand, n_cand = _pin_blocks(
        cand,
        pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_bands", pa.int64())]
        ),
    )
    if n_cand <= _BROADCAST_VERIFY_PAIRS:
        small = _broadcast_verify_pairs(cand, docs, k, threshold)
        if small is not None:
            return small
    parts = _join_partitions(n_cand + n_docs)
    sets_ds = _coalesced(_shingle_set_ds(docs, k), n_docs)
    j = cand.join(
        sets_ds, "inner", num_partitions=parts, on=("doc_a",), right_on=("doc_id",)
    ).rename_columns({"shingles": "shingles_a"})
    j, _ = _pin_blocks(
        j,
        pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("n_bands", pa.int64()),
                ("shingles_a", pa.large_binary()),
            ]
        ),
    )
    j = j.join(
        sets_ds, "inner", num_partitions=parts, on=("doc_b",), right_on=("doc_id",)
    ).rename_columns({"shingles": "shingles_b"})

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b_ids = batch.column("doc_b").to_numpy(zero_copy_only=False)
        sa = batch.column("shingles_a").to_pylist()
        sb = batch.column("shingles_b").to_pylist()
        keep_a, keep_b, jac = [], [], []
        for x, y, la, lb in zip(a_ids, b_ids, sa, sb):
            if x == _SENTINEL:
                continue
            aa = np.frombuffer(la, dtype="<i8")
            bb = np.frombuffer(lb, dtype="<i8")
            inter = len(np.intersect1d(aa, bb, assume_unique=True))
            union = len(aa) + len(bb) - inter
            jv = inter / union if union else 1.0
            if jv >= threshold:
                keep_a.append(int(x))
                keep_b.append(int(y))
                jac.append(round(jv, 4))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")


def simhash_ds(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, simhash) 64-bit signatures — md5 hashed once per DISTINCT
    token in the batch, signs accumulated with one bincount per batch."""

    def f(batch: pa.Table) -> pa.Table:
        sigs = simhash64_batch(token_lists(batch.column("text")))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(sigs.astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def simhash_neardup_pairs_ds(docs: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash banding: 4 x 16-bit bands; any pair within
    Hamming distance 3 shares at least one exact band (pigeonhole)."""
    sig_ds = simhash_ds(docs)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        band_id = np.tile(np.arange(4, dtype=np.int64), n)
        rep_sig = np.repeat(sigs, 4)
        band_val = (rep_sig >> (np.uint64(16) * band_id.astype(np.uint64))) & np.uint64(
            0xFFFF
        )
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int64()),
                "band_val": pa.array(band_val.astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "simhash": pa.array(rep_sig.astype(np.int64), pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = group.column("simhash").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, sigs = ids[order], sigs[order]
        uniq = np.ones(len(ids), dtype=bool)
        uniq[1:] = ids[1:] != ids[:-1]
        ids, sigs = ids[uniq], sigs[uniq]
        ai, bi = np.triu_indices(len(ids), k=1)
        x = (sigs[ai] ^ sigs[bi]).astype(np.uint64)
        # vectorized popcount via byte-LUT
        lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
        ham = lut[x.view(np.uint8).reshape(len(x), 8)].sum(1).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[ai[keep]], pa.int64()),
                "doc_b": pa.array(ids[bi[keep]], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    est = (docs.count() or 0) * 4
    return (
        _coalesced(sig_ds.map_batches(explode, batch_format="pyarrow"), est)
        .groupby(["band_id", "band_val"])
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


def _norm_block(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from search_engine_ray.util import embedding_matrix

    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = embedding_matrix(tbl.column("embedding"))
    if mat.size:
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat


@ray.remote
def _cross_block_pairs(tbl_a: pa.Table, tbl_b: pa.Table, threshold: float) -> pa.Table:
    """Cosine >= threshold pairs between two row blocks (vec_a < vec_b)."""
    ids_a, mat_a = _norm_block(tbl_a)
    ids_b, mat_b = _norm_block(tbl_b)
    if not len(ids_a) or not len(ids_b):
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    sims = mat_a @ mat_b.T
    ii, jj = np.nonzero((sims >= threshold) & (ids_a[:, None] < ids_b[None, :]))
    return pa.table(
        {
            "vec_a": pa.array(ids_a[ii], pa.int64()),
            "vec_b": pa.array(ids_b[jj], pa.int64()),
            "cosine": pa.array(np.round(sims[ii, jj], 4), pa.float64()),
        }
    )


def embedding_neardup_pairs_ds(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    target_block_rows: int = 65536,
) -> rd.Dataset:
    """EXACT cosine >= threshold pairs (vec_a < vec_b) as a block
    cross-product: the normalized matrix is split into B row blocks living in
    the OBJECT STORE, and B(B+1)/2 tasks each compare one block pair. The
    driver never holds vectors — only block refs. O(n^2/B^2) work per task,
    O(n*d/B) memory per task; for approximate-at-scale use
    ``embedding_neardup_lsh_pairs_ds``."""
    narrow = embeddings.select_columns(["vec_id", "embedding"])
    n = narrow.count() or 0
    n_blocks = max(1, min(256, -(-n // target_block_rows)))
    # materialize ONCE: to_arrow_refs on a lazy dataset re-executes the
    # plan for its schema probe (read+repartition would run twice)
    refs = narrow.repartition(n_blocks).materialize().to_arrow_refs()
    out_refs = [
        _cross_block_pairs.remote(refs[i], refs[j], threshold)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return rd.from_arrow_refs(out_refs)


@functools.lru_cache(maxsize=8)
def _hyperplane_state(
    dim: int, n_bits: int, n_tables: int, seed: int = 7
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded random hyperplanes + bit weights, cached once per worker
    process (same task-pool-over-actor-pool reasoning as
    _minhash_band_state: the state is microseconds to build)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    pow2 = (1 << np.arange(n_bits)).astype(np.int64)
    return planes, pow2


def _hyperplane_buckets_batch(
    batch: pa.Table, dim: int, n_bits: int, n_tables: int, seed: int = 7
) -> pa.Table:
    """vec -> (table_id, bucket, vec_id, embedding) rows; hyperplanes are
    seeded identically on every worker."""
    from search_engine_ray.util import embedding_matrix

    planes, pow2 = _hyperplane_state(dim, n_bits, n_tables, seed)
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = embedding_matrix(batch.column("embedding"))
    n = len(ids)
    t_out = np.repeat(np.arange(n_tables, dtype=np.int64), n)
    id_out = np.tile(ids, n_tables)
    buckets = np.empty(n_tables * n, dtype=np.int64)
    for t in range(n_tables):
        bits = (mat @ planes[t].T) > 0
        buckets[t * n : (t + 1) * n] = bits @ pow2
    emb = batch.column("embedding")
    emb_out = pa.concat_arrays(
        [emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb]
        * n_tables
    )
    return pa.table(
        {
            "table_id": pa.array(t_out, pa.int64()),
            "bucket": pa.array(buckets, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "embedding": emb_out,
        }
    )


def embedding_neardup_lsh_pairs_ds(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    n_bits: int = 8,
    n_tables: int = 8,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Approximate near-dup pairs at scale: random-hyperplane LSH bucketing
    (n_tables independent tables for recall), exact cosine WITHIN buckets,
    cross-table dedupe by groupby-max. Embeddings travel with their bucket
    rows — no broadcast matrix, no driver state. Recall is tested against the
    exact block cross-product in tests/test_dedup.py."""
    dim = len(embeddings.take(1)[0]["embedding"])
    # ``concurrency`` kept for API compat; task pool + per-process state
    bucketed = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        functools.partial(
            _hyperplane_buckets_batch, dim=dim, n_bits=n_bits, n_tables=n_tables
        ),
        batch_format="pyarrow",
    )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        uniq = np.ones(len(ids), dtype=bool)
        uniq[1:] = ids[order][1:] != ids[order][:-1]
        sel = order[uniq]
        ids = ids[sel]
        from search_engine_ray.util import embedding_matrix

        mat = embedding_matrix(group.column("embedding").take(pa.array(sel)))
        if len(ids) < 2:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ mat.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        return pa.table(
            {
                "vec_a": pa.array(ids[ai[keep]], pa.int64()),
                "vec_b": pa.array(ids[bi[keep]], pa.int64()),
                "cosine": pa.array(np.round(sims[ai[keep], bi[keep]], 4), pa.float64()),
            }
        )

    est = (embeddings.count() or 0) * n_tables
    return (
        _coalesced(bucketed, est)
        .groupby(["table_id", "bucket"])
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .aggregate(Max("cosine", alias_name="cosine"))
    )


def dup_ngram_stats_ds(docs: rd.Dataset, k: int = 3) -> rd.Dataset:
    """Cross-document duplicate n-gram detection (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" signal):
    for each doc, how many of its DISTINCT k-token shingles also occur in
    at least one OTHER doc. High n_dup_shingles / n_shingles marks
    near-boilerplate docs that exact dedup misses.

    Scale shape — zero joins, zero driver state, two shuffles of small
    rows: (1) distinct (doc_id, shingle) pairs stream out of one
    vectorized map_batches; each pair is hash-bucketed on the shingle so
    every occurrence of a shingle lands in one bucket; a groupby(_bkt)
    map_groups computes document frequency within the bucket via one
    dictionary-encode + bincount (no per-shingle Python); (2) a native
    groupby(doc_id) sums the flags. The bucket hash is internal
    partitioning only — equality is decided on the strings, so hash
    collisions cannot corrupt counts."""
    from search_engine_ray.functions.textstats import distinct_shingle_strings
    from search_engine_ray.stages.postings import _hash_utf8_array

    n_buckets = _n_pair_buckets()

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        p, sh = distinct_shingle_strings(text, k)
        # hash only the batch-unique shingles (the dictionary), then fan
        # out through the codes — hash work ∝ vocabulary, not rows; the
        # hash is vectorized over the dictionary's Arrow buffer
        enc = sh.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        h = _hash_utf8_array(enc.dictionary)
        bkt = (h[codes] % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[p], pa.int64()),
                "sh": sh,
                "_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def flag(group: pa.Table) -> pa.Table:
        sh = group.column("sh")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        enc = sh.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        df = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "is_dup": pa.array((df[codes] >= 2).astype(np.int64), pa.int64()),
                "one": pa.array(np.ones(len(codes), np.int64), pa.int64()),
            }
        )

    flags = (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(flag, batch_format="pyarrow")
    )
    from ray.data.aggregate import Sum

    return flags.groupby("doc_id").aggregate(
        Sum("one", alias_name="n_shingles"),
        Sum("is_dup", alias_name="n_dup_shingles"),
    )


def semdedup_ds(
    embeddings: rd.Dataset,
    n_centroids: int = 64,
    threshold: float = 0.95,
    seed: int = 42,
    centroids: "np.ndarray | None" = None,
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering — near-duplicates are only searched WITHIN a
    cluster, turning the O(n^2) all-pairs problem into n_clusters
    independent O((n/k)^2) group problems.

    1. spherical k-means centroids trained on a bounded sample
       (similarity.train_ivf_centroids — the broadcast small side);
    2. nearest-centroid assignment in one map_batches
       (similarity.ivf_assign_ds);
    3. groupby(list_id).map_groups: per-cluster pairwise cosine, then the
       deterministic keep-min rule — a vector is DROPPED iff some
       lower-vec_id vector in its cluster has cosine >= threshold (the
       paper keeps a random representative; min-vec_id makes the result
       reproducible and oracle-testable against a pure-numpy reference).

    Output: (vec_id, list_id, keep). Scale: n_centroids must grow with the
    corpus (the paper uses 50k clusters at LAION scale) so cluster sizes —
    the unit of map_groups memory — stay bounded; embeddings cross the
    shuffle once, keyed by list_id.
    """
    from search_engine_ray.pipelines.similarity import (
        ivf_assign_ds,
        train_ivf_centroids,
    )

    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_centroids, seed=seed)
    assigned = ivf_assign_ds(
        embeddings.select_columns(["vec_id", "embedding"]), centroids
    )

    def per_cluster(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        from search_engine_ray.util import embedding_matrix

        m = embedding_matrix(group.column("embedding").take(pa.array(order)))
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m.T
        # drop i iff any j < i (by vec_id) has cos >= threshold
        drop = (np.tril(sims, -1) >= threshold).any(axis=1)
        lid = group.column("list_id").to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "list_id": pa.array(lid, pa.int64()),
                "keep": pa.array(~drop, pa.bool_()),
            }
        )

    return assigned.groupby("list_id").map_groups(per_cluster, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# connected components over near-dup pairs (cluster id = component min)
# ---------------------------------------------------------------------------


def _subst_col(
    ds: rd.Dataset,
    col: str,
    keep: str,
    mapping: rd.Dataset,
    est_rows: int | None,
    track: bool = False,
) -> rd.Dataset:
    """Replace ``ds[col]`` by ``mapping.mv`` where ``mapping.mk == ds[col]``
    (identity where no mapping key matches) — a reduce-side hash join done
    with the module's coarse-bucket groupby shape instead of Acero (which
    crashes on empty blocks; see ``_pin_blocks``). ONE shuffle: both sides
    are bucketed on the join key, each bucket resolves lookups with one
    sorted-array ``np.searchsorted`` pass, no per-row Python. ``mapping.mk``
    must be unique (it is a groupby output everywhere this is used).
    ``track`` appends a ``_changed`` 0/1 column (value actually rewritten)
    so callers can detect a pointer-jumping fixpoint with one ``sum()``."""
    n_buckets = _n_pair_buckets()

    def tag_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": batch.column(col).cast(pa.int64()),
                "_x": batch.column(keep).cast(pa.int64()),
                "_side": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int8), pa.int8()
                ),
            }
        )

    def tag_map(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": batch.column("mk").cast(pa.int64()),
                "_x": batch.column("mv").cast(pa.int64()),
                "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def resolve(group: pa.Table) -> pa.Table:
        k = group.column("_k").to_numpy(zero_copy_only=False)
        x = group.column("_x").to_numpy(zero_copy_only=False)
        side = group.column("_side").to_numpy(zero_copy_only=False)
        is_map = side == 1
        mk, mv = k[is_map], x[is_map]
        order = np.argsort(mk)
        mk, mv = mk[order], mv[order]
        rk, rx = k[~is_map], x[~is_map]
        if len(mk):
            idx_c = np.minimum(np.searchsorted(mk, rk), len(mk) - 1)
            hit = mk[idx_c] == rk
            new = np.where(hit, mv[idx_c], rk)
        else:
            new = rk
        cols = {
            col: pa.array(new, pa.int64()),
            keep: pa.array(rx, pa.int64()),
        }
        if track:
            cols["_changed"] = pa.array((new != rk).astype(np.int64), pa.int64())
        return pa.table(cols)

    tagged = ds.map_batches(tag_rows, batch_format="pyarrow").union(
        mapping.map_batches(tag_map, batch_format="pyarrow")
    )
    return (
        _coalesced(tagged, est_rows)
        .map_batches(_bucketer("_k", n_buckets), batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(resolve, batch_format="pyarrow")
    )


def connected_components_ds(
    edges: rd.Dataset,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> rd.Dataset:
    """(node, cluster) for every node in ``edges``; cluster = the component's
    minimum node id — the canonical "pairs -> keep one doc per duplicate
    cluster" closure step missing from pairwise dedup (drop every node with
    node != cluster).

    Algorithm: min-hooking + pointer-jumping-to-fixpoint + edge contraction
    per round (the MapReduce CC family of Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public literature).
    Each round:

      h(u)   = min(u, min of u's neighbors)            (1 groupby shuffle)
      h      = h ∘ h, repeated until unchanged          (O(log chain) bucket
               — full pointer jumping: flattens the      joins, fixpoint
               hooking forest into stars                 detected by sum())
      E'     = {(h(u), h(v)) : (u,v) in E, h(u)!=h(v)}  (2 bucket-joins)
      labels = h(labels)                                (1 bucket-join)

    Labels only decrease; because h is flattened to a star before
    contracting, each round contracts every hooking tree entirely (an
    adversarial monotone path collapses in ONE round of log-many jumps),
    and supernode count at least halves per round — O(log n) rounds,
    O(log^2 n) shuffles worst case; near-dup graphs are near-cliques and
    finish in 1-2 rounds. Nothing but per-round row counts ever reaches the
    driver; every step is a bucketed shuffle of a geometrically shrinking
    dataset, so the shape survives corpus scale."""

    def norm(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table(
            {"u": pa.array(u[keep], pa.int64()), "v": pa.array(v[keep], pa.int64())}
        )

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("v"), "v": batch.column("u")})

    def nodes_rows(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch.column("u").to_numpy(zero_copy_only=False),
                batch.column("v").to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        arr = pa.array(both, pa.int64())
        return pa.table({"node": arr, "label": arr})

    empty_out = rd.from_arrow(
        pa.table({"node": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
    )
    E = edges.map_batches(norm, batch_format="pyarrow").materialize()
    n_edges = E.count()
    if stats is not None:
        stats["rounds"] = 0
    if not n_edges:
        return empty_out
    # distinct nodes, label = self (groupby dedups; Min of identical values)
    A = (
        E.map_batches(nodes_rows, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    n_nodes = A.count()

    for rnd in range(max_rounds):
        if stats is not None:
            stats["rounds"] = rnd + 1
        sym = E.union(E.map_batches(swap, batch_format="pyarrow"))
        h = (
            sym.groupby("u")
            .aggregate(Min("v", alias_name="mv"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "mk": b.column("u").cast(pa.int64()),
                        "mv": pa.array(
                            np.minimum(
                                b.column("u").to_numpy(zero_copy_only=False),
                                b.column("mv").to_numpy(zero_copy_only=False),
                            ),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # pointer jumping to fixpoint: h <- h∘h until nothing moves (flattens
        # the hooking forest into stars; log(chain height) iterations)
        for _ in range(max_rounds):
            h2 = _subst_col(
                h, "mv", "mk", h, est_rows=n_nodes, track=True
            ).materialize()
            moved = h2.sum("_changed")
            h = h2.drop_columns(["_changed"]).map_batches(
                lambda b: pa.table(
                    {"mk": b.column("mk").cast(pa.int64()), "mv": b.column("mv")}
                ),
                batch_format="pyarrow",
            ).materialize()
            if not moved:
                break
        else:
            raise RuntimeError("pointer jumping did not reach a fixpoint")
        A = _subst_col(A, "label", "node", h, est_rows=n_nodes).materialize()
        E = (
            _subst_col(
                _subst_col(E, "u", "v", h, est_rows=n_edges), "v", "u", h, n_edges
            )
            .map_batches(norm, batch_format="pyarrow")
            .materialize()
        )
        n_edges = E.count()
        if not n_edges:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    return A.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "cluster": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def cluster_representatives_ds(
    docs: rd.Dataset, edges: rd.Dataset
) -> rd.Dataset:
    """Quality-aware survivor selection: close near-dup edges into
    connected components, then keep the LONGEST doc per cluster (tie →
    min doc_id) — the production dedup policy (among near-duplicates the
    shortest copy is usually the truncated/boilerplate-stripped one, so
    min-id keep throws away content).

    Plan: ``connected_components_ds`` (bucketed, O(log n) rounds) → ONE
    hash-shuffle join attaches per-doc token counts (the docs side ships
    only (doc_id, n_tokens) — two int64 columns, never text; the cc side
    is duplicate-bounded) → per-cluster argmax via ``map_groups`` (group
    = one duplicate cluster, small by construction).

    Output: (doc_id, cluster_id, n_tokens, is_kept) for every clustered
    doc; singletons (docs in no cluster) are implicitly kept and not
    emitted, mirroring ``connected_components_ds``.

    Join strategy mirrors the minhash-verify pattern: when the cc map
    fits the broadcast bound (two int64 columns — ~16 MB at 1M clustered
    docs) it ships once via ``ray.put`` and each docs batch FILTERS to
    members before tokenizing (token counts are never computed for
    unclustered docs, which dominate a real corpus); above the bound the
    honest fallback is the distributed hash join of (doc_id, n_tokens)
    rows, same semantics."""
    from search_engine_ray.functions.textstats import token_counts

    cc = connected_components_ds(edges).materialize()  # (node, cluster)

    def best(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        winner = node[np.lexsort((node, -n))[0]]
        return pa.table(
            {
                "doc_id": pa.array(node, pa.int64()),
                "cluster_id": group.column("cluster").cast(pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "is_kept": pa.array((node == winner).astype(np.int64), pa.int64()),
            }
        )

    if cc.count() <= _BROADCAST_CC_ROWS:
        tables = [t for t in ray.get(cc.to_arrow_refs()) if t.num_rows]
        if not tables:
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "cluster_id": pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64()),
                        "is_kept": pa.array([], pa.int64()),
                    }
                )
            )
        tbl = pa.concat_tables(tables).combine_chunks()
        nodes = tbl.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        labels = tbl.column("cluster").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(nodes)
        cc_ref = ray.put((nodes[o], labels[o]))

        def attach(batch: pa.Table) -> pa.Table:
            ns, ls = ray.get(cc_ref)
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(ns, ids)
            pos[pos >= len(ns)] = 0
            hit = ns[pos] == ids
            if not hit.any():
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64()),
                    }
                )
            sub = batch.filter(pa.array(hit))  # tokenize MEMBERS only
            return pa.table(
                {
                    "node": pa.array(ids[hit], pa.int64()),
                    "cluster": pa.array(ls[pos[hit]], pa.int64()),
                    "n_tokens": pa.array(
                        token_counts(sub.column("text")), pa.int64()
                    ),
                }
            )

        joined = docs.map_batches(attach, batch_format="pyarrow")
    else:

        def tok_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("doc_id").cast(pa.int64()),
                    "n_tokens": pa.array(
                        token_counts(batch.column("text")), pa.int64()
                    ),
                }
            )

        lens = docs.map_batches(tok_rows, batch_format="pyarrow")
        joined = cc.join(
            lens,
            join_type="inner",
            num_partitions=_join_partitions(),
            on=("node",),
        )

    return joined.groupby("cluster").map_groups(best, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicate n-gram SPAN REMOVAL (Lee et al. 2022 exact-substring dedup,
# at k-token-window granularity)
# ---------------------------------------------------------------------------


def dedup_spans_ds(docs: rd.Dataset, k: int = 3, min_count: int = 2) -> rd.Dataset:
    """Rewrite every doc with tokens covered by any CORPUS-DUPLICATED
    k-gram removed (the actionable form of the Lee et al. 2022
    exact-substring dedup: dup_ngram_stats_ds measures the signal, this op
    cuts the spans). A k-gram is duplicated when it occurs >= min_count
    times corpus-wide (including within one doc). Docs shorter than k
    tokens have no k-grams and pass through unchanged.

    Scale shape — two bucketed shuffles, zero driver state, no joins:
    (1) positional (doc_id, pos, shingle-string) rows stream out of one
    vectorized map_batches, bucketed on hash(shingle) so every occurrence
    of a gram lands in one bucket; within the bucket one dictionary-encode
    + bincount finds the duplicated grams and emits ONLY their (doc_id,
    pos) rows (equality on strings — the hash is internal partitioning,
    collisions cannot corrupt). (2) the coverage rows and the docs rows
    are co-bucketed on doc_id (reduce-side join); each bucket re-tokenizes
    its docs once, turns coverage into a flat boolean mask ([pos, pos+k)
    per row), and rebuilds the surviving tokens into one string per doc
    with a vectorized list reconstruction + binary_join — no per-doc
    Python in either phase. Payload note: doc text rides the second
    shuffle once; at crawl scale that is the same bytes the docs stage
    already moves, and coverage rows are only emitted for duplicated
    grams."""
    from search_engine_ray.functions.textstats import positional_shingle_strings
    from search_engine_ray.stages.postings import _hash_utf8_array

    n_buckets = _n_pair_buckets()

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        p, pos, sh = positional_shingle_strings(text, k)
        enc = sh.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        h = _hash_utf8_array(enc.dictionary)
        bkt = (
            (h[codes] % np.uint64(n_buckets)).astype(np.int64)
            if len(codes)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[p], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "sh": sh,
                "_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def dup_positions(group: pa.Table) -> pa.Table:
        sh = group.column("sh")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        enc = sh.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        dup = cnt[codes] >= min_count
        return pa.table(
            {
                "doc_id": group.column("doc_id").filter(pa.array(dup)),
                "pos": group.column("pos").filter(pa.array(dup)),
            }
        )

    coverage = (
        docs.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(dup_positions, batch_format="pyarrow")
    )

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "pos": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "text": batch.column("text"),
            }
        )

    def tag_cov(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "pos": batch.column("pos").cast(pa.int64()),
                "text": pa.array([""] * n, pa.string()),
            }
        )

    def rebuild(group: pa.Table) -> pa.Table:
        from search_engine_ray.functions.textstats import token_lists

        pos_all = group.column("pos").to_numpy(zero_copy_only=False)
        is_doc = pos_all == -1
        d_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        texts = group.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        doc_order = np.flatnonzero(is_doc)
        ids = d_ids[doc_order]
        o = np.argsort(ids)
        doc_order, ids = doc_order[o], ids[o]
        texts = texts.take(pa.array(doc_order))
        toks = token_lists(texts)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        covered = np.zeros(len(flat), dtype=bool)
        c_ids = d_ids[~is_doc]
        c_pos = pos_all[~is_doc]
        if len(c_ids):
            di = np.searchsorted(ids, c_ids)
            base = offs[di] + c_pos
            idx = (base[:, None] + np.arange(k)[None, :]).ravel()
            covered[idx] = True
        kept = ~covered
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        kept_counts = np.bincount(parents[kept], minlength=len(ids)).astype(np.int64)
        new_offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=new_offs[1:])
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()).cast(pa.int32()),
            flat.filter(pa.array(kept)),
        )
        clean = pc.binary_join(kept_list, " ")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": clean,
                "n_removed": pa.array(lens - kept_counts, pa.int64()),
            }
        )

    tagged = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        coverage.map_batches(tag_cov, batch_format="pyarrow")
    )
    return (
        tagged.map_batches(_bucketer("doc_id", n_buckets), batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def chunk_dedup_ds(
    docs: rd.Dataset,
    chunk_tokens: int = 32,
    stride: int = 16,
    method: str = "fixed",
    cdc_k: int = 2,
    cdc_modulus: int = 8,
    cdc_hash_method: str = "md5",
) -> rd.Dataset:
    """Chunk-level exact dedup (the paragraph-dedup analogue for corpora
    whose docs are single blocks): chunk every doc, md5 the chunk texts,
    and report every chunk that appears more than once — (fp, n_copies,
    keep_doc_id, keep_chunk_id), keeper = lexicographic-min
    (doc_id, chunk_id).

    ``method="fixed"`` uses the overlapping token windows of
    ``text.chunk_docs_ds``; ``method="cdc"`` uses the content-defined
    boundaries of ``text.cdc_chunk_docs_ds`` — the edit-robust variant:
    a shared passage embedded at DIFFERENT offsets in two docs still
    yields identical chunks, which fixed windows only match at aligned
    offsets.

    Scale shape: chunking is a no-shuffle map; the dedup is ONE groupby
    keyed by a coarse hash BUCKET of the digest (not the digest itself —
    at crawl scale duplicated fingerprints number in the billions, and a
    per-fingerprint ``map_groups`` UDF would mean one Python call each;
    r4 verdict item 5). Every fingerprint lands wholly in one bucket, and
    each bucket resolves ALL its groups in one vectorized
    lexsort + run-length pass (the ``sparse_knn`` in-bucket pattern);
    only duplicated groups emit, hex reconstructed with one whole-buffer
    ``hexlify``."""
    import binascii

    from search_engine_ray.functions.textstats import md5_digests_arrow
    from search_engine_ray.pipelines.text import cdc_chunk_docs_ds, chunk_docs_ds

    if method == "cdc":
        # default cdc_hash_method="md5" keeps the SQL-oracle contract
        # (cdc_dedup); pass "fast" at crawl scale for the zero-Python
        # boundary hash — dedup correctness is method-agnostic
        chunks = cdc_chunk_docs_ds(
            docs, k=cdc_k, modulus=cdc_modulus, hash_method=cdc_hash_method
        )
    elif method == "fixed":
        chunks = chunk_docs_ds(docs, chunk_tokens=chunk_tokens, stride=stride)
    else:
        raise ValueError(f"unknown chunking method {method!r}")

    n_buckets = _n_pair_buckets()

    def fp(batch: pa.Table) -> pa.Table:
        d = md5_digests_arrow(batch.column("chunk_text"))
        h = d.view(">u8")
        h1 = h[:, 0].astype(np.uint64)
        return pa.table(
            {
                "_bkt": pa.array(
                    (h1 % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h[:, 1].astype(np.uint64).view(np.int64), pa.int64()),
                "doc_id": batch.column("doc_id"),
                "chunk_id": batch.column("chunk_id"),
            }
        )

    def bucket_dups(group: pa.Table) -> pa.Table:
        """ALL fingerprint groups of one bucket in one vectorized pass."""
        empty = pa.table(
            {
                "fp": pa.array([], pa.string()),
                "n_copies": pa.array([], pa.int64()),
                "keep_doc_id": pa.array([], pa.int64()),
                "keep_chunk_id": pa.array([], pa.int64()),
            }
        )
        n = len(group)
        if n < 2:
            return empty
        h1 = group.column("h1").to_numpy(zero_copy_only=False)
        h2 = group.column("h2").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        c = group.column("chunk_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, d, h2, h1))
        h1s, h2s, ds, cs = h1[order], h2[order], d[order], c[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        dup = lens >= 2
        if not dup.any():
            return empty
        gs = starts[dup]  # rows sorted (d, c) within a group -> lex-min
        dig = np.empty((len(gs), 2), dtype=np.int64)
        dig[:, 0] = h1s[gs]
        dig[:, 1] = h2s[gs]
        hex_all = binascii.hexlify(dig.view(np.uint64).byteswap().tobytes())
        fps = np.frombuffer(hex_all, dtype="S32").astype("U32")
        return pa.table(
            {
                "fp": pa.array(fps, pa.string()),
                "n_copies": pa.array(lens[dup], pa.int64()),
                "keep_doc_id": pa.array(ds[gs], pa.int64()),
                "keep_chunk_id": pa.array(cs[gs], pa.int64()),
            }
        )

    return (
        chunks.map_batches(fp, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_dups, batch_format="pyarrow")
    )


def dup_rate_by_source_ds(docs: rd.Dataset) -> rd.Dataset:
    """Per-source duplication report — the corpus-quality dashboard row:
    for each ``source``, how many docs it contributed and how many of
    them are exact-text duplicates of an earlier doc (not the min-doc_id
    keeper of their text group).

    Scale shape: ONE groupby keyed by a coarse digest BUCKET (the
    ``chunk_dedup_ds`` plan — a per-fingerprint ``map_groups`` UDF would
    cost one Python call per duplicated text at crawl scale); each bucket
    resolves all its fingerprint groups with one lexsort + run-length
    pass (a row is a dup iff it is not its group's min-doc_id row) and
    emits per-source partial counts via two bincounts, then a tiny
    groupby-sum over sources. Exact integers end-to-end."""
    from search_engine_ray.functions.textstats import md5_digests_arrow

    n_buckets = _n_pair_buckets()

    def fp(batch: pa.Table) -> pa.Table:
        d = md5_digests_arrow(batch.column("text"))
        h = d.view(">u8")
        h1 = h[:, 0].astype(np.uint64)
        return pa.table(
            {
                "_bkt": pa.array(
                    (h1 % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h[:, 1].astype(np.uint64).view(np.int64), pa.int64()),
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
            }
        )

    def bucket_rates(group: pa.Table) -> pa.Table:
        h1 = group.column("h1").to_numpy(zero_copy_only=False)
        h2 = group.column("h2").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        s = group.column("source")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        enc = s.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(h1)
        order = np.lexsort((d, h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.ones(n, dtype=bool)  # group keeper: min doc_id, sorted in
        first[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        cs = codes[order]
        n_src = len(enc.dictionary)
        n_docs = np.bincount(cs, minlength=n_src)
        n_dups = np.bincount(cs[~first], minlength=n_src)
        return pa.table(
            {
                "source": enc.dictionary,
                "n_docs": pa.array(n_docs.astype(np.int64), pa.int64()),
                "n_dups": pa.array(n_dups.astype(np.int64), pa.int64()),
            }
        )

    return (
        docs.map_batches(fp, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(bucket_rates, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_dups", alias_name="n_dups"),
        )
    )
