"""Deduplication pipelines — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding near-dup.

Distributed shapes:
- exact: hash-partition by text fingerprint -> per-group min(doc_id) winner
  (groupby, the D2 url-dedup pattern at corpus scale).
- n-gram Jaccard: shingle explode -> groupby(shingle) -> within-bucket pair
  emit -> groupby(pair) intersection counts -> jaccard = |I| / (|A|+|B|-|I|)
  with per-doc shingle counts broadcast. Exact, no probabilistic step —
  doubles as the verifier for MinHash.
- MinHash+LSH: per-doc signature (vectorized universal hashing) -> band
  explode -> groupby(band bucket) -> candidate pairs -> exact-jaccard verify.
- SimHash: 64-bit signature per doc; near-dup pairs via 4x16-bit band
  blocking (Hamming <= 3 guaranteeed caught by pigeonhole).
- embedding near-dup: normalized matmul per batch against a broadcast
  matrix (small side) — or all-pairs within LSH buckets at scale.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from search_engine_ray.functions.textstats import (
    band_keys,
    jaccard,
    md5_fingerprints,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
    token_lists,
)


def exact_dedup_ds(docs: rd.Dataset) -> rd.Dataset:
    """Winners of exact-text dedup: min doc_id per distinct text (D2)."""

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fp": pa.array(
                    md5_fingerprints(batch.column("text").to_pylist()), pa.string()
                ),
                "doc_id": batch.column("doc_id"),
            }
        )

    return (
        docs.map_batches(fp, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"))
    )


def _shingle_rows(batch: pa.Table, k: int) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    toks = token_lists(batch.column("text")).to_pylist()
    out_s: list[int] = []
    out_d: list[int] = []
    counts: list[int] = []
    for d, words in zip(ids, toks):
        hs = shingle_hashes([w.lower() for w in words], k)
        out_s.extend(int(h) for h in hs)
        out_d.extend([d] * len(hs))
        counts.append(len(hs))
    return pa.table(
        {
            "shingle": pa.array(out_s, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
        }
    ), pa.table({"doc_id": pa.array(ids, pa.int64()), "n_shingles": pa.array(counts, pa.int64())})


def ngram_jaccard_pairs_ds(
    docs: rd.Dataset, k: int = 3, threshold: float = 0.8
) -> rd.Dataset:
    """Exact k-token-shingle Jaccard pairs >= threshold (doc_a < doc_b).

    Shuffle-count analysis: shingle explode is the wide step; the pair-emit
    inside a shingle group is quadratic in group size, so genuinely hot
    shingles should be dropped via ``max_group`` at crawl scale (kept exact
    here for oracle parity)."""

    def shingles(batch: pa.Table) -> pa.Table:
        s, _ = _shingle_rows(batch, k)
        return s

    def n_shingles(batch: pa.Table) -> pa.Table:
        _, n = _shingle_rows(batch, k)
        return n

    shingle_ds = docs.map_batches(shingles, batch_format="pyarrow")
    counts = docs.map_batches(n_shingles, batch_format="pyarrow")
    n_by_doc = {
        r["doc_id"]: r["n_shingles"] for r in counts.take_all()
    }  # narrow: one int per doc
    n_ref = ray.put(n_by_doc)

    def pairs_in_group(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
            }
        )

    inter = (
        shingle_ds.groupby("shingle")
        .map_groups(pairs_in_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_inter"))
    )

    def score(batch: pa.Table) -> pa.Table:
        n = ray.get(n_ref)
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        ni = batch.column("n_inter").to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([n[x] for x in a], dtype=np.float64)
        nb = np.array([n[x] for x in b], dtype=np.float64)
        jac = ni / (na + nb - ni)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 4)),
            }
        )

    return inter.map_batches(score, batch_format="pyarrow")


class _MinhashBands:
    """Actor-pool stage: doc -> LSH band rows (band_id, band_key, doc_id).
    Permutation params generated once per actor (seeded, identical)."""

    def __init__(self, num_perm: int, bands: int, k: int) -> None:
        self.a, self.b = minhash_params(num_perm)
        self.bands = bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        toks = token_lists(batch.column("text")).to_pylist()
        band_id: list[int] = []
        band_key: list[int] = []
        doc_out: list[int] = []
        for d, words in zip(ids, toks):
            hs = shingle_hashes([w.lower() for w in words], self.k)
            sig = minhash_signature(hs, self.a, self.b)
            for bi, bk in enumerate(band_keys(sig, self.bands)):
                band_id.append(bi)
                band_key.append(bk)
                doc_out.append(d)
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int64()),
                "band_key": pa.array(band_key, pa.int64()),
                "doc_id": pa.array(doc_out, pa.int64()),
            }
        )


def minhash_lsh_pairs_ds(
    docs: rd.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
    threshold: float = 0.8,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Candidate pairs from LSH banding, verified with EXACT shingle Jaccard.

    Verification broadcasts doc -> shingle set (fine for conformance scale;
    at crawl scale the verify becomes a repartition join on doc_id —
    documented partitioning assumption)."""
    shingle_sets = {}
    for row in docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "shingles": pa.array(
                    [
                        shingle_hashes([w.lower() for w in ws], k).tolist()
                        for ws in token_lists(b.column("text")).to_pylist()
                    ],
                    pa.list_(pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    ).take_all():
        shingle_sets[row["doc_id"]] = np.array(sorted(row["shingles"]), dtype=np.uint64)
    sets_ref = ray.put(shingle_sets)

    if concurrency is None:
        from search_engine_ray.util import default_pool_size

        concurrency = default_pool_size()
    bands_ds = docs.map_batches(
        _MinhashBands,
        fn_constructor_args=(num_perm, bands, k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a_out, pa.int64()), "doc_b": pa.array(b_out, pa.int64())}
        )

    cand = (
        bands_ds.groupby(["band_id", "band_key"])
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
    )

    def verify(batch: pa.Table) -> pa.Table:
        sets = ray.get(sets_ref)
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        keep_a, keep_b, jac = [], [], []
        for x, y in zip(a, b):
            j = jaccard(sets[x], sets[y])
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                jac.append(round(j, 4))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def simhash_ds(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, simhash) 64-bit signatures."""

    def f(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch.column("text")).to_pylist()
        sigs = [simhash64([w.lower() for w in ws]) for ws in toks]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(np.array(sigs, dtype=np.uint64).astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def simhash_neardup_pairs_ds(docs: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash banding: 4 x 16-bit bands; any pair within
    Hamming distance 3 shares at least one exact band (pigeonhole)."""
    sig_ds = simhash_ds(docs)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = batch.column("simhash").to_pylist()
        band_id, band_val, d_out, s_out = [], [], [], []
        for d, s in zip(ids, sigs):
            u = s & 0xFFFFFFFFFFFFFFFF
            for bi in range(4):
                band_id.append(bi)
                band_val.append((u >> (16 * bi)) & 0xFFFF)
                d_out.append(d)
                s_out.append(s)
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int64()),
                "band_val": pa.array(band_val, pa.int64()),
                "doc_id": pa.array(d_out, pa.int64()),
                "simhash": pa.array(s_out, pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("doc_id").to_pylist(), group.column("simhash").to_pylist())
        )
        a_out, b_out, ham = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                h = bin((rows[i][1] ^ rows[j][1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if h <= max_hamming:
                    a_out.append(rows[i][0])
                    b_out.append(rows[j][0])
                    ham.append(h)
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(ham, pa.int64()),
            }
        )

    return (
        sig_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


def embedding_neardup_pairs_ds(
    embeddings: rd.Dataset, threshold: float = 0.95
) -> rd.Dataset:
    """Cosine >= threshold pairs (vec_a < vec_b): per-batch matmul against a
    broadcast normalized matrix (small side broadcast, ray.put once)."""
    rows = embeddings.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def f(batch) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        v_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        v = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = v @ all_mat.T
        a_out, b_out, s_out = [], [], []
        for i, vid in enumerate(v_ids):
            hit = np.flatnonzero((sims[i] >= threshold) & (all_ids > vid))
            for j in hit:
                a_out.append(int(vid))
                b_out.append(int(all_ids[j]))
                s_out.append(round(float(sims[i, j]), 4))
        return pa.table(
            {
                "vec_a": pa.array(a_out, pa.int64()),
                "vec_b": pa.array(b_out, pa.int64()),
                "cosine": pa.array(s_out, pa.float64()),
            }
        )

    return embeddings.map_batches(f, batch_format="pyarrow")
