"""Similarity search over the embeddings table.

- Brute-force cosine top-k: the exactness baseline — numpy matmul per batch
  against the broadcast query matrix (ray.put once, read per actor).
- LSH-bucketed (random hyperplane) variant: the scale path — candidates only
  from matching buckets, verified/ranked by true cosine. Recall vs brute
  force is measured in tests (probabilistic but deterministic via seed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def read_embeddings(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    m = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, m


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_cosine_topk_ds(
    embeddings: rd.Dataset, queries: np.ndarray, query_ids: list[int], k: int = 10
) -> rd.Dataset:
    """Top-k (query_id, vec_id, cosine) per query vector — exact.

    Per-batch partial top-k (vectorized argpartition) then a final global
    top-k per query: the combiner pattern; only n_batches*k rows shuffle."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        sims = _normalize(m) @ qm.T  # (n_vec, n_query)
        kk = min(k, len(ids))
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids)):
            top = np.argpartition(-sims[:, j], kk - 1)[:kk]
            out_q.extend([int(qids[j])] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend(sims[top, j].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        q = group.column("query_id")[0].as_py()
        order = np.lexsort((v, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array([q] * len(order), pa.int64()),
                "vec_id": pa.array(v[order], pa.int64()),
                "cosine": pa.array(np.round(s[order], 4), pa.float64()),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


class _LshBucketer:
    """Random-hyperplane LSH: bucket = sign bits of (v @ planes)."""

    def __init__(self, dim: int, n_planes: int, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def key(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)

    def multiprobe_keys(self, m: np.ndarray, probe_bits: int = 1) -> list[np.ndarray]:
        """Exact key plus all <=probe_bits-bit-flip neighbors (multi-probe)."""
        base = self.key(m)
        n = self.planes.shape[1]
        out = [base]
        if probe_bits >= 1:
            out += [base ^ (1 << i) for i in range(n)]
        if probe_bits >= 2:
            out += [
                base ^ (1 << i) ^ (1 << j)
                for i in range(n)
                for j in range(i + 1, n)
            ]
        return out


def lsh_cosine_topk_ds(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    probe_bits: int = 2,
    seed: int = 42,
) -> rd.Dataset:
    """Approximate top-k: only vectors whose LSH bucket matches one of the
    query's multi-probe buckets are scored. Same output schema as brute
    force; recall measured in tests."""
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qm.shape[1]
    bucketer = _LshBucketer(dim, n_planes, seed)
    q_keys = set()
    for karr in bucketer.multiprobe_keys(qm, probe_bits):
        q_keys.update(int(x) for x in karr)
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, q_keys))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, keys = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        mn = _normalize(m)
        vk = bucketer.key(mn)
        mask = np.array([int(x) in keys for x in vk], dtype=bool)
        if not mask.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids, mn = ids[mask], mn[mask]
        sims = mn @ qmat.T
        kk = min(k, len(ids))
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids)):
            top = np.argpartition(-sims[:, j], kk - 1)[:kk]
            out_q.extend([int(qids[j])] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend(sims[top, j].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        q = group.column("query_id")[0].as_py()
        order = np.lexsort((v, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array([q] * len(order), pa.int64()),
                "vec_id": pa.array(v[order], pa.int64()),
                "cosine": pa.array(np.round(s[order], 4), pa.float64()),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )
