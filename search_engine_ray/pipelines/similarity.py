"""Similarity search over the embeddings table.

- Brute-force cosine top-k: the exactness baseline — numpy matmul per batch
  against the broadcast query matrix (ray.put once, read per actor).
- LSH-bucketed (random hyperplane) variant: the scale path — candidates only
  from matching buckets, verified/ranked by true cosine. Recall vs brute
  force is measured in tests (probabilistic but deterministic via seed).
- IVF (inverted-file) variant: k-means coarse quantizer trained on a
  bounded sample, vectors assigned to their nearest centroid list, queries
  probe the nprobe nearest lists. The classic ANN scale path (one coarse
  pass over centroids + exact cosine within probed lists).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def read_embeddings(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from search_engine_ray.util import embedding_matrix

    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    return ids, embedding_matrix(batch.column("embedding"))


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


def _make_final_topk(k: int):
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

    return final_topk


def train_ivf_centroids(
    embeddings: rd.Dataset,
    n_centroids: int = 64,
    sample_n: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means on a BOUNDED sample (the standard IVF training
    recipe — the sample is the small side; the corpus itself never leaves
    the cluster). Returns normalized (n_centroids, dim) centroids."""
    rows = embeddings.select_columns(["embedding"]).limit(sample_n).take_all()
    m = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    rng = np.random.default_rng(seed)
    n_c = min(n_centroids, len(m))
    cent = m[rng.choice(len(m), size=n_c, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(n_c):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign_ds(embeddings: rd.Dataset, centroids: np.ndarray) -> rd.Dataset:
    """+ list_id column: nearest-centroid assignment (broadcast centroids).
    Writing this partitioned by list_id IS the IVF index layout."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(batch: pa.Table) -> pa.Table:
        cent = ray.get(c_ref)
        _, m = _to_matrix(batch)
        lid = np.argmax(_normalize(m) @ cent.T, axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lid, pa.int64()))

    return embeddings.map_batches(f, batch_format="pyarrow")


def ivf_cosine_topk_ds(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> rd.Dataset:
    """Approximate top-k via IVF probing: each query scores only vectors
    whose list_id is among its nprobe nearest centroids. Same schema and
    combiner shape as brute force; recall measured in tests."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_centroids, seed=seed)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.argsort(-(qm @ centroids.T), axis=1)[:, : min(nprobe, len(centroids))]
    q_ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), qm, centroids, probed)
    )

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, cent, probes = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        mn = _normalize(m)
        lid = np.argmax(mn @ cent.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids)):
            sel = np.isin(lid, probes[j])
            if not sel.any():
                continue
            sims = mn[sel] @ qmat[j]
            sids = ids[sel]
            kk = min(k, len(sids))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([int(qids[j])] * len(top))
            out_v.extend(sids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_make_final_topk(k), batch_format="pyarrow")
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


def knn_join_ds(
    embeddings: rd.Dataset,
    queries: rd.Dataset,
    k: int = 10,
    exclude_self: bool = True,
) -> rd.Dataset:
    """kNN JOIN: for EACH row of ``queries`` (vec_id, embedding), the top-k
    cosine neighbors in ``embeddings`` — the table-vs-table form of
    :func:`brute_force_cosine_topk_ds` and the primitive behind kNN graphs
    (SemDeDup neighborhoods, kNN-LM retrieval, label propagation).

    Scale shape: the QUERY side must be the bounded side (a probe set, an
    eval set, a filtered subset) — it is materialized once on the driver
    and broadcast via ``ray.put`` (the small-side-broadcast join rule); the
    corpus side streams, scored one zero-copy Arrow batch at a time with a
    fully vectorized all-queries argpartition, and only k*n_batches rows
    per query reach the final per-query top-k. For a corpus-sized left
    side, bucket both sides with IVF (``train_ivf_centroids`` +
    ``ivf_assign_ds``) and run per-list joins instead — same combiner.

    ``exclude_self`` drops corpus rows whose vec_id equals the query's
    (the self-match every kNN-graph use case discards)."""
    rows = queries.select_columns(["vec_id", "embedding"]).take_all()
    if not rows:
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        )
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    qm = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    q_ref = ray.put((qids, qm))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qmat = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        sims = _normalize(m) @ qmat.T  # (n_vec, n_query)
        if exclude_self:
            sims = np.where(ids[:, None] == qi[None, :], -np.inf, sims)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, n_query)
        vec = ids[top].T.ravel()  # query-major
        sim = np.take_along_axis(sims, top, axis=0).T.ravel()
        qcol = np.repeat(qi, kk)
        keep = np.isfinite(sim)  # masked self-matches that slipped into top
        return pa.table(
            {
                "query_id": pa.array(qcol[keep], pa.int64()),
                "vec_id": pa.array(vec[keep], pa.int64()),
                "cosine": pa.array(sim[keep], pa.float64()),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_make_final_topk(k), batch_format="pyarrow")
    )


def embedding_stats_ds(embeddings: rd.Dataset, q_bits: int = 16) -> rd.Dataset:
    """Per-dimension mean and variance over the embedding column — the
    sanity/monitoring pass every embedding pipeline runs before whitening
    or indexing (collapsed dims, scale drift between snapshots).

    Values are quantized per ELEMENT to ``floor(x * 2^q_bits + 0.5)``
    int64 (computed in float64; floor is tie-mode-free, unlike round whose
    half-even/half-away convention differs between numpy and SQL engines)
    and summed as exact integers, so the result is independent of
    summation order (distributed vs sequential) and oracle-checkable
    bit-for-bit:
    mean/var are single IEEE divisions on the integer sums. int64 sum of
    squares stays exact to ~2^63: with |x| <= 8 and q_bits=16 that is
    ~3e7 rows per dimension; lower ``q_bits`` for larger corpora (the
    quantization error 2^-q_bits is far below any drift of interest).

    Output: one row per dim — (dim, n, s_q, ssq_q, mean, var), where
    mean = s_q / (n * 2^q)  and  var = (n*ssq_q - s_q^2) / (n^2 * 2^2q)
    (population variance)."""
    scale = float(1 << q_bits)

    def partial(batch: pa.Table) -> pa.Table:
        _, m = _to_matrix(batch)
        q = np.floor(m * scale + 0.5).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(q.shape[1], dtype=np.int64), pa.int64()),
                "pn": pa.array(np.full(q.shape[1], q.shape[0], np.int64), pa.int64()),
                "ps": pa.array(q.sum(axis=0), pa.int64()),
                "pq": pa.array((q * q).sum(axis=0), pa.int64()),
            }
        )

    agg = (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("ps", alias_name="s_q"),
            Sum("pq", alias_name="ssq_q"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("s_q").to_numpy(zero_copy_only=False).astype(np.float64)
        ss = batch.column("ssq_q").to_numpy(zero_copy_only=False).astype(np.float64)
        mean = s / (n * scale)
        var = (n * ss - s * s) / (n * n * scale * scale)
        return pa.table(
            {
                "dim": batch.column("dim"),
                "n": batch.column("n"),
                "s_q": batch.column("s_q"),
                "ssq_q": batch.column("ssq_q"),
                "mean": pa.array(mean, pa.float64()),
                "var": pa.array(var, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("dim")


def whiten_embeddings_ds(
    embeddings: rd.Dataset, eps: float = 1e-6
) -> rd.Dataset:
    """PCA-whitening of the embedding column: x -> W^T (x - mu) with
    W = V diag(1/sqrt(lambda + eps)) from the eigendecomposition of the
    d x d covariance — the standard preconditioner before cosine dedup /
    clustering (SemDeDup et al. whiten first so no direction dominates).

    Scale shape: mean and covariance come from one streaming pass of
    per-batch partials (d-vector sum + d x d X^T X, shipped FLATTENED as
    one row per batch — d^2 floats, never the data); the driver does the
    d x d eigh (microseconds) and broadcasts (mu, W) via ray.put; the
    projection is a second streaming pass, one matmul per batch. Nothing
    doc-scale materializes; float covariance partials are order-sensitive
    in the last bits, which whitening (a conditioning transform, not an
    oracle-pinned statistic) tolerates by design — pinned in tests against
    the sequential numpy reference to ~1e-10."""

    def cov_partial(batch: pa.Table) -> pa.Table:
        _, m = _to_matrix(batch)
        d = m.shape[1]
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "xtx": pa.array([(m.T @ m).ravel()], pa.list_(pa.float64())),
                "d": pa.array([d], pa.int64()),
            }
        )

    parts = embeddings.map_batches(cov_partial, batch_format="pyarrow").take_all()
    # bounded: one row per input block (n_blocks x (d^2+d) floats)
    n = sum(p["n"] for p in parts)
    d = int(parts[0]["d"])
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    xtx = np.sum([np.asarray(p["xtx"]).reshape(d, d) for p in parts], axis=0)
    mu = s / n
    cov = xtx / n - np.outer(mu, mu)
    lam, vec = np.linalg.eigh(cov)
    w = vec @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))
    ref = ray.put((mu, w))

    def project(batch: pa.Table) -> pa.Table:
        mu_b, w_b = ray.get(ref)
        ids, m = _to_matrix(batch)
        y = (m - mu_b) @ w_b
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "white": pa.array(list(y.astype(np.float32)), pa.list_(pa.float32())),
            }
        )

    return embeddings.map_batches(project, batch_format="pyarrow")


def group_centroid_ds(
    embeddings: rd.Dataset,
    key_col: str = "label",
    q_bits: int = 16,
) -> rd.Dataset:
    """Per-group embedding centroids (class prototypes / domain mixture
    centers): the mean vector of each ``key_col`` group, one row per
    (key, dim) — the nearest-class-mean primitive behind prototype
    classification, cluster seeding, and per-domain embedding drift
    monitoring.

    Same exactness contract as :func:`embedding_stats_ds`: elements are
    quantized ``floor(x * 2^q_bits + 0.5)`` int64 and summed exactly, so
    the centroid is order-independent and oracle-checkable bit-for-bit;
    the mean is one IEEE division on the integer sums. Per batch ships
    n_keys x d partial rows (keys x dims bounded), never the vectors."""
    scale = float(1 << q_bits)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        _, m = _to_matrix(batch)
        q = np.floor(m * scale + 0.5).astype(np.int64)
        enc = keys.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        nk, d = len(enc.dictionary), q.shape[1]
        s = np.zeros((nk, d), np.int64)
        np.add.at(s, codes, q)
        cnt = np.bincount(codes, minlength=nk).astype(np.int64)
        return pa.table(
            {
                key_col: pa.concat_arrays(
                    [enc.dictionary.cast(pa.int64())] * d
                ) if d else enc.dictionary.cast(pa.int64()),
                "dim": pa.array(np.repeat(np.arange(d, dtype=np.int64), nk), pa.int64()),
                "pn": pa.array(np.tile(cnt, d), pa.int64()),
                "ps": pa.array(s.T.ravel(), pa.int64()),
            }
        )

    agg = (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "dim"])
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("ps", alias_name="s_q"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("s_q").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "dim": batch.column("dim"),
                "n": batch.column("n"),
                "s_q": batch.column("s_q"),
                "mean": pa.array(s / (n * scale), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort([key_col, "dim"])


def mmr_rerank_ds(
    embeddings: rd.Dataset,
    query: np.ndarray,
    query_id: int = 0,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
) -> rd.Dataset:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR'98):
    diversify a cosine top-``pool`` candidate set down to ``k`` results by
    greedily maximizing ``lam * sim(q, d) - (1 - lam) * max sim(d, S)``
    over the already-selected set S; ties break on vec_id.

    Scale shape: candidate generation is the distributed part — the exact
    per-batch partial top-``pool`` of ``brute_force_cosine_topk_ds``
    (combiner pattern, only n_batches * pool rows shuffle, the corpus
    streams). The greedy re-rank itself is O(pool^2) on the driver over a
    BOUNDED pool (pool << corpus; 50-500 in practice), the standard
    serving-side shape for MMR — the quadratic term never touches corpus
    size. Output: (query_id, vec_id, mmr_rank, relevance), rank 1..k.
    """
    cand = brute_force_cosine_topk_ds(
        embeddings, np.asarray(query, dtype=np.float64)[None, :], [query_id], k=pool
    ).to_pandas()
    cand = cand.sort_values(["cosine", "vec_id"], ascending=[False, True])
    ids = cand["vec_id"].to_numpy()
    id_set = set(ids.tolist())

    def fetch(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.array([x in id_set for x in v.tolist()], dtype=bool)
        return batch.filter(pa.array(keep))

    sub = embeddings.map_batches(fetch, batch_format="pyarrow").to_pandas()
    # bounded: at most ``pool`` rows reach the driver
    from search_engine_ray.util import embedding_matrix

    vecs = _normalize(
        embedding_matrix(pa.chunked_array([pa.array(sub["embedding"].tolist())]))
    )
    pos = {int(v): i for i, v in enumerate(sub["vec_id"].tolist())}
    m = np.stack([vecs[pos[int(v)]] for v in ids])
    # relevance recomputed EXACTLY from the fetched vectors — the candidate
    # stage's 4-dp-rounded cosines would perturb close MMR decisions
    qn = np.asarray(query, dtype=np.float64)
    qn = qn / max(np.linalg.norm(qn), 1e-12)
    rel = m @ qn
    inter = m @ m.T  # (pool, pool) candidate-candidate cosines
    n = len(ids)
    selected: list[int] = []
    chosen = np.zeros(n, dtype=bool)
    out_rank, out_id, out_rel = [], [], []
    for step in range(min(k, n)):
        if selected:
            div = inter[:, selected].max(axis=1)
        else:
            div = np.zeros(n)
        score = lam * rel - (1.0 - lam) * div
        score[chosen] = -np.inf
        best = int(np.lexsort((ids, -score))[0])
        chosen[best] = True
        selected.append(best)
        out_rank.append(step + 1)
        out_id.append(int(ids[best]))
        out_rel.append(float(rel[best]))
    return rd.from_items(
        [
            {
                "query_id": query_id,
                "vec_id": v,
                "mmr_rank": r,
                "relevance": round(s, 4),
            }
            for r, v, s in zip(out_rank, out_id, out_rel)
        ]
    )


def train_pq_codebooks(
    embeddings: rd.Dataset,
    n_subspaces: int = 8,
    n_centroids: int = 32,
    sample_n: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., TPAMI'11): split the
    (normalized) vector into ``n_subspaces`` contiguous sub-vectors and
    k-means each subspace independently on a BOUNDED sample — same
    training recipe as IVF: the sample is the small side, the corpus never
    leaves the cluster. Returns (n_subspaces, n_centroids, dim/n_subspaces)
    float64 codebooks; deterministic given the seed."""
    rows = embeddings.select_columns(["embedding"]).limit(sample_n).take_all()
    m = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    n, dim = m.shape
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    rng = np.random.default_rng(seed)
    n_c = min(n_centroids, n)
    books = np.empty((n_subspaces, n_c, sub), dtype=np.float64)
    for s in range(n_subspaces):
        x = m[:, s * sub : (s + 1) * sub]
        cent = x[rng.choice(n, size=n_c, replace=False)]
        for _ in range(iters):
            # plain L2 k-means per subspace (sub-vectors are not unit-norm)
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_c):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def pq_cosine_topk_ds(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_subspaces: int = 8,
    n_centroids: int = 32,
    rerank: int = 50,
    codebooks: np.ndarray | None = None,
    seed: int = 42,
) -> rd.Dataset:
    """Approximate top-k via PQ asymmetric distance (ADC) with in-batch
    exact re-rank — the FAISS-style scale pipeline:

    1. codebooks broadcast once; each batch ENCODES its vectors (argmin
       L2 per subspace — the 100-TB index layout would persist these
       uint8 codes: dim x 8 bytes -> n_subspaces bytes per vector);
    2. per query, ADC scores every encoded vector with one LUT gather per
       subspace (O(n_subspaces) per vector instead of O(dim));
    3. the top-``rerank`` ADC candidates PER BATCH get their exact cosine
       from the raw vectors still in the batch, and only those bounded
       candidate rows cross the shuffle for the global exact top-k.

    ADC is the cheap prefilter, the re-rank restores exact ordering among
    survivors; recall is bounded in tests and by the driver recall query.
    Output schema matches ``brute_force_cosine_topk_ds``."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            embeddings, n_subspaces, n_centroids, seed=seed
        )
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    n_sub, n_c, sub = codebooks.shape
    # per-query LUT: lut[q, s, c] = <q_sub[s], codebook[s][c]>
    lut = np.einsum("qsd,scd->qsc", qm.reshape(len(qm), n_sub, sub), codebooks)
    b_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, codebooks, lut))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, books, luts = ray.get(b_ref)
        ids, m = _to_matrix(batch)
        mn = _normalize(m)
        n = len(ids)
        # encode: argmin L2 per subspace
        codes = np.empty((n, n_sub), dtype=np.int64)
        for s in range(n_sub):
            x = mn[:, s * sub : (s + 1) * sub]
            cent = books[s]
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
            d2 = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
            codes[:, s] = np.argmin(d2, axis=1)
        out_q, out_v, out_s = [], [], []
        r = min(rerank, n)
        for j in range(len(qids)):
            adc = luts[j][np.arange(n_sub)[None, :], codes].sum(axis=1)
            cand = np.argpartition(-adc, r - 1)[:r]
            exact = mn[cand] @ qmat[j]
            out_q.extend([int(qids[j])] * len(cand))
            out_v.extend(ids[cand].tolist())
            out_s.extend(exact.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_make_final_topk(k), batch_format="pyarrow")
    )


def ivfpq_cosine_topk_ds(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 16,
    n_subspaces: int = 8,
    n_pq_centroids: int = 32,
    rerank: int = 50,
    seed: int = 42,
) -> rd.Dataset:
    """IVF-PQ (the FAISS web-scale default, Jégou et al. TPAMI'11): the
    IVF coarse quantizer prunes each query's candidate set to its
    ``nprobe`` nearest lists, PQ-ADC scores only those candidates (one
    LUT gather per subspace), and the top-``rerank`` ADC survivors per
    batch get exact cosines from the raw vectors still in the batch.
    At 100 TB this is the layout that fits in RAM: n_subspaces uint8
    codes + one uint16 list id per vector, centroids + codebooks
    broadcast once. Composition of ``train_ivf_centroids`` +
    ``train_pq_codebooks``; deterministic given the seed; output schema
    matches brute force."""
    centroids = train_ivf_centroids(embeddings, n_centroids, seed=seed)
    codebooks = train_pq_codebooks(
        embeddings, n_subspaces, n_pq_centroids, seed=seed
    )
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    n_sub, n_c, sub = codebooks.shape
    lut = np.einsum("qsd,scd->qsc", qm.reshape(len(qm), n_sub, sub), codebooks)
    probed = np.argsort(-(qm @ centroids.T), axis=1)[
        :, : min(nprobe, len(centroids))
    ]
    b_ref = ray.put(
        (
            np.asarray(query_ids, dtype=np.int64),
            qm,
            centroids,
            probed,
            codebooks,
            lut,
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, cent, probes, books, luts = ray.get(b_ref)
        ids, m = _to_matrix(batch)
        mn = _normalize(m)
        n = len(ids)
        lid = np.argmax(mn @ cent.T, axis=1)
        codes = np.empty((n, n_sub), dtype=np.int64)
        for s in range(n_sub):
            x = mn[:, s * sub : (s + 1) * sub]
            cb = books[s]
            d2 = -2.0 * (x @ cb.T) + (cb * cb).sum(axis=1)[None, :]
            codes[:, s] = np.argmin(d2, axis=1)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids)):
            sel = np.flatnonzero(np.isin(lid, probes[j]))
            if not len(sel):
                continue
            adc = luts[j][np.arange(n_sub)[None, :], codes[sel]].sum(axis=1)
            r = min(rerank, len(sel))
            cand = sel[np.argpartition(-adc, r - 1)[:r]]
            exact = mn[cand] @ qmat[j]
            out_q.extend([int(qids[j])] * len(cand))
            out_v.extend(ids[cand].tolist())
            out_s.extend(exact.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_make_final_topk(k), batch_format="pyarrow")
    )
