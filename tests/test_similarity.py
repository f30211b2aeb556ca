"""ANN similarity search: brute force vs duckdb oracle; LSH recall."""

import duckdb
import numpy as np
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(ray_session):
    from search_engine_ray.pipelines.similarity import read_embeddings

    return read_embeddings(SF)


def _query_vec():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    return np.array(t.column("embedding")[0].as_py(), dtype=np.float64)


def test_brute_force_matches_duckdb(emb):
    from search_engine_ray.pipelines.similarity import brute_force_cosine_topk_ds

    q = _query_vec()
    got = (
        brute_force_cosine_topk_ds(emb, q[None, :], [0], k=10)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    qlit = "[" + ",".join(repr(float(x)) for x in q) + "]::DOUBLE[]"
    want = con.sql(
        f"""
        SELECT 0::BIGINT AS query_id, vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], {qlit}), 4) AS cosine
        FROM '{SF}/embeddings.parquet'
        ORDER BY list_cosine_similarity(embedding::DOUBLE[], {qlit}) DESC, vec_id
        LIMIT 10
        """
    ).df()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    np.testing.assert_allclose(got["cosine"], want["cosine"], atol=2e-4)


def test_lsh_recall(emb):
    from search_engine_ray.pipelines.similarity import (
        brute_force_cosine_topk_ds,
        lsh_cosine_topk_ds,
    )

    q = _query_vec()
    exact = brute_force_cosine_topk_ds(emb, q[None, :], [0], k=10).to_pandas()
    approx = lsh_cosine_topk_ds(emb, q[None, :], [0], k=10, n_planes=8).to_pandas()
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.5  # multi-probe 1-bit flips; deterministic via seed
    # the query vector itself must be found (cos=1)
    assert approx.iloc[0]["vec_id"] == 0


def test_multimodal_plumbing(ray_session):
    from search_engine_ray.pipelines.multimodal import (
        fake_media_table,
        frame_sample_ds,
        media_features_ds,
    )

    media = rd.from_arrow(fake_media_table(30))
    feats = media_features_ds(media).to_pandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats["features"])
    assert "payload" not in feats.columns  # payload dropped at the stage
    # determinism
    feats2 = media_features_ds(rd.from_arrow(fake_media_table(30))).to_pandas()
    a = [list(x) for x in feats.sort_values("media_id")["features"]]
    b = [list(x) for x in feats2.sort_values("media_id")["features"]]
    assert a == b
    frames = frame_sample_ds(media, every_ms=500).to_pandas()
    assert (frames["ts_ms"] % 500 == 0).all()
    assert set(frames["media_id"]).issubset(set(range(30)))


def test_ivf_recall(emb):
    """IVF probing must recover most of the true top-k; top-1 (the query
    vector itself, cosine 1.0) must always survive since the query's own
    list is the first probed."""
    from search_engine_ray.pipelines.similarity import (
        brute_force_cosine_topk_ds,
        ivf_cosine_topk_ds,
    )

    q = _query_vec()
    exact = brute_force_cosine_topk_ds(emb, q[None, :], [0], k=10).to_pandas()
    approx = ivf_cosine_topk_ds(
        emb, q[None, :], [0], k=10, n_centroids=16, nprobe=6
    ).to_pandas()
    exact_ids = exact["vec_id"].tolist()
    approx_ids = approx["vec_id"].tolist()
    assert approx_ids[0] == exact_ids[0] == 0  # self-match survives
    recall = len(set(exact_ids) & set(approx_ids)) / len(exact_ids)
    assert recall >= 0.6, (recall, exact_ids, approx_ids)
    # approx scores are TRUE cosines for the vectors it returns
    merged = approx.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    assert (merged["cosine_a"] == merged["cosine_e"]).all()


def test_ivf_assignment_partitions(emb):
    from search_engine_ray.pipelines.similarity import (
        ivf_assign_ds,
        train_ivf_centroids,
    )

    cent = train_ivf_centroids(emb, n_centroids=8, sample_n=500)
    assert cent.shape[0] <= 8
    out = ivf_assign_ds(emb, cent).to_pandas()
    assert out["list_id"].between(0, cent.shape[0] - 1).all()
    assert out["list_id"].nunique() > 1  # vectors actually spread over lists


def test_media_resize_metadata_and_injection(ray_session):
    """Aspect-preserving bound-box math; never upscales; a real resampler
    injects via resize_fn."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.multimodal import (
        fake_media_table,
        media_resize_ds,
    )

    media = rd.from_arrow(fake_media_table(30))
    out = (
        media_resize_ds(media, max_w=32, max_h=32)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    src = fake_media_table(30).to_pandas().sort_values("media_id")
    assert (out["width"] <= 32).all() and (out["height"] <= 32).all()
    # aspect preserved within rounding
    ratio_in = src["width"] / src["height"]
    ratio_out = out["width"] / out["height"]
    assert (abs(ratio_in.to_numpy() - ratio_out.to_numpy()) < 0.15).all()
    # injected fn sees target dims
    seen = media_resize_ds(
        media, max_w=16, max_h=16,
        resize_fn=lambda p, w, h, tw, th: f"{tw}x{th}".encode(),
    ).to_pandas()
    dims = {tuple(map(int, s.decode().split("x"))) for s in seen["payload"]}
    assert all(tw <= 16 and th <= 16 for tw, th in dims)


def test_ppm_codec_roundtrip_and_pixel_true_resize(ray_session):
    """REAL pixel work (round-3): P6 PPM decode/encode round-trips
    bit-exactly, nearest-neighbor resize matches the index-map reference
    on a checkerboard, and media_resize_ds applies it end-to-end (decoded
    output pixels equal resizing the decoded input directly)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.multimodal import (
        decode_ppm,
        encode_ppm,
        fake_media_table,
        media_resize_ds,
        resize_nearest,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()

    # checkerboard 4x4 -> 2x2 picks the center-rule samples
    cb = np.zeros((4, 4, 3), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    small = resize_nearest(cb, 2, 2)
    ys = np.minimum(((np.arange(2) + 0.5) * 4 / 2).astype(int), 3)
    xs = ys
    assert (small == cb[ys[:, None], xs[None, :]]).all()

    media = rd.from_arrow(fake_media_table(12))
    out = (
        media_resize_ds(media, max_w=16, max_h=16)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    src = fake_media_table(12).to_pandas().sort_values("media_id").reset_index(drop=True)
    for i in range(0, 12, 3):  # image rows carry real PPM payloads
        orig = decode_ppm(src.loc[i, "payload"])
        got = decode_ppm(out.loc[i, "payload"])
        tw, th = int(out.loc[i, "width"]), int(out.loc[i, "height"])
        assert got.shape == (th, tw, 3)
        assert (got == resize_nearest(orig, tw, th)).all()


def test_knn_join_matches_duckdb(emb):
    """Table-vs-table kNN join: every vec_id % 97 == 0 probe row gets its
    exact top-10 cosine neighbors (self excluded), matching the SQL
    window-function oracle row for row."""
    import pyarrow as pa

    from search_engine_ray.pipelines.similarity import knn_join_ds

    def probe_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 97 == 0))

    got = knn_join_ds(
        emb, emb.map_batches(probe_side, batch_format="pyarrow"), k=10
    ).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = con.sql(
        """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id % 97 = 0),
        s AS (SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, vec_id, c,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c DESC, vec_id) AS rk
              FROM s)
        SELECT query_id, vec_id, round(c, 4) AS cosine
        FROM r WHERE rk <= 10 ORDER BY query_id, rk
        """
    ).df()
    assert got["query_id"].tolist() == want["query_id"].tolist()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["cosine"].tolist() == want["cosine"].tolist()
    # self-matches excluded
    assert not (got["query_id"] == got["vec_id"]).any()


def test_knn_join_self_inclusion_and_empty(emb, ray_session):
    import pyarrow as pa

    from search_engine_ray.pipelines.similarity import knn_join_ds

    def one_probe(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids == 0))

    probes = emb.map_batches(one_probe, batch_format="pyarrow")
    # exclude_self=False: the best neighbor of vec 0 is vec 0 (cos=1)
    withself = knn_join_ds(emb, probes, k=3, exclude_self=False).to_pandas()
    assert withself["vec_id"].iloc[0] == 0 and withself["cosine"].iloc[0] == 1.0
    noself = knn_join_ds(emb, probes, k=3).to_pandas()
    assert 0 not in noself["vec_id"].tolist() and len(noself) == 3

    def none_probe(batch: pa.Table) -> pa.Table:
        return batch.slice(0, 0)

    empty = knn_join_ds(
        emb, emb.map_batches(none_probe, batch_format="pyarrow"), k=3
    ).to_pandas()
    assert len(empty) == 0


def test_embedding_stats_exact_int_sums(ray_session):
    """Quantized int64 sums match numpy exactly; mean/var are the IEEE
    ops on those sums (same expression as the SQL oracle)."""
    import numpy as np
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.similarity import (
        embedding_stats_ds,
        read_embeddings,
    )
    from search_engine_ray.util import embedding_matrix

    sf = "/root/testdata/sf0.001"
    got = embedding_stats_ds(read_embeddings(sf)).to_pandas()
    m = embedding_matrix(pq.read_table(f"{sf}/embeddings.parquet").column("embedding"))
    q = np.floor(m * 65536 + 0.5).astype(np.int64)
    n = float(len(m))
    assert got["dim"].tolist() == list(range(m.shape[1]))
    assert (got["s_q"].to_numpy() == q.sum(axis=0)).all()
    assert (got["ssq_q"].to_numpy() == (q * q).sum(axis=0)).all()
    s = q.sum(axis=0).astype(np.float64)
    ss = (q * q).sum(axis=0).astype(np.float64)
    assert (got["mean"].to_numpy() == s / (n * 65536.0)).all()
    assert (got["var"].to_numpy() == (n * ss - s * s) / (n * n * 65536.0 * 65536.0)).all()


def test_whiten_embeddings_matches_numpy(ray_session):
    """Distributed whitening == sequential numpy PCA-whitening; output
    covariance is ~identity on the non-degenerate spectrum."""
    import numpy as np
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.similarity import (
        read_embeddings,
        whiten_embeddings_ds,
    )
    from search_engine_ray.util import embedding_matrix

    sf = "/root/testdata/sf0.001"
    out = (
        whiten_embeddings_ds(read_embeddings(sf))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    y = np.stack(out["white"].to_numpy())
    m = embedding_matrix(pq.read_table(f"{sf}/embeddings.parquet").column("embedding"))
    mu = m.mean(axis=0)
    cov = np.cov(m.T, bias=True)
    lam, vec = np.linalg.eigh(cov)
    ref = (m - mu) @ (vec @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + 1e-6)))
    assert y.shape == (len(m), m.shape[1]) and y.dtype == np.float32
    assert np.allclose(y, ref.astype(np.float32), atol=1e-4)
    c2 = np.cov(y.astype(np.float64).T, bias=True)
    assert np.allclose(np.diag(c2), 1.0, atol=1e-2)
    off = c2 - np.diag(np.diag(c2))
    assert np.abs(off).max() < 1e-2


def test_group_centroid_exact_and_matches_numpy(ray_session):
    """Per-label centroid: exact quantized sums == numpy; mean is the
    IEEE division on the sums (same expression as the SQL oracle)."""
    import numpy as np
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.similarity import (
        group_centroid_ds,
        read_embeddings,
    )
    from search_engine_ray.util import embedding_matrix

    sf = "/root/testdata/sf0.001"
    got = group_centroid_ds(read_embeddings(sf)).to_pandas()
    t = pq.read_table(f"{sf}/embeddings.parquet")
    m = embedding_matrix(t.column("embedding"))
    lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    q = np.floor(m * 65536 + 0.5).astype(np.int64)
    d = m.shape[1]
    for L in np.unique(lab):
        sub = got[got["label"] == L].sort_values("dim")
        sel = q[lab == L]
        assert sub["dim"].tolist() == list(range(d))
        assert (sub["n"].to_numpy() == len(sel)).all()
        assert (sub["s_q"].to_numpy() == sel.sum(axis=0)).all()
        want_mean = sel.sum(axis=0).astype(np.float64) / (float(len(sel)) * 65536.0)
        assert (sub["mean"].to_numpy() == want_mean).all()


def test_mmr_rerank_matches_numpy_reference(ray_session):
    """Greedy MMR over the top-pool candidates == plain numpy greedy on the
    same pool; rank 1 is the pure-relevance argmax; k results, no repeats."""
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.similarity import (
        mmr_rerank_ds,
        read_embeddings,
    )

    sf = SF
    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.array(tbl.column("embedding")[0].as_py(), dtype=np.float64)
    got = (
        mmr_rerank_ds(read_embeddings(sf), q, k=10, pool=50, lam=0.7)
        .to_pandas()
        .sort_values("mmr_rank")
        .reset_index(drop=True)
    )
    assert len(got) == 10
    assert got["vec_id"].is_unique
    # numpy reference over the full table
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    m = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    qn = q / np.linalg.norm(q)
    rel = mn @ qn
    order = np.lexsort((ids, -rel))[:50]
    cids, crel, cm = ids[order], rel[order], mn[order]
    inter = cm @ cm.T
    chosen, sel = np.zeros(50, bool), []
    want = []
    for _ in range(10):
        div = inter[:, sel].max(axis=1) if sel else np.zeros(50)
        score = 0.7 * crel - 0.3 * div
        score[chosen] = -np.inf
        best = int(np.lexsort((cids, -score))[0])
        chosen[best] = True
        sel.append(best)
        want.append(int(cids[best]))
    assert got["vec_id"].tolist() == want
    # rank 1 == relevance argmax; the tail diverges from pure relevance
    assert got["vec_id"][0] == want[0] == int(cids[0])


def test_pq_rerank_all_equals_brute_force(ray_session):
    """With rerank >= corpus size the exact in-batch re-rank covers every
    vector, so PQ output == brute force regardless of codebook quality."""
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.similarity import (
        brute_force_cosine_topk_ds,
        pq_cosine_topk_ds,
        read_embeddings,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    qm = np.array(
        [tbl.column("embedding")[i].as_py() for i in range(2)], dtype=np.float64
    )
    exact = (
        brute_force_cosine_topk_ds(read_embeddings(SF), qm, [0, 1], k=10)
        .to_pandas()
        .sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    approx = (
        pq_cosine_topk_ds(
            read_embeddings(SF), qm, [0, 1], k=10, rerank=100000
        )
        .to_pandas()
        .sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert approx["vec_id"].tolist() == exact["vec_id"].tolist()
    assert approx["cosine"].tolist() == exact["cosine"].tolist()


def test_pq_recall_and_determinism(ray_session):
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.similarity import (
        brute_force_cosine_topk_ds,
        pq_cosine_topk_ds,
        read_embeddings,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    qm = np.array(
        [tbl.column("embedding")[i].as_py() for i in range(3)], dtype=np.float64
    )
    qids = [0, 1, 2]
    exact = brute_force_cosine_topk_ds(read_embeddings(SF), qm, qids, k=10).to_pandas()
    a = pq_cosine_topk_ds(read_embeddings(SF), qm, qids, k=10, rerank=50).to_pandas()
    b = pq_cosine_topk_ds(read_embeddings(SF), qm, qids, k=10, rerank=50).to_pandas()
    # seeded codebooks -> bit-identical reruns
    key = ["query_id", "vec_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    for qid in qids:
        ex = set(exact[exact.query_id == qid]["vec_id"])
        ap = set(a[a.query_id == qid]["vec_id"])
        assert len(ex & ap) / len(ex) >= 0.6, (qid, len(ex & ap))


def test_ivfpq_recall_and_determinism(ray_session):
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.similarity import (
        brute_force_cosine_topk_ds,
        ivfpq_cosine_topk_ds,
        read_embeddings,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    qm = np.array(
        [tbl.column("embedding")[i].as_py() for i in range(3)], dtype=np.float64
    )
    qids = [0, 1, 2]
    exact = brute_force_cosine_topk_ds(read_embeddings(SF), qm, qids, k=10).to_pandas()
    a = ivfpq_cosine_topk_ds(
        read_embeddings(SF), qm, qids, k=10, nprobe=28, rerank=80
    ).to_pandas()
    b = ivfpq_cosine_topk_ds(
        read_embeddings(SF), qm, qids, k=10, nprobe=28, rerank=80
    ).to_pandas()
    key = ["query_id", "vec_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    for qid in qids:
        ex = set(exact[exact.query_id == qid]["vec_id"])
        ap = set(a[a.query_id == qid]["vec_id"])
        assert len(ex & ap) / len(ex) >= 0.5, (qid, len(ex & ap))
