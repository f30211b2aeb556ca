"""PageRank over edge tables vs the sequential numpy reference."""

import numpy as np
import pytest

import ray.data as rd


def _edge_ds(edges):
    return rd.from_items([{"src": u, "dst": v} for u, v in edges])


def test_pagerank_matches_reference(ray_session):
    from search_engine_ray.pipelines.graph import pagerank_ds, pagerank_reference

    rng = np.random.default_rng(7)
    edges = sorted({(int(u), int(v)) for u, v in rng.integers(0, 40, (300, 2)) if u != v})
    got = pagerank_ds(_edge_ds(edges), n_iter=4, n_buckets=8).to_pandas()
    ref = pagerank_reference(edges, n_iter=4)
    assert got["node"].tolist() == sorted(ref)
    assert np.allclose(got["rank"].to_numpy(), [ref[n] for n in got["node"]], atol=1e-12)
    # rank mass is conserved (teleport + damping redistribution)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_dangling_and_sinks(ray_session):
    # chain into a sink: 0->1->2, 2 has no out-edges (dangling)
    from search_engine_ray.pipelines.graph import pagerank_ds, pagerank_reference

    edges = [(0, 1), (1, 2)]
    got = pagerank_ds(_edge_ds(edges), n_iter=6, n_buckets=4).to_pandas()
    ref = pagerank_reference(edges, n_iter=6)
    assert np.allclose(got["rank"].to_numpy(), [ref[n] for n in got["node"]], atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    # the sink accumulates the most rank
    assert got.loc[got["rank"].idxmax(), "node"] == 2


def test_pagerank_empty(ray_session):
    from search_engine_ray.pipelines.graph import pagerank_ds

    got = pagerank_ds(_edge_ds([]), n_iter=3).to_pandas()
    assert len(got) == 0


def test_pagerank_knn_graph(ray_session):
    # end-to-end: kNN graph of the embeddings table -> pagerank
    from search_engine_ray.pipelines.graph import pagerank_ds
    from search_engine_ray.pipelines.similarity import knn_join_ds, read_embeddings

    sf = "/root/testdata/sf0.001"
    emb = read_embeddings(sf)
    edges = knn_join_ds(emb, emb, k=3).to_pandas()
    eds = rd.from_items(
        [{"src": int(q), "dst": int(v)} for q, v in zip(edges["query_id"], edges["vec_id"])]
    )
    pr = pagerank_ds(eds, n_iter=2, n_buckets=8).to_pandas()
    assert len(pr) == 500 and abs(pr["rank"].sum() - 1.0) < 1e-9
    assert (pr["rank"] > 0).all()
