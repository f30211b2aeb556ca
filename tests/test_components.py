"""connected_components_ds: distributed min-label contraction vs union-find.

The operator is the closure step of pairwise dedup (pairs -> one cluster id
per doc); correctness oracle here is a direct union-find, and the driver
query `dup_clusters` is additionally hash-checked against a DuckDB
recursive-CTE closure at sf0.01.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from search_engine_ray.pipelines.dedup import connected_components_ds


def _uf_clusters(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in sorted(nodes)}


def _run(edges, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.int64()),
                "v": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    out = connected_components_ds(ds, **kw).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"], out["cluster"]))


def test_empty_edges(ray_session):
    assert _run([]) == {}


def test_self_loops_only(ray_session):
    assert _run([(5, 5), (7, 7)]) == {}


def test_two_cliques_and_pairs(ray_session):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (30, 31)]
    assert _run(edges) == _uf_clusters(edges)


def test_cycle(ray_session):
    n = 17
    ids = [100 + i for i in range(n)]
    edges = [(ids[i], ids[(i + 1) % n]) for i in range(n)]
    assert _run(edges) == _uf_clusters(edges)


def test_monotone_path_logarithmic_rounds(ray_session):
    # adversarial chain 0-1-2-...-63: naive min-propagation needs ~n rounds;
    # contraction + pointer doubling must stay logarithmic.
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    stats = {}
    got = _run(edges, stats=stats)
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 8, stats


def test_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    ids = rng.permutation(10_000)[:120]
    edges = [
        (int(ids[rng.integers(len(ids))]), int(ids[rng.integers(len(ids))]))
        for _ in range(90)
    ]
    got = _run(edges)
    want = _uf_clusters([e for e in edges if e[0] != e[1]])
    assert got == want


def test_nonconvergence_raises(ray_session):
    with pytest.raises(RuntimeError):
        _run([(1, 2), (2, 3)], max_rounds=0)
