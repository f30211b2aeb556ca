"""Label propagation (clamped integer-vote LPA) vs sequential reference."""

import numpy as np

import ray.data as rd


def _eds(edges):
    return rd.from_items([{"src": u, "dst": v} for u, v in edges])


def _sds(seeds):
    return rd.from_items([{"node": n, "label": l} for n, l in seeds.items()])


def test_lpa_matches_reference(ray_session):
    from search_engine_ray.pipelines.graph import (
        label_propagation_ds,
        label_propagation_reference,
    )

    rng = np.random.default_rng(11)
    edges = sorted(
        {(int(u), int(v)) for u, v in rng.integers(0, 60, (400, 2)) if u != v}
    )
    seeds = {0: 0, 1: 1, 2: 2, 30: 1, 45: 0}
    got = label_propagation_ds(_eds(edges), _sds(seeds), n_iter=3, n_buckets=8).to_pandas()
    ref = label_propagation_reference(edges, seeds, n_iter=3)
    assert dict(zip(got["node"], got["label"])) == ref
    # seeds stay clamped
    for n, l in seeds.items():
        assert dict(zip(got["node"], got["label"]))[n] == l


def test_lpa_chain_and_unreached(ray_session):
    # 0(seed A) -> 1 -> 2; 3 -> 4 isolated from the seed: stays -1
    from search_engine_ray.pipelines.graph import label_propagation_ds

    edges = [(0, 1), (1, 2), (3, 4)]
    got = label_propagation_ds(
        _eds(edges), _sds({0: 7}), n_iter=3, n_buckets=4
    ).to_pandas()
    m = dict(zip(got["node"], got["label"]))
    assert m[0] == 7 and m[1] == 7 and m[2] == 7
    assert m[3] == -1 and m[4] == -1


def test_lpa_tie_breaks_to_min_label(ray_session):
    # node 2 gets one vote each of label 5 (from 0) and label 3 (from 1)
    from search_engine_ray.pipelines.graph import label_propagation_ds

    edges = [(0, 2), (1, 2)]
    got = label_propagation_ds(
        _eds(edges), _sds({0: 5, 1: 3}), n_iter=1, n_buckets=4
    ).to_pandas()
    assert dict(zip(got["node"], got["label"]))[2] == 3


def test_lpa_partial_votes_split_across_buckets(ray_session):
    """Regression: vote counts arrive at the update step as PARTIALS (one
    row per source bucket) and must be summed per (dst, label) before the
    argmax — a label with voters split 1+1 across two buckets must beat a
    label with a single partial of 1 (winner-of-partials picked the wrong
    label before the r5 fix, caught by the label_propagation SQL oracle)."""
    from search_engine_ray.pipelines.graph import (
        _bucket_of,
        label_propagation_ds,
        label_propagation_reference,
    )

    n_buckets = 8
    # find two voter nodes in DIFFERENT buckets and one in either
    b0 = int(_bucket_of(np.array([10]), n_buckets)[0])
    u2 = next(
        u for u in range(11, 200)
        if int(_bucket_of(np.array([u]), n_buckets)[0]) != b0
    )
    u3 = 10_000 + u2
    # labels: 10 and u2 vote 7 (split across buckets); u3 votes 3 (< 7, so
    # a tie of partial-maxima would wrongly pick 3)
    seeds = {10: 7, u2: 7, u3: 3}
    edges = [(10, 500), (u2, 500), (u3, 500)]
    got = label_propagation_ds(
        _eds(edges), _sds(seeds), n_iter=1, n_buckets=n_buckets
    ).to_pandas()
    ref = label_propagation_reference(edges, seeds, n_iter=1)
    assert dict(zip(got["node"], got["label"])) == ref
    assert ref[500] == 7
