"""WAND == brute-force equivalence on a salted zipf index (FIXTURES §5),
plus posting-order invariants through the full Ray build."""

import numpy as np
import pytest

import ray.data as rd

from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.sources.synth import HOT_TERM, synth_zipf_table
from search_engine_ray.state.segments import SegmentReader
from search_engine_ray.state.wand import brute_force_topk, wand_topk


@pytest.fixture(scope="module")
def zipf_index(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("zipf") / "idx")
    config = EngineConfig(block_size=32, salt_shift=8, salt_df_threshold=100)  # small blocks + real salting
    pages = rd.from_arrow(synth_zipf_table(1500, n_tokens=60, vocab=2000))
    res = build_index(pages, out, config, doc_id_mode="rank", resume=False)
    assert res.n_docs == 1500
    return out, config, res


def test_postings_sorted_and_complete(zipf_index):
    out, config, res = zipf_index
    reader = SegmentReader(out)
    post = reader.lookup([HOT_TERM, "w0", "w1", "w500"])
    assert HOT_TERM in post
    hot = post[HOT_TERM]
    # hot term planted in ~50% of docs
    assert 600 < hot["df"] < 900
    for p in post.values():
        ids = p["doc_ids"]
        assert (np.diff(ids) > 0).all(), "postings must be strictly ascending"
        assert len(p["tfs"]) == len(ids) == len(p["dls"])
        # block metadata covers every posting
        assert p["block_last"][-1] == ids[-1]


@pytest.mark.parametrize(
    "terms,k",
    [
        ([HOT_TERM], 10),
        (["w0", "w1"], 10),
        ([HOT_TERM, "w0"], 5),
        (["w0", "w1", "w2", "w3"], 25),
        (["w100", "w500", "w1500"], 10),
        ([HOT_TERM, "w0", "w1", "w2"], 100),
    ],
)
def test_wand_equals_brute_force(zipf_index, terms, k):
    out, config, res = zipf_index
    reader = SegmentReader(out)
    post = reader.lookup(terms)
    postings = [post[t] for t in terms if t in post]
    args = (k, res.n_docs, res.avgdl, config.bm25_k1, config.bm25_b)
    got = wand_topk(postings, *args)
    want = brute_force_topk(postings, *args)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-9
    )


def test_wand_empty_and_missing(zipf_index):
    out, config, res = zipf_index
    assert wand_topk([], 10, res.n_docs, res.avgdl, 1.2, 0.75) == []
    reader = SegmentReader(out)
    assert reader.lookup(["zz_no_such_term"]) == {}


def test_wand_equals_brute_force_randomized(zipf_index):
    """Many random term subsets: exercises the shallow-skip path broadly
    (a missing skip-target cap once passed the 6 fixed shapes but lost
    true top-k docs on other term mixes)."""
    import random

    out, config, res = zipf_index
    reader = SegmentReader(out)
    rng = random.Random(7)
    vocab = [HOT_TERM] + [f"w{i}" for i in range(0, 1200, 7)]
    args = (10, res.n_docs, res.avgdl, config.bm25_k1, config.bm25_b)
    for trial in range(40):
        terms = rng.sample(vocab, rng.randint(1, 5))
        post = reader.lookup(terms)
        postings = [post[t] for t in terms if t in post]
        if not postings:
            continue
        got = wand_topk(postings, *args)
        want = brute_force_topk(postings, *args)
        assert [d for d, _ in got] == [d for d, _ in want], terms


def test_wand_dominates_any_conjunction(zipf_index):
    """OR top-k scores are >= the best AND-only score for the same terms."""
    out, config, res = zipf_index
    reader = SegmentReader(out)
    post = reader.lookup(["w0", "w1"])
    postings = [post["w0"], post["w1"]]
    top = wand_topk(postings, 1, res.n_docs, res.avgdl, config.bm25_k1, config.bm25_b)
    assert top and top[0][1] > 0
