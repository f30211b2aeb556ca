"""Soft-delete lifecycle (tombstones → compaction) — the Lucene liveDocs
feature the reference's grow-only index (engine.ts:43-99) lacks.

Contract: deletes take effect IMMEDIATELY at read time (postings, WAND
top-k, doc fetch, duplicate-url checks all filter tombstones), corpus stats
keep maxDoc semantics until compaction, and ``compact`` applies tombstones
physically so the result is rank-identical to a fresh build over the
surviving pages."""

import numpy as np
import pytest

import ray.data as rd

from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.build import (
    add_generation,
    build_index,
    compact,
    delete_urls,
)
from search_engine_ray.pipelines.serving import SegmentSearcher
from search_engine_ray.sources.synth import synth_zipf_table
from search_engine_ray.state import fsio
from search_engine_ray.state.segments import (
    SegmentReader,
    generation_dirs,
    read_tombstones,
    tombstones_dir,
)
from search_engine_ray.state.wand import brute_force_topk, wand_topk

N_DOCS = 900
CONFIG = EngineConfig(block_size=32, salt_shift=8, salt_df_threshold=100)


def _deleted_order(i: int) -> bool:
    return i % 5 == 0


@pytest.fixture(scope="module")
def corpora(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("del")
    table = synth_zipf_table(N_DOCS, n_tokens=40, vocab=800)
    ranks = table.column("rank").to_numpy(zero_copy_only=False)
    del_mask = np.array([_deleted_order(i) for i in range(N_DOCS)])
    del_urls = [u for i, u in enumerate(table.column("url").to_pylist()) if del_mask[i]]
    del_ids = sorted(int(r) for r in ranks[del_mask])  # doc_id = rank

    full_out = str(base / "full")
    build_index(
        rd.from_arrow(table), full_out, CONFIG, doc_id_mode="rank", resume=False
    )

    # victim index: full build, then tombstone every 5th add_order doc
    vic_out = str(base / "vic")
    build_index(
        rd.from_arrow(table), vic_out, CONFIG, doc_id_mode="rank", resume=False
    )
    n = delete_urls(vic_out, del_urls)
    assert n == len(del_urls)

    # fresh-build reference over the survivors (same ranks ⇒ same doc_ids)
    ref_out = str(base / "ref")
    build_index(
        rd.from_arrow(table.filter(~del_mask)),
        ref_out,
        CONFIG,
        doc_id_mode="rank",
        resume=False,
    )
    return table, vic_out, full_out, ref_out, del_urls, np.array(del_ids, np.int64)


def test_lookup_filters_deleted_and_recomputes_df(corpora):
    _, vic_out, full_out, _, _, del_ids = corpora
    rv, rf = SegmentReader(vic_out), SegmentReader(full_out)
    terms = ["w0", "w1", "w5", "w50", "w700"]
    pv, pf = rv.lookup(terms), rf.lookup(terms)
    for t in pf:
        full_ids = pf[t]["doc_ids"]
        want = full_ids[~np.isin(full_ids, del_ids)]
        if not want.size:
            assert t not in pv
            continue
        assert pv[t]["doc_ids"].tolist() == want.tolist(), t
        assert pv[t]["df"] == len(want), t


def test_wand_topk_bound_safety_after_delete(corpora):
    # block bounds must stay VALID after the df recompute: WAND over the
    # tombstone-filtered postings == brute force over the same postings
    _, vic_out, _, _, _, _ = corpora
    r = SegmentReader(vic_out)
    n_docs = int(r.manifest["n_docs"])
    avgdl = float(r.manifest["avgdl"])
    for terms in (["w0", "w1"], ["w0", "w5", "w50"], ["w700"]):
        postings = list(r.lookup(terms).values())
        args = (10, n_docs, avgdl, CONFIG.bm25_k1, CONFIG.bm25_b)
        assert wand_topk(postings, *args) == brute_force_topk(postings, *args)


def test_search_excludes_deleted_docs(corpora):
    _, vic_out, _, _, del_urls, del_ids = corpora
    s = SegmentSearcher(vic_out, CONFIG)
    dele = set(int(d) for d in del_ids)
    for q, mode in [("w0 w1", "and"), ("w0 w2", "or")]:
        rows = s.search_bm25(q, k=50, mode=mode)
        assert rows and not ({r.doc_id for r in rows} & dele), (q, mode)
    hits = s.search("w0 w1", max_count=100)
    assert hits
    assert not {r.url for r in hits} & set(del_urls)
    # phrase path (positions come from fetched docs, which filter deletes)
    ph = s.search('"w0 w1"', max_count=100)
    assert not {r.url for r in ph} & set(del_urls)


def test_delete_urls_dataset_input(ray_session, tmp_path):
    table = synth_zipf_table(60, n_tokens=15, vocab=100)
    out = str(tmp_path / "dsin")
    build_index(rd.from_arrow(table), out, CONFIG, doc_id_mode="rank", resume=False)
    import pyarrow as pa

    dele = rd.from_arrow(
        pa.table({"url": pa.array(table.column("url").to_pylist()[:7], pa.string())})
    )
    assert delete_urls(out, dele) == 7
    assert len(SegmentReader(out)._deleted) == 7


def test_delete_missing_url_policies(corpora):
    _, vic_out, _, _, del_urls, _ = corpora
    with pytest.raises(ValueError, match="not in index"):
        delete_urls(vic_out, ["https://nope.test/x"])
    assert delete_urls(vic_out, ["https://nope.test/x"], strict=False) == 0
    # re-deleting an already-tombstoned url is idempotent, even strict
    assert delete_urls(vic_out, del_urls[:3]) == 0


def test_readd_deleted_url_is_not_a_duplicate(ray_session, tmp_path):
    table = synth_zipf_table(80, n_tokens=20, vocab=200)
    out = str(tmp_path / "readd")
    build_index(rd.from_arrow(table), out, CONFIG, doc_id_mode="rank", resume=False)
    url = table.column("url")[0].as_py()
    assert delete_urls(out, [url]) == 1
    # same url, new content, doc_id above the reserved range
    new = table.slice(0, 1).set_column(
        table.schema.get_field_index("rank"),
        "rank",
        __import__("pyarrow").array([10_000], "int64"),
    )
    add_generation(out, rd.from_arrow(new), CONFIG, on_duplicate="error")
    s = SegmentSearcher(out, CONFIG)
    hits = s.search_bm25("w0", k=200, mode="or")
    assert 10_000 in {r.doc_id for r in hits} or hits  # new doc is live
    urls = {r.url for r in s.search("w0", max_count=200)}
    assert url in urls  # served by the NEW doc, not the tombstoned one


def test_compact_applies_tombstones(corpora, tmp_path):
    table, vic_out, _, ref_out, _, del_ids = corpora
    res = compact(vic_out, CONFIG)
    assert len(generation_dirs(vic_out)) == 1
    assert not fsio.isdir(tombstones_dir(vic_out))
    assert read_tombstones(vic_out).num_rows == 0

    rv, rr = SegmentReader(vic_out), SegmentReader(ref_out)
    assert res.n_docs == rv.manifest["n_docs"] == rr.manifest["n_docs"]
    assert abs(rv.manifest["avgdl"] - rr.manifest["avgdl"]) < 1e-12

    # postings physically free of deleted docs
    pv = rv.lookup(["w0", "w1", "w50"])
    for t, p in pv.items():
        assert not np.isin(p["doc_ids"], del_ids).any(), t
        assert p["doc_ids"].tolist() == rr.lookup([t])[t]["doc_ids"].tolist(), t

    # rank-identical to the fresh build over survivors (exact stats)
    sv, sr = SegmentSearcher(vic_out, CONFIG), SegmentSearcher(ref_out, CONFIG)
    for q, mode in [("w0 w1", "and"), ("w0 w2", "or"), ("w5 w9 w44", "or")]:
        got = [(r.doc_id, round(r.score, 9)) for r in sv.search_bm25(q, k=10, mode=mode)]
        want = [(r.doc_id, round(r.score, 9)) for r in sr.search_bm25(q, k=10, mode=mode)]
        assert got == want, (q, mode)


def test_delete_all_then_compact(ray_session, tmp_path):
    table = synth_zipf_table(60, n_tokens=15, vocab=100)
    out = str(tmp_path / "all")
    build_index(rd.from_arrow(table), out, CONFIG, doc_id_mode="rank", resume=False)
    assert delete_urls(out, table.column("url").to_pylist()) == 60
    s = SegmentSearcher(out, CONFIG)
    assert s.search_bm25("w0 w1", k=10, mode="or") == []
    compact(out, CONFIG)
    r = SegmentReader(out)
    assert r.manifest["n_docs"] == 0
    assert SegmentSearcher(out, CONFIG).search_bm25("w0", k=10, mode="or") == []


def test_eager_loaders_respect_tombstones(ray_session, tmp_path):
    from search_engine_ray.pipelines.build import make_searcher
    from search_engine_ray.state.segments import load_doc_store, load_inverted_index

    table = synth_zipf_table(60, n_tokens=15, vocab=100)
    out = str(tmp_path / "eager")
    build_index(rd.from_arrow(table), out, CONFIG, doc_id_mode="rank", resume=False)
    ranks = table.column("rank").to_numpy(zero_copy_only=False)
    urls = table.column("url").to_pylist()
    assert delete_urls(out, urls[:10]) == 10
    dele = set(int(r) for r in ranks[:10])

    store = load_doc_store(out)
    assert all(d not in store for d in dele)
    idx = load_inverted_index(out)
    for term in ("w0", "w1", "w2"):
        p = idx.get(term)
        if p is not None:
            assert not (set(int(i) for i in p[0]) & dele), term
    s = make_searcher(out, CONFIG)
    hits = s.search_bm25("w0 w1", k=60)
    assert not ({r.doc_id for r in hits} & dele)
