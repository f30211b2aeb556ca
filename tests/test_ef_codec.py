"""Elias-Fano posting codec: round-trip lossless, multi-list slicing,
size advantage on dense lists, and end-to-end index equivalence
(postings_codec="ef" build == varint build on every query; add/compact
preserve and transcode the codec). See state/codec.py (Vigna, WSDM'13)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.state.codec import (
    decode_doc_ids_any,
    ef_decode,
    ef_encode,
    ef_encode_multi,
    encode_doc_ids,
)


def test_ef_empty():
    assert ef_decode(ef_encode(np.array([], np.int64))).tolist() == []
    assert ef_decode(b"").tolist() == []


@pytest.mark.parametrize(
    "ids",
    [
        [0],
        [5],
        [0, 1],
        list(range(1000)),  # dense: l = 0, no low section
        [2**55, 2**55 + 1, 2**56 + 12345],  # beyond 32-bit universes
        [7, 2**40],  # huge gap
    ],
)
def test_ef_known_cases(ids):
    arr = np.array(ids, np.int64)
    assert ef_decode(ef_encode(arr)).tolist() == ids


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**13),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
def test_ef_roundtrip(ids):
    ids = sorted(ids)
    arr = np.array(ids, np.int64)
    assert ef_decode(ef_encode(arr)).tolist() == ids


def test_ef_rejects_descending():
    with pytest.raises(ValueError):
        ef_encode(np.array([3, 1], np.int64))


def test_ef_multi_slicing_matches_single():
    rng = np.random.default_rng(7)
    lists = [
        np.cumsum(rng.integers(1, 60, int(n))).astype(np.int64)
        for n in rng.integers(1, 120, 64)
    ]
    lists.insert(5, np.zeros(0, np.int64))  # empty group in the middle
    vals = (
        np.concatenate(lists).astype(np.uint64)
        if any(len(x) for x in lists)
        else np.zeros(0, np.uint64)
    )
    lens = np.array([len(x) for x in lists], np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    buf, off = ef_encode_multi(vals, starts, ends)
    for k, a in enumerate(lists):
        piece = buf[off[k] : off[k + 1]]
        assert ef_decode(piece).tolist() == a.tolist()
        # each slice is the same self-describing format as ef_encode
        assert piece == ef_encode(a)


def test_ef_multi_rejects_non_tiling():
    with pytest.raises(ValueError):
        ef_encode_multi(
            np.arange(10, dtype=np.uint64),
            np.array([0, 6], np.int64),
            np.array([5, 10], np.int64),
        )


def test_ef_smaller_than_varint_on_dense_lists():
    # a df=n/2 term over doc_ids 0..n: EF ~ 2-3 bits/posting, varint >= 8
    ids = np.arange(0, 100_000, 2, dtype=np.int64)
    assert len(ef_encode(ids)) < len(encode_doc_ids(ids)) / 2


def test_decode_doc_ids_any_dispatch():
    ids = np.array([3, 10, 1000], np.int64)
    assert decode_doc_ids_any(ef_encode(ids), "ef").tolist() == ids.tolist()
    assert (
        decode_doc_ids_any(encode_doc_ids(ids), "varint").tolist() == ids.tolist()
    )
    with pytest.raises(ValueError):
        decode_doc_ids_any(b"", "zstd")


# ---------------------------------------------------------------------------
# End-to-end: an "ef" index answers every query identically to varint
# ---------------------------------------------------------------------------


def _results(searcher, queries):
    out = []
    for q in queries:
        out.append(
            [
                (r.url, r.introduction, r.title, r.doc_id)
                for r in searcher.search(q)
            ]
        )
        out.append(
            [(r.doc_id, round(r.score, 9)) for r in searcher.search_bm25(q, k=5)]
        )
    return out


QUERIES = ["brightest", "giant", "Solar", '"from the Sun" Moon', "planet sixth"]


def test_ef_build_matches_varint(ray_session, tmp_path):
    from dataclasses import replace

    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index, make_searcher
    from search_engine_ray.sources.fixtures import CORPORA, pages_table
    from search_engine_ray.state.segments import read_manifest

    docs, config = CORPORA["planets"]
    pages = rd.from_arrow(pages_table(docs))
    outs = {}
    for codec in ("varint", "ef"):
        cfg = replace(config, postings_codec=codec)
        out = str(tmp_path / codec)
        build_index(pages, out, cfg, doc_id_mode="replay", resume=False)
        mf = read_manifest(f"{out}/manifest.json")
        assert mf["config"]["postings_codec"] == codec
        outs[codec] = _results(make_searcher(out, cfg), QUERIES)
    assert outs["ef"] == outs["varint"]


def test_ef_add_generation_inherits_and_compact_preserves(ray_session, tmp_path):
    from dataclasses import replace

    import ray.data as rd

    from search_engine_ray.pipelines.build import (
        add_generation,
        build_index,
        compact,
        make_searcher,
    )
    from search_engine_ray.sources.fixtures import CORPORA, pages_table
    from search_engine_ray.state.segments import read_manifest

    docs, config = CORPORA["planets"]
    cfg = replace(config, postings_codec="ef")
    out = str(tmp_path / "idx")
    split = len(docs) // 2
    build_index(
        pages_ds := rd.from_arrow(pages_table(docs[:split])),
        out,
        cfg,
        doc_id_mode="replay",
        resume=False,
    )
    del pages_ds
    # config=None inherits the base generation's codec
    add_generation(out, rd.from_arrow(pages_table(docs[split:])), None)
    # a mismatched explicit codec is rejected
    with pytest.raises(ValueError, match="postings_codec"):
        add_generation(
            out,
            rd.from_arrow(pages_table(docs[:1])),
            replace(config, postings_codec="varint"),
        )
    before = _results(make_searcher(out, cfg), QUERIES)
    # compact with config=None preserves ef
    compact(out)
    assert (
        read_manifest(f"{out}/manifest.json")["config"]["postings_codec"] == "ef"
    )
    assert _results(make_searcher(out, cfg), QUERIES) == before

    # compact with an explicit varint config transcodes in place (adding a
    # page first so the compact is not a no-op; BM25 scores shift with
    # n_docs/avgdl, so capture the expected answers AFTER the add)
    extra = [("Pluto", "dwarf icy body beyond Neptune", "https://x/pluto", 90)]
    add_generation(out, rd.from_arrow(pages_table(extra)), None)
    mid = _results(make_searcher(out, cfg), QUERIES)
    compact(out, replace(config, postings_codec="varint"))
    assert (
        read_manifest(f"{out}/manifest.json")["config"]["postings_codec"]
        == "varint"
    )
    assert _results(make_searcher(out, config), QUERIES) == mid
