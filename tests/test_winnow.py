"""Winnowing fingerprints: batch kernel vs the per-doc reference
implementation (Schleimer et al. 2003 semantics) + edit-survival property."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from search_engine_ray.functions.textstats import (
    positional_shingle_hashes_batch,
    shingle_hashes_batch,
    token_lists,
    winnow_fingerprints,
    winnow_fingerprints_batch,
)
from search_engine_ray.pipelines.text import winnow_fp_ds

SF = "/root/testdata/sf0.001"


def _tok_column(texts):
    return token_lists(pa.array(texts, pa.string()))


def _py_tokens(toks):
    return [[t.lower() for t in row] for row in toks.to_pylist()]


def test_positional_matches_sorted_distinct():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b",
        "",
        "x",
        "one two three one two three one two three",
    ]
    toks = _tok_column(texts)
    flat_p, starts_p = positional_shingle_hashes_batch(toks, 3)
    flat_s, starts_s = shingle_hashes_batch(toks, 3)
    for i in range(len(texts)):
        pos = flat_p[starts_p[i] : starts_p[i + 1]]
        srt = flat_s[starts_s[i] : starts_s[i + 1]]
        np.testing.assert_array_equal(np.unique(pos), srt)


def test_batch_matches_reference_on_corpus():
    texts = (
        pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()[:200]
    )
    toks = _tok_column(texts)
    d, f = winnow_fingerprints_batch(toks, 3, 4)
    got = {}
    for di, fi in zip(d, f):
        got.setdefault(int(di), []).append(int(fi))
    for i, words in enumerate(_py_tokens(toks)):
        want = winnow_fingerprints(words, 3, 4)
        assert got.get(i, []) == [int(x) for x in want], f"doc {i}"


def test_edge_cases_short_docs():
    texts = ["", "a", "a b", "a b c", "a b c d", "a b c d e f g"]
    toks = _tok_column(texts)
    d, f = winnow_fingerprints_batch(toks, 3, 4)
    # empty doc -> no fingerprints; every non-empty doc -> >= 1
    assert 0 not in set(d.tolist())
    for i in range(1, len(texts)):
        assert i in set(d.tolist()), texts[i]
    for i, words in enumerate(_py_tokens(toks)):
        want = [int(x) for x in winnow_fingerprints(words, 3, 4)]
        got = sorted(int(fi) for di, fi in zip(d, f) if di == i)
        assert got == want, f"doc {i}"


def test_non_adjacent_small_docs_do_not_leak():
    # doc layout [big, small, big, small]: a wrong reduceat segmentation
    # would let small docs' minima span into the following big doc
    big = " ".join(f"tok{i}" for i in range(40))
    texts = [big, "zz yy", big + " tail words here", "qq ww"]
    toks = _tok_column(texts)
    d, f = winnow_fingerprints_batch(toks, 3, 4)
    for i, words in enumerate(_py_tokens(toks)):
        want = [int(x) for x in winnow_fingerprints(words, 3, 4)]
        got = sorted(int(fi) for di, fi in zip(d, f) if di == i)
        assert got == want, f"doc {i}"


def test_winnow_survives_local_edit():
    # the MOSS property: a local edit changes only nearby fingerprints,
    # so two near-copies share most of their sets (md5 shares none)
    base = " ".join(f"w{i}" for i in range(100))
    edited = base.replace("w50", "EDITED")
    toks = _tok_column([base, edited])
    d, f = winnow_fingerprints_batch(toks, 3, 4)
    a = {int(fi) for di, fi in zip(d, f) if di == 0}
    b = {int(fi) for di, fi in zip(d, f) if di == 1}
    jac = len(a & b) / len(a | b)
    assert jac > 0.8


def test_winnow_fp_ds_pipeline(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = winnow_fp_ds(docs).to_pandas()
    assert set(out.columns) == {"doc_id", "fp"}
    assert len(out) > 0
    # per-doc distinct
    assert not out.duplicated(["doc_id", "fp"]).any()


def test_winnow_md5_matches_python_reference(ray_session):
    """winnow_md5_fp_ds == brute-force reference: distinct union of
    window minima over md5-hex k-gram hashes (k=3, w=4)."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.text import winnow_md5_fp_ds

    texts = [
        "a b c d e f g h i j",
        "short doc",                      # < k+w-1 tokens: no window
        "x y x y x y x y x y x y",        # heavy repetition -> tied hashes
        "a b c d e f g h i j",            # exact dup of doc 0
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {
        (r["doc_id"], r["fp"])
        for r in winnow_md5_fp_ds(docs, k=3, w=4).take_all()
    }
    want = set()
    for did, t in enumerate(texts):
        ts = [x for x in t.split(" ") if x]
        grams = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
        hs = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
        for i in range(len(hs) - 3):
            want.add((did, min(hs[i : i + 4])))
    assert got == want
    assert not any(d == 1 for d, _ in got)  # short doc emits nothing


def test_winnow_md5_tail_batch_between_k_and_window(ray_session):
    """A batch whose flat token count n is in [k, k+w-1) (e.g. one 4-token
    doc at k=3, w=4) has grams but no full window: must return empty, not
    raise from sliding_window_view."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.text import winnow_md5_fp_ds

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["a b c d"]})
    )
    assert winnow_md5_fp_ds(docs, k=3, w=4).take_all() == []
