"""Posting codec: round-trip lossless, block-max bound validity (FIXTURES §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.functions.scoring import bm25_term_scores, bm25_term_upper_bound
from search_engine_ray.state.codec import (
    block_boundaries,
    decode_doc_ids,
    decode_tfs,
    decode_varints,
    encode_doc_ids,
    encode_tfs,
    encode_varints,
)


def test_varint_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert len(decode_varints(b"")) == 0


def test_varint_known():
    # 0 -> 00, 127 -> 7f, 128 -> 80 01, 300 -> ac 02
    assert encode_varints(np.array([0, 127, 128, 300], dtype=np.uint64)) == bytes(
        [0x00, 0x7F, 0x80, 0x01, 0xAC, 0x02]
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=200)
)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varints(encode_varints(arr)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300, unique=True
    )
)
def test_doc_id_roundtrip(ids):
    ids = sorted(ids)
    arr = np.array(ids, dtype=np.int64)
    assert decode_doc_ids(encode_doc_ids(arr)).tolist() == ids


def test_doc_ids_must_ascend():
    import pytest

    with pytest.raises(ValueError):
        encode_doc_ids(np.array([3, 1], dtype=np.int64))


def test_tf_roundtrip():
    tfs = np.array([1, 5, 255, 1000], dtype=np.int32)
    assert decode_tfs(encode_tfs(tfs)).tolist() == tfs.tolist()


def test_block_boundaries():
    assert block_boundaries(0, 128) == []
    assert block_boundaries(129, 128) == [(0, 128), (128, 129)]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50), st.integers(min_value=5, max_value=500)
        ),
        min_size=1,
        max_size=100,
    )
)
def test_block_bound_dominates_scores(postings):
    """block-max >= every contained BM25 score (FIXTURES §5)."""
    tf = np.array([p[0] for p in postings], dtype=np.float64)
    dl = np.array([p[1] for p in postings], dtype=np.float64)
    df, n_docs, avgdl, k1, b = len(postings), 10000, 120.0, 1.2, 0.75
    scores = bm25_term_scores(tf, dl, df, n_docs, avgdl, k1, b)
    bound = bm25_term_upper_bound(tf.max(), dl.min(), df, n_docs, avgdl, k1, b)
    assert (scores <= bound + 1e-12).all()
