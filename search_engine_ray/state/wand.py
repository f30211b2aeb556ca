"""Vectorized disjunctive (OR) top-k BM25 over decoded posting runs.

The serving path decodes each query term's postings into numpy arrays once
(state/segments.py lookup); given that, the optimal single-node evaluation
is exact term-at-a-time (TAAT) accumulation (Turtle & Flood, 1995) done as
a handful of numpy kernels:

1. per-term BM25 scores for ALL postings in one vectorized expression;
2. accumulate into a dense per-doc score array (doc_id ranges are bounded
   per index generation) or, when the doc range is too wide, a sort-merge
   over the concatenated (doc_id, score) pairs;
3. exact top-k selection by partition + lexsort with the engine's ordering
   rule: score desc, tie -> LOWER doc_id (static rank, engine.ts:238).

Round 1 implemented classic block-max WAND (Ding & Suel, SIGIR 2011) as a
per-document Python cursor loop; on a 2M-doc zipf index the hot-term OR
query (1M-posting list) took ~16 s — the interpreter loop cost 1000x more
than the postings decode it was trying to skip. TAAT scores the same list
in ~10 ms. The stored per-block metadata (block_last/block_bound,
state/segments.py) remains the decode-time skip structure: the scale path
beyond this module is to prune whole 128-posting blocks BEFORE varint
decode using those bounds, which matters once single lists exceed memory;
per-query cost here is O(matched postings) fully vectorized, the same cost
class as Lucene's TAAT scoring.

Float-exactness note: accumulation order is term-major (each doc's score
is summed in query-term order), identical to ``brute_force_topk``'s
dict accumulation — results are bit-identical, which the equivalence tests
(tests/test_bm25_wand.py) rely on.
"""

from __future__ import annotations

import numpy as np

from search_engine_ray.functions.scoring import bm25_term_scores

# dense accumulator cap: doc_id span * 8 bytes; 1 << 24 docs = 128 MiB
_DENSE_SPAN_CAP = 1 << 24


def _term_score_arrays(
    postings: list[dict], n_docs: int, avgdl: float, k1: float, b: float
) -> list[np.ndarray]:
    return [
        bm25_term_scores(
            p["tfs"].astype(np.float64),
            p["dls"].astype(np.float64),
            len(p["doc_ids"]),
            n_docs,
            avgdl,
            k1,
            b,
        )
        for p in postings
    ]


def _select_topk(
    docs: np.ndarray, vals: np.ndarray, k: int
) -> list[tuple[int, float]]:
    """Exact top-k by (score desc, doc_id asc) over unique (doc, score)."""
    n = len(docs)
    if n > k:
        kth = np.partition(vals, n - k)[n - k]
        mask = vals >= kth  # keep boundary ties; lexsort resolves them
        docs, vals = docs[mask], vals[mask]
    order = np.lexsort((docs, -vals))[:k]
    return [(int(docs[i]), float(vals[i])) for i in order]


def wand_topk(
    postings: list[dict],
    k: int,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score), ordered score desc then doc_id asc.

    ``postings`` entries are SegmentReader.lookup dicts. Name kept from the
    round-1 WAND implementation for API stability; evaluation is exact
    vectorized TAAT (see module docstring)."""
    postings = [p for p in postings if len(p["doc_ids"])]
    if not postings or k <= 0:
        return []
    scores = _term_score_arrays(postings, n_docs, avgdl, k1, b)

    if len(postings) == 1:
        return _select_topk(postings[0]["doc_ids"].astype(np.int64), scores[0], k)

    lo = min(int(p["doc_ids"][0]) for p in postings)
    hi = max(int(p["doc_ids"][-1]) for p in postings)
    span = hi - lo + 1
    if span <= _DENSE_SPAN_CAP:
        # Dense TAAT: doc_ids are unique within a term, so fancy-index add
        # is safe per term; BM25 scores are strictly positive (idf has a +1
        # floor), so nonzero == present.
        acc = np.zeros(span, dtype=np.float64)
        for p, s in zip(postings, scores):
            acc[p["doc_ids"] - lo] += s
        present = np.flatnonzero(acc)
        return _select_topk(present + lo, acc[present], k)

    # Sparse fallback (unbounded doc span): stable sort-merge keeps values in
    # term order within each doc group; np.add.at accumulates in array order,
    # preserving the same summation order as the dense path.
    all_docs = np.concatenate([p["doc_ids"].astype(np.int64) for p in postings])
    all_scores = np.concatenate(scores)
    order = np.argsort(all_docs, kind="stable")
    d = all_docs[order]
    s = all_scores[order]
    starts = np.flatnonzero(np.diff(d, prepend=d[0] - 1) != 0)
    group_ids = np.cumsum(np.diff(d, prepend=d[0] - 1) != 0) - 1
    sums = np.zeros(len(starts), dtype=np.float64)
    np.add.at(sums, group_ids, s)
    return _select_topk(d[starts], sums, k)


def brute_force_topk(
    postings: list[dict],
    k: int,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
) -> list[tuple[int, float]]:
    """Reference implementation for equivalence tests: score the full union."""
    scores: dict[int, float] = {}
    for p in postings:
        s = bm25_term_scores(
            p["tfs"].astype(np.float64),
            p["dls"].astype(np.float64),
            len(p["doc_ids"]),
            n_docs,
            avgdl,
            k1,
            b,
        )
        for d, v in zip(p["doc_ids"].tolist(), s.tolist()):
            scores[d] = scores.get(d, 0.0) + v
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(int(d), float(s)) for d, s in ranked]
