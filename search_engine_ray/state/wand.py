"""Block-max WAND top-k BM25 over decoded posting runs.

Disjunctive (OR) top-k with two pruning levels, following the public
block-max WAND design (Ding & Suel, SIGIR 2011; Broder et al., CIKM 2003):

1. WAND pivot: cursors sorted by current doc_id; the pivot is the first
   cursor where the prefix sum of TERM upper bounds exceeds the current
   threshold (k-th best score so far). Docs before the pivot cannot make
   the top-k.
2. Block-max check: at the pivot doc, the sum of the BLOCK upper bounds
   (stored per 128-posting block at index build, state/segments.py) must
   also beat the threshold, else skip to the earliest next block boundary.

The reference engine has no scored top-k at all (its intersect is
conjunctive with static-rank order, engine.ts:391-431) — this is the
scale-path query operator demanded by the north rule, and it is verified
against brute-force scoring in tests/test_bm25_wand.py.
"""

from __future__ import annotations

import heapq

import numpy as np

from search_engine_ray.functions.scoring import bm25_term_scores

_INF = np.iinfo(np.int64).max


class _Cursor:
    __slots__ = ("doc_ids", "tfs", "dls", "block_last", "block_bound", "ub", "pos", "n", "idf_df")

    def __init__(self, p: dict) -> None:
        self.doc_ids = p["doc_ids"]
        self.tfs = p["tfs"]
        self.dls = p["dls"]
        self.block_last = p["block_last"]
        self.block_bound = p["block_bound"]
        self.ub = float(p["block_bound"].max()) if len(p["block_bound"]) else 0.0
        self.pos = 0
        self.n = len(self.doc_ids)

    def cur(self) -> int:
        return int(self.doc_ids[self.pos]) if self.pos < self.n else _INF

    def next_geq(self, target: int) -> None:
        if self.pos < self.n and self.doc_ids[self.pos] < target:
            self.pos += int(
                np.searchsorted(self.doc_ids[self.pos :], target, side="left")
            )

    def block_bound_at(self, doc: int) -> float:
        b = int(np.searchsorted(self.block_last, doc, side="left"))
        if b >= len(self.block_bound):
            return 0.0
        return float(self.block_bound[b])

    def block_last_at(self, doc: int) -> int:
        b = int(np.searchsorted(self.block_last, doc, side="left"))
        if b >= len(self.block_last):
            return _INF
        return int(self.block_last[b])


def wand_topk(
    postings: list[dict],
    k: int,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score), ordered score desc then doc_id asc.

    ``postings`` entries are SegmentReader.lookup dicts. Ties at the
    threshold boundary are broken toward LOWER doc_id (static rank), matching
    the engine's ordering rule (engine.ts:238)."""
    cursors = [_Cursor(p) for p in postings if len(p["doc_ids"])]
    if not cursors or k <= 0:
        return []

    # heap of (score, -doc_id): smallest score at top; for equal scores a
    # HIGHER doc_id is evicted first, preferring lower doc_ids in the top-k.
    heap: list[tuple[float, int]] = []
    threshold = -1.0

    while True:
        cursors.sort(key=lambda c: c.cur())
        if cursors[0].cur() == _INF:
            break
        # find pivot
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc > threshold:
                pivot_idx = i
                break
        if pivot_idx == -1:
            break  # even the sum of all bounds can't beat the threshold
        pivot_doc = cursors[pivot_idx].cur()
        if pivot_doc == _INF:
            break

        if cursors[0].cur() == pivot_doc:
            # block-max refinement
            bm_sum = sum(
                c.block_bound_at(pivot_doc)
                for c in cursors
                if c.cur() <= pivot_doc
            )
            if bm_sum <= threshold:
                # shallow skip: docs in (pivot, target) can only be scored
                # by the pivot-range cursors, whose current blocks extend to
                # min(block_last) — but a cursor BEYOND the pivot may start
                # contributing at its own cur, so the skip must stop there
                # too (Ding & Suel NextShallow; missing this cap skipped
                # true top-k docs, caught by the incremental-build tests).
                nxt = min(
                    (c.block_last_at(pivot_doc) for c in cursors if c.cur() <= pivot_doc),
                    default=_INF,
                )
                target = nxt + 1 if nxt != _INF else _INF
                beyond = [c.cur() for c in cursors if c.cur() > pivot_doc]
                if beyond:
                    target = min(target, min(beyond))
                if target <= pivot_doc:  # safety: always make progress
                    target = pivot_doc + 1
                for c in cursors:
                    if c.cur() <= pivot_doc:
                        c.next_geq(target)
                continue
            # full evaluation
            score = 0.0
            for c in cursors:
                if c.cur() == pivot_doc:
                    tf = float(c.tfs[c.pos])
                    dl = float(c.dls[c.pos])
                    df = c.n
                    score += float(
                        bm25_term_scores(
                            np.array([tf]), np.array([dl]), df, n_docs, avgdl, k1, b
                        )[0]
                    )
            entry = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
                if len(heap) == k:
                    threshold = heap[0][0]
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
                threshold = heap[0][0]
            for c in cursors:
                if c.cur() == pivot_doc:
                    c.next_geq(pivot_doc + 1)
        else:
            # advance pre-pivot cursors to the pivot doc
            for c in cursors:
                if c.cur() < pivot_doc:
                    c.next_geq(pivot_doc)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-nd, s) for s, nd in out]


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
