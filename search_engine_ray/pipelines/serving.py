"""Segment-backed query serving — the T6 rebuild (SURVEY §2.3).

``SegmentSearcher`` serves queries directly off the on-disk segment/docs
layout with parquet predicate pushdown: per-query it reads ONLY the rows of
the query terms and the <= max_count candidate documents, holding an LRU doc
cache (the reference re-read each page JSON up to 3x per scored page,
engine.ts:119,214,220 — the cache removes exactly that).

Intended deployment shape: one (or a pool of) Ray actor(s) holding this
object; here it is a plain class so tests/bench drive it in-process.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.intersect import (
    intersect,
    is_adjacent_words,
    min_window_span,
)
from search_engine_ray.functions.scoring import compat_score, order_candidates
from search_engine_ray.functions.snippets import construct_introduction
from search_engine_ray.pipelines.query import SearchResult, _unique
from search_engine_ray.state.index import DocRecord
from search_engine_ray.state.segments import SegmentReader
from search_engine_ray.state.wand import wand_topk
from search_engine_ray.tokenize import to_words


class SegmentSearcher:
    def __init__(
        self, out_dir: str, config: EngineConfig | None = None, doc_cache: int = 4096
    ) -> None:
        self.config = config or EngineConfig()
        self.reader = SegmentReader(out_dir)
        m = self.reader.manifest
        self.n_docs = int(m.get("n_docs", 0))
        self.avgdl = float(m.get("avgdl", 0.0))
        self._cache: OrderedDict[int, DocRecord] = OrderedDict()
        self._cache_cap = doc_cache
        # postings LRU: hot query terms skip the parquet read entirely
        self._term_cache: OrderedDict[str, dict | None] = OrderedDict()
        self._term_cache_cap = 8192

    # -- doc access ----------------------------------------------------------

    def _get_docs(self, doc_ids: list[int]) -> dict[int, DocRecord]:
        missing = [d for d in doc_ids if d not in self._cache]
        if missing:
            fetched = self.reader.fetch_docs(missing)
            for d, rec in fetched.items():
                self._cache[d] = rec
                self._cache.move_to_end(d)
            while len(self._cache) > self._cache_cap:
                self._cache.popitem(last=False)
        return {d: self._cache[d] for d in doc_ids if d in self._cache}

    def _get_doc(self, doc_id: int) -> DocRecord | None:
        return self._get_docs([doc_id]).get(doc_id)

    def _lookup(self, terms: list[str]) -> dict[str, dict]:
        missing = [t for t in set(terms) if t not in self._term_cache]
        if missing:
            fetched = self.reader.lookup(missing)
            for t in missing:
                self._term_cache[t] = fetched.get(t)
                self._term_cache.move_to_end(t)
            while len(self._term_cache) > self._term_cache_cap:
                self._term_cache.popitem(last=False)
        return {
            t: self._term_cache[t]
            for t in set(terms)
            if self._term_cache.get(t) is not None
        }

    # -- reference-compat search --------------------------------------------

    def search(self, text: str, max_count: int = 100) -> list[SearchResult]:
        words, quotes = to_words(text)
        wwsw = [w for w in words if not self.config.is_stop_word(w)]
        postings = self._lookup(sorted({w.lower() for w in wwsw}))

        def is_quote_on_page(doc_id: int) -> bool:
            if not quotes:
                return True
            page = self._get_doc(doc_id)
            if page is None:
                return False
            for i in range(0, len(quotes), 2):
                if is_adjacent_words(words[quotes[i] : quotes[i + 1]], page.index):
                    return True
            return False

        iters = []
        for w in wwsw:
            p = postings.get(w.lower())
            iters.append(iter(p["doc_ids"].tolist()) if p else iter(()))
        cand = _unique(intersect(iters, 100, is_quote_on_page))

        pages = self._get_docs(cand)
        scores = {
            d: compat_score(
                wwsw, pages[d].index, pages[d].title, pages[d].url,
                self.config.score_weights,
            )
            for d in cand
        }
        ordered = order_candidates(cand, scores)

        out = []
        for d in ordered[:max_count]:
            page = pages[d]
            out.append(
                SearchResult(
                    title=page.title,
                    introduction=construct_introduction(
                        words, quotes, page.words, page.index
                    ),
                    url=page.url,
                    doc_id=d,
                    score=scores[d],
                )
            )
        return out

    # -- proximity search ------------------------------------------------------

    def search_near(
        self, text: str, slop: int = 2, max_count: int = 100
    ) -> list[int]:
        """Proximity search: docs where ALL query terms co-occur within a
        window of ``slop`` words, in ANY order (Lucene ``term1 term2``~slop
        analogue; slop=0 over two terms means adjacent either way). The
        reference engine stops at exact in-order phrases (engine.ts:250-284);
        this generalizes the same positional index.

        Cost shape: postings-only conjunctive candidate intersection
        (vectorized np.intersect1d over the pruned per-term point reads),
        then positional verification per candidate from the doc store in
        bounded fetch chunks — the same candidate-bounded access pattern as
        the compat phrase gate. Returns ascending doc_ids (deterministic,
        oracle-comparable); wrap with ``_rank_bm25``-style scoring for
        ranked output."""
        words, _ = to_words(text)
        terms = sorted({w.lower() for w in words if not self.config.is_stop_word(w)})
        if not terms:
            return []
        postings = self._lookup(terms)
        if len(postings) < len(terms):
            return []  # some term absent from the index -> no conjunction
        cand = postings[terms[0]]["doc_ids"]
        for t in terms[1:]:
            cand = np.intersect1d(cand, postings[t]["doc_ids"], assume_unique=True)
        out: list[int] = []
        CHUNK = 512  # bounds doc-store fetch + LRU pressure per step
        for lo in range(0, len(cand), CHUNK):
            pages = self._get_docs([int(d) for d in cand[lo : lo + CHUNK]])
            for d in sorted(pages):
                idx = pages[d].index
                if min_window_span([idx.get(t, []) for t in terms]) <= slop:
                    out.append(d)
                    if len(out) >= max_count:
                        return out
        return out

    # -- BM25 top-k -----------------------------------------------------------

    def _phrase_ok(self, doc_id: int, words: list[str], quotes: list[int]) -> bool:
        page = self._get_doc(doc_id)
        return page is not None and any(
            is_adjacent_words(words[quotes[i] : quotes[i + 1]], page.index)
            for i in range(0, len(quotes), 2)
        )

    def search_bm25(
        self, text: str, k: int = 10, mode: str = "or"
    ) -> list[SearchResult]:
        """``mode="or"``: vectorized disjunctive top-k (state/wand.py).
        ``mode="and"``: conjunctive candidates (reference semantics) scored
        by BM25.

        The quote/phrase gate is applied at candidate generation, matching
        Searcher.search_bm25 (pipelines/query.py): AND mode gates the full
        conjunctive candidate set before top-k; OR mode re-runs with a
        larger k until k phrase-matching docs are found or the union is
        exhausted — the gate never silently truncates the result below k
        while qualifying docs exist."""
        ranked, words, quotes = self._rank_bm25(text, k, mode)
        ids = [d for d, _ in ranked]
        pages = self._get_docs(ids)
        return [
            SearchResult(
                title=pages[d].title,
                introduction=construct_introduction(
                    words, quotes, pages[d].words, pages[d].index
                ),
                url=pages[d].url,
                doc_id=d,
                score=s,
            )
            for d, s in ranked
        ]

    def _rank_bm25(
        self, text: str, k: int, mode: str
    ) -> tuple[list[tuple[int, float]], list[str], list[int]]:
        """Ranking WITHOUT the doc-store render fetch — batch serving ranks
        a whole query batch first, then fetches the union of result docs in
        ONE point read (see _BatchSearchActor)."""
        words, quotes = to_words(text)
        terms = sorted({w.lower() for w in words if not self.config.is_stop_word(w)})
        if not terms:
            return [], words, quotes
        post = self._lookup(terms)
        postings = [post[t] for t in terms if t in post]
        if mode == "and" and len(postings) < len(terms):
            return [], words, quotes
        if not postings:
            return [], words, quotes

        if mode == "or":
            union_cap = sum(len(p["doc_ids"]) for p in postings)
            k_run = k
            while True:
                ranked = wand_topk(
                    postings, k_run, self.n_docs, self.avgdl,
                    self.config.bm25_k1, self.config.bm25_b,
                )
                if quotes:
                    ranked = [
                        (d, s) for d, s in ranked if self._phrase_ok(d, words, quotes)
                    ]
                if len(ranked) >= k or k_run >= union_cap:
                    ranked = ranked[:k]
                    break
                k_run = min(union_cap, k_run * 4)
        elif mode == "and":
            from search_engine_ray.functions.scoring import bm25_term_scores

            # searchsorted intersection over the SORTED doc_id arrays,
            # carrying each term's gather positions along — one pass, no
            # sort-based intersect1d and no second searchsorted for tf/dl
            # lookup (3x faster on head-term conjunctions)
            cand = postings[0]["doc_ids"]
            idxs = [np.arange(len(cand), dtype=np.int64)]
            for p in postings[1:]:
                b = p["doc_ids"]
                if not len(b) or not len(cand):
                    cand = cand[:0]
                    break
                pos = np.minimum(np.searchsorted(b, cand), len(b) - 1)
                m = b[pos] == cand
                cand = cand[m]
                idxs = [ix[m] for ix in idxs]
                idxs.append(pos[m])
            if quotes and len(cand):
                keep_mask = np.fromiter(
                    (self._phrase_ok(int(d), words, quotes) for d in cand),
                    dtype=bool,
                    count=len(cand),
                )
                cand = cand[keep_mask]
                idxs = [ix[keep_mask] for ix in idxs]
            if len(cand) == 0:
                return [], words, quotes
            total = np.zeros(len(cand), dtype=np.float64)
            for p, ix in zip(postings, idxs):
                total += bm25_term_scores(
                    p["tfs"][ix].astype(np.float64),
                    p["dls"][ix].astype(np.float64),
                    p["df"], self.n_docs, self.avgdl,
                    self.config.bm25_k1, self.config.bm25_b,
                )
            # partial top-k (keep boundary ties), then the exact ordering
            if len(cand) > 4 * k:
                kth = np.partition(-total, k - 1)[k - 1]
                sel = np.flatnonzero(-total <= kth)
                cand, total = cand[sel], total[sel]
            order = np.lexsort((cand, -total))[:k]
            ranked = [(int(cand[i]), float(total[i])) for i in order]
        else:
            raise ValueError(f"unknown mode: {mode}")
        return ranked, words, quotes


class _BatchSearchActor:
    """Actor-pool stage for DISTRIBUTED query serving: each actor opens the
    index once (__init__) and answers its batches' queries locally — the
    serving side expressed as a Ray Data pipeline (queries in, scored hits
    out), scaling query throughput with ``concurrency`` instead of one
    driver-side searcher."""

    def __init__(self, out_dir: str, config: EngineConfig | None, k: int, mode: str):
        self.searcher = SegmentSearcher(out_dir, config)
        self.k = k
        self.mode = mode

    def __call__(self, batch):
        import pyarrow as pa

        from search_engine_ray.tokenize import to_words

        qids, queries = (
            batch.column("query_id").to_pylist(),
            batch.column("query").to_pylist(),
        )
        s = self.searcher
        # batch term prefetch: ONE pruned segment read covers every query
        # in the batch (per-query lookups re-read parquet for each cold
        # term — measured 40x slower at a 500k-doc index)
        terms: set[str] = set()
        for q in queries:
            words, _ = to_words(q)
            terms.update(
                w.lower() for w in words if not s.config.is_stop_word(w)
            )
        if terms:
            s._lookup(sorted(terms))
        # rank only: the output is (query_id, doc_id, score) — the old path
        # paid a full doc-store fetch + snippet render per query and threw
        # both away (measured: the fetch was 98% of batch wall time)
        out_q, out_d, out_s = [], [], []
        for qid, q in zip(qids, queries):
            ranked, _, _ = s._rank_bm25(q, self.k, self.mode)
            for d, score in ranked:
                out_q.append(qid)
                out_d.append(d)
                out_s.append(round(score, 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def batch_search_bm25_ds(
    queries,
    out_dir: str,
    config: EngineConfig | None = None,
    k: int = 10,
    mode: str = "and",
    concurrency: int | None = None,
    batch_size: int = 64,
):
    """(query_id, query) Dataset -> (query_id, doc_id, score) Dataset via a
    SegmentSearcher actor pool. The index opens once per actor; term/doc
    LRUs amortize across that actor's queries."""
    if concurrency is None:
        from search_engine_ray.util import default_pool_size

        concurrency = min(4, default_pool_size())
    return queries.map_batches(
        _BatchSearchActor,
        fn_constructor_args=(out_dir, config, k, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
