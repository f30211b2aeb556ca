"""Query engine: reference-compat search + BM25 top-k.

``Searcher.search`` is the behavior-exact rebuild of ``Engine.search``
(engine.ts:105-151): tokenize -> stop-word-filter -> postings iterators ->
conjunctive intersect with hard-coded maxCount=100 (engine.ts:134) and the
quote gate (engine.ts:117-125) -> uniqueArr -> scorePages -> snippets.

``Searcher.search_bm25`` is the scale-mode scorer (BM25, doc_id tiebreak),
evaluated document-at-a-time over the same postings; see state/wand.py for
the block-max WAND variant used on encoded segments.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.intersect import (
    intersect,
    is_adjacent_words,
)
from search_engine_ray.functions.scoring import (
    bm25_term_scores,
    compat_score,
    order_candidates,
)
from search_engine_ray.functions.snippets import construct_introduction
from search_engine_ray.state.index import DocStore, InvertedIndex
from search_engine_ray.tokenize import to_words


@dataclass
class SearchResult:
    title: str
    introduction: str
    url: str
    doc_id: int
    score: float = 0.0


class Searcher:
    def __init__(
        self, config: EngineConfig, index: InvertedIndex, docs: DocStore
    ) -> None:
        self.config = config
        self.index = index
        self.docs = docs
        # BM25 corpus stats
        self._n_docs = len(docs)
        if self._n_docs:
            _, dls = docs.doc_lengths()
            self._avgdl = float(dls.mean())
        else:
            self._avgdl = 0.0

    # -- reference-compat path ---------------------------------------------

    def search(self, text: str, max_count: int = 100) -> list[SearchResult]:
        words, quotes = to_words(text)
        wwsw = [w for w in words if not self.config.is_stop_word(w)]

        def is_quote_on_page(doc_id: int) -> bool:
            # engine.ts:117-125 — OR across quote spans; no quotes -> True
            if not quotes:
                return True
            page = self.docs.get(doc_id)
            for i in range(0, len(quotes), 2):
                quoted_words = words[quotes[i] : quotes[i + 1]]
                if is_adjacent_words(quoted_words, page.index):  # type: ignore[union-attr]
                    return True
            return False

        iters = [self.index.iterator(w.lower()) for w in wwsw]
        # engine.ts:134 — maxCount hard-coded to 100 here, NOT the search arg
        pages = _unique(intersect(iters, 100, is_quote_on_page))
        sorted_pages = self._score_pages(wwsw, pages)

        out: list[SearchResult] = []
        for doc_id in sorted_pages[:max_count]:
            page = self.docs.get(doc_id)
            assert page is not None
            out.append(
                SearchResult(
                    title=page.title,
                    introduction=construct_introduction(
                        words, quotes, page.words, page.index
                    ),
                    url=page.url,
                    doc_id=doc_id,
                )
            )
        return out

    def _score_pages(self, words: list[str], pages: list[int]) -> list[int]:
        scores: dict[int, float] = {}
        for doc_id in pages:
            page = self.docs.get(doc_id)
            assert page is not None
            scores[doc_id] = compat_score(
                words, page.index, page.title, page.url, self.config.score_weights
            )
        return order_candidates(pages, scores)

    # -- BM25 (scale mode) --------------------------------------------------

    def search_bm25(self, text: str, k: int = 10) -> list[SearchResult]:
        """Conjunctive BM25 top-k: candidates = AND of all non-stop query
        terms; score = sum of per-term BM25; order (score desc, doc_id asc).

        Quote spans are honored as a phrase filter, like the compat path."""
        words, quotes = to_words(text)
        terms = sorted(
            {w.lower() for w in words if not self.config.is_stop_word(w)}
        )
        if not terms:
            return []
        postings = []
        for t in terms:
            p = self.index.get(t)
            if p is None:
                return []
            postings.append(p)
        # intersect doc_id arrays (all sorted ascending)
        cand = postings[0][0]
        for doc_ids, _ in postings[1:]:
            cand = np.intersect1d(cand, doc_ids, assume_unique=True)
        if len(cand) == 0:
            return []
        # phrase gate
        if quotes:
            keep = []
            for d in cand.tolist():
                page = self.docs.get(d)
                ok = False
                for i in range(0, len(quotes), 2):
                    if is_adjacent_words(words[quotes[i] : quotes[i + 1]], page.index):
                        ok = True
                        break
                if ok:
                    keep.append(d)
            cand = np.asarray(keep, dtype=np.int64)
            if len(cand) == 0:
                return []

        dls = np.asarray([self.docs.get(int(d)).dl for d in cand], dtype=np.float64)
        total = np.zeros(len(cand), dtype=np.float64)
        for t, (doc_ids, tfs) in zip(terms, postings):
            pos = np.searchsorted(doc_ids, cand)
            tf = tfs[pos].astype(np.float64)
            total += bm25_term_scores(
                tf,
                dls,
                df=len(doc_ids),
                n_docs=self._n_docs,
                avgdl=self._avgdl,
                k1=self.config.bm25_k1,
                b=self.config.bm25_b,
            )
        order = np.lexsort((cand, -total))[:k]
        out = []
        for i in order.tolist():
            d = int(cand[i])
            page = self.docs.get(d)
            out.append(
                SearchResult(
                    title=page.title,
                    introduction=construct_introduction(
                        words, quotes, page.words, page.index
                    ),
                    url=page.url,
                    doc_id=d,
                    score=float(total[i]),
                )
            )
        return out


def _unique(arr: list[int]) -> list[int]:
    """engine.ts:380-382 — preserves first-seen order."""
    return list(dict.fromkeys(arr))


def rrf_fuse_ds(rankings, k: int = 60, topk: int = 10):
    """Reciprocal Rank Fusion (Cormack et al., SIGIR'09): fuse ranked
    result lists into one ranking by score(d) = sum over lists of
    1 / (k + rank_d), rank 1-based; docs absent from a list contribute 0.

    ``rankings`` is a list of Datasets with (doc_id, rank) columns — the
    bounded OUTPUT of upstream rankers (BM25 top-k, ANN top-k, a lexical
    ranking), so every stage here is small by construction: union of the
    ranked lists, one groupby sum, one sort-limit. Fusion of float-free
    RANKS makes the result hash-stable across engines (the standard reason
    RRF beats score interpolation for heterogeneous rankers).

    Output: (doc_id, rrf, fused_rank), top-``topk`` by (rrf DESC, doc_id),
    rrf rounded to 6 dp.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd
    from ray.data.aggregate import Sum

    def contrib(batch: pa.Table) -> pa.Table:
        r = pc.cast(batch.column("rank"), pa.float64())
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "part": pc.divide(1.0, pc.add(r, float(k))),
            }
        )

    parts = [ds.map_batches(contrib, batch_format="pyarrow") for ds in rankings]
    u = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    fused = u.groupby("doc_id").aggregate(Sum("part", alias_name="rrf"))
    top = fused.sort(["rrf", "doc_id"], descending=[True, False]).limit(topk)
    # order and rank on the UNROUNDED sums (rounding first could collapse
    # near-ties the SQL oracle still separates); round for output only
    out = top.to_pandas()
    out = out.sort_values(["rrf", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    out["fused_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["rrf"] = out["rrf"].round(6)
    return rd.from_pandas(out[["doc_id", "rrf", "fused_rank"]])
