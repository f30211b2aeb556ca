"""LocalEngine — sequential in-process build, the differential oracle.

Mirrors ``Engine.add`` (engine.ts:43-99) + MemoryStorage exactly: sequential
getSeed doc_id assignment, per-page term dedup, sorted posting insertion.
Used by tests to validate that the Ray Data build pipeline produces an
identical index, and by the golden conformance suite.

Not a production path — the Ray pipeline (pipelines/build.py) is the engine.
"""

from __future__ import annotations

import bisect

from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.query import Searcher
from search_engine_ray.state.index import DocRecord, DocStore, InvertedIndex
from search_engine_ray.tokenize import build_position_index, to_words


class LocalEngine:
    def __init__(self, config: EngineConfig | None = None) -> None:
        self.config = config or EngineConfig()
        self._postings: dict[str, list[int]] = {}
        self.docs = DocStore()
        self._url_to_page: dict[str, int] = {}
        self._searcher: Searcher | None = None

    def add(self, title: str, text: str, url: str, rank: int) -> int:
        words, _ = to_words(title + " " + text)

        # dup check (engine.ts:56-58). QUIRK: JS truthiness — a url mapped to
        # pageId 0 is NOT detected as a duplicate. Replicated.
        existing = self._url_to_page.get(url)
        if existing:
            raise ValueError(f"page already in index: {url}, {existing}")

        # getSeed downward probe (memory-storage.ts:101-106)
        seed = rank
        while seed in self.docs:
            seed -= 1
        if seed < 0:
            raise ValueError("Rank <= 0")

        self._url_to_page[url] = seed

        # lowercase -> stop-word filter -> per-page dedup (engine.ts:65-77)
        added: set[str] = set()
        for word in words:
            w = word.lower()
            if self.config.is_stop_word(w) or w in added:
                continue
            added.add(w)
            lst = self._postings.setdefault(w, [])
            bisect.insort(lst, seed)  # sorted insert (memory-storage.ts:252-260)

        self.docs.put(seed, DocRecord(title=title, url=url, words=list(words)))
        self._searcher = None
        return seed

    def _build_searcher(self) -> Searcher:
        import numpy as np

        index = InvertedIndex()
        for term, doc_ids in self._postings.items():
            ids = np.asarray(doc_ids, dtype=np.int64)
            tfs = np.asarray(
                [len(self.docs.get(int(d)).index.get(term, ())) for d in doc_ids],
                dtype=np.int32,
            )
            index.set_postings(term, ids, tfs)
        return Searcher(self.config, index, self.docs)

    @property
    def searcher(self) -> Searcher:
        if self._searcher is None:
            self._searcher = self._build_searcher()
        return self._searcher

    def search(self, text: str, max_count: int = 100):
        return self.searcher.search(text, max_count)

    def search_bm25(self, text: str, k: int = 10):
        return self.searcher.search_bm25(text, k)
