"""In-memory index + doc-store state used by the query engine.

The reference's Storage (memory-storage.ts / binary-file-storage.ts) becomes:

- ``InvertedIndex``: term -> doc_id-ascending postings (numpy arrays) with
  per-term tf arrays for BM25 (the reference stores docID-only postings,
  memory-storage.ts:17; tf is our scale-mode extension).
- ``DocStore``: doc_id -> DocRecord(title, url, words); the per-document
  positional index (Page.index, engine.ts:88-94) is rebuilt lazily from the
  token list and cached — identical content, less storage.

Both can be fully in-memory (conformance corpora) or backed by the on-disk
segment/docs layout written by the Ray build pipeline (state/segments.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Sequence

import numpy as np

from search_engine_ray.tokenize import build_position_index


@dataclass
class DocRecord:
    title: str
    url: str
    words: list[str]
    _index: dict[str, list[int]] | None = field(default=None, repr=False)

    @property
    def index(self) -> dict[str, list[int]]:
        if self._index is None:
            self._index = build_position_index(self.words)
        return self._index

    @property
    def dl(self) -> int:
        return len(self.words)


class DocStore:
    """doc_id -> DocRecord. Maps to the reference's pages store
    (memory-storage.ts:34, binary-file-storage.ts:132-165)."""

    def __init__(self) -> None:
        self._docs: dict[int, DocRecord] = {}

    def put(self, doc_id: int, rec: DocRecord) -> None:
        self._docs[doc_id] = rec

    def get(self, doc_id: int) -> DocRecord | None:
        return self._docs.get(doc_id)

    def __len__(self) -> int:
        return len(self._docs)

    def __contains__(self, doc_id: int) -> bool:
        return doc_id in self._docs

    def doc_ids(self) -> list[int]:
        return list(self._docs)

    def doc_lengths(self) -> tuple[np.ndarray, np.ndarray]:
        ids = np.fromiter(self._docs.keys(), dtype=np.int64, count=len(self._docs))
        dls = np.fromiter(
            (len(r.words) for r in self._docs.values()), dtype=np.int64, count=len(self._docs)
        )
        order = np.argsort(ids, kind="stable")
        return ids[order], dls[order]


class InvertedIndex:
    """term -> (doc_ids asc, tfs). Postings arrive doc_id-sorted from the
    build pipeline; ``add_sorted_run`` asserts monotonicity."""

    def __init__(self) -> None:
        self._postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def set_postings(self, term: str, doc_ids: np.ndarray, tfs: np.ndarray) -> None:
        self._postings[term] = (
            np.asarray(doc_ids, dtype=np.int64),
            np.asarray(tfs, dtype=np.int32),
        )

    def get(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        return self._postings.get(term)

    def df(self, term: str) -> int:
        p = self._postings.get(term)
        return 0 if p is None else len(p[0])

    def terms(self) -> list[str]:
        return list(self._postings)

    def __len__(self) -> int:
        return len(self._postings)

    def iterator(self, term: str) -> Iterator[int]:
        """Lazy ascending-doc_id iterator — the reference getWordIterator
        (memory-storage.ts:51-62) without its accidental O(n^2)."""
        p = self._postings.get(term)
        if p is None:
            return iter(())
        return iter(p[0].tolist())


def replay_seed_assignment(
    ranks: Sequence[int], allow_negative_error: bool = True
) -> list[int]:
    """Deterministic replay of the reference's sequential pageId assignment.

    getSeed (memory-storage.ts:101-106): probe rank, rank-1, ... until free;
    error below 0. Applied over docs in add order. This is the compat-mode
    doc_id assignment (SURVEY §7.3.1a); scale mode uses unique ranks directly.
    """
    taken: set[int] = set()
    out: list[int] = []
    for rank in ranks:
        pid = rank
        while pid in taken:
            pid -= 1
        if pid < 0 and allow_negative_error:
            raise ValueError("Rank <= 0")
        taken.add(pid)
        out.append(pid)
    return out
