"""Candidate scoring — reference-compat (R1-R4) and BM25.

Compat scorer is a behavior-exact replica of ``Engine.scorePages``
(engine.ts:158-243), including:

- R1 titleEqual (engine.ts:169-191): ``matches`` counts query words whose
  FIRST occurrence position on the page equals the word's index in the query;
  ``pos`` is computed with JS's default (lexicographic-string!) Array.sort
  over the indexOf results; the indexOf compares the ORIGINAL-case query word
  against the lowercased title tokens.
- R2 urlMatch (engine.ts:197-205): the pattern string ``'(?![\\w\\d])'`` in a
  JS string literal collapses to ``(?![wd])`` — so a word starting with
  w/W/d/D never matches, and the char after the match may not be w/W/d/D.
  Load-bearing for the Rank-Haber goldens (engine.test.ts:286-299).
- R3 getScore (engine.ts:211-223): score 0 when no scoreWeights configured.
- R4 ordering (engine.ts:234-241): score desc, tie -> doc_id asc.

BM25 is the scale-mode scorer the reference lacks (SURVEY §7.3.6):
``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with the same static-rank
(doc_id asc) tiebreak.
"""

from __future__ import annotations

import math
import re
from typing import Callable, Sequence

import numpy as np

from search_engine_ray.config import EngineConfig, ScoreWeights
from search_engine_ray.tokenize import to_words


def title_equal(
    words: Sequence[str],
    page_index: dict[str, list[int]],
    title: str,
) -> tuple[bool, bool, int | None]:
    """R1 (engine.ts:169-191) -> (exact, begins, pos)."""
    matches = 0
    for index, word in enumerate(words):
        indices = page_index.get(word.lower())
        if not indices:
            continue
        if indices[0] == index:
            matches += 1
    title_words, _ = to_words(title, lower_case=True)
    # JS: words.map(w => titleWords.indexOf(w)).filter(i => i > -1).sort()[0]
    # Array.sort() without comparator sorts NUMBERS AS STRINGS.
    idxs = []
    for word in words:
        try:
            i = title_words.index(word)  # original query case vs lowered title
        except ValueError:
            i = -1
        if i > -1:
            idxs.append(i)
    pos: int | None = None
    if idxs:
        pos = sorted(idxs, key=str)[0]
    return matches == len(title_words), matches > 0, pos


_URL_RE_CACHE: dict[str, re.Pattern[str]] = {}


def url_match(words: Sequence[str], url: str) -> bool:
    """R2 (engine.ts:197-205) with the ``[wd]`` quirk, case-insensitive.

    Tokenizer output contains only [A-Za-z0-9_åäö] so raw interpolation into
    the pattern is safe (as in the reference)."""
    if not words:
        return True  # 0 >= 0
    for word in words:
        pat = _URL_RE_CACHE.get(word)
        if pat is None:
            pat = re.compile("(?![wd])" + word + "(?![wd])", re.IGNORECASE)
            _URL_RE_CACHE[word] = pat
        if not pat.search(url):
            return False
    return True


def compat_score(
    words: Sequence[str],
    page_index: dict[str, list[int]],
    title: str,
    url: str,
    weights: ScoreWeights | None,
) -> float:
    """R3 (engine.ts:211-223)."""
    score = 0.0
    if weights is None:
        return score
    exact, begins, pos = title_equal(words, page_index, title)
    if exact:
        score += weights.title_exact_match
    elif begins:
        score += weights.title_begins
    elif pos is not None and pos < 3:
        score += weights.title_contains_in_beginning
    if url_match(words, url):
        score += weights.url_contains
    return score


def order_candidates(doc_ids: Sequence[int], scores: dict[int, float]) -> list[int]:
    """R4 (engine.ts:234-241): score desc, tie -> doc_id asc."""
    return sorted(doc_ids, key=lambda d: (-scores[d], d))


# ---------------------------------------------------------------------------
# BM25 (scale mode)
# ---------------------------------------------------------------------------


def bm25_idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Robertson-Sparck-Jones idf with +1 floor (Lucene-style, always > 0)."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_scores(
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """Vectorized BM25 contribution of one term over its postings."""
    idf = bm25_idf(float(df), n_docs)
    denom = tf + k1 * (1.0 - b + b * (dl / avgdl))
    return idf * tf * (k1 + 1.0) / denom


def bm25_term_upper_bound(
    max_tf: float, min_dl: float, df: int, n_docs: int, avgdl: float, k1: float, b: float
) -> float:
    """Upper bound of a term's BM25 contribution (for WAND / block-max).

    BM25 is monotone increasing in tf and decreasing in dl, so evaluating at
    (max tf, min dl) within a block bounds every posting in the block."""
    idf = float(bm25_idf(float(df), n_docs))
    denom = max_tf + k1 * (1.0 - b + b * (min_dl / avgdl))
    return idf * max_tf * (k1 + 1.0) / denom
