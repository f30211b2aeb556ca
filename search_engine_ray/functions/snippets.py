"""Snippet ("introduction") construction — reference-exact.

Port of ``Engine.constructIntroduction`` (engine.ts:291-374) including its
quirks:

- quote follow-on positions: ``intersection.push(intersection[j] + 1)`` for
  j in 0..len(qIndices)-2 reads the freshly-pushed values, so a single phrase
  start p expands to [p, p+1, ..., p+len-1] (engine.ts:325-327). When the
  intersection is empty (a quote that does not match this page), JS produces
  NaN values; we emulate with math.nan placed after all finite positions
  (JS sort order with a NaN comparator is unspecified — goldens never hit it).
- unquoted-word removal uses ``indices.splice(quotes[i], quotes[i+1])`` —
  splice's second arg is a COUNT but an END INDEX is passed, over-deleting
  trailing entries when a quote doesn't start at word 0 (engine.ts:331-333).
- rendering: ±2-word context windows, ``"-`` / ``-"`` markers around
  contiguous runs, ``...`` between gaps > 1, then
  ``replace(/("- | -")/g, '"')`` (engine.ts:343-373).
"""

from __future__ import annotations

import math
import re
from typing import Sequence

from search_engine_ray.functions.intersect import adjacent_word_indices_intersection

_MARKER_RE = re.compile('("- | -")')


def construct_introduction(
    words: Sequence[str],
    quotes: Sequence[int],
    page_words: Sequence[str],
    page_index: dict[str, list[int]],
) -> str:
    """Build the snippet for one result page.

    ``words``/``quotes`` are the full query tokenization (stop words
    included); ``page_words`` keep original casing; ``page_index`` is the
    per-document positional index."""
    # words -> positions on page (engine.ts:316-318)
    indices: list[list[float]] = [
        [v for v in page_index.get(w.lower(), []) if isinstance(v, int)]
        for w in words
    ]

    # quoted spans first, kept separate (engine.ts:321-328)
    quoted_indices: list[list[float]] = []
    for i in range(0, len(quotes), 2):
        q_indices = indices[quotes[i] : quotes[i + 1]]
        inter = list(adjacent_word_indices_intersection(q_indices))
        for j in range(len(q_indices) - 1):
            prev = inter[j] if j < len(inter) else math.nan  # JS undefined + 1 -> NaN
            inter.append(prev + 1)
        quoted_indices.append(inter)

    # splice quirk (engine.ts:331-333): deleteCount := quotes[i+1]
    for i in range(0, len(quotes), 2):
        start = quotes[i]
        count = quotes[i + 1]
        del indices[start : start + count]

    result: list[float] = []
    if quoted_indices:
        result = [v for arr in quoted_indices for v in arr]
    result += [v for arr in indices for v in arr]

    # numeric sort; NaNs last (JS behavior unspecified — see module docstring)
    result.sort(key=lambda v: (math.isnan(v), v))

    intro: list[str] = []

    def push_at(idx: float) -> None:
        if isinstance(idx, float) and math.isnan(idx):
            return
        i = int(idx)
        if 0 <= i < len(page_words):
            w = page_words[i]
            if w:
                intro.append(w)

    n = len(result)
    for ai, idx in enumerate(result):
        prev_plus = result[ai - 1] + 1 if ai > 0 else math.nan
        next_minus = result[ai + 1] - 1 if ai < n - 1 else math.nan
        is_first = ai == 0 or idx != prev_plus
        is_last = ai == n - 1 or idx != next_minus
        if is_first:
            push_at(idx - 2)
            push_at(idx - 1)
            intro.append('"-')
        push_at(idx)
        if is_last:
            intro.append('-"')
            push_at(idx + 1)
            push_at(idx + 2)
        if ai < n - 1 and abs(idx - result[ai + 1]) > 1:
            intro.append("...")

    return _MARKER_RE.sub('"', " ".join(intro))
