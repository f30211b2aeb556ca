"""Conjunctive k-way intersection with early termination — reference-exact.

Port of the observable semantics of ``Engine.intersect`` (engine.ts:391-431),
``isAllEqual`` (engine.ts:447-449, including its false-positive quirk:
``sum(vals)/len == vals[0]``, e.g. [3,1,5] counts as "all equal"), and the
positional-adjacency intersection used for phrase matching
(engine.ts:250-284).

These run on the driver / query-serving actor over tiny candidate sets
(<= max_count results); the heavy lifting happened at index-build time.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Iterator, Sequence

_DONE = object()


def is_all_equal(vals: Sequence[float]) -> bool:
    """engine.ts:447-449 — deliberate quirk replica (float mean compare)."""
    return sum(vals) / len(vals) == vals[0]


def intersect(
    iterators: list[Iterator[int]],
    max_count: int,
    should_be_added: Callable[[int], bool] | None = None,
) -> list[int]:
    """engine.ts:391-431.

    - 0 iterators -> []
    - 1 iterator -> first ``max_count`` values, ``should_be_added`` NOT
      consulted (reference short-circuit, engine.ts:398-404)
    - else: advance the iterator holding the min value; on isAllEqual emit
      (gated by should_be_added); stop at max_count or first exhaustion.
    """
    result: list[int] = []
    if len(iterators) == 0:
        return result
    if len(iterators) == 1:
        for val in iterators[0]:
            if len(result) >= max_count:
                break
            result.append(val)
        return result

    values: list[int] = []
    for it in iterators:
        v = next(it, _DONE)
        if v is _DONE:
            return result
        values.append(v)  # type: ignore[arg-type]

    while len(result) < max_count:
        if is_all_equal(values):
            add = True
            if should_be_added is not None:
                add = should_be_added(values[0])
            if add:
                result.append(values[0])
        min_value = min(values)
        i = values.index(min_value)
        v = next(iterators[i], _DONE)
        if v is _DONE:
            break
        values[i] = v  # type: ignore[assignment]
    return result


def adjacent_word_indices_intersection(
    index_arrs: Sequence[Sequence[float]],
) -> list[float]:
    """engine.ts:267-284: shift each word's positions by -i, then intersect
    with max_count=1 — returns the first phrase start position (or [])."""
    equalized = [[ind - i for ind in arr] for i, arr in enumerate(index_arrs)]
    iterators = [iter(arr) for arr in equalized]
    return intersect(iterators, 1)


def is_word_indices_adjacent(index_arrs: Sequence[Sequence[float]]) -> bool:
    """engine.ts:259-261."""
    return len(adjacent_word_indices_intersection(index_arrs)) > 0


def is_adjacent_words(words: Iterable[str], page_index: dict[str, list[int]]) -> bool:
    """engine.ts:250-253: are the given words adjacent (in order) on the page?

    ``page_index`` is the per-document positional index (lowercased token ->
    ascending positions)."""
    indices = [page_index.get(w.lower(), []) for w in words]
    return is_word_indices_adjacent(indices)


def min_window_span(index_arrs: Sequence[Sequence[int]]) -> float:
    """Minimal ``max - min`` over one position picked from each ascending
    list — the classic k-pointer sweep behind proximity ("within n words,
    any order") search. Returns ``math.inf`` if any list is empty.

    O(total positions) per document: at each step the pointer holding the
    global minimum advances (any cover window starting at that minimum has
    already been measured)."""
    k = len(index_arrs)
    if k == 0 or any(len(a) == 0 for a in index_arrs):
        return math.inf
    if k == 1:
        return 0.0
    ptrs = [0] * k
    cur = [a[0] for a in index_arrs]
    best = math.inf
    while True:
        lo = min(cur)
        best = min(best, max(cur) - lo)
        if best == 0:
            return 0.0
        i = cur.index(lo)
        ptrs[i] += 1
        if ptrs[i] >= len(index_arrs[i]):
            return best
        cur[i] = index_arrs[i][ptrs[i]]


NAN = math.nan
