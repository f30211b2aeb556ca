"""Tokenizer — byte-identical to the reference ``toWords`` (engine.ts:459-484).

The reference pipeline (verified empirically in node v20, see SURVEY §2.2 M1):

1. ``text.replace(/[^\\w\\dåäö"\\s]/g, ' ')`` — every char that is not an ASCII
   word char (``[A-Za-z0-9_]``), digit, ``åäö`` (lowercase only — Å/Ä/Ö and all
   other non-ASCII letters are separators), ``"`` or JS whitespace becomes a
   space.
2. ``.replace(/[\\"]/g, ' " ')`` — isolate quote marks as their own tokens.
3. ``.split(/[\\s]/g)`` — split on every single whitespace char (empties kept).
4. per-token strip ``[^\\w\\dåäö"]`` (a no-op after step 1, kept for fidelity).
5. drop empty tokens.
6. fold: a ``"`` token pushes ``index - len(quotes)`` onto ``quotes`` (an index
   into the words-only array); everything else goes to ``words``.

``quotes`` is a flat list of [start, end) pairs over ``words``.

JS ``\\s`` and Python ``\\s`` differ (``\\ufeff`` is JS-only), and Python
``\\w`` is Unicode-aware while JS ``\\w`` is ASCII — so explicit character
classes are used throughout.
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# JS \s per ECMA-262: [\t\n\v\f\r \u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000\ufeff]
JS_WS = "\t\n\x0b\x0c\r \xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000\ufeff"
# JS \w|\d: ASCII word chars; plus the reference's explicit åäö (lowercase only).
WORD_CHARS = "A-Za-z0-9_åäö"

_RE_NONWORD = re.compile(f'[^{WORD_CHARS}"{JS_WS}]')
_RE_SPLIT = re.compile(f"[{JS_WS}]")
_RE_STRIP = re.compile(f'[^{WORD_CHARS}"]')


def to_words(
    text: str,
    lower_case: bool = False,
    stop_words: frozenset[str] | None = None,
    remove_stop_words: bool = False,
) -> tuple[list[str], list[int]]:
    """Reference-exact toWords. Returns (words, quotes).

    ``remove_stop_words`` mirrors the reference parameter (engine.ts:461-462);
    it is never actually passed true by the reference code, but kept for parity.
    """
    s = _RE_NONWORD.sub(" ", text)
    s = s.replace('"', ' " ')
    words: list[str] = []
    quotes: list[int] = []
    idx = 0
    stop = stop_words or frozenset()
    for tok in _RE_SPLIT.split(s):
        tok = _RE_STRIP.sub("", tok)
        if not tok:
            continue
        if remove_stop_words and tok != '"' and (len(tok) < 2 or tok in stop):
            continue
        if tok == '"':
            # index into words-only array (engine.ts:478)
            quotes.append(idx - len(quotes))
        else:
            words.append(tok.lower() if lower_case else tok)
        idx += 1
    return words, quotes


# ---------------------------------------------------------------------------
# Vectorized batch tokenizer (the index-build hot path).
#
# Quote tokens are dropped (documents don't search; only queries use quote
# spans), so a document's token positions are indices into the words-only
# array — identical to the reference's Page.words (engine.ts:54,88-94).
# ---------------------------------------------------------------------------

# RE2 patterns for pyarrow.compute (no lookaheads needed; classes only).
_RE2_NONWORD = f'[^{WORD_CHARS}"{JS_WS}]'
_RE2_WS = f"[{JS_WS}]"


def tokenize_arrow(texts: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Vectorized tokenize of a string column -> list<string> of words
    (original case, quote tokens removed). Differentially tested against
    ``to_words`` (tests/test_tokenize.py)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = pc.replace_substring_regex(texts, pattern=_RE2_NONWORD, replacement=" ")
    # quotes are standalone tokens in the reference; we drop them for docs,
    # so mapping '"' to a separator is equivalent to isolate-then-drop.
    s = pc.replace_substring(s, pattern='"', replacement=" ")
    parts = pc.split_pattern_regex(s, pattern=_RE2_WS)
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents.filter(keep)
    # rebuild list offsets from parent indices (parents are non-decreasing)
    n_docs = len(texts)
    counts = np.bincount(parents.to_numpy(zero_copy_only=False), minlength=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat)


def lower_tokens(tokens: pa.ListArray) -> pa.ListArray:
    """Lowercase a list<string> token column (JS toLowerCase == utf8_lower on
    the kept alphabet)."""
    flat = pc.utf8_lower(tokens.flatten())
    return pa.ListArray.from_arrays(tokens.offsets, flat)


def build_position_index(words: Iterable[str]) -> dict[str, list[int]]:
    """Per-document positional index: lowercased token -> ascending positions.

    Reference: engine.ts:88-94 (includes stop words and 1-char tokens)."""
    index: dict[str, list[int]] = {}
    for i, w in enumerate(words):
        index.setdefault(w.lower(), []).append(i)
    return index
