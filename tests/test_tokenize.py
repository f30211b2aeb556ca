"""Tokenizer byte-identity vectors (FIXTURES.md §3, verified against the
reference regexes in node v20) + differential property test between the
row-wise reference-exact ``to_words`` and the vectorized ``tokenize_arrow``."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.tokenize import (
    build_position_index,
    lower_tokens,
    to_words,
    tokenize_arrow,
)

VECTORS = [
    (
        'Jupiter.[18] When "from the Sun" viewed god´s (♄) one-thousandth',
        ["Jupiter", "18", "When", "from", "the", "Sun", "viewed", "god", "s", "one", "thousandth"],
        [3, 6],
    ),
    ('"planet sixth"', ["planet", "sixth"], [0, 2]),
    ('år-äö "x"', ["år", "äö", "x"], [2, 3]),
    # uppercase ÅÄÖ and other non-ASCII letters are separators
    ("Åsa ÅÄÖ åäö café", ["sa", "åäö", "caf"], []),
    ("", [], []),
    ('"', [], [0]),
    ("a\"b\"c", ["a", "b", "c"], [1, 2]),
    ("under_score 123 ab1_c", ["under_score", "123", "ab1_c"], []),
]


@pytest.mark.parametrize("text,words,quotes", VECTORS)
def test_to_words_vectors(text, words, quotes):
    w, q = to_words(text)
    assert w == words
    assert q == quotes


def test_lowercase_mode():
    w, _ = to_words("Jupiter GOD ÅÄÖ åäö", lower_case=True)
    assert w == ["jupiter", "god", "åäö"]


def test_tokenize_arrow_matches_vectors():
    texts = [v[0] for v in VECTORS]
    out = tokenize_arrow(pa.array(texts, pa.string())).to_pylist()
    for (text, words, _), got in zip(VECTORS, out):
        assert got == words, text


_alphabet = st.sampled_from(
    list('abcXYZ019_åäöÅÄÖ"«♄´.-[]()\t\n \xa0 ﻿　éñ中')
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(_alphabet, max_size=30), min_size=0, max_size=8))
def test_tokenize_arrow_equals_to_words(texts):
    out = tokenize_arrow(pa.array(texts, pa.string())).to_pylist()
    for text, got in zip(texts, out):
        assert got == to_words(text)[0]


def test_lower_tokens():
    arr = tokenize_arrow(pa.array(["Jupiter GOD x", "ÅÄÖ Abc"], pa.string()))
    assert lower_tokens(arr).to_pylist() == [["jupiter", "god", "x"], ["abc"]]


def test_build_position_index():
    words, _ = to_words("The gas giant the GAS")
    idx = build_position_index(words)
    assert idx == {"the": [0, 3], "gas": [1, 4], "giant": [2]}
