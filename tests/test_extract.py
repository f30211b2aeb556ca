"""HTML->text extraction byte-identity (BASELINE.json input_hint invariant)
and the S2 skip rules — pure Arrow, no Ray session needed."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.sources.fixtures import CORPORA, pages_table, wrap_html
from search_engine_ray.stages.extract import extract_batch, skip_filter_batch


@pytest.mark.parametrize("name", list(CORPORA))
def test_extract_byte_identity_on_fixtures(name):
    docs, _ = CORPORA[name]
    t = pages_table(docs)
    out = extract_batch(t)
    assert out.num_rows == len(docs)
    assert out.column("title").to_pylist() == [d[0] for d in docs]
    assert out.column("text").to_pylist() == [d[1] for d in docs]


# text must not contain the closing tags of the wrapper itself
_text_alphabet = st.text(
    st.characters(blacklist_characters="<>", blacklist_categories=("Cs",)),
    max_size=200,
)


@settings(max_examples=100, deadline=None)
@given(_text_alphabet, _text_alphabet)
def test_extract_roundtrip_property(title, text):
    t = pa.table(
        {
            "url": pa.array(["u://x"], pa.string()),
            "html": pa.array([wrap_html(title, text)], pa.binary()),
        }
    )
    out = extract_batch(t)
    assert out.column("title").to_pylist() == [title]
    assert out.column("text").to_pylist() == [text]


def test_extract_drops_nonmatching_html():
    t = pa.table(
        {
            "url": pa.array(["a", "b"], pa.string()),
            "html": pa.array([b"<garbage>", wrap_html("T", "X")], pa.binary()),
        }
    )
    out = extract_batch(t)
    assert out.num_rows == 1
    assert out.column("url").to_pylist() == ["b"]


def test_skip_filter_rules():
    """demo.ts:118-123: drop empty text/url, text containing '|', text
    starting with ']'."""
    t = pa.table(
        {
            "url": pa.array(["u1", "u2", "", "u4", "u5"], pa.string()),
            "text": pa.array(["ok", "", "also ok", "bad|pipe", "]starts"], pa.string()),
        }
    )
    out = skip_filter_batch(t)
    assert out.column("url").to_pylist() == ["u1"]


def test_title_strip_prefix_m6():
    """M6 (demo.ts:140): strip 'Wikipedia: ' from titles — FIRST occurrence
    only, JS String.replace semantics."""
    t = pa.table(
        {
            "url": pa.array(["a", "b", "c"], pa.string()),
            "html": pa.array(
                [
                    wrap_html("Wikipedia: Anarchism", "x"),
                    wrap_html("No prefix here", "y"),
                    wrap_html("Wikipedia: Wikipedia: twice", "z"),
                ],
                pa.binary(),
            ),
        }
    )
    out = extract_batch(t, title_strip_prefix="Wikipedia: ")
    assert out.column("title").to_pylist() == [
        "Anarchism",
        "No prefix here",
        "Wikipedia: twice",
    ]
    # disabled by default
    out2 = extract_batch(t)
    assert out2.column("title").to_pylist()[0] == "Wikipedia: Anarchism"
