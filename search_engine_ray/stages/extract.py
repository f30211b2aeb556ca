"""HTML -> (title, text) extraction stage — vectorized, byte-identical per url.

The input_hint html column is UTF-8 of
``<html><head><title>{title}</title></head><body>{text}</body></html>``
(FIXTURES.md §1); extraction must reproduce ``text`` byte-identically
(BASELINE.json input_hint invariant). Implemented as a single RE2
``extract_regex`` over the whole batch — zero Python-per-row work.

Also implements the reference ingestion skip-filter (demo.ts:118-123):
drop records with empty text/url, text containing '|', or text starting
with ']'.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_EXTRACT_PATTERN = (
    r"(?s)^<html><head><title>(?P<title>.*?)</title></head>"
    r"<body>(?P<text>.*?)</body></html>$"
)


def extract_batch(
    batch: pa.Table, title_strip_prefix: str | None = None
) -> pa.Table:
    """Add ``title`` and ``text`` columns extracted from ``html``.

    Rows whose html does not match the wrapper are dropped (ingestion skip
    semantics — the reference drops bad records per-record, demo.ts:145-147).
    If the batch already carries a ``text`` column it is preserved for the
    byte-identity check; the extracted text is authoritative.

    ``title_strip_prefix`` (M6, demo.ts:140): remove the FIRST occurrence of
    the substring from each title — JS ``String.replace`` semantics.
    """
    from search_engine_ray.util import limit_arrow_threads

    limit_arrow_threads()
    html = batch.column("html")
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html = pc.cast(html, pa.string())
    parts = pc.extract_regex(html, pattern=_EXTRACT_PATTERN)
    title = pc.struct_field(parts, "title")
    text = pc.struct_field(parts, "text")
    if title_strip_prefix:
        title = pc.replace_substring(
            title, pattern=title_strip_prefix, replacement="", max_replacements=1
        )
    keep = pc.is_valid(parts)
    out = batch
    if "text" in out.column_names:
        out = out.drop_columns(["text"])
    out = out.append_column("title", title).append_column("text", text)
    return out.filter(keep)


def skip_filter_batch(batch: pa.Table) -> pa.Table:
    """Reference skip-rules S2 (demo.ts:118-123), vectorized."""
    text = batch.column("text")
    url = batch.column("url")
    bad = pc.or_(
        pc.or_(
            pc.equal(pc.coalesce(text, ""), ""),
            pc.equal(pc.coalesce(url, ""), ""),
        ),
        pc.or_(
            pc.match_substring(pc.coalesce(text, ""), "|"),
            pc.starts_with(pc.coalesce(text, ""), "]"),
        ),
    )
    return batch.filter(pc.invert(bad))
