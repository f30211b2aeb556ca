"""Text-analysis pipelines over the ``documents`` table — training-data ops.

Each function takes a documents Dataset (doc_id, text, ...) and returns a
Dataset; all hot paths are vectorized map_batches with per-batch partial
aggregation ahead of any groupby (the combiner pattern — a term appearing in
every batch ships one row per batch through the shuffle, not one per doc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from search_engine_ray.functions.textstats import (
    lang_scores,
    md5_fingerprints_arrow,
    quality_metrics,
    token_lists,
)
from search_engine_ray.tokenize import lower_tokens


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=columns or ["doc_id", "text"]
    )


def token_count_ds(docs: rd.Dataset) -> rd.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


# GPT-2-style pretokenizer shape restricted to this corpus's alphabet:
# letter runs / digit runs / punctuation runs (each with an optional
# leading space) / residual whitespace. RE2 on both sides (pyarrow
# count_substring_regex and DuckDB regexp_extract_all), so semantics are
# engine-identical.
BPE_PRETOKEN_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+"


def bpe_token_count_ds(docs: rd.Dataset) -> rd.Dataset:
    """Per-doc token count under a BPE-ish pretokenizer regex — the
    standard training-data budget estimator (whitespace counting
    undercounts mixed alnum/punctuation). One vectorized RE2 kernel per
    batch."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pc.count_substring_regex(
                    batch.column("text"), BPE_PRETOKEN_RE
                ).cast(pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def normalize_text_ds(docs: rd.Dataset, form: str = "NFC") -> rd.Dataset:
    """Unicode text normalization — the canonical first cleaning stage of
    an LLM training-data pipeline: NFC-normalize (composed/decomposed
    accent variants unify, so downstream exact-dedup fingerprints stop
    missing byte-different equal strings), lowercase, collapse every
    ASCII-whitespace run to one space, trim. Four zero-copy Arrow kernels
    per batch (utf8_normalize / utf8_lower / replace_substring_regex /
    utf8_trim) — no per-row Python.

    Parity contract (pinned by the SQL oracle): DuckDB
    ``trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))``
    — both sides use RE2, whose ``\\s`` is ASCII-only, and a plain
    space-trim, so Unicode spacing chars (NBSP etc.) pass through
    untouched on BOTH sides.

    Arrow caveat: this pyarrow release's ``pc.utf8_normalize`` emits
    DECOMPOSED output for every form (verified: NFC('\\xe9') →
    'e\\u0301'), so composition falls back to Python ``unicodedata`` —
    but ONLY for rows detected non-ASCII via a vectorized
    codepoints==bytes check, then scattered back with
    ``replace_with_mask``; pure-ASCII rows (the bulk of a lang-filtered
    crawl) never leave Arrow."""
    import unicodedata as _ud

    def f(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim(t, characters=" ")
        non_ascii = pc.and_kleene(
            pc.not_equal(pc.utf8_length(t), pc.binary_length(t)),
            pc.is_valid(t),
        )
        if pc.any(non_ascii).as_py():
            mask = non_ascii.to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(mask)
            vals = t.take(pa.array(idx, pa.int64())).to_pylist()
            fixed = pa.array([_ud.normalize(form, s) for s in vals], pa.string())
            t = pc.replace_with_mask(t, non_ascii, fixed)
        return pa.table({"doc_id": batch.column("doc_id"), "text": t})

    return docs.map_batches(f, batch_format="pyarrow")


def quality_ds(docs: rd.Dataset) -> rd.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        m = quality_metrics(text)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(m["n_chars"], pa.int64()),
                "n_tokens": pa.array(m["n_tokens"], pa.int64()),
                "sum_token_len": pa.array(m["sum_token_len"], pa.int64()),
                "n_short": pa.array(m["n_short"], pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def blocklist_filter_ds(
    docs: rd.Dataset,
    blocklist: tuple[str, ...] | list[str],
    max_ratio: float = 0.1,
    case_insensitive: bool = True,
) -> rd.Dataset:
    """C4-style blocklist ("bad words") filtering: per doc, the count and
    ratio of tokens on the blocklist, plus the keep flag
    ``blocked_ratio <= max_ratio`` (C4 drops the page on ANY hit —
    max_ratio=0 reproduces that; Gopher/RefinedWeb use small ratios).

    The blocklist is a fixed small set compiled into each task closure
    (the broadcast-small-side rule at its most degenerate); matching is
    one vectorized ``pc.is_in`` per batch. Empty docs keep ratio 0.0."""
    bl = pa.array(
        sorted({w.lower() for w in blocklist} if case_insensitive else set(blocklist)),
        pa.string(),
    )

    def f(batch: pa.Table) -> pa.Table:
        toks = token_lists(batch.column("text"))
        flat = toks.flatten()
        if case_insensitive:
            flat = pc.utf8_lower(flat)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        hit = pc.is_in(flat, value_set=bl).to_numpy(zero_copy_only=False)
        n_rows = len(batch)
        n_blocked = np.bincount(parents[hit], minlength=n_rows).astype(np.int64)
        n_tokens = np.bincount(parents, minlength=n_rows).astype(np.int64)
        ratio = np.round(
            np.divide(
                n_blocked,
                n_tokens,
                out=np.zeros(n_rows, np.float64),
                where=n_tokens > 0,
            ),
            6,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_blocked": pa.array(n_blocked, pa.int64()),
                "blocked_ratio": pa.array(ratio, pa.float64()),
                "keep": pa.array((ratio <= max_ratio).astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def fingerprint_ds(docs: rd.Dataset) -> rd.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(
                    md5_fingerprints_arrow(batch.column("text")), pa.string()
                ),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def lang_id_ds(docs: rd.Dataset) -> rd.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(lang_scores(text), pa.string()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def winnow_fp_ds(docs: rd.Dataset, k: int = 3, w: int = 4) -> rd.Dataset:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    scheme): distinct sliding-window minima (window w) over positional
    k-gram rolling hashes. One row per (doc_id, fp) — the near-copy
    detection primitive that, unlike md5, survives local edits. Fully
    vectorized batch-wide (one global sliding-window-min); crc32 token
    hashes are not SQL-expressible, so correctness is pinned by the
    pure-Python reference in tests, not a DuckDB oracle."""
    from search_engine_ray.functions.textstats import winnow_fingerprints_batch

    def f(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        d, fp = winnow_fingerprints_batch(token_lists(batch.column("text")), k, w)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[d], pa.int64()),
                "fp": pa.array(fp.astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def winnow_md5_fp_ds(docs: rd.Dataset, k: int = 3, w: int = 4) -> rd.Dataset:
    """Winnowing fingerprints over md5-hex k-gram hashes — the
    ORACLE-CHECKABLE conformance variant of ``winnow_fp_ds``.

    The fingerprint SET of MOSS winnowing is the DISTINCT union of window
    minima (the rightmost-tie-break only affects which POSITION is
    recorded, never which VALUE), so the whole scheme is one SQL window
    function: min(h) OVER (PARTITION BY doc ORDER BY pos ROWS w-1
    PRECEDING) + DISTINCT. The hash is the first 16 hex chars of
    md5(k-gram) compared as fixed-width strings (same ordering as the
    integer value), which DuckDB mirrors exactly. k-gram construction is
    vectorized Arrow (shifted flat slices + binary_join); the md5 itself
    is per-string (hashlib) — at crawl scale prefer ``winnow_fp_ds``
    (vectorized crc32 rolling hashes); this variant exists to pin the
    window-min semantics against the SQL oracle.

    Output: one row per distinct (doc_id, fp), fp = 16-hex-char string.
    Docs with fewer than k+w-1 tokens emit nothing (no full window)."""

    def f(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = token_lists(batch.column("text"))
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = len(flat)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "fp": pa.array([], pa.string())}
        )
        if n < k:
            return empty
        # k-gram strings: join k shifted views of the flat token array,
        # valid where the whole gram stays inside one doc
        views = [flat.slice(i, n - k + 1) for i in range(k)]
        grams = pc.binary_join_element_wise(
            *views, " "
        )  # gram i spans flat[i .. i+k-1]
        gp = parents[: n - k + 1]
        ok = parents[k - 1 :] == gp  # same doc at both ends
        # md5-hex prefix per gram as uint64 (16 hex chars = 64 bits; the
        # integer order equals the fixed-width hex string order the SQL
        # oracle uses). md5 runs on memoryview slices of the Arrow data
        # buffer (md5_prefix64_arrow) — no to_pylist, no hex detour.
        from search_engine_ray.functions.textstats import md5_prefix64_arrow

        h = np.where(ok, md5_prefix64_arrow(grams), np.uint64(0))
        if len(h) < w:
            return empty
        # sliding window min over w consecutive grams, windows fully
        # inside one doc
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        wp_first = gp[: len(gp) - w + 1]
        wp_last = gp[w - 1 :]
        wok = (wp_first == wp_last) & (ok[: len(ok) - w + 1]) & (ok[w - 1 :])
        if not wok.any():
            return empty
        mins = win[wok].min(axis=1)
        docs_sel = doc_ids[wp_first[wok]]
        # distinct (doc, fp)
        order = np.lexsort((mins, docs_sel))
        d, m = docs_sel[order], mins[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (m[1:] != m[:-1])
        return pa.table(
            {
                "doc_id": pa.array(d[keep], pa.int64()),
                "fp": pa.array(
                    [f"{int(v):016x}" for v in m[keep]], pa.string()
                ),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def _distinct_terms_batch(batch: pa.Table, min_len: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """(terms, doc_ids) of distinct per-doc lowercased terms, len >= min_len."""
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    toks = lower_tokens(token_lists(batch.column("text")))
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ok = pc.greater_equal(pc.utf8_length(flat), min_len).to_numpy(zero_copy_only=False)
    terms = flat.to_numpy(zero_copy_only=False)[ok]
    par = parents[ok]
    # distinct per doc
    order = np.lexsort((terms, par))
    t, p = terms[order], par[order]
    keep = np.ones(len(t), dtype=bool)
    keep[1:] = (t[1:] != t[:-1]) | (p[1:] != p[:-1])
    return t[keep], doc_ids[p[keep]]


def term_df_ds(docs: rd.Dataset) -> rd.Dataset:
    """Per-term document frequency (A4): per-batch partial counts, then a
    small groupby-sum shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        t, _ = _distinct_terms_batch(batch)
        if len(t) == 0:
            return pa.table({"term": pa.array([], pa.string()), "pdf": pa.array([], pa.int64())})
        uniq, counts = np.unique(t, return_counts=True)
        return pa.table({"term": pa.array(uniq, pa.string()), "pdf": pa.array(counts, pa.int64())})

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pdf", alias_name="df"))
    )


def postings_pairs_ds(docs: rd.Dataset) -> rd.Dataset:
    """(term, doc_id) distinct pairs — the A2 inverted-index relation in flat
    form. Docs are globally unique so per-batch distinct is globally distinct."""

    def f(batch: pa.Table) -> pa.Table:
        t, d = _distinct_terms_batch(batch)
        return pa.table(
            {"term": pa.array(t, pa.string()), "doc_id": pa.array(d, pa.int64())}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def top_terms_ds(docs: rd.Dataset, k: int = 20) -> rd.Dataset:
    """Total occurrence counts, top-k (count desc, term asc) — K4/K5 shape."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = lower_tokens(token_lists(batch.column("text")))
        flat = toks.flatten()
        ok = pc.greater_equal(pc.utf8_length(flat), 2).to_numpy(zero_copy_only=False)
        terms = flat.to_numpy(zero_copy_only=False)[ok]
        if len(terms) == 0:
            return pa.table({"term": pa.array([], pa.string()), "pn": pa.array([], pa.int64())})
        uniq, counts = np.unique(terms, return_counts=True)
        return pa.table({"term": pa.array(uniq, pa.string()), "pn": pa.array(counts, pa.int64())})

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pn", alias_name="n"))
    )
    return agg.sort(["n", "term"], descending=[True, False]).limit(k)


def _lang_term_partial(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL (lang, term) occurrence counts, combined into one
    shuffle key ``lang|term`` (the pricing_summary composite-key pattern —
    tokens never contain '|'; the split downstream uses max_splits=1 so a
    pathological term would still round-trip)."""
    toks = lower_tokens(token_lists(batch.column("text")))
    flat = toks.flatten()
    lens = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False)
    # null/missing lang -> 'und' (ISO 639-2 undetermined): a None in the
    # key array would crash np.unique's sort, and dropping rows silently
    # would under-count; the sentinel keeps them groupable
    # cast first: an all-null block types the column as arrow `null`,
    # which coalesce has no (null, string) kernel for
    langs = np.repeat(
        pc.coalesce(batch.column("lang").cast(pa.string()), "und").to_numpy(
            zero_copy_only=False
        ),
        lens,
    )
    ok = pc.greater_equal(pc.utf8_length(flat), 2).to_numpy(zero_copy_only=False)
    terms = flat.to_numpy(zero_copy_only=False)[ok]
    if len(terms) == 0:
        return pa.table(
            {"k": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
        )
    keys = pc.binary_join_element_wise(
        pa.array(langs[ok], pa.string()), pa.array(terms, pa.string()), "|"
    ).to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(keys, return_counts=True)
    return pa.table(
        {"k": pa.array(uniq, pa.string()), "pn": pa.array(counts, pa.int64())}
    )


def _split_lang_key(batch: pa.Table) -> pa.Table:
    parts = pc.split_pattern(batch.column("k"), "|", max_splits=1)
    return pa.table(
        {
            "lang": pc.list_element(parts, 0),
            "term": pc.list_element(parts, 1),
            "n": batch.column("n"),
        }
    )


def lang_top_terms_ds(docs: rd.Dataset, k: int = 5) -> rd.Dataset:
    """Grouped top-k: the k most frequent terms per language (count desc,
    term asc tie-break). Scale shape: per-batch partial (lang, term)
    counts (combiner — a term ships one row per batch, not one per
    occurrence) -> ONE vocabulary-scale groupby-sum -> per-lang top-k via
    ``map_groups`` (group size = that language's vocabulary, << corpus)."""

    agg = (
        docs.map_batches(_lang_term_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("n", "descending"), ("term", "ascending")],
        )
        return group.take(idx[:k])

    return (
        agg.map_batches(_split_lang_key, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["lang", "n", "term"], descending=[False, True, False])
    )


def vocab_stats_ds(docs: rd.Dataset) -> rd.Dataset:
    """Per-language corpus statistics: total token count, distinct
    vocabulary size, and hapax-legomena count (terms occurring exactly
    once — the Heaps'-law tail that dominates web vocabulary growth).
    Same combiner shape as ``lang_top_terms_ds``; the second aggregation
    input is vocabulary-scale rows, reduced per batch to per-lang
    partials before the final (languages-sized) groupby."""

    agg = (
        docs.map_batches(_lang_term_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def partial2(batch: pa.Table) -> pa.Table:
        t = _split_lang_key(batch)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(langs, return_inverse=True)
        toks = np.zeros(len(uniq), np.int64)
        np.add.at(toks, inv, n)
        vocab = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        hapax = np.zeros(len(uniq), np.int64)
        np.add.at(hapax, inv, (n == 1).astype(np.int64))
        return pa.table(
            {
                "lang": pa.array(uniq, pa.string()),
                "pt": pa.array(toks, pa.int64()),
                "pv": pa.array(vocab, pa.int64()),
                "ph": pa.array(hapax, pa.int64()),
            }
        )

    return (
        agg.map_batches(partial2, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("pt", alias_name="n_tokens"),
            Sum("pv", alias_name="vocab"),
            Sum("ph", alias_name="hapax"),
        )
        .sort("lang")
    )


def source_topk_ds(docs: rd.Dataset, k: int = 5) -> rd.Dataset:
    """Per-source quality cap (the RefinedWeb/CCNet "domain cap"): keep
    the top-``k`` documents of each source, ranked by (n_chars DESC,
    doc_id ASC), with their rank ``rk`` (1-based). Caps how much any one
    domain can contribute to the training mix.

    Scale shape: a per-batch vectorized partial top-k per source (lexsort
    + run-start ranks — at most k x sources_in_batch rows survive) feeds
    a per-source groupby whose groups are at most k x n_batches rows;
    the final rank is recomputed inside each bounded group. The document
    payload never shuffles; sources are assumed far fewer than docs (the
    web-domain shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nch = batch.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nch, codes))
        oc = codes[order]
        starts = np.concatenate(([0], np.flatnonzero(oc[1:] != oc[:-1]) + 1))
        rank = np.arange(len(oc)) - np.repeat(starts, np.diff(np.append(starts, len(oc))))
        keep = order[rank < k]
        return pa.table(
            {
                "source": enc.dictionary.take(pa.array(codes[keep])),
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_chars": pa.array(nch[keep], pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        nch = group.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nch))[:k]
        return pa.table(
            {
                "source": group.column("source").take(pa.array(order)),
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": pa.array(nch[order], pa.int64()),
                "rk": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(finish, batch_format="pyarrow")
        .sort(["source", "rk"])
    )


def vocab_coverage_ds(
    docs: rd.Dataset, pcts: tuple[int, ...] = (50, 90, 99)
) -> rd.Dataset:
    """Vocabulary coverage curve: for each percentage in ``pcts``, the
    smallest number of distinct terms (taken most-frequent-first, ties
    broken by term ASC) whose summed frequency reaches that share of all
    token occurrences — the BPE/vocab-size sizing question asked of every
    training corpus.

    A term is needed while the cumulative count BEFORE it is still below
    pct% of the total; comparisons are integer cross-products
    (cum_prev * 100 < total * pct) so the result is exact and
    engine-independent. Scale shape: per-batch term-count partials ->
    vocab-bounded groupby-sum -> distributed sort by (n DESC, term) ->
    per-block prefix scan seeded by driver-side exclusive block totals
    (the ``pack_sequences_ds`` scan, scalars only) -> per-block partial
    (n_terms, covered) per threshold -> tiny final merge. The corpus
    streams once; only vocab-sized keys shuffle."""
    import ray

    def counts(batch: pa.Table) -> pa.Table:
        flat = token_lists(batch.column("text")).flatten()
        terms = flat.to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(terms, return_counts=True)
        return pa.table(
            {
                "term": pa.array(uniq, pa.string()),
                "pn": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    ordered = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pn", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .materialize()  # vocab-bounded keys; block order is the sort order
    )
    refs = ordered.to_arrow_refs()

    @ray.remote
    def _block_total(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return int(pc.sum(t.column("n")).as_py() or 0)

    @ray.remote
    def _block_partial(t: pa.Table, offset: int, total: int) -> list[tuple]:
        # per threshold: how many of this block's terms are needed, and
        # the covered token count at the last needed term
        if t.num_rows == 0:
            return [(int(p), 0, 0) for p in pcts]
        n = t.column("n").to_numpy(zero_copy_only=False)
        cum_prev = offset + np.cumsum(n) - n
        out = []
        for p in pcts:
            needed = cum_prev * 100 < total * int(p)
            cnt = int(needed.sum())
            covered = int(cum_prev[cnt - 1] + n[cnt - 1] - offset) if cnt else 0
            out.append((int(p), cnt, covered))
        return out

    totals = ray.get([_block_total.remote(r) for r in refs])
    total = int(sum(totals))
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)
    parts = ray.get(
        [
            _block_partial.remote(r, int(off), total)
            for r, off in zip(refs, offsets)
        ]
    )
    agg: dict[int, list[int]] = {int(p): [0, 0] for p in pcts}
    for blk, off in zip(parts, offsets):
        for p, cnt, covered in blk:
            agg[p][0] += cnt
            if cnt:
                agg[p][1] = int(off) + covered  # last block wins: absolute cum
    rows = sorted(agg.items())
    return rd.from_arrow(
        pa.table(
            {
                "pct": pa.array([p for p, _ in rows], pa.int64()),
                "n_terms": pa.array([v[0] for _, v in rows], pa.int64()),
                "covered_tokens": pa.array([v[1] for _, v in rows], pa.int64()),
                "total_tokens": pa.array([total] * len(rows), pa.int64()),
            }
        )
    )


def skip_filter_ds(docs: rd.Dataset) -> rd.Dataset:
    """Reference S2 ingestion skip rules (demo.ts:118-123) over documents."""

    def f(batch: pa.Table) -> pa.Table:
        text = pc.coalesce(batch.column("text"), "")
        bad = pc.or_(
            pc.equal(text, ""),
            pc.or_(
                pc.match_substring(text, "|"), pc.starts_with(text, "]")
            ),
        )
        return pa.table({"doc_id": batch.column("doc_id")}).filter(
            pc.invert(bad)
        )

    return docs.map_batches(f, batch_format="pyarrow")


def extract_roundtrip_ds(docs: rd.Dataset) -> rd.Dataset:
    """Wrap text in the deterministic HTML envelope then extract — the
    byte-identity invariant as a queryable op (title = 'doc <id>')."""
    from search_engine_ray.stages.extract import extract_batch

    def wrap(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        html = pa.array(
            [
                f"<html><head><title>doc {i}</title></head><body>{t}</body></html>".encode()
                for i, t in zip(ids, texts)
            ],
            pa.binary(),
        )
        return pa.table({"doc_id": batch.column("doc_id"), "url": pa.array([f"doc://{i}" for i in ids], pa.string()), "html": html})

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "title", "text"])

    return docs.map_batches(wrap, batch_format="pyarrow").map_batches(
        extract_batch, batch_format="pyarrow"
    ).map_batches(project, batch_format="pyarrow")


def repetition_ds(docs: rd.Dataset) -> rd.Dataset:
    """Gopher-style repetition quality features (Rae et al. 2021 §A1.1):
    per-doc token-bigram totals, distinct counts, and the most-frequent
    bigram's count. Integer outputs so the ratio thresholds (e.g. drop
    when top_bigram_count / n_bigrams > 0.18) are derivable downstream
    and hash exactly against the SQL oracle. Embarrassingly parallel —
    one vectorized map_batches, no shuffle."""
    from search_engine_ray.functions.textstats import repetition_metrics

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        m = repetition_metrics(text)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(m["n_bigrams"], pa.int64()),
                "distinct_bigrams": pa.array(m["distinct_bigrams"], pa.int64()),
                "top_bigram_count": pa.array(m["top_bigram_count"], pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def decontaminate_ds(
    docs: rd.Dataset, eval_mod: int = 97, k: int = 3
) -> rd.Dataset:
    """Benchmark decontamination (the GPT-3 appendix-C / FLAN recipe):
    flag training docs sharing k-token shingles with a held-out eval
    set. The eval set here is the deterministic slice doc_id % eval_mod
    == 0 (stand-in for a real benchmark file). Scale shape: the eval
    side is SMALL by construction (benchmarks are thousands of docs, not
    billions) — its distinct shingles are collected once via a
    distributed unique() and broadcast with ray.put; the full corpus
    then streams through one map_batches doing a vectorized pc.is_in
    membership test per batch. No all-to-all shuffle of the big side.
    Output: (doc_id, n_shingles, n_contaminated) — distinct shingles per
    doc and how many of them appear in the eval set."""
    import ray

    from search_engine_ray.functions.textstats import distinct_shingle_strings

    def eval_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % eval_mod) == 0
        if not mask.any():
            return pa.table({"sh": pa.array([], pa.string())})
        sub = batch.filter(pa.array(mask))
        text = sub.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        _, sh = distinct_shingle_strings(text, k)
        return pa.table({"sh": sh})

    ev = sorted(docs.map_batches(eval_shingles, batch_format="pyarrow").unique("sh"))
    ev_ref = ray.put(pa.array(ev, pa.string()))

    def score(batch: pa.Table) -> pa.Table:
        ev_set = ray.get(ev_ref)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        p, sh = distinct_shingle_strings(text, k)
        n = len(batch)
        n_sh = np.bincount(p, minlength=n).astype(np.int64)
        hit = pc.is_in(sh, value_set=ev_set).to_numpy(zero_copy_only=False)
        n_bad = np.bincount(p, weights=hit.astype(np.float64), minlength=n).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_contaminated": pa.array(n_bad, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def hash_sample_ds(
    docs: rd.Dataset,
    prefixes: tuple[str, ...] = ("0", "1", "2"),
    method: str = "md5",
) -> rd.Dataset:
    """Deterministic hash-based corpus sampling: keep a doc iff the hash
    of its doc_id keeps it under the rate (default 3/16 = 18.75%). The
    standard reproducible-subset primitive — unlike
    random_shuffle().limit(), the SAME docs are kept on every run, on
    any cluster size, and membership is joinable across tables.

    ``method="md5"``: keep iff md5(str(doc_id)) hex starts with one of
    ``prefixes`` — chosen so DuckDB's md5() makes the sample
    oracle-checkable across engines; md5's C core is the per-row cost
    (the hex compare itself is vectorized via md5_id_u32).
    ``method="fast"``: the crawl-scale variant — keep iff
    splitmix64(doc_id) < rate * 2^64 with rate = len(prefixes)/16; fully
    vectorized (~65x faster), same expected rate and determinism, but a
    DIFFERENT member set (not md5-oracle-checkable). Reads only doc_id."""
    if method == "fast":
        from search_engine_ray.pipelines.sketches import _splitmix64

        rate = len(prefixes) / 16.0
        thr = np.uint64(min(int(rate * 2.0**64), 2**64 - 1))

        def f_fast(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            keep = _splitmix64(ids.astype(np.uint64)) < thr
            return batch.filter(pa.array(keep)).select(["doc_id"])

        return docs.map_batches(f_fast, batch_format="pyarrow")

    from search_engine_ray.functions.textstats import md5_id_u32

    # first hex digit of md5(str(id)) == top nibble of md5_id_u32(id)
    nibbles = np.array(sorted(int(p, 16) for p in prefixes), dtype=np.uint32)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.isin(md5_id_u32(ids) >> np.uint32(28), nibbles)
        return batch.filter(pa.array(keep)).select(["doc_id"])

    return docs.map_batches(f, batch_format="pyarrow")


def clean_corpus_ds(docs: rd.Dataset, eval_mod: int = 97, k: int = 3) -> rd.Dataset:
    """Flagship webtext cleaning pipeline — the full CC-style recipe as ONE
    composition (the thing a training-data user actually runs):

      lang filter -> quality gates -> repetition gate -> decontamination
      -> deterministic 50% hash subsample -> exact dedup (keep min doc_id)

    Gates (all integer arithmetic, so the SQL oracle hashes exactly):
      lang == 'en'; 20 <= n_tokens <= 1000; n_short*5 <= n_tokens (<=20%
      1-char tokens); top_bigram_count*5 <= n_bigrams (<=20% covered by the
      modal bigram, the Gopher rule); n_contaminated == 0 against the
      doc_id % eval_mod == 0 eval slice; md5(doc_id)[0] in 0..7.

    Scale shape: every per-doc feature (tokens, shorts, bigram repetition,
    shingle contamination, md5 fp) is computed in a SINGLE fused map_batches
    pass — one read of the text column, rows dropped as early as possible,
    no intermediate datasets. The eval shingle set is the broadcast small
    side (ray.put once). The only shuffle is the final exact-dedup
    groupby(fp), which ships just (fp, doc_id, n_tokens) triples for
    surviving rows — never text. Output: (doc_id, n_tokens) of kept docs.
    """
    import ray

    from search_engine_ray.functions.textstats import (
        distinct_shingle_strings,
        md5_fingerprints_arrow,
        md5_id_u32,
        quality_metrics,
        repetition_metrics,
    )

    def eval_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % eval_mod) == 0
        if not mask.any():
            return pa.table({"sh": pa.array([], pa.string())})
        text = batch.filter(pa.array(mask)).column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        _, sh = distinct_shingle_strings(text, k)
        return pa.table({"sh": sh})

    ev = sorted(docs.map_batches(eval_shingles, batch_format="pyarrow").unique("sh"))
    ev_ref = ray.put(pa.array(ev, pa.string()))

    def features(batch: pa.Table) -> pa.Table:
        # cheap gates first: lang + hash subsample drop rows before any
        # tokenization work happens
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # hexdigest()[0] < "8" == top bit of the md5 u32 clear
        keep = md5_id_u32(ids) < np.uint32(0x80000000)
        if "lang" in batch.column_names:
            keep &= pc.equal(batch.column("lang"), "en").to_numpy(
                zero_copy_only=False
            )
        batch = batch.filter(pa.array(keep))
        if not len(batch):
            return pa.table(
                {
                    "fp": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        q = quality_metrics(text)
        r = repetition_metrics(text)
        p, sh = distinct_shingle_strings(text, k)
        ev_set = ray.get(ev_ref)
        hit = pc.is_in(sh, value_set=ev_set).to_numpy(zero_copy_only=False)
        n_bad = np.bincount(
            p, weights=hit.astype(np.float64), minlength=len(batch)
        ).astype(np.int64)
        ok = (
            (q["n_tokens"] >= 20)
            & (q["n_tokens"] <= 1000)
            & (q["n_short"] * 5 <= q["n_tokens"])
            & (r["top_bigram_count"] * 5 <= r["n_bigrams"])
            & (n_bad == 0)
        )
        kept = batch.filter(pa.array(ok))
        ktext = kept.column("text")
        if isinstance(ktext, pa.ChunkedArray):
            ktext = ktext.combine_chunks()
        return pa.table(
            {
                "fp": pa.array(md5_fingerprints_arrow(ktext), pa.string()),
                "doc_id": kept.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(q["n_tokens"][ok], pa.int64()),
            }
        )

    feats = docs.map_batches(features, batch_format="pyarrow")
    agg = feats.groupby("fp").min(["doc_id", "n_tokens"])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("min(doc_id)"),
                "n_tokens": batch.column("min(n_tokens)"),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def unigram_lm_ds(docs: rd.Dataset, vocab_size: int = 65536) -> rd.Dataset:
    """Unigram language-model doc scoring (the CCNet/KenLM quality signal
    reduced to order 0): pass 1 computes global token counts with the
    combiner pattern (one row per (batch, term) through the shuffle); the
    top-``vocab_size`` vocabulary (count desc, term asc — deterministic)
    and the corpus total are broadcast ONCE via ray.put; pass 2 scores
    every doc as mean(-log2 p(token)) in one vectorized map_batches, OOV
    tokens at the 1/total floor. Output (doc_id, lm_bits) — higher =
    more surprising under the corpus LM (the head/tail quality axis).

    Scale shape: the vocabulary cap bounds the broadcast regardless of
    corpus size; the counts groupby ships combiner partials only; docs
    with zero tokens are dropped (matching the SQL oracle, whose unnest
    emits no rows for them)."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        flat = token_lists(batch.column("text")).flatten()
        terms = flat.to_numpy(zero_copy_only=False)
        if len(terms) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(terms, return_counts=True)
        return pa.table(
            {"term": pa.array(uniq, pa.string()), "pn": pa.array(counts, pa.int64())}
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pn", alias_name="n"))
        .materialize()  # vocab-sized (small); read twice below
    )
    total = float(counts.sum("n"))
    vocab = counts.sort(["n", "term"], descending=[True, False]).limit(vocab_size)
    import ray as _ray

    vt = pa.concat_tables(
        # materialize: avoid to_arrow_refs re-running sort+limit for its
        # schema probe (ray 2.49 lazy-dataset double execution)
        [t for t in _ray.get(vocab.materialize().to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    vocab_ref = ray.put((vt.column("term").combine_chunks(), vt.column("n").to_numpy(zero_copy_only=False).astype(np.float64)))

    def score(batch: pa.Table) -> pa.Table:
        terms_arr, n_arr = ray.get(vocab_ref)
        toks = token_lists(batch.column("text"))
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        idx = pc.index_in(flat, value_set=terms_arr)
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        pos = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.nan_to_num(pos, nan=0.0).astype(np.int64)
        cnt = np.where(valid, n_arr[pos], 1.0)
        bits = -np.log2(cnt / total)
        n_rows = len(batch)
        per_doc_sum = np.bincount(parents, weights=bits, minlength=n_rows)
        per_doc_n = np.bincount(parents, minlength=n_rows)
        keep = per_doc_n > 0
        lm = np.round(per_doc_sum[keep] / per_doc_n[keep], 6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "lm_bits": pa.array(lm, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def token_drift_ds(
    docs: rd.Dataset,
    k: int = 20,
    lam: float = 0.5,
    eval_mod: int = 97,
    target_residues: int = 3,
) -> rd.Dataset:
    """Token-distribution drift between two corpus slices — the
    data-quality monitor run between pipeline stages / crawl snapshots:
    which terms' frequencies moved most between the TARGET slice
    (doc_id % eval_mod < target_residues, the corpus-internal eval-set
    pattern) and the SOURCE slice (the rest)?

    Emits the top-``k`` drifted terms with their slice counts and the
    smoothed per-term KL contribution p_t * log2(p_t / p_s) (add-``lam``
    over the joint vocabulary V). Ranking uses the INTEGER cross-product
    key |n_t*S - n_s*T| (T/S = slice totals) desc then term asc — exact
    and engine-independent, no float-ordering ties.

    Scale shape: per-batch (term, nt, ns) combiner partials -> one
    vocab-bounded groupby-sum -> two scalar totals -> key/KL computed in
    a stateless map (totals ride the closure) -> sort+limit over the
    vocab-sized table only (the top_terms shape). The corpus streams
    once; nothing doc-sized shuffles."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = token_lists(batch.column("text"))
        flat = toks.flatten()
        if len(flat) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "nt": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                }
            )
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_t = (ids[parents] % eval_mod) < target_residues
        terms = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        nt = np.bincount(inv[is_t], minlength=len(uniq)).astype(np.int64)
        ns = np.bincount(inv[~is_t], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "term": pa.array(uniq, pa.string()),
                "nt": pa.array(nt, pa.int64()),
                "ns": pa.array(ns, pa.int64()),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("nt", alias_name="n_target"), Sum("ns", alias_name="n_source"))
        .materialize()  # vocab-bounded; read for totals + vocab + top-k below
    )
    t_total = int(counts.sum("n_target"))
    s_total = int(counts.sum("n_source"))
    n_vocab = int(counts.count())

    def keyed(batch: pa.Table) -> pa.Table:
        nt = batch.column("n_target").to_numpy(zero_copy_only=False)
        ns = batch.column("n_source").to_numpy(zero_copy_only=False)
        key = np.abs(nt * s_total - ns * t_total)
        return batch.append_column("drift_key", pa.array(key, pa.int64()))

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch.column("n_target").to_numpy(zero_copy_only=False).astype(np.float64)
        ns = batch.column("n_source").to_numpy(zero_copy_only=False).astype(np.float64)
        pt = (nt + lam) / (t_total + lam * n_vocab)
        ps = (ns + lam) / (s_total + lam * n_vocab)
        kl = np.round(pt * np.log2(pt / ps), 6)
        return pa.table(
            {
                "term": batch.column("term"),
                "n_target": batch.column("n_target"),
                "n_source": batch.column("n_source"),
                "kl_bits": pa.array(kl, pa.float64()),
            }
        )

    return (
        counts.map_batches(keyed, batch_format="pyarrow")
        .sort(["drift_key", "term"], descending=[True, False])
        .limit(k)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


def _bigram_batch(batch: pa.Table) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """(parents, w1, bigram-string) arrays for every in-doc bigram of the
    batch — shifted flat slices + one binary_join kernel, no Python loop."""
    toks = token_lists(batch.column("text"))
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = len(flat)
    if n < 2:
        e = pa.array([], pa.string())
        return np.array([], np.int64), e, e
    w1 = flat.slice(0, n - 1)
    w2 = flat.slice(1, n - 1)
    ok = parents[:-1] == parents[1:]  # both tokens inside the same doc
    grams = pc.binary_join_element_wise(w1, w2, " ")
    sel = pa.array(ok)
    return parents[:-1][ok], w1.filter(sel), grams.filter(sel)


def bigram_lm_ds(
    docs: rd.Dataset,
    alpha: float = 0.1,
    bigram_cap: int = 1 << 22,
    context_cap: int = 1 << 20,
) -> rd.Dataset:
    """Bigram language-model doc scoring — the order-1 step up from
    :func:`unigram_lm_ds` (the CCNet/KenLM perplexity-filter signal):
    per doc, lm2_bits = mean over bigram positions of
    ``-log2((c(w1 w2) + alpha) / (c_ctx(w1) + alpha * V))`` with add-alpha
    smoothing, where c_ctx(w1) counts w1's occurrences as a bigram context
    (so p sums to 1 per context) and V is the corpus distinct-token count.
    Docs with fewer than 2 tokens emit nothing. Higher = more surprising.

    Scale shape (the unigram_lm recipe, one order up): pass 1 computes
    bigram / context counts with the combiner pattern (one row per
    (batch, gram) through two SMALL groupby-sums) plus a distinct-token
    count; the top-``bigram_cap`` bigrams and top-``context_cap`` contexts
    (count desc, key asc — deterministic) are broadcast ONCE via ray.put —
    the caps bound the broadcast regardless of corpus size (a capped-out
    bigram backs off to the smoothing floor, exactly KenLM's pruned-model
    behavior). Pass 2 scores each doc in one vectorized map_batches
    (index_in + bincount); per-doc sums happen inside a single kernel, so
    the output is batch-partition-invariant."""
    import ray

    def b_partial(batch: pa.Table) -> pa.Table:
        _, _, grams = _bigram_batch(batch)
        if len(grams) == 0:
            return pa.table(
                {"g": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(grams.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"g": pa.array(uniq, pa.string()), "pn": pa.array(counts, pa.int64())}
        )

    def c_partial(batch: pa.Table) -> pa.Table:
        _, w1, _ = _bigram_batch(batch)
        if len(w1) == 0:
            return pa.table(
                {"g": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(w1.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"g": pa.array(uniq, pa.string()), "pn": pa.array(counts, pa.int64())}
        )

    def v_partial(batch: pa.Table) -> pa.Table:
        flat = token_lists(batch.column("text")).flatten()
        u = pc.unique(flat)
        return pa.table({"g": u, "pn": pa.array(np.ones(len(u), np.int64))})

    def _top_broadcast(partial_fn, cap: int):
        top = (
            docs.map_batches(partial_fn, batch_format="pyarrow")
            .groupby("g")
            .aggregate(Sum("pn", alias_name="n"))
            .sort(["n", "g"], descending=[True, False])
            .limit(cap)
        )
        t = pa.concat_tables(
            [t for t in ray.get(top.materialize().to_arrow_refs()) if t.num_rows]
        ).combine_chunks()
        return (
            t.column("g").combine_chunks(),
            t.column("n").to_numpy(zero_copy_only=False).astype(np.float64),
        )

    bg_keys, bg_n = _top_broadcast(b_partial, bigram_cap)
    cx_keys, cx_n = _top_broadcast(c_partial, context_cap)
    # V: distinct tokens — the groupby row count, nothing materializes
    n_vocab = float(
        docs.map_batches(v_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("pn", alias_name="n"))
        .count()
    )
    model_ref = ray.put((bg_keys, bg_n, cx_keys, cx_n))

    def score(batch: pa.Table) -> pa.Table:
        bg_k, bg_c, cx_k, cx_c = ray.get(model_ref)
        par, w1, grams = _bigram_batch(batch)

        def lookup(vals: pa.Array, keys: pa.Array, cnts: np.ndarray) -> np.ndarray:
            idx = pc.index_in(vals, value_set=keys)
            valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            pos = np.nan_to_num(
                idx.to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
            ).astype(np.int64)
            return np.where(valid, cnts[pos], 0.0)

        n_rows = len(batch)
        if len(par):
            c12 = lookup(grams, bg_k, bg_c)
            c1 = lookup(w1, cx_k, cx_c)
            bits = -np.log2((c12 + alpha) / (c1 + alpha * n_vocab))
            per_doc_sum = np.bincount(par, weights=bits, minlength=n_rows)
            per_doc_n = np.bincount(par, minlength=n_rows)
        else:
            per_doc_sum = np.zeros(n_rows)
            per_doc_n = np.zeros(n_rows, np.int64)
        keep = per_doc_n > 0
        lm = np.round(per_doc_sum[keep] / per_doc_n[keep], 6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "lm2_bits": pa.array(lm, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def quantile_bucket_ds(docs: rd.Dataset, n_buckets: int = 3) -> rd.Dataset:
    """CCNet-style head/middle/tail bucketing: every doc gets its n-tile
    by (n_tokens, doc_id) with exact SQL ``ntile`` semantics (the first
    ``n mod b`` buckets are one row larger) — WITHOUT a global sort of
    the data. A small value-histogram groupby locates the boundary
    VALUES; only the <= b-1 boundary value-groups are re-read to resolve
    the exact boundary (n_tokens, doc_id) pairs — and when a boundary
    group is itself huge (length skew: millions of docs with identical
    n_tokens), a doc_id-range histogram refines the selection so the
    driver only ever collects one ~1/1024 sub-bucket per level
    (SE_RAY_QUANTILE_REFINE_ABOVE, default 10M). Every doc then gets its
    bucket from b-1 broadcast lexicographic compares. Nothing larger
    than a histogram reaches the driver. Streaming passes over the
    source only — no materialization of the corpus."""
    import ray

    tc = token_count_ds(docs)

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(uniq, pa.int64()), "pn": pa.array(counts, pa.int64())}
        )

    hist = (
        tc.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    values = hist["v"].to_numpy(np.int64)
    vcounts = hist["n"].to_numpy(np.int64)
    n = int(vcounts.sum())
    cum = np.cumsum(vcounts)  # cum[i] = #rows with value <= values[i]
    base, rem = divmod(n, n_buckets)
    sizes = [base + (1 if i < rem else 0) for i in range(n_buckets)]
    def _kth_doc_id(v: int, k: int, group_count: int, refine_above: int) -> int:
        """doc_id at 0-indexed rank ``k`` among ascending doc_ids with
        n_tokens == v. When the value group is small it is collected
        directly; under length skew (a huge group — e.g. every doc the
        same length) a doc_id-range histogram narrows the selection to
        ONE sub-bucket first, so the driver never collects more than
        ~group_count / 1024 ids per refinement level."""
        pred = f"n_tokens == {v}"
        lo_id, hi_id, kk = None, None, k
        while group_count > refine_above:
            shift = max(1, (max(group_count, 2) - 1).bit_length() - 10)  # ~1024 buckets

            def id_hist(batch: pa.Table, _pred_lo=lo_id, _pred_hi=hi_id) -> pa.Table:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
                m = nt == v
                if _pred_lo is not None:
                    m &= (ids >= _pred_lo) & (ids <= _pred_hi)
                bk = ids[m] >> shift
                uniq, counts = np.unique(bk, return_counts=True)
                return pa.table(
                    {"bk": pa.array(uniq, pa.int64()), "pn": pa.array(counts, pa.int64())}
                )

            h = (
                tc.map_batches(id_hist, batch_format="pyarrow")
                .groupby("bk")
                .aggregate(Sum("pn", alias_name="n"))
                .to_pandas()
                .sort_values("bk")
            )
            bks = h["bk"].to_numpy(np.int64)
            cnts = h["n"].to_numpy(np.int64)
            c = np.cumsum(cnts)
            bi = int(np.searchsorted(c, kk + 1))
            kk -= int(c[bi - 1]) if bi else 0
            lo_id, hi_id = int(bks[bi]) << shift, ((int(bks[bi]) + 1) << shift) - 1
            group_count = int(cnts[bi])
        if lo_id is not None:
            pred += f" and doc_id >= {lo_id} and doc_id <= {hi_id}"
        group_ids = np.sort(
            np.concatenate(
                [
                    t.column("doc_id").to_numpy(zero_copy_only=False)
                    for t in ray.get(
                        tc.filter(expr=pred).materialize().to_arrow_refs()
                    )
                    if t.num_rows
                ]
                or [np.array([], np.int64)]
            )
        )
        return int(group_ids[kk])

    refine_above = int(
        __import__("os").environ.get("SE_RAY_QUANTILE_REFINE_ABOVE", 10_000_000)
    )
    bounds: list[tuple[int, int]] = []  # (value, doc_id) of each bucket's last row
    rank = 0
    for size in sizes[:-1]:
        rank += size  # 1-indexed rank of the bucket's last row
        vi = int(np.searchsorted(cum, rank))  # first value with cum >= rank
        v = int(values[vi])
        before = int(cum[vi - 1]) if vi else 0
        k = rank - before - 1  # 0-indexed position within the value group
        bounds.append((v, _kth_doc_id(v, k, int(vcounts[vi]), refine_above)))
    b_ref = ray.put(bounds)

    def assign(batch: pa.Table) -> pa.Table:
        bs = ray.get(b_ref)
        nt = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = np.ones(len(nt), dtype=np.int64)
        for bv, bd in bs:
            bucket += (nt > bv) | ((nt == bv) & (ids > bd))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    return tc.map_batches(assign, batch_format="pyarrow")


# RE2 on both sides (pyarrow and DuckDB), so redaction is engine-identical
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact_ds(docs: rd.Dataset) -> rd.Dataset:
    """PII redaction over the text column — the standard pre-training
    scrub (emails, then IPv4 literals, counted as they are replaced).
    Embarrassingly parallel: two vectorized RE2 kernels per batch, no
    shuffle, no state. Output (doc_id, clean_text, n_redacted). IPs are
    counted after email redaction so an address inside an email never
    double-counts."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_email = pc.count_substring_regex(text, PII_EMAIL_RE)
        t1 = pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>")
        n_ip = pc.count_substring_regex(t1, PII_IPV4_RE)
        t2 = pc.replace_substring_regex(t1, PII_IPV4_RE, "<IP>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": t2,
                "n_redacted": pc.add(n_email, n_ip).cast(pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def stratified_sample_ds(
    docs: rd.Dataset, per_group: int = 10, group_col: str = "lang"
) -> rd.Dataset:
    """Deterministic stratified sampling: the ``per_group`` docs with the
    smallest (md5(text), doc_id) within each group — reproducible on any
    cluster size, and oracle-checkable (DuckDB md5 == hashlib md5).

    The distributed top-k-per-key shape: each batch emits at most
    per_group rows PER GROUP (partial top-k combiner), so the final
    per-group selection shuffles n_batches * n_groups * per_group tiny
    rows, never the corpus."""
    from search_engine_ray.functions.textstats import md5_fingerprints_arrow

    def topk(tbl: pa.Table) -> pa.Table:
        grp = tbl.column(group_col)
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        enc = grp.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        smp = np.asarray(tbl.column("smp").to_pylist())
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, smp, codes))
        c = codes[order]
        run_start = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        pos_in_run = np.arange(len(c)) - np.repeat(run_start, np.diff(np.r_[run_start, len(c)]))
        sel = order[pos_in_run < per_group]
        return tbl.take(pa.array(np.sort(sel), pa.int64()))

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "doc_id": batch.column("doc_id"),
                "smp": pa.array(md5_fingerprints_arrow(text), pa.string()),
            }
        )
        return topk(t)

    def final(group: pa.Table) -> pa.Table:
        return topk(group).select([group_col, "doc_id"])

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-doc top-k TF-IDF terms (df joined by term, reduce-side)
# ---------------------------------------------------------------------------


def _doc_term_tf_batch(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, terms, tfs) — per-doc term frequencies for one batch,
    vectorized (lexsort + run-length), lowercased terms of length >= 2."""
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    toks = lower_tokens(token_lists(batch.column("text")))
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ok = pc.greater_equal(pc.utf8_length(flat), 2).to_numpy(zero_copy_only=False)
    terms = flat.to_numpy(zero_copy_only=False)[ok]
    par = parents[ok]
    order = np.lexsort((terms, par))
    t, p = terms[order], par[order]
    n = len(t)
    if not n:
        e = np.array([], dtype=np.int64)
        return e, t, e
    new = np.concatenate(([True], (t[1:] != t[:-1]) | (p[1:] != p[:-1])))
    starts = np.flatnonzero(new)
    tfs = np.diff(np.append(starts, n))
    return doc_ids[p[starts]], t[starts], tfs


def tfidf_topk_ds(docs: rd.Dataset, k: int = 3) -> rd.Dataset:
    """Per-doc top-k terms by TF-IDF (tf * ln(N/df)), ties broken by term.

    Scale shape: (doc_id, term, tf) rows are doc-local (ONE vectorized
    tokenize pass, no shuffle); the rows are then bucketed on hash(term),
    and df is computed INSIDE the term bucket — tf rows are distinct per
    (doc, term) with the same tokenization as ``term_df_ds`` (lower,
    len >= 2, per-doc distinct), so df(term) is simply the term's row
    count in its bucket. That removes the second corpus tokenize pass,
    the df partial-aggregation shuffle, and the map-side df rows of the
    old reduce-side join (the vocabulary at crawl scale is far too large
    to broadcast either way); the per-doc top-k is one more bucketed
    shuffle on doc_id with a vectorized run-length selection. Two
    shuffles total, no driver state, no whole-vocab materialization
    anywhere. Skew exposure is unchanged vs the join formulation: any
    per-term df needs the term's rows co-located, hot or not."""
    from search_engine_ray.pipelines.dedup import _bucketer, _n_pair_buckets

    n_docs = docs.count()
    n_buckets = _n_pair_buckets()

    def _term_buckets(terms: np.ndarray) -> np.ndarray:
        # vectorized hash once per DISTINCT term of the batch (dictionary
        # trick); bucket id is internal partitioning only — the join
        # resolves on string equality, so any uniform hash works
        from search_engine_ray.stages.postings import _hash_utf8_array

        uniq, inv = np.unique(terms, return_inverse=True)
        h = _hash_utf8_array(pa.array(uniq, pa.string()))
        return (h % np.uint64(n_buckets)).astype(np.int64)[inv]

    def tf_rows(batch: pa.Table) -> pa.Table:
        d, t, f = _doc_term_tf_batch(batch)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "term": pa.array(t, pa.string()),
                "tf": pa.array(f, pa.int64()),
                "_bkt": pa.array(_term_buckets(t), pa.int64()),
            }
        )

    def score(group: pa.Table) -> pa.Table:
        # df in-bucket: rows are distinct per (doc, term), so df(term) is
        # the term's row count across the whole bucket
        terms = group.column("term").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        f = group.column("tf").to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        t = terms[order]
        n = len(t)
        if not n:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tfidf": pa.array([], pa.float64()),
                }
            )
        new = np.concatenate(([True], t[1:] != t[:-1]))
        starts = np.flatnonzero(new)
        runs = np.diff(np.append(starts, n))
        df = np.repeat(runs, runs)  # df aligned to the sorted rows
        return pa.table(
            {
                "doc_id": pa.array(d[order], pa.int64()),
                "term": pa.array(t, pa.string()),
                "tfidf": pa.array(
                    f[order] * np.log(n_docs / df), pa.float64()
                ),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        t = group.column("term").to_numpy(zero_copy_only=False)
        s = group.column("tfidf").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -s, d))
        d, t, s = d[order], t[order], s[order]
        n = len(d)
        new = np.concatenate(([True], d[1:] != d[:-1]))
        starts = np.flatnonzero(new)
        pos = np.arange(n) - np.repeat(starts, np.diff(np.append(starts, n)))
        keep = pos < k
        return pa.table(
            {
                "doc_id": pa.array(d[keep], pa.int64()),
                "term": pa.array(t[keep], pa.string()),
                "tfidf": pa.array(np.round(s[keep], 6), pa.float64()),
                "rank": pa.array(pos[keep] + 1, pa.int64()),
            }
        )

    scored = (
        docs.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(score, batch_format="pyarrow")
    )
    return (
        scored.map_batches(_bucketer("doc_id", n_buckets), batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# within-doc term co-occurrence PMI over a capped vocabulary
# ---------------------------------------------------------------------------


def cooccur_pmi_ds(
    docs: rd.Dataset,
    vocab_size: int = 1000,
    min_count: int = 2,
    k: int = 20,
) -> rd.Dataset:
    """Top-k within-doc term pairs by PMI = ln(N * n_ab / (df_a * df_b)).

    Scale shape (the word2vec-era co-occurrence formulation): the pair
    space is bounded by an explicit top-``vocab_size``-by-df vocabulary —
    the one small side that IS broadcast (``ray.put`` once; V terms are a
    few MB even at V=1e6, vs the unbounded full vocabulary). Per batch,
    distinct (doc, term) rows are filtered to the vocab by searchsorted,
    pairs are emitted doc-locally as packed int codes (a*V+b), and
    partial-counted with one np.unique — a term pair crossing every doc of
    a batch ships ONE row into the single groupby(key) shuffle. PMI scoring
    and the final top-k sort run over at most V^2 aggregated rows."""
    import ray

    n_docs = docs.count()
    # vocabulary: top-V by df (deterministic ties by term), tiny by contract
    vocab_pdf = (
        term_df_ds(docs)
        .sort(["df", "term"], descending=[True, False])
        .limit(vocab_size)
        .to_pandas()
    )
    terms_sorted = np.sort(vocab_pdf["term"].to_numpy(dtype=object).astype(str))
    df_sorted = (
        vocab_pdf.set_index("term")["df"].loc[terms_sorted].to_numpy(np.int64)
    )
    v = len(terms_sorted)
    vocab_ref = ray.put((terms_sorted, df_sorted))

    def partial(batch: pa.Table) -> pa.Table:
        vterms, _ = ray.get(vocab_ref)
        t, d = _distinct_terms_batch(batch)
        # vocab filter + code assignment (codes follow lexicographic order,
        # so within-doc sorted terms yield code_a < code_b pairs for free)
        idx = np.searchsorted(vterms, t)
        idx_c = np.minimum(idx, max(len(vterms) - 1, 0))
        ok = (len(vterms) > 0) & (vterms[idx_c] == t) if len(vterms) else np.zeros(len(t), bool)
        codes, d = idx_c[ok], d[ok]
        n = len(codes)
        if not n:
            return pa.table(
                {"key": pa.array([], pa.int64()), "pn": pa.array([], pa.int64())}
            )
        # doc runs are contiguous (_distinct_terms_batch sorts by (doc, term))
        new = np.concatenate(([True], d[1:] != d[:-1]))
        starts = np.flatnonzero(new)
        cnts = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, cnts)
        rep = np.repeat(cnts, cnts) - 1 - pos
        npairs = int(rep.sum())
        if not npairs:
            return pa.table(
                {"key": pa.array([], pa.int64()), "pn": pa.array([], pa.int64())}
            )
        a_pos = np.repeat(np.arange(n), rep)
        run_prev = np.concatenate(([0], np.cumsum(rep)[:-1]))
        off = np.arange(npairs) - np.repeat(run_prev, rep)
        b_pos = a_pos + 1 + off
        key = codes[a_pos].astype(np.int64) * v + codes[b_pos]
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, pa.int64()),
                "pn": pa.array(counts, pa.int64()),
            }
        )

    def score(batch: pa.Table) -> pa.Table:
        vterms, vdf = ray.get(vocab_ref)
        key = batch.column("key").to_numpy(zero_copy_only=False)
        n_ab = batch.column("n_ab").to_numpy(zero_copy_only=False)
        keep = n_ab >= min_count
        key, n_ab = key[keep], n_ab[keep]
        a, b = key // v, key % v
        pmi = np.log(n_docs * n_ab / (vdf[a] * vdf[b]))
        return pa.table(
            {
                "term_a": pa.array(vterms[a], pa.string()),
                "term_b": pa.array(vterms[b], pa.string()),
                "n_ab": pa.array(n_ab, pa.int64()),
                "pmi": pa.array(np.round(pmi, 6), pa.float64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("pn", alias_name="n_ab"))
        .map_batches(score, batch_format="pyarrow")
    )
    return agg.sort(
        ["pmi", "term_a", "term_b"], descending=[True, False, False]
    ).limit(k)


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (approximate membership, the scale path)
# ---------------------------------------------------------------------------


def _bloom_params(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Double-hashing probe bases (h1, h2|1) from 64-bit shingle hashes."""
    with np.errstate(over="ignore"):
        z = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h1 = z ^ (z >> np.uint64(33))
        z2 = (h + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xC4CEB9FE1A85EC53)
        h2 = (z2 ^ (z2 >> np.uint64(29))) | np.uint64(1)
    return h1, h2


def _bloom_set(bits: np.ndarray, h: np.ndarray, m_bits: int, k: int) -> None:
    h1, h2 = _bloom_params(h)
    for i in range(k):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _bloom_test(bits: np.ndarray, h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    hit = np.ones(len(h), dtype=bool)
    h1, h2 = _bloom_params(h)
    for i in range(k):
        with np.errstate(over="ignore"):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= ((word >> (idx & np.uint64(63))) & np.uint64(1)) > 0
    return hit


def bloom_decontaminate_ds(
    docs: rd.Dataset,
    eval_mod: int = 97,
    k: int = 3,
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
) -> rd.Dataset:
    """Approximate-membership decontamination — the scale path of
    ``decontaminate_ds`` for when the eval shingle set outgrows a broadcast
    hash set (billions of shingles): the eval side is compressed into an
    ``m_bits``-bit Bloom filter (128 KB at the default) with ZERO false
    negatives by construction, so every truly contaminated doc is flagged;
    false positives only ever over-flag (safe direction for filtering
    training data) at rate ~(1-e^(-kn/m))^k.

    Build: per-batch partial Bloom words OR-merge in a binary tree of Ray
    tasks (the filter, not the shingles, crosses the wire; no driver pass
    over eval shingles). Probe: one vectorized double-hash probe per batch.
    Output: (doc_id, n_shingles, n_flagged). No SQL oracle (the FP set is
    hash-determined); tests pin zero-false-negative vs the exact operator
    and a bounded FP rate."""
    import ray

    from search_engine_ray.functions.textstats import (
        shingle_hashes_batch,
        token_lists,
    )

    n_words = m_bits // 64

    def partial_bloom(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % eval_mod) == 0
        bits = np.zeros(n_words, dtype=np.uint64)
        if mask.any():
            sub = batch.filter(pa.array(mask))
            text = sub.column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            hs, _ = shingle_hashes_batch(token_lists(text), k)
            _bloom_set(bits, hs, m_bits, n_hashes)
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.large_binary())})

    @ray.remote
    def _or2(a: bytes, b: bytes) -> bytes:
        return (
            np.frombuffer(a, np.uint64) | np.frombuffer(b, np.uint64)
        ).tobytes()

    @ray.remote
    def _block_blooms(t: pa.Table) -> bytes:
        # empty blocks pass through map_batches with the input schema
        if "bloom" not in t.column_names:
            return np.zeros(n_words, np.uint64).tobytes()
        rows = t.column("bloom").to_pylist()
        if not rows:
            return np.zeros(n_words, np.uint64).tobytes()
        acc = np.frombuffer(rows[0], np.uint64)
        for r in rows[1:]:
            acc = acc | np.frombuffer(r, np.uint64)
        return acc.tobytes()

    # materialize ONCE — to_arrow_refs on a lazy dataset re-executes the
    # plan a second time for schema inference (measured in build.py)
    refs = [
        _block_blooms.remote(r)
        for r in docs.map_batches(partial_bloom, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ]
    while len(refs) > 1:  # binary tree OR-reduce in the object store
        refs = [
            _or2.remote(refs[i], refs[i + 1]) if i + 1 < len(refs) else refs[i]
            for i in range(0, len(refs), 2)
        ]
    bloom_ref = (
        refs[0] if refs else ray.put(np.zeros(n_words, np.uint64).tobytes())
    )

    def score(batch: pa.Table) -> pa.Table:
        bits = np.frombuffer(ray.get(bloom_ref), np.uint64)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hs, starts = shingle_hashes_batch(token_lists(text), k)
        n = len(batch)
        per_doc = np.diff(starts)
        hit = _bloom_test(bits, hs, m_bits, n_hashes)
        p = np.repeat(np.arange(n), per_doc)
        n_bad = np.bincount(p, weights=hit.astype(np.float64), minlength=n).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_shingles": pa.array(per_doc.astype(np.int64), pa.int64()),
                "n_flagged": pa.array(n_bad, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sequence packing by token budget (distributed ordered prefix scan)
# ---------------------------------------------------------------------------


def pack_sequences_ds(docs: rd.Dataset, budget_tokens: int = 2048) -> rd.Dataset:
    """Assign each doc a (bin_id, bin_offset) in the contiguous token
    stream ordered by doc_id, bins of ``budget_tokens`` — the
    training-data sequence-packing layout (a doc starts in the bin its
    running token offset falls in). Deterministic: same result on any
    cluster shape.

    This is a distributed ORDERED PREFIX SCAN — the one shape a plain
    groupby cannot express: token counts are computed per batch
    (vectorized), the (doc_id, n_tokens) pairs — keys only, never the
    text payload — are range-sorted by doc_id, each sorted block reduces
    to ONE (rows, token_sum) scalar pair, the driver runs the exclusive
    scan over those per-block scalars (bytes, not data), and one remote
    task per block assigns bins with a numpy cumsum seeded by its block
    offset. No full-table pass through the driver; payload never shuffles."""
    import ray

    def counts(batch: pa.Table) -> pa.Table:
        from search_engine_ray.functions.textstats import token_counts

        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(
                    token_counts(batch.column("text")).astype(np.int64), pa.int64()
                ),
            }
        )

    ordered = (
        docs.map_batches(counts, batch_format="pyarrow").sort("doc_id").materialize()
    )
    refs = ordered.to_arrow_refs()  # range-sorted block order is preserved

    _EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "bin_id": pa.array([], pa.int64()),
            "bin_offset": pa.array([], pa.int64()),
        }
    )

    @ray.remote
    def _block_total(t: pa.Table) -> int:
        # sort+materialize can emit zero-row blocks with an EMPTY schema
        if t.num_rows == 0:
            return 0
        col = t.column("n_tokens")
        s = pc.sum(col).as_py()
        return int(s or 0)

    @ray.remote
    def _assign(t: pa.Table, offset: int) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        cum = offset + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "bin_id": pa.array(cum // budget_tokens, pa.int64()),
                "bin_offset": pa.array(cum % budget_tokens, pa.int64()),
            }
        )

    totals = ray.get([_block_total.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)
    return rd.from_arrow_refs(
        [_assign.remote(r, int(off)) for r, off in zip(refs, offsets)]
    )


def shard_export_ds(
    docs: rd.Dataset, n_shards: int = 16, out_dir: str | None = None
) -> rd.Dataset:
    """Deterministic global shuffle-and-shard layout — the last-mile step
    of a training-data pipeline: shard = md5-uniform(doc_id) mod n_shards,
    pos = rank of (md5, doc_id) within the shard, i.e. every shard holds a
    pseudorandom 1/n_shards slice of the corpus in pseudorandom order, and
    the (shard, pos) assignment is byte-identical on any cluster shape
    (md5-pinned, so the SQL oracle reproduces it exactly).

    This is the SEGMENTED variant of pack_sequences' distributed ordered
    prefix scan: (doc_id, h, shard) keys — never the text payload — are
    range-sorted by (shard, h, doc_id); each sorted block reduces to one
    n_shards-long count vector; the driver exclusive-scans those vectors
    column-wise (n_blocks x n_shards ints, bytes — a shard split across
    block boundaries gets its base carried over); one remote task per block
    assigns pos = per-shard base + vectorized run-length local rank. With
    ``out_dir`` the layout is written as hive-partitioned parquet
    (``shard=K/`` directories) — the resumable-output shape: a re-run can
    skip finished shard partitions, and exporting the payload itself is the
    documented composition (bucketed join of this layout onto the docs by
    doc_id, then the same partitioned write)."""
    import ray

    from search_engine_ray.functions.textstats import md5_id_u32

    def keys(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = md5_id_u32(ids).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "h": pa.array(h, pa.int64()),
                "shard": pa.array(h % n_shards, pa.int64()),
            }
        )

    ordered = (
        docs.map_batches(keys, batch_format="pyarrow")
        .sort(["shard", "h", "doc_id"])
        .materialize()
    )
    refs = ordered.to_arrow_refs()  # range-sorted block order is preserved

    _EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )

    @ray.remote
    def _shard_counts(t: pa.Table) -> np.ndarray:
        # sort+materialize can emit zero-row blocks with an EMPTY schema
        # (no columns at all) — count them as all-zeros
        if t.num_rows == 0:
            return np.zeros(n_shards, np.int64)
        sh = t.column("shard").to_numpy(zero_copy_only=False)
        return np.bincount(sh, minlength=n_shards).astype(np.int64)

    @ray.remote
    def _assign(t: pa.Table, base: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        sh = t.column("shard").to_numpy(zero_copy_only=False)
        n = len(sh)
        starts = np.r_[0, np.flatnonzero(sh[1:] != sh[:-1]) + 1]
        local = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, n])
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": t.column("shard"),
                "pos": pa.array(base[sh] + local, pa.int64()),
            }
        )

    counts = ray.get([_shard_counts.remote(r) for r in refs])
    if counts:
        mat = np.vstack(counts)
        bases = np.vstack(
            [np.zeros(n_shards, np.int64), np.cumsum(mat, axis=0)[:-1]]
        )
    else:
        bases = np.zeros((0, n_shards), np.int64)
    out = rd.from_arrow_refs(
        [_assign.remote(r, b) for r, b in zip(refs, bases)]
    )
    if out_dir is not None:
        out.write_parquet(out_dir, partition_cols=["shard"])
    return out


def weighted_sample_ds(
    docs: rd.Dataset, scale: int = 150, method: str = "md5"
) -> rd.Dataset:
    """Deterministic IMPORTANCE resampling: keep each doc with probability
    w = min(1, n_tokens/scale) — longer (higher-budget) docs kept more
    often, the DoReMi-style reweighting primitive — decided by comparing
    the doc's md5-uniform (first 8 hex chars of md5(doc_id)) against the
    per-doc threshold hex(floor(w * 2^32)), so membership is reproducible
    on any cluster shape, joinable across tables, and oracle-checkable
    (DuckDB computes the identical md5 and printf('%08x') threshold).
    One stateless map, no shuffle.

    ``method="fast"``: splitmix64(doc_id) < w * 2^64 — fully vectorized
    (no per-row md5), same expected rates and determinism, but a DIFFERENT
    member set (not md5-oracle-checkable); the crawl-scale variant."""

    def f(batch: pa.Table) -> pa.Table:
        from search_engine_ray.functions.textstats import md5_id_u32, token_counts

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = token_counts(batch.column("text")).astype(np.float64)
        w = np.minimum(1.0, n / float(scale))
        if method == "fast":
            from search_engine_ray.pipelines.sketches import _splitmix64

            # w >= 1 keeps unconditionally (w * 2^64 doesn't fit in uint64)
            full = w >= 1.0
            thr = (np.where(full, 0.0, w) * 2.0**64).astype(np.uint64)
            keep = full | (_splitmix64(ids.astype(np.uint64)) < thr)
        else:
            # u32 < thr == the oracle's hexdigest[:8] < printf('%08x', thr)
            # (fixed-width lowercase hex orders numerically); md5 itself is
            # the only remaining per-row cost
            thr = np.minimum((w * 2.0**32).astype(np.int64), 2**32 - 1)
            keep = md5_id_u32(ids).astype(np.int64) < thr
        out = batch.filter(pa.array(keep))
        kept_n = token_counts(out.column("text")).astype(np.int64)
        return pa.table(
            {
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(kept_n, pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def _dsir_gram_buckets(
    batch: pa.Table, n_buckets: int, variant: str
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, bucket) for every word unigram AND bigram of the batch.

    ``variant="md5"``: bucket = int(md5(gram)[:8 hex], 16) % n_buckets —
    matches DuckDB ``('0x' || substr(md5(g),1,8))::BIGINT % B`` exactly, so
    the whole operator is SQL-oracle-checkable; md5 runs once per DISTINCT
    gram of the batch (dictionary trick), but is still per-unique-string
    Python — the conformance variant. ``variant="fast"``: vectorized
    64-bit utf8 hash (the crawl-scale default shape; different member
    buckets, same statistics)."""
    import hashlib as _hashlib

    toks = token_lists(batch.column("text"))
    flat = toks.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = len(flat)
    if n == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    # bigrams: join two shifted views, valid where both ends share a doc
    if n >= 2:
        views = [flat.slice(i, n - 1) for i in range(2)]
        bigrams = pc.binary_join_element_wise(*views, " ")
        bok = parents[1:] == parents[:-1]
        grams = pa.concat_arrays([flat, bigrams.filter(pa.array(bok))])
        par = np.concatenate([parents, parents[:-1][bok]])
    else:
        grams = flat
        par = parents
    if variant == "fast":
        from search_engine_ray.stages.postings import _hash_utf8_array

        h = _hash_utf8_array(grams)
        bkt = (h % np.uint64(n_buckets)).astype(np.int64)
    else:
        gl = grams.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(gl, return_inverse=True)
        hu = np.array(
            [int(_hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in uniq],
            dtype=np.int64,
        )
        bkt = (hu % n_buckets)[inv]
    return par, bkt


def dsir_weights_ds(
    docs: rd.Dataset,
    n_buckets: int = 4096,
    lam: float = 0.5,
    eval_mod: int = 97,
    target_residues: int = 3,
    variant: str = "md5",
) -> rd.Dataset:
    """DSIR hashed n-gram importance weights (Xie et al., NeurIPS 2023:
    "Data Selection for Language Models via Importance Resampling").

    Features = word unigrams + bigrams hashed into ``n_buckets``; the
    target distribution is fit on the corpus-internal deterministic
    subset doc_id % eval_mod < target_residues (the decontaminate
    eval-set pattern — no external data), the source on all docs. Per
    doc, logw = sum over gram occurrences of
    ln p_target(bucket) - ln p_source(bucket) with add-``lam`` smoothing.
    Compose with ``weighted_sample_ds``-style seeded selection (or Gumbel
    top-k) to actually resample.

    Scale shape: pass 1 emits per-batch PARTIAL (bucket, src_n, tgt_n)
    count rows (<= n_buckets rows per batch via np.add.at into bounded
    vectors) -> one small groupby-sum -> a <= n_buckets-row take_all
    (bounded materialization, 32 KB at the default) -> the log-prob DIFF
    vector broadcast once via ray.put; pass 2 is one stateless
    vectorized map (np.bincount of diff[bucket] per doc). Two corpus
    passes, one bounded shuffle, nothing per-doc on the driver."""
    import ray

    def counts(batch: pa.Table) -> pa.Table:
        par, bkt = _dsir_gram_buckets(batch, n_buckets, variant)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = np.zeros(n_buckets, np.int64)
        tgt = np.zeros(n_buckets, np.int64)
        np.add.at(src, bkt, 1)
        if len(par):
            is_t = (ids[par] % eval_mod) < target_residues
            np.add.at(tgt, bkt[is_t], 1)
        nz = np.flatnonzero(src)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "src_n": pa.array(src[nz], pa.int64()),
                "tgt_n": pa.array(tgt[nz], pa.int64()),
            }
        )

    agg = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("src_n", alias_name="cs"), Sum("tgt_n", alias_name="ct"))
    )
    rows = agg.take_all()  # bounded: <= n_buckets rows
    cs = np.full(n_buckets, 0.0)
    ct = np.full(n_buckets, 0.0)
    for r in rows:
        cs[r["b"]] = float(r["cs"])
        ct[r["b"]] = float(r["ct"])
    ts, tt = cs.sum(), ct.sum()
    diff = np.log((ct + lam) / (tt + lam * n_buckets)) - np.log(
        (cs + lam) / (ts + lam * n_buckets)
    )
    diff_ref = ray.put(diff)

    def score(batch: pa.Table) -> pa.Table:
        d = ray.get(diff_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        par, bkt = _dsir_gram_buckets(batch, n_buckets, variant)
        logw = np.zeros(len(ids), np.float64)
        if len(par):
            logw = np.bincount(par, weights=d[bkt], minlength=len(ids))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "logw": pa.array(np.round(logw, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_resample_ds(
    docs: rd.Dataset,
    k: int = 100,
    temperature: float = 1.0,
    n_buckets: int = 4096,
    lam: float = 0.5,
    eval_mod: int = 97,
    target_residues: int = 3,
    variant: str = "md5",
) -> rd.Dataset:
    """DSIR importance RESAMPLING (Xie et al. 2023 §2.2) — the selection
    step over :func:`dsir_weights_ds`: draw ``k`` docs without replacement
    with probability proportional to ``exp(logw / temperature)`` via the
    Gumbel top-k trick (Vieira 2014): key = logw/T - ln(-ln(u)) with a
    per-doc deterministic uniform u, take the k largest keys.

    ``variant="md5"``: u = (md5_u32(str(doc_id)) % 1e6 + 0.5) / 1e6 —
    reproducible in SQL, so the full weights->resample pipeline is
    oracle-checkable. ``variant="fast"``: splitmix64(doc_id), vectorized.

    Scale shape: the weights pass is dsir_weights_ds (bounded n_buckets
    count shuffle, broadcast diff vector); selection is a per-batch
    partial top-k (argpartition) then ONE <= k*n_blocks-row merge task
    (repartition(1)) — no global sort, payload text never moves."""

    weights = dsir_weights_ds(
        docs, n_buckets, lam, eval_mod, target_residues, variant
    )

    def keyed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lw = batch.column("logw").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "logw": pa.array([], pa.float64()),
                    "key": pa.array([], pa.float64()),
                }
            )
        if variant == "fast":
            from search_engine_ray.pipelines.sketches import _splitmix64

            m = (
                _splitmix64(ids.astype(np.uint64)) % np.uint64(1_000_000)
            ).astype(np.float64)
        else:
            import hashlib as _hashlib

            m = np.array(
                [
                    int(
                        _hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16
                    )
                    % 1_000_000
                    for i in ids
                ],
                dtype=np.float64,
            )
        u = (m + 0.5) / 1_000_000.0
        key = lw / temperature - np.log(-np.log(u))
        kk = min(k, len(ids))
        top = np.argpartition(-key, kk - 1)[:kk]
        return pa.table(
            {
                "doc_id": pa.array(ids[top], pa.int64()),
                "logw": pa.array(lw[top], pa.float64()),
                "key": pa.array(key[top], pa.float64()),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lw = batch.column("logw").to_numpy(zero_copy_only=False)
        key = batch.column("key").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "logw": pa.array(lw[order], pa.float64()),
                "key": pa.array(np.round(key[order], 6), pa.float64()),
            }
        )

    return (
        weights.map_batches(keyed_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


def normalize_urls(urls: pa.Array) -> pa.Array:
    """Vectorized URL canonicalization — the dedup-key prep every crawl
    pipeline runs before url dedup:

      1. drop the fragment (first '#' onward);
      2. lowercase scheme and authority (host[:port]) — path/query case
         is preserved (paths are case-sensitive);
      3. strip the scheme's default port (:80 http, :443 https);
      4. strip trailing '/' runs from the path.

    All steps are RE2 kernels (pc.extract_regex / replace_substring_regex)
    — one pass, no Python per row. pyarrow and DuckDB both embed RE2, so
    the SQL oracle mirrors the exact same regex semantics. Rows that do
    not parse as scheme://... pass through unchanged."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    no_frag = pc.replace_substring_regex(urls, "#.*$", "")
    parts = pc.extract_regex(no_frag, r"^(?P<scheme>[^:/?#]+)://(?P<auth>[^/?#]*)(?P<rest>.*)$")
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(parts, "auth"))
    # default ports (scheme-conditional)
    auth = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(auth, ":80$", ""),
        auth,
    )
    auth = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(auth, ":443$", ""),
        auth,
    )
    rest = pc.replace_substring_regex(pc.struct_field(parts, "rest"), "/+$", "")
    # binary_join takes ONE separator, so build "scheme://" first
    rebuilt = pc.binary_join_element_wise(
        pc.binary_join_element_wise(scheme, "://", ""), auth, rest, ""
    )
    return pc.if_else(ok, rebuilt, no_frag)


def url_normalize_ds(
    docs: rd.Dataset, url_col: str = "url", out_col: str = "url_norm"
) -> rd.Dataset:
    """Append the canonicalized URL column (see normalize_urls). One
    stateless vectorized map, no shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, normalize_urls(batch.column(url_col)))

    return docs.map_batches(f, batch_format="pyarrow")


class HashedLogisticScorer:
    """Batched model inference as an actor-pool stage — the shape every
    learned quality/toxicity/domain classifier takes in a training-data
    pipeline (fastText-style linear model over hashed bag-of-words):

    - ``__init__`` (ONCE per actor): materialize the weight vector —
      either a real model's weights via an ``ObjectRef`` (``ray.put`` once,
      every actor reads the same copy from the object store) or a
      deterministic seeded stand-in (no model files ship in this sandbox).
    - ``__call__`` (per batch): fully vectorized — Arrow tokenize, one
      polynomial hash pass over the flat token buffer, bucket % dim,
      per-doc scatter-add into the feature matrix, one matvec + sigmoid.
      No Python-per-row work.

    Use: docs.map_batches(HashedLogisticScorer, fn_constructor_args=(dim,
    weights_ref_or_seed), batch_size=B, concurrency=N). Output:
    (doc_id, score float64 in (0,1)). Pinned by a numpy reference test
    (the hashing trick has no SQL mirror)."""

    def __init__(self, dim: int = 1 << 18, weights=7) -> None:
        import ray as _ray

        if isinstance(weights, int):  # seed for the deterministic stand-in
            rng = np.random.default_rng(weights)
            self.w = rng.standard_normal(dim) / np.sqrt(dim)
            self.b = 0.0
        else:  # ObjectRef or ndarray: a real model's weights
            w = _ray.get(weights) if not isinstance(weights, np.ndarray) else weights
            w = np.asarray(w, np.float64)
            if len(w) != dim:
                raise ValueError(
                    f"weight vector length {len(w)} != dim {dim}: the "
                    "hashing-trick bucket space must equal the model's "
                    "feature dimension (a shorter vector would IndexError "
                    "mid-inference; a longer one would silently score with "
                    "a truncated model)"
                )
            self.w = w
            self.b = 0.0
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        from search_engine_ray.stages.postings import _hash_utf8_array

        toks = token_lists(batch.column("text"))
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = len(batch)
        x_dot_w = np.zeros(n, np.float64)
        if len(flat):
            buckets = (_hash_utf8_array(flat) % np.uint64(self.dim)).astype(
                np.int64
            )
            np.add.at(x_dot_w, parents, self.w[buckets])
        score = 1.0 / (1.0 + np.exp(-(x_dot_w + self.b)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "score": pa.array(score, pa.float64()),
            }
        )


def model_score_ds(
    docs: rd.Dataset,
    dim: int = 1 << 18,
    weights=7,
    concurrency: int | None = None,
    batch_size: int = 1024,
) -> rd.Dataset:
    """(doc_id, score) via HashedLogisticScorer on an actor pool (weights
    load once per actor; inference vectorized per batch)."""
    if concurrency is None:
        from search_engine_ray.util import default_pool_size

        concurrency = default_pool_size()
    return docs.map_batches(
        HashedLogisticScorer,
        fn_constructor_args=(dim, weights),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def domain_mix_ds(
    docs: rd.Dataset,
    rates: dict[str, float],
    key_col: str = "source",
    default_rate: float = 0.0,
    method: str = "md5",
) -> rd.Dataset:
    """Deterministic DOMAIN-MIXTURE resampling — the data-mixing primitive
    a training run uses to hit target source proportions: keep each doc
    with its source's rate (``rates[source]``, ``default_rate`` for
    unlisted sources). Membership is the same md5-uniform vs
    hex-threshold compare as weighted_sample_ds, so the sample is
    reproducible on any cluster shape, joinable across tables, and
    oracle-checkable in DuckDB. The rate table is a driver-side constant
    (domains are few); the pass is one stateless map, no shuffle.
    Output: (doc_id, source) of kept docs.

    ``method="fast"``: splitmix64(doc_id) < rate * 2^64 — fully vectorized
    (no per-row md5), same expected rates and determinism, but a DIFFERENT
    member set (not md5-oracle-checkable); the crawl-scale variant."""

    def f(batch: pa.Table) -> pa.Table:
        from search_engine_ray.functions.textstats import md5_id_u32

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column(key_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        # per-DISTINCT-source rate lookup (domains are few), broadcast to
        # rows through the dictionary codes — no per-row dict/f-string work
        enc = src.dictionary_encode()
        dom_rates = np.array(
            [rates.get(s, default_rate) for s in enc.dictionary.to_pylist()],
            dtype=np.float64,
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        w = dom_rates[codes]
        if method == "fast":
            from search_engine_ray.pipelines.sketches import _splitmix64

            # rate >= 1 keeps unconditionally (w * 2^64 doesn't fit in uint64)
            full = w >= 1.0
            thr64 = (np.where(full, 0.0, w) * 2.0**64).astype(np.uint64)
            keep = full | (_splitmix64(ids.astype(np.uint64)) < thr64)
        else:
            # u32 < thr == the oracle's hexdigest[:8] < printf('%08x', thr)
            thr = np.minimum((w * 2.0**32).astype(np.int64), 2**32 - 1)
            keep = md5_id_u32(ids).astype(np.int64) < thr
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": out.column("doc_id").cast(pa.int64()),
                key_col: out.column(key_col).cast(pa.string()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# spell suggestion (SymSpell deletion-join over the corpus vocabulary)
# ---------------------------------------------------------------------------


def _lev1(a: str, b: str) -> bool:
    """Levenshtein distance <= 1 (insert/delete/substitute; no
    transposition — matches SQL levenshtein)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a+1 char: one skip allowed
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _deletions(term: str) -> list[str]:
    return [term[:i] + term[i + 1 :] for i in range(len(term))]


def spell_suggest_ds(
    docs: rd.Dataset, query_terms: list[str], k: int = 5
) -> rd.Dataset:
    """Did-you-mean: for each (misspelled) query term, the top-k corpus
    terms within Levenshtein distance 1, ranked by document frequency
    (df desc, term asc) — the reference-engine feature class the north
    rule's query side implies, done corpus-scale.

    Scale shape (SymSpell, Garbe — public): matching candidates are found
    by DELETION-NEIGHBORHOOD intersection, not by scanning the vocabulary
    with an edit-distance DP: each vocab term emits itself plus its
    length-1 deletions keyed by string (per DISTINCT term, the same
    granularity as the crc32 precedent); the query terms' neighborhoods
    (a handful of strings) broadcast, one vectorized pc.is_in filters the
    stream, and only the few surviving candidates pay an exact edit-1
    verify + a tiny final groupby/top-k. The df ranking rides in from
    term_df_ds — no join."""
    import ray

    qdel: dict[str, set[str]] = {
        q: set(_deletions(q)) | {q} for q in query_terms
    }
    all_keys = sorted(set().union(*qdel.values()))
    keys_ref = ray.put(pa.array(all_keys, pa.string()))
    queries_ref = ray.put(qdel)

    max_qlen = max((len(q) for q in query_terms), default=0)

    def candidates(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        qd = ray.get(queries_ref)
        terms_arr = batch.column("term")
        if isinstance(terms_arr, pa.ChunkedArray):
            terms_arr = terms_arr.combine_chunks()
        # VECTORIZED prefilter: t is a candidate iff t itself or one of
        # t's length-1 deletions is in the query neighborhood key set —
        # one slice+join array op per character position, no per-term
        # Python until the (tiny) survivor set.
        hit = pc.is_in(terms_arr, value_set=ks).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(terms_arr).to_numpy(zero_copy_only=False)
        big = 1 << 20
        for i in range(max_qlen + 1):
            pos_ok = lens > i
            if not pos_ok.any():
                break
            del_i = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(terms_arr, 0, i),
                pc.utf8_slice_codeunits(terms_arr, i + 1, big),
                "",
            )
            hit |= (
                pc.is_in(del_i, value_set=ks).to_numpy(zero_copy_only=False)
                & pos_ok
            )
        idx = np.flatnonzero(hit)
        terms = terms_arr.to_numpy(zero_copy_only=False)[idx]
        dfs = batch.column("df").to_numpy(zero_copy_only=False)[idx]
        out_q, out_t, out_df = [], [], []
        for t, d in zip(terms, dfs):  # survivors only: a handful
            t = str(t)
            neigh = set(_deletions(t)) | {t}
            for q, qn in qd.items():
                if (neigh & qn) and _lev1(q, t):
                    out_q.append(q)
                    out_t.append(t)
                    out_df.append(int(d))
        return pa.table(
            {
                "query_term": pa.array(out_q, pa.string()),
                "suggestion": pa.array(out_t, pa.string()),
                "df": pa.array(out_df, pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        t = group.column("suggestion").to_numpy(zero_copy_only=False)
        d = group.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -d))
        keep = order[:k]
        return pa.table(
            {
                "query_term": group.column("query_term").take(pa.array(keep)),
                "suggestion": pa.array(t[keep], pa.string()),
                "df": pa.array(d[keep], pa.int64()),
                "rank": pa.array(np.arange(1, len(keep) + 1), pa.int64()),
            }
        )

    return (
        term_df_ds(docs)
        .map_batches(candidates, batch_format="pyarrow")
        .groupby("query_term")
        .map_groups(topk, batch_format="pyarrow")
    )


def autocomplete_ds(
    docs: rd.Dataset, prefixes: list[str], k: int = 5
) -> rd.Dataset:
    """Prefix autocomplete: for each prefix, the top-k corpus terms
    starting with it, ranked by document frequency (df desc, term asc).
    One vectorized pc.starts_with filter per prefix over the
    combiner-aggregated term_df stream, then a tiny per-prefix top-k —
    the vocabulary is never collected anywhere."""

    def match(batch: pa.Table) -> pa.Table:
        terms = batch.column("term")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        dfs = batch.column("df")
        outs = []
        for p in prefixes:
            m = pc.starts_with(terms, pattern=p)
            t = terms.filter(m)
            outs.append(
                pa.table(
                    {
                        "prefix": pa.array([p] * len(t), pa.string()),
                        "term": t,
                        "df": dfs.filter(m),
                    }
                )
            )
        return pa.concat_tables(outs)

    def topk(group: pa.Table) -> pa.Table:
        t = group.column("term").to_numpy(zero_copy_only=False)
        d = group.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -d))[:k]
        return pa.table(
            {
                "prefix": group.column("prefix").take(pa.array(order)),
                "term": pa.array(t[order], pa.string()),
                "df": pa.array(d[order].astype(np.int64), pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return (
        term_df_ds(docs)
        .map_batches(match, batch_format="pyarrow")
        .groupby("prefix")
        .map_groups(topk, batch_format="pyarrow")
    )


def leakage_safe_split_ds(
    docs: rd.Dataset,
    key_col: str = "source",
    pcts: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> rd.Dataset:
    """Leakage-safe train/val/test assignment: the split is a function of
    the GROUPING KEY (domain/source), never the document, so every doc of
    a source — including its near-duplicates and boilerplate siblings —
    lands in the same split (the split-leakage rule from the dedup
    literature: splitting at document granularity leaks near-dups from
    train into eval).

    bucket = u32(md5(key)[:8 hex]) % 100; the split is the first name
    whose cumulative percentage exceeds the bucket. Deterministic,
    joinable across tables, oracle-checkable (DuckDB md5). Per batch the
    md5 runs once per DISTINCT key (domains repeat heavily), fanned out
    through dictionary codes."""
    assert sum(pcts) == 100 and len(pcts) == len(names)
    bounds = np.cumsum(pcts)  # e.g. [80, 90, 100]
    name_arr = list(names)

    def f(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        from search_engine_ray.functions.textstats import md5_digests_arrow

        d = md5_digests_arrow(enc.dictionary)
        u32 = d[:, :4].astype(np.uint32)
        u32 = (
            (u32[:, 0] << np.uint32(24))
            | (u32[:, 1] << np.uint32(16))
            | (u32[:, 2] << np.uint32(8))
            | u32[:, 3]
        )
        bucket_d = (u32 % np.uint32(100)).astype(np.int64)
        split_d = np.searchsorted(bounds, bucket_d, side="right")
        codes = enc.indices.to_numpy(zero_copy_only=False)
        bucket = bucket_d[codes]
        split = np.array(name_arr, dtype=object)[split_d[codes]]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                key_col: keys,
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def split_leakage_ds(
    docs: rd.Dataset,
    key_col: str = "source",
    pcts: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    by_doc: bool = False,
) -> rd.Dataset:
    """Split-leakage audit: for every exact-text fingerprint, how many
    DISTINCT splits do its copies land in? The dedup-literature check
    that a doc-granular split leaks eval content into train. Output is
    the histogram (n_splits, n_fps) — with a leakage-free (key-grouped)
    split every duplicate class that stays within one source reports
    n_splits = 1; cross-source copies are the residual leak surface.

    Set ``by_doc=True`` to audit a doc-granular split instead (split by
    md5(doc_id) — what NOT to ship) and see the leak the key-grouped
    rule prevents. Scale shape: (fp-halves, split) distinct pairs ->
    fp-keyed groupby -> per-batch histogram partials -> 3-row result."""
    from ray.data.aggregate import Sum as _Sum

    from search_engine_ray.functions.textstats import md5_digests_arrow, md5_id_u32

    assert sum(pcts) == 100 and len(pcts) == len(names)
    bounds = np.cumsum(pcts)

    def pairs(batch: pa.Table) -> pa.Table:
        d = md5_digests_arrow(batch.column("text"))
        h = d.view(">u8").astype(np.uint64)  # (n, 2)
        if by_doc:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            bucket = (md5_id_u32(ids) % np.uint32(100)).astype(np.int64)
        else:
            keys = batch.column(key_col)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            enc = keys.dictionary_encode()
            kd = md5_digests_arrow(enc.dictionary)
            u32 = kd[:, :4].astype(np.uint32)
            u32 = (
                (u32[:, 0] << np.uint32(24))
                | (u32[:, 1] << np.uint32(16))
                | (u32[:, 2] << np.uint32(8))
                | u32[:, 3]
            )
            bucket = (u32 % np.uint32(100)).astype(np.int64)[
                enc.indices.to_numpy(zero_copy_only=False)
            ]
        split = np.searchsorted(bounds, bucket, side="right").astype(np.int64)
        # distinct (fp, split) within the batch (combiner)
        arr = np.stack(
            [h[:, 0].view(np.int64), h[:, 1].view(np.int64), split], axis=1
        )
        uniq = np.unique(arr, axis=0)
        return pa.table(
            {
                "h1": pa.array(uniq[:, 0], pa.int64()),
                "h2": pa.array(uniq[:, 1], pa.int64()),
                "split": pa.array(uniq[:, 2], pa.int64()),
                "one": pa.array(np.ones(len(uniq), np.int64), pa.int64()),
            }
        )

    per_pair = (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby(["h1", "h2", "split"])
        .aggregate(_Sum("one", alias_name="_n"))
    )

    def fp_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h1": batch.column("h1"),
                "h2": batch.column("h2"),
                "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    per_fp = (
        per_pair.map_batches(fp_rows, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(_Sum("one", alias_name="n_splits"))
    )

    def hist(batch: pa.Table) -> pa.Table:
        ns = batch.column("n_splits").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(ns, return_counts=True)
        return pa.table(
            {
                "n_splits": pa.array(uniq, pa.int64()),
                "pn": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        per_fp.map_batches(hist, batch_format="pyarrow")
        .groupby("n_splits")
        .aggregate(_Sum("pn", alias_name="n_fps"))
        .sort("n_splits")
    )


# candidate payment-card spans: 13-19 digits in groups separated by
# single spaces or dashes (the formats Luhn-bearing PANs appear in);
# validated by Luhn before redaction so order numbers / timestamps with
# unlucky lengths are NOT scrubbed
PII_CARD_RE = r"\b(?:\d[ -]?){12,18}\d\b"


def _luhn_valid(digit_strings: list[str]) -> np.ndarray:
    """Vectorized Luhn checksum over same-or-variable-length digit
    strings (separators already stripped): pad left to a common width,
    double every second digit from the RIGHT, subtract 9 above 9, sum
    mod 10 == 0. One (n, width) uint8 matrix pass, no per-row Python."""
    if not digit_strings:
        return np.zeros(0, bool)
    lens = np.array([len(s) for s in digit_strings], np.int64)
    width = int(lens.max())
    mat = np.zeros((len(digit_strings), width), np.uint8)
    for i, s in enumerate(digit_strings):  # bounded by matches, not rows
        b = np.frombuffer(s.encode(), np.uint8) - ord("0")
        mat[i, width - len(b):] = b
    # position parity measured from the right edge: rightmost column is
    # position 1 (never doubled)
    dbl_col = (width - np.arange(width)) % 2 == 0
    doubled = mat * np.where(dbl_col, 2, 1)[None, :]
    doubled = np.where(doubled > 9, doubled - 9, doubled)
    # padding zeros contribute 0 either way
    ok_len = (lens >= 13) & (lens <= 19)
    return (doubled.sum(axis=1) % 10 == 0) & ok_len


def pii_cards_ds(docs: rd.Dataset) -> rd.Dataset:
    """Payment-card (PAN) redaction with Luhn validation — the PII class
    regex alone gets wrong in both directions (13-19 digit runs are
    often order ids; real PANs hide behind space/dash grouping).

    Per batch: one RE2 extract of candidate spans, separators stripped,
    one vectorized Luhn matrix pass, then a single replace of only the
    VALID spans (per-doc, longest-first so containing spans win). Output
    (doc_id, clean_text, n_cards, n_candidates). No shuffle, no state;
    the per-match Python is bounded by candidate count, not corpus size.
    Not SQL-expressible (Luhn); pinned by planted-card tests."""
    import re as _re

    card_re = _re.compile(PII_CARD_RE)

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        # vectorized RE2 pre-filter: only rows with >= 1 candidate span
        # ever reach the Python match loop (clean web text: ~none)
        cand_counts = pc.count_substring_regex(
            pc.coalesce(text, ""), PII_CARD_RE
        ).to_numpy(zero_copy_only=False)
        hit_rows = np.flatnonzero(cand_counts > 0)
        n = len(text)
        n_cards = np.zeros(n, np.int64)
        n_cand = cand_counts.astype(np.int64)
        if len(hit_rows) == 0:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "clean_text": text,
                    "n_cards": pa.array(n_cards, pa.int64()),
                    "n_candidates": pa.array(n_cand, pa.int64()),
                }
            )
        texts = text.to_pylist()
        out_t: list[str] = list(texts)
        for i in hit_rows:
            t = texts[i] or ""
            spans = list(card_re.finditer(t))
            if not spans:
                out_t[i] = t
                continue
            digits = [s.group().replace(" ", "").replace("-", "") for s in spans]
            valid = _luhn_valid(digits)
            n_cards[i] = int(valid.sum())
            if not valid.any():
                out_t[i] = t
                continue
            parts, pos = [], 0
            for s, ok in zip(spans, valid):
                if not ok:
                    continue
                parts.append(t[pos : s.start()])
                parts.append("<CARD>")
                pos = s.end()
            parts.append(t[pos:])
            out_t[i] = "".join(parts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": pa.array(out_t, pa.string()),
                "n_cards": pa.array(n_cards, pa.int64()),
                "n_candidates": pa.array(n_cand, pa.int64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def chunk_docs_ds(
    docs: rd.Dataset, chunk_tokens: int = 32, stride: int = 16
) -> rd.Dataset:
    """Overlapping fixed-size token-window chunking (RAG / context-window
    prep): split each document into windows of ``chunk_tokens`` tokens
    advancing by ``stride`` (overlap = chunk_tokens - stride).

    Chunk rule (mirrored exactly by the SQL oracle): a doc with L tokens
    emits ``1`` chunk if ``L <= chunk_tokens`` else
    ``ceil((L - chunk_tokens) / stride) + 1``; chunk ``i`` starts at token
    ``i * stride`` and holds ``min(chunk_tokens, L - start)`` tokens, so
    the final window always reaches the last token. Empty docs emit
    nothing.

    Output: one row per chunk —
    (doc_id, chunk_id, start_tok, n_tokens, chunk_text).

    Scale: single-pass map_batches, no shuffle. The take-index vector is
    built arithmetically (repeat/cumsum), the chunk text by one
    ``pc.binary_join`` over a list-array view of the gathered tokens —
    no per-row Python. Each output block is at most
    ``chunk_tokens/stride``x the input block bytes (the overlap factor),
    so block sizes stay bounded regardless of corpus size.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    c, s = chunk_tokens, stride

    def f(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = token_lists(batch.column("text"))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        doc_off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_off[1:])
        flat = toks.flatten()
        n_chunks = np.where(
            lens == 0, 0, np.where(lens <= c, 1, (lens - c + s - 1) // s + 1)
        )
        total = int(n_chunks.sum())
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
        if total == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(lens)), n_chunks)
        first = np.cumsum(n_chunks) - n_chunks  # row index of each doc's chunk 0
        cid = np.arange(total) - first[doc_idx]
        start = cid * s
        ntok = np.minimum(c, lens[doc_idx] - start)
        chunk_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(ntok, out=chunk_off[1:])
        tok_total = int(chunk_off[-1])
        # flat token index for output position j: base of its chunk plus the
        # offset within the chunk
        base = doc_off[doc_idx] + start
        idx = (
            np.arange(tok_total)
            - np.repeat(chunk_off[:-1], ntok)
            + np.repeat(base, ntok)
        )
        taken = flat.take(pa.array(idx, pa.int64()))
        if isinstance(taken, pa.ChunkedArray):
            taken = taken.combine_chunks()
        la = pa.ListArray.from_arrays(
            pa.array(chunk_off, pa.int32()), taken
        )
        chunk_text = pc.binary_join(la, " ")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_idx], pa.int64()),
                "chunk_id": pa.array(cid, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "chunk_text": chunk_text,
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def sparse_knn_ds(
    docs: rd.Dataset, k: int = 3, max_df: int | None = None
) -> rd.Dataset:
    """Per-doc top-k most-similar other docs by sparse term overlap —
    sim(a, b) = sum over shared terms of tf_a * tf_b (integer-exact, so
    hash-stable), the inverted-index formulation of all-pairs similarity
    (Bayardo et al., WWW'07): pairs are generated term-partitioned, never
    doc-vs-doc.

    Terms: lowercased, length >= 2 (same contract as ``tfidf_topk_ds`` /
    ``term_df_ds``). ``max_df`` drops terms appearing in more than that
    many docs BEFORE pair emission — the standard all-pairs cost knob:
    per-term pair work is df^2, so the cap bounds each term's emission at
    max_df^2 regardless of corpus size (high-df terms carry the least
    similarity signal; at crawl scale set it ~few hundred). df <= 1 terms
    emit nothing.

    Scale shape (mirror of tfidf_topk_ds): one vectorized tokenize pass
    emits doc-local (doc, term, tf) rows bucketed on hash(term); df and
    the cross-doc pair emission happen INSIDE the term bucket (df = term
    row count, pairs via repeat/arange index arithmetic — no Python
    loops); partial products then bucket on hash(doc_id) where they are
    summed per (a, b) and reduced to top-k per doc in one vectorized
    run-length pass. Two shuffles total; nothing materializes beyond the
    capped pair rows.

    Output: (doc_id, nbr_id, dot, rank), rank 1..k by (dot DESC, nbr_id).
    """
    from search_engine_ray.pipelines.dedup import _bucketer, _n_pair_buckets

    n_buckets = _n_pair_buckets()

    def _term_buckets(terms: np.ndarray) -> np.ndarray:
        from search_engine_ray.stages.postings import _hash_utf8_array

        uniq, inv = np.unique(terms, return_inverse=True)
        h = _hash_utf8_array(pa.array(uniq, pa.string()))
        return (h % np.uint64(n_buckets)).astype(np.int64)[inv]

    def tf_rows(batch: pa.Table) -> pa.Table:
        d, t, f = _doc_term_tf_batch(batch)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "term": pa.array(t, pa.string()),
                "tf": pa.array(f, pa.int64()),
                "_bkt": pa.array(_term_buckets(t), pa.int64()),
            }
        )

    _empty_pairs = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "partial": pa.array([], pa.int64()),
        }
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        terms = group.column("term").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        f = group.column("tf").to_numpy(zero_copy_only=False)
        n = len(terms)
        if not n:
            return _empty_pairs
        order = np.argsort(terms, kind="stable")
        t, d, f = terms[order], d[order], f[order]
        new = np.concatenate(([True], t[1:] != t[:-1]))
        starts = np.flatnonzero(new)
        runs = np.diff(np.append(starts, n))
        # runs survive or die whole: df <= 1 never pairs, df > max_df capped
        keep_runs = runs > 1
        if max_df is not None:
            keep_runs &= runs <= max_df
        if not keep_runs.any():
            return _empty_pairs
        row_keep = np.repeat(keep_runs, runs)
        d, f = d[row_keep], f[row_keep]
        run_lens = runs[keep_runs]
        m = len(d)
        # per-row run geometry in the FILTERED arrays
        s_of_run = np.concatenate(([0], np.cumsum(run_lens)[:-1]))
        s_of_row = np.repeat(s_of_run, run_lens)
        r_of_row = np.repeat(run_lens, run_lens)
        total = int((run_lens * run_lens).sum())
        pair_start = np.concatenate(([0], np.cumsum(r_of_row)[:-1]))
        a_idx = np.repeat(np.arange(m), r_of_row)
        b_idx = (
            np.arange(total)
            - np.repeat(pair_start, r_of_row)
            + np.repeat(s_of_row, r_of_row)
        )
        neq = a_idx != b_idx
        a_idx, b_idx = a_idx[neq], b_idx[neq]
        return pa.table(
            {
                "a": pa.array(d[a_idx], pa.int64()),
                "b": pa.array(d[b_idx], pa.int64()),
                "partial": pa.array(f[a_idx] * f[b_idx], pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        p = group.column("partial").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "nbr_id": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        n = len(a)
        if not n:
            return empty
        order = np.lexsort((b, a))
        a, b, p = a[order], b[order], p[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        dot = np.add.reduceat(p, starts)
        a, b = a[starts], b[starts]
        order2 = np.lexsort((b, -dot, a))
        a, b, dot = a[order2], b[order2], dot[order2]
        m = len(a)
        new2 = np.concatenate(([True], a[1:] != a[:-1]))
        s2 = np.flatnonzero(new2)
        pos = np.arange(m) - np.repeat(s2, np.diff(np.append(s2, m)))
        kp = pos < k
        return pa.table(
            {
                "doc_id": pa.array(a[kp], pa.int64()),
                "nbr_id": pa.array(b[kp], pa.int64()),
                "dot": pa.array(dot[kp], pa.int64()),
                "rank": pa.array(pos[kp] + 1, pa.int64()),
            }
        )

    pairs = (
        docs.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )
    return (
        pairs.map_batches(_bucketer("a", n_buckets), batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(topk, batch_format="pyarrow")
    )


def facet_counts_ds(
    docs: rd.Dataset,
    terms: list[str],
    facet_cols: list[str] | None = None,
) -> rd.Dataset:
    """Faceted search counts: how many docs match ALL of ``terms``
    (conjunctive containment over the lowercased token list), grouped by
    the facet columns — the aggregation behind a search UI's facet
    sidebar, run corpus-wide as a Dataset op rather than through the
    index (the index path serves top-k; facets need full match counts).

    Scale shape: membership test is one ``pc.is_in`` per query term over
    the flat token array (no per-row Python); each batch pre-aggregates
    to at most |facet cross product| rows before the global groupby sum,
    so the shuffle carries combiner rows only.

    Output: (facet cols..., n_docs), one row per facet combination with
    at least one matching doc.
    """
    facet_cols = facet_cols or ["source", "lang"]
    want = [t.lower() for t in terms]

    def partial(batch: pa.Table) -> pa.Table:
        toks = lower_tokens(token_lists(batch.column("text")))
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n_docs_in = len(batch)
        matched = np.ones(n_docs_in, dtype=bool)
        for t in want:
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            per_doc = np.zeros(n_docs_in, dtype=bool)
            per_doc[parents[hit]] = True
            matched &= per_doc
        idx = np.flatnonzero(matched)
        sub = batch.select(facet_cols).take(pa.array(idx, pa.int64()))
        # in-batch combine: count per facet tuple
        keys = [sub.column(c).to_numpy(zero_copy_only=False) for c in facet_cols]
        if not len(idx):
            return pa.table(
                {
                    **{c: pa.array([], pa.string()) for c in facet_cols},
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort(tuple(reversed(keys)))
        ks = [k[order] for k in keys]
        new = np.zeros(len(idx), dtype=bool)
        new[0] = True
        for k in ks:
            new[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(idx)))
        return pa.table(
            {
                **{c: pa.array(k[starts]) for c, k in zip(facet_cols, ks)},
                "n_docs": pa.array(counts, pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(facet_cols)
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def bpe_train_ds(docs: rd.Dataset, n_merges: int = 20) -> rd.Dataset:
    """Train BPE merges over the corpus (Sennrich et al., ACL'16) — the
    tokenizer-training side of an LLM data pipeline.

    Distributed shape: the corpus reduces ONCE to the (word, freq) table
    (per-batch combiner + one groupby — after this the corpus never
    re-reads); each merge iteration is (a) a vectorized adjacent-pair
    count over the word table with per-batch combining, (b) a groupby-sum
    whose ONLY the argmax row reaches the driver (sort desc + limit 1 —
    deterministic tie-break on the pair itself), and (c) a broadcast
    rewrite of the symbol sequences. The word table is materialized per
    round (iterative lineage, the pagerank/CC precedent) and is
    vocab-bounded — the per-word merge rewrite touches only rows whose
    symbol list contains both halves (mask prefilter), the standard
    freq-table formulation: corpus-scale work happens exactly once.

    Stops early when no pair occurs at least twice. Output: one row per
    learned merge — (merge_rank, left, right, freq)."""
    from ray.data.aggregate import Sum as _Sum

    def word_counts(batch: pa.Table) -> pa.Table:
        toks = lower_tokens(token_lists(batch.column("text")))
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        w, c = np.unique(flat, return_counts=True)
        return pa.table(
            {"word": pa.array(w, pa.string()), "n": pa.array(c, pa.int64())}
        )

    words = (
        docs.map_batches(word_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(_Sum("n", alias_name="n"))
    )

    def init_syms(batch: pa.Table) -> pa.Table:
        ws = batch.column("word").to_pylist()
        return pa.table(
            {
                "syms": pa.array([list(w) for w in ws], pa.list_(pa.string())),
                "n": batch.column("n"),
            }
        )

    cur = words.map_batches(init_syms, batch_format="pyarrow")

    _empty_pairs = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def pair_counts(batch: pa.Table) -> pa.Table:
        syms = batch.column("syms")
        if isinstance(syms, pa.ChunkedArray):
            syms = syms.combine_chunks()
        freq = batch.column("n").to_numpy(zero_copy_only=False)
        flat = syms.flatten()
        m = len(flat)
        if m < 2:
            return _empty_pairs
        parents = pc.list_parent_indices(syms).to_numpy(zero_copy_only=False)
        same = parents[1:] == parents[:-1]
        if not same.any():
            return _empty_pairs
        left = flat.slice(0, m - 1).filter(pa.array(same))
        right = flat.slice(1, m - 1).filter(pa.array(same))
        w = freq[parents[1:][same]]
        key = pc.binary_join_element_wise(left, right, "\x1f").to_numpy(
            zero_copy_only=False
        )
        uniq, inv = np.unique(key, return_inverse=True)
        agg = np.zeros(len(uniq), np.int64)
        np.add.at(agg, inv, w)
        ab = np.char.partition(uniq.astype(str), "\x1f")
        return pa.table(
            {
                "a": pa.array(ab[:, 0], pa.string()),
                "b": pa.array(ab[:, 2], pa.string()),
                "n": pa.array(agg, pa.int64()),
            }
        )

    def make_apply(a: str, b: str):
        merged = a + b

        def apply_merge(batch: pa.Table) -> pa.Table:
            syms = batch.column("syms")
            if isinstance(syms, pa.ChunkedArray):
                syms = syms.combine_chunks()
            out = syms.to_pylist()
            # per-row rewrite only where the left half occurs (prefilter);
            # this stage runs over the vocab-bounded word table, never the
            # corpus
            for i, s in enumerate(out):
                if a not in s:
                    continue
                j, res = 0, []
                L = len(s)
                while j < L:
                    if j + 1 < L and s[j] == a and s[j + 1] == b:
                        res.append(merged)
                        j += 2
                    else:
                        res.append(s[j])
                        j += 1
                out[i] = res
            return pa.table(
                {
                    "syms": pa.array(out, pa.list_(pa.string())),
                    "n": batch.column("n"),
                }
            )

        return apply_merge

    merges = []
    for rank in range(1, n_merges + 1):
        cur = cur.materialize()
        top = (
            cur.map_batches(pair_counts, batch_format="pyarrow")
            .groupby(["a", "b"])
            .aggregate(_Sum("n", alias_name="n"))
            .sort(["n", "a", "b"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not top or int(top[0]["n"]) < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append(
            {"merge_rank": rank, "left": a, "right": b, "freq": n}
        )
        cur = cur.map_batches(make_apply(a, b), batch_format="pyarrow")
    if not merges:
        return rd.from_arrow(
            pa.table(
                {
                    "merge_rank": pa.array([], pa.int64()),
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "freq": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_items(merges)


def cdc_chunk_docs_ds(
    docs: rd.Dataset, k: int = 2, modulus: int = 8, hash_method: str = "fast"
) -> rd.Dataset:
    """Content-defined chunking (the rolling-hash boundary rule used by
    dedup systems — FastCDC/LBFS lineage): cut BEFORE token i whenever
    the k-token gram starting at i hashes to 0 mod ``modulus``. Unlike
    fixed-stride windows (``chunk_docs_ds``), boundaries are anchored to
    CONTENT, so an insertion near the head of a doc shifts only the
    chunks around the edit — the property that makes chunk-level dedup
    robust to local edits. Expected chunk length = ``modulus`` tokens.

    Output: (doc_id, chunk_id, start_tok, n_tokens, chunk_text) — chunks
    PARTITION the token sequence (no overlap), chunk_id 0-based per doc.

    Scale shape: single-pass map_batches, no shuffle; boundaries and the
    segmented chunk ids are pure vectorized index arithmetic over the
    flat token array, and chunk text is one ``binary_join`` over a
    list-array VIEW of the flat tokens (chunks are contiguous, so no
    gather at all).

    ``hash_method``: the boundary rule only needs a uniform gram hash, so
    the scale DEFAULT is ``"fast"`` — the fully-vectorized polynomial
    ``_hash_utf8_array`` over the gram strings, zero per-gram Python.
    ``"md5"`` is the conformance variant the SQL oracle pins
    (``winnow_md5`` precedent), computed off the Arrow data buffer
    (``md5_prefix64_arrow``, no ``to_pylist``); both produce chunks with
    the same boundary STATISTICS (mean length ~= ``modulus``), pinned in
    tests/test_textops.py."""
    if hash_method not in ("fast", "md5"):
        raise ValueError(f"unknown hash_method {hash_method!r}")
    m = modulus

    def f(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = token_lists(batch.column("text"))
        flat = toks.flatten()
        n = len(flat)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
        if n == 0:
            return empty
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        doc_off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_off[1:])
        i_within = np.arange(n) - doc_off[parents]
        cut = np.zeros(n, dtype=bool)
        if n >= k:
            views = [flat.slice(i, n - k + 1) for i in range(k)]
            grams = pc.binary_join_element_wise(*views, " ")
            ok = parents[k - 1 :] == parents[: n - k + 1]
            if hash_method == "md5":
                # 60-bit md5 prefix (15 hex chars): stays inside a signed
                # 64-bit lane on BOTH engines (16 hex would overflow
                # BIGINT); hashed off the Arrow buffer, no to_pylist
                from search_engine_ray.functions.textstats import (
                    md5_prefix64_arrow,
                )

                h = md5_prefix64_arrow(grams) >> np.uint64(4)
            else:
                from search_engine_ray.stages.postings import _hash_utf8_array

                h = _hash_utf8_array(grams)
            cut[: n - k + 1] = ok & (i_within[: n - k + 1] >= 1) & (h % m == 0)
        cs = np.cumsum(cut.astype(np.int64))
        first = np.zeros(n, dtype=bool)
        first[doc_off[:-1][lens > 0]] = True
        # chunk_id of token t = cuts in (doc head, t]; the head can't cut
        chunk_id_at = cs - cs[doc_off[:-1]][parents]
        new = cut | first
        starts = np.flatnonzero(new)
        nlens = np.diff(np.append(starts, n))
        # chunks are CONTIGUOUS runs of the flat token array — build the
        # list view straight from the start offsets, no gather
        off = np.empty(len(starts) + 1, dtype=np.int32)
        off[:-1] = starts
        off[-1] = n
        la = pa.ListArray.from_arrays(pa.array(off, pa.int32()), flat)
        chunk_text = pc.binary_join(la, " ")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[parents[starts]], pa.int64()),
                "chunk_id": pa.array(chunk_id_at[starts], pa.int64()),
                "start_tok": pa.array(i_within[starts], pa.int64()),
                "n_tokens": pa.array(nlens, pa.int64()),
                "chunk_text": chunk_text,
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")
