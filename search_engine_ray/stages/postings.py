"""Tokenize-docs and postings-emit stages (the index-build hot path).

- ``TokenizeDocs``: actor-pool ``map_batches`` stage; html-extracted
  (title, text) -> ``tokens: list<string>`` (original case, positions = list
  index — the reference's Page.words, engine.ts:54) + ``dl``.
- ``EmitPostings``: actor-pool stage; tokens -> per-batch PARTIALLY AGGREGATED
  postings rows ``(term, doc_ids: list<int64>, tfs: list<int32>,
  dls: list<int32>)`` with doc_ids ascending within the batch. One row per
  distinct term per batch — the combiner that keeps the groupby("term")
  shuffle small (SURVEY §4.3.1). Head-term salting appends
  ``#<doc_id >> salt_shift>`` to the groupby key when configured.

Everything is Arrow/numpy-vectorized; the only Python-level loop is over
distinct terms per batch when building list offsets (numpy reduceat).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from search_engine_ray.config import EngineConfig
from search_engine_ray.tokenize import lower_tokens, tokenize_arrow
from search_engine_ray.util import limit_arrow_threads


def tokenize_docs_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, url, title, text) -> + tokens list<string>, dl int32.

    A STATELESS task (not an actor pool): the tokenizer state is module-level
    compiled RE2 kernels, so tasks are elastic with zero pool-startup cost —
    at 32 CPUs, actor pools here cost more in startup than they save."""
    limit_arrow_threads()
    title = pc.coalesce(batch.column("title"), "")
    text = pc.coalesce(batch.column("text"), "")
    # Engine.add tokenizes title + ' ' + text (engine.ts:54)
    joined = pc.binary_join_element_wise(title, text, " ")
    tokens = tokenize_arrow(joined)
    dl = pc.list_value_length(tokens).cast(pa.int32())
    return batch.append_column("tokens", tokens).append_column("dl", dl)


class TokenizeDocs:
    """Callable-class form of tokenize_docs_batch (for actor-pool use when a
    stage carries real per-worker state, e.g. an injected ML tokenizer)."""

    def __init__(self, config: EngineConfig | None = None) -> None:
        self.config = config or EngineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return tokenize_docs_batch(batch)


def emit_postings_batch(
    batch: pa.Table,
    config: EngineConfig,
    hot_terms: frozenset[str] | None = None,
) -> pa.Table:
    """(doc_id, tokens) -> partial-agg postings rows. STATELESS task.

    Per doc: lowercase, drop stop words / 1-char terms (engine.ts:70,490-492),
    term frequency = occurrence count. Per batch: group by term, collect
    doc_id-ascending runs.

    ``hot_terms``: globally-frequent terms (df pre-pass, build.py) that get
    doc_id-range salting; the set is small (head of the Zipf curve) — at
    cluster scale broadcast it with ray.put instead of closure capture."""
    limit_arrow_threads()
    stop = _EmitCtx(config)._stop
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    low = lower_tokens(tokens)
    flat = low.flatten()
    parents = pc.list_parent_indices(low).to_numpy(zero_copy_only=False)

    # stop-word / short-word mask (vectorized)
    ok = pc.greater_equal(pc.utf8_length(flat), 2)
    if len(stop):
        ok = pc.and_(ok, pc.invert(pc.is_in(flat, value_set=pa.array(stop))))
    ok_np = ok.to_numpy(zero_copy_only=False)

    # dictionary-encode terms ONCE: all grouping below sorts int32 codes, not
    # strings (object-dtype lexsort was the emit hot spot at large batches)
    dict_arr = pc.dictionary_encode(flat)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)[ok_np]
    vocab = dict_arr.dictionary  # pa.StringArray
    term_parents = parents[ok_np]

    if len(codes) == 0:
        return _empty_postings_table()

    # tf per (doc, term): single-key sort of combined (parent, code) int64 —
    # a two-key lexsort plus gathers was 4s/batch at 5M tokens; one radix-ish
    # np.sort of the packed key is ~6x cheaper. parent < 2^17, code < 2^20.
    v_size = np.int64(len(vocab))
    combo = term_parents.astype(np.int64) * v_size + codes.astype(np.int64)
    combo.sort()
    new_run = np.empty(len(combo), dtype=bool)
    new_run[0] = True
    if len(combo) > 1:
        new_run[1:] = combo[1:] != combo[:-1]
    run_starts = np.flatnonzero(new_run)
    tf = np.diff(np.append(run_starts, len(combo))).astype(np.int32)
    u_combo = combo[run_starts]
    u_codes = (u_combo % v_size).astype(np.int32)
    u_parents = u_combo // v_size
    u_doc_ids = doc_ids[u_parents].astype(np.int64)
    dls = (batch.column("dl").to_numpy(zero_copy_only=False)[u_parents]).astype(
        np.int32
    )

    # per-posting salt for HOT terms only: doc_id >> salt_shift buckets a hot
    # term's postings into DISJOINT doc_id ranges, so each (term, salt)
    # merges on its own reducer and the reader simply concatenates runs in
    # salt order — no second shuffle (SURVEY §4.3.1, head-term skew).
    # Hotness is decided GLOBALLY (df pre-pass) so every run of a term uses
    # the same salting rule and ranges stay disjoint.
    if config.salt_shift > 0 and hot_terms:
        hot_codes = pc.is_in(
            vocab, value_set=pa.array(sorted(hot_terms), pa.string())
        ).to_numpy(zero_copy_only=False)
        is_hot = hot_codes[u_codes]
        salts = np.where(
            is_hot, u_doc_ids >> config.salt_shift, 0
        ).astype(np.int64)
    else:
        salts = np.zeros(len(u_doc_ids), dtype=np.int64)

    # group by (code, salt); within each group keep doc_id ascending.
    # salt is doc_id >> shift, monotone in doc_id — two sort keys suffice.
    order2 = np.lexsort((u_doc_ids, u_codes))
    g_codes = u_codes[order2]
    g_salts = salts[order2]
    g_doc_ids = u_doc_ids[order2]
    g_tfs = tf[order2]
    g_dls = dls[order2]

    change = np.empty(len(g_codes), dtype=bool)
    change[0] = True
    change[1:] = (g_codes[1:] != g_codes[:-1]) | (g_salts[1:] != g_salts[:-1])
    starts = np.flatnonzero(change)
    offsets = np.append(starts, len(g_codes)).astype(np.int64)
    out_terms = vocab.take(pa.array(g_codes[starts], pa.int32()))
    out_salts = g_salts[starts]

    # merge-shuffle bucket: stable hash of (term, salt), so a salted hot
    # term spreads over many reduce tasks. Hash the per-batch DICTIONARY
    # once (vectorized uint64 polyhash over the vocab's utf8 buffer), then
    # gather per group row — no per-key Python loop (a zlib.crc32 loop over
    # every emitted key was ~10% of emit wall at large batches).
    nb = config.merge_buckets
    vocab_hash = _hash_utf8_array(vocab)
    mixed = vocab_hash[g_codes[starts]] ^ (
        out_salts.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )
    bucket = (mixed % np.uint64(nb)).astype(np.int64)

    # the merge factorizes (term, salt) itself — no string group key is
    # shipped through the shuffle (it was ~30% of the shuffle bytes)
    off_arr = pa.array(offsets, pa.int64())
    return pa.table(
        {
            "bucket": pa.array(bucket, pa.int64()),
            "term": out_terms,
            "salt": pa.array(out_salts, pa.int64()),
            "doc_ids": pa.ListArray.from_arrays(
                off_arr, pa.array(g_doc_ids, pa.int64())
            ),
            "tfs": pa.ListArray.from_arrays(off_arr, pa.array(g_tfs, pa.int32())),
            "dls": pa.ListArray.from_arrays(off_arr, pa.array(g_dls, pa.int32())),
        }
    )


_POLY = np.uint64(1099511628211)  # FNV prime; uint64 wraparound is the modulus


def _hash_utf8_array(
    arr: pa.Array,
    poly: np.uint64 = None,
    add: int = 31,
) -> np.ndarray:
    """Deterministic per-string uint64 polynomial hash, fully vectorized.

    h(s) = sum((byte_i + add) * poly^(len-1-i)) mod 2^64 over the Arrow
    utf8 data buffer — no Python-per-string work. Stability is only needed
    within one build (bucket routing), but the function is deterministic
    across processes and runs. Pass a different (poly, add) for an
    INDEPENDENT second hash (url dedup uses (h1, h2) as a 128-bit key)."""
    if poly is None:
        poly = _POLY
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    lens = np.diff(off)
    if len(data) == 0:
        return np.zeros(n, dtype=np.uint64)
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    starts_b = np.repeat(off[:-1] - off[0], lens)
    pos = np.arange(len(data), dtype=np.int64) - starts_b
    exp = np.repeat(lens, lens) - 1 - pos
    max_len = int(lens.max())
    pows = np.ones(max_len, dtype=np.uint64)
    if max_len > 1:
        pows[1:] = poly
        np.multiply.accumulate(pows, out=pows)
    contrib = (data.astype(np.uint64) + np.uint64(add)) * pows[exp]
    h = np.zeros(n, dtype=np.uint64)
    np.add.at(h, parent, contrib)
    return h


def _hash_utf8_array_tab(arr: pa.Array) -> np.ndarray:
    """Tabulation-style per-string uint64 hash, fully vectorized —
    STRUCTURALLY independent of ``_hash_utf8_array``'s polynomial scheme.

    h(s) = splitmix64( sum_i splitmix64(pos_i * K ^ byte_i) ^ len * L ):
    each (position, byte) pair indexes a pseudorandom 64-bit table entry
    (SplitMix64 of the packed pair) and the entries are summed per string.
    A collision here requires equal SUMS of effectively-random table
    values — a different algebraic problem from the linear-recurrence
    collisions of a polynomial hash, so an adversary cannot construct a
    joint (h1, h2) collision by solving one polynomial system (the round-3
    h2 used the SAME polynomial form with different constants, which made
    the documented ~n^2/2^129 bound optimistic under adversarial input)."""
    from search_engine_ray.pipelines.sketches import _splitmix64

    _K = np.uint64(0xD6E8FEB86659FD93)
    _L = np.uint64(0xA3AAC1A9B1F4E2C5)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    lens = np.diff(off)
    with np.errstate(over="ignore"):
        if len(data):
            parent = np.repeat(np.arange(n, dtype=np.int64), lens)
            starts_b = np.repeat(off[:-1] - off[0], lens)
            pos = (np.arange(len(data), dtype=np.int64) - starts_b).astype(
                np.uint64
            )
            entries = _splitmix64(pos * _K ^ data.astype(np.uint64))
            h = np.zeros(n, dtype=np.uint64)
            np.add.at(h, parent, entries)
        else:
            h = np.zeros(n, dtype=np.uint64)
        return _splitmix64(h ^ lens.astype(np.uint64) * _L)


def partial_df_batch(batch: pa.Table, config: EngineConfig) -> pa.Table:
    """Per-batch partial document frequencies (term, pdf) with the same term
    filter as emit — the df pre-pass that decides which terms get salted."""
    limit_arrow_threads()
    stop = _EmitCtx(config)._stop
    tokens = batch.column("tokens")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    low = lower_tokens(tokens)
    flat = low.flatten()
    parents = pc.list_parent_indices(low).to_numpy(zero_copy_only=False)
    ok = pc.greater_equal(pc.utf8_length(flat), 2)
    if len(stop):
        ok = pc.and_(ok, pc.invert(pc.is_in(flat, value_set=pa.array(stop))))
    ok_np = ok.to_numpy(zero_copy_only=False)
    dict_arr = pc.dictionary_encode(flat)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)[ok_np]
    vocab = dict_arr.dictionary
    if len(codes) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "pdf": pa.array([], pa.int64())}
        )
    v_size = np.int64(len(vocab))
    combo = parents[ok_np].astype(np.int64) * v_size + codes.astype(np.int64)
    combo.sort()
    uniq = np.unique(combo)
    pdf = np.bincount((uniq % v_size).astype(np.int64), minlength=int(v_size))
    nz = np.flatnonzero(pdf)
    return pa.table(
        {
            "term": vocab.take(pa.array(nz, pa.int32())),
            "pdf": pa.array(pdf[nz], pa.int64()),
        }
    )


class _EmitCtx:
    __slots__ = ("config", "_stop")

    def __init__(self, config: EngineConfig) -> None:
        self.config = config
        self._stop = np.array(sorted(config.stop_words), dtype=object)


class EmitPostings:
    """Callable-class form of emit_postings_batch (actor-pool variant)."""

    def __init__(self, config: EngineConfig | None = None) -> None:
        self.config = config or EngineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return emit_postings_batch(batch, self.config)


def _empty_postings_table() -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "salt": pa.array([], pa.int64()),
            "doc_ids": pa.array([], pa.list_(pa.int64())),
            "tfs": pa.array([], pa.list_(pa.int32())),
            "dls": pa.array([], pa.list_(pa.int32())),
        }
    )
