"""Index segments on disk: merge-encode stage, loaders, lazy reader.

Segment layout under ``<out_dir>/``:

- ``docs/``      Parquet doc store: (doc_id, url, title, tokens, dl) — the
                 reference's pages/ JSON-per-page digit-trie
                 (binary-file-storage.ts:132-165) becomes range-readable
                 columnar files.
- ``segments/``  Parquet postings: one row per (term, salt bucket) with
                 delta-varint encoded doc_ids/tfs and block-max metadata.
                 Terms are sorted within files (groupby sort order), so
                 parquet row-group stats give predicate pushdown on term.
- ``manifest.json``  corpus stats + lineage (input fingerprint, timings,
                 config) — the resumability/metrics record (SURVEY §4.3.4).

A salt-bucketed term occupies multiple rows with DISJOINT ascending doc_id
ranges; readers concatenate runs in salt order.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from search_engine_ray.config import EngineConfig
from search_engine_ray.functions.scoring import bm25_term_upper_bound
from search_engine_ray.state import fsio
from search_engine_ray.state.codec import (
    block_boundaries,
    decode_doc_ids_any,
    decode_tfs,
    ef_encode_multi,
    encode_tfs,
    encode_varints_with_offsets,
)
from search_engine_ray.state.index import DocRecord, DocStore, InvertedIndex

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("df_run", pa.int32()),
        ("doc_ids_enc", pa.large_binary()),
        ("tfs_enc", pa.large_binary()),
        ("dls_enc", pa.large_binary()),
        ("block_last", pa.list_(pa.int64())),
        ("block_bound", pa.list_(pa.float32())),
        ("max_tf", pa.int32()),
    ]
)


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def parquet_files(dir_path: str) -> list[str]:
    """Part files only — directories also hold manifests/markers.
    ``dir_path`` may be a local path or a pyarrow.fs URI; returned paths
    keep the original scheme (pyarrow readers infer the filesystem)."""

    return [
        fsio.join(dir_path, f)
        for f in fsio.listdir(dir_path)
        if f.endswith(".parquet")
    ]


def make_bucket_merge_encode(stats: CorpusStats, config: EngineConfig):
    """Vectorized merge+encode for a whole HASH BUCKET of (term, salt) groups.

    ``groupby("bucket")`` hands this function every postings row of one
    bucket (~vocab/num_buckets terms). All groups are merged and encoded in
    a handful of numpy passes — one lexsort, one grouped delta, three varint
    encodes over the concatenated values — instead of one Python map_groups
    call per term. Per-group work is reduced to byte-slicing and block-max
    reduceat, which profiling showed is what makes the merge stage scale.
    """
    n_docs, avgdl = stats.n_docs, stats.avgdl
    k1, b, block_size = config.bm25_k1, config.bm25_b, config.block_size

    def bucket_merge_encode(group: pa.Table) -> pa.Table:
        from search_engine_ray.util import limit_arrow_threads

        limit_arrow_threads()
        term_col = group.column("term")
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        terms_np = term_col.to_numpy(zero_copy_only=False)
        salts_np = group.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_col = group.column("doc_ids").combine_chunks()
        all_doc = doc_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        parents = pc.list_parent_indices(doc_col).to_numpy(zero_copy_only=False)
        all_tf = (
            group.column("tfs").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        all_dl = (
            group.column("dls").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).astype(np.int64)

        # factorize (term, salt) groups WITHOUT a string key (the key string
        # used to be shipped through the shuffle — ~30% of its bytes — and
        # factorized with an object-dtype np.unique, the slowest sort here).
        # dictionary-encode terms once, remap codes to LEXICOGRAPHIC rank so
        # output rows stay term-sorted (parquet row-group pruning), then
        # int-lexsort (salt, rank).
        dict_arr = pc.dictionary_encode(term_col)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        vocab = dict_arr.dictionary
        vocab_rank = np.empty(len(vocab), dtype=np.int64)
        vocab_rank[
            pc.sort_indices(vocab).to_numpy(zero_copy_only=False)
        ] = np.arange(len(vocab))
        tcode = vocab_rank[codes]
        g_order = np.lexsort((salts_np, tcode))
        tc_s = tcode[g_order]
        sa_s = salts_np[g_order]
        new_g = np.empty(len(tc_s), dtype=bool)
        if len(tc_s):
            new_g[0] = True
            new_g[1:] = (tc_s[1:] != tc_s[:-1]) | (sa_s[1:] != sa_s[:-1])
        group_id_sorted = np.cumsum(new_g) - 1
        row_codes = np.empty(len(tc_s), dtype=np.int64)
        row_codes[g_order] = group_id_sorted
        n_groups = int(group_id_sorted[-1]) + 1 if len(tc_s) else 0
        # representative input row per group (term/salt equal within a group)
        rep = g_order[np.flatnonzero(new_g)]

        val_codes = row_codes[parents]
        order = np.lexsort((all_doc, val_codes))
        d = all_doc[order]
        tf = all_tf[order]
        dl = all_dl[order]
        c = val_codes[order]

        starts = np.flatnonzero(np.diff(c, prepend=-1) != 0)
        ends = np.append(starts[1:], len(c))

        deltas = d.copy()
        deltas[1:] -= d[:-1]
        deltas[starts] = d[starts]
        non_start = np.ones(len(d), dtype=bool)
        non_start[starts] = False
        if (deltas[non_start] <= 0).any():
            raise ValueError("duplicate or unsorted doc_ids within a term group")

        if config.postings_codec == "ef":
            # Elias-Fano over the ABSOLUTE sorted doc_ids (EF is already a
            # gap-free monotone codec; deltas are a varint-ism). Offsets come
            # back per GROUP, unlike the per-VALUE varint offsets.
            enc_doc, grp_off_doc = ef_encode_multi(
                d.astype(np.uint64), starts, ends
            )
            off_doc = None
        else:
            enc_doc, off_doc = encode_varints_with_offsets(
                deltas.astype(np.uint64)
            )
            grp_off_doc = None
        enc_tf, off_tf = encode_varints_with_offsets(tf.astype(np.uint64))
        enc_dl, off_dl = encode_varints_with_offsets(dl.astype(np.uint64))

        df_runs = (ends - starts).astype(np.int32)

        # ---- block metadata, vectorized across ALL groups -----------------
        # per-group block starts laid out globally: groups are contiguous, so
        # the next edge after a group's last block start is the next group's
        # first start == this group's end — a single global reduceat is exact.
        n_blocks = ((ends - starts) + block_size - 1) // block_size
        blk_off = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(n_blocks, out=blk_off[1:])
        total_blocks = int(blk_off[-1])
        within = np.arange(total_blocks) - np.repeat(blk_off[:-1], n_blocks)
        edges = np.repeat(starts, n_blocks) + within * block_size
        block_ends = np.append(edges[1:], len(d))
        block_last_all = d[block_ends - 1]
        btf = np.maximum.reduceat(tf, edges).astype(np.float64)
        bdl = np.minimum.reduceat(dl, edges).astype(np.float64)
        g_of_block = np.repeat(np.arange(n_groups), n_blocks)
        dfb = df_runs[g_of_block].astype(np.float64)
        idf = np.log(1.0 + (n_docs - dfb + 0.5) / (dfb + 0.5))
        bound = idf * btf * (k1 + 1.0) / (btf + k1 * (1.0 - b + b * (bdl / avgdl)))
        max_tfs = np.maximum.reduceat(tf, starts).astype(np.int32)

        # ---- zero-copy per-group binary slices via Arrow offset buffers ---
        # large_binary (int64 offsets): a hash bucket's encoded postings can
        # exceed 2^31 bytes at crawl scale; int32 offsets would wrap silently.
        def bin_col(
            enc: bytes, off: np.ndarray | None, grp_off: np.ndarray | None = None
        ) -> pa.Array:
            if grp_off is None:
                grp_off = off[np.append(starts, len(d))]
            group_off = grp_off.astype(np.int64)
            return pa.Array.from_buffers(
                pa.large_binary(),
                n_groups,
                [None, pa.py_buffer(group_off.tobytes()), pa.py_buffer(enc)],
            )

        blk_off32 = pa.array(blk_off, pa.int64())
        return pa.table(
            {
                "term": pa.array(terms_np[rep], pa.string()),
                "salt": pa.array(salts_np[rep].astype(np.int64), pa.int64()),
                "df_run": pa.array(df_runs, pa.int32()),
                "doc_ids_enc": bin_col(enc_doc, off_doc, grp_off_doc),
                "tfs_enc": bin_col(enc_tf, off_tf),
                "dls_enc": bin_col(enc_dl, off_dl),
                "block_last": pa.ListArray.from_arrays(
                    blk_off32, pa.array(block_last_all, pa.int64())
                ),
                # quantize UP to float32: rounding to nearest could drop the
                # stored bound below the true float64 block max, letting a
                # pruning check reject a doc that beats the threshold by less
                # than the quantization error. nextafter preserves the
                # upper-bound invariant.
                "block_bound": pa.ListArray.from_arrays(
                    blk_off32,
                    pa.array(
                        np.nextafter(
                            bound.astype(np.float32), np.float32(np.inf)
                        ),
                        pa.float32(),
                    ),
                ),
                "max_tf": pa.array(max_tfs, pa.int32()),
            }
        )

    return bucket_merge_encode


# ---------------------------------------------------------------------------
# Manifest / lineage
# ---------------------------------------------------------------------------


def write_manifest(path: str, payload: dict) -> None:

    data = json.dumps(payload, indent=2, sort_keys=True, default=str).encode()
    # local: atomic tmp+rename; URI backends: direct put (object stores are
    # atomic per object anyway)
    if "://" not in path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    else:
        fsio.write_bytes(path, data)


def read_manifest(path: str) -> dict | None:

    try:
        return json.loads(fsio.read_bytes(path))
    except (OSError, json.JSONDecodeError):
        return None


def manifest_valid(path: str, fingerprint: str | None) -> bool:
    m = read_manifest(path)
    return (
        m is not None
        and fingerprint is not None
        and m.get("fingerprint") == fingerprint
        and m.get("complete") is True
    )


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def load_doc_store(out_dir: str) -> DocStore:
    """Eager doc-store load across generations (conformance / small).
    Tombstoned docs are skipped, mirroring SegmentReader's delete mask."""
    dele = set(tombstone_ids(out_dir).tolist())
    store = DocStore()
    for gen in generation_dirs(out_dir) or [out_dir]:
        t = fsio.read_parquet_table(parquet_files(os.path.join(gen, "docs")))
        for d, ti, u, tok in zip(
            t.column("doc_id").to_pylist(),
            t.column("title").to_pylist(),
            t.column("url").to_pylist(),
            t.column("tokens").to_pylist(),
        ):
            if int(d) not in dele:
                store.put(int(d), DocRecord(title=ti, url=u, words=tok))
    return store


def load_inverted_index(out_dir: str) -> InvertedIndex:
    """Eager decode of all segments (all generations) into memory.
    Tombstoned docs are filtered, mirroring SegmentReader's delete mask."""
    dele = tombstone_ids(out_dir)
    runs: dict[str, list[tuple[bytes, bytes, str]]] = {}
    for gen in generation_dirs(out_dir) or [out_dir]:
        mf = read_manifest(os.path.join(gen, "manifest.json")) or {}
        codec = (mf.get("config") or {}).get("postings_codec", "varint")
        t = fsio.read_parquet_table(
            parquet_files(os.path.join(gen, "segments")),
            columns=["term", "salt", "doc_ids_enc", "tfs_enc"],
        )
        for term, de, te in zip(
            t.column("term").to_pylist(),
            t.column("doc_ids_enc").to_pylist(),
            t.column("tfs_enc").to_pylist(),
        ):
            runs.setdefault(term, []).append((de, te, codec))
    idx = InvertedIndex()
    for term, rs in runs.items():
        ids = np.concatenate([decode_doc_ids_any(de, cdc) for de, _, cdc in rs])
        tfs = np.concatenate([decode_tfs(te) for _, te, _ in rs])
        # cross-generation runs interleave; doc_ids are globally unique
        order = np.argsort(ids, kind="stable")
        ids, tfs = ids[order], tfs[order]
        if dele.size:
            ids64 = ids.astype(np.int64, copy=False)  # avoid mixed-dtype promotion
            pos = np.searchsorted(dele, ids64)
            pos[pos == len(dele)] = 0
            keep = dele[pos] != ids64
            ids, tfs = ids[keep], tfs[keep]
            if not ids.size:
                continue
        idx.set_postings(term, ids, tfs)
    return idx


def build_block_meta(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(block_last, block_bound) for a doc_id-ascending posting list —
    used when cross-generation merge invalidates the stored per-run blocks."""
    n = len(doc_ids)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    edges = np.arange(0, n, block_size, dtype=np.int64)
    lasts = np.append(edges[1:] - 1, n - 1)
    btf = np.maximum.reduceat(tfs.astype(np.float64), edges)
    bdl = np.minimum.reduceat(dls.astype(np.float64), edges)
    idf = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
    bound = idf * btf * (k1 + 1.0) / (btf + k1 * (1.0 - b + b * (bdl / avgdl)))
    return doc_ids[lasts].astype(np.int64), bound


class _SubIndex:
    """One generation's on-disk index (segments/ + docs/ + sidecars)."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self._seg_path = os.path.join(out_dir, "segments")
        self._docs_path = os.path.join(out_dir, "docs")
        self.manifest = read_manifest(os.path.join(out_dir, "manifest.json")) or {}
        self.postings_codec = (self.manifest.get("config") or {}).get(
            "postings_codec", "varint"
        )
        self._seg_files = parquet_files(self._seg_path)
        self._docs_files = parquet_files(self._docs_path)
        # term -> [segment file path] sidecar, emitted by the merge tasks
        # (build.merge_bucket_dir) as sharded parquet under term_dict/
        self._term_dict: dict[str, list[str]] | None = None
        td_dir = os.path.join(out_dir, "term_dict")
        if os.path.isdir(td_dir):
            td = fsio.read_parquet_table(parquet_files(td_dir))
            d: dict[str, list[str]] = {}
            for term, fname in zip(
                td.column("term").to_pylist(), td.column("file").to_pylist()
            ):
                d.setdefault(term, []).append(os.path.join(self._seg_path, fname))
            self._term_dict = d
        # per-file (min,max) doc_id from parquet stats — docs are written
        # doc_id-sorted so these ranges are disjoint
        self._docs_ranges: list[tuple[int, int]] = []
        for f in self._docs_files:

            md = fsio.parquet_metadata(f)
            idx = md.schema.to_arrow_schema().get_field_index("doc_id")
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is None:
                lo, hi = -(2**62), 2**62  # no stats: never prune this file
            self._docs_ranges.append((int(lo), int(hi)))

    def lookup(self, terms: list[str]) -> dict[str, dict]:
        """term -> {doc_ids, tfs, dls, block_last, block_bound, df}."""
        if not terms:
            return {}
        terms = list(set(terms))
        if self._term_dict is not None:
            files = sorted(
                {f for t in terms for f in self._term_dict.get(t, ())}
            )
            if not files:
                return {}
        else:
            files = self._seg_files
        t = fsio.read_parquet_table(files, filters=[("term", "in", terms)])
        out: dict[str, dict] = {}
        by_term: dict[str, list[int]] = {}
        for i, term in enumerate(t.column("term").to_pylist()):
            by_term.setdefault(term, []).append(i)
        for term, rows in by_term.items():
            rows.sort(key=lambda i: t.column("salt")[i].as_py())
            ids = np.concatenate(
                [
                    decode_doc_ids_any(
                        t.column("doc_ids_enc")[i].as_py(), self.postings_codec
                    )
                    for i in rows
                ]
            )
            tfs = np.concatenate(
                [decode_tfs(t.column("tfs_enc")[i].as_py()) for i in rows]
            )
            dls = np.concatenate(
                [decode_tfs(t.column("dls_enc")[i].as_py()) for i in rows]
            )
            block_last = [
                v for i in rows for v in t.column("block_last")[i].as_py()
            ]
            block_bound = [
                v for i in rows for v in t.column("block_bound")[i].as_py()
            ]
            out[term] = {
                "term": term,
                "doc_ids": ids.astype(np.int64),
                "tfs": tfs,
                "dls": dls,
                "block_last": np.asarray(block_last, dtype=np.int64),
                "block_bound": np.asarray(block_bound, dtype=np.float64),
                "df": int(len(ids)),
            }
        return out

    def fetch_docs(self, doc_ids: list[int]) -> dict[int, DocRecord]:
        if not doc_ids:
            return {}
        wanted = sorted(set(doc_ids))
        files = [
            f
            for f, (lo, hi) in zip(self._docs_files, self._docs_ranges)
            if wanted[-1] >= lo and wanted[0] <= hi
            and any(lo <= d <= hi for d in wanted)
        ]
        if not files:
            return {}
        t = fsio.read_parquet_table(files, filters=[("doc_id", "in", wanted)])
        out = {}
        for d, ti, u, tok in zip(
            t.column("doc_id").to_pylist(),
            t.column("title").to_pylist(),
            t.column("url").to_pylist(),
            t.column("tokens").to_pylist(),
        ):
            out[int(d)] = DocRecord(title=ti, url=u, words=tok)
        return out

    def urls(self) -> list[str]:
        """Narrow column scan (duplicate detection for incremental adds)."""
        if not self._docs_files:
            return []
        return fsio.read_parquet_table(self._docs_files, columns=["url"]).column(
            "url"
        ).to_pylist()

    def doc_id_bounds(self) -> tuple[int, int] | None:
        if not self._docs_ranges:
            return None
        return (
            min(lo for lo, _ in self._docs_ranges),
            max(hi for _, hi in self._docs_ranges),
        )


def tombstones_dir(out_dir: str) -> str:
    return fsio.join(out_dir, "tombstones")


def read_tombstones(out_dir: str) -> pa.Table:
    """Union of every tombstone file (doc_id:int64, url:string), deduped.

    Tombstones are the index's soft-delete record (Lucene liveDocs
    analogue): ``build.delete_urls`` appends ``del-*.parquet`` files under
    ``<out_dir>/tombstones/``; readers filter postings/doc fetches against
    them; ``build.compact`` applies and clears them. Returns an empty
    two-column table when none exist."""
    td = tombstones_dir(out_dir)
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "url": pa.array([], pa.string())}
    )
    if not fsio.isdir(td):
        return empty
    files = parquet_files(td)
    if not files:
        return empty
    t = fsio.read_parquet_table(files, columns=["doc_id", "url"])
    if t.num_rows == 0:
        return empty
    # dedupe on doc_id (idempotent double-delete) and return sorted
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    keep = np.ones(len(order), dtype=bool)
    sorted_ids = ids[order]
    keep[1:] = sorted_ids[1:] != sorted_ids[:-1]
    return t.take(pa.array(order[keep], pa.int64()))


def tombstone_ids(out_dir: str) -> np.ndarray:
    """Sorted int64 array of tombstoned doc_ids (empty when none)."""
    t = read_tombstones(out_dir)
    return t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)


def generation_dirs(out_dir: str) -> list[str]:
    """Generations of an index: the root (if built) then gen-NNNN dirs.
    ``out_dir`` may be a local path or a pyarrow.fs URI."""

    gens = []
    if fsio.isdir(fsio.join(out_dir, "segments")):
        gens.append(out_dir)
    gens.extend(
        fsio.join(out_dir, d)
        for d in fsio.listdir(out_dir)
        if d.startswith("gen-") and fsio.isdir(fsio.join(out_dir, d, "segments"))
    )
    return gens


class SegmentReader:
    """Lazy per-term postings + per-doc fetch across index GENERATIONS.

    A single-generation index reads straight through; with incremental
    generations (build.add_generation) the per-term runs from each
    generation are merged on read — doc_ids are globally unique, so merge =
    concat + argsort — and block-max metadata is rebuilt from GLOBAL corpus
    stats (Lucene-style per-segment search with global statistics).

    Soft deletes: tombstones (``build.delete_urls``) are loaded once at
    open and filtered out of every postings run and doc fetch. Corpus
    stats (n_docs/avgdl) deliberately KEEP deleted docs until ``compact``
    — the Lucene maxDoc convention — so block-max bounds stored on disk
    stay valid upper bounds; per-term df IS recomputed post-filter, and
    any term that lost postings gets its block metadata rebuilt (a smaller
    df raises idf, which would otherwise let WAND prune true top-k docs)."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        gens = generation_dirs(out_dir)
        if not gens:
            gens = [out_dir]
        self._subs = [_SubIndex(g) for g in gens]
        # global stats: weighted across generations
        n_total = sum(int(s.manifest.get("n_docs", 0)) for s in self._subs)
        sum_dl = sum(
            int(s.manifest.get("n_docs", 0)) * float(s.manifest.get("avgdl", 0.0))
            for s in self._subs
        )
        base = dict(self._subs[0].manifest)
        base["n_docs"] = n_total
        base["avgdl"] = (sum_dl / n_total) if n_total else 0.0
        self.manifest = base
        ts = read_tombstones(out_dir)
        self._deleted = (
            ts.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        self._deleted_urls = set(ts.column("url").to_pylist())

    def _filter_deleted(self, postings: dict[str, dict]) -> dict[str, dict]:
        """Drop tombstoned doc_ids from per-term runs; rebuild block-max
        metadata for affected terms (df shrank ⇒ idf grew ⇒ stored bounds
        would under-bound). Filtering preserves the runs' sort order."""
        dele = self._deleted
        if not dele.size:
            return postings
        cfg = self.manifest.get("config", {})
        k1 = float(cfg.get("bm25_k1", 1.2))
        b = float(cfg.get("bm25_b", 0.75))
        block_size = int(cfg.get("block_size", 128))
        n_docs = int(self.manifest.get("n_docs", 0))
        avgdl = float(self.manifest.get("avgdl", 0.0)) or 1.0
        out: dict[str, dict] = {}
        for term, p in postings.items():
            ids = p["doc_ids"]
            pos = np.searchsorted(dele, ids)
            pos[pos == len(dele)] = 0
            hit = dele[pos] == ids
            if not hit.any():
                out[term] = p
                continue
            keep = ~hit
            ids = ids[keep]
            if not ids.size:
                continue  # term's every posting was deleted
            tfs = p["tfs"][keep]
            dls = p["dls"][keep]
            df = int(len(ids))
            bl, bb = build_block_meta(
                ids, tfs, dls, df, n_docs, avgdl, k1, b, block_size
            )
            out[term] = {
                "term": term,
                "doc_ids": ids,
                "tfs": tfs,
                "dls": dls,
                "block_last": bl,
                "block_bound": bb,
                "df": df,
            }
        return out

    def lookup(self, terms: list[str]) -> dict[str, dict]:
        if len(self._subs) == 1:
            return self._filter_deleted(self._subs[0].lookup(terms))
        cfg = self.manifest.get("config", {})
        k1 = float(cfg.get("bm25_k1", 1.2))
        b = float(cfg.get("bm25_b", 0.75))
        block_size = int(cfg.get("block_size", 128))
        n_docs = int(self.manifest.get("n_docs", 0))
        avgdl = float(self.manifest.get("avgdl", 0.0)) or 1.0
        merged: dict[str, list[dict]] = {}
        for sub in self._subs:
            for term, p in sub.lookup(terms).items():
                merged.setdefault(term, []).append(p)
        out: dict[str, dict] = {}
        for term, parts in merged.items():
            if len(parts) == 1:
                ids = parts[0]["doc_ids"]
                tfs = parts[0]["tfs"]
                dls = parts[0]["dls"]
            else:
                ids = np.concatenate([x["doc_ids"] for x in parts])
                tfs = np.concatenate([x["tfs"] for x in parts])
                dls = np.concatenate([x["dls"] for x in parts])
                order = np.argsort(ids, kind="stable")
                ids, tfs, dls = ids[order], tfs[order], dls[order]
            df = int(len(ids))
            # ALWAYS rebuild block metadata with GLOBAL stats: per-generation
            # bounds were computed with that generation's smaller n_docs and
            # local avgdl, which can UNDER-bound globally-scored docs and
            # make WAND prune true top-k members (caught by
            # test_incremental.test_search_identical).
            bl, bb = build_block_meta(
                ids, tfs, dls, df, n_docs, avgdl, k1, b, block_size
            )
            out[term] = {
                "term": term,
                "doc_ids": ids,
                "tfs": tfs,
                "dls": dls,
                "block_last": bl,
                "block_bound": bb,
                "df": df,
            }
        return self._filter_deleted(out)

    def fetch_docs(self, doc_ids: list[int]) -> dict[int, DocRecord]:
        out: dict[int, DocRecord] = {}
        if self._deleted.size:
            live = np.asarray(list(doc_ids), dtype=np.int64)
            pos = np.searchsorted(self._deleted, live)
            pos[pos == len(self._deleted)] = 0
            doc_ids = [int(d) for d, h in zip(live, self._deleted[pos] == live) if not h]
        remaining = set(doc_ids)
        for sub in self._subs:
            if not remaining:
                break
            got = sub.fetch_docs(list(remaining))
            out.update(got)
            remaining -= set(got)
        return out

    def all_urls(self) -> set[str]:
        urls: set[str] = set()
        for sub in self._subs:
            urls.update(sub.urls())
        # a deleted url may be re-added as a new doc (tombstones win over
        # the stale docs row, so it is NOT a duplicate)
        return urls - self._deleted_urls

    def all_doc_ids(self) -> set[int]:
        # NOTE: tombstoned ids stay in this set on purpose — they remain
        # RESERVED until compact (a new doc reusing a tombstoned id would
        # be filtered out by the reader's delete mask).
        ids: set[int] = set()
        for sub in self._subs:
            if sub._docs_files:
                t = fsio.read_parquet_table(sub._docs_files, columns=["doc_id"])
                ids.update(t.column("doc_id").to_pylist())
        return ids
