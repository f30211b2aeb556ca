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
from search_engine_ray.state.codec import (
    block_boundaries,
    decode_doc_ids,
    decode_tfs,
    encode_doc_ids,
    encode_tfs,
)
from search_engine_ray.state.index import DocRecord, DocStore, InvertedIndex

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int64()),
        ("df_run", pa.int32()),
        ("doc_ids_enc", pa.binary()),
        ("tfs_enc", pa.binary()),
        ("dls_enc", pa.binary()),
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
    """Part files only — directories also hold manifests/markers."""
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet")
    )


def make_merge_encode(stats: CorpusStats, config: EngineConfig):
    """Build the groupby("key").map_groups fn: merge sorted runs of one
    (term, salt) group and encode the final posting block.

    The per-batch runs are each doc_id-ascending and globally disjoint in
    doc_id (a doc lives in exactly one batch), so merge = concat + argsort.
    Block-max bounds are BM25 upper bounds per block, computed with the RUN
    df: run df <= total df, and idf decreases with df, so the bound computed
    here is >= the true per-block bound under the term's total df — i.e.
    always a valid (slightly loose for salted terms) upper bound.
    """
    n_docs, avgdl = stats.n_docs, stats.avgdl
    k1, b, block_size = config.bm25_k1, config.bm25_b, config.block_size

    def merge_encode(group: pa.Table) -> pa.Table:
        term = group.column("term")[0].as_py()
        salt = group.column("salt")[0].as_py()
        doc_ids = group.column("doc_ids").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        tfs = group.column("tfs").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        dls = group.column("dls").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order].astype(np.int64)
        tfs = tfs[order].astype(np.int32)
        dls = dls[order].astype(np.int32)

        blocks = block_boundaries(len(doc_ids), block_size)
        block_last = [int(doc_ids[e - 1]) for _, e in blocks]
        df_run = len(doc_ids)
        block_bound = [
            float(
                bm25_term_upper_bound(
                    float(tfs[s:e].max()),
                    float(dls[s:e].min()),
                    df_run,
                    n_docs,
                    avgdl,
                    k1,
                    b,
                )
            )
            for s, e in blocks
        ]
        return pa.table(
            {
                "term": pa.array([term], pa.string()),
                "salt": pa.array([salt], pa.int64()),
                "df_run": pa.array([df_run], pa.int32()),
                "doc_ids_enc": pa.array([encode_doc_ids(doc_ids)], pa.binary()),
                "tfs_enc": pa.array([encode_tfs(tfs)], pa.binary()),
                "dls_enc": pa.array([encode_tfs(dls)], pa.binary()),
                "block_last": pa.array([block_last], pa.list_(pa.int64())),
                "block_bound": pa.array([block_bound], pa.list_(pa.float32())),
                "max_tf": pa.array([int(tfs.max())], pa.int32()),
            }
        )

    return merge_encode


# ---------------------------------------------------------------------------
# Manifest / lineage
# ---------------------------------------------------------------------------


def write_manifest(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True, default=str)
    os.replace(tmp, path)


def read_manifest(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
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
    """Eager doc-store load (conformance / small corpora)."""
    t = pq.read_table(parquet_files(os.path.join(out_dir, "docs")))
    store = DocStore()
    doc_ids = t.column("doc_id").to_pylist()
    titles = t.column("title").to_pylist()
    urls = t.column("url").to_pylist()
    tokens = t.column("tokens").to_pylist()
    for d, ti, u, tok in zip(doc_ids, titles, urls, tokens):
        store.put(int(d), DocRecord(title=ti, url=u, words=tok))
    return store


def load_inverted_index(out_dir: str) -> InvertedIndex:
    """Eager decode of all segments into an in-memory InvertedIndex."""
    t = pq.read_table(
        parquet_files(os.path.join(out_dir, "segments")),
        columns=["term", "salt", "doc_ids_enc", "tfs_enc"],
    )
    idx = InvertedIndex()
    terms = t.column("term").to_pylist()
    salts = t.column("salt").to_pylist()
    d_enc = t.column("doc_ids_enc").to_pylist()
    t_enc = t.column("tfs_enc").to_pylist()
    runs: dict[str, list[tuple[int, bytes, bytes]]] = {}
    for term, salt, de, te in zip(terms, salts, d_enc, t_enc):
        runs.setdefault(term, []).append((salt, de, te))
    for term, rs in runs.items():
        rs.sort(key=lambda r: r[0])
        ids = np.concatenate([decode_doc_ids(de) for _, de, _ in rs])
        tfs = np.concatenate([decode_tfs(te) for _, _, te in rs])
        idx.set_postings(term, ids, tfs)
    return idx


class SegmentReader:
    """Lazy per-term postings + per-doc_id doc fetch via parquet predicate
    pushdown — the query-serving access path that scales past RAM.

    Terms are sorted within segment files (groupby emits sorted keys), so
    row-group statistics prune reads; the doc store is doc_id-range
    partitioned the same way."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self._seg_path = os.path.join(out_dir, "segments")
        self._docs_path = os.path.join(out_dir, "docs")
        self.manifest = read_manifest(os.path.join(out_dir, "manifest.json")) or {}

    def lookup(self, terms: list[str]) -> dict[str, dict]:
        """term -> {doc_ids, tfs, block_last, block_bound, df}."""
        if not terms:
            return {}
        t = pq.read_table(
            parquet_files(self._seg_path),
            filters=[("term", "in", list(set(terms)))],
        )
        out: dict[str, dict] = {}
        by_term: dict[str, list[int]] = {}
        for i, term in enumerate(t.column("term").to_pylist()):
            by_term.setdefault(term, []).append(i)
        for term, rows in by_term.items():
            rows.sort(key=lambda i: t.column("salt")[i].as_py())
            ids = np.concatenate(
                [decode_doc_ids(t.column("doc_ids_enc")[i].as_py()) for i in rows]
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
        t = pq.read_table(
            parquet_files(self._docs_path),
            filters=[("doc_id", "in", list(set(doc_ids)))],
        )
        out = {}
        for d, ti, u, tok in zip(
            t.column("doc_id").to_pylist(),
            t.column("title").to_pylist(),
            t.column("url").to_pylist(),
            t.column("tokens").to_pylist(),
        ):
            out[int(d)] = DocRecord(title=ti, url=u, words=tok)
        return out
