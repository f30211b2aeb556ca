"""JSONL corpus source — the dominant LLM-training-data interchange
format (C4, The Pile, RedPajama, Dolma all ship line-delimited JSON,
usually gzipped): one JSON object per line with a text field and
optional url / title fields.

Ray-native shape: FILES are the parallel unit (``read_binary_files`` ->
one ``pyarrow.json.read_json`` call per file — NDJSON parses at C speed
into an Arrow table, no per-line Python ``json.loads``; gzip detected by
magic bytes). Output matches the input_hint pages schema (url, html,
rank): text (and optional title) are re-wrapped in the standard html
envelope with ONE vectorized ``binary_join_element_wise`` so the build's
tested extract path, skip rules, and M6 title strip apply unchanged —
the same wrap-the-payload contract as ``warc.py``'s WET handling and
``wiki_xml.py``. Records with a null/missing url get a synthesized
``jsonl://<file_idx>/<line>`` address (unique, reproducible). rank =
file_index * rank_stride + line number — unique and reproducible given a
fixed file list, mirroring the other sources' shard-granular counters.

Memory: each task holds ONE file decompressed; ship training dumps at
their standard ~100 MB-1 GB shard size and cap the read stage's
concurrency on small-memory workers (same note as warc.py).
"""

from __future__ import annotations

import gzip
import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from search_engine_ray.sources.warc import canon_path


def parse_jsonl(
    data: bytes, text_field: str = "text", url_field: str = "url",
    title_field: str = "title",
) -> pa.Table:
    """One (possibly gzipped) NDJSON file -> (url, title, text) table.

    url/title are null-filled when the field is absent; rows with a
    null/empty text become '' (the build's skip filter handles them,
    the ingestion-skip semantics). Parsing is one arrow read_json call.
    """
    import pyarrow.json as pj

    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if not data.strip():
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "title": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
            }
        )
    tbl = pj.read_json(io.BytesIO(data))
    n = tbl.num_rows
    names = set(tbl.column_names)

    def col(name: str) -> pa.ChunkedArray:
        if name and name in names:
            return pc.cast(tbl.column(name), pa.string())
        return pa.chunked_array([pa.nulls(n, pa.string())])

    return pa.table(
        {
            "url": col(url_field),
            "title": col(title_field),
            "text": pc.coalesce(col(text_field), pa.scalar("", pa.string())),
        }
    )


def jsonl_pages(
    file_paths: list[str],
    text_field: str = "text",
    url_field: str = "url",
    title_field: str = "title",
    rank_stride: int = 10_000_000,
) -> rd.Dataset:
    """pages-schema Dataset (url, html, rank) from JSONL/NDJSON files."""
    order = {c: i for i, c in enumerate(sorted(canon_path(p) for p in file_paths))}
    if len(order) != len(file_paths):
        # two spellings of one file would share a stride base -> dup doc_ids
        raise ValueError("file_paths contains duplicate files (after canon)")

    def extract_file(batch: pa.Table) -> pa.Table:
        out = []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            fidx = order.get(canon_path(path))
            if fidx is None:
                # a silent 0 would collide doc_ids across files — refuse
                raise ValueError(
                    f"read path {path!r} matches no input file (canon mismatch)"
                )
            t = parse_jsonl(data, text_field, url_field, title_field)
            n = t.num_rows
            if n == 0:
                continue
            base = fidx * rank_stride
            line = np.arange(n, dtype=np.int64)
            # synthesized address for url-less records (vectorized: the
            # fallback strings are built once per file, picked by coalesce)
            fallback = pc.binary_join_element_wise(
                pa.array([f"jsonl://{fidx}/"] * n, pa.string()),
                pc.cast(pa.array(line, pa.int64()), pa.string()),
                "",
            )
            urls = pc.coalesce(t.column("url").combine_chunks(), fallback)
            title = pc.coalesce(
                t.column("title").combine_chunks(), pa.scalar("", pa.string())
            )
            html = pc.binary_join_element_wise(
                pa.scalar("<html><head><title>", pa.string()),
                title,
                pa.scalar("</title></head><body>", pa.string()),
                t.column("text").combine_chunks(),
                pa.scalar("</body></html>", pa.string()),
                "",
            )
            out.append(
                pa.table(
                    {
                        "url": pc.cast(urls, pa.string()),
                        "html": pc.cast(html, pa.binary()),
                        "rank": pa.array(base + line, pa.int64()),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "html": pa.array([], pa.binary()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(out)

    return rd.read_binary_files(file_paths, include_paths=True).map_batches(
        extract_file, batch_format="pyarrow", batch_size=1
    )


def write_jsonl(
    path: str, rows: list[dict], compress: bool = False
) -> None:
    """Serialize dict rows as (gzipped) NDJSON — test/bench fixture twin
    of ``warc.write_warc``."""
    import json

    payload = b"".join(
        json.dumps(r, ensure_ascii=False).encode("utf-8") + b"\n" for r in rows
    )
    if compress:
        payload = gzip.compress(payload)
    with open(path, "wb") as f:
        f.write(payload)
