"""Deterministic synthetic web-page corpus (FIXTURES.md §4, seed=42).

Zipf(s=1.1) token distribution over a V-word vocabulary, one planted hot
term in 50% of docs (exercises head-term salting), unique rank permutation
(scale-mode doc_id = rank is a pure map). Pages-shaped output per
BASELINE.json input_hint. Generated, never stored in the repo; cached as
parquet under /tmp keyed by parameters so bench runs reuse it.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOT_TERM = "hotterm"
_EPOCH = _dt.datetime(2026, 1, 1)


def synth_zipf_table(
    n_docs: int,
    n_tokens: int = 80,
    vocab: int = 50_000,
    seed: int = 42,
    zipf_s: float = 1.1,
    hot_fraction: float = 0.5,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    probs = 1.0 / np.arange(1, vocab + 1, dtype=np.float64) ** zipf_s
    probs /= probs.sum()
    vocab_arr = np.array([f"w{i}" for i in range(vocab)], dtype=object)

    idx = rng.choice(vocab, size=(n_docs, n_tokens), p=probs)
    tokens = vocab_arr[idx]
    hot_mask = rng.random(n_docs) < hot_fraction
    tokens[hot_mask, 0] = HOT_TERM

    texts = [" ".join(row) for row in tokens]
    titles = [f"Synth doc {i}" for i in range(n_docs)]
    urls = [f"https://synth.test/doc/{i:08d}" for i in range(n_docs)]
    html = [
        f"<html><head><title>{t}</title></head><body>{x}</body></html>".encode()
        for t, x in zip(titles, texts)
    ]
    ranks = rng.permutation(n_docs).astype(np.int64)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [_EPOCH + _dt.timedelta(seconds=int(i)) for i in range(n_docs)],
                pa.timestamp("us"),
            ),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "add_order": pa.array(np.arange(n_docs), pa.int64()),
        }
    )


def synth_zipf_parquet(
    n_docs: int,
    cache_dir: str = "/tmp/search_engine_ray_synth",
    **kwargs,
) -> str:
    """Generate (or reuse) the corpus as a parquet directory; returns path.

    Written as MANY part files (~62k docs each): Ray assigns read tasks per
    FILE, so a single 900 MB file reads in ONE task — a measured 14 s
    serial floor that capped stream-phase scaling. Many files is also the
    honest crawl shape (a 100 TB corpus is never one parquet file)."""
    key = f"n{n_docs}_" + "_".join(f"{k}{v}" for k, v in sorted(kwargs.items()))
    path = os.path.join(cache_dir, key + "_sharded")
    # sibling marker: the corpus dir must hold ONLY parquet files
    marker = path + ".complete"
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        t = synth_zipf_table(n_docs, **kwargs)
        per_file = 62_500
        n_files = max(1, -(-n_docs // per_file))
        for i in range(n_files):
            pq.write_table(
                t.slice(i * per_file, per_file),
                os.path.join(path, f"part-{i:05d}.parquet"),
                row_group_size=16384,
            )
        open(marker, "w").close()
    return path
