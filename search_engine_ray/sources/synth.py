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


def synth_wiki_abstracts_table(n_docs: int = 50_000, seed: int = 1234) -> pa.Table:
    """Wiki-abstract-like corpus for the SAME-SCALE comparison against the
    reference's published benchmark (README.md:122-174: 50,000 wikipedia
    abstracts, uniqueWords: 500000, queries 'philosophy psychology' at
    3.850 ms and '\"carl friedrich\" german' at 6.177 ms).

    Real abstracts are not available in this sandbox (no network), so the
    corpus is synthesized to the published workload's shape: 50k docs,
    lognormal abstract lengths (median ~55 tokens), Zipf(1.07) background
    vocabulary sized so the corpus carries a realistic distinct-word count
    against the reference's 500k uniqueWords ceiling, and the BENCHMARK
    QUERY TERMS planted at encyclopedic document frequencies so the two
    published queries traverse comparable posting-list work:

      philosophy df=400, psychology df=300 (80 docs carry both);
      'carl friedrich' ADJACENT in 45 docs, each word alone in ~150 more;
      german df=1000 (60 overlapping the phrase docs).

    Deterministic (seeded); pages-shaped per BASELINE.json input_hint."""
    rng = np.random.default_rng(seed)
    lens = np.clip(
        np.rint(np.exp(rng.normal(4.0, 0.45, n_docs))).astype(np.int64), 12, 400
    )
    vocab = 500_000
    probs = 1.0 / np.arange(1, vocab + 1, dtype=np.float64) ** 1.07
    probs /= probs.sum()
    total = int(lens.sum())
    flat_ids = rng.choice(vocab, size=total, p=probs)
    starts = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lens, out=starts[1:])

    tokens: list[list[str]] = [
        [f"t{j}" for j in flat_ids[starts[i] : starts[i + 1]]]
        for i in range(n_docs)
    ]

    # positions already used by a planted word, per doc — a later plant
    # must never overwrite an earlier one (e.g. 'german' landing on the
    # 'carl'/'friedrich' slot would silently break the phrase benchmark)
    used: dict[int, set[int]] = {}

    def _free_pos(d: int, span: int = 1) -> int:
        slots = used.setdefault(int(d), set())
        n = len(tokens[d])
        while True:
            p = int(rng.integers(0, n - span + 1))
            if all(p + o not in slots for o in range(span)):
                slots.update(p + o for o in range(span))
                return p

    def plant(word: str, docs_idx: np.ndarray) -> None:
        for d in docs_idx:
            tokens[d][_free_pos(d)] = word

    all_docs = rng.permutation(n_docs)
    phil = all_docs[:400]
    psyc = np.concatenate([phil[:80], all_docs[400:620]])  # 80 overlap
    plant("philosophy", phil)
    plant("psychology", psyc)

    phrase_docs = all_docs[700:745]  # 45 docs with adjacent "carl friedrich"
    for d in phrase_docs:
        p = _free_pos(int(d), span=2)
        tokens[d][p] = "carl"
        tokens[d][p + 1] = "friedrich"
    plant("carl", all_docs[745:895])
    plant("friedrich", all_docs[895:1015])
    german = np.concatenate([phrase_docs[:30], all_docs[1015:1985]])
    plant("german", german)

    texts = [" ".join(t) for t in tokens]
    titles = [f"Entity {i}" for i in range(n_docs)]
    urls = [f"https://en.wikipedia.org/wiki/Entity_{i}" for i in range(n_docs)]
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


def synth_wiki_abstracts_parquet(
    n_docs: int = 50_000,
    cache_dir: str = "/tmp/search_engine_ray_synth",
    seed: int = 1234,
) -> str:
    """Cached parquet form of synth_wiki_abstracts_table."""
    path = os.path.join(cache_dir, f"wiki_{n_docs}_{seed}_v2")
    marker = os.path.join(path, "_complete")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    t = synth_wiki_abstracts_table(n_docs, seed)
    step = 10_000
    for i in range(0, t.num_rows, step):
        pq.write_table(t.slice(i, step), os.path.join(path, f"part-{i:08d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return path
