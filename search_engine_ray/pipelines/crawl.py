"""Crawl-scale preset — safe defaults for the 100x run (r2 VERDICT #5).

Every operator family in this package has an "exact" configuration used
for oracle parity and a "scale" configuration that bounds worst-case work
on adversarial web data. The exact variants are the DEFAULTS on the raw
operators (so the correctness gate stays exact); this module is the other
half of the contract: **the pipeline you'd run on a real crawl, with the
scale knobs ON by default** — nothing here depends on remembering a
kwarg.

What the preset pins, and why:

- ``max_group=CRAWL_MAX_GROUP`` on every shingle-keyed pair emit. Pair
  emission inside a shingle/band group is quadratic in group size; a
  boilerplate shingle shared by 10M pages is a 10^14-pair task. The cap
  drops hot groups WITH A LOGGED COUNT (dedup._explode_and_pair logs key
  and size); a dropped boilerplate shingle only removes one of many
  near-dup witnesses, so recall loss is marginal while the blowup is
  fatal.
- Near-dup = MinHash+LSH (``crawl_neardup_pairs_ds``), never the exact
  all-pairs shingle Jaccard: banding makes candidate generation linear in
  docs, and at the default 128/32 a true j>=0.8 pair is missed with
  p < 5e-8.
- Decontamination = Bloom (``crawl_clean_corpus_ds``), never the
  broadcast exact shingle set: the eval-set side is a fixed 128 KB bit
  array regardless of eval corpus size, zero false negatives, false
  positives only ever over-flag (the safe direction for training data).
- Sampling = deterministic md5-hash membership, never
  ``random_shuffle().limit()``: same docs kept on every run and every
  cluster shape, membership joinable across tables.
- ``merge_buckets=None`` in the index build (EngineConfig default):
  bucket count computed from data size, never a fixed constant that
  under-partitions at 100x.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

#: Hot-group cap for quadratic pair emits (shingle groups, LSH buckets).
#: 2048 docs/group = ~2M pairs worst case per group — bounded task time —
#: while web-scale boilerplate groups (10^5..10^7 docs) are dropped with a
#: logged count.
CRAWL_MAX_GROUP = 2048

#: CLI `pipeline --preset crawl` (the default) swaps a requested query for
#: its crawl-scale counterpart so the quadratic / broadcast-heavy exact
#: variants cannot be run on a real crawl by accident. `--preset exact`
#: opts out (oracle-parity runs, small corpora). Keys and values are
#: __ray_entry__.queries() names.
CRAWL_QUERY_SUBSTITUTES: dict[str, str] = {
    # exact all-pairs shingle Jaccard -> MinHash+LSH banding
    "ngram_jaccard": "minhash_pairs",
    # same pair machinery, asymmetric score -> hot-group cap ON
    "ngram_containment": "crawl_containment",
    # broadcast exact shingle decontamination -> fixed-size Bloom filter
    "decontaminate": "bloom_decontaminate",
    "clean_corpus": "crawl_clean",
    # exact O(n^2/B^2) block cross-product -> LSH-bucketed cosine
    "embedding_neardup": "embedding_neardup_lsh",
    # per-string md5 winnowing -> vectorized rolling-hash winnowing
    "winnow_md5": "winnow_fp",
}

#: One place to read every scale default this preset applies.
CRAWL_PRESET: dict = {
    "max_group": CRAWL_MAX_GROUP,
    "neardup": "minhash_lsh",  # not exact all-pairs Jaccard
    "minhash_num_perm": 128,
    "minhash_bands": 32,
    "shingle_k": 3,
    "neardup_threshold": 0.8,
    "decontaminate": "bloom",  # not broadcast exact shingle set
    "bloom_m_bits": 1 << 20,
    "bloom_n_hashes": 7,
    "sample": "md5_hash",  # deterministic, cluster-shape independent
    "merge_buckets": None,  # data-proportional (EngineConfig default)
}


def crawl_neardup_pairs_ds(
    docs: rd.Dataset,
    threshold: float = 0.8,
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    max_group: int = CRAWL_MAX_GROUP,
) -> rd.Dataset:
    """Near-duplicate pairs, crawl defaults: MinHash+LSH candidates with
    the hot-group cap ON (logged drops). Same output schema as
    ``dedup.minhash_lsh_pairs_ds``."""
    from search_engine_ray.pipelines.dedup import minhash_lsh_pairs_ds

    return minhash_lsh_pairs_ds(
        docs,
        num_perm=num_perm,
        bands=bands,
        k=k,
        threshold=threshold,
        max_group=max_group,
    )


def crawl_dup_clusters_ds(
    docs: rd.Dataset,
    threshold: float = 0.8,
    k: int = 3,
    max_group: int = CRAWL_MAX_GROUP,
) -> rd.Dataset:
    """(doc_id, cluster) near-duplicate closure, crawl defaults: LSH pairs
    (capped hot groups) -> distributed connected components. Keep one doc
    per cluster by dropping rows with doc_id != cluster."""
    from search_engine_ray.pipelines.dedup import connected_components_ds

    pairs = crawl_neardup_pairs_ds(
        docs, threshold=threshold, k=k, max_group=max_group
    ).map_batches(
        lambda b: pa.table(
            {
                "u": b.column("doc_a").cast(pa.int64()),
                "v": b.column("doc_b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return connected_components_ds(pairs)


def crawl_containment_pairs_ds(
    docs: rd.Dataset,
    threshold: float = 0.9,
    k: int = 3,
    max_group: int = CRAWL_MAX_GROUP,
) -> rd.Dataset:
    """Near-subset containment pairs with the hot-group cap ON (logged
    drops). Same output schema as ``dedup.ngram_containment_pairs_ds``;
    at scales where no shingle group hits the cap the output is
    IDENTICAL to the exact variant (equivalence-tested), so it shares
    the exact containment SQL oracle."""
    from search_engine_ray.pipelines.dedup import ngram_containment_pairs_ds

    return ngram_containment_pairs_ds(
        docs, k=k, threshold=threshold, max_group=max_group
    )


def crawl_cluster_best_ds(
    docs: rd.Dataset,
    threshold: float = 0.8,
    k: int = 3,
    max_group: int = CRAWL_MAX_GROUP,
) -> rd.Dataset:
    """Keep-LONGEST near-dup survivors on crawl defaults: LSH candidate
    pairs (capped hot groups) -> connected components -> per-cluster
    argmax on token count (tie -> min doc_id). Same output schema as
    ``dedup.cluster_representatives_ds``; the preferred survivor policy
    when duplicates differ by truncation (web page re-crawls)."""
    from search_engine_ray.pipelines.dedup import cluster_representatives_ds

    edges = crawl_neardup_pairs_ds(
        docs, threshold=threshold, k=k, max_group=max_group
    ).map_batches(
        lambda b: pa.table(
            {
                "u": b.column("doc_a").cast(pa.int64()),
                "v": b.column("doc_b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return cluster_representatives_ds(docs, edges)


def crawl_clean_corpus_ds(
    docs: rd.Dataset,
    eval_mod: int = 97,
    k: int = 3,
    m_bits: int = 1 << 20,
    n_hashes: int = 7,
) -> rd.Dataset:
    """``text.clean_corpus_ds`` with the crawl-scale decontamination path:
    the eval shingle set is compressed into a Bloom filter (OR-tree reduce
    of per-batch partials; the 128 KB filter is the only broadcast — the
    exact variant broadcasts the full eval shingle set, which at crawl
    scale is billions of strings). Gates, subsample, and exact dedup are
    identical to clean_corpus_ds:

      lang == 'en'; 20 <= n_tokens <= 1000; n_short*5 <= n_tokens;
      top_bigram_count*5 <= n_bigrams; zero flagged shingles vs the
      doc_id % eval_mod == 0 eval slice; md5(doc_id)[0] in 0..7;
      exact-dedup keep-min-doc_id.

    Bloom has zero false negatives, so every contaminated doc the exact
    gate drops is dropped here too; false positives (rate ~(1-e^(-kn/m))^k,
    ~1e-12 at defaults for 10k eval shingles) can only drop EXTRA docs —
    the safe direction. Output: (doc_id, n_tokens), same schema as
    clean_corpus_ds."""
    from search_engine_ray.functions.textstats import (
        md5_fingerprints_arrow,
        quality_metrics,
        repetition_metrics,
        shingle_hashes_batch,
        token_lists,
    )
    from search_engine_ray.pipelines.text import _bloom_set, _bloom_test

    n_words = m_bits // 64

    def partial_bloom(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % eval_mod) == 0
        bits = np.zeros(n_words, dtype=np.uint64)
        if mask.any():
            text = batch.filter(pa.array(mask)).column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            hs, _ = shingle_hashes_batch(token_lists(text), k)
            _bloom_set(bits, hs, m_bits, n_hashes)
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.large_binary())})

    @ray.remote
    def _or_block(t: pa.Table) -> bytes:
        acc = np.zeros(n_words, np.uint64)
        # empty input blocks skip map_batches untouched and keep the DOCS
        # schema (no "bloom" column) — treat them as empty filters
        if "bloom" in t.column_names:
            for r in t.column("bloom").to_pylist():
                acc = acc | np.frombuffer(r, np.uint64)
        return acc.tobytes()

    @ray.remote
    def _or2(a: bytes, b: bytes) -> bytes:
        return (np.frombuffer(a, np.uint64) | np.frombuffer(b, np.uint64)).tobytes()

    # materialize ONCE: to_arrow_refs on a lazy dataset re-executes the
    # whole plan a second time for schema inference (see build.py's
    # measured note) — this pass tokenizes+shingles the full corpus
    refs = [
        _or_block.remote(r)
        for r in docs.map_batches(partial_bloom, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ]
    while len(refs) > 1:
        refs = [
            _or2.remote(refs[i], refs[i + 1]) if i + 1 < len(refs) else refs[i]
            for i in range(0, len(refs), 2)
        ]
    bloom_ref = (
        refs[0] if refs else ray.put(np.zeros(n_words, np.uint64).tobytes())
    )

    def features(batch: pa.Table) -> pa.Table:
        from search_engine_ray.functions.textstats import md5_id_u32

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
        bits = np.frombuffer(ray.get(bloom_ref), np.uint64)
        hs, starts = shingle_hashes_batch(token_lists(text), k)
        per_doc = np.diff(starts)
        hit = _bloom_test(bits, hs, m_bits, n_hashes)
        parents = np.repeat(np.arange(len(batch)), per_doc)
        n_bad = np.zeros(len(batch), np.int64)
        np.add.at(n_bad, parents, hit.astype(np.int64))
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
    return agg.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("min(doc_id)"),
                "n_tokens": b.column("min(n_tokens)"),
            }
        ),
        batch_format="pyarrow",
    )
