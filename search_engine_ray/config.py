"""Engine configuration (frozen) — the rebuild of the reference's EngineProps.

Reference: /root/reference/src/engine.ts:11-15 (EngineProps: stopWords,
scoreWeights) and engine.ts:4-9 (RankWeights). The demo defaults come from
/root/reference/src/demo.ts:66-97.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ScoreWeights:
    """Reference RankWeights (engine.ts:4-9)."""

    title_exact_match: float = 10.0
    title_begins: float = 5.0
    title_contains_in_beginning: float = 1.0
    url_contains: float = 5.0


@dataclass(frozen=True)
class EngineConfig:
    """Frozen configuration for both the build and the query engine.

    ``compat=True`` reproduces the reference's observable behavior exactly,
    including its load-bearing quirks (engine.ts:447-449 isAllEqual,
    engine.ts:201 url-regex ``[wd]``, engine.ts:331-333 splice-as-end-index,
    engine.ts:134 hard-coded intersect maxCount=100). ``compat=False`` is the
    scale path: BM25 (k1/b) with static-rank (doc_id) tiebreak.
    """

    stop_words: frozenset[str] = frozenset()
    score_weights: ScoreWeights | None = None
    compat: bool = True
    # BM25 parameters (scale-mode scorer; reference has no BM25 — see SURVEY §7.3.6)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    # Postings codec / segment layout
    # doc_ids compression: "varint" (delta + LEB128, the default) or "ef"
    # (Elias-Fano / quasi-succinct — ~2-4x smaller doc_ids on dense lists;
    # see state/codec.py). tfs/dls are always varint (not monotone). The
    # codec is recorded in the manifest and must be uniform across an
    # index's generations (add_generation inherits it).
    postings_codec: str = "varint"
    block_size: int = 128  # postings per block-max block
    # hash buckets for the merge shuffle (reduce tasks). None = data-
    # proportional: ~merge_bucket_target_bytes of encoded postings per
    # bucket, floored at 2 buckets/CPU — a fixed count either starves
    # parallelism (small corpora) or makes per-bucket merges unboundedly
    # large (crawl scale, where whole-bucket load must stay bounded).
    merge_buckets: int | None = None
    merge_bucket_target_bytes: int = 256 << 20
    salt_shift: int = 0  # >0: salt groupby key with doc_id >> salt_shift (head-term skew)
    # only terms with global df >= this are salted (found by a cheap df
    # pre-pass); salting every term multiplied segment rows ~30x for the tail
    salt_df_threshold: int = 262144
    # M6: prefix stripped from extracted titles (first occurrence only —
    # JS String.replace semantics, demo.ts:140 replace('Wikipedia: ', ''));
    # None disables. The demo preset uses 'Wikipedia: '.
    title_strip_prefix: str | None = None

    def is_stop_word(self, word: str) -> bool:
        """Reference isStopWord (engine.ts:490-492): len < 2 OR in stop set."""
        return len(word) < 2 or word in self.stop_words


# Demo-style defaults (demo.ts:66-81 stop words, demo.ts:91-96 weights).
DEMO_STOP_WORDS = frozenset(
    "a an am and be have i in is of on that the to".split()
)
DEMO_SCORE_WEIGHTS = ScoreWeights(
    title_exact_match=10.0,
    title_begins=5.0,
    url_contains=5.0,
    title_contains_in_beginning=1.0,
)
# demo.ts:140: titles come from wiki-abstract XML as 'Wikipedia: <name>'
DEMO_TITLE_STRIP_PREFIX = "Wikipedia: "
