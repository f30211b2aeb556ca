"""search_engine_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference TypeScript engine at /root/reference (nissejokke/search-engine):
tokenize -> postings -> rank, conjunctive AND + phrase search, title/url
scoring, snippet construction — re-expressed as Ray Data pipelines
(map_batches over zero-copy Arrow, actor pools for stateful stages,
groupby(term) shuffle for the inverted index), plus the scale path the
reference lacks: BM25 top-k with block-max metadata, delta-varint posting
compression, sharded resumable segments, and large-scale training-data
operators (dedup, similarity search, text analysis).
"""

from search_engine_ray.config import EngineConfig, DEMO_STOP_WORDS, DEMO_SCORE_WEIGHTS

__all__ = ["EngineConfig", "DEMO_STOP_WORDS", "DEMO_SCORE_WEIGHTS"]
