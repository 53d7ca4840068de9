"""LLM-training-data pipeline operators (SURVEY §7 step 8, BASELINE.json
north-star): deduplication, similarity search, text analysis, multimodal
column plumbing — all DataFrame-native and designed for 100 TB inputs."""

from proteus_engine_spark.datapipe.dedup import (
    duplicate_spans,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    remove_duplicate_spans,
    semantic_dedup,
    simhash_buckets,
)
from proteus_engine_spark.datapipe.similarity import brute_force_topk, lsh_ann_topk
from proteus_engine_spark.datapipe.textstats import (
    document_fingerprint,
    language_id,
    quality_stats,
    token_count,
)

__all__ = [
    "duplicate_spans",
    "exact_dedup",
    "remove_duplicate_spans",
    "semantic_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_buckets",
    "brute_force_topk",
    "lsh_ann_topk",
    "document_fingerprint",
    "language_id",
    "quality_stats",
    "token_count",
]
