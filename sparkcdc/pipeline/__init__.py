"""Large-scale training-data pipeline operators over document / embedding
tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup, C4/RefinedWeb line-level, SemDeDup, incremental
ingest-time against a persistent fingerprint or MinHash band index),
similarity search
(brute-force + IVF ANN), text statistics, corpus curation, and multimodal
column plumbing.

These are first-class engine operators alongside the CDC core: at 100 TB the
CDC stream *is* a training-data pipeline (ingest code/documents → dedup →
quality-filter → embed → search), so every operator here is designed around
the same rules as the merge path — shuffle only on explicit keys, broadcast
small sides, all row logic in Catalyst expressions or Arrow-batched pandas.
"""

from .dedup import (
    dedup_lines,
    duplicate_clusters,
    duplicate_lines,
    duplicate_span_stats,
    duplicate_spans,
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    semdedup,
    simhash,
    split_lines,
)
from .dedup import doc_bands
from .ingest_dedup import (
    IncrementalDeduper,
    IncrementalNearDeduper,
    start_dedup_stream,
)
from .similarity import cosine_topk, hyperplane_lsh_buckets, ivf_topk
from .textstats import document_stats
from .multimodal import (
    binary_metadata,
    decode_image_stub,
    frame_sample,
)

__all__ = [
    "exact_duplicates",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash",
    "duplicate_clusters",
    "ngram_jaccard_pairs",
    "embedding_near_duplicates",
    "split_lines",
    "duplicate_lines",
    "dedup_lines",
    "duplicate_span_stats",
    "duplicate_spans",
    "semdedup",
    "doc_bands",
    "IncrementalDeduper",
    "IncrementalNearDeduper",
    "start_dedup_stream",
    "cosine_topk",
    "ivf_topk",
    "hyperplane_lsh_buckets",
    "document_stats",
    "binary_metadata",
    "decode_image_stub",
    "frame_sample",
]
