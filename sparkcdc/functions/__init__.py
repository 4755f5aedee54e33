"""Scalar / vector / text function library (SURVEY §2.7).

The reference centralizes scalar conversion in one registry
(core/jdbc/JdbcValueConverters.java:154-267); here the equivalent surface is
a library of Catalyst Column expressions — every function is JVM-side and
whole-stage-codegen friendly, no Python in any hot path.
"""

from .hashing import sha256_hex, stable_hash64
from .text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)
from .vectors import cosine_similarity, dot_product, l2_norm
from .converters import CONVERTERS, convert_column

__all__ = [
    "stable_hash64",
    "sha256_hex",
    "tokens",
    "word_shingles",
    "token_count",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "CONVERTERS",
    "convert_column",
]
