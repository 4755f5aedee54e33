"""Per-document text statistics: one narrow projection computing token
count, quality score, language ID and fingerprint in a single pass — all
Catalyst expressions, so over 100 TB this is a pure map stage (no shuffle)
that fuses into whole-stage codegen with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    doc_fingerprint,
    language_id,
    mean_word_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


def document_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.round(mean_word_len(text_col), 6).alias("mean_word_len"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        quality_score(text_col).alias("quality"),
        language_id(text_col).alias("lang_pred"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
