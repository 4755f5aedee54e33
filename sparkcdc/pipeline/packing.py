"""Sequence packing: lay documents end-to-end into fixed-length training
sequences (the concatenate-then-chunk step every LLM pre-training pipeline
runs between corpus and dataloader).

Semantics: documents are grouped into shards (any deterministic shard
column — hash of the id by default), laid out contiguously in ``id_col``
order within the shard, and the resulting token stream is cut every
``max_tokens``. Each document gets its global layout coordinates:

- ``tok_offset``  — its first token's position in the shard's stream,
- ``seq_start`` / ``seq_end`` — the first/last training sequence it lands
  in (a long document spans several; boundary documents straddle two),
- ``off_in_seq``  — its offset inside ``seq_start``.

This is the standard approximate packing (concatenate + split, cf. GPT/T5
data pipelines) rather than NP-hard bin packing: no token is wasted except
the tail of each shard, and the layout is a pure prefix-sum — one shuffle
on the shard column, one window aggregation per shard, no iteration. At
100 TB the shard count bounds the per-task sort (pick shards so a shard's
documents fit one task comfortably: 4-16k shards for a trillion-token
corpus); everything else is whole-stage-codegen arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    tokens_col: str,
    id_col: str = "doc_id",
    shard_col: str | Column | None = None,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each document its packed-layout coordinates (see module doc).

    ``shard_col``: an existing column (name or expression) to shard by; if
    None, a deterministic ``stable_hash64(id) % n_shards`` shard is
    derived — cross-engine reproducible, so external oracles can verify
    the full layout.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if shard_col is None:
        shard = F.pmod(stable_hash64(id_col), F.lit(n_shards))
    elif isinstance(shard_col, str):
        # a silent cast('int') would turn a non-numeric shard column into
        # all-NULL shards — the whole corpus in ONE window partition
        kind = df.schema[shard_col].dataType.typeName()
        if kind not in ("byte", "short", "integer", "long"):
            raise ValueError(
                f"shard_col {shard_col!r} must be an integral column, got "
                f"{kind}; hash it first (e.g. pmod(xxhash64(col), n))"
            )
        shard = F.col(shard_col)
    else:
        shard = shard_col
    work = df.withColumn("shard", shard.cast("int"))
    prev = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(tokens_col).over(prev), F.lit(0)).cast("long")
    n = F.col(tokens_col).cast("long")
    laid = work.select(
        F.col(id_col),
        F.col("shard"),
        n.alias("n_tokens"),
        off.alias("tok_offset"),
    )
    # integer `div` (not float /): token offsets are longs and the layout
    # must stay exact past 2^53 tokens
    return laid.selectExpr(
        id_col,
        "shard",
        "n_tokens",
        "tok_offset",
        f"tok_offset div {max_tokens} AS seq_start",
        # empty docs occupy no sequence beyond their start boundary
        f"greatest(tok_offset + n_tokens - 1, tok_offset) div {max_tokens}"
        " AS seq_end",
        f"tok_offset % {max_tokens} AS off_in_seq",
    )
