"""Incremental (ad-hoc) snapshot: chunked backfill concurrent with
streaming, de-duplicated against the live change stream via a
watermark-window anti-join (SURVEY §2.1 S9-S12).

Reference semantics:
- AbstractIncrementalSnapshotChangeEventSource.java:83,107-199 — read the
  table in PK-ordered chunks while streaming continues; buffer each chunk
  inside a (low, high) watermark window; rows whose PK saw a streamed event
  inside the window are dropped from the chunk (``deduplicateWindow``
  :193-199) because the streamed value is newer.
- AbstractChunkQueryBuilder.java:48-170 — keyset pagination:
  ``WHERE pk > last ORDER BY pk LIMIT chunk``.
- Read-only variant (BinlogReadOnlyIncrementalSnapshotChangeEventSource.java:62-178):
  watermarks are offset comparisons, not marker writes — exactly what we do
  here (window = [low_offset, high_offset) of the stream), no signal table.

Spark re-expression: the chunk is a filtered/sorted/limited DataFrame; the
dedup is a left-anti join against the distinct keys of the stream slice —
broadcastable because a chunk's window is small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_query(
    df: DataFrame,
    key_cols: list[str],
    last_key: tuple | None,
    chunk_size: int,
) -> DataFrame:
    """Keyset pagination over a sorted unique key (composite keys use the
    row-value-constructor comparison of RowValueConstructorChunkQueryBuilder).
    """
    if last_key is not None:
        if len(key_cols) == 1:
            pred = F.col(key_cols[0]) > F.lit(last_key[0])
        else:
            # (k1, k2) > (v1, v2) — struct comparison is lexicographic
            pred = F.struct(*[F.col(c) for c in key_cols]) > F.struct(
                *[F.lit(v) for v in last_key]
            )
        df = df.filter(pred)
    return df.orderBy(*[F.col(c).asc() for c in key_cols]).limit(chunk_size)


def dedup_chunk_against_window(
    chunk: DataFrame,
    stream_window: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Drop chunk rows whose key changed inside the watermark window
    (deduplicateWindow :193-199): the streamed event is newer, so the
    backfilled row must not overwrite it."""
    changed_keys = stream_window.select(
        *[
            F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c)
            for c in key_cols
        ]
    ).distinct()
    return chunk.join(F.broadcast(changed_keys), on=key_cols, how="left_anti")


def incremental_snapshot(
    source_table: DataFrame,
    stream: DataFrame,
    key_cols: list[str],
    *,
    chunk_size: int = 1024,
    window_lo: int = 0,
    window_hi: int = 2**63 - 1,
) -> DataFrame:
    """One full incremental-snapshot pass as a single declarative plan:
    every source row whose key did NOT change in the stream window
    [window_lo, window_hi), marked op='r' for the merge path.

    (The chunked driver loop exists for pacing against a live stream; the
    *semantics* — backfill minus window-changed keys — is this one
    anti-join, and at rest Spark executes it as a distributed hash join,
    chunking via its own partitioning.)
    """
    window = stream.filter(
        (F.col("offset") >= window_lo) & (F.col("offset") < window_hi)
    )
    return dedup_chunk_against_window(source_table, window, key_cols)
