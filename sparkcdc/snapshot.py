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

import json
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyset_predicate(key_cols: list[str], last_key: tuple):
    """``(k1, k2, ...) > (v1, v2, ...)`` — the row-value-constructor
    comparison of RowValueConstructorChunkQueryBuilder, expanded into the
    equivalent boolean form ``k1 > v1 OR (k1 = v1 AND k2 > v2) OR ...``.

    The expansion matters at scale: a struct comparison
    (``struct(k1,k2) > struct(v1,v2)``) never reaches the data source,
    while the expanded Or/And tree translates to parquet/Iceberg pushdown
    filters on the leading key columns, so a key-clustered source prunes
    row groups exactly like the reference's PK-index range read. Key
    columns are non-null by contract (they are the table's primary key).
    """
    pred = None
    for i in range(len(key_cols)):
        term = F.col(key_cols[i]) > F.lit(last_key[i])
        for j in range(i):
            term = (F.col(key_cols[j]) == F.lit(last_key[j])) & term
        pred = term if pred is None else pred | term
    return pred


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
        df = df.filter(keyset_predicate(key_cols, last_key))
    return df.orderBy(*[F.col(c).asc() for c in key_cols]).limit(chunk_size)


STAGE_MARKER = "_BACKFILL_STAGED.json"


def stage_range_chunks(
    source_df: DataFrame,
    key_cols: list[str],
    chunk_size: int,
    stage_dir: str,
) -> int:
    """One-pass range staging for chunked backfill over UNSORTED sources
    (``chunk_mode='range'``).

    Keyset pagination (the reference's chunk strategy,
    AbstractChunkQueryBuilder.java:48-170) assumes an index: each chunk is
    ``WHERE key > last ORDER BY key LIMIT n``, which a key-clustered source
    answers in O(chunk) via min/max pruning — but an UNSORTED source pays a
    full scan + top-K sort PER CHUNK, O(N·chunks) total. The Spark-first
    alternative staged here: ONE ``repartitionByRange`` pass (Spark's
    RangePartitioner samples the key space and assigns ascending key
    ranges to ascending partition ids — it IS the chunk planner) writes
    the backfill partitioned by chunk id; every later chunk read is a
    partition-pruned scan of one small directory. Total cost: one full
    scan + one range shuffle + O(N) staged bytes (deleted on completion),
    independent of chunk count.

    Returns the number of staged chunks; writes a ``_BACKFILL_STAGED.json``
    marker AFTER the data lands so a half-written stage is detected and
    re-staged on restart.
    """
    n = source_df.count()
    n_chunks = max(1, math.ceil(n / chunk_size))
    staged = source_df.repartitionByRange(
        n_chunks, *[F.col(c) for c in key_cols]
    ).withColumn("__chunk", F.spark_partition_id())
    staged.write.mode("overwrite").partitionBy("__chunk").parquet(stage_dir)
    with open(os.path.join(stage_dir, STAGE_MARKER), "w") as fh:
        json.dump(
            {"n_chunks": n_chunks, "rows": n,
             "key_cols": key_cols, "chunk_size": chunk_size},
            fh,
        )
    return n_chunks


def load_stage_marker(stage_dir: str) -> dict | None:
    """The stage's completion marker, or None if staging never finished."""
    path = os.path.join(stage_dir, STAGE_MARKER)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


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
