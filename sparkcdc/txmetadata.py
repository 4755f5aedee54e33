"""Transaction metadata (A3): BEGIN/END markers and per-event transaction
blocks, as an engine component.

Reference: core/pipeline/txmetadata/TransactionMonitor.java:31-117 — when
``provide.transaction.metadata`` is on, Debezium (a) stamps every data
event's ``transaction`` block with (id, total_order, data_collection_order)
and (b) emits BEGIN/END marker records on a dedicated transaction topic,
where END carries the total event count and per-collection counts
(TransactionStructMaker). Here:

- :func:`with_transaction_metadata` fills the envelope ``transaction``
  struct from a transaction-id expression. Orders are window functions
  partitioned BY TRANSACTION — a transaction is bounded (thousands of
  events), so the window never sees unbounded partitions; there is no
  global sort.
- :func:`transaction_markers` reduces the stream to two marker rows per
  transaction (BEGIN with the opening offset, END with counts) — one
  map-side-combined aggregation.
- :class:`CdcEngine` (engine.py) writes markers per micro-batch into the
  ``<meta>/tx`` metadata table when ``provide_transaction_metadata`` is on,
  the lake analog of the reference's ``<topic>.transaction`` stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def default_tx_id(events_per_tx: int = 100) -> Column:
    """Synthetic commit batching for sources without explicit tx ids: every
    ``events_per_tx`` consecutive offsets form one transaction (the
    e2e-benchmark's commit-interval analog)."""
    return F.expr(f"offset div {events_per_tx}").cast("string")


def with_transaction_metadata(
    env: DataFrame, tx_id: Column | None = None
) -> DataFrame:
    """Stamp each event's ``transaction`` struct: id, total_order (1-based
    position of the event in its transaction), data_collection_order
    (position among events of the same source table).

    cf. TransactionMonitor.dataEvent / TransactionContext ordering.
    """
    tx_id = tx_id if tx_id is not None else default_tx_id()
    w_total = Window.partitionBy("__tx_id").orderBy("offset")
    w_coll = Window.partitionBy("__tx_id", F.col("source.table")).orderBy("offset")
    return (
        env.withColumn("__tx_id", tx_id)
        .withColumn(
            "transaction",
            F.struct(
                F.col("__tx_id").alias("id"),
                F.row_number().over(w_total).cast("long").alias("total_order"),
                F.row_number().over(w_coll).cast("long").alias(
                    "data_collection_order"
                ),
            ),
        )
        .drop("__tx_id")
    )


def transaction_markers(
    env: DataFrame, tx_id: Column | None = None
) -> DataFrame:
    """BEGIN/END marker rows per transaction.

    Output: (tx_id, status, event_count, n_collections, first_offset,
    last_offset, ts_ms) — BEGIN carries the opening offset/ts and NULL
    counts (the reference's BEGIN precedes any data event, so counts are
    unknowable); END carries the totals. One aggregation, two projections —
    no joins, no windows.
    """
    tx_id = tx_id if tx_id is not None else default_tx_id()
    agg = (
        env.withColumn("__tx_id", tx_id)
        .groupBy(F.col("__tx_id").alias("tx_id"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct(F.col("source.table")).alias("n_collections"),
            F.min("offset").alias("first_offset"),
            F.max("offset").alias("last_offset"),
            F.min("ts_ms").alias("begin_ts_ms"),
            F.max("ts_ms").alias("end_ts_ms"),
        )
    )
    begin = agg.select(
        "tx_id",
        F.lit("BEGIN").alias("status"),
        F.lit(None).cast("long").alias("event_count"),
        F.lit(None).cast("long").alias("n_collections"),
        "first_offset",
        "last_offset",
        F.col("begin_ts_ms").alias("ts_ms"),
    )
    end = agg.select(
        "tx_id",
        F.lit("END").alias("status"),
        "event_count",
        "n_collections",
        "first_offset",
        "last_offset",
        F.col("end_ts_ms").alias("ts_ms"),
    )
    return begin.unionByName(end)


def collection_counts(env: DataFrame, tx_id: Column | None = None) -> DataFrame:
    """Per-(transaction, collection) event counts — the END marker's
    ``data_collections`` array, normalized to rows (lake-friendly)."""
    tx_id = tx_id if tx_id is not None else default_tx_id()
    return (
        env.withColumn("__tx_id", tx_id)
        .groupBy(
            F.col("__tx_id").alias("tx_id"),
            F.col("source.table").alias("collection"),
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
    )
