"""Adapter: the driver's ``events`` parquet table → Debezium envelope stream.

This plays the role of a binlog client (reference:
binlog/BinlogStreamingChangeEventSource.java event-type dispatch :128-199):
each event row becomes one envelope, with a deterministic op mapping so the
stream exercises create/update/delete semantics:

    signup            -> c   (row created)
    click/view/purchase -> u (row updated)
    error             -> d   (row deleted)

Key = user_id; offset = event_id (the global commit order); part_id =
user_id % n_parts (hash routing per PartitionRouting.java:241 — modulo keeps
it oracle-friendly; all events of one key land in one partition, preserving
the per-key total order invariant of BinlogOffsetContext.java:325-336).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import transaction_struct

#: the change-stream row schema carried in before/after
EVENT_ROW_FIELDS = [
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
]

EVENT_KEY = ["user_id"]

OP_MAP = {"signup": "c", "click": "u", "view": "u", "purchase": "u", "error": "d"}


def event_row_struct() -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in EVENT_ROW_FIELDS])


def events_to_envelopes(events: DataFrame, n_parts: int = 8) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → envelopes."""
    op = (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    # integer div, not /1000-then-cast: float division + cast truncates in
    # Spark but a DuckDB oracle's CAST rounds — div avoids the mismatch
    # parquet timestamps load as TIMESTAMP_NTZ; session TZ is UTC, so the
    # cast is wall-clock-identity and epoch matches the oracle's epoch_us
    ts_ms = F.expr("unix_micros(cast(ts as timestamp)) div 1000")
    after_s = F.struct(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("event_type"),
        F.col("value").cast("double").alias("value"),
        F.col("props").alias("props"),
    )
    nulls = [
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    ]
    before_s = F.struct(F.col("user_id").cast("long").alias("user_id"), *nulls)
    src = F.struct(
        F.lit("sparkcdc").alias("name"),
        F.lit("app").alias("db"),
        F.lit("events").alias("table"),
        F.lit("false").alias("snapshot"),
        F.lit("events.parquet").alias("file"),
        F.col("event_id").cast("long").alias("pos"),
        F.pmod(F.col("event_id"), F.lit(1000)).cast("int").alias("row"),
        F.concat(F.lit("srv:1-"), F.col("event_id")).alias("gtid"),
        ts_ms.alias("ts_ms"),
    )
    return events.select(
        op.alias("op"),
        ts_ms.alias("ts_ms"),
        F.when(op.isin("u", "d"), before_s).alias("before"),
        F.when(op != "d", after_s).alias("after"),
        src.alias("source"),
        F.lit(None).cast(transaction_struct()).alias("transaction"),
        F.pmod(F.col("user_id"), F.lit(n_parts)).cast("int").alias("part_id"),
        F.col("event_id").cast("long").alias("offset"),
        F.lit(False).alias("tombstone"),
    )
