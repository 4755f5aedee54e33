"""Structured Streaming front-end: an envelope stream drained through
``foreachBatch`` into the same reduce→MERGE→commit path as batch replay.

This is the online form of the engine (reference: the connector streaming
phase, ChangeEventSourceCoordinator.streamEvents :313-335). Debezium's
queue+poll loop (ChangeEventQueue.java:62-105) maps onto Spark's
micro-batch executor:

- any offset-carrying stream plays the binlog client. Here the *rate*
  source's monotonically increasing ``value`` is the global event offset,
  fed through the same closed-form envelope synthesis as batch replay
  (``cdc_events_over_ids``) — streamed and batch replays of the same
  offsets are byte-identical. At scale, swap in
  ``spark.readStream.format("kafka")`` + ``from_json``; everything from
  the envelope on is unchanged (one log abstraction: ordered per-partition
  offsets).
- ``foreachBatch`` is the poll boundary: each micro-batch is reduced per
  key and MERGEd. Spark redelivers a micro-batch after a crash before the
  checkpoint commit (at-least-once); the engine's (writer, batch_id) fence
  turns the redelivery into a no-op — the exactly-once recipe of the
  reference (at-least-once + idempotent sink, EmbeddedEngine.java:885-902)
  with the idempotence made explicit. The streaming batch id is stable
  across redeliveries, so it IS the fence token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .engine import CdcEngine
from .envelope import cdc_events_over_ids


def rate_envelope_stream(
    engine: CdcEngine, rows_per_second: int = 100_000
) -> DataFrame:
    """Streaming envelope DataFrame driven by the rate source (value =
    global event offset)."""
    cfg = engine.cfg
    rate = (
        engine.spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return cdc_events_over_ids(
        rate.select(F.col("value").alias("id")),
        n_keys=cfg.n_keys, n_parts=cfg.n_parts, seed=cfg.seed,
        hot_key_permille=cfg.hot_key_permille,
        content_chars=cfg.content_chars,
    )


def start_stream(
    engine: CdcEngine,
    envelope_stream: DataFrame,
    checkpoint_dir: str,
    *,
    trigger_interval: str = "1 second",
) -> StreamingQuery:
    """Attach the engine to an envelope stream; returns the running query.

    The engine writer name scopes the fence: one writer per stream. Batch
    offsets are taken from the data (min/max of ``offset``), keeping the
    manifest's lineage identical to batch replay."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bounds = batch_df.agg(
            F.min("offset").alias("lo"), F.max("offset").alias("hi")
        ).collect()[0]
        engine._apply_batch(
            batch_df,
            batch_id=batch_id,
            kind="stream",
            offsets={"lo": int(bounds["lo"]), "next": int(bounds["hi"]) + 1},
        )

    return (
        envelope_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger_interval)
        .start()
    )
