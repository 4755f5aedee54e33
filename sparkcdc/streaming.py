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

from dataclasses import replace

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


def json_envelope_stream(
    engine: CdcEngine, path: str, row_fields=None,
    failure_handling: str = "keep",
) -> DataFrame:
    """Serialized-envelope ingestion: a JSON-lines file stream → vectorized
    ``from_json`` parse → typed envelopes. This is the sandbox stand-in for
    the reference's most-used deployment — consuming real wire records
    (EmbeddedEngine.java:432 handleBatch; Kafka-sourced envelopes). The
    Kafka swap is one line: replace ``readStream.text`` with
    ``readStream.format('kafka')...selectExpr("CAST(value AS STRING)")`` —
    everything from the parse on is identical."""
    from .transforms.serialize import parse_envelope_json

    raw = engine.spark.readStream.text(path)
    return parse_envelope_json(raw, row_fields, failure_handling=failure_handling)


def wire_envelope_stream(
    engine: CdcEngine,
    path: str,
    wire_format: str,
    row_fields,
    key_cols: list[str],
    *,
    source_table: str | None = None,
    database: str | None = None,
    failure_handling: str = "skip",
) -> DataFrame:
    """Streaming ingestion of SHIPPED wire formats — the deployment a real
    binlog/WAL tailer feeds: Maxwell / wal2json / change-stream / LogMiner
    lines land in files (or Kafka), Spark streams and parses them into
    envelopes, ``start_stream`` applies them with the batch fence.

    Every supported parser is a stateless projection (plan-asserted in its
    source tests), so it runs unmodified on a streaming DataFrame — the
    micro-batch boundary never splits the meaning of a line. ``sqlserver``
    is refused: its operation-3/4 pairing is an aggregation whose pair can
    straddle a micro-batch boundary (a tailer may flush the before-row and
    after-row of one update into different files); pairing across batches
    would need keyed state with no bound. Use the batch path
    (``cli.py ingest --format sqlserver``), whose commit-next-at-boundary
    watermark re-reads the possibly-incomplete max-LSN transaction on the
    next run.

    The Kafka swap is the same one line as :func:`json_envelope_stream`:
    ``readStream.format('kafka')...selectExpr("CAST(value AS STRING)")``.

    Dispatch and per-format argument mapping live in
    :func:`sparkcdc.sources.wire.parse_wire_lines` — one table shared
    with the batch CLI, so the two surfaces cannot drift. The parser is
    handed the ENGINE's ``cfg.n_parts``: the committed per-partition
    offset vector keys on ``part_id``, and a parser hashing into a
    different partition count would make the vector's pointwise-max
    merge compare unrelated key populations.
    """
    from .sources.wire import parse_wire_lines

    raw = engine.spark.readStream.text(path)
    return parse_wire_lines(
        raw, wire_format, row_fields, key_cols,
        source_table=source_table, database=database,
        n_parts=engine.cfg.n_parts, failure_handling=failure_handling,
        streaming=True,
    )


def default_checkpoint_dir(engine: CdcEngine) -> str:
    """Deterministic checkpoint location under the table's meta dir.

    The streaming batch id is the fence token, and Spark only keeps batch
    ids stable across restarts when the SAME checkpoint dir is reused — a
    fresh tempdir per run would restart ids at 0 while the table fence
    retains the prior run's last_batch, silently fencing out live batches
    (data loss). Deriving the dir from the table root makes restart-safety
    the default."""
    import os

    return os.path.join(engine.table.meta_dir, "stream_ckpt")


def start_stream(
    engine: CdcEngine,
    envelope_stream: DataFrame,
    checkpoint_dir: str | None = None,
    *,
    trigger_interval: str = "1 second",
    available_now: bool = False,
) -> StreamingQuery:
    """Attach the engine to an envelope stream; returns the running query.

    Fencing is scoped to a dedicated ``<writer>:stream`` namespace so a
    batch ``replay`` on the same table (writer='engine', its own batch-id
    sequence) can never collide with streaming batch ids. Batch offsets are
    taken from the data (min/max of ``offset``), keeping the manifest's
    lineage identical to batch replay; the engine clamps the committed
    offset so a redelivered early batch can't regress the checkpoint."""
    if checkpoint_dir is None:
        checkpoint_dir = default_checkpoint_dir(engine)
    # the derived engine must inherit EVERY pluggable seam of the outer
    # one, not just the config: a streaming run that journaled schema
    # changes to a default file store while the caller configured a
    # table-backed one would strand the journal where restart recovery
    # never looks, and a missing offset-store mirror breaks the
    # sink-migration resume contract ("written after every committed
    # batch", engine.py)
    stream_engine = CdcEngine(
        engine.spark, engine.table,
        config=replace(engine.cfg, writer=f"{engine.cfg.writer}:stream"),
        signal_processor=engine.signals,
        history_store=engine.schema_history.store,
        offset_store=engine.offset_store,
    )
    stream_engine.schema_registry = engine.schema_registry

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # persist ONCE: the bounds probe and the reduce->merge pipeline
        # would otherwise each re-evaluate the micro-batch from source
        batch_df = batch_df.persist()
        try:
            from .offsets import partition_bounds

            bounds = batch_df.agg(
                F.min("offset").alias("lo"), F.max("offset").alias("hi")
            ).collect()[0]
            # per-partition high-water vector (north rule): the same
            # persisted batch feeds both probes, one tiny agg each
            parts = partition_bounds(batch_df)
            stream_engine._apply_batch(
                batch_df,
                batch_id=batch_id,
                kind="stream",
                offsets={"lo": int(bounds["lo"]),
                         "next": int(bounds["hi"]) + 1,
                         "parts": parts.to_summary()},
            )
        finally:
            batch_df.unpersist()

    writer = envelope_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        # bounded backlog drain: process everything currently available,
        # then stop (the batch-catchup mode of the connector)
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
