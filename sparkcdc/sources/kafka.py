"""Kafka-shaped source adapter: (topic, partition, offset) ⇄ OffsetVector
and the envelope ingestion path over a Kafka-record-shaped DataFrame.

Reference: Debezium's deployment reads envelopes from Kafka with
per-(topic, partition) consumer offsets as the resume position
(KafkaSignalChannel.java:36 consumes the same way; SURVEY §3.2's
per-partition offset contract). The Spark form has two halves:

1. **Offset algebra** — Kafka's ``{topic: {partition: offset}}`` maps
   onto the engine's :class:`~sparkcdc.offsets.OffsetVector` through a
   :class:`TopicPartitionCodec` (stable topic ordinal × stride +
   partition). The engine then checkpoints Kafka progress atomically
   with the data commit exactly as it does generator/wal2json progress,
   and ``starting_offsets_json`` renders a committed vector back into
   the ``startingOffsets`` JSON the Spark Kafka source accepts — a cold
   engine resumes from TABLE state alone, no Spark checkpoint needed.

2. **Record plumbing** — :func:`envelopes_from_kafka` turns a
   Kafka-record-shaped DataFrame (``key``/``value`` binary, ``topic``,
   ``partition``, ``offset`` — the exact schema of
   ``spark.readStream.format("kafka")``) into typed envelopes via the
   same vectorized ``from_json`` parse as every other wire path, keeping
   the transport position as the envelope's ``(part_id, offset)``. Per
   Debezium's contract, events for one key always land in one partition,
   so (partition, offset) ordering is total per key — the ordering
   invariant the LWW reduce needs (apply.py §2.5).

The transform is a pure DataFrame→DataFrame function, so it is unit
tested against a static Kafka-shaped frame; :func:`kafka_envelope_stream`
is the one-line streaming wiring (requires the spark-sql-kafka package
at runtime, absent in this sandbox)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..offsets import OffsetVector


@dataclass(frozen=True)
class TopicPartitionCodec:
    """Stable (topic, partition) → int part-id mapping.

    ``part_id = topic_ordinal * stride + partition``: the topic list is
    fixed configuration (like the connector's table include list), so the
    ordinal is stable across restarts; ``stride`` bounds partitions per
    topic and must not change once offsets are committed.

    **Migration**: changing ``stride`` — or reordering/removing topics —
    changes the part-id mapping and silently invalidates every committed
    OffsetVector (part id 107 means (topic 1, partition 7) under
    stride=100 but (topic 0, partition 107) under stride=10_000). The
    only safe changes in place are APPENDING topics and growing a
    partition count. For anything else, re-encode the committed vector
    through :func:`migrate_vector` (old codec → (topic, partition) →
    new codec) inside the same maintenance window that updates the
    config, before the engine restarts."""

    topics: tuple[str, ...]
    stride: int = 10_000
    _index: dict = field(init=False, repr=False)

    def __post_init__(self):
        if len(set(self.topics)) != len(self.topics):
            raise ValueError(f"duplicate topics in {self.topics}")
        object.__setattr__(
            self, "_index", {t: i for i, t in enumerate(self.topics)}
        )

    def part_id(self, topic: str, partition: int) -> int:
        if partition >= self.stride or partition < 0:
            raise ValueError(
                f"partition {partition} outside stride {self.stride}"
            )
        return self._index[topic] * self.stride + partition

    def topic_partition(self, part_id: int) -> tuple[str, int]:
        return self.topics[part_id // self.stride], part_id % self.stride

    def part_id_col(self, topic_col="topic", partition_col="partition"):
        """The same mapping as a Catalyst expression (no Python UDF)."""
        expr = F.lit(None).cast("int")
        for t, i in self._index.items():
            expr = F.when(F.col(topic_col) == t, F.lit(i)).otherwise(expr)
        return (expr * F.lit(self.stride) + F.col(partition_col)).cast("long")


def kafka_offsets_to_vector(
    offsets: dict[str, dict[str | int, int]], codec: TopicPartitionCodec
) -> OffsetVector:
    """Kafka's ``{topic: {partition: next_offset}}`` → OffsetVector."""
    return OffsetVector({
        codec.part_id(t, int(p)): int(o)
        for t, parts in offsets.items()
        for p, o in parts.items()
    })


def migrate_vector(
    vec: OffsetVector, old: TopicPartitionCodec, new: TopicPartitionCodec
) -> OffsetVector:
    """Re-encode a committed OffsetVector under a NEW codec (stride change,
    topic reorder). Decodes every part id through the old codec back to
    (topic, partition) and re-encodes through the new one; raises KeyError
    if the new codec no longer subscribes a topic with committed progress
    — dropping committed positions silently would re-deliver from
    ``default`` on resume. Run inside the maintenance window that changes
    the codec config, writing the result back with the same
    commit-offsets path the engine uses (storage mirrors included)."""
    return OffsetVector({
        new.part_id(*old.topic_partition(part_id)): nxt
        for part_id, nxt in vec.parts.items()
    })


def starting_offsets_json(
    vec: OffsetVector,
    codec: TopicPartitionCodec,
    default: int = -2,
    partitions: dict[str, int] | None = None,
) -> str:
    """An engine-committed OffsetVector → the ``startingOffsets`` value of
    the Spark Kafka source.

    The source's specific-offsets JSON must list EVERY assigned
    TopicPartition ("startingOffsets for specific offsets must specify
    all TopicPartitions"), so ``partitions`` — the actual per-topic
    partition count, as the connector would learn from the admin client —
    is required whenever committed progress exists: committed partitions
    are pinned to their next offset, the rest start at ``default``
    (-2 = earliest, Kafka-source convention). An empty vector renders as
    the string ``"earliest"``, which is valid for any partition count.
    A non-empty vector without ``partitions`` raises rather than emit
    partial coverage the source would reject at stream start."""
    if not vec.parts:
        return "earliest"
    if partitions is None:
        raise ValueError(
            "resuming from committed offsets requires per-topic partition "
            "counts (partitions={topic: n}) — the specific-offsets JSON "
            "must cover every TopicPartition"
        )
    out: dict[str, dict[str, int]] = {}
    for t in codec.topics:
        n = partitions.get(t)
        if n is None or n < 1:
            raise ValueError(f"no partition count for subscribed topic {t!r}")
        if n > codec.stride:
            raise ValueError(
                f"topic {t!r} has {n} partitions > codec stride "
                f"{codec.stride}; offsets would alias"
            )
        out[t] = {str(p): default for p in range(n)}
    for part_id, nxt in vec.parts.items():
        t, p = codec.topic_partition(part_id)
        if p >= partitions[t]:
            raise ValueError(
                f"committed offset for {t}[{p}] but topic reports only "
                f"{partitions[t]} partitions — stale codec or shrunk topic"
            )
        out[t][str(p)] = int(nxt)
    return json.dumps(out, sort_keys=True)


def envelopes_from_kafka(
    raw: DataFrame,
    codec: TopicPartitionCodec,
    row_fields=None,
    failure_handling: str = "keep",
) -> DataFrame:
    """Kafka-record-shaped frame → typed envelopes.

    ``raw`` has the Kafka source schema (key/value binary, topic,
    partition, offset). The JSON payload's own part_id/offset — if any —
    are overridden by the TRANSPORT position: resume must fence on what
    the consumer actually read, not what the producer stamped (a replayed
    producer would otherwise alias old positions)."""
    from ..transforms.serialize import parse_envelope_json

    env = parse_envelope_json(
        raw.select(
            F.col("value").cast("string").alias("value"),
            codec.part_id_col().alias("__kafka_part"),
            F.col("offset").cast("long").alias("__kafka_offset"),
        ),
        row_fields,
        failure_handling=failure_handling,
        extra_cols=("__kafka_part", "__kafka_offset"),
    )
    return (
        env.withColumn("part_id", F.col("__kafka_part").cast("int"))
        .withColumn("offset", F.col("__kafka_offset"))
        .drop("__kafka_part", "__kafka_offset")
    )


def kafka_envelope_stream(
    engine,
    bootstrap_servers: str,
    codec: TopicPartitionCodec,
    row_fields=None,
    starting_offsets: str | None = None,
    failure_handling: str = "keep",
    partitions: dict[str, int] | None = None,
) -> DataFrame:
    """``readStream.format("kafka")`` → envelopes, resuming from the
    engine's committed per-partition vector by default (table state is
    the checkpoint — mirroring json_envelope_stream, streaming.py:57).
    ``partitions`` (per-topic partition counts) is required for resume —
    see :func:`starting_offsets_json`.

    Requires the spark-sql-kafka connector on the classpath."""
    if starting_offsets is None:
        starting_offsets = starting_offsets_json(
            engine.committed_partition_offsets(), codec,
            partitions=partitions,
        )
    raw = (
        engine.spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(codec.topics))
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return envelopes_from_kafka(raw, codec, row_fields, failure_handling)
