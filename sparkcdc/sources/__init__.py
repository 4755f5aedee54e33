"""Source adapters: wrap external change feeds into the engine's envelope
stream contract (the one log abstraction of SURVEY §2.1 — ordered
per-partition offsets, whatever the upstream: binlog, WAL, Kafka topic, or
a parquet event table)."""

from .events_adapter import events_to_envelopes, EVENT_ROW_FIELDS, EVENT_KEY

__all__ = ["events_to_envelopes", "EVENT_ROW_FIELDS", "EVENT_KEY"]
