"""Outbound notifications: lifecycle events for external observers.

Reference: core/pipeline/notification/ — Debezium emits typed notifications
(initial-snapshot started/completed, incremental-snapshot progress) on a
configurable channel so operators can track long-running phases without
scraping logs. Here: an append-only JSONL channel (same shape as the
signals input channel, opposite direction), written atomically per event.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class NotificationLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def notify(self, aggregate_type: str, type: str, **data) -> dict:
        """e.g. notify("Initial Snapshot", "COMPLETED", total_rows=...)."""
        event = {
            "id": uuid.uuid4().hex,
            "aggregate_type": aggregate_type,
            "type": type,
            "data": data,
            "ts_ms": int(time.time() * 1000),
        }
        with open(self.path, "a") as fh:
            fh.write(json.dumps(event) + "\n")
        return event

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]


class TableNotificationChannel:
    """Notifications written to a lake table — the SinkNotificationChannel
    analog (reference emits notifications to a Kafka topic via
    core/pipeline/notification/channels/SinkNotificationChannel.java; a
    Spark operator watches a table instead). The outbound mirror of
    ``signals.TableSignalChannel``: control plane in from a table,
    lifecycle out to a table, both ordinary readable/queryable lake state.

    The sink table must be keyless (insert-only append mode). Notifications
    are rare (snapshot lifecycle, pause/resume), so one append commit per
    event is fine; ``data`` nests as a JSON string to keep the table schema
    fixed.
    """

    FIELDS = [
        ("id", "string"), ("aggregate_type", "string"), ("type", "string"),
        ("data", "string"), ("ts_ms", "long"),
    ]

    def __init__(self, spark, table):
        self.spark = spark
        self.table = table

    def notify(self, aggregate_type: str, type: str, **data) -> dict:
        event = {
            "id": uuid.uuid4().hex,
            "aggregate_type": aggregate_type,
            "type": type,
            "data": data,
            "ts_ms": int(time.time() * 1000),
        }
        row = (event["id"], aggregate_type, type, json.dumps(data),
               event["ts_ms"])
        # appends are fenced per (writer, batch_id); the manifest version
        # is strictly increasing per commit, so version+1 is a fresh fence
        # token even across restarts
        self.table.append(
            self.spark.createDataFrame([row], [n for n, _ in self.FIELDS]),
            batch_id=self.table.manifest().version + 1,
            writer="notifications",
        )
        return event

    def read(self) -> list[dict]:
        rows = self.table.read().orderBy("ts_ms", "id").collect()
        return [
            {
                "id": r["id"],
                "aggregate_type": r["aggregate_type"],
                "type": r["type"],
                "data": json.loads(r["data"]),
                "ts_ms": r["ts_ms"],
            }
            for r in rows
        ]
