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


def _event(aggregate_type: str, type: str, data: dict) -> dict:
    """The notification payload shape, shared by every channel."""
    return {
        "id": uuid.uuid4().hex,
        "aggregate_type": aggregate_type,
        "type": type,
        "data": data,
        "ts_ms": int(time.time() * 1000),
    }


class NotificationLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def notify(self, aggregate_type: str, type: str, **data) -> dict:
        """e.g. notify("Initial Snapshot", "COMPLETED", total_rows=...)."""
        event = _event(aggregate_type, type, data)
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
        ("seq", "long"), ("id", "string"), ("aggregate_type", "string"),
        ("type", "string"), ("data", "string"), ("ts_ms", "long"),
    ]

    def __init__(self, spark, table):
        self.spark = spark
        self.table = table

    def notify(self, aggregate_type: str, type: str, **data) -> dict:
        from .lake import CommitConflict

        event = _event(aggregate_type, type, data)
        # appends are fenced per (writer, batch_id); the manifest version
        # is strictly increasing per commit, so version+1 is a fresh fence
        # token even across restarts — and, stored as ``seq``, the
        # deterministic emission-order key (ts_ms alone ties within a
        # millisecond and the random id would shuffle such neighbors).
        # Two notifiers sharing the sink can read the same version: the
        # loser's append is fenced (skipped) or conflicts — surface that
        # and retry with a fresh version instead of silently dropping the
        # notification.
        for _ in range(8):
            seq = self.table.manifest().version + 1
            row = (seq, event["id"], event["aggregate_type"], event["type"],
                   json.dumps(event["data"]), event["ts_ms"])
            try:
                res = self.table.append(
                    self.spark.createDataFrame(
                        [row], [n for n, _ in self.FIELDS]
                    ),
                    batch_id=seq,
                    writer="notifications",
                )
            except CommitConflict:
                continue
            if not res.get("skipped"):
                event["seq"] = seq
                return event
        raise RuntimeError(
            "notification append lost the commit race 8 times "
            f"({aggregate_type}/{type}); sink table is contended"
        )

    def read(self) -> list[dict]:
        rows = self.table.read().orderBy("seq").collect()
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
