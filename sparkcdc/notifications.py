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
