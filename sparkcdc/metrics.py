"""Per-micro-batch lineage + throughput metrics (north_rule requirement).

The reference meters counts per op type, lag and queue use
(core/pipeline/meters/CommonEventMeter.java:26-28, StreamingMeter.java:28-91);
here each micro-batch appends one JSON line with its offset range, row
counts, affected buckets and wall-clock — the lineage record that ties every
table version back to the exact source offsets that produced it.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def record(self, **kv) -> dict:
        kv.setdefault("ts_ms", int(time.time() * 1000))
        with open(self.path, "a") as fh:
            fh.write(json.dumps(kv) + "\n")
        return kv

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def snapshot_progress(self) -> dict:
        """Snapshot-phase progress, MXBean-shaped
        (core/pipeline/metrics/SnapshotChangeEventSourceMetricsMXBean.java:
        TotalTableCount / RemainingTableCount / RowsScanned / ChunkId /
        SnapshotRunning / SnapshotCompleted). Folded from the
        ``snapshot_progress`` rows the engine records per snapshotted
        table and the ``snapshot_chunk`` rows each backfill chunk commit
        records."""
        rows = self.read()
        tables = [r for r in rows if r.get("kind") == "snapshot_progress"]
        chunks = [r for r in rows if r.get("kind") == "snapshot_chunk"]
        last = tables[-1] if tables else {}
        total = int(last.get("tables_total", 0))
        completed = int(last.get("tables_completed", 0))
        return {
            "total_table_count": total,
            "completed_table_count": completed,
            "remaining_table_count": max(0, total - completed),
            "rows_scanned": {
                r["table"]: r.get("rows_scanned") for r in tables
            },
            "current_chunk_id": chunks[-1]["chunk_id"] if chunks else None,
            "chunk_rows_total": sum(int(c.get("rows", 0)) for c in chunks),
            "snapshot_running": bool(tables) and completed < total,
            "snapshot_completed": bool(tables) and completed >= total,
        }

    def streaming_status(self) -> dict:
        """Streaming-phase status, MXBean-shaped
        (StreamingChangeEventSourceMetricsMXBean.java:
        MilliSecondsBehindSource / TotalNumberOfEventsSeen and the batch
        counters of StreamingMeter.java:28-91). Folded from the per-batch
        replay records; ``milliseconds_behind_source`` is wall-clock at
        commit minus the batch's high-watermark SOURCE event time, so it
        is only present when the source reported event time."""
        rows = [
            r for r in self.read()
            if r.get("kind") == "replay" and not r.get("skipped")
        ]
        last = rows[-1] if rows else {}
        return {
            "milliseconds_behind_source": last.get("ms_behind_source"),
            "number_of_committed_batches": len(rows),
            "total_number_of_events_seen": sum(
                r["n_events"] for r in rows if r.get("n_events", -1) > 0
            ),
            "last_offsets": last.get("offsets"),
            "last_wall_sec": last.get("wall_sec"),
        }

    def throughput(self) -> dict:
        # n_events is -1 for batches without stream offsets (snapshots);
        # only positive counts contribute to the rate
        rows = [
            r for r in self.read()
            if r.get("n_events", 0) > 0 and r.get("wall_sec")
        ]
        ev = sum(r["n_events"] for r in rows)
        sec = sum(r["wall_sec"] for r in rows)
        return {"events": ev, "wall_sec": sec, "events_per_sec": ev / sec if sec else 0.0}
