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
