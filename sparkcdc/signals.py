"""Control-plane signals (SURVEY §2.1 S13).

Reference: core/pipeline/signal/SignalProcessor.java:42,136-178 — signals
(id, type, data) arrive via channels (source table / file / Kafka / JMX)
and trigger actions: execute-snapshot, stop-snapshot, pause, resume, log
(actions in core/pipeline/signal/actions/...). Debezium polls channels on
an interval; here the engine drains the channel between micro-batches —
the natural poll point.

The file channel is a JSONL file of ``{"id":..., "type":..., "data":...}``
(cf. FileSignalChannel.java:36); processed ids are remembered so a signal
fires exactly once.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


KNOWN_TYPES = {
    "execute-snapshot",  # ExecuteSnapshot action: ad-hoc incremental snapshot
    "stop-snapshot",
    "pause",
    "resume",
    "log",
}


@dataclass
class SignalState:
    paused: bool = False
    snapshot_requests: list[dict] = field(default_factory=list)
    stopped_snapshots: list[dict] = field(default_factory=list)
    log_lines: list[str] = field(default_factory=list)


class _AckStateChannel:
    """Shared ack bookkeeping. ``state_path`` (recommended: under the
    table's meta dir) persists the set of ACKED signal ids so a restarted
    engine does NOT replay handled signals — the analog of the reference
    tracking its signal-topic offset. Ids are persisted only on ``ack``
    (AFTER the action completed), never on read: a crash between delivery
    and action redelivers the signal on restart (at-least-once), while
    within one process the in-memory seen-set prevents duplicate
    delivery."""

    def _init_ack_state(self, state_path: str | None) -> None:
        self.state_path = state_path
        self._acked: set[str] = set()
        if state_path and os.path.exists(state_path):
            with open(state_path) as fh:
                self._acked = set(json.load(fh))
        self._seen: set[str] = set(self._acked)

    def ack(self, ids) -> None:
        """Durably mark signals as handled (called after the action)."""
        self._acked |= {i for i in ids if i is not None}
        if not self.state_path:
            return
        tmp = f"{self.state_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(sorted(self._acked), fh)
        os.replace(tmp, self.state_path)


class FileSignalChannel(_AckStateChannel):
    """JSONL signal file (cf. FileSignalChannel.java:36)."""

    def __init__(self, path: str, state_path: str | None = None):
        self.path = path
        self._init_ack_state(state_path)

    def read_new(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                sig = json.loads(line)
                if sig.get("id") in self._seen:
                    continue
                self._seen.add(sig.get("id"))
                out.append(sig)
        return out


class TableSignalChannel(_AckStateChannel):
    """Signals consumed from a LAKE TABLE between micro-batches — the
    reference's source-table channel analog
    (core/pipeline/signal/channels/SourceSignalChannel.java:36: signals
    arrive as inserts into a designated database table captured alongside
    the data; the Spark-native form a lake user would actually operate).
    Operators ``send()`` rows (id, type, data-JSON) into a keyless
    append-mode LakeTable; the engine drains new rows at the poll
    boundary. Ack semantics are identical to the file channel: the acked
    set persists durably AFTER the action, unacked signals redeliver on
    restart."""

    def __init__(self, table, state_path: str | None = None):
        self.table = table
        self._init_ack_state(state_path)
        #: highest table version already delivered THIS process — polls
        #: after the first scan only new commit files (read_appended), so
        #: a months-old signal table costs O(new signals) per poll, not
        #: O(history). Deliberately in-memory: a restart rescans once so
        #: unacked signals redeliver (at-least-once), acked ids are
        #: filtered BEFORE the collect.
        self._scan_version = -1

    @staticmethod
    def create_signal_table(spark, root: str, name: str = "signals"):
        """The designated signal table (signal.data.collection config)."""
        from .lake import LakeTable

        return LakeTable.create(
            spark, root, name,
            fields=[("id", "string"), ("type", "string"), ("data", "string")],
            key_cols=[], n_buckets=1,
        )

    def send(self, signals: list[dict], writer: str = "signal-sender") -> None:
        """Insert signals as table rows (what an operator's
        ``INSERT INTO signals ...`` does in the reference)."""
        rows = [
            (s["id"], s["type"], json.dumps(s.get("data") or {}))
            for s in signals
        ]
        df = self.table.spark.createDataFrame(
            rows, "id string, type string, data string"
        )
        last = self.table.manifest().summary.get("last_batch", {}).get(writer, -1)
        self.table.append(df, batch_id=last + 1, writer=writer)

    def read_new(self) -> list[dict]:
        from pyspark.sql import functions as F

        m = self.table.manifest()
        if m.version <= self._scan_version:
            return []  # no new commits since the last poll: no Spark job
        new = self.table.read_appended(self._scan_version)
        self._scan_version = m.version
        if self._acked:
            # acked-watermark filter: handled ids never reach the driver
            new = new.filter(~F.col("id").isin(sorted(self._acked)))
        rows = new.collect()
        out = []
        for r in sorted(rows, key=lambda r: str(r["id"])):
            if r["id"] in self._seen:
                continue
            self._seen.add(r["id"])
            out.append({
                "id": r["id"], "type": r["type"],
                "data": json.loads(r["data"]) if r["data"] else {},
            })
        return out


class KafkaSignalChannel(_AckStateChannel):
    """Signals from a Kafka-record-shaped frame — the reference's signal
    topic (core/pipeline/signal/channels/KafkaSignalChannel.java:36:
    key = signal id, value = JSON ``{"type":..., "data":...}``).

    ``frame_provider`` returns the topic's records as a DataFrame with
    ``(key string, value string, partition int, offset long)`` — a
    ``spark.read.format("kafka")`` batch read over the signal topic in
    production (with ``startingOffsets`` from :mod:`sources.kafka`'s
    codec), any record-shaped frame in tests. Per-partition offset
    watermarks make each poll O(new records); they are deliberately
    in-memory — a restart rescans once and the durable acked-id filter
    suppresses handled signals (at-least-once, same contract as the
    file/table channels and the reference's consumer-offset tracking)."""

    def __init__(self, frame_provider, state_path: str | None = None):
        self.frame_provider = frame_provider
        self._init_ack_state(state_path)
        self._watermarks: dict[int, int] = {}

    def read_new(self) -> list[dict]:
        from pyspark.sql import functions as F

        # null-key records are malformed signals (the id IS the key in
        # the reference's topic contract): dropped consistently here —
        # an isin() filter would drop them only when the acked set is
        # non-empty (three-valued logic), flip-flopping the behavior
        df = self.frame_provider().filter(F.col("key").isNotNull())
        if self._watermarks:
            seen_parts = list(self._watermarks)
            cond = ~F.col("partition").isin(seen_parts)
            for p, o in self._watermarks.items():
                cond = cond | ((F.col("partition") == p) & (F.col("offset") > o))
            df = df.filter(cond)
        # the acked filter runs driver-side AFTER watermark bookkeeping:
        # filtering acked ids out of the frame would keep the watermarks
        # from ever advancing past an all-acked history, re-scanning the
        # whole topic on every poll after a restart
        rows = df.select("key", "value", "partition", "offset").collect()
        out = []
        for r in sorted(rows, key=lambda r: (r["partition"], r["offset"])):
            self._watermarks[r["partition"]] = max(
                self._watermarks.get(r["partition"], -1), r["offset"])
            if r["key"] in self._seen:
                continue
            self._seen.add(r["key"])
            val = json.loads(r["value"]) if r["value"] else {}
            out.append({"id": r["key"], "type": val.get("type"),
                        "data": val.get("data") or {}})
        return out


class SignalProcessor:
    """Drains channels and mutates engine control state; called by the
    engine between micro-batches (the poll boundary)."""

    def __init__(self, channels: list[FileSignalChannel]):
        self.channels = channels
        self.state = SignalState()

    def process(self) -> list[dict]:
        acted: list[dict] = []
        for ch in self.channels:
            for sig in ch.read_new():
                typ = sig.get("type")
                data = sig.get("data") or {}
                if typ == "pause":
                    self.state.paused = True
                elif typ == "resume":
                    self.state.paused = False
                elif typ == "execute-snapshot":
                    # deferred action: acked only after the backfill ran
                    # (ack_request) — a crash in between redelivers it
                    self.state.snapshot_requests.append(
                        {**data, "__sig_id": sig.get("id"), "__channel": ch}
                    )
                    acted.append(sig)
                    continue
                elif typ == "stop-snapshot":
                    self.state.stopped_snapshots.append(data)
                elif typ == "log":
                    self.state.log_lines.append(str(data.get("message", "")))
                else:
                    continue  # unknown types ignored, like the reference
                ch.ack([sig.get("id")])  # immediate action completed
                acted.append(sig)
        return acted

    @staticmethod
    def ack_request(req: dict) -> None:
        """Durably ack a deferred execute-snapshot request after its
        backfill completed."""
        ch = req.get("__channel")
        if ch is not None:
            ch.ack([req.get("__sig_id")])
