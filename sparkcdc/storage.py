"""Pluggable offset / schema-history storage backends.

Reference: the ``debezium-storage-*`` modules give the connector a choice
of durable homes for its two pieces of restart state — the schema-history
journal (``FileSchemaHistory``, ``JdbcSchemaHistory`` in
debezium-storage-jdbc/.../history/JdbcSchemaHistory.java, Redis/S3/Kafka
variants) and the offset store (Kafka Connect's ``OffsetBackingStore``
implementations: ``FileOffsetBackingStore``, debezium-storage-jdbc/...
/offset/JdbcOffsetBackingStore.java). This module is the Spark-native
form of that seam:

- :class:`HistoryStore` — the journal backend under
  :class:`~sparkcdc.schema_history.SchemaHistory`. Three impls:
  :class:`FileHistoryStore` (JSONL + fsync, = debezium-storage-file),
  :class:`MemoryHistoryStore` (the reference core's MemorySchemaHistory,
  tests/embedded runs), and :class:`TableHistoryStore` (journal rows in a
  keyless lake table, = the jdbc/redis family: history survives anything
  that can host a table, and is readable with plain SQL).

- :class:`OffsetStore` — an EXTERNAL offset mirror with
  :class:`FileOffsetStore` / :class:`MemoryOffsetStore` impls. One
  deliberate difference from the reference: this engine's authoritative
  offsets live in the sink table's own commit summary so the offset flip
  and the data commit are ONE atomic operation (engine.py
  ``committed_offset`` — the reference cannot do this because Kafka
  Connect owns its offsets, which is exactly why it needs
  ``OffsetBackingStore`` and tolerates the at-least-once gap between
  data flush and offset flush). An external store here is therefore a
  post-commit MIRROR — for observability, for migrating a pipeline
  between sinks, or for sinks that cannot host a summary — never the
  resume authority when the sink has one. ``CdcEngine`` accepts
  ``offset_store=`` and writes it after every committed batch; on resume
  it is consulted only when the sink carries no committed state at all.
"""

from __future__ import annotations

import json
import os
import time


class HistoryStore:
    """Protocol: durable append-only journal of schema-change entries.

    ``append(entry)`` must be durable before it returns (the engine
    journals write-ahead, then evolves the table — recovery depends on
    the intent surviving a crash between the two). ``load()`` returns
    every entry ever appended, in append order."""

    def append(self, entry: dict) -> None:  # pragma: no cover - protocol
        raise NotImplementedError

    def load(self) -> list[dict]:  # pragma: no cover - protocol
        raise NotImplementedError


class FileHistoryStore(HistoryStore):
    """JSONL file, fsync per append (FileSchemaHistory.java:62-75)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, entry: dict) -> None:
        with open(self.path, "a") as fh:
            fh.write(json.dumps(entry) + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    def load(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]


class MemoryHistoryStore(HistoryStore):
    """In-process journal (core/relational/history/MemorySchemaHistory.java
    — embedded/test runs; not durable across restarts by design)."""

    def __init__(self):
        self.entries: list[dict] = []

    def append(self, entry: dict) -> None:
        self.entries.append(dict(entry))

    def load(self) -> list[dict]:
        return [dict(e) for e in self.entries]


class TableHistoryStore(HistoryStore):
    """Journal rows in a keyless append-mode lake table — the analog of
    JdbcSchemaHistory's ``debezium_database_history`` table
    (debezium-storage-jdbc/.../history/JdbcSchemaHistory.java:48-63:
    one row per change, ordered by a monotonic record number): history
    lands wherever the data lake lives, with no extra service, and is
    queryable with SQL. Single-writer by contract (one engine owns one
    table's history), like the reference's history topic/table.

    DDL is rare, so one small append commit per change is the right
    trade; ``load()`` is called on recovery paths only."""

    SCHEMA = [("seq", "long"), ("entry", "string")]

    def __init__(self, table):
        self.table = table

    @staticmethod
    def create_history_table(spark, root: str, name: str = "schema_history"):
        from .lake import LakeTable

        return LakeTable.create(
            spark, root, name,
            fields=TableHistoryStore.SCHEMA, key_cols=[], n_buckets=1,
        )

    def append(self, entry: dict) -> None:
        last = self.table.manifest().summary.get("last_batch", {}).get(
            "schema-history", -1)
        seq = int(last) + 1
        df = self.table.spark.createDataFrame(
            [(seq, json.dumps(entry))], "seq long, entry string")
        self.table.append(df, batch_id=seq, writer="schema-history")

    def load(self) -> list[dict]:
        rows = self.table.read().orderBy("seq").collect()
        return [json.loads(r["entry"]) for r in rows]


class OffsetStore:
    """Protocol: external (post-commit) offset mirror — see module doc
    for why this is advisory here and authoritative in the reference."""

    def save(self, offsets: dict) -> None:  # pragma: no cover - protocol
        raise NotImplementedError

    def load(self) -> dict | None:  # pragma: no cover - protocol
        raise NotImplementedError


class FileOffsetStore(OffsetStore):
    """Atomic-rename JSON file (FileOffsetBackingStore semantics: full
    snapshot per flush, last write wins)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def save(self, offsets: dict) -> None:
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"ts_ms": int(time.time() * 1000),
                       "offsets": offsets}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.path)

    def load(self) -> dict | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as fh:
            return json.load(fh)["offsets"]


class MemoryOffsetStore(OffsetStore):
    def __init__(self):
        self._offsets: dict | None = None

    def save(self, offsets: dict) -> None:
        self._offsets = dict(offsets)

    def load(self) -> dict | None:
        return dict(self._offsets) if self._offsets is not None else None


class TableOffsetStore(OffsetStore):
    """Offset snapshots in a keyless lake table — the analog of
    JdbcOffsetBackingStore's ``debezium_offset_storage`` table
    (debezium-storage-jdbc/.../offset/JdbcOffsetBackingStore.java: the
    offset map as plain rows, re-read on restart): the mirror lands
    wherever the data lake lives, with no extra service, and the offset
    trail is queryable with SQL (lag dashboards come free). One row per
    flush ``(seq, ts_ms, offsets-json)``; ``load()`` scans only the rows
    of the LATEST commit (one flush = one commit = one row), so recovery
    work stays bounded no matter how long the engine has run. The full
    trail accumulates in the live table by design — it IS the
    SQL-queryable offset history; trim it like any table
    (``delete_where("seq < ...")``) if months of flushes ever matter.
    Single-writer by contract, same as the history table; the
    (writer, seq) fence turns a redelivered flush into a no-op."""

    SCHEMA = [("seq", "long"), ("ts_ms", "long"), ("offsets", "string")]

    def __init__(self, table):
        self.table = table

    @staticmethod
    def create_offset_table(spark, root: str, name: str = "offset_mirror"):
        from .lake import LakeTable

        return LakeTable.create(
            spark, root, name,
            fields=TableOffsetStore.SCHEMA, key_cols=[], n_buckets=1,
        )

    def save(self, offsets: dict) -> None:
        last = self.table.manifest().summary.get("last_batch", {}).get(
            "offset-mirror", -1)
        seq = int(last) + 1
        df = self.table.spark.createDataFrame(
            [(seq, int(time.time() * 1000), json.dumps(offsets))],
            "seq long, ts_ms long, offsets string",
        )
        self.table.append(df, batch_id=seq, writer="offset-mirror")

    def load(self) -> dict | None:
        from pyspark.sql import functions as F

        m = self.table.manifest()
        if m.version < 0:
            return None
        # latest commit only (each save() is one single-row commit) —
        # a full-table scan would grow with every flush ever made
        rows = (
            self.table.read_appended(m.version - 1)
            .orderBy(F.desc("seq")).limit(1).collect()
        )
        if not rows:  # latest commit wasn't a flush (e.g. a trim)
            rows = self.table.read().orderBy(F.desc("seq")).limit(1).collect()
        return json.loads(rows[0]["offsets"]) if rows else None
