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

Two service-backed families round out the reference's storage matrix
without pulling any SDK into the repo — each takes an injected CLIENT
whose two-or-three-method surface maps 1:1 onto the real service call
(boto3 ``get_object``/``put_object``, azure ``download_blob``/
``upload_blob``, redis ``XADD``/``XRANGE``/``HSET``/``HGETALL``):

- object stores (debezium-storage-{s3,azure-blob}):
  :class:`ObjectHistoryStore` / :class:`ObjectOffsetStore` over an
  :class:`ObjectStoreClient` (whole-object read/write + ETag
  preconditions). :class:`MemoryObjectStoreClient` and
  :class:`LocalObjectStoreClient` ship for tests/local runs.
- key-value/log services (debezium-storage-{redis,rocketmq}):
  :class:`KvHistoryStore` / :class:`KvOffsetStore` over a
  :class:`KvClient` (append-only log + hash map).
  :class:`MemoryKvClient` ships for tests.

The remaining two reference backends need no new protocol:
debezium-storage-configmap is a whole-object store with
compare-and-swap on ``metadata.resourceVersion`` — exactly
:class:`ObjectStoreClient` with the ConfigMap PUT's optimistic-lock
error mapped to :class:`StorageConflict`; debezium-storage-kafka
(KafkaSchemaHistory / Connect's offset topics) is an append-only log
with last-value-per-key reads — exactly :class:`KvClient` where
``append_log`` is a topic produce and ``read_log`` a from-beginning
consume.
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


# -- object-store backends (debezium-storage-s3 / -azure-blob) -----------------


class StorageConflict(Exception):
    """A conditional object write lost: another writer changed the object
    since this store read it. The schema-history contract is
    single-writer (one engine owns one table's journal), so this is a
    deployment error to surface, not a race to retry through."""


class ObjectStoreClient:
    """Protocol: the two-call object-store surface the history/offset
    stores need. ``get`` returns ``(data, etag)`` or None; ``put``
    returns the new etag and honors the standard preconditions —
    ``if_match=<etag>`` (fail unless the stored etag still matches;
    S3 ``If-Match``, Azure ``etag`` + ``ModifiedAccessConditions``, GCS
    ``ifGenerationMatch``) and ``if_none_match=True`` (fail if the object
    already exists; ``If-None-Match: *``). A failed precondition raises
    :class:`StorageConflict`. Real deployments wrap their SDK in ~15
    lines; the shipped impls below are for tests and local runs."""

    def get(self, key: str):  # pragma: no cover - protocol
        raise NotImplementedError

    def put(self, key: str, data: bytes, *, if_match: str | None = None,
            if_none_match: bool = False) -> str:  # pragma: no cover
        raise NotImplementedError


class MemoryObjectStoreClient(ObjectStoreClient):
    """Dict-backed client with exact precondition semantics."""

    def __init__(self):
        self._objects: dict[str, tuple[bytes, str]] = {}
        self._gen = 0

    def get(self, key: str):
        return self._objects.get(key)

    def put(self, key: str, data: bytes, *, if_match: str | None = None,
            if_none_match: bool = False) -> str:
        cur = self._objects.get(key)
        if if_none_match and cur is not None:
            raise StorageConflict(f"{key}: already exists")
        if if_match is not None and (cur is None or cur[1] != if_match):
            raise StorageConflict(f"{key}: etag moved (concurrent writer)")
        self._gen += 1
        etag = f"g{self._gen}"
        self._objects[key] = (bytes(data), etag)
        return etag


class LocalObjectStoreClient(ObjectStoreClient):
    """Directory-backed client (atomic-rename puts, etag sidecar) — the
    minio stand-in for durability tests and SDK-free local runs. The
    precondition check-then-write is not atomic across PROCESSES here
    (a real object store enforces it server-side); within the
    single-writer contract the stores rely on, that is sufficient."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, key: str) -> tuple[str, str]:
        safe = key.replace("/", "__")
        base = os.path.join(self.root, safe)
        return base, base + ".etag"

    def get(self, key: str):
        data_p, etag_p = self._paths(key)
        if not os.path.exists(data_p):
            return None
        with open(data_p, "rb") as fh:
            data = fh.read()
        with open(etag_p) as fh:
            return data, fh.read()

    def put(self, key: str, data: bytes, *, if_match: str | None = None,
            if_none_match: bool = False) -> str:
        cur = self.get(key)
        if if_none_match and cur is not None:
            raise StorageConflict(f"{key}: already exists")
        if if_match is not None and (cur is None or cur[1] != if_match):
            raise StorageConflict(f"{key}: etag moved (concurrent writer)")
        data_p, etag_p = self._paths(key)
        etag = os.urandom(8).hex()
        for path, payload, mode in ((data_p, data, "wb"),
                                    (etag_p, etag, "w")):
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, mode) as fh:
                fh.write(payload)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, path)
        return etag


class ObjectHistoryStore(HistoryStore):
    """Schema-history journal as ONE object holding the full JSONL — the
    S3SchemaHistory shape (debezium-storage-s3/.../S3SchemaHistory.java:
    S3 has no append, so storeRecord rewrites the whole history object
    and recovery reads it into memory once). Two deliberate upgrades over
    the reference:

    - every rewrite carries ``if_match`` on the etag of the state it
      extends (first write: ``if_none_match``), so a second engine
      accidentally pointed at the same journal fails loudly with
      :class:`StorageConflict` instead of silently truncating history —
      the reference's unconditional ``putObject`` loses that race;
    - entries are cached after the first load (the reference caches
      too), so steady-state appends cost one GET-free conditional PUT.

    DDL is rare and journals are small (entries, not data), so
    whole-object rewrite is the right trade at any scale."""

    def __init__(self, client: ObjectStoreClient, key: str = "schema_history.jsonl"):
        self.client = client
        self.key = key
        self._entries: list[dict] | None = None
        self._etag: str | None = None

    def _ensure_loaded(self) -> None:
        if self._entries is not None:
            return
        got = self.client.get(self.key)
        if got is None:
            self._entries, self._etag = [], None
        else:
            data, self._etag = got
            self._entries = [json.loads(line)
                             for line in data.decode().splitlines()
                             if line.strip()]

    def append(self, entry: dict) -> None:
        self._ensure_loaded()
        new = self._entries + [dict(entry)]
        body = "".join(json.dumps(e) + "\n" for e in new).encode()
        if self._etag is None:
            self._etag = self.client.put(self.key, body, if_none_match=True)
        else:
            self._etag = self.client.put(self.key, body,
                                         if_match=self._etag)
        self._entries = new

    def load(self) -> list[dict]:
        self._entries = None  # recovery path: re-read the object
        self._ensure_loaded()
        return [dict(e) for e in self._entries]


class ObjectOffsetStore(OffsetStore):
    """Offset mirror as one small JSON object, last write wins — the
    configmap/azure-blob offset shape (debezium-storage-configmap/...
    /ConfigMapOffsetStore.java: the whole offset map serialized into one
    small cloud-side document per flush). Unconditional put by design:
    the mirror is post-commit and advisory (module doc), so the newest
    flush should always win."""

    def __init__(self, client: ObjectStoreClient, key: str = "offsets.json"):
        self.client = client
        self.key = key

    def save(self, offsets: dict) -> None:
        self.client.put(self.key, json.dumps(
            {"ts_ms": int(time.time() * 1000), "offsets": offsets}
        ).encode())

    def load(self) -> dict | None:
        got = self.client.get(self.key)
        return json.loads(got[0])["offsets"] if got else None


# -- key-value / log-service backends (debezium-storage-redis / -rocketmq) -----


class KvClient:
    """Protocol: the redis-shaped surface the stores need — an
    append-only log per key (``XADD`` / ``XRANGE``; a rocketmq topic
    plays the same role) and a hash map per key (``HSET`` / ``HGETALL``).
    Real deployments wrap their client library; :class:`MemoryKvClient`
    ships for tests."""

    def append_log(self, key: str, value: str) -> None:  # pragma: no cover
        raise NotImplementedError

    def read_log(self, key: str) -> list[str]:  # pragma: no cover
        raise NotImplementedError

    def hset(self, key: str, field: str, value: str) -> None:  # pragma: no cover
        raise NotImplementedError

    def hgetall(self, key: str) -> dict[str, str]:  # pragma: no cover
        raise NotImplementedError


class MemoryKvClient(KvClient):
    def __init__(self):
        self._logs: dict[str, list[str]] = {}
        self._hashes: dict[str, dict[str, str]] = {}

    def append_log(self, key: str, value: str) -> None:
        self._logs.setdefault(key, []).append(value)

    def read_log(self, key: str) -> list[str]:
        return list(self._logs.get(key, []))

    def hset(self, key: str, field: str, value: str) -> None:
        self._hashes.setdefault(key, {})[field] = value

    def hgetall(self, key: str) -> dict[str, str]:
        return dict(self._hashes.get(key, {}))


class KvHistoryStore(HistoryStore):
    """Journal entries appended to a server-side log — the
    RedisSchemaHistory shape (debezium-storage-redis/.../
    RedisSchemaHistory.java:96: one ``XADD`` per record, recovery reads
    the stream back in order). The log is append-only on the service, so
    unlike :class:`ObjectHistoryStore` there is no rewrite and no etag:
    ordering and durability are the service's."""

    def __init__(self, client: KvClient, key: str = "sparkcdc.schema_history"):
        self.client = client
        self.key = key

    def append(self, entry: dict) -> None:
        self.client.append_log(self.key, json.dumps(entry))

    def load(self) -> list[dict]:
        return [json.loads(v) for v in self.client.read_log(self.key)]


class KvOffsetStore(OffsetStore):
    """Offset mirror as one hash — the RedisOffsetBackingStore shape
    (debezium-storage-redis/.../RedisOffsetBackingStore.java:103,146:
    ``HGETALL`` on start, one ``HSET`` per offset key on save). Each
    top-level offsets key becomes a hash field with a JSON value, so the
    mirror is field-addressable server-side (a dashboard can read one
    partition's position without parsing a document)."""

    _TS = "__ts_ms"

    def __init__(self, client: KvClient, key: str = "sparkcdc.offsets"):
        self.client = client
        self.key = key

    def save(self, offsets: dict) -> None:
        for field, value in offsets.items():
            self.client.hset(self.key, str(field), json.dumps(value))
        self.client.hset(self.key, self._TS,
                         json.dumps(int(time.time() * 1000)))

    def load(self) -> dict | None:
        raw = self.client.hgetall(self.key)
        raw.pop(self._TS, None)
        if not raw:
            return None
        return {k: json.loads(v) for k, v in raw.items()}
