"""Pluggable storage backends (sparkcdc/storage.py — the
debezium-storage seam): HistoryStore file/memory/table parity,
SchemaHistory over each backend, engine wiring for a table-backed
journal, and the external offset mirror incl. the sink-migration
resume path."""

import json
import os

import pytest

from sparkcdc.engine import EngineConfig, default_engine
from sparkcdc.schema_history import SchemaHistory
from sparkcdc.storage import (
    FileHistoryStore,
    FileOffsetStore,
    KvHistoryStore,
    KvOffsetStore,
    LocalObjectStoreClient,
    MemoryHistoryStore,
    MemoryKvClient,
    MemoryObjectStoreClient,
    MemoryOffsetStore,
    ObjectHistoryStore,
    ObjectOffsetStore,
    StorageConflict,
    TableHistoryStore,
)

CFG = EngineConfig(batch_size=500, n_keys=40, seed=7)


def _stores(tmp_root, spark):
    table = TableHistoryStore.create_history_table(spark, tmp_root)
    return {
        "file": FileHistoryStore(os.path.join(tmp_root, "hist.jsonl")),
        "memory": MemoryHistoryStore(),
        "table": TableHistoryStore(table),
        "object": ObjectHistoryStore(MemoryObjectStoreClient()),
        "object_local": ObjectHistoryStore(
            LocalObjectStoreClient(os.path.join(tmp_root, "objstore"))),
        "kv": KvHistoryStore(MemoryKvClient()),
    }


def test_history_store_parity(spark, tmp_root):
    """All three backends satisfy the same append/load contract and
    return entries in append order."""
    entries = [{"offset": o, "changes": [{"action": "add", "name": f"c{o}"}],
                "base_epoch": i, "ts_ms": 1000 + i}
               for i, o in enumerate((10, 5, 20))]
    for name, store in _stores(tmp_root, spark).items():
        for e in entries:
            store.append(e)
        assert store.load() == entries, name


def test_file_and_table_stores_survive_reopen(spark, tmp_root):
    f = FileHistoryStore(os.path.join(tmp_root, "h.jsonl"))
    f.append({"offset": 1, "changes": []})
    assert FileHistoryStore(f.path).load() == [{"offset": 1, "changes": []}]

    t = TableHistoryStore.create_history_table(spark, tmp_root, "h2")
    TableHistoryStore(t).append({"offset": 2, "changes": []})
    from sparkcdc.lake import LakeTable

    reopened = TableHistoryStore(LakeTable.load(spark, tmp_root, "h2"))
    assert reopened.load() == [{"offset": 2, "changes": []}]


def test_schema_history_over_any_backend(spark, tmp_root):
    """SchemaHistory semantics (position-ordered entries, epoch_at) are
    backend-independent."""
    for name, store in _stores(tmp_root, spark).items():
        h = SchemaHistory(store)
        h.record(100, [{"action": "add", "name": "b", "type": "string"}])
        h.record(50, [{"action": "add", "name": "a", "type": "string"}],
                 base_epoch=0)
        offs = [e["offset"] for e in h.entries()]
        assert offs == [50, 100], name  # position order, not append order
        assert h.epoch_at(49) == 0 and h.epoch_at(75) == 1
        assert h.epoch_at(10**9) == 2, name


def test_engine_journals_ddl_to_table_store(spark, tmp_root):
    """An engine given a table-backed history journal records schema
    changes there, and a restarted engine recovers them (the
    JdbcSchemaHistory deployment shape)."""
    hist_table = TableHistoryStore.create_history_table(
        spark, os.path.join(tmp_root, "meta"))
    eng = default_engine(spark, os.path.join(tmp_root, "t"), config=CFG,
                         n_buckets=4,
                         history_store=TableHistoryStore(hist_table))
    eng.replay(1000, schema_changes=[
        (600, [{"action": "add", "name": "stars", "type": "long"}]),
    ])
    assert "stars" in eng.table.read().columns
    # journal row landed in the TABLE, not a file
    assert not os.path.exists(
        os.path.join(eng.table.meta_dir, "schema_history.jsonl"))
    [entry] = eng.schema_history.entries()
    assert entry["offset"] == 600

    # restart: a fresh engine over the same journal table sees the history
    eng2 = default_engine(spark, os.path.join(tmp_root, "t"), config=CFG,
                          n_buckets=4,
                          history_store=TableHistoryStore(hist_table))
    assert [e["offset"] for e in eng2.schema_history.entries()] == [600]
    assert eng2.schema_history.epoch_at(10**9) == 1


def test_offset_mirror_and_migration_resume(spark, tmp_root):
    """The external OffsetStore is written post-commit and is consulted
    on resume ONLY when the sink carries no committed offsets — the
    sink-migration path (state copied without its commit summary)."""
    store = FileOffsetStore(os.path.join(tmp_root, "offsets.json"))
    eng = default_engine(spark, os.path.join(tmp_root, "a"), config=CFG,
                         n_buckets=4, offset_store=store)
    eng.replay(1000)
    assert eng.committed_offset() == 1000
    mirror = store.load()
    assert mirror["next"] == 1000  # mirror tracks the committed summary
    with open(store.path) as fh:
        assert json.loads(fh.read())["offsets"]["next"] == 1000

    # a FRESH sink with no committed summary resumes from the mirror...
    eng2 = default_engine(spark, os.path.join(tmp_root, "b"), config=CFG,
                          n_buckets=4, offset_store=store)
    assert eng2.committed_offset() == 1000
    # ...but a sink WITH its own summary ignores the mirror even if stale
    store.save({"next": 0, "lo": 0})
    assert eng.committed_offset() == 1000


def test_offset_mirror_survives_offsetless_commit(spark, tmp_root):
    """Migration resume must survive a FIRST commit that carries no
    stream offsets (a snapshot batch records offsets={}): the mirror is
    not clobbered with {} and committed_offset still consults it
    (regression: `offs is None` missed the empty-dict case)."""
    from pyspark.sql import functions as F

    store = FileOffsetStore(os.path.join(tmp_root, "off.json"))
    store.save({"next": 500, "lo": 0})  # migrated resume point
    eng = default_engine(spark, os.path.join(tmp_root, "m"), config=CFG,
                         n_buckets=4, offset_store=store)
    src = spark.range(5).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("c").alias("commit"), F.lit("py").alias("lang"),
        F.lit("x").alias("content"))
    eng.run_snapshot(src)  # offset-less commit: summary offsets = {}
    assert store.load() == {"next": 500, "lo": 0}  # mirror untouched
    assert eng.committed_offset() == 500           # still resumes there


def test_memory_offset_store_contract():
    s = MemoryOffsetStore()
    assert s.load() is None
    s.save({"next": 7})
    got = s.load()
    assert got == {"next": 7}
    got["next"] = 99  # load() hands out a copy, not the internal dict
    assert s.load() == {"next": 7}


def test_table_offset_store_mirror_and_migration(spark, tmp_root):
    """TableOffsetStore: the JdbcOffsetBackingStore analog — offset
    snapshots as lake-table rows, latest-seq wins, engine-integrated the
    same as the file store (post-commit mirror, migration resume)."""
    from sparkcdc.storage import TableOffsetStore

    mirror_t = TableOffsetStore.create_offset_table(
        spark, os.path.join(tmp_root, "meta"))
    store = TableOffsetStore(mirror_t)
    eng = default_engine(spark, os.path.join(tmp_root, "a"), config=CFG,
                         n_buckets=4, offset_store=store)
    eng.replay(1000)
    assert store.load()["next"] == 1000
    # one row per flush, monotone seq, queryable with SQL
    rows = mirror_t.read().orderBy("seq").collect()
    assert [r["seq"] for r in rows] == list(range(len(rows)))
    assert len(rows) >= 1

    # fresh sink with no committed summary resumes from the table mirror
    eng2 = default_engine(spark, os.path.join(tmp_root, "b"), config=CFG,
                          n_buckets=4, offset_store=store)
    assert eng2.committed_offset() == 1000

    # save() is fenced per seq: a reopened store continues the sequence
    store2 = TableOffsetStore(
        __import__("sparkcdc.lake", fromlist=["LakeTable"]).LakeTable.load(
            spark, os.path.join(tmp_root, "meta"), "offset_mirror"))
    store2.save({"next": 2000, "lo": 1000})
    assert store2.load()["next"] == 2000


def test_table_offset_store_empty_load(spark, tmp_root):
    from sparkcdc.storage import TableOffsetStore

    t = TableOffsetStore.create_offset_table(
        spark, tmp_root, name="empty_mirror")
    assert TableOffsetStore(t).load() is None


# -- object-store backends (the debezium-storage-s3/-azure-blob analogs) -------


def test_object_history_store_survives_reopen(tmp_root):
    """The journal is one whole object (S3SchemaHistory shape): a fresh
    store over the same client/key recovers every entry in order."""
    client = LocalObjectStoreClient(os.path.join(tmp_root, "bucket"))
    h = ObjectHistoryStore(client, key="srv/schema_history.jsonl")
    h.append({"offset": 1, "changes": []})
    h.append({"offset": 2, "changes": [{"action": "add", "name": "x"}]})

    reopened = ObjectHistoryStore(
        LocalObjectStoreClient(os.path.join(tmp_root, "bucket")),
        key="srv/schema_history.jsonl")
    assert reopened.load() == [
        {"offset": 1, "changes": []},
        {"offset": 2, "changes": [{"action": "add", "name": "x"}]},
    ]


def test_object_history_store_detects_concurrent_writer(tmp_root):
    """Two engines pointed at the same journal object: the second append
    from the stale store must raise StorageConflict (etag precondition),
    never silently truncate the other writer's history — the failure
    mode the reference's unconditional putObject allows."""
    client = MemoryObjectStoreClient()
    a = ObjectHistoryStore(client)
    b = ObjectHistoryStore(client)
    a.append({"offset": 1, "changes": []})
    b.load()                       # b reads the journal at a's entry 1
    a.append({"offset": 2, "changes": []})
    with pytest.raises(StorageConflict):
        b.append({"offset": 3, "changes": []})  # stale etag: a moved it
    # a's history is intact
    assert [e["offset"] for e in a.load()] == [1, 2]

    # first-write race: both stores start empty, second create fails
    shared = MemoryObjectStoreClient()
    c1, c2 = ObjectHistoryStore(shared), ObjectHistoryStore(shared)
    c1.load(), c2.load()
    c1.append({"offset": 1, "changes": []})
    with pytest.raises(StorageConflict):
        c2.append({"offset": 1, "changes": []})


def test_object_store_client_preconditions(tmp_root):
    for client in (MemoryObjectStoreClient(),
                   LocalObjectStoreClient(os.path.join(tmp_root, "b2"))):
        etag = client.put("k", b"v1")
        assert client.get("k") == (b"v1", etag)
        with pytest.raises(StorageConflict):
            client.put("k", b"v2", if_none_match=True)
        with pytest.raises(StorageConflict):
            client.put("k", b"v2", if_match="wrong-etag")
        etag2 = client.put("k", b"v2", if_match=etag)
        assert client.get("k") == (b"v2", etag2)
        assert client.get("missing") is None


def test_object_offset_store_contract():
    store = ObjectOffsetStore(MemoryObjectStoreClient())
    assert store.load() is None
    store.save({"next": 1000, "lo": 0})
    assert store.load() == {"next": 1000, "lo": 0}
    store.save({"next": 2000, "lo": 1000})  # last write wins
    assert store.load() == {"next": 2000, "lo": 1000}


# -- key-value backends (the debezium-storage-redis/-rocketmq analogs) ---------


def test_kv_offset_store_contract():
    client = MemoryKvClient()
    store = KvOffsetStore(client)
    assert store.load() is None
    store.save({"next": 1000, "lo": 0})
    assert store.load() == {"next": 1000, "lo": 0}
    # field-addressable server-side: one HGET-shaped read per position
    assert json.loads(client.hgetall("sparkcdc.offsets")["next"]) == 1000
    store.save({"next": 2000, "lo": 1000})
    assert store.load() == {"next": 2000, "lo": 1000}


def test_engine_over_service_backends(spark, tmp_root):
    """An engine wired with the object-store journal and the KV offset
    mirror behaves exactly like the file-backed one: DDL journals to the
    object, offsets mirror to the hash, and a migrated sink resumes from
    the mirror (the S3-history + Redis-offsets deployment shape)."""
    obj = MemoryObjectStoreClient()
    kv = MemoryKvClient()
    eng = default_engine(
        spark, os.path.join(tmp_root, "a"), config=CFG, n_buckets=4,
        history_store=ObjectHistoryStore(obj),
        offset_store=KvOffsetStore(kv))
    eng.replay(1000, schema_changes=[
        (600, [{"action": "add", "name": "stars", "type": "long"}]),
    ])
    assert "stars" in eng.table.read().columns
    assert KvOffsetStore(kv).load()["next"] == 1000

    # restart over the same service state: history + offsets recovered
    eng2 = default_engine(
        spark, os.path.join(tmp_root, "a"), config=CFG, n_buckets=4,
        history_store=ObjectHistoryStore(obj),
        offset_store=KvOffsetStore(kv))
    assert [e["offset"] for e in eng2.schema_history.entries()] == [600]
    assert eng2.committed_offset() == 1000

    # migration: a FRESH sink with no committed summary resumes from the
    # KV mirror
    eng3 = default_engine(
        spark, os.path.join(tmp_root, "b"), config=CFG, n_buckets=4,
        offset_store=KvOffsetStore(kv))
    assert eng3.committed_offset() == 1000
