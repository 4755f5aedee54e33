"""TableSink protocol conformance (round-2 verdict 'missing #4'): the
engine must run end-to-end — replay, fencing, resume, schema evolution,
truncate — against a sink that is NOT LakeTable, proving the Iceberg-swap
seam is an interface, not prose."""

import os

from pyspark.sql import functions as F

from sparkcdc.engine import CdcEngine, EngineConfig, default_engine
from sparkcdc.lake import LakeTable
from sparkcdc.sink import MemoryTableSink, TableSink

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
KEY = ["repo", "path"]


def _mem_engine(spark, tmp_root, **cfg):
    sink = MemoryTableSink(
        spark, "t", FIELDS, KEY, meta_dir=os.path.join(tmp_root, "meta"))
    base = dict(batch_size=500, n_keys=30, n_parts=2, seed=5)
    base.update(cfg)
    return CdcEngine(spark, sink, EngineConfig(**base))


def test_both_impls_satisfy_protocol(spark, tmp_root):
    lake = LakeTable.create(spark, tmp_root, "l", FIELDS, KEY)
    mem = MemoryTableSink(spark, "m", FIELDS, KEY,
                          meta_dir=os.path.join(tmp_root, "meta"))
    assert isinstance(lake, TableSink)
    assert isinstance(mem, TableSink)


def test_engine_replay_equal_across_sinks(spark, tmp_root):
    """Same stream through the protocol on both implementations -> the
    same final state, fences, and offsets checkpoint."""
    mem_eng = _mem_engine(spark, tmp_root)
    mem_eng.replay(1500)
    lake_eng = default_engine(
        spark, os.path.join(tmp_root, "lake"), n_buckets=4,
        config=EngineConfig(batch_size=500, n_keys=30, n_parts=2, seed=5))
    lake_eng.replay(1500)

    proj = lambda t: sorted(  # noqa: E731
        tuple(r) for r in t.read().select(
            "repo", "path", F.sha2("content", 256)).collect())
    assert proj(mem_eng.table) == proj(lake_eng.table)
    assert len(proj(mem_eng.table)) > 0
    assert mem_eng.committed_offset() == lake_eng.committed_offset() == 1500
    # fencing through the protocol: redelivered batch is a no-op
    v = mem_eng.table.current_version()
    assert mem_eng.replay(1500)["batches"] == 0
    assert mem_eng.table.current_version() == v


def test_engine_schema_evolution_through_protocol(spark, tmp_root):
    eng = _mem_engine(spark, tmp_root, batch_size=400)
    eng.replay(800, schema_changes=[(400, [
        {"action": "add", "name": "stars", "type": "int", "default": 9},
        {"action": "rename", "from": "lang", "to": "language"},
    ])])
    df = eng.table.read()
    assert "language" in df.columns and "stars" in df.columns
    assert {r["stars"] for r in df.collect()} == {9}
    assert eng.table.manifest().epoch == 1


def test_append_keyless_through_protocol(spark, tmp_root):
    """insert.mode=insert on a keyless table: appended rows accumulate
    (no key reduction), redelivered batches are fenced, and a keyed
    table rejects append — identically on both implementations."""
    rows = spark.createDataFrame(
        [("r", f"p{i}", "c", "py", f"x{i}") for i in range(6)],
        [n for n, _ in FIELDS])
    for make in (
        lambda: MemoryTableSink(
            spark, "ka", FIELDS, [], meta_dir=os.path.join(tmp_root, "ka")),
        lambda: LakeTable.create(
            spark, os.path.join(tmp_root, "kl"), "kl", FIELDS, []),
    ):
        sink = make()
        assert sink.append(rows, batch_id=1)["skipped"] is False
        assert sink.append(rows, batch_id=2)["skipped"] is False
        assert sink.read().count() == 12  # duplicates kept: no key semantics
        assert sink.append(rows, batch_id=2)["skipped"] is True  # fenced
        assert sink.read().count() == 12

    keyed = MemoryTableSink(
        spark, "kk", FIELDS, KEY, meta_dir=os.path.join(tmp_root, "kk"))
    try:
        keyed.append(rows, batch_id=1)
        raise AssertionError("keyed append must be rejected")
    except ValueError:
        pass


def test_engine_truncate_through_protocol(spark, tmp_root):
    eng = _mem_engine(spark, tmp_root, truncate_enabled=True)
    eng.replay(500)
    assert eng.table.read().count() > 0
    eng.table.delete_where("true")
    assert eng.table.read().count() == 0
