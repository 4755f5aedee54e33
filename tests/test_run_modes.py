"""Tests: snapshot-mode coordinator (S4) and TRUNCATE event handling (K4)."""

import pytest
from pyspark.sql import functions as F

from sparkcdc.engine import EngineConfig, default_engine
from sparkcdc.envelope import cdc_events


def _source(spark, n=50):
    return cdc_events(spark, n * 3, n_keys=n).filter("op != 'd'").select(
        "after.*"
    ).dropDuplicates(["repo", "path"])


def test_snapshot_mode_initial_then_resume_skips_snapshot(spark, tmp_root):
    cfg = EngineConfig(batch_size=1000, n_keys=50, snapshot_mode="initial")
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    out = eng.run(1000, source_df=_source(spark))
    assert out["snapshot"] is not None
    assert out["replay"]["batches"] == 1
    # restart: snapshot must NOT re-run (progress exists)
    eng2 = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    out2 = eng2.run(2000, source_df=_source(spark))
    assert out2["snapshot"] is None
    assert out2["replay"]["batches"] == 1  # only [1000, 2000)


def test_snapshot_mode_no_data_streams_only(spark, tmp_root):
    cfg = EngineConfig(batch_size=1000, n_keys=50, snapshot_mode="no_data")
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    out = eng.run(1000)
    assert out["snapshot"] is None and out["replay"]["batches"] == 1


def test_snapshot_mode_initial_only_never_streams(spark, tmp_root):
    cfg = EngineConfig(batch_size=1000, n_keys=50, snapshot_mode="initial_only")
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    out = eng.run(1000, source_df=_source(spark))
    assert out["snapshot"] is not None and "replay" not in out
    assert eng.committed_offset() == 0


def test_snapshot_mode_always_resnapshots(spark, tmp_root):
    cfg = EngineConfig(batch_size=1000, n_keys=50, snapshot_mode="always")
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    eng.run(1000, source_df=_source(spark))
    out2 = default_engine(spark, tmp_root, n_buckets=4, config=cfg).run(
        1000, source_df=_source(spark)
    )
    assert out2["snapshot"] is not None  # re-ran, not fenced
    assert out2["snapshot"].get("skipped") is not True


def test_snapshot_mode_requires_source(spark, tmp_root):
    cfg = EngineConfig(snapshot_mode="initial")
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    with pytest.raises(ValueError):
        eng.run(1000)


def test_snapshot_mode_configuration_based(spark, tmp_root):
    """snapshot.mode=configuration_based: the data and schema phases are
    chosen independently by config flags
    (BinlogConnectorConfig.java:126-181)."""
    # data=False, schema=False: stream only
    cfg = EngineConfig(batch_size=1000, n_keys=50,
                       snapshot_mode="configuration_based")
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    out = eng.run(1000)
    assert out["snapshot"] is None and out["replay"]["batches"] == 1

    # data=True on a fresh table: snapshots, then streams
    import os
    cfg2 = EngineConfig(batch_size=1000, n_keys=50,
                        snapshot_mode="configuration_based",
                        snapshot_config_data=True)
    eng2 = default_engine(spark, os.path.join(tmp_root, "b"), n_buckets=4,
                          config=cfg2)
    out2 = eng2.run(1000, source_df=_source(spark))
    assert out2["snapshot"] is not None and out2["replay"]["batches"] == 1
    # restart: data phase respects existing progress (like initial)
    eng3 = default_engine(spark, os.path.join(tmp_root, "b"), n_buckets=4,
                          config=cfg2)
    out3 = eng3.run(1000, source_df=_source(spark))
    assert out3["snapshot"] is None


def test_snapshot_mode_custom_snapshotter(spark, tmp_root):
    """snapshot.mode=custom: the Snapshotter-SPI callable decides data and
    stream phases per start."""
    calls = []

    def snapshotter(engine, done_before):
        calls.append(done_before)
        return {"data": not done_before, "stream": done_before}

    cfg = EngineConfig(batch_size=1000, n_keys=50, snapshot_mode="custom",
                       custom_snapshotter=snapshotter)
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    # first start: snapshot only (stream=False)
    out = eng.run(1000, source_df=_source(spark))
    assert out["snapshot"] is not None and "replay" not in out
    # second start: stream only
    eng2 = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    out2 = eng2.run(1000, source_df=_source(spark))
    assert out2["snapshot"] is None and out2["replay"]["batches"] == 1
    assert calls == [False, True]
    # custom without a snapshotter is a config error
    with pytest.raises(ValueError, match="custom_snapshotter"):
        default_engine(
            spark, tmp_root, n_buckets=4,
            config=EngineConfig(snapshot_mode="custom"),
        ).run(1000)


def test_truncate_event_clears_prior_state(spark, tmp_root):
    cfg = EngineConfig(batch_size=1000, n_keys=50, truncate_enabled=True)
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    eng.replay(1000)
    assert eng.table.read().count() > 0

    # batch 2: events [1000, 2000) with a TRUNCATE injected at offset 1500
    base = cdc_events(spark, 1000, start=1000, n_keys=50)
    trunc = base.filter(F.col("offset") == 1500).withColumn("op", F.lit("t"))
    env = base.filter(F.col("offset") != 1500).unionByName(trunc)
    eng._apply_batch(env, batch_id=eng.committed_batch() + 1, kind="replay",
                     offsets={"lo": 1000, "next": 2000})

    state = eng.table.read()
    # only keys touched by events AFTER the truncate may exist
    post = cdc_events(spark, 1000, start=1000, n_keys=50).filter(
        (F.col("offset") > 1500) & (F.col("op") != "d")
    ).select(F.col("after.repo").alias("repo"), F.col("after.path").alias("path")).distinct()
    state_keys = {(r["repo"], r["path"]) for r in state.collect()}
    allowed = {(r["repo"], r["path"]) for r in post.collect()}
    assert state_keys <= allowed
    assert len(state_keys) > 0


def test_auto_expire_bounds_disk(spark, tmp_root):
    """COW must not retain one table copy per batch: with
    expire_keep_last=2, a 10-batch replay leaves at most 2 manifests and
    only their data files on disk."""
    import os

    import json as _json

    from sparkcdc.lake import FULL_MANIFEST_EVERY

    cfg = EngineConfig(batch_size=100, n_keys=30, expire_keep_last=2)
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    eng.replay(1000)
    meta = os.path.join(tmp_root, "source_code_repos", "meta")
    manifests = [f for f in os.listdir(meta)
                 if f.startswith("v") and f.endswith(".json")]
    # 2 kept versions + at most FULL_MANIFEST_EVERY tiny DELTA manifests
    # retained as chain bases (metadata only — their data files are GC'd)
    assert len(manifests) <= 2 + FULL_MANIFEST_EVERY
    cur = eng.table.current_version()
    kept = {f"v{cur}.json", f"v{cur - 1}.json"}
    for fn in manifests:
        if fn not in kept:
            with open(os.path.join(meta, fn)) as fh:
                raw = _json.load(fh)
            assert raw.get("base") is not None, (
                f"{fn} retained past the keep window but not a chain base"
            )
    # table still reads fine and resumes
    assert eng.table.read().count() > 0
    eng2 = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    assert eng2.committed_offset() == 1000
    # live data files only: every parquet on disk is referenced
    live = {f["path"] for f in eng.table.manifest().files}
    on_disk = set()
    data_root = os.path.join(tmp_root, "source_code_repos")
    for dirpath, _dirs, files in os.walk(os.path.join(data_root, "data")):
        for fn in files:
            if fn.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, fn), data_root)
                on_disk.add(rel)
    # all-but-previous-version files GC'd: disk holds <= files of kept manifests
    prev_live = {f["path"] for f in eng.table.manifest(eng.table.current_version() - 1).files}
    assert on_disk <= (live | prev_live)


def test_recovery_mode_rebuilds_schema_history(spark, tmp_root):
    """snapshot_mode=recovery: a lost schema-history journal is rebuilt
    from the manifest by field-id diff of consecutive epochs, and replay
    continues with the correct schema reconciliation."""
    import os

    cfg = EngineConfig(batch_size=200, n_keys=30, n_parts=4)
    eng = default_engine(spark, tmp_root, n_buckets=4, config=cfg)
    eng.replay(400, schema_changes=[(200, [
        {"action": "add", "name": "stars", "type": "int", "default": 5},
        {"action": "rename", "from": "lang", "to": "language"},
    ])])
    assert eng.table.manifest().epoch == 1

    # simulate journal loss
    os.remove(os.path.join(eng.table.meta_dir, "schema_history.jsonl"))

    cfg2 = EngineConfig(batch_size=200, n_keys=30, n_parts=4,
                        snapshot_mode="recovery")
    eng2 = default_engine(spark, tmp_root, n_buckets=4, config=cfg2)
    out = eng2.run(800)
    assert out["recovered_entries"] == 1
    [entry] = eng2.schema_history.entries()
    acts = {c["action"] for c in entry["changes"]}
    assert acts == {"add", "rename"}
    assert eng2.schema_history.epoch_at(10**9) == 1
    # replay continued past the recovery point with the evolved schema
    df = eng2.table.read()
    assert "language" in df.columns and "stars" in df.columns
    assert eng2.committed_offset() == 800
    # recovery is idempotent: a journal now exists, nothing re-recovers
    assert eng2.recover_schema_history() == 0
