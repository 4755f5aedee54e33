"""Chunked, resumable incremental snapshot (round-2 verdict 'missing #1').

Contract: the backfill reads the source in PK-ordered keyset chunks; every
chunk commit atomically carries {window, last_key, done} in the manifest
summary; a killed backfill resumes at the checkpointed chunk — never from
chunk 0 — and the resumed result equals a one-shot backfill."""

from pyspark.sql import functions as F

from sparkcdc.engine import CdcEngine, EngineConfig
from sparkcdc.lake import LakeTable

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
KEY = ["repo", "path"]


def _mk(spark, root, name="t"):
    t = LakeTable.create(spark, root, name, FIELDS, KEY, n_buckets=4)
    return CdcEngine(spark, t, EngineConfig(
        batch_size=1000, n_keys=40, n_parts=4, seed=3))


def _src(spark, n=200):
    return spark.range(n).select(
        F.lit("org/backfill").alias("repo"),
        F.format_string("src/f_%04d.py", F.col("id")).alias("path"),
        F.sha2(F.col("id").cast("string"), 256).alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("backfill-"), F.col("id")).alias("content"),
    )


def _state(t):
    return sorted(
        tuple(r) for r in t.read().select(
            "repo", "path", F.sha2("content", 256).alias("h")).collect()
    )


def test_chunked_backfill_kill_and_resume(spark, tmp_root):
    eng = _mk(spark, tmp_root)
    eng.replay(1000)  # live stream progress; backfill window = [0, 1000)
    src = _src(spark)

    # "killed" mid-backfill: only 2 chunks of 50 run
    res1 = eng.run_incremental_snapshot(src, 0, 1000, chunk_size=50,
                                        max_chunks=2)
    assert res1 == {"done": False, "chunks": 2, "rows": 100,
                    "resumed_from": None}
    prog = eng.table.manifest().summary["incr_snapshot"]
    assert prog["done"] is False and prog["last_key"] is not None
    assert prog["last_key"][1] == "src/f_0099.py"  # 100th source key

    # a FRESH engine resumes from the checkpoint, not chunk 0
    eng2 = CdcEngine(spark, LakeTable.load(spark, tmp_root, "t"),
                     EngineConfig(batch_size=1000, n_keys=40, n_parts=4,
                                  seed=3))
    res2 = eng2.run_incremental_snapshot(src, 0, 1000, chunk_size=50)
    assert res2["resumed_from"] == prog["last_key"]
    assert res2["done"] is True
    # no chunk re-read: 100 + 100 = the 200 source rows exactly
    assert res1["rows"] + res2["rows"] == 200
    assert eng2.table.manifest().summary["incr_snapshot"]["done"] is True

    # re-invocation after completion is a no-op
    res3 = eng2.run_incremental_snapshot(src, 0, 1000, chunk_size=50)
    assert res3["done"] is True and res3["chunks"] == 0

    # resumed state == one-shot backfill on a twin table w/ same stream
    twin = _mk(spark, tmp_root, name="twin")
    twin.replay(1000)
    twin.run_incremental_snapshot(src, 0, 1000)
    assert _state(eng2.table) == _state(twin.table)


def test_chunk_boundary_exact_multiple_marks_done(spark, tmp_root):
    """Source size an exact multiple of chunk_size: the trailing empty
    chunk persists done=True as a data-less fenced commit."""
    eng = _mk(spark, tmp_root)
    eng.replay(500)
    res = eng.run_incremental_snapshot(_src(spark, n=100), 0, 500,
                                       chunk_size=50)
    assert res["done"] is True and res["rows"] == 100
    assert eng.table.manifest().summary["incr_snapshot"]["done"] is True


def test_backfill_progress_survives_interleaved_replay(spark, tmp_root):
    """Replay commits between backfill calls must carry the backfill
    checkpoint forward (summary carry), not wipe it."""
    eng = _mk(spark, tmp_root)
    eng.replay(500)
    eng.run_incremental_snapshot(_src(spark), 0, 500, chunk_size=50,
                                 max_chunks=1)
    before = eng.table.manifest().summary["incr_snapshot"]
    eng.replay(1500)  # more streaming on top
    after = eng.table.manifest().summary["incr_snapshot"]
    assert after == before
    res = eng.run_incremental_snapshot(_src(spark), 0, 500, chunk_size=50)
    assert res["resumed_from"] == before["last_key"] and res["done"]
