"""Per-partition offset vectors + GtidSet-style algebra (SURVEY §2.6,
binlog/gtid/GtidSet.java:27,52) and their checkpoint integration."""

import os

from sparkcdc.offsets import OffsetVector


def test_contains_subtract_merge():
    a = OffsetVector({0: 100, 1: 50, 2: 75})
    b = OffsetVector({0: 80, 1: 50})
    assert a.contains(b)            # isContainedWithin
    assert not b.contains(a)
    # subtract: what of `a` is not yet covered by `b`, keyed at b's resume
    rem = a.subtract(b)
    assert rem.parts == {0: 80, 2: 0}
    assert a.subtract(a).parts == {}
    m = b.merge(OffsetVector({1: 60, 3: 5}))
    assert m.parts == {0: 80, 1: 60, 3: 5}


def test_advance_is_monotone():
    v = OffsetVector({0: 10})
    assert v.advance(0, 5) is v           # never regress
    assert v.advance(0, 20).parts == {0: 20}
    assert v.advance(1, 7).parts == {0: 10, 1: 7}


def test_summary_roundtrip():
    v = OffsetVector({3: 9, 1: 4})
    assert OffsetVector.from_summary(v.to_summary()).parts == v.parts


def test_streaming_checkpoints_partition_vector(spark, tmp_root):
    """The stream commits a per-partition high-water vector atomically with
    the data; a redelivered early batch cannot regress it."""
    from pyspark.sql import functions as F
    from sparkcdc.engine import CdcEngine, EngineConfig
    from sparkcdc.envelope import REPO_ROW_FIELDS, cdc_events
    from sparkcdc.lake import LakeTable
    from sparkcdc.offsets import partition_bounds

    t = LakeTable.create(
        spark, tmp_root, "t",
        fields=[(n, "string") for n, _ in REPO_ROW_FIELDS],
        key_cols=["repo", "path"], n_buckets=4,
    )
    eng = CdcEngine(spark, t, EngineConfig(n_keys=50, n_parts=4))
    env = cdc_events(spark, 1000, n_keys=50, n_parts=4)
    parts = partition_bounds(env)
    assert set(parts.parts) == {0, 1, 2, 3}
    eng._apply_batch(env, batch_id=0, kind="stream",
                     offsets={"lo": 0, "next": 1000,
                              "parts": parts.to_summary()})
    v = eng.committed_partition_offsets()
    assert v.parts == parts.parts
    # a later batch advances only some partitions; vector merges pointwise
    env2 = cdc_events(spark, 200, start=1000, n_keys=50, n_parts=4)
    p2 = partition_bounds(env2)
    eng._apply_batch(env2, batch_id=1, kind="stream",
                     offsets={"lo": 1000, "next": 1200,
                              "parts": p2.to_summary()})
    v2 = eng.committed_partition_offsets()
    assert v2.contains(v) and v2.contains(p2)
    # redelivered stale offsets never regress the vector
    eng._apply_batch(env, batch_id=2, kind="stream",
                     offsets={"lo": 0, "next": 1000,
                              "parts": parts.to_summary()})
    assert eng.committed_partition_offsets().contains(v2)
