"""Edge cases: empty batches, all-delete batches, deleting absent keys,
unicode/long content, overlapping re-replays, empty table reads."""

from pyspark.sql import functions as F

from sparkcdc import apply as apply_mod
from sparkcdc.engine import CdcEngine, EngineConfig
from sparkcdc.envelope import cdc_events, envelope_schema
from sparkcdc.lake import LakeTable

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def mk_table(spark, root, name="t"):
    return LakeTable.create(spark, root, name, fields=FIELDS,
                            key_cols=["repo", "path"], n_buckets=4)


def test_empty_batch_is_safe(spark, tmp_root):
    t = mk_table(spark, tmp_root)
    eng = CdcEngine(spark, t, EngineConfig(batch_size=100, n_keys=10))
    empty = spark.createDataFrame([], envelope_schema())
    r = eng._apply_batch(empty, batch_id=0, kind="replay",
                         offsets={"lo": 0, "next": 0})
    assert not r.get("skipped")
    assert t.read().count() == 0
    # table still consistent for a follow-up real batch
    eng._apply_batch(cdc_events(spark, 100, n_keys=10), batch_id=1,
                     kind="replay", offsets={"lo": 0, "next": 100})
    assert t.read().count() > 0


def test_delete_of_absent_keys_is_noop(spark, tmp_root):
    t = mk_table(spark, tmp_root)
    eng = CdcEngine(spark, t, EngineConfig(batch_size=100, n_keys=10))
    deletes = cdc_events(spark, 200, n_keys=10).filter("op = 'd'")
    eng._apply_batch(deletes, batch_id=0, kind="replay",
                     offsets={"lo": 0, "next": 200})
    assert t.read().count() == 0


def test_all_keys_deleted_leaves_empty_table(spark, tmp_root):
    t = mk_table(spark, tmp_root)
    eng = CdcEngine(spark, t, EngineConfig(batch_size=1000, n_keys=10))
    eng.replay(500)
    assert t.read().count() > 0
    state = t.read()
    row_t = envelope_schema()["before"].dataType
    del_env = state.select(
        F.lit("d").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.struct("repo", "path", "commit", "lang", "content").alias("before"),
        F.lit(None).cast(row_t).alias("after"),
        F.lit(None).cast(envelope_schema()["source"].dataType).alias("source"),
        F.lit(None).cast(envelope_schema()["transaction"].dataType).alias("transaction"),
        F.lit(0).alias("part_id"),
        F.monotonically_increasing_id().alias("offset"),
        F.lit(False).alias("tombstone"),
    )
    eng._apply_batch(del_env, batch_id=eng.committed_batch() + 1,
                     kind="replay", offsets=None)
    assert t.read().count() == 0


def test_unicode_and_long_content_survive_roundtrip(spark, tmp_root):
    t = mk_table(spark, tmp_root)
    eng = CdcEngine(spark, t, EngineConfig(batch_size=10, n_keys=2))
    content = "héllo→🌍 " + "𝛼" * 5000 + "\n\ttabs\0?"
    env = spark.createDataFrame(
        [("c", 1, None, ("r", "p", "c1", "py", content), None, None, 0, 0, False)],
        envelope_schema(),
    )
    eng._apply_batch(env, batch_id=0, kind="replay", offsets={"lo": 0, "next": 1})
    got = t.read().collect()[0]["content"]
    assert got == content


def test_overlapping_rereplay_converges(spark, tmp_root):
    """Replaying overlapping offset ranges with FRESH batch ids (e.g. a
    misconfigured producer) still converges: LWW by offset is idempotent
    under at-least-once delivery."""
    t = mk_table(spark, tmp_root)
    eng = CdcEngine(spark, t, EngineConfig(batch_size=10_000, n_keys=50))
    eng._apply_batch(cdc_events(spark, 600, n_keys=50), batch_id=0,
                     kind="replay", offsets={"lo": 0, "next": 600})
    state1 = sorted(tuple(r) for r in t.read().collect())
    # overlap: re-apply [200, 600) with a new batch id
    env2 = cdc_events(spark, 400, start=200, n_keys=50)
    eng._apply_batch(env2, batch_id=1, kind="replay",
                     offsets={"lo": 200, "next": 600})
    state2 = sorted(tuple(r) for r in t.read().collect())
    assert state1 == state2


def test_changes_with_only_message_events(spark, tmp_root):
    t = mk_table(spark, tmp_root)
    red = apply_mod.reduce_envelopes(
        cdc_events(spark, 100, n_keys=10).withColumn("op", F.lit("m")),
        [f[0] for f in FIELDS], ["repo", "path"],
    )
    assert red.count() == 0
