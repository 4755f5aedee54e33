"""Regression tests for round-3 advisor findings: registry gate ordering
(reject BEFORE any durable state), avro leading-digit name collision,
predicate guard nullability tolerance, collection-name skip contract,
notification fence retry."""

import os

import pytest
from pyspark.sql import functions as F

from sparkcdc.engine import CdcEngine, EngineConfig
from sparkcdc.envelope import cdc_events
from sparkcdc.lake import LakeTable
from sparkcdc.schema_registry import IncompatibleSchema

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


class _VetoRegistry:
    """Admits the baseline registration, rejects every evolution."""

    def __init__(self):
        self.calls = 0

    def register(self, subject, schema):
        self.calls += 1
        if self.calls > 1:
            raise IncompatibleSchema("vetoed by test")
        return 1


def test_registry_rejection_leaves_no_durable_state(spark, tmp_root):
    """The compatibility gate must run on the PROSPECTIVE schema before
    the change is journaled or the table evolved: a rejection that left
    either behind would, on restart, skip the boundary and apply events
    under a schema the registry never admitted."""
    t = LakeTable.create(
        spark, tmp_root, "t", fields=FIELDS,
        key_cols=["repo", "path"], n_buckets=4,
    )
    eng = CdcEngine(spark, t, EngineConfig(batch_size=400, n_keys=30,
                                           n_parts=4))
    eng.schema_registry = _VetoRegistry()
    src = cdc_events(spark, 100, n_keys=30).filter("op != 'd'").select(
        "after.*").dropDuplicates(["repo", "path"])
    eng.run_snapshot(src)
    epoch0 = eng.table.manifest().epoch
    journal0 = len(eng.schema_history.entries())
    with pytest.raises(IncompatibleSchema):
        eng.replay(800, schema_changes=[(200, "ALTER TABLE t ADD stars BIGINT")])
    assert eng.table.manifest().epoch == epoch0
    assert len(eng.schema_history.entries()) == journal0
    # the boundary is NOT skipped on re-entry: the rejected epoch still
    # gates the replay instead of silently applying
    with pytest.raises(IncompatibleSchema):
        eng.replay(800, schema_changes=[(200, "ALTER TABLE t ADD stars BIGINT")])


def test_avro_name_leading_digit_keeps_digit():
    from sparkcdc.transforms.avro import adjust_avro_name

    assert adjust_avro_name("1col") == "_1col"
    assert adjust_avro_name("2col") == "_2col"
    assert adjust_avro_name("1col") != adjust_avro_name("2col")
    # non-leading digits still pass through; other invalid chars map to _
    assert adjust_avro_name("a1.b") == "a1_b"


def test_guard_tolerates_nullability_flip(spark):
    """A schema-preserving transform that flips nullability (when()
    without otherwise()) must not be rejected by the guard."""
    from sparkcdc.transforms.predicates import guard

    df = spark.range(10).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    assert not df.schema["s"].nullable

    def nullability_flipper(d):
        return d.select(
            "id", F.when(F.col("id") % 2 == 0, F.col("s")).alias("s")
        )

    gated = guard(nullability_flipper, lambda d: F.col("id") < 5)(df)
    rows = {r["id"]: r["s"] for r in gated.collect()}
    assert rows[1] is None and rows[2] == "v2" and rows[7] == "v7"


def test_resolve_collection_name_missing_field_skips():
    from sparkcdc.sinkconfig import resolve_collection_name

    # both unresolvable flavors return None (skip), never raise
    assert resolve_collection_name("${source.db}", "t", None) is None
    assert resolve_collection_name("${source.db}", "t", {"table": "x"}) is None
    assert resolve_collection_name("${source.db}", "t", {"db": "d"}) == "d"


def test_notification_fence_retry(spark, tmp_root):
    """A fenced/conflicted append must be retried with a fresh version,
    not silently dropped."""
    from sparkcdc.notifications import TableNotificationChannel

    ntable = LakeTable.create(
        spark, os.path.join(tmp_root, "n"), "notifications",
        fields=TableNotificationChannel.FIELDS, key_cols=[], n_buckets=2,
    )
    ch = TableNotificationChannel(spark, ntable)
    orig_append = ntable.append
    state = {"n": 0}

    def flaky_append(rows, batch_id, writer="default", **kw):
        state["n"] += 1
        if state["n"] == 1:  # simulate losing the (writer, batch_id) race
            return {"version": ntable.manifest().version, "skipped": True,
                    "reason": "fenced"}
        return orig_append(rows, batch_id=batch_id, writer=writer, **kw)

    ntable.append = flaky_append
    ev = ch.notify("Test", "PING", k=1)
    assert state["n"] == 2  # retried
    got = ch.read()
    assert [e["type"] for e in got] == ["PING"]
    assert got[0]["id"] == ev["id"]
