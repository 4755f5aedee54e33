"""Tests: envelope JSON/CloudEvents serialization + vectorized parse
(T16), dead-letter quarantine (K8), signal-triggered incremental snapshot
(S9+S13)."""

import json
import os

from pyspark.sql import functions as F

from sparkcdc.engine import CdcEngine, EngineConfig, default_engine
from sparkcdc.envelope import REPO_ROW_FIELDS, cdc_events
from sparkcdc.signals import FileSignalChannel, SignalProcessor
from sparkcdc.transforms import (
    envelope_to_cloudevents,
    envelope_to_json,
    parse_envelope_json,
    parse_envelope_json_arrow,
)


def test_json_roundtrip_lossless(spark):
    env = cdc_events(spark, 500, n_keys=50, tombstones=True)
    wire = envelope_to_json(env)
    back = parse_envelope_json(wire, REPO_ROW_FIELDS)
    # to_json drops null fields; compare on a normalized projection
    proj = lambda df: sorted(  # noqa: E731
        df.select(
            "op", "offset", "tombstone",
            F.coalesce(F.col("after.repo"), F.col("before.repo")).alias("r"),
            F.coalesce(F.col("after.content"), F.lit("")).alias("c"),
            F.col("source.pos").alias("p"),
        ).collect()
    )
    assert proj(env) == proj(back)


def test_arrow_parse_matches_jvm_parse(spark):
    env = cdc_events(spark, 200, n_keys=20)
    wire = envelope_to_json(env)
    jvm = parse_envelope_json(wire, REPO_ROW_FIELDS)
    arrow = parse_envelope_json_arrow(wire, REPO_ROW_FIELDS)
    key = lambda df: sorted(  # noqa: E731
        df.select("op", "offset", F.col("after.content").alias("c")).collect()
    )
    assert key(jvm) == key(arrow)


def test_cloudevents_wrapper(spark):
    env = cdc_events(spark, 10, n_keys=5)
    ce = [json.loads(r["value"]) for r in envelope_to_cloudevents(env).collect()]
    for e in ce:
        assert e["specversion"] == "1.0"
        assert e["type"].endswith("DataChangeEvent")
        assert "data" in e and "op" in e["data"]


def test_cloudevents_json_roundtrip(spark):
    from sparkcdc.transforms import parse_cloudevents

    env = cdc_events(spark, 200, n_keys=20, tombstones=True)
    back = parse_cloudevents(envelope_to_cloudevents(env), REPO_ROW_FIELDS)
    proj = lambda df: sorted(  # noqa: E731
        df.select(
            "op", "offset", "tombstone",
            F.coalesce(F.col("after.repo"), F.col("before.repo")).alias("r"),
            F.coalesce(F.col("after.content"), F.lit("")).alias("c"),
        ).collect()
    )
    assert proj(env) == proj(back)


def test_cloudevents_avro_payload_roundtrip(spark):
    """CloudEvents with an Avro-binary payload (data_base64 +
    datacontenttype, CloudEventsConverter.java:89's non-JSON data format):
    the full envelope survives the composition, including before-image
    nullity."""
    from sparkcdc.transforms import parse_cloudevents

    env = cdc_events(spark, 200, n_keys=20, tombstones=True)
    wire = envelope_to_cloudevents(env, data_format="avro")
    one = json.loads(wire.first()["value"])
    assert one["datacontenttype"] == "application/avro"
    assert "data_base64" in one and "data" not in one
    back = parse_cloudevents(wire, REPO_ROW_FIELDS, data_format="avro")
    proj = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select(
            "op", "ts_ms", "offset", "part_id", "tombstone",
            F.col("after.repo"), F.col("after.content"),
            F.col("before.path"), F.col("source.pos"),
        ).collect()
    )
    assert proj(env) == proj(back)
    assert all(
        r.before is None
        for r in back.filter("op = 'c'").select("before").collect()
    )


def test_dlq_quarantines_malformed(spark, tmp_root):
    eng = default_engine(
        spark, tmp_root, n_buckets=4,
        config=EngineConfig(batch_size=1000, n_keys=50, n_parts=4,
                            dlq_enabled=True),
    )
    env = cdc_events(spark, 1000, n_keys=50)
    # corrupt 2 events: unknown op; missing key on a data event
    bad_op = env.filter(F.col("offset") == 10).withColumn("op", F.lit("zz"))
    null_key = env.filter(F.col("offset") == 20).withColumn(
        "after", F.lit(None).cast(env.schema["after"].dataType)
    ).withColumn("before", F.lit(None).cast(env.schema["before"].dataType))
    good = env.filter(~F.col("offset").isin(10, 20))
    mixed = good.unionByName(bad_op).unionByName(null_key)
    eng._apply_batch(mixed, batch_id=0, kind="replay", offsets={"lo": 0, "next": 1000})
    dlq = eng.dlq()
    assert dlq is not None
    rows = dlq.collect()
    assert {r["offset"] for r in rows} == {10, 20}
    # clean events still applied
    assert eng.table.read().count() > 0


def test_signal_triggered_incremental_snapshot(spark, tmp_root):
    sig_path = os.path.join(tmp_root, "signals.jsonl")
    eng = default_engine(
        spark, os.path.join(tmp_root, "lake"), n_buckets=4,
        config=EngineConfig(batch_size=2000, n_keys=100, n_parts=4),
        )
    eng.signals = SignalProcessor([FileSignalChannel(sig_path)])
    eng.replay(2000)
    n_before = eng.table.read().count()
    # a backfill source with 20 brand-new keys outside the generator space
    backfill = spark.range(20).select(
        F.format_string("org/backfill-%02d", F.col("id")).alias("repo"),
        F.lit("src/x.py").alias("path"),
        F.lit("c" * 40).alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("bf:"), F.col("id")).alias("content"),
    )
    with open(sig_path, "w") as fh:
        fh.write(json.dumps({
            "id": "s1", "type": "execute-snapshot",
            "data": {"window_lo": 0, "window_hi": 2000},
        }) + "\n")
    acted = eng.process_signals(source_for_snapshot=lambda req: backfill)
    assert len(acted) == 1
    assert eng.table.read().count() == n_before + 20
    # resume point untouched by the snapshot batch
    assert eng.committed_offset() == 2000
    # a second drain does nothing (signal consumed)
    assert eng.process_signals(source_for_snapshot=lambda req: backfill) == []


def test_notifications_emitted(spark, tmp_root):
    """Lifecycle notifications for snapshot phases (reference
    core/pipeline/notification/ parity)."""
    from sparkcdc.envelope import cdc_events

    eng = default_engine(
        spark, tmp_root, n_buckets=4,
        config=EngineConfig(batch_size=500, n_keys=50, snapshot_mode="initial"),
    )
    src = cdc_events(spark, 300, n_keys=50).filter("op != 'd'").select(
        "after.*").dropDuplicates(["repo", "path"])
    eng.run(500, source_df=src)
    kinds = [(n["aggregate_type"], n["type"]) for n in eng.notifications.read()]
    assert ("Initial Snapshot", "STARTED") in kinds
    assert ("Initial Snapshot", "COMPLETED") in kinds


def test_engine_reselect_unavailable_columns(spark, tmp_root):
    """T15 as an engine post-processor: update events carrying the TOAST
    unavailable-value marker are refilled from the sink's current state
    before the merge (ReselectColumnsPostProcessor.java:51)."""
    from pyspark.sql import functions as F
    from sparkcdc.engine import CdcEngine, EngineConfig
    from sparkcdc.envelope import envelope_schema, row_struct
    from sparkcdc.lake import LakeTable
    from sparkcdc.transforms.reselect import UNAVAILABLE

    t = LakeTable.create(
        spark, tmp_root, "t",
        fields=[("repo", "string"), ("path", "string"), ("commit", "string"),
                ("lang", "string"), ("content", "string")],
        key_cols=["repo", "path"], n_buckets=4,
    )
    eng = CdcEngine(spark, t, EngineConfig(
        n_keys=10, n_parts=2,
        reselect_unavailable_columns=["content"],
    ))

    def env_of(rows):
        return spark.createDataFrame(rows, envelope_schema())

    # batch 0: real content
    eng._apply_batch(env_of([
        ("c", 1, None, ("r", "p", "c1", "py", "BIG_VALUE"),
         None, None, 0, 0, False),
    ]), batch_id=0, kind="replay", offsets={"lo": 0, "next": 1})
    # batch 1: update whose content is the unavailable marker (TOAST)
    eng._apply_batch(env_of([
        ("u", 2, ("r", "p", None, None, None),
         ("r", "p", "c2", "py", UNAVAILABLE), None, None, 0, 1, False),
    ]), batch_id=1, kind="replay", offsets={"lo": 1, "next": 2})
    row = t.read().first()
    assert row["commit"] == "c2"           # updated field applied
    assert row["content"] == "BIG_VALUE"   # marker refilled from state


def test_parse_failure_handling_modes(spark):
    """event.processing.failure.handling.mode at the deserialization
    boundary: fail raises executor-side, skip drops the line, keep passes
    the null parse through; corrupt_json_records feeds the DLQ."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from sparkcdc.transforms import corrupt_json_records, parse_envelope_json

    env = cdc_events(spark, 20, n_keys=5)
    good = envelope_to_json(env)
    bad = spark.createDataFrame([("{not valid json",)], ["value"])
    mixed = good.unionByName(bad)

    kept = parse_envelope_json(mixed, failure_handling="keep")
    assert kept.count() == 21
    assert kept.filter(F.col("op").isNull() & F.col("offset").isNull()).count() == 1

    skipped = parse_envelope_json(mixed, failure_handling="skip")
    assert skipped.count() == 20
    assert skipped.filter(F.col("op").isNull()).count() == 0

    # .collect(), not .count(): count() prunes the parse projection away
    with pytest.raises(Exception) as ei:
        parse_envelope_json(mixed, failure_handling="fail").collect()
    assert "alformed" in str(ei.value) or "FAILFAST" in str(ei.value)
    # clean input sails through fail mode
    assert len(parse_envelope_json(good, failure_handling="fail").collect()) == 20

    quarantined = corrupt_json_records(mixed)
    assert [r.raw for r in quarantined.collect()] == ["{not valid json"]

    with pytest.raises(ValueError):
        parse_envelope_json(mixed, failure_handling="bogus")


def test_cloudevents_extension_attributes(spark):
    """iodebezium* extension attributes (CloudEventsConverter re-emits
    envelope metadata as CE extension attributes) on BOTH payload formats."""
    env = cdc_events(spark, 20, n_keys=5)
    for fmt in ("json", "avro"):
        one = json.loads(
            envelope_to_cloudevents(env, data_format=fmt).first()["value"]
        )
        assert one["iodebeziumop"] in ("c", "u", "d")
        assert one["iodebeziumtable"] == "source_code_repos"
        assert one["iodebeziumtsms"] == str(one.get("iodebeziumtsms") and int(one["iodebeziumtsms"]))
        assert "iodebeziumsnapshot" in one


def test_table_notification_channel(spark, tmp_root):
    """Outbound mirror of the table signal channel: lifecycle notifications
    land in a keyless lake table and read back in order."""
    from sparkcdc.envelope import cdc_events
    from sparkcdc.lake import LakeTable
    from sparkcdc.notifications import TableNotificationChannel

    ntable = LakeTable.create(
        spark, tmp_root, "_notifications",
        fields=TableNotificationChannel.FIELDS, key_cols=[], n_buckets=2,
    )
    eng = default_engine(
        spark, os.path.join(tmp_root, "lake"), n_buckets=4,
        config=EngineConfig(batch_size=500, n_keys=50, snapshot_mode="initial"),
    )
    eng.notifications = TableNotificationChannel(spark, ntable)
    src = cdc_events(spark, 300, n_keys=50).filter("op != 'd'").select(
        "after.*").dropDuplicates(["repo", "path"])
    eng.run(500, source_df=src)
    kinds = [(n["aggregate_type"], n["type"]) for n in eng.notifications.read()]
    assert ("Initial Snapshot", "STARTED") in kinds
    assert ("Initial Snapshot", "COMPLETED") in kinds
    # notifications are plain queryable lake state
    assert ntable.read().filter(F.col("type") == "COMPLETED").count() >= 1


def test_parse_skip_drops_null_wire_values(spark):
    """Review fix: NULL wire values (Kafka tombstone values) are dropped
    in skip mode instead of passing through as all-null envelopes."""
    env = cdc_events(spark, 5, n_keys=3)
    mixed = envelope_to_json(env).unionByName(
        spark.createDataFrame([(None,)], "value string")
    )
    assert parse_envelope_json(mixed, failure_handling="skip").count() == 5
    kept = parse_envelope_json(mixed, failure_handling="keep")
    assert kept.count() == 6  # keep mode preserves the null row
