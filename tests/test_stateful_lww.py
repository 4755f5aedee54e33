"""applyInPandasWithState per-key LWW materialization: semantics equal
the batch reduce, state survives across micro-batches, offset-fenced
against redelivery."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sparkcdc.streaming import stateful_lww_stream
from sparkcdc.transforms.serialize import envelope_to_json, parse_envelope_json

ROW_FIELDS = None  # default repo-row fields from serialize module


def _env_rows(spark, events):
    """events: list of (op, user_id, event_type, value, offset) -> envelope
    frame in the events-adapter row shape."""
    from pyspark.sql import types as T

    fields = [
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ]
    from sparkcdc.envelope import envelope_schema

    rows = []
    for op, uid, et, val, off in events:
        row = (uid, et, val, "p")
        before = (uid, None, None, None) if op in ("u", "d") else None
        after = row if op != "d" else None
        rows.append((op, off, before, after, None, None, 0, off, False))
    return spark.createDataFrame(rows, envelope_schema(fields)), fields


def test_stateful_lww_matches_batch_reduce(spark, tmp_path):
    from sparkcdc.apply import envelopes_to_changes, reduce_last_write_wins

    events = [
        ("c", 1, "signup", 1.0, 0),
        ("u", 1, "click", 2.0, 3),
        ("u", 1, "view", 9.0, 2),     # lower offset — must lose
        ("c", 2, "signup", 5.0, 1),
        ("d", 2, None, None, 4),      # tombstone
        ("c", 3, "signup", 7.0, 5),
    ]
    env, fields = _env_rows(spark, events)

    # serialize to a JSON-lines dir and stream it back (file source)
    wire_dir = os.path.join(str(tmp_path), "wire")
    envelope_to_json(env).write.mode("overwrite").text(wire_dir)
    raw = spark.readStream.text(wire_dir)
    stream = parse_envelope_json(raw, fields)
    out = stateful_lww_stream(stream, fields, ["user_id"])

    sink = os.path.join(str(tmp_path), "out")

    def collect_batch(df, batch_id):
        df.write.mode("append").json(sink)

    q = (out.writeStream.foreachBatch(collect_batch)
         .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["user_id"]: r for r in
           (json.loads(l) for f in os.listdir(sink) if f.endswith(".json")
            for l in open(os.path.join(sink, f)))}
    # batch reduce over the same envelopes = ground truth
    red = reduce_last_write_wins(
        envelopes_to_changes(env, [n for n, _ in fields]), ["user_id"]
    )
    want = {r.user_id: r for r in red.collect()}
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["_op"] == w["_op"]
        assert g["offset"] == w["offset"]
        if w["_op"] != "d":
            assert g["event_type"] == w["event_type"]
            assert g["value"] == w["value"]


def test_stateful_lww_state_survives_batches(spark, tmp_path):
    """Second wave in new files: state from wave 1 still fences stale
    offsets and updates flow per key."""
    wire_dir = os.path.join(str(tmp_path), "wire")
    os.makedirs(wire_dir)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    sink = os.path.join(str(tmp_path), "out")

    def run_wave(events, fname):
        env, fields = _env_rows(spark, events)
        from sparkcdc.transforms.serialize import envelope_to_json as tj

        pdf = tj(env).toPandas()
        with open(os.path.join(wire_dir, fname), "w") as f:
            f.write("\n".join(pdf["value"]) + "\n")
        raw = spark.readStream.text(wire_dir)
        stream = parse_envelope_json(raw, fields)
        out = stateful_lww_stream(stream, fields, ["user_id"])
        q = (out.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").json(sink))
             .option("checkpointLocation", ckpt)
             .outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_wave([("c", 1, "signup", 1.0, 10)], "w1.jsonl")
    # wave 2: a STALE event for key 1 (offset 5 < 10) and a fresh key
    run_wave([("u", 1, "click", 9.9, 5), ("c", 2, "signup", 2.0, 11)],
             "w2.jsonl")

    rows = [json.loads(l) for f in os.listdir(sink) if f.endswith(".json")
            for l in open(os.path.join(sink, f))]
    by_key = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
    # key 1: only the wave-1 emission; the stale update was fenced
    assert [r["offset"] for r in by_key[1]] == [10]
    assert by_key[1][0]["event_type"] == "signup"
    assert [r["offset"] for r in by_key[2]] == [11]


def test_windowed_change_metrics_watermark_drops_late(spark, tmp_path):
    """Append-mode windowed counts: wave 1 advances the watermark past
    window W; a wave-2 event inside W (too late) is dropped; W's emitted
    count stays the wave-1 truth."""
    from sparkcdc.streaming import windowed_change_metrics

    wire_dir = os.path.join(str(tmp_path), "wire")
    os.makedirs(wire_dir)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    sink = os.path.join(str(tmp_path), "out")

    BASE = 1_700_000_000_000  # ms

    def run_wave(events, fname):
        env, fields = _env_rows(spark, events)
        from sparkcdc.transforms.serialize import envelope_to_json as tj

        pdf = tj(env).toPandas()
        with open(os.path.join(wire_dir, fname), "w") as f:
            f.write("\n".join(pdf["value"]) + "\n")
        raw = spark.readStream.text(wire_dir)
        stream = parse_envelope_json(raw, fields).withColumn(
            "ts_ms", F.lit(BASE) + F.col("offset") * 1000
        )
        out = windowed_change_metrics(
            stream, window="1 minute", watermark="2 minutes", by_op=False
        )
        q = (out.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").json(sink))
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # wave 1: 3 events in minute 0, then one far ahead (minute 10) that
    # advances the watermark to ~minute 8 — finalizing minute-0's window
    run_wave([("c", 1, "signup", 1.0, 0),
              ("u", 1, "click", 1.0, 10),
              ("c", 2, "signup", 1.0, 20),
              ("u", 2, "view", 1.0, 600)], "w1.jsonl")
    # wave 2: a LATE event back in minute 0 — beyond the watermark
    run_wave([("u", 1, "late", 9.9, 30)], "w2.jsonl")

    rows = [json.loads(l) for f in os.listdir(sink) if f.endswith(".json")
            for l in open(os.path.join(sink, f))]
    assert any(r["events"] == 3 for r in rows), rows
    # the late event must not re-emit or bump the finalized window
    assert not any(r["events"] == 4 for r in rows), rows
    assert not any(r["events"] == 1 and r["max_offset"] == 30
                   for r in rows), rows
