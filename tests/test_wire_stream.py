"""Streaming ingestion of SHIPPED wire formats (wire_envelope_stream):
the tailer-writes-files deployment — Maxwell / wal2json / change-stream
/ LogMiner lines land in files, Spark streams and parses them, and
``start_stream`` applies them through the same fenced micro-batch path
as serialized-envelope ingestion (test_wire_ingest).

For each format the streamed final state must equal a one-shot batch
apply of the SAME files through the same parser — proving the parsers
really are stateless projections that a micro-batch boundary can cut
anywhere (reference: the streaming phase of each connector,
e.g. MySqlStreamingChangeEventSource / PostgresStreamingChangeEventSource,
which likewise share the event pipeline with snapshot/batch reads)."""

import os

import pytest
from pyspark.sql import functions as F

from sparkcdc.engine import CdcEngine, EngineConfig
from sparkcdc.lake import LakeTable
from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
from sparkcdc.sources.logminer import (
    events_to_logminer_rows,
    logminer_to_envelopes,
)
from sparkcdc.sources.maxwell import events_to_maxwell_lines, maxwell_to_envelopes
from sparkcdc.sources.mongo import (
    change_stream_to_envelopes,
    events_to_change_stream_docs,
)
from sparkcdc.sources.wal2json import events_to_wal2json_lines, wal2json_to_envelopes
from sparkcdc.streaming import start_stream, wire_envelope_stream

EVENT_FIELDS = [("user_id", "long"), ("event_type", "string"),
                ("value", "double"), ("props", "string")]
ROW_COLS = [n for n, _ in EVENT_ROW_FIELDS]

# emit: events table -> one-string-column wire lines (the tailer's role);
# parse: the batch-side reference parse of the same lines;
# kw: the passthrough args wire_envelope_stream forwards to the parser
FORMATS = {
    "maxwell": dict(
        emit=events_to_maxwell_lines,
        parse=lambda lines: maxwell_to_envelopes(
            lines, EVENT_ROW_FIELDS, ["user_id"],
            database="app", table="events"),
        kw=dict(database="app", source_table="events"),
    ),
    "wal2json": dict(
        emit=events_to_wal2json_lines,
        parse=lambda lines: wal2json_to_envelopes(
            lines, EVENT_ROW_FIELDS, ["user_id"], table="events"),
        kw=dict(source_table="events"),
    ),
    "mongo": dict(
        emit=events_to_change_stream_docs,
        parse=lambda lines: change_stream_to_envelopes(
            lines, EVENT_ROW_FIELDS, "user_id", collection="events"),
        kw=dict(source_table="events"),
    ),
    "logminer": dict(
        emit=events_to_logminer_rows,
        parse=lambda lines: logminer_to_envelopes(
            lines, EVENT_ROW_FIELDS, ["user_id"], table="EVENTS"),
        kw=dict(source_table="EVENTS"),
    ),
}


def _mk_engine(spark, root, name):
    t = LakeTable.create(
        spark, root, name, fields=EVENT_FIELDS, key_cols=["user_id"],
        n_buckets=4,
    )
    return CdcEngine(spark, t, EngineConfig())


def _state(table):
    return sorted(tuple(r) for r in table.read().select(*ROW_COLS).collect())


@pytest.mark.parametrize("fmt", sorted(FORMATS))
def test_wire_stream_matches_batch_apply(spark, tmp_root, fmt):
    spec = FORMATS[fmt]
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    wire_dir = os.path.join(tmp_root, "wire")
    spec["emit"](events).write.text(wire_dir)

    # streamed apply: file stream -> wire parse -> fenced micro-batches
    eng = _mk_engine(spark, tmp_root, f"lake_stream_{fmt}")
    stream = wire_envelope_stream(
        eng, wire_dir, fmt, EVENT_ROW_FIELDS, ["user_id"], **spec["kw"])
    assert stream.isStreaming
    q = start_stream(eng, stream, available_now=True)
    q.awaitTermination(180)

    # reference: one-shot batch apply of the same files, same parser
    ref = _mk_engine(spark, tmp_root, f"lake_batch_{fmt}")
    env = spec["parse"](spark.read.text(wire_dir))
    mx = int(env.agg(F.max("offset")).first()[0])
    ref._apply_batch(env, batch_id=0, kind="replay",
                     offsets={"lo": 0, "next": mx + 1})

    got = _state(eng.table)
    assert got == _state(ref.table)
    assert len(got) > 0
    # the stream committed real data offsets under its fence namespace
    m = eng.table.manifest()
    assert m.summary["offsets"]["next"] == mx + 1
    assert m.summary["last_batch"].get("engine:stream", -1) >= 0


def test_sqlserver_wire_stream_refused(spark, tmp_root):
    """sqlserver's 3/4 pairing aggregates across lines; a tailer can split
    the pair across micro-batches, so the streaming front-end refuses it
    and points at the batch ingest path (whose boundary-transaction
    watermark handles exactly that split)."""
    eng = _mk_engine(spark, tmp_root, "lake")
    with pytest.raises(ValueError, match="sqlserver"):
        wire_envelope_stream(
            eng, tmp_root, "sqlserver", EVENT_ROW_FIELDS, ["user_id"])
    with pytest.raises(ValueError, match="unknown wire format"):
        wire_envelope_stream(
            eng, tmp_root, "nope", EVENT_ROW_FIELDS, ["user_id"])
