"""Integration: a MIXED multi-collection MongoDB change stream parsed
ONCE and routed by MultiTableEngine into per-collection sink tables —
the reference's whole-database capture deployment (every included
collection → its own topic/sink), in lake form: one scan, one parse,
per-table fences."""

from pyspark.sql import functions as F

from sparkcdc.apply import envelopes_to_changes, reduce_last_write_wins
from sparkcdc.engine import EngineConfig
from sparkcdc.lake import LakeTable
from sparkcdc.multitable import MultiTableEngine
from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
from sparkcdc.sources.mongo import (
    change_stream_to_envelopes,
    events_to_change_stream_docs,
)

EVENT_FIELDS = [("user_id", "long"), ("event_type", "string"),
                ("value", "double"), ("props", "string")]


def _mixed_stream(spark, events):
    """Change-stream docs whose collection splits by user parity, parsed
    ONCE with no collection filter — the multi-collection wire."""
    docs_a = events_to_change_stream_docs(
        events.filter(F.col("user_id") % 2 == 0), coll="events_a")
    docs_b = events_to_change_stream_docs(
        events.filter(F.col("user_id") % 2 == 1), coll="events_b")
    return change_stream_to_envelopes(
        docs_a.unionAll(docs_b), EVENT_ROW_FIELDS, "user_id"
    )


def test_mixed_change_stream_routes_per_collection(spark, tmp_root):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    env = _mixed_stream(spark, events)

    tables = {
        f"app.{n}": LakeTable.create(
            spark, tmp_root, n, fields=EVENT_FIELDS,
            key_cols=["user_id"], n_buckets=4)
        for n in ("events_a", "events_b")
    }
    mte = MultiTableEngine(spark, tables, EngineConfig())
    mx = int(env.agg(F.max("offset")).first()[0])
    res = mte.apply_batch(env, batch_id=0, offsets={"lo": 0, "next": mx + 1})
    assert not res["app.events_a"]["skipped"]
    assert not res["app.events_b"]["skipped"]

    # each sink holds exactly its parity's LWW survivors
    row_cols = [n for n, _ in EVENT_ROW_FIELDS]
    want = reduce_last_write_wins(
        envelopes_to_changes(env, row_cols), ["user_id"]
    ).filter("_op != 'd'")
    for name, parity in (("app.events_a", 0), ("app.events_b", 1)):
        got = sorted(tuple(r) for r in mte.state(name)
                     .select(*row_cols).collect())
        exp = sorted(tuple(r) for r in want
                     .filter(F.col("user_id") % 2 == parity)
                     .select(*row_cols).collect())
        assert got == exp, name
        assert len(got) > 0, name

    # per-table fencing: redelivering the same batch id is a no-op on both
    res2 = mte.apply_batch(env, batch_id=0, offsets={"lo": 0, "next": mx + 1})
    assert res2["app.events_a"]["skipped"]
    assert res2["app.events_b"]["skipped"]
