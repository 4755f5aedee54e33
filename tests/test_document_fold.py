"""Field-level LWW fold of delta-only Mongo change streams
(transforms/document.py) against hand-built ground truth."""

import json

import pytest
from pyspark.sql import types as T

from sparkcdc.transforms.document import reduce_document_patches

ROW_FIELDS = [
    ("user_id", T.LongType()),
    ("name", T.StringType()),
    ("score", T.DoubleType()),
]


def _line(op, key, t, i, full=None, sets=None, removes=None):
    doc = {
        "_id": {"_data": f"82{t:08x}{i:08x}"},
        "operationType": op,
        "clusterTime": {"$timestamp": {"t": t, "i": i}},
        "ns": {"db": "app", "coll": "users"},
        "documentKey": {"_id": key},
    }
    if full is not None:
        doc["fullDocument"] = full
    if sets is not None or removes is not None:
        doc["updateDescription"] = {
            "updatedFields": sets or {},
            "removedFields": removes or [],
        }
    return json.dumps(doc)


def _fold(spark, lines):
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    return {
        r.user_id: r
        for r in reduce_document_patches(df, ROW_FIELDS, "user_id").collect()
    }


def test_patch_fold_set_remove_order(spark):
    lines = [
        _line("insert", 1, 100, 0,
              full={"user_id": 1, "name": "ann", "score": 1.5}),
        # $set score, then $unset name, then $set name again
        _line("update", 1, 100, 1, sets={"score": "2.5"}),
        _line("update", 1, 100, 2, removes=["name"]),
        _line("update", 1, 100, 3, sets={"name": "anne"}),
        # key 2: name removed AFTER its last set -> stays gone
        _line("insert", 2, 100, 0,
              full={"user_id": 2, "name": "bob", "score": 9.0}),
        _line("update", 2, 100, 5, removes=["name"]),
    ]
    out = _fold(spark, lines)
    assert out[1].name == "anne" and out[1].score == 2.5
    assert out[2].name is None and out[2].score == 9.0


def test_patch_fold_barriers(spark):
    lines = [
        _line("insert", 1, 100, 0,
              full={"user_id": 1, "name": "ann", "score": 1.0}),
        _line("update", 1, 100, 1, sets={"score": "5.0"}),
        # replace barrier: resets the doc — the earlier patch must NOT leak
        _line("replace", 1, 100, 2,
              full={"user_id": 1, "name": "a2", "score": 3.0}),
        # delete barrier kills key 2 even though it had patches
        _line("insert", 2, 100, 0,
              full={"user_id": 2, "name": "bob", "score": 9.0}),
        _line("update", 2, 100, 1, sets={"score": "10.0"}),
        _line("delete", 2, 100, 2),
        # patches after a delete barrier (no re-insert) apply to nothing
        _line("update", 2, 100, 3, sets={"score": "11.0"}),
        # key 3: update with no insert ever -> no row
        _line("update", 3, 100, 0, sets={"score": "1.0"}),
    ]
    out = _fold(spark, lines)
    assert set(out) == {1}
    assert out[1].name == "a2" and out[1].score == 3.0


def test_patch_fold_from_delta_feed(spark):
    """events → delta-mode change-stream docs → fold; spot-check one user
    against a python replay of the same rule."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.mongo import events_to_change_stream_docs

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    docs = events_to_change_stream_docs(events, capture_mode="delta")
    # delta mode: no fullDocument on updates
    assert docs.filter(
        docs.value.contains('"operationType":"update"')
        & docs.value.contains('"fullDocument"')
    ).count() == 0

    out = reduce_document_patches(docs, EVENT_ROW_FIELDS, "user_id")
    rows = {r.user_id: r for r in out.collect()}

    ev = sorted(events.collect(), key=lambda e: e.event_id)
    state: dict[int, dict | None] = {}
    barrier: dict[int, int] = {}
    for e in ev:
        if e.event_type == "signup":
            state[e.user_id] = {
                "event_type": e.event_type, "value": e.value,
                "props": e.props,
            }
        elif e.event_type == "error":
            state[e.user_id] = None
        elif e.user_id in state and state[e.user_id] is not None:
            state[e.user_id]["event_type"] = e.event_type
            state[e.user_id]["value"] = e.value
    live = {k: v for k, v in state.items() if v is not None}
    assert set(rows) == set(live)
    for k, v in live.items():
        assert rows[k].event_type == v["event_type"]
        assert rows[k].value == pytest.approx(v["value"])
        assert rows[k].props == v["props"]
