"""MongoDB change-stream wire-format source adapter (S7).

Fixture lines follow the public change-stream event shape (relaxed
extended JSON: operationType, clusterTime $timestamp, ns, documentKey,
fullDocument / fullDocumentBeforeChange) — what a ``watch()`` tailer
ships to files/Kafka."""

import pytest
from pyspark.sql import functions as F

from sparkcdc.apply import envelopes_to_changes, reduce_last_write_wins
from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS, events_to_envelopes
from sparkcdc.sources.mongo import (
    change_stream_to_envelopes,
    cluster_time_to_long,
    events_to_change_stream_docs,
    long_to_cluster_time,
)


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


FIXTURES = [
    # insert: full document, no before
    '{"_id":{"_data":"8265AA01"},"operationType":"insert",'
    '"clusterTime":{"$timestamp":{"t":1700000000,"i":1}},'
    '"ns":{"db":"app","coll":"events"},"documentKey":{"_id":42},'
    '"fullDocument":{"user_id":42,"event_type":"signup","value":1.5,'
    '"props":"a \\"quoted\\" str"}}',
    # update (updateLookup): full post-image + updateDescription
    '{"_id":{"_data":"8265AA02"},"operationType":"update",'
    '"clusterTime":{"$timestamp":{"t":1700000001,"i":1}},'
    '"ns":{"db":"app","coll":"events"},"documentKey":{"_id":42},'
    '"fullDocument":{"user_id":42,"event_type":"click","value":null,'
    '"props":"p"},'
    '"updateDescription":{"updatedFields":{"event_type":"click"},'
    '"removedFields":[]}}',
    # replace with a pre-image
    '{"_id":{"_data":"8265AA03"},"operationType":"replace",'
    '"clusterTime":{"$timestamp":{"t":1700000002,"i":1}},'
    '"ns":{"db":"app","coll":"events"},"documentKey":{"_id":42},'
    '"fullDocument":{"user_id":42,"event_type":"view","value":2.0,'
    '"props":"q"},'
    '"fullDocumentBeforeChange":{"user_id":42,"event_type":"click",'
    '"value":null,"props":"p"}}',
    # delete: documentKey only
    '{"_id":{"_data":"8265AA04"},"operationType":"delete",'
    '"clusterTime":{"$timestamp":{"t":1700000003,"i":1}},'
    '"ns":{"db":"app","coll":"events"},"documentKey":{"_id":42}}',
    # other collection: filtered by collection=
    '{"_id":{"_data":"8265AA05"},"operationType":"insert",'
    '"clusterTime":{"$timestamp":{"t":1700000004,"i":1}},'
    '"ns":{"db":"app","coll":"other"},"documentKey":{"_id":7},'
    '"fullDocument":{"user_id":7}}',
    # stream-control events: always filtered
    '{"_id":{"_data":"8265AA06"},"operationType":"drop",'
    '"clusterTime":{"$timestamp":{"t":1700000005,"i":1}},'
    '"ns":{"db":"app","coll":"events"}}',
    '{"_id":{"_data":"8265AA07"},"operationType":"invalidate",'
    '"clusterTime":{"$timestamp":{"t":1700000006,"i":1}}}',
]


@pytest.fixture
def fixture_env(spark):
    lines = spark.createDataFrame([(l,) for l in FIXTURES], "value string")
    return change_stream_to_envelopes(
        lines, EVENT_ROW_FIELDS, "user_id", collection="events"
    )


def test_ops_and_control_event_filtering(fixture_env):
    """insert/update/replace/delete → c/u/u/d; drop/invalidate and other
    collections' changes drop."""
    rows = fixture_env.orderBy("offset").collect()
    assert [r["op"] for r in rows] == ["c", "u", "u", "d"]


def test_values_preimages_and_nulls(fixture_env):
    ins, upd, rep, dele = fixture_env.orderBy("offset").collect()
    assert ins["after"]["value"] == 1.5
    assert ins["after"]["props"] == 'a "quoted" str'
    assert ins["before"] is None
    # update without pre-image: before is the key-only row
    assert upd["after"]["value"] is None
    assert upd["before"]["user_id"] == 42 and upd["before"]["props"] is None
    # replace WITH pre-image: before is the real prior document
    assert rep["before"]["event_type"] == "click" and rep["before"]["props"] == "p"
    # delete: no after, key-only before
    assert dele["after"] is None and dele["before"]["user_id"] == 42


def test_offsets_token_and_ts(fixture_env):
    """offset = (clusterTime.t<<32)|i; resume token carried in
    source.gtid/file; ts_ms = t*1000."""
    ins = fixture_env.orderBy("offset").first()
    assert ins["offset"] == (1700000000 << 32) | 1
    assert ins["source"]["gtid"] == "8265AA01"
    assert ins["source"]["file"] == "8265AA01"
    assert ins["ts_ms"] == 1700000000000


def test_cluster_time_codec_roundtrip(spark):
    off = (
        spark.range(1)
        .select(cluster_time_to_long(F.lit(1700000123), F.lit(77)).alias("o"))
        .first()["o"]
    )
    assert off == (1700000123 << 32) | 77
    t, i = long_to_cluster_time(F.lit(off))
    row = spark.range(1).select(t.alias("t"), i.alias("i")).first()
    assert (row["t"], row["i"]) == (1700000123, 77)


def test_generator_parser_matches_direct_adapter(spark, events_df):
    """events → change-stream docs → envelopes must equal the direct
    events_to_envelopes adapter on op/before/after, in the same total
    order (offsets differ by codec — packed clusterTime vs raw event_id
    — but must order identically)."""
    parsed = change_stream_to_envelopes(
        events_to_change_stream_docs(events_df),
        EVENT_ROW_FIELDS, "user_id", collection="events",
    )
    direct = events_to_envelopes(events_df)
    a = [
        (r["op"], r["after"]) for r in
        parsed.select("offset", "op", "after").orderBy("offset").collect()
    ]
    b = [
        (r["op"], r["after"]) for r in
        direct.select("offset", "op", "after").orderBy("offset").collect()
    ]
    assert a == b


def test_change_stream_reduce_matches_events_reduce(spark, events_df):
    """End-to-end: LWW over the change stream equals LWW over the events
    table directly."""
    row_cols = [n for n, _ in EVENT_ROW_FIELDS]
    env = change_stream_to_envelopes(
        events_to_change_stream_docs(events_df),
        EVENT_ROW_FIELDS, "user_id", collection="events",
    )
    red = reduce_last_write_wins(
        envelopes_to_changes(env, row_cols), ["user_id"]
    ).select("user_id", "event_type", "value", "props", "_op")
    direct = reduce_last_write_wins(
        envelopes_to_changes(events_to_envelopes(events_df), row_cols),
        ["user_id"],
    ).select("user_id", "event_type", "value", "props", "_op")
    assert red.exceptAll(direct).count() == 0
    assert direct.exceptAll(red).count() == 0


def test_parse_plan_is_single_stage_no_shuffle(spark, events_df):
    """The parse is a pure projection: no Exchange, no Python UDF."""
    env = change_stream_to_envelopes(
        events_to_change_stream_docs(events_df),
        EVENT_ROW_FIELDS, "user_id", collection="events",
    )
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_failfast_and_bad_config(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="id_field"):
        change_stream_to_envelopes(
            spark.createDataFrame([("x",)], "value string"),
            EVENT_ROW_FIELDS, "nope",
        )
    with _pt.raises(ValueError, match="failure.handling"):
        change_stream_to_envelopes(
            spark.createDataFrame([("x",)], "value string"),
            EVENT_ROW_FIELDS, "user_id", failure_handling="wat",
        )
    # skip (default): a malformed line parses to an all-null struct whose
    # NULL operationType the op filter drops — good lines survive
    mixed = spark.createDataFrame(
        [("{not json",), (FIXTURES[0],)], "value string")
    ok = change_stream_to_envelopes(
        mixed, EVENT_ROW_FIELDS, "user_id").collect()
    assert [r["op"] for r in ok] == ["c"]
    # fail: FAILFAST aborts the batch on the malformed line
    with _pt.raises(Exception, match="(?i)malformed|FAILFAST|JSON"):
        change_stream_to_envelopes(
            mixed, EVENT_ROW_FIELDS, "user_id", failure_handling="fail",
        ).collect()
