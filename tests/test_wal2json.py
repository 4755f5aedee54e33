"""wal2json v2 wire-format source adapter (S6).

Fixture lines follow the public wal2json format-version-2 line protocol
(one JSON object per line; I/U/D carry columns/identity arrays, B/C are
transaction boundaries, T is truncate) — the shapes a real plugin with
``format-version=2, include-lsn, include-timestamp`` emits.
"""

import pytest
from pyspark.sql import functions as F

from sparkcdc.apply import envelopes_to_changes, reduce_last_write_wins
from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS, events_to_envelopes
from sparkcdc.sources.wal2json import (
    events_to_wal2json_lines,
    long_to_pg_lsn,
    pg_lsn_to_long,
    wal2json_to_envelopes,
)

@pytest.fixture(scope="module")
def events_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


FIXTURES = [
    '{"action":"B","xid":563,"lsn":"0/16B2D80","timestamp":"2024-01-01 00:00:00.000001+00"}',
    '{"action":"I","schema":"app","table":"events","lsn":"0/16B2E10",'
    '"timestamp":"2024-01-01 00:00:00.000001+00","xid":563,"columns":['
    '{"name":"user_id","type":"bigint","value":42},'
    '{"name":"event_type","type":"text","value":"signup"},'
    '{"name":"value","type":"double precision","value":1.5},'
    '{"name":"props","type":"text","value":"a \\"quoted\\" str"}]}',
    '{"action":"U","schema":"app","table":"events","lsn":"0/16B2E50",'
    '"timestamp":"2024-01-01 00:00:01.000001+00","xid":564,"columns":['
    '{"name":"user_id","type":"bigint","value":42},'
    '{"name":"event_type","type":"text","value":"click"},'
    '{"name":"value","type":"double precision","value":null},'
    '{"name":"props","type":"text","value":"p"}],'
    '"identity":[{"name":"user_id","type":"bigint","value":42}]}',
    '{"action":"D","schema":"app","table":"events","lsn":"0/16B2E90",'
    '"timestamp":"2024-01-01 00:00:02.000001+00","xid":565,'
    '"identity":[{"name":"user_id","type":"bigint","value":42}]}',
    '{"action":"I","schema":"app","table":"other","lsn":"0/16B2EA0",'
    '"timestamp":"2024-01-01 00:00:02.000001+00","xid":566,'
    '"columns":[{"name":"user_id","type":"bigint","value":7}]}',
    '{"action":"T","schema":"app","table":"events","lsn":"0/16B2EB0",'
    '"timestamp":"2024-01-01 00:00:03.000001+00","xid":567}',
    '{"action":"C","xid":563,"lsn":"0/16B2F00","timestamp":"2024-01-01 00:00:03.000001+00"}',
]


@pytest.fixture
def fixture_env(spark):
    lines = spark.createDataFrame([(l,) for l in FIXTURES], "value string")
    return wal2json_to_envelopes(
        lines, EVENT_ROW_FIELDS, ["user_id"], table="events"
    )


def test_ops_and_boundary_filtering(fixture_env):
    """I/U/D/T map to c/u/d/t; B/C lines and other tables' changes drop."""
    rows = fixture_env.orderBy("offset").collect()
    assert [r["op"] for r in rows] == ["c", "u", "d", "t"]


def test_values_types_and_nulls(fixture_env):
    """Unquoted JSON numbers, explicit nulls and escaped strings all land
    typed; U's before comes from identity (key only, rest NULL); D has no
    after."""
    ins, upd, dele, _ = fixture_env.orderBy("offset").collect()
    assert ins["after"]["value"] == 1.5
    assert ins["after"]["props"] == 'a "quoted" str'
    assert ins["before"] is None
    assert upd["after"]["value"] is None
    assert upd["before"]["user_id"] == 42 and upd["before"]["props"] is None
    assert dele["after"] is None and dele["before"]["user_id"] == 42


def test_offsets_transaction_and_ts(fixture_env):
    """offset = (lsn_hi<<32)|lsn_lo; xid → transaction.id; pg timestamptz
    text → epoch ms."""
    ins = fixture_env.orderBy("offset").first()
    assert ins["offset"] == 0x16B2E10
    assert ins["source"]["file"] == "0/16B2E10"
    assert ins["transaction"]["id"] == "563"
    assert ins["ts_ms"] == 1704067200000


def test_lsn_roundtrip_with_high_word(spark):
    lsn = (
        spark.range(1)
        .select(pg_lsn_to_long(F.lit("A3/16B2D88")).alias("l"))
        .first()["l"]
    )
    assert lsn == (0xA3 << 32) | 0x16B2D88
    back = (
        spark.createDataFrame([(lsn,)], "o long")
        .select(long_to_pg_lsn("o").alias("s"))
        .first()["s"]
    )
    assert back == "A3/16B2D88"


def test_generator_parser_roundtrip_matches_direct_adapter(spark, events_df):
    """events → wal2json lines → envelopes must equal the direct
    events_to_envelopes adapter on op/offset/ts/before/after (the two
    sources are interchangeable inputs to the engine)."""
    parsed = wal2json_to_envelopes(
        events_to_wal2json_lines(events_df),
        EVENT_ROW_FIELDS, ["user_id"], table="events",
    )
    direct = events_to_envelopes(events_df)
    cols = ["op", "offset", "ts_ms", "before", "after"]
    a, b = parsed.select(cols), direct.select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_wal2json_reduce_matches_events_reduce(spark, events_df):
    """End-to-end: LWW over the wal2json stream equals LWW over the
    events table directly."""
    row_cols = [n for n, _ in EVENT_ROW_FIELDS]
    env = wal2json_to_envelopes(
        events_to_wal2json_lines(events_df),
        EVENT_ROW_FIELDS, ["user_id"], table="events",
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
    env = wal2json_to_envelopes(
        events_to_wal2json_lines(events_df),
        EVENT_ROW_FIELDS, ["user_id"], table="events",
    )
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_wal2json_file_stream_matches_batch_apply(spark, tmp_path, events_df):
    """S6 end-to-end streaming: wal2json lines on disk → readStream.text →
    pure-Catalyst parse → the engine's streaming reduce→MERGE path. Final
    lake state must equal a one-shot batch apply of the same envelopes.
    (The replication-slot swap is the readStream source line only.)"""
    import os

    from sparkcdc.engine import CdcEngine, EngineConfig
    from sparkcdc.lake import LakeTable
    from sparkcdc.streaming import start_stream

    fields = [
        ("user_id", "long"), ("event_type", "string"),
        ("value", "double"), ("props", "string"),
    ]
    wire_dir = os.path.join(str(tmp_path), "wal")
    events_to_wal2json_lines(events_df).write.mode("overwrite").text(wire_dir)

    def mk(name):
        t = LakeTable.create(
            spark, os.path.join(str(tmp_path), name), "t",
            fields=fields, key_cols=["user_id"], n_buckets=4,
        )
        return CdcEngine(spark, t, EngineConfig(n_parts=4))

    eng = mk("lake_stream")
    raw = spark.readStream.text(wire_dir)
    env_stream = wal2json_to_envelopes(
        raw, EVENT_ROW_FIELDS, ["user_id"], table="events"
    )
    q = start_stream(eng, env_stream, available_now=True)
    q.awaitTermination(120)

    eng2 = mk("lake_batch")
    env = wal2json_to_envelopes(
        events_to_wal2json_lines(events_df),
        EVENT_ROW_FIELDS, ["user_id"], table="events",
    )
    eng2._apply_batch(env, batch_id=1, kind="replay", offsets=None, mode="mor")

    def state(t):
        return sorted(tuple(r) for r in t.read().collect())

    assert state(eng.table) == state(eng2.table)
    assert len(state(eng.table)) > 0


def test_wal2json_failure_handling(spark):
    mixed = spark.createDataFrame(
        [(l,) for l in FIXTURES] + [("{truncated wal2json li",)], ["value"]
    )
    fields = [("user_id", "long"), ("event_type", "string")]
    # skip (default): malformed line falls out with the non-DML actions
    n_default = wal2json_to_envelopes(mixed, fields, ["user_id"]).count()
    n_clean = wal2json_to_envelopes(
        spark.createDataFrame([(l,) for l in FIXTURES], ["value"]),
        fields, ["user_id"],
    ).count()
    assert n_default == n_clean
    # fail: FAILFAST aborts on the malformed line...
    with pytest.raises(Exception) as ei:
        wal2json_to_envelopes(
            mixed, fields, ["user_id"], failure_handling="fail"
        ).collect()
    assert "alformed" in str(ei.value) or "FAILFAST" in str(ei.value)
    # ...but well-formed non-DML lines (B/C markers) pass FAILFAST fine
    wal2json_to_envelopes(
        spark.createDataFrame([(l,) for l in FIXTURES], ["value"]),
        fields, ["user_id"], failure_handling="fail",
    ).collect()
    with pytest.raises(ValueError):
        wal2json_to_envelopes(mixed, fields, ["user_id"], failure_handling="x")


# ---------------------------------------------------------------------------
# Logical decoding messages (action "M")
# ---------------------------------------------------------------------------


def test_wal2json_messages_parse_and_filter(spark):
    from sparkcdc.sources.wal2json import wal2json_messages

    lines = spark.createDataFrame([
        ('{"action":"M","transactional":true,"prefix":"app.audit",'
         '"content":"{\\"k\\":1}","lsn":"0/10","xid":7,'
         '"timestamp":"2024-01-01 00:00:00.000001+00"}',),
        ('{"action":"M","transactional":false,"prefix":"other",'
         '"content":"x","lsn":"0/20","xid":8,'
         '"timestamp":"2024-01-01 00:00:00.000002+00"}',),
        # DML and boundary lines must not leak into the message stream
        ('{"action":"I","schema":"app","table":"t","lsn":"0/30","xid":9,'
         '"timestamp":"2024-01-01 00:00:00.000003+00","columns":[]}',),
        ('{"action":"B","xid":10,"lsn":"0/40"}',),
    ], "value string")
    allm = wal2json_messages(lines).collect()
    assert {r.prefix for r in allm} == {"app.audit", "other"}
    one = wal2json_messages(lines, prefix="app.audit").collect()
    assert len(one) == 1
    r = one[0]
    assert r.offset == 0x10 and r.xid == 7 and r.transactional is True
    assert r.content == '{"k":1}'


def test_decode_message_content_roundtrip(spark):
    from sparkcdc.sources.wal2json import (
        decode_message_content,
        events_to_wal2json_message_lines,
        wal2json_messages,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    lines = events_to_wal2json_message_lines(events, prefix="app.audit")
    msgs = wal2json_messages(lines, prefix="app.audit")
    out = decode_message_content(
        msgs, "user_id bigint, event_type string, value double, props string"
    )
    assert out.count() == events.count()
    got = {r.offset: r for r in out.collect()}
    want = {r.event_id: r for r in events.collect()}
    assert set(got) == set(want)
    k = min(got)
    assert got[k].user_id == want[k].user_id
    assert got[k].event_type == want[k].event_type
    assert got[k].value == want[k].value
    # no Python UDF, no Exchange in the decode plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_read_to_insert_transform(spark):
    from sparkcdc.envelope import snapshot_events
    from sparkcdc.transforms import TRANSFORMS

    src = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, body string"
    )
    env = snapshot_events(src, row_cols=["id", "body"], key_cols=["id"])
    assert {r.op for r in env.select("op").distinct().collect()} == {"r"}
    out = TRANSFORMS["ReadToInsertEvent"]()(env)
    assert {r.op for r in out.select("op").distinct().collect()} == {"c"}
    # snapshot provenance preserved by default
    assert out.select(F.col("source")["snapshot"]).first()[0] == "true"


def test_decode_message_content_rejects_metadata_collision(spark):
    import pytest as _pytest

    from sparkcdc.sources.wal2json import decode_message_content

    msgs = spark.createDataFrame(
        [], "offset long, lsn string, xid long, ts_ms long, "
            "transactional boolean, prefix string, content string"
    )
    with _pytest.raises(ValueError, match="collide"):
        decode_message_content(msgs, "offset long, amount double")
