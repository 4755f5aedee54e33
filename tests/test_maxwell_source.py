"""MySQL binlog wire-format source adapter (Maxwell JSON lines).

Fixture lines follow Maxwell's daemon's public data format (one JSON
object per row change; ``old`` carries only the changed columns of an
update; bootstrap-* are the snapshot rows/control lines; DDL lines have
no row data) — the shapes a real tailer with
``output_binlog_position=true`` emits.
"""

import pytest
from pyspark.sql import functions as F

from sparkcdc.apply import envelopes_to_changes, reduce_last_write_wins
from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS, events_to_envelopes
from sparkcdc.sources.maxwell import (
    binlog_pos_to_long,
    events_to_maxwell_lines,
    long_to_binlog_pos,
    maxwell_to_envelopes,
)


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


FIXTURES = [
    # bootstrap control + snapshot row (Maxwell's initial snapshot)
    '{"database":"app","table":"events","type":"bootstrap-start",'
    '"ts":1477053200}',
    '{"database":"app","table":"events","type":"bootstrap-insert",'
    '"ts":1477053201,"position":"master.000006:100",'
    '"data":{"user_id":7,"event_type":"signup","value":0.5,"props":"seed"}}',
    '{"database":"app","table":"events","type":"bootstrap-complete",'
    '"ts":1477053202}',
    # stream: insert / update / delete on user 42
    '{"database":"app","table":"events","type":"insert","ts":1477053217,'
    '"xid":23396,"commit":true,"position":"master.000006:800911",'
    '"server_id":23042,"data":{"user_id":42,"event_type":"signup",'
    '"value":1.5,"props":"a \\"quoted\\" str"}}',
    # old: value changed from 9.0; props changed FROM NULL (ships as
    # "props":null — present key, null value); event_type NOT in old
    '{"database":"app","table":"events","type":"update","ts":1477053218,'
    '"xid":23397,"commit":true,"position":"master.000006:801000",'
    '"data":{"user_id":42,"event_type":"click","value":2.0,"props":"p"},'
    '"old":{"value":9.0,"props":null}}',
    '{"database":"app","table":"events","type":"delete","ts":1477053219,'
    '"xid":23398,"commit":true,"position":"master.000007:10",'
    '"gtid":"0-1-23398",'
    '"data":{"user_id":42,"event_type":"click","value":2.0,"props":"p"}}',
    # other table / other database / DDL line: all filtered
    '{"database":"app","table":"other","type":"insert","ts":1477053220,'
    '"position":"master.000007:20","data":{"user_id":1}}',
    '{"database":"shop","table":"events","type":"insert","ts":1477053221,'
    '"position":"master.000007:30","data":{"user_id":2}}',
    '{"database":"app","table":"events","type":"table-alter",'
    '"ts":1477053222,"sql":"ALTER TABLE events ADD COLUMN note text"}',
]


@pytest.fixture
def fixture_env(spark):
    lines = spark.createDataFrame([(l,) for l in FIXTURES], "value string")
    return maxwell_to_envelopes(
        lines, EVENT_ROW_FIELDS, ["user_id"], database="app", table="events"
    )


def test_ops_filtering_and_snapshot_marker(fixture_env):
    """insert/update/delete/bootstrap-insert map to c/u/d/r; control +
    DDL lines and other tables/databases drop; bootstrap rows carry
    snapshot='true'."""
    rows = fixture_env.orderBy("offset").collect()
    assert [r["op"] for r in rows] == ["r", "c", "u", "d"]
    assert [r["source"]["snapshot"] for r in rows] == [
        "true", "false", "false", "false"
    ]


def test_before_image_presence_merge(fixture_env):
    """update before = data overlaid with old's PRESENT keys: value from
    old (9.0), props from old even though its value is null (changed
    FROM NULL), event_type/user_id from data (absent in old)."""
    upd = fixture_env.filter(F.col("op") == "u").first()
    assert upd["before"]["value"] == 9.0
    assert upd["before"]["props"] is None
    assert upd["before"]["event_type"] == "click"
    assert upd["before"]["user_id"] == 42
    assert upd["after"]["value"] == 2.0 and upd["after"]["props"] == "p"
    ins = fixture_env.filter(F.col("op") == "c").first()
    assert ins["before"] is None
    assert ins["after"]["props"] == 'a "quoted" str'
    dele = fixture_env.filter(F.col("op") == "d").first()
    assert dele["after"] is None and dele["before"]["props"] == "p"


def test_offsets_transaction_gtid_and_ts(fixture_env):
    """offset = (file suffix << 32) | pos, ordered across the 000006 →
    000007 rotation; xid → transaction.id; gtid rides in source.gtid;
    ts (seconds) → ts_ms."""
    rows = fixture_env.orderBy("offset").collect()
    offs = [r["offset"] for r in rows]
    assert offs == sorted(offs)
    ins = rows[1]
    assert ins["offset"] == (6 << 32) | 800911
    assert ins["source"]["file"] == "master.000006"
    assert ins["transaction"]["id"] == "23396"
    assert ins["ts_ms"] == 1477053217000
    dele = rows[3]
    assert dele["offset"] == (7 << 32) | 10
    assert dele["source"]["gtid"] == "0-1-23398"
    boot = rows[0]
    assert boot["transaction"] is None


def test_binlog_pos_roundtrip(spark):
    pos = (
        spark.range(1)
        .select(binlog_pos_to_long(F.lit("mysql-bin.000123:999999999")).alias("p"))
        .first()["p"]
    )
    assert pos == (123 << 32) | 999999999
    back = (
        spark.createDataFrame([(pos,)], "o long")
        .select(long_to_binlog_pos("o", basename="mysql-bin").alias("s"))
        .first()["s"]
    )
    assert back == "mysql-bin.000123:999999999"


def test_maxwell_reduce_matches_events_reduce(spark, events_df):
    """End-to-end: LWW over the Maxwell stream equals LWW over the
    events table directly (offsets are order-preserving through the
    binlog-position packing, so the winner per key is the same).

    Delete winners compare on (key, _op) only: Maxwell ships the FULL
    deleted row in ``data`` while the events adapter's delete
    before-image carries just the key — both are valid delete images,
    and a delete's non-key payload never reaches a sink anyway."""
    row_cols = [n for n, _ in EVENT_ROW_FIELDS]

    def reduced(env):
        r = reduce_last_write_wins(
            envelopes_to_changes(env, row_cols), ["user_id"]
        )
        keep = F.col("_op") != "d"
        return r.select(
            "user_id",
            *[F.when(keep, F.col(c)).alias(c)
              for c in ("event_type", "value", "props")],
            "_op",
        )

    red = reduced(maxwell_to_envelopes(
        events_to_maxwell_lines(events_df),
        EVENT_ROW_FIELDS, ["user_id"], database="app", table="events",
    ))
    direct = reduced(events_to_envelopes(events_df))
    assert red.exceptAll(direct).count() == 0
    assert direct.exceptAll(red).count() == 0


def test_emitter_old_is_changed_columns_only(spark, events_df):
    """The emitter's update lines carry old={'value': prev} only — the
    parse side must presence-merge props/event_type from data."""
    upd = maxwell_to_envelopes(
        events_to_maxwell_lines(events_df),
        EVENT_ROW_FIELDS, ["user_id"], database="app", table="events",
    ).filter(F.col("op") == "u").first()
    assert upd["before"]["value"] == upd["after"]["value"] + 1.0
    assert upd["before"]["props"] == upd["after"]["props"]
    assert upd["before"]["event_type"] == upd["after"]["event_type"]


def test_parse_plan_is_single_stage_no_shuffle(spark, events_df):
    """The parse is a pure projection: no Exchange, no Python UDF."""
    env = maxwell_to_envelopes(
        events_to_maxwell_lines(events_df),
        EVENT_ROW_FIELDS, ["user_id"], database="app", table="events",
    )
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_maxwell_failure_handling(spark):
    mixed = spark.createDataFrame(
        [(l,) for l in FIXTURES] + [("{truncated maxwell li",)], ["value"]
    )
    fields = [("user_id", "long"), ("event_type", "string")]
    n_default = maxwell_to_envelopes(mixed, fields, ["user_id"]).count()
    n_clean = maxwell_to_envelopes(
        spark.createDataFrame([(l,) for l in FIXTURES], ["value"]),
        fields, ["user_id"],
    ).count()
    assert n_default == n_clean
    with pytest.raises(Exception) as ei:
        maxwell_to_envelopes(
            mixed, fields, ["user_id"], failure_handling="fail"
        ).collect()
    assert "alformed" in str(ei.value) or "FAILFAST" in str(ei.value)
    # well-formed control/DDL lines pass FAILFAST fine and are filtered
    maxwell_to_envelopes(
        spark.createDataFrame([(l,) for l in FIXTURES], ["value"]),
        fields, ["user_id"], failure_handling="fail",
    ).collect()
    with pytest.raises(ValueError):
        maxwell_to_envelopes(mixed, fields, ["user_id"], failure_handling="x")
