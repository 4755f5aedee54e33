"""Oracle LogMiner redo-row source adapter (S8).

Fixture lines carry the V$LOGMINER_CONTENTS projection a tailer ships;
SQL_REDO strings follow LogMiner's canonical single-row DML shape
(double-quoted identifiers, quoted literals with '' escaping, IS NULL in
WHERE images, TO_DATE/TO_TIMESTAMP wrappers)."""

import json

import pytest
from pyspark.sql import functions as F

from sparkcdc.apply import envelopes_to_changes, reduce_last_write_wins
from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS, events_to_envelopes
from sparkcdc.sources.logminer import (
    events_to_logminer_rows,
    logminer_to_envelopes,
)


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _line(scn, op, redo, owner="APP", table="EVENTS"):
    return json.dumps({
        "scn": scn, "operation": op, "seg_owner": owner,
        "table_name": table, "timestamp": "2024-01-01 00:00:00",
        "xid": "0A000B00C3040000", "row_id": "AAAR5eAAFAAAAFDAAA",
        "sql_redo": redo,
    })


FIXTURES = [
    # insert: comma and doubled quote INSIDE a value must not split the list
    _line(101, "INSERT",
          'insert into "APP"."EVENTS"("USER_ID","EVENT_TYPE","VALUE","PROPS")'
          " values ('42','signup','1.5','a, ''quoted'' str');"),
    # update: literal ' where ' inside a SET value; WHERE carries full old
    # row incl. an IS NULL old column (FULL supplemental logging)
    _line(102, "UPDATE",
          'update "APP"."EVENTS" set "EVENT_TYPE" = \'click\', '
          '"PROPS" = \'x where y\' where "USER_ID" = \'42\' and '
          '"EVENT_TYPE" = \'signup\' and "VALUE" IS NULL and '
          '"PROPS" = \'p\';'),
    # delete: PK-only WHERE (minimal supplemental logging)
    _line(103, "DELETE",
          'delete from "APP"."EVENTS" where "USER_ID" = \'42\';'),
    # other table: filtered by table=
    _line(104, "INSERT",
          'insert into "APP"."OTHER"("USER_ID") values (\'7\');',
          table="OTHER"),
    # control operations: always filtered
    _line(105, "COMMIT", "commit;"),
    _line(106, "DDL", 'alter table "APP"."EVENTS" add "C" number;'),
]


@pytest.fixture
def fixture_env(spark):
    lines = spark.createDataFrame([(l,) for l in FIXTURES], "value string")
    return logminer_to_envelopes(
        lines, EVENT_ROW_FIELDS, ["user_id"], table="EVENTS", owner="APP"
    )


def test_ops_and_control_filtering(fixture_env):
    rows = fixture_env.orderBy("offset").collect()
    assert [r["op"] for r in rows] == ["c", "u", "d"]
    assert [r["offset"] for r in rows] == [101, 102, 103]


def test_insert_values_with_commas_and_escapes(fixture_env):
    ins = fixture_env.orderBy("offset").first()
    assert ins["after"]["user_id"] == 42
    assert ins["after"]["value"] == 1.5
    assert ins["after"]["props"] == "a, 'quoted' str"
    assert ins["before"] is None


def test_update_set_where_images(fixture_env):
    """after = WHERE old row overridden by SET; a ' where ' inside a SET
    value must not truncate the SET sequence; IS NULL old value lands
    NULL."""
    _, upd, _ = fixture_env.orderBy("offset").collect()
    assert upd["after"]["event_type"] == "click"
    assert upd["after"]["props"] == "x where y"   # SET wins
    assert upd["after"]["user_id"] == 42          # carried from WHERE
    assert upd["after"]["value"] is None          # IS NULL old, not SET
    assert upd["before"]["event_type"] == "signup"
    assert upd["before"]["props"] == "p"
    assert upd["before"]["value"] is None


def test_delete_key_only_before(fixture_env):
    dele = fixture_env.orderBy("offset").collect()[-1]
    assert dele["after"] is None
    assert dele["before"]["user_id"] == 42
    assert dele["before"]["event_type"] is None


def test_scn_xid_rowid_mapping(fixture_env):
    ins = fixture_env.orderBy("offset").first()
    assert ins["offset"] == 101                    # SCN is the offset
    assert ins["transaction"]["id"] == "0A000B00C3040000"
    assert ins["source"]["file"] == "AAAR5eAAFAAAAFDAAA"
    assert ins["ts_ms"] == 1704067200000


def test_to_date_wrapper_unquotes(spark):
    from pyspark.sql import types as T

    rf = [("user_id", T.LongType()), ("created", T.TimestampType())]
    line = _line(
        200, "INSERT",
        'insert into "APP"."EVENTS"("USER_ID","CREATED") values '
        "('1',TO_TIMESTAMP('2024-06-01 12:30:45', "
        "'YYYY-MM-DD HH24:MI:SS'));")
    env = logminer_to_envelopes(
        spark.createDataFrame([(line,)], "value string"), rf, ["user_id"]
    )
    row = env.first()
    assert str(row["after"]["created"]) == "2024-06-01 12:30:45"


def test_generator_parser_matches_direct_adapter(spark, events_df):
    """events → logminer rows → envelopes equals the direct adapter on
    (op, offset, after) — SCN = event_id so even offsets line up."""
    parsed = logminer_to_envelopes(
        events_to_logminer_rows(events_df),
        EVENT_ROW_FIELDS, ["user_id"], table="EVENTS", owner="APP",
    )
    direct = events_to_envelopes(events_df)
    cols = ["op", "offset", "after"]
    a, b = parsed.select(cols), direct.select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_logminer_reduce_matches_events_reduce(spark, events_df):
    row_cols = [n for n, _ in EVENT_ROW_FIELDS]
    env = logminer_to_envelopes(
        events_to_logminer_rows(events_df),
        EVENT_ROW_FIELDS, ["user_id"], table="EVENTS", owner="APP",
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
    env = logminer_to_envelopes(
        events_to_logminer_rows(events_df),
        EVENT_ROW_FIELDS, ["user_id"], table="EVENTS", owner="APP",
    )
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_unparseable_dml_skips_or_fails_never_null_keys(spark):
    """A DML row whose redo misses the canonical grammar (ROWID-only
    predicate, non-atom literal like EMPTY_CLOB()) must not emerge as a
    null-key envelope: skip drops it, fail aborts the batch."""
    bad = [
        _line(301, "DELETE",
              'delete from "APP"."EVENTS" where ROWID = \'AAAR5exyz\';'),
        _line(302, "INSERT",
              'insert into "APP"."EVENTS"("USER_ID","PROPS") values '
              "('1',EMPTY_CLOB());"),
        _line(303, "INSERT",
              'insert into "APP"."EVENTS"("USER_ID","EVENT_TYPE",'
              '"VALUE","PROPS") values (\'5\',\'signup\',\'1\',\'ok\');'),
    ]
    lines = spark.createDataFrame([(l,) for l in bad], "value string")
    ok = logminer_to_envelopes(
        lines, EVENT_ROW_FIELDS, ["user_id"], table="EVENTS").collect()
    assert [r["offset"] for r in ok] == [303]  # bad rows dropped, no crash
    with pytest.raises(Exception, match="unparseable LogMiner redo"):
        logminer_to_envelopes(
            lines, EVENT_ROW_FIELDS, ["user_id"], table="EVENTS",
            failure_handling="fail",
        ).collect()


def test_set_to_null_nulls_the_column(spark):
    """FULL supplemental logging: an explicit SET col = NULL must null
    the after-image column, not resurrect the WHERE old value."""
    line = _line(
        400, "UPDATE",
        'update "APP"."EVENTS" set "PROPS" = NULL where '
        '"USER_ID" = \'42\' and "PROPS" = \'x\';')
    env = logminer_to_envelopes(
        spark.createDataFrame([(line,)], "value string"),
        EVENT_ROW_FIELDS, ["user_id"])
    row = env.first()
    assert row["after"]["props"] is None
    assert row["before"]["props"] == "x"


def test_to_date_text_inside_value_not_corrupted(spark):
    """A string value merely CONTAINING 'TO_DATE(' must pass through
    verbatim — the wrapper match is anchored to the literal start."""
    line = _line(
        401, "INSERT",
        'insert into "APP"."EVENTS"("USER_ID","PROPS") values '
        "('1','note: TO_DATE(''2024-01-01'') used');")
    env = logminer_to_envelopes(
        spark.createDataFrame([(line,)], "value string"),
        EVENT_ROW_FIELDS, ["user_id"])
    assert env.first()["after"]["props"] == "note: TO_DATE('2024-01-01') used"


# -- property: arbitrary strings survive the emit -> parse wire roundtrip --

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

#: adversarial props: quote/comma/paren/keyword shrapnel that has to ride
#: inside the redo-SQL literal grammar without splitting any match
_props = st.one_of(
    st.none(),
    st.text(alphabet=list("abc'\",()=; "), min_size=0, max_size=20),
    st.sampled_from([
        "x where y",
        "a, 'quoted' b",
        "TO_DATE('2024-01-01','YYYY') wrapper text",
        "p'' and \"Q\" IS NULL",
        "values ('7')",
        "';' insert into",
        " and ",
    ]),
)

_events = st.lists(
    st.tuples(
        st.sampled_from(["signup", "click", "error"]),
        st.sampled_from([None, 0.0, 1.5, -2.25, 1e10]),
        _props,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_events)
def test_wire_roundtrip_preserves_values(spark, events):
    """events -> canonical redo SQL -> pure-Catalyst parse must return
    every row (nothing silently dropped by parse_ok) with op-correct
    images and byte-identical props — including quotes, commas, 'where',
    'IS NULL', and TO_DATE( text inside the quoted literals."""
    rows = [
        (i + 1, "2024-01-01 00:00:00", 100 + i, et, val, props)
        for i, (et, val, props) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    env = logminer_to_envelopes(
        events_to_logminer_rows(ev), EVENT_ROW_FIELDS, ["user_id"],
        table="EVENTS", owner="APP",
    )
    got = {r["offset"]: r for r in env.collect()}
    assert len(got) == len(events)  # parse_ok must keep every canonical row
    for i, (et, val, props) in enumerate(events):
        r = got[i + 1]
        uid = 100 + i
        if et == "signup":  # INSERT
            assert r["op"] == "c" and r["before"] is None
            img = r["after"]
        elif et == "error":  # DELETE: PK-only before image
            assert r["op"] == "d" and r["after"] is None
            assert r["before"]["user_id"] == uid
            continue
        else:  # UPDATE: after = old PK row overridden by SET
            assert r["op"] == "u"
            assert r["before"]["user_id"] == uid
            img = r["after"]
        assert img["user_id"] == uid
        assert img["event_type"] == et
        assert img["value"] == val
        # Oracle renders '' for empty strings, which reads back as empty
        assert img["props"] == props
