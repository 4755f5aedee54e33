"""SQL Server CDC change-table wire-format source adapter.

Fixture lines follow the public change-table row shape
(``cdc.fn_cdc_get_all_changes_*``: __$start_lsn, __$seqval,
__$operation 1/2/3/4, __$update_mask, captured columns) — what a
change-table tailer ships to files/Kafka."""

import pytest
from pyspark.sql import functions as F

from sparkcdc.apply import envelopes_to_changes, reduce_last_write_wins
from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS, events_to_envelopes
from sparkcdc.sources.sqlserver import (
    change_table_to_envelopes,
    events_to_change_table_rows,
    lsn_to_long,
    long_to_lsn,
)


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _row(start, seq, op, data, ci="dbo_events", tms=1700000000000):
    import json

    return json.dumps({
        "start_lsn": start, "seqval": seq, "operation": op,
        "update_mask": "0f", "capture_instance": ci,
        "commit_time": tms, "data": data,
    })


R42 = {"user_id": 42, "event_type": "signup", "value": 1.5, "props": "a"}
R42B = {"user_id": 42, "event_type": "click", "value": 2.0, "props": "b"}

FIXTURES = [
    # tx1: plain insert
    _row("00000025:00000010:0001", "00000025:00000010:0001", 2, R42),
    # tx2: one update = the 3/4 pair sharing a seqval
    _row("00000025:00000010:0002", "00000025:0000000f:0001", 3, R42),
    _row("00000025:00000010:0002", "00000025:0000000f:0001", 4, R42B),
    # tx3: plain delete (before = the deleted row image)
    _row("00000025:00000010:0003", "00000025:00000010:0003", 1, R42B),
    # other capture instance: filtered by capture_instance=
    _row("00000025:00000010:0004", "00000025:00000010:0004", 2,
         {"user_id": 1}, ci="dbo_other"),
    # tx4: insert then update of the SAME key in one transaction →
    # collapses to the net change: a 'c' carrying the final image
    _row("00000025:00000011:0001", "00000025:0000000e:0001", 2,
         {"user_id": 99, "event_type": "signup", "value": 1.0, "props": None}),
    _row("00000025:00000011:0001", "00000025:0000000e:0002", 3,
         {"user_id": 99, "event_type": "signup", "value": 1.0, "props": None}),
    _row("00000025:00000011:0001", "00000025:0000000e:0002", 4,
         {"user_id": 99, "event_type": "click", "value": 5.0, "props": "z"}),
    # tx5: primary-key-changing update (before key 7, after key 8)
    _row("00000025:00000012:0001", "00000025:0000000d:0001", 3,
         {"user_id": 7, "event_type": "view", "value": 3.0, "props": "p7"}),
    _row("00000025:00000012:0001", "00000025:0000000d:0001", 4,
         {"user_id": 8, "event_type": "view", "value": 3.0, "props": "p7"}),
    # tx6: a stray update-before whose after half was lost → 'd' of the key
    _row("00000025:00000013:0001", "00000025:0000000c:0001", 3,
         {"user_id": 13, "event_type": "view", "value": 9.0, "props": None}),
    # tx7: insert then delete of the SAME key in one transaction — the
    # key must come out dead ('d'), not resurrect as a 'c'
    _row("00000025:00000014:0001", "00000025:0000000b:0001", 2,
         {"user_id": 21, "event_type": "signup", "value": 1.0, "props": None}),
    _row("00000025:00000014:0001", "00000025:0000000b:0002", 1,
         {"user_id": 21, "event_type": "signup", "value": 1.0, "props": None}),
    # tx8: update pair then delete in one transaction → 'd'
    _row("00000025:00000015:0001", "00000025:0000000a:0001", 3,
         {"user_id": 22, "event_type": "view", "value": 1.0, "props": None}),
    _row("00000025:00000015:0001", "00000025:0000000a:0001", 4,
         {"user_id": 22, "event_type": "click", "value": 2.0, "props": None}),
    _row("00000025:00000015:0001", "00000025:0000000a:0002", 1,
         {"user_id": 22, "event_type": "click", "value": 2.0, "props": None}),
]


@pytest.fixture
def fixture_env(spark):
    lines = spark.createDataFrame([(l,) for l in FIXTURES], "value string")
    return change_table_to_envelopes(
        lines, EVENT_ROW_FIELDS, ["user_id"],
        capture_instance="dbo_events",
    )


def test_ops_pairing_and_filtering(fixture_env):
    """insert/update-pair/delete → c/u/d; the other capture instance
    drops; intra-tx churn collapses; PK change splits into d + u."""
    rows = fixture_env.orderBy("offset", "part_id").collect()
    got = [(r["offset"] & 0xFFFFFFFF, r["op"],
            (r["after"] or r["before"])["user_id"]) for r in rows]
    assert got == [
        ((0x10 << 16) | 1, "c", 42),
        ((0x10 << 16) | 2, "u", 42),
        ((0x10 << 16) | 3, "d", 42),
        ((0x11 << 16) | 1, "c", 99),      # insert+update collapsed
        ((0x12 << 16) | 1, "d", 7),       # PK change: old key deleted
        ((0x12 << 16) | 1, "u", 8),       # PK change: new key upserted
        ((0x13 << 16) | 1, "d", 13),      # lone op-3
        ((0x14 << 16) | 1, "d", 21),      # insert-then-delete: dead
        ((0x15 << 16) | 1, "d", 22),      # update-then-delete: dead
    ]
    # delete-after-write groups must not carry a live after-image
    dead = [r for r in rows if r["op"] == "d"]
    assert all(r["after"] is None for r in dead)


def test_update_pair_images(fixture_env):
    upd = fixture_env.filter(
        (F.col("op") == "u") & (F.col("after")["user_id"] == 42)
    ).first()
    assert upd["before"]["event_type"] == "signup"
    assert upd["before"]["props"] == "a"
    assert upd["after"]["event_type"] == "click"
    assert upd["after"]["value"] == 2.0


def test_intra_tx_collapse_keeps_final_image(fixture_env):
    ins = fixture_env.filter(F.col("offset") == (0x25 << 48) | (0x11 << 16) | 1).first()
    assert ins["op"] == "c"
    assert ins["after"]["event_type"] == "click" and ins["after"]["value"] == 5.0


def test_delete_carries_row_image_and_lsn_fidelity(fixture_env):
    dele = fixture_env.filter(
        (F.col("op") == "d") & (F.col("before")["user_id"] == 42)
    ).first()
    assert dele["after"] is None
    assert dele["before"]["event_type"] == "click"
    assert dele["source"]["file"] == "00000025:00000010:0003"
    assert dele["source"]["gtid"] == "00000025:00000010:0003"
    assert dele["ts_ms"] == 1700000000000


def test_lsn_codec_roundtrip(spark):
    cases = [
        "00000025:00000010:0001",
        "00007fff:ffffffff:ffff",
        "00000000:00000000:0000",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "lsn string").select(
        "lsn", long_to_lsn(lsn_to_long(F.col("lsn"))).alias("back"),
        lsn_to_long(F.col("lsn")).alias("off"),
    )
    for r in df.collect():
        assert r["back"] == r["lsn"]
    # order preservation across the packed parts
    offs = [r["off"] for r in df.orderBy("lsn").collect()]
    assert offs == sorted(offs)
    # VLF bits above 2^15 truncate (documented horizon)
    hi = spark.range(1).select(
        lsn_to_long(F.lit("00010025:00000010:0001")).alias("o")
    ).first()["o"]
    lo = spark.range(1).select(
        lsn_to_long(F.lit("00000025:00000010:0001")).alias("o")
    ).first()["o"]
    assert hi == lo


def test_generator_parser_matches_direct_adapter(spark, events_df):
    """events → change-table rows → envelopes must equal the direct
    events_to_envelopes adapter on op/after in the same total order
    (packed commit LSN = (vlf<<48)+event_id orders like event_id)."""
    parsed = change_table_to_envelopes(
        events_to_change_table_rows(events_df),
        EVENT_ROW_FIELDS, ["user_id"], capture_instance="dbo_events",
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


def test_change_table_reduce_matches_events_reduce(spark, events_df):
    """Deleted keys' non-key columns are masked before comparing: a SQL
    Server CDC delete row carries the FULL deleted image (realistic),
    the direct adapter's delete is key-only — both are dead state the
    merge discards, so only (key, _op) semantics must agree there."""
    row_cols = [n for n, _ in EVENT_ROW_FIELDS]

    def final(env):
        red = reduce_last_write_wins(
            envelopes_to_changes(env, row_cols), ["user_id"]
        )
        live = F.col("_op") != "d"
        return red.select(
            "user_id",
            F.when(live, F.col("event_type")).alias("event_type"),
            F.when(live, F.col("value")).alias("value"),
            F.when(live, F.col("props")).alias("props"),
            "_op",
        )

    red = final(change_table_to_envelopes(
        events_to_change_table_rows(events_df),
        EVENT_ROW_FIELDS, ["user_id"], capture_instance="dbo_events",
    ))
    direct = final(events_to_envelopes(events_df))
    assert red.exceptAll(direct).count() == 0
    assert direct.exceptAll(red).count() == 0


def test_parse_plan_one_exchange_no_python(spark, events_df):
    """The 3/4 pairing is ONE hash aggregation: exactly one Exchange
    (the reference's serial adjacency walk, reformulated commutative),
    and zero Python UDFs."""
    env = change_table_to_envelopes(
        events_to_change_table_rows(events_df),
        EVENT_ROW_FIELDS, ["user_id"], capture_instance="dbo_events",
    )
    plan = env._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


def test_failure_handling_validation(spark):
    lines = spark.createDataFrame([("{}",)], "value string")
    with pytest.raises(ValueError):
        change_table_to_envelopes(
            lines, EVENT_ROW_FIELDS, ["user_id"], failure_handling="bogus"
        )
    with pytest.raises(ValueError):
        change_table_to_envelopes(lines, EVENT_ROW_FIELDS, ["nope"])
