"""Transform library tests over a fixture mirroring the reference's
AbstractExtractStateTest.java:49-120 (row {id int, name string}, source
{lsn, ts_ms, db, table}, create/update/delete/tombstone records)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcdc.transforms import (
    by_logical_table_router,
    content_based_router,
    event_filter,
    extract_changed_record_state,
    extract_new_record_state,
    include_exclude_columns,
    mask_strings,
    outbox_event_router,
    partition_routing,
    reselect_columns,
    table_filter,
    timezone_converter,
    truncate_columns,
)

ROW = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
])
SRC = T.StructType([
    T.StructField("lsn", T.LongType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("db", T.StringType()),
    T.StructField("table", T.StringType()),
])
ENV = T.StructType([
    T.StructField("op", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("before", ROW),
    T.StructField("after", ROW),
    T.StructField("source", SRC),
    T.StructField("part_id", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("tombstone", T.BooleanType()),
])


def env(op, before, after, off, tomb=False, db="db", table="customers"):
    return (op, 1000 + off, before, after, (off, 1000 + off, db, table), 0, off, tomb)


@pytest.fixture(scope="module")
def fixture(spark):
    rows = [
        env("c", None, (1, "alice"), 1),
        env("u", (1, "alice"), (1, "bob"), 2),
        env("d", (1, "bob"), None, 3),
        env("d", None, None, 3, tomb=True),
        env("c", None, (2, "carol"), 4, table="customers_shard_2"),
    ]
    return spark.createDataFrame(rows, ENV)


# ---- T1 ExtractNewRecordState -------------------------------------------------

def test_unwrap_drop(fixture):
    out = extract_new_record_state("drop")(fixture)
    assert sorted(tuple(r) for r in out.collect()) == [(1, "alice"), (1, "bob"), (2, "carol")]


def test_unwrap_rewrite_adds_deleted_flag(fixture):
    out = extract_new_record_state(
        "rewrite", add_fields=["op", "ts_ms", "source.lsn"]
    )(fixture)
    assert set(out.columns) == {"id", "name", "__op", "__ts_ms", "__source_lsn", "__deleted"}
    rows = {(r.id, r.name, r["__deleted"], r["__op"]) for r in out.collect()}
    assert (1, "bob", "true", "d") in rows       # delete rewritten from before
    assert (1, "alice", "false", "c") in rows
    assert len(rows) == 4


def test_unwrap_tombstone_mode(fixture):
    out = extract_new_record_state("tombstone")(fixture)
    rows = out.collect()
    assert sum(1 for r in rows if r.id is None and r.name is None) == 1  # the delete
    assert len(rows) == 4


def test_unwrap_rewrite_with_tombstone(fixture):
    out = extract_new_record_state("rewrite-with-tombstone")(fixture)
    assert out.count() == 5
    assert out.filter(F.col("__deleted").isNull()).count() == 1  # the tombstone row


def test_unwrap_drop_fields_and_route_by(fixture):
    out = extract_new_record_state("drop", drop_fields=["name"], route_by_field="id")(fixture)
    assert set(out.columns) == {"id", "__route"}


# ---- T2 ExtractChangedRecordState ---------------------------------------------

def test_changed_record_state(fixture):
    out = extract_changed_record_state(unchanged_name="__unchanged")(fixture)
    upd = out.filter("op = 'u'").first()
    assert upd["__changed"] == ["name"]
    assert upd["__unchanged"] == ["id"]
    assert out.filter("op = 'c'").first()["__changed"] is None


# ---- T3 Filter -----------------------------------------------------------------

def test_event_filter(fixture):
    out = event_filter("op != 'd' AND after.id = 1")(fixture)
    assert out.count() == 2


# ---- T4/T5 routers --------------------------------------------------------------

def test_content_based_router(fixture):
    out = content_based_router("concat('t-', source.table)")(fixture)
    assert out.filter("__route = 't-customers'").count() == 4


def test_by_logical_table_router(fixture):
    out = by_logical_table_router(r"db\.customers(_shard_\d+)?", "db.customers_all")(fixture)
    assert out.filter("__route = 'db.customers_all'").count() == 5
    shard = out.filter("source.table = 'customers_shard_2'").first()
    assert shard["__dbz__physicalTableIdentifier"] == "db.customers_shard_2"


def test_by_logical_table_router_key_field_rewrite(fixture):
    import pytest as _pytest

    out = by_logical_table_router(
        r"db\.customers(_shard_\d+)?", "db.customers_all",
        key_field_name="shard",
        key_field_regex=r"db\.customers_shard_(\d+)",
        key_field_replacement="$1",
    )(fixture)
    shard = out.filter("source.table = 'customers_shard_2'").first()
    assert shard["shard"] == "2"
    # a value the regex doesn't match keeps the full identifier
    plain = out.filter("source.table = 'customers'").first()
    assert plain["shard"] == "db.customers"
    with _pytest.raises(ValueError, match="key.field.replacement"):
        by_logical_table_router("a", "b", key_field_regex="x")


# ---- T6 PartitionRouting ---------------------------------------------------------

def test_partition_routing(fixture):
    out = partition_routing(["after.id"], 4)(fixture)
    vals = {r.part_id for r in out.collect()}
    assert vals <= set(range(4))
    # same key -> same partition
    byid = out.filter("after.id = 1").select("part_id").distinct()
    assert byid.count() == 1


# ---- T7 Outbox -------------------------------------------------------------------

def test_outbox_router(spark):
    outbox = spark.createDataFrame(
        [("order-1", "OrderCreated", '{"total": 9}', "orders")],
        ["aggregateid", "type", "payload", "aggregatetype"],
    )
    out = outbox_event_router()(outbox)
    r = out.first()
    assert (r.key, r.event_type, r["__route"]) == ("order-1", "OrderCreated", "orders")


# ---- T9 TimezoneConverter ---------------------------------------------------------

def test_timezone_converter(spark):
    df = spark.createDataFrame([("2024-01-01 12:00:00",)], ["ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = timezone_converter("America/New_York", ["ts"])(df)
    assert str(out.first().ts) == "2024-01-01 07:00:00"


def test_timezone_converter_include_exclude_scoping(spark):
    """core/transforms/TimezoneConverter.java:67-91 rule lists: source:
    table[:field] scoping, exclude inversion, mutual exclusion."""
    import pytest
    from pyspark.sql import types as T
    from sparkcdc.envelope import envelope_schema

    RF = [("id", T.StringType()), ("created", T.TimestampType()),
          ("updated", T.TimestampType())]
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda table: (  # noqa: E731
        "u", 0, None, ("k", t0, t0),
        ("sparkcdc", "db", table, "false", None, 0, 0, None, 0),
        None, 0, 0, False)
    df = spark.createDataFrame([mk("orders"), mk("users")],
                               envelope_schema(RF))

    # include source:orders:created -> ONLY orders.created converts
    out = timezone_converter(
        "America/New_York", ["created", "updated"],
        include=["source:orders:created"],
    )(df)
    rows = {r["source"]["table"]: r for r in out.collect()}
    assert str(rows["orders"]["after"]["created"]) == "2024-01-01 07:00:00"
    assert str(rows["orders"]["after"]["updated"]) == "2024-01-01 12:00:00"
    assert str(rows["users"]["after"]["created"]) == "2024-01-01 12:00:00"

    # exclude source:orders -> everything BUT orders converts
    out = timezone_converter(
        "America/New_York", ["created"], exclude=["source:orders"],
    )(df)
    rows = {r["source"]["table"]: r for r in out.collect()}
    assert str(rows["orders"]["after"]["created"]) == "2024-01-01 12:00:00"
    assert str(rows["users"]["after"]["created"]) == "2024-01-01 07:00:00"

    # heuristic <matchname>:<field> matches source.table when present
    out = timezone_converter(
        "America/New_York", ["created"], include=["users:created"],
    )(df)
    rows = {r["source"]["table"]: r for r in out.collect()}
    assert str(rows["users"]["after"]["created"]) == "2024-01-01 07:00:00"
    assert str(rows["orders"]["after"]["created"]) == "2024-01-01 12:00:00"

    with pytest.raises(ValueError, match="mutually exclusive"):
        timezone_converter("UTC", ["x"], include=["a:b"], exclude=["c:d"])

    # NULL source.table: matches no exclude rule, so it MUST convert
    # (three-valued logic would otherwise leave it at UTC silently)
    null_row = ("u", 0, None, ("k", t0, t0),
                ("sparkcdc", "db", None, "false", None, 0, 0, None, 0),
                None, 0, 0, False)
    dfn = spark.createDataFrame([null_row], envelope_schema(RF))
    out = timezone_converter(
        "America/New_York", ["created"], exclude=["source:orders"],
    )(dfn)
    assert str(out.first()["after"]["created"]) == "2024-01-01 07:00:00"
    # ...and under include it matches no rule, so it must NOT convert
    out = timezone_converter(
        "America/New_York", ["created"], include=["source:orders"],
    )(dfn)
    assert str(out.first()["after"]["created"]) == "2024-01-01 12:00:00"


def test_timezone_converter_topic_scoping_without_source(spark):
    """Flat routed frames (no source block, topic column) keep rule
    scoping: include converts only the named topic's rows; exclude
    spares them. Regression: the gate used to be silently dropped."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [("orders", t0), ("users", t0)], ["topic", "ts"])

    out = timezone_converter(
        "America/New_York", ["ts"], include=["topic:orders:ts"],
        topic_col="topic",
    )(df)
    rows = {r["topic"]: r for r in out.collect()}
    assert str(rows["orders"]["ts"]) == "2024-01-01 07:00:00"
    assert str(rows["users"]["ts"]) == "2024-01-01 12:00:00"

    out = timezone_converter(
        "America/New_York", ["ts"], exclude=["topic:orders"],
        topic_col="topic",
    )(df)
    rows = {r["topic"]: r for r in out.collect()}
    assert str(rows["orders"]["ts"]) == "2024-01-01 12:00:00"
    assert str(rows["users"]["ts"]) == "2024-01-01 07:00:00"

    # heuristic <matchname> falls back to the topic when no source block
    out = timezone_converter(
        "America/New_York", ["ts"], include=["users:ts"], topic_col="topic",
    )(df)
    rows = {r["topic"]: r for r in out.collect()}
    assert str(rows["users"]["ts"]) == "2024-01-01 07:00:00"
    assert str(rows["orders"]["ts"]) == "2024-01-01 12:00:00"


# ---- T12/T13 mask + truncate -------------------------------------------------------

def test_mask_strings_salted_hash(fixture):
    out = mask_strings(["name"], salt="s3cr3t")(fixture)
    import hashlib
    want = hashlib.sha256(b"s3cr3talice").hexdigest()
    got = out.filter("op = 'c' AND after.id = 1").first().after.name
    assert got == want
    # masking preserves null structure
    assert out.filter("op = 'c'").first().before is None


def test_mask_strings_constant(fixture):
    out = mask_strings(["name"], mask_char="*", length=5)(fixture)
    assert out.filter("op='u'").first().after.name == "*****"


def test_truncate_columns(fixture):
    out = truncate_columns({"name": 3})(fixture)
    assert out.filter("op='u'").first().after.name == "bob"
    assert out.filter("op='c' AND after.id=1").first().after.name == "ali"


# ---- T14 include/exclude ------------------------------------------------------------

def test_table_filter(fixture):
    assert table_filter(include=[r"db\.customers"])(fixture).count() == 4
    assert table_filter(exclude=[r"db\.customers_shard_.*"])(fixture).count() == 4


def test_include_exclude_columns(fixture):
    out = include_exclude_columns(exclude=["name"])(fixture)
    assert [f.name for f in out.schema["after"].dataType.fields] == ["id"]
    assert out.filter("op='u'").first().before.id == 1


# ---- T15 reselect ---------------------------------------------------------------------

def test_reselect_columns(spark):
    current = spark.createDataFrame([(1, "full-body")], ["id", "body"])
    changes = spark.createDataFrame(
        [(1, "__debezium_unavailable_value", "u"), (2, "present", "u")],
        ["id", "body", "_op"],
    )
    out = reselect_columns(current, ["id"], ["body"])(changes)
    got = {(r.id, r.body) for r in out.collect()}
    assert got == {(1, "full-body"), (2, "present")}


def test_build_chain_from_config(fixture):
    from sparkcdc.transforms import build_chain

    chain = build_chain([
        {"type": "Filter", "condition": "op != 'd'"},
        {"type": "ExtractNewRecordState", "delete_handling": "drop",
         "add_fields": ["op"]},
        {"type": "TruncateColumns", "columns": {"name": 3}},
    ])
    out = chain(fixture)
    assert "__op" in out.columns
    assert all(len(r["name"] or "") <= 3 for r in out.collect())


def test_build_chain_unknown_type():
    import pytest
    from sparkcdc.transforms import build_chain

    with pytest.raises(ValueError):
        build_chain([{"type": "NoSuchSmt"}])


def test_extract_schema_to_new_record(spark):
    """T11: schema descriptor + epoch stamping from journal boundaries."""
    import json

    from sparkcdc.envelope import cdc_events
    from sparkcdc.transforms import extract_schema_to_new_record

    env = cdc_events(spark, 300, n_keys=20, n_parts=4)
    out = extract_schema_to_new_record(
        epoch_boundaries=[(100, 1), (200, 2)]
    )(env)
    rows = out.select("offset", "__schema_epoch", "__schema").collect()
    for r in rows:
        expect = 0 if r["offset"] < 100 else 1 if r["offset"] < 200 else 2
        assert r["__schema_epoch"] == expect
    schema = json.loads(rows[0]["__schema"])
    assert {f["field"] for f in schema} == {
        "repo", "path", "commit", "lang", "content"}
    assert all(f["type"] == "string" for f in schema)


def test_unwrap_add_headers(fixture):
    t = extract_new_record_state(
        add_fields=["op"], add_headers=["op", "source.table"]
    )
    out = t(fixture)
    assert "__op" in out.columns
    assert "__header_op" in out.columns and "__header_source_table" in out.columns
    r = out.filter(F.col("id") == 1).orderBy("__header_op").first()
    assert r["__header_source_table"] == "customers"


def test_predicate_guarded_transform(fixture):
    """Kafka-Connect predicates: transforms.X.predicate gates per record —
    masked only where the predicate matches, pass-through elsewhere."""
    from sparkcdc.transforms import build_chain

    chain = build_chain([
        {
            "type": "MaskStrings", "columns": ["name"],
            "predicate": {
                "type": "TopicNameMatches", "pattern": r"db\.customers",
            },
        },
    ])
    out = chain(fixture)
    assert out.count() == fixture.count()
    rows = out.filter("after is not null").select(
        F.col("source.table").alias("t"), F.col("after.name").alias("n")
    ).collect()
    for r in rows:
        if r.t == "customers":
            assert r.n in (None, "**********")
        else:
            assert r.n == "carol"  # shard-2 row untouched


def test_predicate_negate_and_tombstone(fixture):
    from sparkcdc.transforms import build_chain
    from sparkcdc.transforms.predicates import guard, record_is_tombstone

    # negate: mask everything EXCEPT db.customers
    chain = build_chain([
        {
            "type": "MaskStrings", "columns": ["name"],
            "predicate": {"type": "TopicNameMatches", "pattern": r"db\.customers"},
            "negate": True,
        },
    ])
    touched = chain(fixture).filter(
        "source.table = 'customers_shard_2' and after is not null"
    ).select(F.col("after.name").alias("n")).collect()
    assert all(r.n == "**********" for r in touched)

    # RecordIsTombstone predicate selects exactly the tombstone row
    n_tomb = fixture.filter("tombstone").count()
    ident = lambda df: df  # noqa: E731
    kept = guard(ident, record_is_tombstone())(fixture)
    assert kept.count() == fixture.count() and n_tomb == 1


def test_predicate_rejects_schema_changing_transform(fixture):
    from sparkcdc.transforms import build_chain

    chain = build_chain([
        {
            "type": "ExtractNewRecordState",
            "predicate": {"type": "RecordIsTombstone"},
        },
    ])
    with pytest.raises(ValueError, match="preserve the schema"):
        chain(fixture)


# ---------------------------------------------------------------------------
# Kafka Connect common SMTs (connect_common.py)
# ---------------------------------------------------------------------------


def test_connect_common_smts(spark):
    from sparkcdc.transforms import (
        cast_fields,
        flatten_value,
        insert_field,
        regex_router,
        replace_field,
        timestamp_converter,
    )

    df = spark.createDataFrame(
        [(1, "click", 2.5, 11, 1700000000123, "srv.app.events")],
        "user_id long, event_type string, value double, offset long,"
        "ts_ms long, route string",
    )

    out = insert_field(
        static_field="src!", static_value="cdc",
        offset_field="__offset", timestamp_field="__ts",
        topic_field="__topic",
    )(df).collect()[0]
    assert (out["src"], out["__offset"], out["__ts"], out["__topic"]) == (
        "cdc", 11, 1700000000123, "srv.app.events"
    )

    out = replace_field(
        exclude=["value"], renames="event_type:et,user_id:uid"
    )(df)
    assert out.columns == ["uid", "et", "offset", "ts_ms", "route"]

    out = cast_fields("value:int32,user_id:string")(df).collect()[0]
    assert out.value == 2 and out.user_id == "1"
    import pytest as _p
    with _p.raises(ValueError, match="unknown Cast types"):
        cast_fields({"value": "decimal"})

    # full-match-only semantics: partial matches pass through
    r = regex_router(r"srv\.(.*)\.events", "$1_events")
    assert r(df).collect()[0].route == "app_events"
    df2 = df.withColumn("route", F.lit("srv.app.events.extra"))
    assert r(df2).collect()[0].route == "srv.app.events.extra"

    nested = spark.createDataFrame(
        [((1, ("x", 2)), "k")],
        "rec struct<a:long, inner:struct<s:string, n:long>>, key string",
    )
    flat = flatten_value(delimiter="_")(nested)
    assert flat.columns == ["rec_a", "rec_inner_s", "rec_inner_n", "key"]
    row = flat.collect()[0]
    assert (row.rec_a, row.rec_inner_s, row.rec_inner_n) == (1, "x", 2)


def test_timestamp_converter_roundtrips(spark):
    from sparkcdc.transforms import timestamp_converter

    df = spark.createDataFrame([(1700000000123,)], "ts_ms long")
    s = timestamp_converter(
        "ts_ms", target_type="string", format="yyyy-MM-dd HH:mm:ss.SSS"
    )(df).collect()[0].ts_ms
    assert s == "2023-11-14 22:13:20.123"

    # string -> unix(ms) inverts the formatting
    sdf = spark.createDataFrame([(s,)], "ts_ms string")
    back = timestamp_converter(
        "ts_ms", target_type="unix", format="yyyy-MM-dd HH:mm:ss.SSS"
    )(sdf).collect()[0].ts_ms
    assert back == 1700000000123

    d = timestamp_converter("ts_ms", target_type="date")(df).collect()[0].ts_ms
    assert str(d) == "2023-11-14"

    import pytest as _p
    with _p.raises(ValueError, match="requires a format"):
        timestamp_converter("ts_ms", target_type="string")
    with _p.raises(ValueError, match="unknown TimestampConverter"):
        timestamp_converter("ts_ms", target_type="bogus")


def test_timestamp_converter_micro_nano_precision(spark):
    """Micro/nano unix precisions must be exact: the old scale-then-divide
    (unix_micros * div / 1e6) overflowed 64-bit on current-era epochs, and
    double division loses exactness past 2^53."""
    from sparkcdc.transforms import timestamp_converter

    us = 1_700_000_000_123_456
    df = spark.createDataFrame([(us,)], "ts long")
    back = timestamp_converter(
        "ts", target_type="unix", unix_precision="microseconds"
    )(df).collect()[0].ts
    assert back == us  # identity roundtrip, not wraparound garbage

    ns = 1_700_000_000_123_456_789
    dfn = spark.createDataFrame([(ns,)], "ts long")
    backn = timestamp_converter(
        "ts", target_type="unix", unix_precision="nanoseconds"
    )(dfn).collect()[0].ts
    assert backn == 1_700_000_000_123_456_000  # floored to µs resolution

    with pytest.raises(ValueError, match="unknown unix.precision"):
        timestamp_converter("ts", target_type="unix", unix_precision="weeks")


def test_flatten_collision_fails_fast(spark):
    """A flattened path colliding with an existing column must raise at
    the transform, not produce a duplicate-name frame that breaks far
    downstream."""
    from sparkcdc.transforms import flatten_value

    df = spark.createDataFrame([(1, (2,))], "rec_a long, rec struct<a: long>")
    with pytest.raises(ValueError, match="folds distinct"):
        flatten_value(delimiter="_")(df)
    # the default '.' delimiter does not collide for the same frame
    out = flatten_value()(df)
    assert out.columns == ["rec_a", "rec.a"]


def test_connect_common_in_build_chain(spark):
    """The common SMTs compose through the Kafka-Connect-style chain
    config exactly like the Debezium SMTs."""
    from sparkcdc.transforms import build_chain

    df = spark.createDataFrame(
        [(1, "click", 2.5, "srv.app.events")],
        "user_id long, event_type string, value double, route string",
    )
    chain = build_chain([
        {"type": "InsertField", "static_field": "src", "static_value": "cdc"},
        {"type": "Cast", "spec": "value:int64"},
        {"type": "RegexRouter", "regex": r"srv\.(.*)", "replacement": "$1"},
        {"type": "ReplaceField", "exclude": ["event_type"]},
    ])
    out = chain(df).collect()[0]
    assert out.src == "cdc" and out.value == 2 and out.route == "app.events"
    assert "event_type" not in chain(df).columns


def test_extract_hoist_value_key_and_header_smts(spark):
    """The second half of the common pack: ExtractField/HoistField are
    inverses; ValueToKey lands the __key struct resolve_message_key
    consumes; HeaderFrom is HeaderToValue's inverse; InsertHeader /
    DropHeaders manage header columns."""
    from sparkcdc.transforms import (
        drop_headers,
        extract_field,
        header_from,
        header_to_value,
        hoist_field,
        insert_header,
        value_to_key,
    )

    df = spark.createDataFrame(
        [(7, "click", 2.5)], "user_id long, event_type string, value double"
    )

    hoisted = hoist_field("payload")(df)
    assert hoisted.columns == ["payload"]
    assert extract_field("payload")(hoisted).collect() == df.collect()
    # scalar extract keeps the single column
    assert extract_field("user_id")(df).columns == ["user_id"]
    with pytest.raises(ValueError, match="no field"):
        extract_field("nope")(df)

    keyed = value_to_key("user_id,event_type")(df)
    k = keyed.collect()[0]["__key"]
    assert (k["user_id"], k["event_type"]) == (7, "click")
    assert "user_id" in keyed.columns  # copy, not move
    with pytest.raises(ValueError, match="no fields"):
        value_to_key(["nope"])(df)

    hdr = insert_header("h_src", "cdc")(df)
    assert hdr.collect()[0]["h_src"] == "cdc"
    assert drop_headers(["h_src"])(hdr).columns == df.columns

    moved = header_from(["value"], ["h_value"], operation="move")(df)
    assert "value" not in moved.columns
    assert moved.collect()[0]["h_value"] == 2.5
    back = header_to_value(["h_value"], ["value"], operation="move")(moved)
    assert sorted(back.columns) == sorted(df.columns)
    with pytest.raises(ValueError, match="pair up"):
        header_from(["a"], ["x", "y"])


def test_new_common_smts_in_build_chain(spark):
    from sparkcdc.transforms import build_chain

    df = spark.createDataFrame(
        [(7, "click")], "user_id long, event_type string"
    )
    chain = build_chain([
        {"type": "ValueToKey", "fields": "user_id"},
        {"type": "InsertHeader", "header": "h", "value_literal": "x"},
        {"type": "HoistField", "name": "payload"},
        {"type": "ExtractField", "field": "payload"},
    ])
    out = chain(df)
    assert set(out.columns) == {"user_id", "event_type", "__key", "h"}
