"""Debezium ``.properties`` configuration surface (sparkcdc/properties.py).

The parser tests mirror java.util.Properties load() rules; the resolution
tests feed reference-verbatim connector/SMT property names
(EmbeddedEngineConfig, Transformations.java, RelationalDatabaseConnectorConfig,
ExtractNewRecordStateConfigDefinition) and assert the sparkcdc pipeline
they resolve to behaves identically to the directly-constructed chain."""

import pytest
from pyspark.sql import types as T

from sparkcdc.properties import (
    PipelineSpec,
    parse_properties,
    pipeline_from_properties,
    transform_specs_from_config,
)
from sparkcdc.transforms import build_chain, extract_new_record_state, mask_strings

# ---------------------------------------------------------------------------
# java.util.Properties text format
# ---------------------------------------------------------------------------


def test_parse_separators_and_comments():
    props = parse_properties(
        "a=1\n"
        "b : 2\n"
        "c 3\n"
        "# comment=x\n"
        "! also comment\n"
        "   \n"
        "d=\n"
        "e\n"
    )
    assert props == {"a": "1", "b": "2", "c": "3", "d": "", "e": ""}


def test_parse_line_continuation_strips_leading_ws():
    props = parse_properties("key=one,\\\n     two,\\\n\tthree\n")
    assert props == {"key": "one,two,three"}


def test_parse_even_trailing_backslashes_not_continuation():
    # \\ at end-of-line is an escaped backslash, not a continuation
    props = parse_properties("k=v\\\\\nnext=1\n")
    assert props == {"k": "v\\", "next": "1"}


def test_parse_escapes_and_unicode():
    props = parse_properties("greet=hi\\tthere\\n\\u00e9\nsp\\ ace=ok\\=1")
    assert props["greet"] == "hi\tthere\né"
    assert props["sp ace"] == "ok=1"


def test_parse_value_keeps_internal_whitespace():
    props = parse_properties("msg=hello  world \n")
    assert props["msg"] == "hello  world "


def test_parse_continuation_line_starting_with_hash_is_data():
    props = parse_properties("k=a,\\\n#b\n")
    assert props == {"k": "a,#b"}


def test_parse_pending_continuation_at_eof():
    assert parse_properties("k=a\\") == {"k": "a"}


# ---------------------------------------------------------------------------
# transforms= / predicates= resolution
# ---------------------------------------------------------------------------


def test_transform_chain_resolution_order_and_params():
    specs = transform_specs_from_config(parse_properties("""
transforms=unwrap,route
transforms.unwrap.type=io.debezium.transforms.ExtractNewRecordState
transforms.unwrap.delete.tombstone.handling.mode=rewrite
transforms.unwrap.add.fields=op,source.pos
transforms.unwrap.drop.fields=secret
transforms.route.type=io.debezium.transforms.ContentBasedRouter
transforms.route.language=jsr223.groovy
transforms.route.topic.expression=concat('t.', after.name)
"""))
    assert specs == [
        {
            "type": "ExtractNewRecordState",
            "delete_handling": "rewrite",
            "add_fields": ["op", "source.pos"],
            "drop_fields": ["secret"],
        },
        {
            "type": "ContentBasedRouter",
            "expression": "concat('t.', after.name)",
        },
    ]


@pytest.mark.parametrize(
    ("mode", "tombs", "expected"),
    [
        ("drop", "true", "drop"),
        ("drop", "false", "tombstone"),
        ("rewrite", "true", "rewrite"),
        ("rewrite", "false", "rewrite-with-tombstone"),
    ],
)
def test_legacy_delete_pair_combines(mode, tombs, expected):
    specs = transform_specs_from_config({
        "transforms": "u",
        "transforms.u.type": "io.debezium.transforms.ExtractNewRecordState",
        "transforms.u.delete.handling.mode": mode,
        "transforms.u.drop.tombstones": tombs,
    })
    assert specs[0]["delete_handling"] == expected


def test_legacy_delete_defaults():
    # drop.tombstones alone: legacy default delete.handling.mode=drop
    specs = transform_specs_from_config({
        "transforms": "u",
        "transforms.u.type": "io.debezium.transforms.ExtractNewRecordState",
        "transforms.u.drop.tombstones": "false",
    })
    assert specs[0]["delete_handling"] == "tombstone"


def test_unified_delete_mode_takes_precedence_over_legacy():
    specs = transform_specs_from_config({
        "transforms": "u",
        "transforms.u.type": "io.debezium.transforms.ExtractNewRecordState",
        "transforms.u.delete.tombstone.handling.mode": "rewrite-with-tombstone",
        "transforms.u.delete.handling.mode": "drop",
        "transforms.u.drop.tombstones": "true",
    })
    assert specs[0]["delete_handling"] == "rewrite-with-tombstone"


def test_legacy_delete_none_rejected_with_guidance():
    with pytest.raises(ValueError, match="delete.handling.mode=none"):
        transform_specs_from_config({
            "transforms": "u",
            "transforms.u.type": "io.debezium.transforms.ExtractNewRecordState",
            "transforms.u.delete.handling.mode": "none",
        })


def test_unknown_unified_delete_mode_rejected():
    with pytest.raises(ValueError, match="delete.tombstone.handling.mode"):
        transform_specs_from_config({
            "transforms": "u",
            "transforms.u.type": "io.debezium.transforms.ExtractNewRecordState",
            "transforms.u.delete.tombstone.handling.mode": "bogus",
        })


def test_connect_class_variant_suffix_stripped():
    specs = transform_specs_from_config({
        "transforms": "r",
        "transforms.r.type":
            "org.apache.kafka.connect.transforms.ReplaceField$Value",
        "transforms.r.blacklist": "a,b",
        "transforms.r.renames": "x:y",
    })
    assert specs == [{"type": "ReplaceField", "exclude": ["a", "b"],
                      "renames": "x:y"}]


def test_schema_change_exclude_complements_to_include():
    specs = transform_specs_from_config({
        "transforms": "f",
        "transforms.f.type": "io.debezium.transforms.SchemaChangeEventFilter",
        "transforms.f.schema.change.event.exclude.list": "DROP, truncate",
    })
    assert specs[0]["include_types"] == ["CREATE", "ALTER", "DATABASE"]


def test_partition_routing_hash_function_maps():
    specs = transform_specs_from_config({
        "transforms": "p",
        "transforms.p.type":
            "io.debezium.transforms.partitions.PartitionRouting",
        "transforms.p.partition.payload.fields": "source.table",
        "transforms.p.partition.topic.num": "8",
        "transforms.p.partition.hash.function": "murmur",
    })
    assert specs[0] == {
        "type": "PartitionRouting",
        "partition_payload_fields": ["source.table"],
        "partition_topic_num": 8,
        "hash_mode": "stable",
    }


def test_predicate_wrap_and_negate():
    specs = transform_specs_from_config(parse_properties("""
transforms=m
transforms.m.type=io.debezium.transforms.ExtractChangedRecordState
transforms.m.predicate=onCustomers
transforms.m.negate=true
predicates=onCustomers
predicates.onCustomers.type=org.apache.kafka.connect.transforms.predicates.TopicNameMatches
predicates.onCustomers.pattern=.*customers
"""))
    assert specs == [{
        "type": "ExtractChangedRecordState",
        "predicate": {"type": "TopicNameMatches", "pattern": ".*customers"},
        "negate": True,
    }]


def test_unknown_transform_class_rejected():
    with pytest.raises(ValueError, match="unknown transform class"):
        transform_specs_from_config({
            "transforms": "x",
            "transforms.x.type": "com.example.Mystery",
        })


def test_missing_type_and_dangling_predicate_rejected():
    with pytest.raises(ValueError, match="no transforms.x.type"):
        transform_specs_from_config({"transforms": "x"})
    with pytest.raises(ValueError, match="not in predicates"):
        transform_specs_from_config({
            "transforms": "m",
            "transforms.m.type":
                "io.debezium.transforms.ExtractChangedRecordState",
            "transforms.m.predicate": "nope",
        })


def test_registry_short_names_accepted():
    specs = transform_specs_from_config({
        "transforms": "f",
        "transforms.f.type": "Filter",
        "transforms.f.condition": "op <> 'd'",
    })
    assert specs == [{"type": "Filter", "condition": "op <> 'd'"}]


# ---------------------------------------------------------------------------
# full pipeline resolution
# ---------------------------------------------------------------------------

FULL = """
name=inventory-connector
connector.class=io.debezium.connector.mysql.MySqlConnector
database.hostname=mysql
database.port=3306
database.user=debezium
database.password=dbz
topic.prefix=app
table.include.list=app.events, app.users
column.exclude.list=app.events.secret
message.key.columns=app.events:user_id
snapshot.mode=schema_only
max.batch.size=4096
incremental.snapshot.chunk.size=2048
event.processing.failure.handling.mode=warn
provide.transaction.metadata=true
skipped.operations=t
tombstones.on.delete=false
decimal.handling.mode=string
binary.handling.mode=base64
column.mask.hash.SHA-256.with.salt.pep=props
column.truncate.to.12.chars=event_type
column.mask.with.8.chars=ssn
snapshot.select.statement.overrides=app.events
snapshot.select.statement.overrides.app.events=SELECT * FROM events WHERE value > 0
value.converter=io.debezium.converters.CloudEventsConverter
value.converter.data.serializer.type=avro
schema.name.adjustment.mode=avro
primary.key.mode=record_key
insert.mode=upsert
delete.enabled=true
schema.evolution=basic
collection.name.format=cdc_${source.table}
topic.naming.strategy=io.debezium.schema.SchemaTopicNamingStrategy
topic.delimiter=_
heartbeat.interval.ms=5000
signal.data.collection=app.signals
offset.storage=org.apache.kafka.connect.storage.FileOffsetBackingStore
offset.storage.file.filename=/tmp/offsets.dat
transforms=unwrap
transforms.unwrap.type=io.debezium.transforms.ExtractNewRecordState
transforms.unwrap.delete.handling.mode=rewrite
"""


def test_full_pipeline_resolution():
    spec = pipeline_from_properties(FULL)
    assert isinstance(spec, PipelineSpec)
    # engine scalars
    assert spec.engine_kwargs["batch_size"] == 4096
    assert spec.engine_kwargs["snapshot_mode"] == "no_data"  # alias
    assert spec.engine_kwargs["provide_transaction_metadata"] is True
    assert spec.engine_kwargs["skipped_operations"] == "t"
    assert spec.engine_kwargs["snapshot_select_overrides"] == {
        "app.events": "SELECT * FROM events WHERE value > 0"}
    # chain order: connector column rules first, DropTombstones, then SMTs
    kinds = [s["type"] for s in spec.transform_specs]
    assert kinds == ["MaskStrings", "TruncateColumns", "MaskStrings",
                     "IncludeExcludeColumns", "DropTombstones",
                     "ExtractNewRecordState"]
    assert {"type": "MaskStrings", "columns": ["props"], "salt": "pep"} \
        in spec.transform_specs
    assert {"type": "MaskStrings", "columns": ["ssn"], "length": 8} \
        in spec.transform_specs
    assert spec.transform_specs[-1]["delete_handling"] == "rewrite"
    # capture filters / keys
    assert spec.table_include == ["app.events", "app.users"]
    assert spec.message_key_columns == "app.events:user_id"
    assert spec.incremental_chunk_size == 2048
    assert spec.failure_handling == "skip"  # warn normalizes
    assert spec.converter_modes == {"decimal.handling.mode": "string",
                                    "binary.handling.mode": "base64"}
    # serialization / sink / topic
    assert spec.serialization == {"format": "cloudevents",
                                  "cloudevents_data_format": "avro",
                                  "schema_name_adjustment": "avro"}
    assert spec.sink == {"primary.key.mode": "record_key",
                         "insert.mode": "upsert",
                         "delete.enabled": "true",
                         "schema.evolution": "basic",
                         "collection.name.format": "cdc_${source.table}"}
    assert spec.topic == {"prefix": "app", "strategy": "schema",
                          "delimiter": "_"}
    # connection/runtime keys accepted as passthrough, nothing unknown
    assert "database.hostname" in spec.passthrough
    assert "offset.storage.file.filename" in spec.passthrough
    assert spec.unknown == {}


def test_strict_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unrecognized properties"):
        pipeline_from_properties("definitely.not.a.key=1")
    spec = pipeline_from_properties("definitely.not.a.key=1", strict=False)
    assert spec.unknown == {"definitely.not.a.key": "1"}


def test_select_override_requires_per_table_sql():
    with pytest.raises(ValueError, match="overrides.app.events is missing"):
        pipeline_from_properties(
            "snapshot.select.statement.overrides=app.events")


def test_unknown_value_converter_and_modes_rejected():
    with pytest.raises(ValueError, match="value.converter"):
        pipeline_from_properties("value.converter=com.example.X")
    with pytest.raises(ValueError, match="decimal.handling.mode"):
        pipeline_from_properties("decimal.handling.mode=fuzzy")
    with pytest.raises(ValueError, match="failure.handling.mode"):
        pipeline_from_properties(
            "event.processing.failure.handling.mode=explode")


def test_json_converter_schemas_enable_switch():
    s1 = pipeline_from_properties(
        "value.converter=org.apache.kafka.connect.json.JsonConverter")
    assert s1.serialization["format"] == "connect_json"
    s2 = pipeline_from_properties(
        "value.converter=org.apache.kafka.connect.json.JsonConverter\n"
        "value.converter.schemas.enable=false")
    assert s2.serialization["format"] == "json"


def test_mask_hash_algorithm_must_be_sha256():
    with pytest.raises(ValueError, match="unsupported"):
        pipeline_from_properties("column.mask.hash.MD5.with.salt.s=c")


# ---------------------------------------------------------------------------
# end-to-end: properties-built chain == directly-built chain
# ---------------------------------------------------------------------------

ROW = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
])
ENV = T.StructType([
    T.StructField("op", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("before", ROW),
    T.StructField("after", ROW),
    T.StructField(
        "source",
        T.StructType([
            T.StructField("pos", T.LongType()),
            T.StructField("table", T.StringType()),
        ]),
    ),
    T.StructField("offset", T.LongType()),
    T.StructField("tombstone", T.BooleanType()),
])


@pytest.fixture(scope="module")
def env_df(spark):
    rows = [
        ("c", 1001, None, (1, "alice"), (1, "customers"), 1, False),
        ("u", 1002, (1, "alice"), (1, "bob"), (2, "customers"), 2, False),
        ("d", 1003, (1, "bob"), None, (3, "customers"), 3, False),
        ("d", 1003, None, None, (3, "customers"), 3, True),
        ("c", 1004, None, (2, "carol"), (4, "customers"), 4, False),
    ]
    return spark.createDataFrame(rows, ENV)


def test_properties_chain_matches_direct_chain(spark, env_df):
    spec = pipeline_from_properties("""
column.mask.hash.SHA-256.with.salt.pep=name
transforms=unwrap,filt
transforms.unwrap.type=io.debezium.transforms.ExtractNewRecordState
transforms.unwrap.delete.handling.mode=rewrite
transforms.unwrap.drop.tombstones=true
transforms.unwrap.add.fields=op,source.pos
transforms.filt.type=io.debezium.transforms.Filter
transforms.filt.condition=id IS NOT NULL
""")
    got = spec.chain()(env_df)

    direct = extract_new_record_state(
        "rewrite", add_fields=["op", "source.pos"]
    )(mask_strings(["name"], salt="pep")(env_df))
    want = direct.filter("id IS NOT NULL")

    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect()))
    # rewrite kept the delete with the flag, dropped the tombstone
    flags = {r["__op"]: r["__deleted"] for r in got.collect()}
    assert flags["d"] == "true" and flags["c"] == "false"


def test_build_chain_accepts_resolved_specs(spark, env_df):
    # The resolved specs are plain build_chain input — PipelineSpec.chain()
    # is just a shortcut.
    spec = pipeline_from_properties(
        "transforms=u\n"
        "transforms.u.type=io.debezium.transforms.ExtractNewRecordState\n"
        "transforms.u.delete.tombstone.handling.mode=drop\n")
    via_chain = spec.chain()(env_df)
    via_build = build_chain(spec.transform_specs)(env_df)
    assert via_chain.collect() == via_build.collect()


def test_cli_properties_plan(tmp_path, capsys):
    import json

    from sparkcdc.cli import main

    f = tmp_path / "conn.properties"
    f.write_text(
        "database.hostname=mysql\n"
        "transforms=u\n"
        "transforms.u.type=io.debezium.transforms.ExtractNewRecordState\n"
        "transforms.u.delete.handling.mode=rewrite\n"
        "transforms.u.drop.tombstones=false\n"
    )
    assert main(["properties", "--file", str(f)]) == 0
    plan = json.loads(capsys.readouterr().out)
    assert plan["transforms"] == [{
        "type": "ExtractNewRecordState",
        "delete_handling": "rewrite-with-tombstone",
    }]
    assert plan["passthrough"] == {"database.hostname": "mysql"}
    assert plan["unknown"] == {}


# -- review-finding regressions -------------------------------------------------


def test_unescape_escaped_backslash_before_u_stays_literal():
    # java.util.Properties consumes '\\' FIRST: '\\u0041' is a literal
    # backslash + 'u0041', never decoded to 'A'
    assert parse_properties(r"k=C\\u0041dir")["k"] == "C\\u0041dir"
    assert parse_properties(r"k=A") == {"k": "A"}


def test_fully_qualified_column_rules_reduce_to_bare_names():
    spec = pipeline_from_properties(
        "column.mask.hash.SHA-256.with.salt.x=inventory.customers.email\n"
        "column.truncate.to.8.chars=inventory\\.customers\\.bio\n"
        "column.include.list=inventory\\.customers\\.(id|name), plain\n"
        "column.exclude.list=db\\.tab\\..*\n"
        "column.mask.with.4.chars=db.tab.ssn\n"
    )
    by_type = {}
    for s in spec.transform_specs:
        by_type.setdefault(s["type"], []).append(s)
    assert by_type["MaskStrings"][0]["columns"] == ["email"]
    assert by_type["MaskStrings"][1]["columns"] == ["ssn"]
    assert by_type["TruncateColumns"][0]["columns"] == {"bio": 8}
    # escaped-dot regex form keeps the column-part pattern intact
    assert by_type["IncludeExcludeColumns"][0]["include"] == \
        ["(id|name)", "plain"]
    assert by_type["IncludeExcludeColumns"][0]["exclude"] == [".*"]


def test_converter_subkeys_pass_through():
    spec = pipeline_from_properties(
        "value.converter=io.confluent.connect.avro.AvroConverter\n"
        "value.converter.schema.registry.url=http://sr:8081\n"
        "converters=isbn\n"
        "isbn.type=com.acme.IsbnConverter\n"
        "isbn.schema.name=io.acme.ISBN\n"
    )
    assert spec.serialization["format"] == "avro"
    assert "value.converter.schema.registry.url" in spec.passthrough
    assert "isbn.type" in spec.passthrough
    assert "isbn.schema.name" in spec.passthrough
    assert spec.unknown == {}


def test_qualified_thirdparty_class_never_resolves_to_builtin():
    with pytest.raises(ValueError, match="unknown transform class"):
        transform_specs_from_config({
            "transforms": "f",
            "transforms.f.type": "com.acme.custom.Filter",
            "transforms.f.condition": "1=1",
        })


def test_orphan_transform_block_is_unknown_in_strict_mode():
    text = (
        "transforms=u\n"
        "transforms.u.type=io.debezium.transforms.ExtractNewRecordState\n"
        "transforms.extra.type=io.debezium.transforms.Filter\n"
        "transforms.extra.condition=1=1\n"
    )
    with pytest.raises(ValueError, match="transforms.extra.type"):
        pipeline_from_properties(text)
    spec = pipeline_from_properties(text, strict=False)
    assert "transforms.extra.type" in spec.unknown
    assert [s["type"] for s in spec.transform_specs] == \
        ["ExtractNewRecordState"]


def test_negate_without_predicate_rejected():
    with pytest.raises(ValueError, match="negate set but no"):
        transform_specs_from_config({
            "transforms": "u",
            "transforms.u.type":
                "io.debezium.transforms.ExtractNewRecordState",
            "transforms.u.negate": "true",
        })
