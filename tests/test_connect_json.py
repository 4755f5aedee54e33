"""Tests: Kafka Connect JSON-with-schema wire format (T16,
``schemas.enable=true`` — the reference's default JSON serialization)."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcdc.envelope import REPO_ROW_FIELDS, cdc_events
from sparkcdc.transforms import (
    connect_envelope_schema_json,
    embedded_connect_schemas,
    envelope_to_connect_json,
    parse_connect_json,
)
from sparkcdc.transforms.connect_json import connect_field_schema


def test_connect_roundtrip_lossless(spark):
    env = cdc_events(spark, 500, n_keys=50, tombstones=True)
    wire = envelope_to_connect_json(env)
    back = parse_connect_json(wire, REPO_ROW_FIELDS)
    proj = lambda df: sorted(  # noqa: E731
        df.select(
            "op", "offset", "tombstone",
            F.coalesce(F.col("after.repo"), F.col("before.repo")).alias("r"),
            F.coalesce(F.col("after.content"), F.lit("")).alias("c"),
            F.col("source.pos").alias("p"),
        ).collect()
    )
    assert proj(env) == proj(back)


def test_wire_records_are_connect_shaped(spark):
    env = cdc_events(spark, 5, n_keys=5)
    rows = envelope_to_connect_json(env).collect()
    for r in rows:
        rec = json.loads(r["value"])
        assert set(rec) == {"schema", "payload"}
        assert rec["schema"]["type"] == "struct"
        assert rec["schema"]["optional"] is False
        fields = {f["field"] for f in rec["schema"]["fields"]}
        assert {"op", "ts_ms", "before", "after", "source"} <= fields
        assert rec["payload"]["op"] in ("c", "u", "d", "r")


def test_schema_descriptor_shape():
    node = json.loads(connect_envelope_schema_json(REPO_ROW_FIELDS))
    assert node["name"] == "sparkcdc.source_code_repos.Envelope"
    by_field = {f["field"]: f for f in node["fields"]}
    # before/after share the row struct; nullability flows from Spark schema
    assert by_field["before"]["type"] == "struct"
    assert by_field["before"]["optional"] is True
    row_fields = [f["field"] for f in by_field["after"]["fields"]]
    assert row_fields == ["repo", "path", "commit", "lang", "content"]
    assert by_field["ts_ms"]["type"] == "int64"
    assert by_field["op"]["type"] == "string"
    assert by_field["part_id"]["type"] == "int32"
    assert by_field["tombstone"]["type"] == "boolean"


def test_logical_type_mappings():
    ts = connect_field_schema(T.TimestampType())
    assert (ts["type"], ts["name"]) == (
        "int64", "org.apache.kafka.connect.data.Timestamp")
    dec = connect_field_schema(T.DecimalType(12, 3))
    assert dec["type"] == "bytes"
    assert dec["parameters"] == {"scale": "3"}
    arr = connect_field_schema(T.ArrayType(T.LongType(), False))
    assert arr["type"] == "array" and arr["items"]["type"] == "int64"
    assert arr["items"]["optional"] is False
    m = connect_field_schema(T.MapType(T.StringType(), T.DoubleType()))
    assert m["keys"]["type"] == "string" and m["values"]["type"] == "float64"


def test_failure_handling_and_drift_probe(spark):
    env = cdc_events(spark, 50, n_keys=10)
    good = envelope_to_connect_json(env)
    bad = spark.createDataFrame([("{oops",), (None,)], "value string")
    mixed = good.unionByName(bad)
    kept = parse_connect_json(mixed, REPO_ROW_FIELDS, failure_handling="skip")
    assert kept.count() == 50
    # drift probe: one producer epoch == one distinct schema string
    schemas = embedded_connect_schemas(good).collect()
    assert len(schemas) == 1
    assert json.loads(schemas[0]["schema_json"])["type"] == "struct"


# ---------------------------------------------------------------------------
# ConvertCloudEventToSaveableForm
# ---------------------------------------------------------------------------


def test_saveable_form_mapping_and_data(spark):
    from sparkcdc.sources.events_adapter import events_to_envelopes
    from sparkcdc.transforms import envelope_to_cloudevents
    from sparkcdc.transforms.serialize import (
        convert_cloudevent_to_saveable_form,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(20)
    wire = envelope_to_cloudevents(events_to_envelopes(ev))
    flat = convert_cloudevent_to_saveable_form(
        wire, ["id:event_key", "type", "data:payload"]
    )
    assert flat.columns == ["event_key", "type", "payload"]
    rows = flat.collect()
    assert len(rows) == 20
    # data column is the JSON text of the whole envelope
    import json as _json
    payload = _json.loads(rows[0].payload)
    assert {"op", "offset", "source"} <= set(payload)
    assert rows[0].type == "io.debezium.connector.spark.DataChangeEvent"


def test_saveable_form_validation(spark):
    import pytest as _pytest

    from sparkcdc.transforms.serialize import (
        convert_cloudevent_to_saveable_form,
    )

    df = spark.createDataFrame([("{}",)], "value string")
    # empty mapping = pass-through (reference behavior)
    assert convert_cloudevent_to_saveable_form(df, []) is df
    with _pytest.raises(ValueError, match="unknown CloudEvent"):
        convert_cloudevent_to_saveable_form(df, ["nope:col"])
    # duplicate source attribute, two columns
    out = convert_cloudevent_to_saveable_form(df, ["id:a", "id:b"])
    assert out.columns == ["a", "b"]
