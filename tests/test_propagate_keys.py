"""Tests: column.propagate.source.type (schema-parameter propagation as
StructField metadata) and message.key.columns (per-table record-key
override, Key.java CustomKeyMapper semantics)."""

import pytest
from pyspark.sql import types as T

from sparkcdc.ddl import raw_column_types
from sparkcdc.lake import LakeTable
from sparkcdc.multitable import MultiTableEngine
from sparkcdc.sinkconfig import message_key_overrides, resolve_message_key
from sparkcdc.transforms import propagate_source_column_type
from sparkcdc.transforms.columns import LENGTH_PARAM, SCALE_PARAM, TYPE_PARAM

ROW = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
])
ENV = T.StructType([
    T.StructField("op", T.StringType()),
    T.StructField("before", ROW),
    T.StructField("after", ROW),
    T.StructField("offset", T.LongType()),
])

CREATE = (
    "SET foreign_key_checks=0; "
    "CREATE TABLE db.customers ("
    "  id bigint primary key, name varchar(255) not null,"
    "  amt decimal(10,2), checksum text, KEY idx_name (name))"
)


# ---- raw_column_types ------------------------------------------------------

def test_raw_column_types_parses_name_length_scale():
    cat = raw_column_types(CREATE, "customers")
    assert cat["id"] == {"type": "BIGINT", "length": None, "scale": None}
    assert cat["name"] == {"type": "VARCHAR", "length": 255, "scale": None}
    assert cat["amt"] == {"type": "DECIMAL", "length": 10, "scale": 2}
    assert cat["checksum"]["type"] == "TEXT"  # keyword-prefixed name kept
    assert "idx_name" not in cat  # index item skipped


def test_raw_column_types_other_table_yields_empty():
    assert raw_column_types(CREATE, "orders") == {}


# ---- column.propagate.source.type -----------------------------------------

def test_propagate_source_type_sets_struct_metadata(spark):
    df = spark.createDataFrame(
        [("c", None, (1, "alice"), 1), ("u", (1, "alice"), (1, "bob"), 2)], ENV
    )
    cat = raw_column_types(CREATE, "customers")
    t = propagate_source_column_type(
        [r"db\.customers\.name"], cat, table="db.customers"
    )
    out = t(df)
    meta = out.schema["after"].dataType["name"].metadata
    assert meta[TYPE_PARAM] == "VARCHAR"
    assert meta[LENGTH_PARAM] == 255
    assert SCALE_PARAM not in meta
    # before side carries the same parameters; unmatched columns none
    assert out.schema["before"].dataType["name"].metadata[TYPE_PARAM] == "VARCHAR"
    assert out.schema["after"].dataType["id"].metadata == {}
    # row values untouched (null before preserved)
    rows = {r.offset: r for r in out.collect()}
    assert rows[1].before is None and rows[1].after.name == "alice"
    assert rows[2].after.name == "bob"


def test_propagate_source_type_flat_frame_and_parquet_roundtrip(spark, tmp_path):
    flat = spark.createDataFrame([(1, "a", 2.5)], "id int, name string, amt double")
    cat = raw_column_types(CREATE, "customers")
    out = propagate_source_column_type([r"name", r"amt"], cat)(flat)
    assert out.schema["name"].metadata[TYPE_PARAM] == "VARCHAR"
    assert out.schema["amt"].metadata[SCALE_PARAM] == 2
    assert out.schema["id"].metadata == {}
    p = str(tmp_path / "prop")
    out.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.schema["name"].metadata[TYPE_PARAM] == "VARCHAR"


def test_propagate_no_match_is_identity_plan(spark):
    df = spark.createDataFrame([("c", None, (1, "a"), 1)], ENV)
    out = propagate_source_column_type([r"nothing\.matches"], {}, table="db.t")(df)
    assert out.schema == df.schema


# ---- message.key.columns ---------------------------------------------------

def test_message_key_overrides_first_match_wins():
    spec = r"(.*)\.purchaseorders:order_id,po;inventory\.customers:cid"
    assert resolve_message_key("inventory.purchaseorders", spec, ["pk"]) == [
        "order_id", "po",
    ]
    assert resolve_message_key("inventory.customers", spec, ["pk"]) == ["cid"]
    assert resolve_message_key("inventory.other", spec, ["pk"]) == ["pk"]
    assert resolve_message_key("inventory.other", None, ["pk"]) == ["pk"]


def test_message_key_overrides_rejects_malformed():
    with pytest.raises(ValueError):
        message_key_overrides("no-colon-entry")
    with pytest.raises(ValueError):
        message_key_overrides("tbl:")


def test_multitable_validates_message_key_against_sink(spark, tmp_root):
    fields = [("repo", "string"), ("path", "string"), ("content", "string")]
    tables = {
        "code.repos_a": LakeTable.create(
            spark, tmp_root, "repos_a", fields=fields,
            key_cols=["repo", "path"], n_buckets=2,
        )
    }
    # agreeing override: accepted
    MultiTableEngine(
        spark, tables, message_key_columns=r"code\.repos_a:repo,path"
    )
    # conflicting override: fail-fast, names both keys
    with pytest.raises(ValueError, match="repo"):
        MultiTableEngine(
            spark, tables, message_key_columns=r"code\.repos_a:content"
        )


# ---- schema.name.adjustment.mode ------------------------------------------

def test_adjust_avro_name_modes():
    from sparkcdc.transforms.avro import adjust_avro_name

    assert adjust_avro_name("valid_name1", "avro") == "valid_name1"
    assert adjust_avro_name("order-total.usd", "avro") == "order_total_usd"
    assert adjust_avro_name("1starts_digit", "avro") == "_1starts_digit"  # digit kept: no collision
    assert adjust_avro_name("a-b", "avro_unicode") == "a_u002db"
    # underscore escaped in unicode mode so the mapping is injective
    assert adjust_avro_name("a_b", "avro_unicode") == "a_u005fb"
    assert adjust_avro_name("a-b", "none") == "a-b"
    with pytest.raises(ValueError):
        adjust_avro_name("x", "bogus")


def test_avro_schema_name_adjustment():
    import json

    from pyspark.sql import types as T

    from sparkcdc.transforms.avro import envelope_avro_schema

    fields = [("total-usd", T.DoubleType()), ("name", T.StringType())]
    s = json.loads(envelope_avro_schema(fields, name_adjustment_mode="avro"))
    before = next(f for f in s["fields"] if f["name"] == "before")
    names = [f["name"] for f in before["type"][1]["fields"]]
    assert names == ["total_usd", "name"]
    # default stays byte-identical to the historical export
    s2 = json.loads(envelope_avro_schema(fields))
    before2 = next(f for f in s2["fields"] if f["name"] == "before")
    assert [f["name"] for f in before2["type"][1]["fields"]] == ["total-usd", "name"]


def test_adjust_avro_name_supplementary_plane_injective():
    """Review fix: supplementary-plane chars escape as a UTF-16 surrogate
    pair of fixed-width _uXXXX units, so BMP-escape+digit and an astral
    escape can never collide."""
    from sparkcdc.transforms.avro import adjust_avro_name

    astral = adjust_avro_name("\U0001F600", "avro_unicode")
    bmp_plus_digit = adjust_avro_name("ὠ" + "0", "avro_unicode")
    assert astral == "_ud83d_ude00"
    assert bmp_plus_digit == "_u1f600"
    assert astral != bmp_plus_digit


# ---- collection.name.format ------------------------------------------------

def test_resolve_collection_name():
    from sparkcdc.sinkconfig import resolve_collection_name

    assert resolve_collection_name("${topic}", "app.public.orders") == (
        "app_public_orders"
    )
    assert resolve_collection_name(
        "sink_${source.db}_${source.table}", "t",
        {"db": "app", "table": "orders"},
    ) == "sink_app_orders"
    # non-Debezium record (no source block): unresolvable → None
    assert resolve_collection_name("${source.table}", "t", None) is None
    # missing referenced field: same skip contract as no source block
    assert resolve_collection_name("${source.nope}", "t", {"db": "x"}) is None
