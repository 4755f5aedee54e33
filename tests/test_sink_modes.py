"""PK modes + insert modes (K5/K2 config parity:
JdbcSinkConnectorConfig.java:275-289,384,541-558) and outbox expansion
configs (EventRouterDelegate.java)."""

import pytest
from pyspark.sql import functions as F

from sparkcdc.lake import LakeTable
from sparkcdc.sinkconfig import resolve_key_columns, validate_insert_mode


def test_resolve_key_modes():
    assert resolve_key_columns(
        "record_key", envelope_key_cols=["repo", "path"]
    ) == ["repo", "path"]
    assert resolve_key_columns(
        "record_key", envelope_key_cols=["repo", "path"], key_fields=["repo"]
    ) == ["repo"]
    assert resolve_key_columns(
        "record_value", value_cols=["a", "b", "c"], key_fields=["b", "c"]
    ) == ["b", "c"]
    assert resolve_key_columns("kafka") == ["part_id", "offset"]
    assert resolve_key_columns("none") == []
    with pytest.raises(ValueError):
        resolve_key_columns("record_value", value_cols=["a"], key_fields=["x"])
    with pytest.raises(ValueError):
        resolve_key_columns("record_key", envelope_key_cols=["k"],
                            key_fields=["other"])


def test_insert_mode_validation():
    validate_insert_mode("insert", [])
    validate_insert_mode("upsert", ["k"])
    with pytest.raises(ValueError):
        validate_insert_mode("upsert", [])
    with pytest.raises(ValueError):
        validate_insert_mode("bogus", ["k"])


def test_keyless_append_table(spark, tmp_root):
    t = LakeTable.create(
        spark, tmp_root, "log",
        fields=[("ev", "string"), ("n", "long")], key_cols=[], n_buckets=4,
    )
    b = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], ["ev", "n"])
    t.append(b, batch_id=0)
    t.append(b, batch_id=1)
    # duplicates are PRESERVED (no key, no reduction) and both batches land
    assert t.read().count() == 6
    # fencing still applies per (writer, batch_id)
    res = t.append(b, batch_id=1)
    assert res["skipped"] is True
    # merge is rejected on keyless tables
    with pytest.raises(ValueError, match="insert-only"):
        t.merge(b.withColumn("_op", F.lit("u")), batch_id=2)


def test_record_value_key_drives_merge(spark, tmp_root):
    """record_value mode: key = a value column chosen by config."""
    keys = resolve_key_columns(
        "record_value", value_cols=["sku", "qty"], key_fields=["sku"]
    )
    t = LakeTable.create(
        spark, tmp_root, "inv",
        fields=[("sku", "string"), ("qty", "long")], key_cols=keys,
        n_buckets=2,
    )
    t.merge(spark.createDataFrame([("s1", 1, "u"), ("s2", 5, "u")],
                                  ["sku", "qty", "_op"]), batch_id=0)
    t.merge(spark.createDataFrame([("s1", 9, "u")],
                                  ["sku", "qty", "_op"]), batch_id=1)
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [("s1", 9), ("s2", 5)]


def test_outbox_additional_fields_and_json_expansion(spark):
    from sparkcdc.transforms import outbox_event_router

    outbox = spark.createDataFrame(
        [(7, "OrderCreated", '{"k": 42, "who": "u7"}', "order", 123, "2024")],
        ["aggregateid", "type", "payload", "aggregatetype", "event_id", "yr"],
    )
    routed = outbox_event_router(
        additional_fields=["event_id", ("yr", "header")],
        expand_json_payload=True,
        payload_schema="k long, who string",
    )(outbox)
    r = routed.first()
    assert r["key"] == 7 and r["__route"] == "order"
    assert r["payload"]["k"] == 42 and r["payload"]["who"] == "u7"
    assert r["__event_id"] == 123          # placement=envelope
    assert r["__header_yr"] == "2024"      # placement=header
    # missing schema with expansion on → config error, like the reference
    with pytest.raises(ValueError):
        outbox_event_router(expand_json_payload=True)(outbox)


def test_snapshot_boundary_markers(spark):
    from sparkcdc.envelope import snapshot_events

    src = spark.range(50).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("c").alias("commit"), F.lit("py").alias("lang"),
        F.lit("x").alias("content"),
    )
    env = snapshot_events(src, mark_boundaries=True)
    marks = [r[0] for r in env.select("source.snapshot").collect()]
    assert marks.count("first_in_data_collection") == 1
    assert marks.count("last_in_data_collection") == 1
    assert marks.count("true") == 48
    # incremental marker (SnapshotRecord.INCREMENTAL)
    inc = snapshot_events(src, snapshot_marker="incremental")
    assert {r[0] for r in inc.select("source.snapshot").collect()} == {
        "incremental"
    }


def test_column_naming_strategies(spark):
    from sparkcdc.sinkconfig import (
        COLUMN_NAMING_STRATEGIES,
        rename_columns,
        resolve_column_name,
    )

    assert resolve_column_name("UserId") == "UserId"          # default no-op
    assert resolve_column_name("UserId", "lower") == "userid"
    assert resolve_column_name("UserId", "snake") == "user_id"
    assert resolve_column_name("orderHTTPCode", "snake") == "order_httpcode"
    assert resolve_column_name("x", lambda n: "c_" + n) == "c_x"

    df = spark.createDataFrame([(1, "a")], "UserId long, UserName string")
    out = rename_columns(df, "snake")
    assert out.columns == ["user_id", "user_name"]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown column naming"):
        resolve_column_name("x", "nope")
    clash = spark.createDataFrame([(1, 2)], "a_b long, aB long")
    with _pytest.raises(ValueError, match="folds distinct"):
        rename_columns(clash, "snake")
    assert set(COLUMN_NAMING_STRATEGIES) == {"none", "lower", "upper", "snake"}
