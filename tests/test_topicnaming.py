"""Topic naming strategies (schema/AbstractTopicNamingStrategy.java
family) and field.name.adjustment.mode."""

from pyspark.sql import functions as F

from sparkcdc.topicnaming import (
    MAX_NAME_LENGTH,
    TopicNamingStrategy,
    apply_topic_names,
)


def test_control_and_data_topics():
    s = TopicNamingStrategy("srv1")
    assert s.schema_change_topic() == "srv1"
    assert s.heartbeat_topic() == "__debezium-heartbeat.srv1"
    assert s.transaction_topic() == "srv1.transaction"
    assert s.data_change_topic(db="appdb", table="orders") == (
        "srv1.appdb.orders"
    )
    # blank parts drop out (mkString filter)
    assert s.data_change_topic(db=None, table="orders") == "srv1.orders"

    # schema strategy names by schema parts; custom delimiter applies
    # to control topics too
    s2 = TopicNamingStrategy("srv1", strategy="schema", delimiter="_")
    assert s2.data_change_topic(schema="public", table="t") == (
        "srv1_public_t"
    )
    assert s2.transaction_topic() == "srv1_transaction"
    assert s2.heartbeat_topic() == "__debezium-heartbeat_srv1"


def test_regex_variant_full_match_only():
    s = TopicNamingStrategy(
        "srv1",
        topic_regex=r"srv1\.appdb\.(.*)",
        topic_replacement="srv1.all.$1",
    )
    assert s.data_change_topic(db="appdb", table="orders") == (
        "srv1.all.orders"
    )
    # partial match passes through (Matcher.matches semantics)
    assert s.data_change_topic(db="other", table="orders") == (
        "srv1.other.orders"
    )


def test_sanitization_modes():
    s = TopicNamingStrategy("p")
    assert s.sanitized_topic_name("a b/c") == "a_b_c"
    assert s.sanitized_topic_name("ok.name-1_x") == "ok.name-1_x"
    assert s.sanitized_topic_name(".") == "_"
    assert s.sanitized_topic_name("..") == "__"
    assert len(s.sanitized_topic_name("x" * 300)) == MAX_NAME_LENGTH

    u = TopicNamingStrategy("p", replacement="unicode")
    # '_' is the escape char in unicode mode -> itself escaped; low
    # codepoints zero-pad to 4 hex digits (UnicodeReplacementFunction)
    assert u.sanitized_topic_name("a_b") == "a_u005fb"
    assert u.sanitized_topic_name("a b") == "a_u0020b"
    assert u.sanitized_topic_name("café") == "caf_u00e9"
    assert u.sanitized_topic_name("s☃w") == "s_u2603w"


def test_apply_topic_names_per_row(spark):
    rows = [("appdb", "orders"), ("appdb", "users"), ("other db", "t-1")]
    df = spark.createDataFrame(rows, "db string, tbl string")
    out = apply_topic_names(
        df, TopicNamingStrategy("srv1"), db_col="db", table_col="tbl"
    )
    got = {(r.db, r.tbl): r.topic for r in out.collect()}
    assert got[("appdb", "orders")] == "srv1.appdb.orders"
    assert got[("other db", "t-1")] == "srv1.other_db.t-1"


def test_apply_topic_names_thousands_of_tables(spark):
    """The per-row lookup must be a flat map, not a nested when/otherwise
    chain — a chain recurses one analyzer stack level per table and
    overflows at connector-realistic table counts."""
    rows = [(f"db{i % 40}", f"table_{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "db string, tbl string")
    out = apply_topic_names(
        df, TopicNamingStrategy("srv"), db_col="db", table_col="tbl"
    )
    got = {(r.db, r.tbl): r.topic for r in out.collect()}
    assert len(got) == 3000
    assert got[("db7", "table_7")] == "srv.db7.table_7"
    assert got[("db39", "table_2999")] == "srv.db39.table_2999"


def test_field_name_adjustment(spark):
    from sparkcdc.transforms.avro import adjust_field_names

    df = spark.createDataFrame(
        [(1, "x", 2.0)], ["user id", "event-type", "1col"]
    )
    out = adjust_field_names(df)
    assert out.columns == ["user_id", "event_type", "_1col"]

    import pytest
    clash = spark.createDataFrame([(1, 2)], ["a b", "a-b"])
    with pytest.raises(ValueError, match="folds distinct"):
        adjust_field_names(clash)
