"""Unit tests for the scalar converter registry (SURVEY §1.3 / §2.7 — the
Spark rendering of JdbcValueConverters)."""

import datetime

from pyspark.sql import functions as F

from sparkcdc.functions.converters import CONVERTERS, convert_column

import pytest


def one(spark, value, typ, fn):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(fn(F.col("v")).alias("r")).collect()[0]["r"]


def test_unsigned_int_widening(spark):
    # MySQL unsigned INT 4294967295 arrives as signed -1
    assert one(spark, -1, "int", CONVERTERS["unsigned_int"]) == 4294967295
    assert one(spark, 7, "int", CONVERTERS["unsigned_int"]) == 7


def test_unsigned_bigint_widening(spark):
    got = one(spark, -1, "long", CONVERTERS["unsigned_bigint"])
    assert int(got) == 18446744073709551615


def test_decimal_modes(spark):
    assert float(one(spark, "12.5", "string", CONVERTERS["decimal_double"])) == 12.5
    assert one(spark, 12.5, "double", CONVERTERS["decimal_string"]) == "12.5"
    prec = one(spark, "12.5", "string", CONVERTERS["decimal_precise"])
    assert str(prec) == "12.500000000000000000"


def test_temporal_modes(spark):
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert one(spark, ts, "timestamp", CONVERTERS["ts_epoch_micros"]) == 1704164645123456
    assert one(spark, ts, "timestamp", CONVERTERS["ts_epoch_millis"]) == 1704164645123
    d = datetime.date(1970, 1, 11)
    assert one(spark, d, "date", CONVERTERS["date_epoch_days"]) == 10
    z = one(spark, ts, "timestamp", CONVERTERS["zoned_timestamp"])
    assert z == "2024-01-02T03:04:05.123456Z"


def test_binary_modes(spark):
    assert one(spark, bytearray(b"\xde\xad"), "binary", CONVERTERS["binary_hex"]) == "dead"
    assert one(spark, bytearray(b"hi"), "binary", CONVERTERS["binary_base64"]) == "aGk="


def test_string_logicals(spark):
    assert one(spark, '{"a":1}', "string", CONVERTERS["json"]) == '{"a":1}'
    assert one(spark, "ABC-DEF", "string", CONVERTERS["uuid"]) == "abc-def"


def test_float_vector(spark):
    got = one(spark, [1.5, 2.5], "array<double>", CONVERTERS["float_vector"])
    assert got == [1.5, 2.5]


def test_unknown_mode_raises(spark):
    with pytest.raises(ValueError):
        convert_column(F.col("x"), "nope")
