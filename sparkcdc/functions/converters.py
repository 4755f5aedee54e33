"""Scalar converter registry — the Spark rendering of Debezium's type system
(SURVEY §1.3 / §2.7; reference: core/jdbc/JdbcValueConverters.java:72, JDBC
dispatch table :154-267, decimal/time modes at
core/relational/RelationalDatabaseConnectorConfig.java:344,426-429).

Debezium converts JDBC values → Kafka-Connect logical types; here the
equivalent is a named registry of Column→Column conversions, each a builtin
Catalyst expression. ``convert_column(df_col, "mode")`` is the single entry
point, mirroring ``ValueConverterProvider.converter()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnFn = Callable[[Column], Column]

# -- numeric -----------------------------------------------------------------


def unsigned_widen_int(c: Column) -> Column:
    """MySQL unsigned INT read as signed int32 → non-negative long
    (binlog/BinlogUnsignedIntegerConverter.java semantics)."""
    return F.when(c < 0, c.cast("long") + F.lit(1 << 32)).otherwise(c.cast("long"))


def unsigned_widen_bigint(c: Column) -> Column:
    """Unsigned BIGINT → decimal(20,0) (value may exceed int64, so the
    2^64 offset must be a decimal literal, not a long)."""
    import decimal

    two64 = F.lit(decimal.Decimal(2**64)).cast("decimal(21,0)")
    return F.when(
        c < 0, (c.cast("decimal(21,0)") + two64).cast("decimal(20,0)")
    ).otherwise(c.cast("decimal(20,0)"))


# -- decimal.handling.mode = precise | double | string ----------------------


def decimal_precise(c: Column, precision: int = 38, scale: int = 18) -> Column:
    return c.cast(f"decimal({precision},{scale})")


def decimal_double(c: Column) -> Column:
    return c.cast("double")


def decimal_string(c: Column) -> Column:
    return c.cast("string")


# -- time.precision.mode: adaptive epoch micro/nano longs --------------------


def ts_to_epoch_millis(c: Column) -> Column:
    # unix_millis, not unix_micros/1000: `/` is double division and a
    # cast truncates while an oracle engine's cast may round — the exact
    # builtin keeps both engines on integer arithmetic
    return F.unix_millis(c.cast("timestamp"))


def ts_to_epoch_micros(c: Column) -> Column:
    return F.unix_micros(c.cast("timestamp"))


def date_to_epoch_days(c: Column) -> Column:
    return F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date"))


def zoned_timestamp(c: Column) -> Column:
    """ZonedTimestamp logical type: ISO-8601 UTC string
    (core/time/ZonedTimestamp.java)."""
    return F.date_format(c.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")


# -- binary.handling.mode = bytes | hex | base64 -----------------------------


def binary_hex(c: Column) -> Column:
    return F.lower(F.hex(c))


def binary_base64(c: Column) -> Column:
    return F.base64(c)


# -- string-ish logical types ------------------------------------------------


def json_passthrough(c: Column) -> Column:
    """Json logical type is a string carrying JSON (core/data/Json.java)."""
    return c.cast("string")


def uuid_string(c: Column) -> Column:
    return F.lower(c.cast("string"))


def enum_string(c: Column) -> Column:
    return c.cast("string")


# -- geometry / vector -------------------------------------------------------


def geometry_struct(wkb: Column, srid: Column) -> Column:
    """core/data/geometry/Geometry.java → struct<wkb:binary, srid:int>."""
    return F.struct(wkb.cast("binary").alias("wkb"), srid.cast("int").alias("srid"))


def float_vector(c: Column) -> Column:
    """core/data/vector/FloatVector.java → array<float>."""
    return c.cast("array<float>")


CONVERTERS: dict[str, ColumnFn] = {
    "unsigned_int": unsigned_widen_int,
    "unsigned_bigint": unsigned_widen_bigint,
    "decimal_precise": decimal_precise,
    "decimal_double": decimal_double,
    "decimal_string": decimal_string,
    "ts_epoch_millis": ts_to_epoch_millis,
    "ts_epoch_micros": ts_to_epoch_micros,
    "date_epoch_days": date_to_epoch_days,
    "zoned_timestamp": zoned_timestamp,
    "binary_hex": binary_hex,
    "binary_base64": binary_base64,
    "json": json_passthrough,
    "uuid": uuid_string,
    "enum": enum_string,
    "float_vector": float_vector,
}


def convert_column(c: Column, mode: str) -> Column:
    try:
        return CONVERTERS[mode](c)
    except KeyError:
        raise ValueError(f"unknown converter mode {mode!r}") from None
