"""T16 — Kafka Connect JSON-with-schema wire format (``schemas.enable=true``).

The reference's default value converter is Kafka Connect's ``JsonConverter``
with embedded schemas: every record on the wire is

    {"schema": {<Connect schema descriptor>}, "payload": {<envelope>}}

(org.apache.kafka.connect.json.JsonConverter — public Apache Kafka; the
Debezium docs call this the "default" JSON serialization and every
``schemas.enable=true`` tutorial shows this shape). The plain-JSON codec in
``serialize.py`` covers ``schemas.enable=false``; this module adds the
schema-bearing form so a consumer of reference topics can point at this
engine unchanged.

Spark-native design: the Connect schema descriptor is a function of the
TABLE schema, not the record, so it is rendered ONCE on the driver and
concatenated as a constant string around ``to_json(payload)`` — the whole
serializer stays a single codegen projection (no per-row schema rendering,
which is exactly the overhead the reference's JsonConverter pays per record
and its docs warn about). The parse side types only ``payload`` with
``from_json`` and leaves the ``schema`` member unread on the fast path;
``embedded_connect_schemas`` gives the consumer-side drift check (distinct
over a low-cardinality string) without re-parsing payloads.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import envelope_schema

#: Spark atomic type → Connect primitive type name
#: (org.apache.kafka.connect.data.Schema.Type, lower-cased wire names)
_PRIMS: list[tuple[type, str]] = [
    (T.ByteType, "int8"),
    (T.ShortType, "int16"),
    (T.IntegerType, "int32"),
    (T.LongType, "int64"),
    (T.FloatType, "float32"),
    (T.DoubleType, "float64"),
    (T.BooleanType, "boolean"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
]


def connect_field_schema(
    dtype: T.DataType, *, optional: bool = True, field: str | None = None,
    name: str | None = None,
) -> dict:
    """One Connect schema node for a Spark type (JsonConverter.asJsonSchema
    semantics). ``field`` is set when the node sits inside a struct's
    ``fields`` list; logical types follow Connect's named-schema convention
    (Timestamp/Date as named int64/int32, Decimal as named bytes with a
    ``scale`` parameter)."""
    node: dict = {}
    if isinstance(dtype, T.StructType):
        node["type"] = "struct"
        node["fields"] = [
            connect_field_schema(f.dataType, optional=f.nullable, field=f.name)
            for f in dtype.fields
        ]
    elif isinstance(dtype, T.ArrayType):
        node["type"] = "array"
        node["items"] = connect_field_schema(
            dtype.elementType, optional=dtype.containsNull
        )
    elif isinstance(dtype, T.MapType):
        node["type"] = "map"
        node["keys"] = connect_field_schema(dtype.keyType, optional=False)
        node["values"] = connect_field_schema(
            dtype.valueType, optional=dtype.valueContainsNull
        )
    elif isinstance(dtype, T.TimestampType):
        node["type"] = "int64"
        node["name"] = "org.apache.kafka.connect.data.Timestamp"
        node["version"] = 1
    elif isinstance(dtype, T.DateType):
        node["type"] = "int32"
        node["name"] = "org.apache.kafka.connect.data.Date"
        node["version"] = 1
    elif isinstance(dtype, T.DecimalType):
        node["type"] = "bytes"
        node["name"] = "org.apache.kafka.connect.data.Decimal"
        node["version"] = 1
        node["parameters"] = {"scale": str(dtype.scale)}
    else:
        for cls, tname in _PRIMS:
            if isinstance(dtype, cls):
                node["type"] = tname
                break
        else:
            raise TypeError(
                f"no Connect mapping for Spark type {dtype.simpleString()}"
            )
    node["optional"] = optional
    if name is not None:
        node["name"] = name
    if field is not None:
        node["field"] = field
    return node


def connect_envelope_schema_json(
    row_fields: list[tuple[str, T.DataType]] | None = None,
    schema_name: str = "sparkcdc.source_code_repos.Envelope",
) -> str:
    """The Connect schema descriptor for the full envelope, as the exact
    JSON string that rides in the wire record's ``schema`` member. Rendered
    once per table (driver-side); names the envelope struct the way the
    reference names per-table envelopes (``<server>.<db>.<table>.Envelope``,
    core/data/Envelope.java SCHEMA_NAME_SUFFIX)."""
    node = connect_field_schema(
        envelope_schema(row_fields), optional=False, name=schema_name
    )
    return json.dumps(node, separators=(",", ":"), sort_keys=False)


def envelope_to_connect_json(
    df: DataFrame,
    row_fields: list[tuple[str, T.DataType]] | None = None,
    out_col: str = "value",
    schema_name: str = "sparkcdc.source_code_repos.Envelope",
) -> DataFrame:
    """Envelope rows → Connect JSON-with-schema wire records.

    The schema half is a driver-rendered constant; only the payload is
    serialized per row (one ``to_json`` inside codegen), so enabling
    schemas costs a constant-bytes concat, not a per-record schema walk."""
    schema_json = connect_envelope_schema_json(row_fields, schema_name)
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        F.concat(
            F.lit('{"schema":' + schema_json + ',"payload":'),
            payload,
            F.lit("}"),
        ).alias(out_col)
    )


def parse_connect_json(
    df: DataFrame,
    row_fields: list[tuple[str, T.DataType]] | None = None,
    json_col: str = "value",
    failure_handling: str = "keep",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Connect JSON-with-schema wire records → typed envelope DataFrame.

    Fast path: one ``from_json`` typing only the ``payload`` member — the
    embedded schema is not re-parsed per record (it is constant per table
    epoch; use :func:`embedded_connect_schemas` to watch it). The three
    ``event.processing.failure.handling.mode`` values compose exactly as in
    :func:`serialize.parse_envelope_json` (fail → FAILFAST, skip → drop
    corrupt lines, keep → all-null envelope)."""
    wrapper = T.StructType(
        [T.StructField("payload", envelope_schema(row_fields), True)]
    )
    raw = F.col(json_col)
    if failure_handling == "keep":
        parsed = df.select(F.from_json(raw, wrapper).alias("w"), *extra_cols)
    elif failure_handling == "fail":
        parsed = df.select(
            F.from_json(raw, wrapper, {"mode": "FAILFAST"}).alias("w"),
            *extra_cols,
        )
    elif failure_handling == "skip":
        tag = T.StructType(
            list(wrapper.fields)
            + [T.StructField("__corrupt_record", T.StringType())]
        )
        tagged = df.filter(raw.isNotNull()).select(
            F.from_json(
                raw, tag, {"columnNameOfCorruptRecord": "__corrupt_record"}
            ).alias("w"),
            *extra_cols,
        )
        parsed = tagged.filter(F.col("w.__corrupt_record").isNull())
    else:
        raise ValueError(
            f"unknown event.processing.failure.handling.mode {failure_handling!r}"
        )
    return parsed.select("w.payload.*", *extra_cols)


def embedded_connect_schemas(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Distinct embedded schema strings on the wire — the consumer-side
    schema-drift probe. A topic serialized by one producer epoch carries ONE
    distinct value, so this aggregates to a handful of rows regardless of
    record count (partial-agg distinct over a constant-ish string); a new
    row appearing IS the schema-change signal, without ever re-reading
    payloads."""
    return df.select(
        F.get_json_object(F.col(json_col), "$.schema").alias("schema_json")
    ).distinct()
