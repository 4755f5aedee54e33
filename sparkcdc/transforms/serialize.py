"""T16 — envelope serialization: JSON / CloudEvents wire formats and the
vectorized parse path.

Reference: core/converters/CloudEventsConverter.java:89 (CloudEvents
wrapping), debezium-api format contracts (Json/Avro/Protobuf/Binary). The
Spark-native forms:

- ``envelope_to_json`` / ``envelope_to_cloudevents`` — ``to_json`` over the
  envelope struct (JVM-side, codegen).
- ``parse_envelope_json`` — ``from_json`` with the explicit envelope schema:
  the **vectorized envelope parse** of the north_star (a Kafka source's
  value column → typed envelope struct) — no Python anywhere.
- ``parse_envelope_json_arrow`` — the same parse as an Arrow-batched pandas
  UDF, for payloads needing Python-side normalization before typing (the
  input_hint's "vectorized pandas/Arrow UDFs, no per-row Python" escape
  hatch). Prefer ``from_json``; this exists for the cases built-ins can't
  express (e.g. tolerant parsing of mixed/dirty producers).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import envelope_schema


def envelope_to_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Envelope rows → one JSON string per record (the Kafka topic value)."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias(out_col)
    )


CE_TYPE = "io.debezium.connector.spark.DataChangeEvent"

#: CloudEvents extension attributes (CloudEventsConverter: envelope
#: metadata re-emitted as ``iodebezium``-prefixed extension attributes;
#: CE extension values are strings)
def _ce_extension_cols(df: DataFrame) -> list[tuple[str, F.Column]]:
    exts = [
        ("iodebeziumop", F.col("op")),
        ("iodebeziumtsms", F.col("ts_ms").cast("string")),
        ("iodebeziumname", F.col("source.name")),
        ("iodebeziumdb", F.col("source.db")),
        ("iodebeziumtable", F.col("source.table")),
        ("iodebeziumsnapshot", F.col("source.snapshot")),
    ]
    if "transaction" in df.columns:
        exts.append(("iodebeziumtxid", F.col("transaction.id")))
    return exts


def envelope_to_cloudevents(
    df: DataFrame,
    source_uri: str = "/sparkcdc/source_code_repos",
    out_col: str = "value",
    data_format: str = "json",
    row_fields: list[tuple[str, T.DataType]] | None = None,
) -> DataFrame:
    """CloudEvents 1.0 JSON envelope (CloudEventsConverter.java:89):
    id/source/specversion/type + the Debezium envelope as the payload.

    ``data_format`` follows the reference's two payload formats:
    - ``'json'``: the envelope nests as the structured ``data`` member;
    - ``'avro'``: the envelope is the Avro-binary wire record
      (transforms/avro.py) carried as ``data_base64`` with
      ``datacontenttype='application/avro'`` (CloudEvents 1.0 JSON-format
      binary-data rule) — the CloudEvents-with-Avro-payload composition of
      CloudEventsConverter.java:89;
    - ``'protobuf'``: same binary-data rule with the proto3 wire record
      (transforms/protobuf.py) and
      ``datacontenttype='application/protobuf'`` — the converter's third
      data format (CloudEventsConverter.java:89 Json/Avro/Protobuf)."""
    exts = _ce_extension_cols(df)
    if data_format == "json":
        ce = F.struct(
            F.concat_ws(":", F.col("part_id"), F.col("offset")).alias("id"),
            F.lit(source_uri).alias("source"),
            F.lit("1.0").alias("specversion"),
            F.lit(CE_TYPE).alias("type"),
            F.date_format(
                (F.col("ts_ms") / 1000).cast("timestamp"),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("time"),
            *[c.alias(n) for n, c in exts],
            F.struct(*[F.col(c) for c in df.columns]).alias("data"),
        )
        return df.select(F.to_json(ce).alias(out_col))
    if data_format in ("avro", "protobuf"):
        work = df
        for n, c in exts:
            work = work.withColumn(n, c)
        names = [n for n, _ in exts]
        if data_format == "avro":
            from .avro import envelope_to_avro

            wire = envelope_to_avro(work, row_fields, passthrough=names)
            content_type = "application/avro"
        else:
            from .protobuf import envelope_to_protobuf

            wire = envelope_to_protobuf(
                work, row_fields, passthrough=tuple(names)
            )
            content_type = "application/protobuf"
        ce = F.struct(
            F.concat_ws(":", F.col("part_id"), F.col("offset")).alias("id"),
            F.lit(source_uri).alias("source"),
            F.lit("1.0").alias("specversion"),
            F.lit(CE_TYPE).alias("type"),
            F.lit(content_type).alias("datacontenttype"),
            *[F.col(n).alias(n) for n, _ in exts],
            F.base64(F.col("value")).alias("data_base64"),
        )
        return wire.select(F.to_json(ce).alias(out_col))
    raise ValueError(f"unknown CloudEvents data_format {data_format!r}")


def parse_cloudevents(
    df: DataFrame,
    row_fields: list[tuple[str, T.DataType]] | None = None,
    json_col: str = "value",
    data_format: str = "json",
) -> DataFrame:
    """Consume-side of :func:`envelope_to_cloudevents`: CloudEvents JSON →
    typed envelope DataFrame, dispatching on the payload format (a topic
    is format-homogeneous, as in the reference's converter config)."""
    if data_format == "json":
        schema = T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("specversion", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("time", T.StringType()),
            T.StructField("data", envelope_schema(row_fields)),
        ])
        return (
            df.select(F.from_json(F.col(json_col), schema).alias("e"))
            .select("e.data.*")
        )
    if data_format in ("avro", "protobuf"):
        ce_schema = (
            "id string, source string, specversion string, type string, "
            "datacontenttype string, data_base64 string"
        )
        wire = df.select(
            F.unbase64(
                F.from_json(F.col(json_col), ce_schema)["data_base64"]
            ).alias("value")
        )
        if data_format == "avro":
            from .avro import parse_envelope_avro

            return parse_envelope_avro(wire, row_fields)
        from .protobuf import parse_envelope_protobuf

        return parse_envelope_protobuf(wire, row_fields)
    raise ValueError(f"unknown CloudEvents data_format {data_format!r}")


def parse_envelope_json(
    df: DataFrame,
    row_fields: list[tuple[str, T.DataType]] | None = None,
    json_col: str = "value",
    failure_handling: str = "keep",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """JSON strings → typed envelope structs via ``from_json`` — fully
    vectorized JVM parse, the hot ingestion path.

    ``failure_handling`` is ``event.processing.failure.handling.mode``
    (CommonConnectorConfig.EVENT_PROCESSING_FAILURE_HANDLING_MODE) applied
    at the deserialization boundary — a line ``from_json`` cannot parse is
    the Kafka-consumer deserialization error of the reference:

    - ``fail``: raise on the first malformed line (reference default) —
      FAILFAST parse mode, so the batch aborts executor-side with the
      offending payload in the exception, no driver-side scan;
    - ``skip``: drop malformed lines (the reference logs-and-skips);
      pair with :func:`corrupt_json_records` to quarantine them (K8 DLQ);
    - ``keep``: pass the all-null parse through (caller-side handling —
      the engine's ``dlq_enabled`` path picks these up as key-less events).

    ``extra_cols``: input column names carried through alongside the
    parsed envelope (transport metadata — e.g. Kafka topic/partition/
    offset — that the payload does not repeat).
    """
    schema = envelope_schema(row_fields)
    raw = F.col(json_col)
    if failure_handling == "keep":
        # PERMISSIVE parse: malformed lines become all-null envelopes
        parsed = df.select(F.from_json(raw, schema).alias("e"), *extra_cols)
    elif failure_handling == "fail":
        # FAILFAST aborts the task on the first malformed line, with the
        # offending payload in the SparkException — no driver-side scan
        parsed = df.select(
            F.from_json(raw, schema, {"mode": "FAILFAST"}).alias("e"),
            *extra_cols,
        )
    elif failure_handling == "skip":
        # NULL wire values (Kafka tombstone values) carry no envelope and
        # are not tagged corrupt by the parser — drop them here too so
        # skip mode emits only well-formed envelopes
        tagged = _tagged_corrupt_parse(df.filter(raw.isNotNull()), schema,
                                       raw, extra_cols)
        parsed = tagged.filter(F.col("e.__corrupt_record").isNull()).select(
            F.col("e").dropFields("__corrupt_record").alias("e"), *extra_cols
        )
    else:
        raise ValueError(
            f"unknown event.processing.failure.handling.mode {failure_handling!r}"
        )
    return parsed.select("e.*", *extra_cols)


def _tagged_corrupt_parse(df: DataFrame, schema: T.StructType, raw,
                          extra_cols: tuple[str, ...] = ()):
    """PERMISSIVE parse with ``columnNameOfCorruptRecord`` — malformed lines
    carry their raw payload in ``e.__corrupt_record``, well-formed lines
    leave it null (Spark's JSON corrupt-record convention; ``from_json``
    returns an all-null struct otherwise, so null-field checks can't
    distinguish corruption from a genuinely null-heavy record)."""
    tag_schema = T.StructType(
        list(schema.fields) + [T.StructField("__corrupt_record", T.StringType())]
    )
    return df.select(
        F.from_json(
            raw, tag_schema, {"columnNameOfCorruptRecord": "__corrupt_record"}
        ).alias("e"),
        *extra_cols,
    )


def corrupt_json_records(
    df: DataFrame,
    row_fields: list[tuple[str, T.DataType]] | None = None,
    json_col: str = "value",
) -> DataFrame:
    """The raw lines :func:`parse_envelope_json` cannot parse — the DLQ
    feed for ``failure_handling='skip'`` pipelines (K8: quarantine carries
    the original payload, ErrorReporter.report semantics)."""
    schema = envelope_schema(row_fields)
    raw = F.col(json_col)
    tagged = _tagged_corrupt_parse(df, schema, raw)
    return tagged.filter(F.col("e.__corrupt_record").isNotNull()).select(
        F.col("e.__corrupt_record").alias("raw")
    )


def parse_envelope_json_arrow(
    df: DataFrame,
    row_fields: list[tuple[str, T.DataType]] | None = None,
    json_col: str = "value",
) -> DataFrame:
    """Arrow-batched pandas parse of envelope JSON — same output schema as
    ``parse_envelope_json``. Batch-at-a-time (no per-row Python UDF calls);
    use only when parsing needs Python-side tolerance."""
    schema = envelope_schema(row_fields)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            records = [json.loads(v) if v else {} for v in pdf[json_col]]
            # dict.get keeps absent fields as None (JSON serializers drop
            # null fields); building per-schema avoids NaN-typed columns
            rows = [{c: r.get(c) for c in cols} for r in records]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(json_col).mapInPandas(parse, schema)


#: the CloudEvent attributes the saveable-form transform may map
#: (CloudEventsMaker.FieldName.* in the reference)
CE_SAVEABLE_FIELDS = (
    "id", "source", "specversion", "type", "datacontenttype",
    "dataschema", "time", "data",
)


def convert_cloudevent_to_saveable_form(
    df: DataFrame,
    fields_mapping: list[str],
    json_col: str = "value",
) -> DataFrame:
    """ConvertCloudEventToSaveableForm analog (reference:
    debezium-connector-jdbc/.../transforms/
    ConvertCloudEventToSaveableForm.java): flatten a CloudEvent into one
    database column per mapped attribute so a JDBC-shaped sink can store
    it.

    ``fields_mapping`` uses the reference's config syntax — a list of
    ``"cefield"`` or ``"cefield:column"`` pairs (``fields.mapping``);
    unmapped attributes are dropped, mapped ones become columns in
    mapping order. ``data`` arrives as its JSON text regardless of
    whether the event nested it as a structure or a string (the
    reference's JsonConverter does the same flatten); structured
    consumers ``from_json`` it onward.

    Serializer type ``json`` (the converter family this repo ships —
    binary-payload events carry ``data_base64``, map that name to keep
    the base64 text). One ``from_json`` + projection, zero UDFs.
    """
    if not fields_mapping:
        return df
    pairs: list[tuple[str, str]] = []
    for raw in fields_mapping:
        parts = raw.split(":", 1)
        ce_field = parts[0]
        if ce_field not in CE_SAVEABLE_FIELDS + ("data_base64",):
            raise ValueError(
                f"fields.mapping entry {raw!r}: unknown CloudEvent "
                f"attribute {ce_field!r}"
            )
        pairs.append((ce_field, parts[1] if len(parts) > 1 else ce_field))
    schema = ", ".join(
        f"`{f}` string" for f in dict.fromkeys(f for f, _ in pairs)
    )
    e = F.from_json(F.col(json_col), schema).alias("e")
    return df.select(e).select(
        *[F.col("e")[f].alias(col) for f, col in pairs]
    )
