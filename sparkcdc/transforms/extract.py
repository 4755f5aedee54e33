"""T1/T2/T11 — envelope flattening and before/after diffing.

Reference:
- ExtractNewRecordState (the "unwrap" SMT): core/transforms/
  ExtractNewRecordState.java:104-166, AbstractExtractNewRecordState.java:65-118,
  delete-handling modes ExtractNewRecordStateConfigDefinition.java:16-75
  (drop | rewrite (+__deleted) | tombstone | rewrite-with-tombstone).
- ExtractChangedRecordState: core/transforms/ExtractChangedRecordState.java
  (emit changed/unchanged field-name lists).
- ExtractSchemaToNewRecord: core/transforms/ExtractSchemaToNewRecord.java.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: prefix Debezium uses for metadata columns pulled into the flat record
FIELD_PREFIX = "__"


def _meta_col(df: DataFrame, spec: str) -> Column:
    """Resolve an add.fields spec like 'op', 'ts_ms', 'source.lsn'."""
    if spec.startswith("source."):
        return F.col(spec)
    return F.col(spec)


def extract_new_record_state(
    delete_handling: str = "drop",
    add_fields: list[str] | None = None,
    drop_fields: list[str] | None = None,
    route_by_field: str | None = None,
    add_headers: list[str] | None = None,
):
    """Envelope -> flat row (``after.*``).

    delete_handling:
      - ``drop``: delete + tombstone records removed
      - ``rewrite``: deletes kept as ``before.*`` rows with ``__deleted=true``
        (ExtractNewRecordStateConfigDefinition.java:40-49)
      - ``tombstone``: deletes become all-null rows keyed by before (the
        flat-record analog of a Kafka tombstone)
      - ``rewrite-with-tombstone``: rewrite rows AND keep tombstones
    add_fields: envelope metadata copied in as ``__``-prefixed columns
      (e.g. ``["op", "ts_ms", "source.file", "source.pos"]``).
    add_headers: same metadata specs emitted as HEADER columns
      (``__header_``-prefixed — headers are top-level columns in the
      DataFrame model, see HeaderToValue), the ``add.headers`` config.
    drop_fields: row fields removed from the output (drop.fields.* configs).
    route_by_field: copies that row field into ``__route`` (route.by.field).
    """
    add_fields = add_fields or []
    add_headers = add_headers or []
    drop_fields = drop_fields or []

    def _apply(df: DataFrame) -> DataFrame:
        row_fields = [
            f.name for f in df.schema["after"].dataType.fields
            if f.name not in drop_fields
        ]
        is_del = F.col("op") == "d"
        is_tomb = F.col("tombstone") if "tombstone" in df.columns else F.lit(False)

        if delete_handling == "drop":
            work = df.filter(~is_del & ~is_tomb)
            cols = [F.col(f"after.{c}").alias(c) for c in row_fields]
            deleted = None
        elif delete_handling in ("rewrite", "rewrite-with-tombstone"):
            keep_tomb = delete_handling == "rewrite-with-tombstone"
            work = df if keep_tomb else df.filter(~is_tomb)
            cols = [
                F.when(is_del & ~is_tomb, F.col(f"before.{c}"))
                .otherwise(F.col(f"after.{c}"))
                .alias(c)
                for c in row_fields
            ]
            deleted = F.when(is_tomb, F.lit(None).cast("string")).otherwise(
                F.when(is_del, F.lit("true")).otherwise(F.lit("false"))
            ).alias(FIELD_PREFIX + "deleted")
        elif delete_handling == "tombstone":
            work = df.filter(~is_tomb)
            cols = [
                F.when(is_del, F.lit(None).cast(df.schema["after"].dataType[c].dataType))
                .otherwise(F.col(f"after.{c}"))
                .alias(c)
                for c in row_fields
            ]
            deleted = None
        else:
            raise ValueError(f"unknown delete_handling {delete_handling}")

        extra = [
            _meta_col(df, s).alias(FIELD_PREFIX + s.replace(".", "_"))
            for s in add_fields
        ]
        extra += [
            _meta_col(df, s).alias(FIELD_PREFIX + "header_" + s.replace(".", "_"))
            for s in add_headers
        ]
        if deleted is not None:
            extra.append(deleted)
        if route_by_field:
            extra.append(F.col(f"after.{route_by_field}").alias(FIELD_PREFIX + "route"))
        return work.select(*cols, *extra)

    return _apply


def extract_changed_record_state(
    changed_name: str = "__changed", unchanged_name: str | None = None
):
    """For update events, compute which row fields actually changed
    (null-safe comparison of before vs after), as an array column —
    the Spark form of the reference's ChangedFields headers."""

    def _apply(df: DataFrame) -> DataFrame:
        row_fields = [f.name for f in df.schema["after"].dataType.fields]
        is_upd = F.col("op") == "u"
        changed = F.filter(
            F.array(*[
                F.when(
                    ~F.col(f"before.{c}").eqNullSafe(F.col(f"after.{c}")), F.lit(c)
                )
                for c in row_fields
            ]),
            lambda x: x.isNotNull(),
        )
        out = df.withColumn(changed_name, F.when(is_upd, changed))
        if unchanged_name:
            unchanged = F.filter(
                F.array(*[
                    F.when(
                        F.col(f"before.{c}").eqNullSafe(F.col(f"after.{c}")), F.lit(c)
                    )
                    for c in row_fields
                ]),
                lambda x: x.isNotNull(),
            )
            out = out.withColumn(unchanged_name, F.when(is_upd, unchanged))
        return out

    return _apply


def extract_schema_to_new_record(
    epoch_boundaries: list[tuple[int, int]] | None = None,
    epoch_col: str = "__schema_epoch",
    schema_col: str = "__schema",
):
    """T11 ExtractSchemaToNewRecord
    (core/transforms/ExtractSchemaToNewRecord.java): copy the source
    schema metadata into each record —

    - ``schema_col``: the record's value-schema descriptor (field
      name/type pairs of the ``after`` image) as a JSON string, the
      Connect-schema analog;
    - ``epoch_col``: the schema epoch in force when the event was
      produced, resolved from ``epoch_boundaries`` = [(offset, epoch),
      ...] (a SchemaHistory journal rendering: epoch e applies from that
      offset on). Resolution is a literal CASE chain — no join, no
      lookup table; the boundary list is tiny (one entry per DDL event).

    Without boundaries the epoch is a ``schema_epoch`` column if the
    stream carries one, else 0.
    """

    def _apply(df: DataFrame) -> DataFrame:
        fields = [
            {"field": f.name, "type": f.dataType.simpleString()}
            for f in df.schema["after"].dataType.fields
        ]
        import json as _json

        out = df.withColumn(schema_col, F.lit(_json.dumps(fields)))
        if epoch_boundaries:
            epoch = F.lit(0)
            for off, ep in sorted(epoch_boundaries):
                epoch = F.when(F.col("offset") >= off, F.lit(ep)).otherwise(epoch)
            return out.withColumn(epoch_col, epoch)
        if "schema_epoch" in df.columns:
            return out.withColumn(epoch_col, F.col("schema_epoch"))
        return out.withColumn(epoch_col, F.lit(0))

    return _apply
