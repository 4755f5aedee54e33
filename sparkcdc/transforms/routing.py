"""T4/T5/T6/T7 — routing transforms.

Reference:
- ContentBasedRouter: debezium-scripting/.../transforms/ContentBasedRouter.java:23
- ByLogicalTableRouter: core/transforms/ByLogicalTableRouter.java:58-75
  (regex topic rewrite to merge shard tables; key augmented with
  __dbz__physicalTableIdentifier)
- PartitionRouting: core/transforms/partitions/PartitionRouting.java:44-241
  (partition = hash(payload fields) % N — exactly Spark HashPartitioning)
- Outbox EventRouter: core/transforms/outbox/EventRouter.java:22 +
  EventRouterDelegate.java
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUTE_COL = "__route"
PHYSICAL_TABLE_COL = "__dbz__physicalTableIdentifier"


def content_based_router(expression: str, route_col: str = ROUTE_COL):
    """Compute the destination (topic/table) per record from a SQL
    expression; downstream writes ``partitionBy(route_col)``."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(route_col, F.expr(expression))

    return _apply


def by_logical_table_router(
    topic_regex: str,
    topic_replacement: str,
    key_enforce_uniqueness: bool = True,
    route_col: str = ROUTE_COL,
    key_field_name: str = PHYSICAL_TABLE_COL,
    key_field_regex: str | None = None,
    key_field_replacement: str | None = None,
):
    """Merge physical shard tables (customers_shard_1, _2, ...) into one
    logical route; keep the physical id as an extra key column so rows from
    different shards with the same PK don't collide.

    ``key_field_name`` / ``key_field_regex`` / ``key_field_replacement``
    are the reference's ``key.field.*`` configs
    (ByLogicalTableRouter.java:87-115): rename the physical-id key column
    and/or rewrite its value (e.g. keep only the shard number instead of
    the full ``db.table`` identifier)."""
    if key_field_regex and not key_field_replacement:
        raise ValueError(
            "key.field.regex requires a non-empty key.field.replacement"
        )

    def _apply(df: DataFrame) -> DataFrame:
        full = F.concat_ws(".", F.col("source.db"), F.col("source.table"))
        out = df.withColumn(
            route_col, F.regexp_replace(full, topic_regex, topic_replacement)
        )
        if key_enforce_uniqueness:
            keyval = full
            if key_field_regex:
                keyval = F.regexp_replace(
                    full, key_field_regex, key_field_replacement)
            out = out.withColumn(key_field_name, keyval)
        return out

    return _apply


def partition_routing(
    partition_payload_fields: list[str], partition_topic_num: int,
    partition_col: str = "part_id", hash_mode: str = "fast",
):
    """Recompute part_id = pmod(hash(fields), N). Fields are specified like
    the reference's ``partition.payload.fields`` (e.g. ``after.repo``).
    In the engine this also doubles as the explicit pre-merge repartition
    key derivation (north_rule: repartition by PK before merge apply).

    hash_mode: ``fast`` = xxhash64 (engine-internal routing); ``stable`` =
    sha256-derived hash reproducible by external oracles (the reference
    offers java/murmur the same way, PartitionRouting.java:59,93)."""

    def _apply(df: DataFrame) -> DataFrame:
        cols = [F.col(c) for c in partition_payload_fields]
        if hash_mode == "stable":
            from ..functions.hashing import stable_hash64

            h = stable_hash64(*cols)
        else:
            h = F.xxhash64(*cols)
        return df.withColumn(
            partition_col,
            F.pmod(h, F.lit(partition_topic_num)).cast("int"),
        )

    return _apply


def outbox_event_router(
    field_event_key: str = "aggregateid",
    field_event_type: str = "type",
    field_payload: str = "payload",
    route_by_field: str = "aggregatetype",
    route_col: str = ROUTE_COL,
    additional_fields: list[str | tuple[str, str]] | None = None,
    expand_json_payload: bool = False,
    payload_schema=None,
):
    """Outbox pattern: events are rows INSERTed into an outbox table; route
    by aggregatetype, key by aggregateid, emit the payload as the value.
    Input: flat outbox rows (after ExtractNewRecordState) with the four
    canonical outbox columns.

    Full-config parity with the reference
    (core/transforms/outbox/EventRouterDelegate.java):

    - ``additional_fields`` mirrors ``table.fields.additional.placement``:
      each entry is an outbox column to carry along — ``"col"`` places it
      as an envelope field ``__col`` (placement=envelope), ``("col",
      "header")`` as a header-style column ``__header_col`` (headers are
      plain columns in this model, cf. HeaderToValue).
    - ``expand_json_payload=True`` mirrors ``table.expand.json.payload``:
      the string payload is parsed into a typed struct. ``payload_schema``
      (DDL string or StructType) is required — Debezium infers from the
      JSON per record; a columnar engine declares the schema once and gets
      a vectorized ``from_json`` instead of per-record inference.
    """

    def _apply(df: DataFrame) -> DataFrame:
        payload_col = F.col(field_payload)
        if expand_json_payload:
            if payload_schema is None:
                raise ValueError("expand_json_payload requires payload_schema")
            payload_col = F.from_json(payload_col, payload_schema)
        cols = [
            F.col(field_event_key).alias("key"),
            F.col(field_event_type).alias("event_type"),
            payload_col.alias("payload"),
            F.col(route_by_field).alias(route_col),
        ]
        for af in additional_fields or []:
            name, placement = (af, "envelope") if isinstance(af, str) else af
            prefix = "__header_" if placement == "header" else "__"
            cols.append(F.col(name).alias(f"{prefix}{name}"))
        return df.select(*cols)

    return _apply
