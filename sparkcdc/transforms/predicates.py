"""Kafka-Connect predicates: conditionally apply a transform per record.

Reference: Kafka Connect's ``predicates.X.type`` mechanism as Debezium
deployments use it (``transforms.unwrap.predicate=isData`` +
``predicates.isData.type=...TopicNameMatches``); the three stock
predicates are TopicNameMatches, HasHeaderKey, RecordIsTombstone
(org.apache.kafka.connect.transforms.predicates — public Kafka API).

The DataFrame form: a predicate is a ``DataFrame -> Column`` (boolean)
factory. A guarded transform splits the batch by the predicate, applies
the transform to the matching rows, and unions the rest back unchanged —
which is only well-defined when the transform PRESERVES the schema
(per-record pass-through of a schema-changing transform would give one
topic two shapes; Kafka deployments hit the same constraint). Guarded
application asserts schema preservation and raises otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topic_name_matches(pattern: str):
    """TopicNameMatches: entire-name regex over the record's topic — here
    the qualified ``source.db``.``source.table`` (the topic the reference
    would route this envelope to)."""

    def _pred(df: DataFrame) -> Column:
        qualified = F.concat_ws(
            ".", F.col("source.db"), F.col("source.table")
        )
        return qualified.rlike(f"^(?:{pattern})$")

    return _pred


def has_header_key(name: str):
    """HasHeaderKey: the record carries a header with this key — headers
    are top-level columns in the DataFrame model (see HeaderToValue), so
    the predicate is column-present AND value-non-null (an absent column
    is constant false)."""

    def _pred(df: DataFrame) -> Column:
        if name not in df.columns:
            return F.lit(False)
        return F.col(name).isNotNull()

    return _pred


def record_is_tombstone():
    """RecordIsTombstone: null-value record (the envelope's tombstone
    flag; a frame without the flag has no tombstones)."""

    def _pred(df: DataFrame) -> Column:
        if "tombstone" not in df.columns:
            return F.lit(False)
        return F.coalesce(F.col("tombstone"), F.lit(False))

    return _pred


PREDICATES = {
    "TopicNameMatches": topic_name_matches,
    "HasHeaderKey": has_header_key,
    "RecordIsTombstone": record_is_tombstone,
}


def guard(transform, predicate, negate: bool = False):
    """Apply ``transform`` only to rows matching ``predicate``; the rest
    pass through unchanged (Kafka Connect's per-record predicate gating).
    Requires a schema-preserving transform — asserted, since a split
    batch can only be unioned back under one schema."""

    def _apply(df: DataFrame) -> DataFrame:
        cond = predicate(df)
        if negate:
            cond = ~cond
        cond = F.coalesce(cond, F.lit(False))
        hit = transform(df.filter(cond))
        # compare names+types only: schema-preserving transforms may flip
        # nullability or field metadata (e.g. when() without otherwise()
        # makes a column nullable) and unionByName still succeeds
        shape = lambda s: [(f.name, f.dataType) for f in s.fields]  # noqa: E731
        if shape(hit.schema) != shape(df.schema):
            raise ValueError(
                "predicate-guarded transforms must preserve the schema; "
                f"got {[f.name for f in hit.schema.fields]} from "
                f"{[f.name for f in df.schema.fields]} — apply "
                "schema-changing transforms unconditionally instead"
            )
        return hit.unionByName(df.filter(~cond))

    return _apply
