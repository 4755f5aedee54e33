"""Document-state fold for DELTA-ONLY MongoDB change streams
(``capture.mode=change_streams`` — updates carry ``updateDescription``
patches, not post-images).

Reference: the MongoDB connector's ExtractNewDocumentState
(debezium-connector-mongodb/.../transforms/ExtractNewDocumentState.java)
reconstructs row state from document events, applying update-operator
semantics ($set via ``updatedFields``, $unset via ``removedFields``);
MongoDbChangeStreamChangeRecordEmitter.java emits exactly those patch
slots when updateLookup is off. ``sources/mongo.py`` deliberately scopes
its envelope path to full-document mode (an absolute-state merge needs
post-images); THIS module closes the delta gap with the Spark-native
formulation: a **field-level last-write-wins reduce**.

Semantics per document key (all offsets are the packed BSON clusterTime,
Mongo's own total order):

1. *Barrier* = the key's latest ``insert``/``replace``/``delete`` event.
   A ``delete`` barrier kills the document (patches after a delete have
   nothing to apply to and are dropped); an ``insert``/``replace``
   barrier contributes every declared field at the barrier offset.
2. Updates after the barrier contribute (field, value, offset) rows from
   ``updatedFields`` and (field, REMOVE, offset) rows from
   ``removedFields``.
3. Per (key, field): max_by(offset) — a later $unset beats an earlier
   $set and vice versa. Surviving fields reassemble into the typed row.

Scale shape: two groupBys (barrier per key, LWW per (key, field)) and one
equi-join of patches to live barriers — all partial-aggregated, shuffle
width is (key, field, value-string), never whole documents; no window
over the full stream, no driver state. At 100 TB of oplog this is the
same cost class as the engine's narrow reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.mongo import change_stream_schema, cluster_time_to_long
from ..sources.wire import failure_opts

_BARRIERS = ("insert", "replace", "delete")


def reduce_document_patches(
    lines: DataFrame,
    row_fields: list[tuple[str, T.DataType]],
    id_field: str,
    *,
    collection: str | None = None,
    line_col: str = "value",
    failure_handling: str = "skip",
) -> DataFrame:
    """Fold a delta-only change-stream (JSON lines) into final document
    state: one typed row per live key. Columns = the declared row fields.
    """
    if id_field not in dict(row_fields):
        raise ValueError(f"id_field {id_field!r} not in row_fields")
    schema = change_stream_schema(row_fields, id_field)
    d = lines.select(
        F.from_json(F.col(line_col), schema, failure_opts(failure_handling))
        .alias("j")
    ).select("j.*").filter(
        F.col("operationType").isin("insert", "replace", "update", "delete")
    )
    if collection is not None:
        d = d.filter(F.col("ns.coll") == collection)

    tpart = F.col("clusterTime").getField("$timestamp")
    d = d.select(
        F.col("documentKey")["_id"].alias("__key"),
        cluster_time_to_long(tpart["t"], tpart["i"]).alias("__off"),
        "operationType", "fullDocument", "updateDescription",
    )

    # 1. barrier per key: latest insert/replace/delete
    barrier = (
        d.filter(F.col("operationType").isin(*_BARRIERS))
        .groupBy("__key")
        .agg(
            F.max("__off").alias("__b_off"),
            F.max_by("operationType", "__off").alias("__b_op"),
            F.max_by("fullDocument", "__off").alias("__b_doc"),
        )
    )
    live = barrier.filter(F.col("__b_op") != "delete")

    # barrier contributes every declared field, stringly (the patch wire
    # type), at the barrier offset
    barrier_fields = live.select(
        "__key",
        F.col("__b_off").alias("__off"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n, _ in row_fields]),
                F.array(*[
                    F.col("__b_doc")[n].cast("string") for n, _ in row_fields
                ]),
            )
        ).alias("__field", "__value"),
    ).withColumn("__removed", F.lit(False))

    # 2. patches strictly after the key's live barrier
    upd = (
        d.filter(F.col("operationType") == "update")
        .join(live.select("__key", "__b_off"), "__key")
        .filter(F.col("__off") > F.col("__b_off"))
        .select("__key", "__off", "updateDescription")
    )
    set_rows = upd.select(
        "__key", "__off",
        F.explode(F.col("updateDescription")["updatedFields"])
        .alias("__field", "__value"),
    ).withColumn("__removed", F.lit(False))
    rem_rows = upd.select(
        "__key", "__off",
        F.explode(F.col("updateDescription")["removedFields"])
        .alias("__field"),
    ).withColumn("__value", F.lit(None).cast("string")).withColumn(
        "__removed", F.lit(True)
    ).select("__key", "__off", "__field", "__value", "__removed")

    # 3. field-level LWW, then reassemble the typed row
    fin = (
        barrier_fields.unionByName(set_rows).unionByName(rem_rows)
        .groupBy("__key", "__field")
        .agg(
            F.max_by("__value", "__off").alias("__value"),
            F.max_by("__removed", "__off").alias("__removed"),
        )
        .filter(~F.col("__removed"))
        .groupBy("__key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__field", "__value"))
            ).alias("__doc")
        )
    )
    id_type = dict(row_fields)[id_field]
    return fin.select(*[
        (F.col("__key").cast(id_type) if n == id_field
         else F.col("__doc")[n].cast(t)).alias(n)
        for n, t in row_fields
    ])
