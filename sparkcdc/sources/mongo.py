"""MongoDB change-stream documents → envelopes (closes the S7 gap).

The reference's MongoDB connector tails ``db.watch()`` change streams and
maps ChangeStreamDocuments into Debezium envelopes
(debezium-connector-mongodb: MongoDbStreamingChangeEventSource dispatches
on ``operationType``; offsets carry the resume token and the BSON
clusterTime). No MongoDB server exists in this sandbox, so the *server
tail* stays out of scope — but the WIRE FORMAT is public (MongoDB's
documented change-stream event shape in relaxed extended JSON), and a
Spark ingest of it is what a lake-first CDC user runs: a small tailer
ships change-stream JSON to files/Kafka, Spark parses it into envelopes
and replays. Mirrors the wal2json S6 adapter (wal2json.py) one-for-one.

Parsing is pure Catalyst — one ``from_json`` with a typed schema built
from the declared row fields, zero Python UDFs — so it runs at scan
speed and column-prunes.

One relaxed-extended-JSON object per line::

    {"_id": {"_data": "8265..."},
     "operationType": "insert" | "update" | "replace" | "delete" | ...,
     "clusterTime": {"$timestamp": {"t": 1700000000, "i": 7}},
     "ns": {"db": "app", "coll": "events"},
     "documentKey": {"_id": 42},
     "fullDocument": {...},                  # insert/replace; update too
                                             # under updateLookup
     "fullDocumentBeforeChange": {...},      # only with pre-images on
     "updateDescription": {"updatedFields": {...},
                           "removedFields": [...]}}

op mapping (Envelope.java:37-63 via the Mongo connector's dispatch):
insert→c, update/replace→u, delete→d. ``drop`` / ``rename`` /
``dropDatabase`` / ``invalidate`` are stream-control events (the
connector stops or re-snapshots the collection) — filtered here like
wal2json's B/C markers.

Capture mode: the supported shape is the reference's recommended
``capture.mode=change_streams_update_full`` (updateLookup): updates
carry the full post-image in ``fullDocument``, which the per-key LWW
reduce requires. A delta-only stream (``capture.mode=change_streams``,
no full document on updates) cannot feed an absolute-state merge — for
that shape use ``transforms.document.reduce_document_patches``, the
field-level LWW fold over ``updateDescription`` patches (or the
engine's refetch strategy against the source).

Offsets: a BSON Timestamp ``(t, i)`` is the 64-bit value
``(t << 32) | i`` — Mongo's own total order across the oplog — so that
long IS the envelope ``offset`` and resume/fencing plus the
offset-vector algebra work unchanged. The opaque resume token
(``_id._data``) is carried through ``source.gtid`` (and ``source.file``)
for operators that resume a real ``watch()`` cursor by token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import transaction_struct
from .wire import assemble_envelope, failure_opts, op_lookup

_OP = {"insert": "c", "update": "u", "replace": "u", "delete": "d"}


def cluster_time_to_long(t, i) -> F.Column:
    """BSON Timestamp ``(t seconds, i increment)`` → ``(t<<32) | i``."""
    return F.shiftleft(t.cast("long"), 32).bitwiseOR(i.cast("long"))


def long_to_cluster_time(off) -> tuple[F.Column, F.Column]:
    """Inverse of :func:`cluster_time_to_long` — ``(t, i)`` columns."""
    off = F.col(off) if isinstance(off, str) else off
    return (
        F.shiftrightunsigned(off, 32).cast("long"),
        off.bitwiseAND(F.lit(0xFFFFFFFF)).cast("long"),
    )


def change_stream_schema(
    row_fields: list[tuple[str, T.DataType]], id_field: str
) -> T.StructType:
    """from_json schema for one change-stream line, typed by the captured
    collection's declared row fields (``fullDocument`` parses straight
    into the sink row struct; ``documentKey`` carries the ``_id`` typed
    as the mapped id field)."""
    row_struct = T.StructType(
        [T.StructField(n, t, True) for n, t in row_fields]
    )
    id_type = dict(row_fields)[id_field]
    ts = T.StructType([
        T.StructField("t", T.LongType(), True),
        T.StructField("i", T.LongType(), True),
    ])
    return T.StructType([
        T.StructField("_id", T.StructType(
            [T.StructField("_data", T.StringType(), True)]), True),
        T.StructField("operationType", T.StringType(), True),
        T.StructField("clusterTime", T.StructType(
            [T.StructField("$timestamp", ts, True)]), True),
        T.StructField("ns", T.StructType([
            T.StructField("db", T.StringType(), True),
            T.StructField("coll", T.StringType(), True),
        ]), True),
        T.StructField("documentKey", T.StructType(
            [T.StructField("_id", id_type, True)]), True),
        T.StructField("fullDocument", row_struct, True),
        T.StructField("fullDocumentBeforeChange", row_struct, True),
        T.StructField("updateDescription", T.StructType([
            T.StructField("updatedFields",
                          T.MapType(T.StringType(), T.StringType()), True),
            T.StructField("removedFields",
                          T.ArrayType(T.StringType()), True),
        ]), True),
    ])


def change_stream_to_envelopes(
    lines: DataFrame,
    row_fields: list[tuple[str, T.DataType]],
    id_field: str,
    *,
    collection: str | None = None,
    n_parts: int = 8,
    line_col: str = "value",
    source_name: str = "sparkcdc",
    failure_handling: str = "skip",
) -> DataFrame:
    """Parse change-stream JSON lines into the engine's envelope schema.

    ``id_field`` names the row field the Mongo ``_id`` maps to (the sink
    key column — the Mongo connector keys every event on ``_id``).
    ``collection`` filters to one captured collection, like wal2json's
    ``table=``. Control events (drop/rename/invalidate/...) and other
    collections' changes are dropped here. Works unmodified on a
    streaming DataFrame (stateless projections only).

    ``failure_handling``: ``skip`` (default) lets unparseable lines fall
    out with the control events the op filter drops; ``fail`` parses
    FAILFAST so the first malformed line aborts the batch."""
    if id_field not in dict(row_fields):
        raise ValueError(f"id_field {id_field!r} not in row_fields")
    opts = failure_opts(failure_handling)
    schema = change_stream_schema(row_fields, id_field)
    j = F.from_json(F.col(line_col), schema, opts).alias("j")
    work = lines.select(j).select("j.*").filter(
        F.col("operationType").isin(*_OP)
    )
    if collection is not None:
        work = work.filter(F.col("ns.coll") == collection)

    op = op_lookup(_OP, F.col("operationType"))
    tpart = F.col("clusterTime").getField("$timestamp")
    offset = cluster_time_to_long(tpart["t"], tpart["i"])
    ts_ms = tpart["t"] * F.lit(1000)
    token = F.col("_id")["_data"]

    after = F.col("fullDocument")
    # before: real pre-image when the stream carries one; else — for u/d,
    # where only the key is knowable — a key-only row (the Mongo
    # connector's delete 'before' is exactly the key; wal2json's identity
    # row is the same shape)
    key_only = F.struct(*[
        (F.col("documentKey")["_id"] if n == id_field
         else F.lit(None).cast(t)).alias(n)
        for n, t in row_fields
    ])
    has_before = F.col("operationType").isin("update", "replace", "delete")
    before = F.coalesce(
        F.col("fullDocumentBeforeChange"),
        F.when(has_before, key_only),
    )
    key = F.coalesce(after[id_field], F.col("documentKey")["_id"])
    src = F.struct(
        F.lit(source_name).alias("name"),
        F.col("ns")["db"].alias("db"),
        F.col("ns")["coll"].alias("table"),
        F.lit("false").alias("snapshot"),
        token.alias("file"),
        offset.alias("pos"),
        F.lit(None).cast("int").alias("row"),
        token.alias("gtid"),
        ts_ms.alias("ts_ms"),
    )
    return assemble_envelope(
        work, op=op, ts_ms=ts_ms, before=before,
        after=F.when(F.col("operationType") != "delete", after),
        source=src, transaction=F.lit(None).cast(transaction_struct()),
        key=[key], offset=offset, n_parts=n_parts,
    )


def events_to_change_stream_docs(
    events: DataFrame,
    *,
    db: str = "app",
    coll: str = "events",
    base_ts: int = 1_700_000_000,
    capture_mode: str = "update_lookup",
) -> DataFrame:
    """Deterministic change-stream emitter over the driver's ``events``
    table — the synthetic ``watch()`` output for tests/benchmarks (the
    role mongod plays server-side). One insert/update/delete document per
    event (op per events_adapter.OP_MAP), updateLookup shape (updates
    carry the full post-image). clusterTime packs the event order:
    ``t = base_ts + event_id div 1000``, ``i = event_id mod 1000`` —
    one "second" per 1000 oplog entries, so
    ``offset = (t<<32)|i`` is unique and monotone in event_id and the
    codec roundtrips exactly. The resume token is the realistic opaque
    form: hex over the packed position, '82'-prefixed like real v2
    keystring tokens.

    Emitted via ``to_json(..., ignoreNullFields)`` so deletes carry no
    fullDocument slot at all, exactly like the real stream.

    ``capture_mode``: ``update_lookup`` (default) gives updates the full
    post-image, the shape ``change_stream_to_envelopes`` requires;
    ``delta`` (the reference's ``capture.mode=change_streams``) puts the
    post-image ONLY on inserts — updates carry just ``updateDescription``
    — the shape ``transforms.document.reduce_document_patches`` folds."""
    act = (
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    # exact integer div (matches a SQL oracle's `div`; no float rounding)
    t = F.lit(base_ts) + F.expr("CAST(event_id AS BIGINT) div 1000")
    i = F.pmod(F.col("event_id").cast("long"), F.lit(1000))
    offset = cluster_time_to_long(t, i)
    token = F.concat(F.lit("82"), F.lpad(F.hex(offset), 16, "0"))
    if capture_mode not in ("update_lookup", "delta"):
        raise ValueError(f"unknown capture_mode {capture_mode!r}")
    has_full = (
        (act == "insert") if capture_mode == "delta" else (act != "delete")
    )
    full_doc = F.when(
        has_full,
        F.struct(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_type").alias("event_type"),
            F.col("value").cast("double").alias("value"),
            F.col("props").alias("props"),
        ),
    )
    upd = F.when(
        act == "update",
        F.struct(
            F.create_map(
                F.lit("event_type"), F.col("event_type"),
                F.lit("value"), F.col("value").cast("string"),
            ).alias("updatedFields"),
            F.array().cast("array<string>").alias("removedFields"),
        ),
    )
    doc = F.struct(
        F.struct(token.alias("_data")).alias("_id"),
        act.alias("operationType"),
        F.struct(
            F.struct(t.alias("t"), i.alias("i")).alias("$timestamp")
        ).alias("clusterTime"),
        F.struct(F.lit(db).alias("db"), F.lit(coll).alias("coll")).alias("ns"),
        F.struct(F.col("user_id").cast("long").alias("_id")).alias("documentKey"),
        full_doc.alias("fullDocument"),
        upd.alias("updateDescription"),
    )
    return events.select(
        F.to_json(doc, {"ignoreNullFields": "true"}).alias("value")
    )
