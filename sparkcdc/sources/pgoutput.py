"""pgoutput (PostgreSQL's built-in logical replication plugin) → envelopes.

The reference's DEFAULT Postgres decoder
(debezium-connector-postgres/.../connection/pgoutput/PgOutputMessageDecoder.java):
wal2json is an optional plugin, pgoutput ships with the server. No server
exists in this sandbox, so the replication-protocol tail stays out of
scope — but the MESSAGE FORMAT is public (PostgreSQL docs, "Logical
Replication Message Formats", protocol v1) and the slot SQL interface
``pg_logical_slot_peek_binary_changes`` hands it to any client as rows of
``(lsn, xid, data bytea)``. That row shape is this adapter's input: a
parquet/Kafka landing of slot output, parsed into engine envelopes.

Spark-first decomposition of a stateful binary stream protocol:

- **Relation messages ('R') are control plane**: one per captured table
  per connection, carrying the column names the tuple data is positional
  against. They are collected driver-side (bounded by table count, like
  the signal table) into a rel_id → (schema, table, columns) registry
  that the data-plane decode closes over — the Spark analog of the
  decoder's in-memory relation cache
  (PgOutputMessageDecoder's ``MessageDecoder#shouldMessageBeSkipped``
  relation bookkeeping).
- **Begin messages ('B') parse pure-Catalyst**: fixed layout (final_lsn
  int64 ++ commit_ts int64 ++ xid int32), so the commit timestamp is one
  substring/conv projection. DML envelopes get their ``ts_ms`` by an
  equi-JOIN on the slot's xid column — high-cardinality, narrow,
  order-independent — instead of the reference's "remember the last
  Begin" serial stream state.
- **Tuple data ('I'/'U'/'D') is an Arrow-batched binary codec**
  (mapInPandas), the same boundary treatment as the Avro/proto3 codecs:
  variable-length cstrings and per-column loops are not reasonably
  Catalyst-expressible, so the decode runs as a tight per-batch python
  parser emitting (action, rel, before/after maps); everything after it
  (type casts, key routing, envelope assembly) is Catalyst again.

op mapping (Envelope.java:37-63): I→c, U→u, D→d, T→t. Update before
images honor REPLICA IDENTITY: 'K' (key columns), 'O' (full old row), or
absent. Unchanged-TOAST columns ('u') decode to NULL (the reference's
UnchangedToastedPlaceholder needs reselect — transforms/reselect.py —
exactly like any other connector).

Offsets are pg LSNs (``(hi<<32)|lo`` via the shared wal2json codec), so
fencing, resume, and the offset-vector algebra work unchanged.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import transaction_struct
from .wal2json import long_to_pg_lsn, pg_lsn_to_long
from .wire import assemble_envelope, op_lookup

#: microseconds between the unix epoch and PostgreSQL's 2000-01-01 epoch
PG_EPOCH_US = 946_684_800_000_000

_OP = {"I": "c", "U": "u", "D": "d", "T": "t"}


# ---------------------------------------------------------------------------
# Pure-python message codec (unit-testable without Spark; the emitter and
# the Arrow decode below are thin wrappers over these)
# ---------------------------------------------------------------------------


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def _read_cstr(b: bytes, pos: int) -> tuple[str, int]:
    end = b.index(b"\x00", pos)
    return b[pos:end].decode("utf-8"), end + 1


def encode_begin(final_lsn: int, commit_ts_us_unix: int, xid: int) -> bytes:
    """'B' ++ final_lsn(8) ++ commit_ts(8, µs since 2000-01-01) ++ xid(4)."""
    return b"B" + struct.pack(
        ">qqi", final_lsn, commit_ts_us_unix - PG_EPOCH_US, xid
    )


def encode_commit(commit_lsn: int, end_lsn: int,
                  commit_ts_us_unix: int) -> bytes:
    return b"C" + struct.pack(
        ">bqqq", 0, commit_lsn, end_lsn, commit_ts_us_unix - PG_EPOCH_US
    )


def encode_relation(
    rel_id: int, namespace: str, relname: str,
    columns: list[tuple[str, int, bool]],
    replica_identity: bytes = b"d",
) -> bytes:
    """columns = [(name, type_oid, is_key)]; replident 'd'efault/'f'ull."""
    out = [b"R", struct.pack(">i", rel_id), _cstr(namespace), _cstr(relname),
           replica_identity, struct.pack(">h", len(columns))]
    for name, oid, is_key in columns:
        out += [struct.pack(">b", 1 if is_key else 0), _cstr(name),
                struct.pack(">ii", oid, -1)]
    return b"".join(out)


def encode_tuple(values: list[str | None]) -> bytes:
    """TupleData, text mode: 'n' for NULL, else 't' ++ len ++ utf-8."""
    out = [struct.pack(">h", len(values))]
    for v in values:
        if v is None:
            out.append(b"n")
        else:
            enc = v.encode("utf-8")
            out += [b"t", struct.pack(">i", len(enc)), enc]
    return b"".join(out)


def encode_insert(rel_id: int, new: list[str | None]) -> bytes:
    return b"I" + struct.pack(">i", rel_id) + b"N" + encode_tuple(new)


def encode_update(
    rel_id: int, new: list[str | None],
    old: list[str | None] | None = None, old_kind: bytes = b"K",
) -> bytes:
    mid = (old_kind + encode_tuple(old)) if old is not None else b""
    return b"U" + struct.pack(">i", rel_id) + mid + b"N" + encode_tuple(new)


def encode_delete(rel_id: int, old: list[str | None],
                  old_kind: bytes = b"K") -> bytes:
    return b"D" + struct.pack(">i", rel_id) + old_kind + encode_tuple(old)


def encode_truncate(rel_ids: list[int], options: int = 0) -> bytes:
    return (b"T" + struct.pack(">ib", len(rel_ids), options)
            + b"".join(struct.pack(">i", r) for r in rel_ids))


def parse_relation(b: bytes) -> dict:
    rel_id = struct.unpack_from(">i", b, 1)[0]
    ns, pos = _read_cstr(b, 5)
    rel, pos = _read_cstr(b, pos)
    replident = b[pos:pos + 1].decode()
    ncols = struct.unpack_from(">h", b, pos + 1)[0]
    pos += 3
    cols, keys = [], []
    for _ in range(ncols):
        flags = b[pos]
        name, pos = _read_cstr(b, pos + 1)
        pos += 8  # type oid + atttypmod
        cols.append(name)
        if flags & 1:
            keys.append(name)
    return {"rel_id": rel_id, "namespace": ns, "relname": rel,
            "replica_identity": replident, "columns": cols, "keys": keys}


def _parse_tuple(b: bytes, pos: int) -> tuple[list[str | None], int]:
    ncols = struct.unpack_from(">h", b, pos)[0]
    pos += 2
    vals: list[str | None] = []
    for _ in range(ncols):
        kind = b[pos:pos + 1]
        pos += 1
        if kind in (b"n", b"u"):  # NULL / unchanged TOAST -> NULL
            vals.append(None)
        elif kind in (b"t", b"b"):
            ln = struct.unpack_from(">i", b, pos)[0]
            pos += 4
            raw = b[pos:pos + ln]
            pos += ln
            vals.append(raw.decode("utf-8"))
        else:
            raise ValueError(f"unknown TupleData column kind {kind!r}")
    return vals, pos


def parse_dml(b: bytes) -> dict | None:
    """One 'I'/'U'/'D'/'T' message → {action, rel_id(s), old, new};
    None for non-DML kinds (B/C/R/O/Y/M)."""
    kind = b[:1].decode("latin-1")
    if kind == "T":
        n = struct.unpack_from(">i", b, 1)[0]
        rel_ids = [struct.unpack_from(">i", b, 6 + 4 * i)[0]
                   for i in range(n)]
        return {"action": "T", "rel_ids": rel_ids, "old": None, "new": None}
    if kind not in ("I", "U", "D"):
        return None
    rel_id = struct.unpack_from(">i", b, 1)[0]
    pos = 5
    old = new = None
    if kind == "I":
        pos += 1  # 'N'
        new, pos = _parse_tuple(b, pos)
    elif kind == "D":
        pos += 1  # 'K'|'O'
        old, pos = _parse_tuple(b, pos)
    else:  # U
        marker = b[pos:pos + 1]
        if marker in (b"K", b"O"):
            old, pos = _parse_tuple(b, pos + 1)
        new, pos = _parse_tuple(b, pos + 1)  # skip 'N'
    return {"action": kind, "rel_ids": [rel_id], "old": old, "new": new}


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


def collect_relations(frames: DataFrame, data_col: str = "data") -> dict:
    """Driver-side relation registry: rel_id → parsed Relation message.
    Control-plane collect, bounded by (captured tables × connections) —
    the highest rel_id wins per id (a re-sent Relation after a schema
    change supersedes, matching the decoder's cache overwrite)."""
    rows = (
        frames.filter(F.substring(data_col, 1, 1) == F.lit(b"R"))
        .select(data_col).collect()
    )
    rels: dict[int, dict] = {}
    for r in rows:
        p = parse_relation(bytes(r[0]))
        rels[p["rel_id"]] = p
    return rels


def begin_timestamps(frames: DataFrame, *, xid_col: str = "xid",
                     data_col: str = "data") -> DataFrame:
    """(xid, ts_ms) from Begin messages, pure Catalyst: commit_ts is the
    int64 at bytes 10..17 (µs since the pg epoch). One row per
    transaction; DML envelopes join on xid."""
    ts_us = F.conv(F.hex(F.substring(data_col, 10, 8)), 16, 10).cast("long")
    return (
        frames.filter(F.substring(data_col, 1, 1) == F.lit(b"B"))
        .select(
            F.col(xid_col).alias("__xid"),
            ((ts_us + F.lit(PG_EPOCH_US)) / 1000)
            .cast("long").alias("__ts_ms"),
        )
        .groupBy("__xid").agg(F.max("__ts_ms").alias("__ts_ms"))
    )


#: arrays, not maps: the Arrow pandas serializer cannot convert python
#: dicts to map<string,string>; the name→value zip happens Catalyst-side
#: via map_from_arrays over the per-row column-name array
_DML_SCHEMA = (
    "lsn string, xid long, action string, db string, tbl string, "
    "cols array<string>, before array<string>, after array<string>"
)


def pgoutput_to_envelopes(
    frames: DataFrame,
    row_fields: list[tuple[str, T.DataType]],
    key_cols: list[str],
    *,
    table: str | None = None,
    n_parts: int = 8,
    source_name: str = "sparkcdc",
    failure_handling: str = "skip",
) -> DataFrame:
    """Parse pgoutput slot rows ``(lsn string 'X/Y', xid long, data
    binary)`` into the engine's envelope schema.

    ``table`` filters to one captured relname (the include-list of a
    single-table engine). Truncates become op='t' envelopes (one per
    truncated relation). ``failure_handling``: ``skip`` drops malformed
    messages, ``fail`` aborts the batch on the first one.

    Batch-shaped: the commit-timestamp attach is an equi-join between the
    DML rows and the Begin rows of the same feed, which on a streaming
    frame would be a stream-stream join (a tailer can split a
    transaction's Begin and DMLs across micro-batches); use the batch
    ingest path, like the sqlserver pairing.
    """
    if failure_handling not in ("skip", "fail"):
        raise ValueError(
            f"unknown event.processing.failure.handling.mode "
            f"{failure_handling!r}"
        )
    rels = collect_relations(frames)
    fail = failure_handling == "fail"

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("lsn", "xid", "action", "db", "tbl",
                                   "cols", "before", "after")}
            for lsn, xid, data in zip(pdf["lsn"], pdf["xid"], pdf["data"]):
                b = bytes(data)
                try:
                    d = parse_dml(b)
                except Exception:
                    if fail:
                        raise
                    continue
                if d is None:
                    continue
                for rid in d["rel_ids"]:
                    rel = rels.get(rid)
                    if rel is None:
                        if fail:
                            raise ValueError(
                                f"no Relation message for rel_id {rid}"
                            )
                        continue
                    out["lsn"].append(lsn)
                    out["xid"].append(xid)
                    out["action"].append(d["action"])
                    out["db"].append(rel["namespace"])
                    out["tbl"].append(rel["relname"])
                    out["cols"].append(rel["columns"])
                    out["before"].append(d["old"])
                    out["after"].append(d["new"])
            # never yield an empty frame: pandas gives empty columns
            # float64 dtype, which Arrow refuses to cast to list<string>
            if out["lsn"]:
                yield pd.DataFrame(out)

    work = frames.select("lsn", "xid", "data").mapInPandas(
        decode, _DML_SCHEMA
    )
    if table is not None:
        work = work.filter(F.col("tbl") == table)
    work = work.join(
        begin_timestamps(frames),
        work["xid"] == F.col("__xid"), "left",
    ).drop("__xid")

    def typed_row(vals_col):
        m = F.map_from_arrays(F.col("cols"), vals_col)
        return F.struct(
            *[F.element_at(m, F.lit(n)).cast(t).alias(n)
              for n, t in row_fields]
        )

    op = op_lookup(_OP, F.col("action"))
    offset = pg_lsn_to_long(F.col("lsn"))
    after = typed_row(F.col("after"))
    before = typed_row(F.col("before"))
    has_after = F.col("after").isNotNull()
    has_before = F.col("before").isNotNull()
    key = [
        F.when(has_after, after[c]).otherwise(before[c]) for c in key_cols
    ]
    src = F.struct(
        F.lit(source_name).alias("name"),
        F.col("db").alias("db"),
        F.col("tbl").alias("table"),
        F.lit("false").alias("snapshot"),
        F.col("lsn").alias("file"),
        offset.alias("pos"),
        F.lit(None).cast("int").alias("row"),
        F.lit(None).cast("string").alias("gtid"),
        F.col("__ts_ms").alias("ts_ms"),
    )
    txn = F.when(
        F.col("xid").isNotNull(),
        F.struct(
            F.col("xid").cast("string").alias("id"),
            F.lit(None).cast("long").alias("total_order"),
            F.lit(None).cast("long").alias("data_collection_order"),
        ),
    ).cast(transaction_struct())
    return assemble_envelope(
        work, op=op, ts_ms=F.col("__ts_ms"),
        before=F.when(has_before, before),
        after=F.when(has_after, after),
        source=src, transaction=txn, key=key, offset=offset,
        n_parts=n_parts,
    )


# ---------------------------------------------------------------------------
# Deterministic emitter over the driver's `events` table (tests/oracles)
# ---------------------------------------------------------------------------

#: pg type oids for the emitter's relation message (int8, text, float8)
_EVENT_RELATION_COLS = [
    ("user_id", 20, True), ("event_type", 25, False),
    ("value", 701, False), ("props", 25, False),
]


def events_to_pgoutput_frames(
    events: DataFrame,
    *,
    schema: str = "app",
    table: str = "events",
    rel_id: int = 1,
) -> DataFrame:
    """Deterministic pgoutput slot output over the driver's ``events``
    table — the synthetic decoder feed for tests (the role the server's
    walsender plays). Per event: Begin ++ one I/U/D ++ Commit, all three
    rows carrying lsn = event_id (X/Y form) and xid = event_id, commit
    timestamp from the event's ``ts``. Each PARTITION additionally
    prepends one Relation row (the protocol re-sends Relation per
    connection; the registry collect dedupes by rel_id), so the total
    frame count varies with partitioning while the decoded envelope set
    does not.

    op mapping matches the other emitters (events_adapter.OP_MAP):
    signup→I, error→D, else U; deletes/updates carry a key-only ('K')
    before image, pg's REPLICA IDENTITY DEFAULT.
    """
    rel = encode_relation(rel_id, schema, table, _EVENT_RELATION_COLS)

    def emit(batches):
        import pandas as pd

        first = True
        for pdf in batches:
            rows = {"lsn": [], "xid": [], "data": []}

            def add(lsn, xid, data):
                rows["lsn"].append(lsn)
                rows["xid"].append(xid)
                rows["data"].append(data)

            if first:
                add("0/0", 0, rel)
                first = False
            for r in pdf.itertuples(index=False):
                eid = int(r.event_id)
                lsn = f"{eid >> 32:X}/{eid & 0xFFFFFFFF:X}"
                ts_us = int(r.ts_us)

                def txt(v, conv=str):
                    return None if pd.isna(v) else conv(v)

                vals = [txt(r.user_id, lambda v: str(int(v))),
                        txt(r.event_type),
                        txt(r.value, lambda v: repr(float(v))),
                        txt(r.props)]
                keyvals = [txt(r.user_id, lambda v: str(int(v))),
                           None, None, None]
                add(lsn, eid, encode_begin(eid, ts_us, eid))
                if r.event_type == "signup":
                    dml = encode_insert(rel_id, vals)
                elif r.event_type == "error":
                    dml = encode_delete(rel_id, keyvals)
                else:
                    dml = encode_update(rel_id, vals, keyvals)
                add(lsn, eid, dml)
                add(lsn, eid, encode_commit(eid, eid + 1, ts_us))
            yield pd.DataFrame(rows)

    src = events.select(
        "event_id", "user_id", "event_type", "value", "props",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return src.mapInPandas(emit, "lsn string, xid long, data binary")
