"""wal2json (PostgreSQL logical decoding, format-version 2) → envelopes.

Closes the S6 gap: the reference tails the Postgres WAL through a
replication slot and decodes change records into Debezium envelopes
(core's source contract: core/pipeline/source/AbstractChangeEventSource
+ the per-connector decoders; offset = pg LSN,
core/pipeline/spi/OffsetContext.java). No Postgres server exists in this
sandbox, so the *server tail* stays out of scope — but the WIRE FORMAT is
public (the wal2json output plugin's documented v2 line protocol), and a
Spark ingest of it is exactly what a lake-first CDC user runs: WAL
decoder ships JSON lines to files/Kafka, Spark parses them into
envelopes and replays.

Parsing is pure Catalyst — ``from_json`` + ``map_from_entries`` +
``element_at`` + casts, zero Python UDFs, one whole-stage-codegen
projection — so it runs at scan speed and column-prunes: a downstream
query touching only the key columns never materialises the full row map.

wal2json v2 emits ONE JSON object per line (options
``format-version=2, include-lsn, include-timestamp``):

    {"action":"B","xid":563,"lsn":"0/16B2D80","timestamp":"..."}
    {"action":"I","schema":"app","table":"t","lsn":"0/16B2E10",
     "timestamp":"2024-01-01 00:00:00.000001+00",
     "columns":[{"name":"id","type":"bigint","value":42},
                {"name":"body","type":"text","value":"x"}]}
    {"action":"U", ..., "columns":[...new row...],
     "identity":[{"name":"id","type":"bigint","value":42}]}
    {"action":"D", ..., "identity":[{"name":"id","type":"bigint","value":42}]}
    {"action":"T","schema":"app","table":"t"}
    {"action":"C","lsn":"0/16B2F00","timestamp":"..."}

op mapping (Envelope.java:37-63): I→c, U→u, D→d, T→t; B/C are
transaction boundary markers (xid → the envelope ``transaction.id``).

Heterogeneous JSON values (numbers / strings / booleans) are read into a
``string`` field: Spark's Jackson parser serialises any non-string token
to its JSON text for a StringType target, so ``42`` and ``"42"`` both
arrive as the string ``42`` and are cast to the declared column type
afterwards. NULL column values stay NULL through the cast.

Offsets: a pg LSN ``X/Y`` is the 64-bit WAL position ``(X << 32) | Y``
(both hex) — that long IS the envelope ``offset``, so resume/fencing and
the offset-vector algebra (sparkcdc.offsets) work unchanged on WAL
positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import transaction_struct
from .wire import assemble_envelope, failure_opts, op_lookup

#: from_json schema for one wal2json v2 line; `value` as string absorbs
#: any JSON scalar (see module docstring)
_COL_ENTRY = "array<struct<name:string,type:string,value:string>>"
WAL2JSON_LINE_SCHEMA = (
    "struct<action:string,schema:string,`table`:string,lsn:string,"
    f"xid:bigint,timestamp:string,columns:{_COL_ENTRY},identity:{_COL_ENTRY},"
    "prefix:string,content:string,transactional:boolean>"
)

_OP = {"I": "c", "U": "u", "D": "d", "T": "t"}


def pg_lsn_to_long(lsn) -> F.Column:
    """``'X/Y'`` (pg_lsn text form, both parts hex) → ``(X<<32) | Y``."""
    lsn = F.col(lsn) if isinstance(lsn, str) else lsn
    hi = F.conv(F.split(lsn, "/")[0], 16, 10).cast("long")
    lo = F.conv(F.split(lsn, "/")[1], 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def long_to_pg_lsn(off) -> F.Column:
    """Inverse of :func:`pg_lsn_to_long` — the ``X/Y`` text form."""
    off = F.col(off) if isinstance(off, str) else off
    return F.concat(
        F.conv(F.shiftrightunsigned(off, 32), 10, 16),
        F.lit("/"),
        F.conv(off.bitwiseAND(F.lit(0xFFFFFFFF)), 10, 16),
    )


def _row_from_entries(entries, row_fields: list[tuple[str, T.DataType]]):
    """columns/identity array → typed row struct (missing names → NULL)."""
    m = F.map_from_entries(
        F.transform(entries, lambda c: F.struct(c["name"], c["value"]))
    )
    return F.struct(
        *[
            F.element_at(m, F.lit(n)).cast(t).alias(n)
            for n, t in row_fields
        ]
    )


def wal2json_to_envelopes(
    lines: DataFrame,
    row_fields: list[tuple[str, T.DataType]],
    key_cols: list[str],
    *,
    table: str | None = None,
    n_parts: int = 8,
    line_col: str = "value",
    source_name: str = "sparkcdc",
    failure_handling: str = "skip",
) -> DataFrame:
    """Parse wal2json v2 lines into the engine's envelope schema.

    ``lines`` carries one JSON line per row in ``line_col`` (a file scan,
    a Kafka value column, a socket stream — anything). ``table`` filters
    to one captured table (the include-list of a single-table engine;
    ``MultiTableEngine`` calls this once per table over the same scan).
    B/C boundary lines and other tables' changes are dropped here;
    truncates become op='t' envelopes for the sink's truncate handling.

    Works unmodified on a streaming DataFrame (all expressions are
    stateless projections).

    ``failure_handling`` (event.processing.failure.handling.mode at this
    deserialization boundary): ``skip`` (default) lets unparseable lines
    fall out with the non-DML actions the ``action`` filter drops; ``fail``
    parses FAILFAST so the first malformed line aborts the batch —
    well-formed non-DML lines (B/C/M markers) still pass and are filtered.
    """
    opts = failure_opts(failure_handling)
    j = F.from_json(F.col(line_col), WAL2JSON_LINE_SCHEMA, opts).alias("j")
    parsed = lines.select(j).select("j.*")
    work = parsed.filter(F.col("action").isin(*_OP))
    if table is not None:
        work = work.filter(F.col("table") == table)

    op = op_lookup(_OP, F.col("action"))
    # pg timestamptz text ('2024-01-01 00:00:00.000001+00') casts directly
    ts_ms = F.expr("unix_micros(cast(timestamp as timestamp)) div 1000")
    offset = pg_lsn_to_long(F.col("lsn"))
    after = _row_from_entries(F.col("columns"), row_fields)
    before = _row_from_entries(F.col("identity"), row_fields)
    has_after = F.col("action").isin("I", "U")
    has_before = F.col("action").isin("U", "D")
    key = [
        F.when(has_after, after[c]).otherwise(before[c]) for c in key_cols
    ]
    src = F.struct(
        F.lit(source_name).alias("name"),
        F.col("schema").alias("db"),
        F.col("table").alias("table"),
        F.lit("false").alias("snapshot"),
        F.col("lsn").alias("file"),
        offset.alias("pos"),
        F.lit(None).cast("int").alias("row"),
        F.lit(None).cast("string").alias("gtid"),
        ts_ms.alias("ts_ms"),
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
        work, op=op, ts_ms=ts_ms,
        before=F.when(has_before, before),
        after=F.when(has_after, after),
        source=src, transaction=txn, key=key, offset=offset,
        n_parts=n_parts,
    )


def events_to_wal2json_lines(
    events: DataFrame,
    *,
    schema: str = "app",
    table: str = "events",
) -> DataFrame:
    """Deterministic wal2json v2 emitter over the driver's ``events``
    table — the synthetic WAL decoder output for tests/benchmarks (the
    role a real wal2json plugin plays server-side). One I/U/D line per
    event (op per sources.events_adapter.OP_MAP), ``lsn`` = event_id in
    pg's X/Y form so offsets roundtrip exactly, xid = event_id (each
    change its own transaction, wal2json's default without batching).

    Each column object is emitted via ``to_json`` (correct escaping and
    native JSON types per column: bigint/double unquoted, text quoted),
    so the output is byte-for-byte the shape a real plugin writes.
    """
    act = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    lsn = long_to_pg_lsn(F.col("event_id"))
    ts = F.concat(
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("+00"),
    )

    def col_obj(name: str, pg_type: str, value: F.Column) -> F.Column:
        return F.to_json(
            F.struct(
                F.lit(name).alias("name"),
                F.lit(pg_type).alias("type"),
                value.alias("value"),
            )
        )

    identity = F.concat(
        F.lit('"identity":['),
        col_obj("user_id", "bigint", F.col("user_id").cast("long")),
        F.lit("]"),
    )
    columns = F.concat(
        F.lit('"columns":['),
        F.concat_ws(
            ",",
            col_obj("user_id", "bigint", F.col("user_id").cast("long")),
            col_obj("event_type", "text", F.col("event_type")),
            col_obj("value", "double precision", F.col("value").cast("double")),
            col_obj("props", "text", F.col("props")),
        ),
        F.lit("]"),
    )
    head = F.concat(
        F.lit('{"action":"'), act,
        F.lit(f'","schema":"{schema}","table":"{table}","lsn":"'), lsn,
        F.lit('","xid":'), F.col("event_id").cast("string"),
        F.lit(',"timestamp":"'), ts, F.lit('",'),
    )
    body = (
        F.when(act == "I", columns)
        .when(act == "D", identity)
        .otherwise(F.concat(columns, F.lit(","), identity))
    )
    return events.select(
        F.concat(head, body, F.lit("}")).alias("value")
    )


# ---------------------------------------------------------------------------
# Logical decoding messages (wal2json action "M")
# ---------------------------------------------------------------------------


def wal2json_messages(
    lines: DataFrame,
    *,
    prefix: str | None = None,
    line_col: str = "value",
    failure_handling: str = "skip",
) -> DataFrame:
    """Parse wal2json v2 ``"action":"M"`` lines — the output of
    ``pg_logical_emit_message()`` — into message rows.

    Reference: the Postgres connector emits these as op='m' records whose
    value carries (prefix, content); see
    debezium-connector-postgres/.../connection/LogicalDecodingMessage +
    the MESSAGE envelope in PostgresChangeRecordEmitter. ``prefix``
    filters to one application channel (the reference config
    ``logical.decoding.message.prefix.include.list``).

    Output: (offset, lsn, xid, ts_ms, transactional, prefix, content) —
    one row per message, LSN-ordered by ``offset`` like every other
    envelope. Pure Catalyst, stateless: safe on streaming frames.
    """
    opts = failure_opts(failure_handling)
    j = F.from_json(F.col(line_col), WAL2JSON_LINE_SCHEMA, opts).alias("j")
    msgs = lines.select(j).select("j.*").filter(F.col("action") == "M")
    if prefix is not None:
        msgs = msgs.filter(F.col("prefix") == prefix)
    return msgs.select(
        pg_lsn_to_long(F.col("lsn")).alias("offset"),
        "lsn",
        "xid",
        F.expr("unix_micros(cast(timestamp as timestamp)) div 1000")
        .alias("ts_ms"),
        "transactional",
        "prefix",
        "content",
    )


def decode_message_content(
    msgs: DataFrame,
    content_schema: T.StructType | str,
    *,
    failure_handling: str = "skip",
) -> DataFrame:
    """DecodeLogicalDecodingMessageContent analog (reference:
    debezium-connector-postgres/.../transforms/
    DecodeLogicalDecodingMessageContent.java): parse each message's JSON
    ``content`` into a typed row, so downstream sinks see structured
    records instead of an opaque payload.

    Output: the message metadata columns + the content fields flattened
    top-level (the SMT's record-value shape). Unparseable content becomes
    NULL fields under ``skip``; aborts the batch under ``fail``. Content
    field names that collide with the metadata columns are rejected
    fail-fast (the flatten would otherwise emit ambiguous duplicates).
    """
    opts = failure_opts(failure_handling)
    if isinstance(content_schema, str):
        content_schema = T._parse_datatype_string(content_schema)
    meta = {"offset", "lsn", "xid", "ts_ms", "transactional", "prefix"}
    clash = sorted(meta & set(content_schema.fieldNames()))
    if clash:
        raise ValueError(
            f"content schema fields {clash} collide with message "
            "metadata columns — rename them in the content schema"
        )
    parsed = F.from_json(F.col("content"), content_schema, opts)
    return msgs.select(
        "offset", "lsn", "xid", "ts_ms", "transactional", "prefix",
        parsed.alias("__content"),
    ).select("offset", "lsn", "xid", "ts_ms", "transactional", "prefix",
             "__content.*")


def events_to_wal2json_message_lines(
    events: DataFrame,
    *,
    prefix: str = "app.audit",
) -> DataFrame:
    """Deterministic ``"action":"M"`` emitter over the driver's ``events``
    table — each event becomes one transactional logical decoding message
    whose content is the event row as JSON (the audit-log pattern
    pg_logical_emit_message exists for)."""
    lsn = long_to_pg_lsn(F.col("event_id"))
    ts = F.concat(
        F.date_format(F.col("ts").cast("timestamp"),
                      "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("+00"),
    )
    content = F.to_json(F.struct(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("event_type"),
        F.col("value").cast("double").alias("value"),
        F.col("props").alias("props"),
    ))
    line = F.to_json(F.struct(
        F.lit("M").alias("action"),
        F.lit(True).alias("transactional"),
        F.lit(prefix).alias("prefix"),
        content.alias("content"),
        lsn.alias("lsn"),
        F.col("event_id").cast("long").alias("xid"),
        ts.alias("timestamp"),
    ))
    return events.select(line.alias("value"))
