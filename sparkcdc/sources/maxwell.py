"""MySQL binlog rows shipped as Maxwell JSON → envelopes.

Completes the big-five connector set (MySQL / Postgres / SQL Server /
Oracle / MongoDB): the reference's flagship MySQL connector tails the
binlog through a replication client and turns row events into envelopes
(debezium-connector-binlog: BinlogStreamingChangeEventSource.java:128-199
event dispatch; offset = binlog ``(file, position)``,
BinlogOffsetContext.java:325-336 per-source-position ordering). No MySQL
server exists in this sandbox, so the *replication client* stays out of
scope — but the industry-standard shipped form of a MySQL binlog is
public: Maxwell's daemon's documented JSON line format (one object per
row change; the same shape Alibaba Canal and many homegrown tailers
emit). A lake-first CDC user runs exactly this: a tailer ships binlog
rows as JSON to files/Kafka, Spark parses them into envelopes and
replays. Mirrors the wal2json (S6) / change-stream (S7) / LogMiner (S8)
/ SQL Server CDC adapters.

One JSON object per line (``output_binlog_position=true``)::

    {"database":"app","table":"events","type":"insert","ts":1477053217,
     "xid":23396,"commit":true,"position":"master.000006:800911",
     "server_id":23042,"thread_id":108,
     "data":{"id":1,"v":4.2}}                       # full row after-image
    {..., "type":"update", "data":{...new row...},
     "old":{"v":2.5}}                               # changed columns ONLY
    {..., "type":"delete", "data":{...deleted row...}}
    {..., "type":"bootstrap-insert", "data":{...}}  # Maxwell's snapshot

op mapping (Envelope.java:37-63): insert→c, update→u, delete→d,
bootstrap-insert→r (Maxwell's bootstrap is the reference's initial
snapshot; ``source.snapshot`` is marked ``true`` for those rows).
``bootstrap-start``/``bootstrap-complete`` control lines and (with
``output_ddl``) ``table-create``/``table-alter``/``table-drop`` DDL
lines carry no row data and are filtered here — DDL belongs to the
schema-history channel (sparkcdc.ddl), not the row stream.

**Before-image reconstruction.** Maxwell's ``old`` object holds only the
columns the update CHANGED (previous values). The full before row is
``data`` overlaid with ``old`` — per column, take ``old``'s value when
the key is PRESENT in ``old`` (even if its value is JSON null: a column
changed FROM NULL ships as ``"col":null``), else the (unchanged) value
from ``data``. Key presence is decided on a ``map<string,string>``
re-parse of ``old`` — a struct parse cannot distinguish absent from
null, a map parse keeps the key — and the typed value comes from the
struct parse, so the merge is exact and stays pure Catalyst.

**Offsets.** A binlog position is ``(file, pos)`` — ``file`` is the
rotating log name with a numeric suffix (``master.000006``), ``pos`` the
byte offset inside it (< 2^32: ``max_binlog_size`` caps a file at 1 GiB).
The codec packs ``suffix << 32 | pos`` into the engine's 64-bit offset —
order-preserving across file rotations, exactly the
``currentBinlogFilename/currentBinlogPosition`` pair the reference
compares (BinlogOffsetContext.java:325-336; binlog file names sort by
their suffix). The textual file name rides in ``source.file`` and the
GTID (when the tailer ships one) in ``source.gtid`` for tools that
resume a real client at an exact binlog coordinate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import transaction_struct
from .wire import assemble_envelope, failure_opts, op_lookup

_OP = {"insert": "c", "update": "u", "delete": "d", "bootstrap-insert": "r"}


def binlog_pos_to_long(position) -> F.Column:
    """``'master.000006:800911'`` → ``(6 << 32) | 800911``."""
    position = F.col(position) if isinstance(position, str) else position
    suffix = F.regexp_extract(
        F.split(position, ":")[0], r"\.(\d+)$", 1
    ).cast("long")
    pos = F.split(position, ":")[1].cast("long")
    return F.shiftleft(suffix, 32).bitwiseOR(pos)


def long_to_binlog_pos(off, *, basename: str = "master") -> F.Column:
    """Inverse of :func:`binlog_pos_to_long` (6-digit zero-padded suffix,
    MySQL's default log_bin naming)."""
    off = F.col(off) if isinstance(off, str) else off
    return F.concat(
        F.lit(basename + "."),
        F.lpad(F.shiftrightunsigned(off, 32).cast("string"), 6, "0"),
        F.lit(":"),
        off.bitwiseAND(F.lit(0xFFFFFFFF)).cast("string"),
    )


def _dt(t) -> T.DataType:
    """Accept declared types as DataType or DDL string ('long')."""
    return t if isinstance(t, T.DataType) else T.DataType.fromDDL(t)


def maxwell_line_schema(row_fields: list[tuple[str, T.DataType]]) -> T.StructType:
    """from_json schema for one Maxwell line, ``data``/``old`` typed by
    the captured table's declared row fields."""
    row_struct = T.StructType(
        [T.StructField(n, _dt(t), True) for n, t in row_fields]
    )
    return T.StructType([
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("xid", T.LongType(), True),
        T.StructField("commit", T.BooleanType(), True),
        T.StructField("position", T.StringType(), True),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("server_id", T.LongType(), True),
        T.StructField("data", row_struct, True),
        T.StructField("old", row_struct, True),
    ])


def maxwell_to_envelopes(
    lines: DataFrame,
    row_fields: list[tuple[str, T.DataType]],
    key_cols: list[str],
    *,
    database: str | None = None,
    table: str | None = None,
    n_parts: int = 8,
    line_col: str = "value",
    source_name: str = "sparkcdc",
    failure_handling: str = "skip",
) -> DataFrame:
    """Parse Maxwell JSON lines into the engine's envelope schema — two
    typed ``from_json`` projections (line + the ``old`` presence map),
    zero Python UDFs, no shuffle.

    ``database``/``table`` filter to one captured table (the
    include-list of a single-table engine; ``MultiTableEngine`` calls
    this once per table over the same scan). Control lines
    (bootstrap-start/complete, DDL) and other tables' changes drop here.

    Works unmodified on a streaming DataFrame (stateless projections).

    ``failure_handling``: ``skip`` (default) drops unparseable lines;
    ``fail`` parses FAILFAST so the first malformed line aborts."""
    opts = failure_opts(failure_handling)
    schema = maxwell_line_schema(row_fields)
    j = F.from_json(F.col(line_col), schema, opts).alias("j")
    # struct parse cannot tell absent from null — the presence map can
    old_keys = F.from_json(
        F.col(line_col), "struct<old:map<string,string>>", opts
    )["old"].alias("__old_keys")
    parsed = lines.select(j, old_keys).select("j.*", "__old_keys")
    work = parsed.filter(F.col("type").isin(*_OP))
    if database is not None:
        work = work.filter(F.col("database") == database)
    if table is not None:
        work = work.filter(F.col("table") == table)

    op = op_lookup(_OP, F.col("type"))
    ts_ms = F.col("ts") * 1000  # Maxwell ts is epoch seconds
    offset = binlog_pos_to_long(F.col("position"))
    is_update = F.col("type") == "update"
    is_delete = F.col("type") == "delete"
    # update before = data overlaid with old's PRESENT keys; delete's
    # data IS the old row
    merged_before = F.struct(*[
        F.when(
            F.map_contains_key(F.col("__old_keys"), F.lit(n)),
            F.col("old")[n],
        ).otherwise(F.col("data")[n]).alias(n)
        for n, _ in row_fields
    ])
    before = F.when(is_update, merged_before).when(is_delete, F.col("data"))
    after = F.when(~is_delete, F.col("data"))
    # Maxwell always ships the full row in ``data`` (for deletes: the
    # deleted row), so the record key comes from there for every op
    key = [F.col("data")[c] for c in key_cols]
    src = F.struct(
        F.lit(source_name).alias("name"),
        F.col("database").alias("db"),
        F.col("table").alias("table"),
        F.when(F.col("type") == "bootstrap-insert", F.lit("true"))
        .otherwise(F.lit("false")).alias("snapshot"),
        F.split(F.col("position"), ":")[0].alias("file"),
        offset.alias("pos"),
        F.lit(None).cast("int").alias("row"),
        F.col("gtid").alias("gtid"),
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
        work, op=op, ts_ms=ts_ms, before=before, after=after,
        source=src, transaction=txn, key=key, offset=offset,
        n_parts=n_parts,
    )


def events_to_maxwell_lines(
    events: DataFrame,
    *,
    database: str = "app",
    table: str = "events",
    basename: str = "master",
) -> DataFrame:
    """Deterministic Maxwell emitter over the driver's ``events`` table —
    the synthetic binlog-tailer output for tests/benchmarks (the role
    Maxwell's daemon plays server-side). signup → insert, error →
    delete, otherwise update whose ``old`` carries ONLY the changed
    column (``value``, previous value = value+1) — so the parse side
    must really presence-merge (``props`` is absent from ``old`` and
    must come from ``data``). Binlog position rotates files every 2^20
    events: ``file = basename.(1 + event_id div 2^20)``, ``pos =
    event_id mod 2^20``, hence ``binlog_pos_to_long(position) ==
    ((1 + event_id div 2^20) << 32) + event_id mod 2^20`` exactly — the
    codec roundtrips and stays oracle-expressible. xid = event_id (each
    event its own committed transaction, Maxwell's shape without
    batching); ``ts`` = the event's epoch seconds.
    """
    act = (
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    eid = F.col("event_id").cast("long")
    position = F.concat(
        F.lit(basename + "."),
        F.lpad((F.lit(1) + F.expr("CAST(event_id AS BIGINT) div 1048576"))
               .cast("string"), 6, "0"),
        F.lit(":"),
        F.pmod(eid, F.lit(1048576)).cast("string"),
    )
    row_img = F.struct(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("event_type"),
        F.col("value").cast("double").alias("value"),
        F.col("props").alias("props"),
    )
    old_img = F.when(
        act == "update",
        F.struct((F.col("value").cast("double") + F.lit(1.0)).alias("value")),
    )  # null for insert/delete → to_json omits the field
    rec = F.struct(
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        act.alias("type"),
        F.expr("unix_seconds(cast(ts as timestamp))").alias("ts"),
        eid.alias("xid"),
        F.lit(True).alias("commit"),
        position.alias("position"),
        F.lit(1).cast("long").alias("server_id"),
        row_img.alias("data"),
        old_img.alias("old"),
    )
    return events.select(F.to_json(rec).alias("value"))
