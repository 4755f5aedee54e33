"""SQL Server CDC change-table rows → envelopes.

The reference's SQL Server connector polls the change tables that SQL
Server's own CDC feature maintains (``cdc.<capture_instance>_CT``,
read via ``cdc.fn_cdc_get_all_changes_*``), walking rows ordered by
``(__$start_lsn, __$seqval)`` and pairing each update's before row
(``__$operation = 3``) with the adjacent after row (``__$operation = 4``)
into one update event
(debezium-connector-sqlserver: SqlServerStreamingChangeEventSource.java:318-325,
SqlServerChangeRecordEmitter.java:23-50; stream position compares
commitLsn then inTxLsn, TxLogPosition.java:84-86). No SQL Server exists
in this sandbox, so the *poller* stays out of scope — but the change-table
row shape is public (Microsoft's CDC documentation), and a Spark ingest
of it is what a lake-first CDC user runs: a tailer SELECTs the change
table and ships rows as JSON to files/Kafka, Spark parses them into
envelopes and replays. Mirrors the wal2json (S6) / change-stream (S7) /
LogMiner (S8) adapters.

One JSON object per line, the change-table projection a tailer ships::

    {"start_lsn": "00000025:000007d0:0001",      # __$start_lsn (commit)
     "seqval":    "00000025:000007c8:0003",      # __$seqval (in-tx order)
     "operation": 2,                             # __$operation 1=D 2=I
                                                 #   3=update-before 4=update-after
     "update_mask": "0f",                        # __$update_mask hex
     "capture_instance": "dbo_events",
     "commit_time": 1700000000000,               # sys.fn_cdc_map_lsn_to_time, ms
     "data": {...captured columns...}}

**Spark-first pairing.** The reference pairs operation-3/4 rows by
sequential adjacency inside a single-threaded cursor loop — an
inherently serial formulation. Here the same semantics are a
commutative aggregation, so the pairing parallelizes: group by
``(start_lsn, key columns)`` and take, ordered by ``seqval`` (tie-broken
by the operation code, so a 3 sorts before its 4),

- the LAST after-image (operations 2/4) → envelope ``after``,
- the FIRST before-image (operations 1/3) → envelope ``before``,
- ``op``: the overall-LAST operation is a delete, or no after-image
  survives at all (a lone update-before / PK-change old half) → ``d``;
  first operation is an insert → ``c``; otherwise ``u``.

This additionally collapses multiple changes to the SAME key inside one
transaction into the transaction's net change (the reference emits each
with an ``event_serial_no`` tie-breaker instead; for a state-merging
sink the net change is the same final state, and it is what makes the
64-bit offset below a true per-key order). A primary-key-changing
update falls out correctly: the old key's group ends with no
after-image → ``d``; the new key's group has no prior before-image →
upsert ``u``.

**Offsets.** A SQL Server LSN is 10 bytes — ``vlf:block:slot`` as
4:4:2 bytes, hex-printed ``xxxxxxxx:xxxxxxxx:xxxx`` (Lsn.java:63-84) —
which does not fit the engine's 64-bit offset. The codec packs the
COMMIT LSN as ``(vlf & 0x7fff) << 48 | block << 16 | slot`` — 15 VLF
bits, so the packed value never reaches the signed long's sign bit:
order-preserving across any 2^15-VLF horizon (a VLF sequence window far
wider than any realistic retention of the change tables), exact on
block and slot. Events of one transaction share the commit offset —
harmless, because the aggregation above leaves at most one envelope per
key per transaction, and two transactions touching the same key always
have distinct commit LSNs (the second's write blocks on the first's
row lock until commit). The full-fidelity hex LSNs ride in
``source.file`` (commit) and ``source.gtid`` (last seqval) for tools
that resume a real poller at an exact change-table position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import transaction_struct
from .wire import assemble_envelope, failure_opts

#: __$operation codes (SqlServerChangeRecordEmitter.java:20-23)
OP_DELETE, OP_INSERT, OP_UPDATE_BEFORE, OP_UPDATE_AFTER = 1, 2, 3, 4


def lsn_to_long(lsn) -> F.Column:
    """``'xxxxxxxx:xxxxxxxx:xxxx'`` → packed 64-bit position
    (low 15 VLF bits ``<<48`` | block ``<<16`` | slot — never
    negative, so signed-long comparisons order like the LSN)."""
    lsn = F.col(lsn) if isinstance(lsn, str) else lsn
    part = lambda start, width: F.conv(
        F.substring(lsn, start, width), 16, 10
    ).cast("long")
    return (
        F.shiftleft(part(1, 8).bitwiseAND(F.lit(0x7FFF)), 48)
        .bitwiseOR(F.shiftleft(part(10, 8), 16))
        .bitwiseOR(part(19, 4))
    )


def long_to_lsn(off) -> F.Column:
    """Inverse of :func:`lsn_to_long` (VLF bits above 2^15 are zero)."""
    off = F.col(off) if isinstance(off, str) else off
    hexpad = lambda c, w: F.lpad(F.lower(F.hex(c)), w, "0")
    return F.concat_ws(
        ":",
        hexpad(F.shiftrightunsigned(off, 48), 8),
        hexpad(F.shiftrightunsigned(off, 16).bitwiseAND(F.lit(0xFFFFFFFF)), 8),
        hexpad(off.bitwiseAND(F.lit(0xFFFF)), 4),
    )


def change_table_schema(row_fields: list[tuple[str, T.DataType]]) -> T.StructType:
    """from_json schema for one shipped change-table row, ``data`` typed
    by the captured table's declared row fields."""
    row_struct = T.StructType(
        [T.StructField(n, t, True) for n, t in row_fields]
    )
    return T.StructType([
        T.StructField("start_lsn", T.StringType(), True),
        T.StructField("seqval", T.StringType(), True),
        T.StructField("operation", T.IntegerType(), True),
        T.StructField("update_mask", T.StringType(), True),
        T.StructField("capture_instance", T.StringType(), True),
        T.StructField("commit_time", T.LongType(), True),
        T.StructField("data", row_struct, True),
    ])


def change_table_to_envelopes(
    lines: DataFrame,
    row_fields: list[tuple[str, T.DataType]],
    key_cols: list[str],
    *,
    capture_instance: str | None = None,
    n_parts: int = 8,
    line_col: str = "value",
    source_name: str = "sparkcdc",
    db: str = "db",
    failure_handling: str = "skip",
) -> DataFrame:
    """Parse shipped change-table JSON lines into the engine's envelope
    schema — one typed ``from_json``, one hash aggregation (the 3/4
    pairing), zero Python UDFs.

    ``key_cols`` are the captured table's primary-key columns (the
    pairing/grouping identity). ``capture_instance`` filters to one
    captured table, like wal2json's ``table=``. A stray update-before
    row whose after half was lost lands as a ``d`` of its key — the
    skip-mode analog of the reference's hard error when ``next()`` is
    not the matching operation-4 row.

    ``failure_handling``: ``skip`` (default) drops unparseable lines;
    ``fail`` parses FAILFAST so the first malformed line aborts."""
    missing = [k for k in key_cols if k not in dict(row_fields)]
    if missing:
        raise ValueError(f"key_cols {missing} not in row_fields")
    opts = failure_opts(failure_handling)
    schema = change_table_schema(row_fields)
    j = F.from_json(F.col(line_col), schema, opts).alias("j")
    work = lines.select(j).select("j.*").filter(
        F.col("operation").isin(OP_DELETE, OP_INSERT,
                                OP_UPDATE_BEFORE, OP_UPDATE_AFTER)
    )
    if capture_instance is not None:
        work = work.filter(F.col("capture_instance") == capture_instance)

    # seqval orders changes inside a transaction; the operation digit
    # breaks the 3-vs-4 tie of one update pair (fixed-width hex + a
    # single digit → plain string order == (seqval, operation) order)
    ordkey = F.concat(F.col("seqval"), F.col("operation").cast("string"))
    is_after = F.col("operation").isin(OP_INSERT, OP_UPDATE_AFTER)
    is_before = F.col("operation").isin(OP_DELETE, OP_UPDATE_BEFORE)
    grouped = (
        work.groupBy(
            F.col("start_lsn"),
            F.col("capture_instance"),
            *[F.col("data")[k].alias(f"__key_{k}") for k in key_cols],
        )
        .agg(
            F.max_by(F.when(is_after, F.col("data")),
                     F.when(is_after, ordkey)).alias("__after"),
            F.min_by(F.when(is_before, F.col("data")),
                     F.when(is_before, ordkey)).alias("__before"),
            F.min_by(F.col("operation"), ordkey).alias("__first_op"),
            F.max_by(F.col("operation"), ordkey).alias("__last_op"),
            F.max("seqval").alias("__last_seqval"),
            F.max("commit_time").alias("__commit_ms"),
        )
    )

    # net op: a key whose LAST change in the transaction is a delete is
    # gone even if earlier changes left an after-image (insert-then-
    # delete must NOT resurrect as a 'c'); a group with no after-image
    # at all (lone op-3 / PK-change old half) is equally gone
    is_del = (F.col("__last_op") == OP_DELETE) | F.col("__after").isNull()
    op = (
        F.when(is_del, F.lit("d"))
        .when(F.col("__first_op") == OP_INSERT, F.lit("c"))
        .otherwise(F.lit("u"))
    )
    offset = lsn_to_long(F.col("start_lsn"))
    ts_ms = F.col("__commit_ms")
    key = [
        F.coalesce(F.col("__after")[k], F.col("__before")[k])
        for k in key_cols
    ]
    src = F.struct(
        F.lit(source_name).alias("name"),
        F.lit(db).alias("db"),
        F.col("capture_instance").alias("table"),
        F.lit("false").alias("snapshot"),
        F.col("start_lsn").alias("file"),
        offset.alias("pos"),
        F.lit(None).cast("int").alias("row"),
        F.col("__last_seqval").alias("gtid"),
        ts_ms.alias("ts_ms"),
    )
    return assemble_envelope(
        grouped, op=op, ts_ms=ts_ms,
        before=F.col("__before"),
        after=F.when(~is_del, F.col("__after")),
        source=src, transaction=F.lit(None).cast(transaction_struct()),
        key=key, offset=offset, n_parts=n_parts,
    )


def events_to_change_table_rows(
    events: DataFrame,
    *,
    capture_instance: str = "dbo_events",
    vlf: int = 0x25,
    base_ts_ms: int = 1_700_000_000_000,
) -> DataFrame:
    """Deterministic change-table emitter over the driver's ``events``
    table — the synthetic change-table content for tests/benchmarks (the
    role SQL Server's capture job plays server-side). Each event is its
    own single-change transaction: signup → one insert row (operation
    2), error → one delete row (operation 1), otherwise the update PAIR
    (operation 3 with a synthetic before-image, operation 4 with the
    event row) sharing one ``seqval`` — so the parse side must really
    pair them. ``start_lsn`` packs the event id as
    ``vlf : event_id div 2^16 : event_id mod 2^16``, hence
    ``lsn_to_long(start_lsn) == (vlf << 48) + event_id`` exactly — the
    codec roundtrips and stays oracle-expressible. The update's
    before-image differs in ``value`` (+1) and carries NULL ``props``,
    exercising before/after divergence without touching the LWW result.
    """
    act = (
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    hexpad = lambda c, w: F.lpad(F.lower(F.hex(c)), w, "0")
    eid = F.col("event_id").cast("long")
    lsn = F.concat_ws(
        ":",
        hexpad(F.lit(vlf).cast("long"), 8),
        hexpad(F.expr("CAST(event_id AS BIGINT) div 65536"), 8),
        hexpad(F.pmod(eid, F.lit(65536)), 4),
    )
    row_img = F.struct(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("event_type"),
        F.col("value").cast("double").alias("value"),
        F.col("props").alias("props"),
    )
    before_img = F.struct(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").alias("event_type"),
        (F.col("value").cast("double") + F.lit(1.0)).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    piece = lambda op_code, img: F.struct(
        F.lit(op_code).alias("operation"), img.alias("data")
    )
    pieces = (
        F.when(act == "insert", F.array(piece(OP_INSERT, row_img)))
        .when(act == "delete", F.array(piece(OP_DELETE, row_img)))
        .otherwise(F.array(piece(OP_UPDATE_BEFORE, before_img),
                           piece(OP_UPDATE_AFTER, row_img)))
    )
    row = F.struct(
        lsn.alias("start_lsn"),
        lsn.alias("seqval"),
        F.col("p.operation").alias("operation"),
        F.lit("0f").alias("update_mask"),
        F.lit(capture_instance).alias("capture_instance"),
        (F.lit(base_ts_ms) + eid).alias("commit_time"),
        F.col("p.data").alias("data"),
    )
    return (
        events.select(eid.alias("event_id"), "user_id", "event_type",
                      "value", "props", F.explode(pieces).alias("p"))
        .select(F.to_json(row).alias("value"))
    )
