"""Shared scaffolding for the wire-format source adapters.

wal2json (S6), MongoDB change streams (S7), and LogMiner (S8) differ
only in how they derive the envelope's constituent expressions from
their wire shape; the failure-mode contract, the op-code lookup, and
the final envelope projection are one contract. Centralised here so the
envelope column set and the failure-handling semantics cannot drift
between adapters."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: the shipped wire formats the engine can ingest (one name per adapter)
WIRE_FORMATS = (
    "wal2json", "mongo", "logminer", "sqlserver", "maxwell", "pgoutput",
)


def parse_wire_lines(
    lines: DataFrame,
    wire_format: str,
    row_fields,
    key_cols: list[str],
    *,
    source_table: str | None = None,
    database: str | None = None,
    n_parts: int = 8,
    failure_handling: str = "skip",
    streaming: bool = False,
) -> DataFrame:
    """ONE dispatch table from wire-format name to envelope parse.

    Shared by the streaming front-end (``streaming.wire_envelope_stream``)
    and the batch CLI (``cli.py ingest``) so the two surfaces cannot
    drift: per-format argument mapping (mongo keys on the first key
    column; logminer's schema owner and maxwell's database both map from
    ``database``; sqlserver's capture instance maps from
    ``source_table``) lives here once.

    ``streaming=True`` refuses sqlserver: its operation-3/4 pairing is an
    aggregation whose before/after pair can straddle a micro-batch
    boundary (a tailer may flush them into different files); pairing
    across batches would need unbounded keyed state. The batch path's
    commit-next-at-boundary watermark re-reads the possibly-incomplete
    max-LSN transaction instead.

    ``n_parts`` must be the ENGINE's part count: the committed
    per-partition offset vector keys on ``part_id``, so a parser hashing
    keys into a different partition count would make the vector's
    pointwise-max merge compare unrelated key populations.
    """
    if wire_format == "sqlserver":
        if streaming:
            raise ValueError(
                "sqlserver pairing aggregates across lines and a tailer "
                "can split an update's 3/4 pair across micro-batches; use "
                "the batch ingest path (cli.py ingest --format sqlserver)"
            )
        from .sqlserver import change_table_to_envelopes

        return change_table_to_envelopes(
            lines, row_fields, key_cols, capture_instance=source_table,
            n_parts=n_parts, failure_handling=failure_handling)
    if wire_format == "pgoutput":
        if streaming:
            raise ValueError(
                "pgoutput attaches commit timestamps by joining DML rows "
                "with their transaction's Begin row, and a tailer can "
                "split the two across micro-batches; use the batch ingest "
                "path (cli.py ingest --format pgoutput)"
            )
        from .pgoutput import pgoutput_to_envelopes

        return pgoutput_to_envelopes(
            lines, row_fields, key_cols, table=source_table,
            n_parts=n_parts, failure_handling=failure_handling)
    if wire_format == "wal2json":
        from .wal2json import wal2json_to_envelopes

        return wal2json_to_envelopes(
            lines, row_fields, key_cols, table=source_table,
            n_parts=n_parts, failure_handling=failure_handling)
    if wire_format == "mongo":
        from .mongo import change_stream_to_envelopes

        return change_stream_to_envelopes(
            lines, row_fields, key_cols[0], collection=source_table,
            n_parts=n_parts, failure_handling=failure_handling)
    if wire_format == "logminer":
        from .logminer import logminer_to_envelopes

        return logminer_to_envelopes(
            lines, row_fields, key_cols, table=source_table,
            owner=database, n_parts=n_parts,
            failure_handling=failure_handling)
    if wire_format == "maxwell":
        from .maxwell import maxwell_to_envelopes

        return maxwell_to_envelopes(
            lines, row_fields, key_cols, database=database,
            table=source_table, n_parts=n_parts,
            failure_handling=failure_handling)
    raise ValueError(f"unknown wire format: {wire_format!r}")


def failure_opts(failure_handling: str) -> dict:
    """Validate event.processing.failure.handling.mode and return the
    ``from_json`` options implementing it at the parse boundary."""
    if failure_handling not in ("skip", "fail"):
        raise ValueError(
            f"unknown event.processing.failure.handling.mode {failure_handling!r}"
        )
    return {"mode": "FAILFAST"} if failure_handling == "fail" else {}


def op_lookup(mapping: dict[str, str], col) -> F.Column:
    """Wire op token → envelope op char via a literal map (JVM-side)."""
    return F.element_at(
        F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]), col
    )


def assemble_envelope(
    work: DataFrame,
    *,
    op,
    ts_ms,
    before,
    after,
    source,
    transaction,
    key: list,
    offset,
    n_parts: int,
) -> DataFrame:
    """The one envelope projection every wire adapter ends in: the
    9-column schema the engine consumes (envelope.py), with part routing
    by key hash — all events of one key land in one partition, the
    ordering invariant the LWW reduce needs (apply.py §2.5)."""
    from ..envelope import source_struct, transaction_struct

    return work.select(
        op.alias("op"),
        ts_ms.alias("ts_ms"),
        before.alias("before"),
        after.alias("after"),
        source.cast(source_struct()).alias("source"),
        transaction.cast(transaction_struct()).alias("transaction"),
        F.pmod(F.xxhash64(*key), F.lit(n_parts)).cast("int").alias("part_id"),
        offset.alias("offset"),
        F.lit(False).alias("tombstone"),
    )
