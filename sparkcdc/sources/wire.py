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
