"""Multi-table capture: one envelope stream → many sink tables.

The reference's connector captures every included table of a database and
routes each change to its own topic/sink table (table include/exclude at
RelationalDatabaseConnectorConfig.java:267-355, per-table key/value schemas
via TableSchemaBuilder, per-topic sinks in JdbcChangeEventSink). The Spark
form: a ``MultiTableEngine`` owns one ``CdcEngine`` per captured table and
splits each micro-batch by ``source.table`` — one filter per table over the
same cached batch, so the stream is read once and each table's slice goes
through the standard reduce→MERGE path with its own fence and offsets.

Heterogeneous row schemas are supported by letting each table's envelopes
carry their own before/after struct: the splitter takes a dict of streams
OR one stream of a shared schema plus regex include/exclude filters.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import CdcEngine, EngineConfig
from .lake import LakeTable
from .sinkconfig import resolve_message_key


class MultiTableEngine:
    """Capture pipeline over a set of tables.

    ``tables``: dict of fully-qualified table name (``db.table``) →
    LakeTable. ``include``/``exclude``: regex lists applied to the
    qualified name (entire-identifier match, Selectors.java semantics) —
    tables filtered out are dropped from the stream even if present in
    ``tables``.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, LakeTable],
        config: EngineConfig | None = None,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        message_key_columns: str | None = None,
    ):
        self.spark = spark
        self.include = include
        self.exclude = exclude
        if message_key_columns is not None:
            # message.key.columns (Key.java CustomKeyMapper): the record key
            # IS the sink table's merge key here, so an override must agree
            # with the key the table was created with — validated fail-fast
            # like the reference's Field validators, instead of silently
            # merging on a different key than the one the user configured.
            for name, t in tables.items():
                if not self.captures(name):
                    continue
                want = resolve_message_key(
                    name, message_key_columns, t.manifest().key_cols
                )
                have = t.manifest().key_cols
                if want != have:
                    raise ValueError(
                        f"message.key.columns resolves {name!r} to key {want} "
                        f"but its sink table is keyed {have}; create the "
                        f"table with key_cols={want} (see resolve_message_key)"
                    )
        self.engines: dict[str, CdcEngine] = {
            name: CdcEngine(spark, t, self._cfg_for(name, config))
            for name, t in tables.items()
            if self.captures(name)
        }

    @staticmethod
    def _cfg_for(name: str, config: EngineConfig | None) -> EngineConfig:
        base = config or EngineConfig()
        # distinct writer per table: fences are per (writer, table)
        return EngineConfig(**{**base.__dict__, "writer": f"engine:{name}"})

    def captures(self, name: str) -> bool:
        if self.include is not None:
            return any(re.fullmatch(p, name) for p in self.include)
        if self.exclude is not None:
            return not any(re.fullmatch(p, name) for p in self.exclude)
        return True

    def run_snapshot(
        self, sources: dict[str, DataFrame]
    ) -> dict[str, dict]:
        """Initial consistent snapshot of every captured table (S3 — the
        reference snapshots tables on a thread pool sized by
        ``snapshot.max.threads``,
        RelationalSnapshotChangeEventSource.java:471-578; here each
        table's snapshot is itself a distributed Spark job, so tables run
        sequentially while each table's ROWS parallelize across the
        cluster — the right inversion of that design at scale).

        ``sources``: qualified table name → the pinned source DataFrame
        to snapshot. Names not captured (include/exclude filtered, or not
        configured) are skipped, same as :meth:`apply_batch` slices.
        Progress lands in each table's metrics log with the global
        (tables_total, tables_completed) position — the MXBean
        TotalTableCount/RemainingTableCount shape — so
        ``metrics.snapshot_progress()`` on the last-snapshotted table
        reads completed == total and ``cli.py metrics`` can dashboard
        the phase table-by-table."""
        names = sorted(n for n in sources if n in self.engines)
        out: dict[str, dict] = {}
        for i, name in enumerate(names):
            out[name] = self.engines[name].run_snapshot(
                sources[name],
                tables_total=len(names), tables_completed=i + 1,
            )
        return out

    def derived(self, writer_suffix: str) -> "MultiTableEngine":
        """A view over the same sink tables whose fences live in a
        suffixed writer namespace — the multi-table form of the seam
        ``streaming.start_stream`` uses so a streaming run's batch-id
        sequence (Spark's checkpointed ids) can never collide with the
        same tables' batch ``replay`` ids. Every pluggable seam of each
        engine (history store, offset mirror, signals) is inherited."""
        from dataclasses import replace

        clone = MultiTableEngine.__new__(MultiTableEngine)
        clone.spark = self.spark
        clone.include, clone.exclude = self.include, self.exclude
        clone.engines = {
            name: CdcEngine(
                eng.spark, eng.table,
                config=replace(
                    eng.cfg, writer=f"{eng.cfg.writer}{writer_suffix}"
                ),
                signal_processor=eng.signals,
                history_store=eng.schema_history.store,
                offset_store=eng.offset_store,
            )
            for name, eng in self.engines.items()
        }
        return clone

    def apply_batch(
        self, env: DataFrame, batch_id: int | None,
        offsets: dict | None = None, kind: str = "replay",
    ) -> dict[str, dict]:
        """Split one envelope micro-batch by ``source.table`` and apply each
        slice to its table's engine. The batch is persisted so the (possibly
        expensive) upstream is computed once for all tables.

        ``batch_id=None`` → each engine uses its own next id; an explicit
        id is applied to every engine (and fenced per engine). ``offsets``
        is shared: every table's checkpoint advances over the whole slice
        of the LOG, including tables the slice never touched — a restart
        must not re-read offsets any engine already covered."""
        qualified = F.concat_ws(
            ".", F.col("source.db"), F.col("source.table")
        )
        env = env.withColumn("__qtable", qualified).persist()
        try:
            out = {}
            for name, eng in self.engines.items():
                bid = batch_id if batch_id is not None else eng.committed_batch() + 1
                part = env.filter(F.col("__qtable") == name).drop("__qtable")
                out[name] = eng._apply_batch(
                    part, batch_id=bid, kind=kind, offsets=offsets
                )
            return out
        finally:
            env.unpersist()

    def replay(
        self,
        total_events: int,
        envelopes_for,
        batch_size: int = 1_000_000,
    ) -> dict:
        """Replay a shared offset space into all captured tables. Resume
        point = min over tables' committed offsets; tables already past a
        batch's offset range skip it entirely (their checkpoints never
        regress), so only the tables that fell behind re-apply."""
        start = min(
            (e.committed_offset() for e in self.engines.values()), default=0
        )
        stats = {"batches": 0, "events": 0}
        lo = start
        while lo < total_events:
            hi = min(lo + batch_size, total_events)
            behind = {
                name: eng for name, eng in self.engines.items()
                if eng.committed_offset() < hi
            }
            if behind:
                env = envelopes_for(lo, hi)
                qualified = F.concat_ws(
                    ".", F.col("source.db"), F.col("source.table")
                )
                env = env.withColumn("__qtable", qualified).persist()
                try:
                    for name, eng in behind.items():
                        part = env.filter(F.col("__qtable") == name).drop("__qtable")
                        eng._apply_batch(
                            part, batch_id=eng.committed_batch() + 1,
                            kind="replay", offsets={"lo": lo, "next": hi},
                        )
                finally:
                    env.unpersist()
                stats["batches"] += 1
                stats["events"] += hi - lo
            lo = hi
        return stats

    def state(self, name: str) -> DataFrame:
        return self.engines[name].table.read()
