"""CdcEngine — the orchestrator: snapshot phase -> micro-batched replay ->
reduce -> MERGE -> offset commit + metrics, resumable from checkpoint.

This is the Spark re-expression of the reference's engine loop
(ChangeEventSourceCoordinator.java:185 executeChangeEventSources ->
doSnapshot :276-297 -> streamEvents :313-335, delivery + offset commit at
EmbeddedEngine.java:885-902). The bounded queue / poll design
(ChangeEventQueue.java:62-105) becomes the micro-batch boundary; the async
SMT worker pool (AsyncEmbeddedEngine.java:1191) becomes Catalyst whole-stage
codegen. Exactly-once = idempotent MERGE + batch-id fencing in the table
manifest (the reference itself is at-least-once with idempotent sinks,
SURVEY §2.9 — same recipe, with the fence made explicit).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import apply as apply_mod
from .envelope import REPO_KEY, REPO_ROW_FIELDS, cdc_events, snapshot_events
from .lake import LakeTable
from .metrics import MetricsLog

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class EngineConfig:
    """cf. CommonConnectorConfig.java:569-572 defaults (max.batch.size=2048,
    max.queue.size=8192) — micro-batch size plays both roles here, scaled up
    because a vectorized batch is cheap."""

    batch_size: int = 1_000_000
    n_parts: int = 8
    n_keys: int = 1000
    seed: int = 42
    hot_key_permille: int = 0
    salt_buckets: int = 0  # >0 => two-level reduce for hot keys
    content_chars: int = 64
    snapshot_mode: str = "initial"  # initial | no_data | never (BinlogConnectorConfig.java:126-181)
    transforms: list[Transform] = field(default_factory=list)
    writer: str = "engine"


class CdcEngine:
    def __init__(self, spark: SparkSession, table: LakeTable, config: EngineConfig | None = None):
        self.spark = spark
        self.table = table
        self.cfg = config or EngineConfig()
        self.metrics = MetricsLog(os.path.join(table.meta_dir, "metrics.jsonl"))

    # -- checkpoint state -----------------------------------------------------

    def committed_offset(self) -> int:
        """Resume point: next global offset to read (K6/K7). Stored in the
        table manifest summary so the offset commit and the data commit are
        the same atomic pointer flip."""
        return int(self.table.manifest().summary.get("offsets", {}).get("next", 0))

    def committed_batch(self) -> int:
        return int(
            self.table.manifest().summary.get("last_batch", {}).get(self.cfg.writer, -1)
        )

    # -- phases ---------------------------------------------------------------

    def run_snapshot(self, source_df: DataFrame) -> dict:
        """Initial consistent snapshot (S1): read the pinned source state,
        wrap as op='r' envelopes, apply as batch 0."""
        env = snapshot_events(source_df, n_parts=self.cfg.n_parts)
        return self._apply_batch(env, batch_id=0, kind="snapshot")

    def replay(
        self,
        total_events: int,
        envelopes_for: Callable[[int, int], DataFrame] | None = None,
    ) -> dict:
        """Replay events [committed, total_events) in micro-batches.

        ``envelopes_for(lo, hi)`` yields the envelope DataFrame for a global
        offset slice; defaults to the deterministic generator. Restart-safe:
        picks up from the committed offset, and a re-applied batch is fenced.
        """
        cfg = self.cfg
        if envelopes_for is None:
            envelopes_for = lambda lo, hi: cdc_events(  # noqa: E731
                self.spark, hi - lo, start=lo, n_keys=cfg.n_keys,
                n_parts=cfg.n_parts, seed=cfg.seed,
                hot_key_permille=cfg.hot_key_permille,
                content_chars=cfg.content_chars,
            )
        start = self.committed_offset()
        batch_id = self.committed_batch() + 1
        stats = {"batches": 0, "events": 0, "wall_sec": 0.0}
        lo = start
        while lo < total_events:
            hi = min(lo + cfg.batch_size, total_events)
            env = envelopes_for(lo, hi)
            r = self._apply_batch(env, batch_id=batch_id, kind="replay",
                                  offsets={"lo": lo, "next": hi})
            stats["batches"] += 1
            stats["events"] += hi - lo
            stats["wall_sec"] += r["wall_sec"]
            lo = hi
            batch_id += 1
        stats["events_per_sec"] = (
            stats["events"] / stats["wall_sec"] if stats["wall_sec"] else 0.0
        )
        return stats

    # -- core batch path --------------------------------------------------------

    def _apply_batch(
        self, env: DataFrame, batch_id: int, kind: str, offsets: dict | None = None
    ) -> dict:
        t0 = time.time()
        for tf in self.cfg.transforms:
            env = tf(env)
        m = self.table.manifest()
        row_cols = [f.name for f in m.fields]
        changes = apply_mod.reduce_envelopes(
            env, row_cols, m.key_cols, salt_buckets=self.cfg.salt_buckets
        )
        summary = {"offsets": offsets or {}}
        res = self.table.merge(
            changes, batch_id=batch_id, writer=self.cfg.writer, summary=summary
        )
        wall = time.time() - t0
        n_events = offsets["next"] - offsets["lo"] if offsets else -1
        self.metrics.record(
            kind=kind, batch_id=batch_id, n_events=n_events,
            offsets=offsets, wall_sec=round(wall, 3),
            version=res.get("version"), skipped=res.get("skipped", False),
            affected_buckets=res.get("affected_buckets"),
        )
        return {**res, "wall_sec": wall}


def default_engine(
    spark: SparkSession,
    root: str,
    name: str = "source_code_repos",
    n_buckets: int = 16,
    config: EngineConfig | None = None,
) -> CdcEngine:
    """Create-or-load the north-star table and wrap it in an engine."""
    if LakeTable.exists(root, name):
        table = LakeTable.load(spark, root, name)
    else:
        table = LakeTable.create(
            spark, root, name,
            fields=[(n, "string") for n, _ in REPO_ROW_FIELDS],
            key_cols=REPO_KEY, n_buckets=n_buckets,
        )
    return CdcEngine(spark, table, config)
