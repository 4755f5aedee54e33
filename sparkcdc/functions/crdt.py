"""State-based CRDT counters (reference: debezium-core
io/debezium/crdt/{GCounter,PNCounter,StateBasedPNCounter,...}.java) as
DataFrame aggregations.

The reference uses these to keep monitoring counts correct under retries
and replica merges: a grow-only counter (G-Counter) holds one
monotonically-increasing count PER REPLICA and merges two states by
element-wise max; its value is the sum over replicas. A PN-Counter is two
G-Counters (adds, removes); value = adds - removes.

The Spark formulation is exactly the same algebra, so redelivered or
duplicated state reports are ABSORBED, not double-counted:

    merge  = groupBy(key, replica).agg(max(adds), max(removes))   # idempotent
    value  = groupBy(key).agg(sum(adds) - sum(removes))           # commutative

This is what makes the counters safe in the engine's world: a retried
task or a redelivered micro-batch re-reports the same per-replica state,
and max() makes the merge a no-op — the CRDT guarantee (associative,
commutative, idempotent) by construction, with no coordination.

All functions take *state rows* — (key..., replica, adds[, removes]) —
where each row is some replica's cumulative count at some point in time;
later rows dominate earlier ones through max. Partial aggregation makes
the merge map-side; shuffle width is (key, replica, two longs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def g_counter_value(
    states: DataFrame,
    key_cols: list[str],
    *,
    replica_col: str = "replica",
    adds_col: str = "adds",
) -> DataFrame:
    """Merge G-Counter states and read the value: max per (key, replica),
    summed over replicas. Output: key_cols + ``value``."""
    per_replica = (
        states.groupBy(*key_cols, replica_col)
        .agg(F.max(adds_col).alias("__adds"))
    )
    return (
        per_replica.groupBy(*key_cols)
        .agg(F.sum("__adds").alias("value"))
    )


def pn_counter_value(
    states: DataFrame,
    key_cols: list[str],
    *,
    replica_col: str = "replica",
    adds_col: str = "adds",
    removes_col: str = "removes",
) -> DataFrame:
    """Merge PN-Counter states and read the value. Output: key_cols +
    (adds, removes, value) — the reference's PNCount view (increments,
    decrements, and their difference)."""
    per_replica = (
        states.groupBy(*key_cols, replica_col)
        .agg(
            F.max(adds_col).alias("__adds"),
            F.max(removes_col).alias("__removes"),
        )
    )
    return per_replica.groupBy(*key_cols).agg(
        F.sum("__adds").alias("adds"),
        F.sum("__removes").alias("removes"),
        (F.sum("__adds") - F.sum("__removes")).alias("value"),
    )


def merge_counter_states(*states: DataFrame) -> DataFrame:
    """Union replica state reports from multiple sources into one state
    frame (merge of state-based CRDTs is just set union — the reduce in
    the value readers does the max). Frames must share a schema."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out
