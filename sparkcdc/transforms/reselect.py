"""T15 — ReselectColumnsPostProcessor.

Reference: core/processors/reselect/ReselectColumnsPostProcessor.java:51 —
when a source emits update events with unavailable column values (Postgres
TOAST placeholders, Oracle unavailable LOBs), re-query the source for those
columns. The Spark-native form is a lookup join against the current sink
state: for rows where a column carries the unavailable marker, coalesce in
the sink's current value. One broadcast-able join per batch instead of one
point query per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNAVAILABLE = "__debezium_unavailable_value"  # reference's placeholder literal


def reselect_columns(
    current_state: DataFrame,
    key_cols: list[str],
    reselect_cols: list[str],
    marker: str = UNAVAILABLE,
):
    """Fill marker values in flat change rows from the current table state.

    ``current_state`` should be the sink table read (LakeTable.read()); it is
    broadcast when small, else AQE picks the join strategy.
    """
    def _apply(df: DataFrame) -> DataFrame:
        lookup = current_state.select(
            *key_cols, *[F.col(c).alias(f"__cur_{c}") for c in reselect_cols]
        )
        out = df.join(lookup, on=key_cols, how="left")
        for c in reselect_cols:
            out = out.withColumn(
                c,
                F.when(F.col(c) == marker, F.col(f"__cur_{c}")).otherwise(F.col(c)),
            ).drop(f"__cur_{c}")
        return out

    return _apply
