"""T3/T10/T14 — predicate filters, table/column include-exclude.

Reference:
- Filter SMT (JSR223 scripting): debezium-scripting/.../transforms/Filter.java:21.
  The scripting engine becomes a Spark SQL ``expr()`` string — safer and
  Catalyst-optimized (pushes down, participates in codegen) instead of a
  per-record Groovy/JS evaluation.
- SchemaChangeEventFilter: core/transforms/SchemaChangeEventFilter.java.
- Table/column include-exclude: core/relational/RelationalDatabaseConnectorConfig.java:267-355
  (table.include.list / column.exclude.list regexes), impl Selectors.java.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_filter(condition: str):
    """Keep records where the SQL expression is true. The expression sees
    envelope columns (op, ts_ms, before.*, after.*, source.*)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.filter(F.expr(condition))

    return _apply


def drop_tombstones():
    """drop.tombstones=true (ExtractNewRecordStateConfigDefinition.java:16-27)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.filter(~F.col("tombstone")) if "tombstone" in df.columns else df

    return _apply


def schema_change_filter(include_types: list[str]):
    """Keep only schema-change events of the given change types
    (CREATE/ALTER/DROP) — applies to a schema-history stream."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.filter(F.col("change_type").isin(include_types))

    return _apply


def table_filter(include: list[str] | None = None, exclude: list[str] | None = None):
    """Regex allow/deny on ``source.table`` (fully-qualified ``db.table``).
    include wins over exclude when both given, matching the reference's
    rule that include.list and exclude.list are mutually exclusive."""

    def _apply(df: DataFrame) -> DataFrame:
        full = F.concat_ws(".", F.col("source.db"), F.col("source.table"))
        # reference semantics: patterns match the ENTIRE identifier
        # (Selectors.java uses Matcher.matches(), not find())
        if include:
            pred = F.lit(False)
            for p in include:
                pred = pred | full.rlike(f"^(?:{p})$")
            return df.filter(pred)
        if exclude:
            pred = F.lit(True)
            for p in exclude:
                pred = pred & ~full.rlike(f"^(?:{p})$")
            return df.filter(pred)
        return df

    return _apply


def include_exclude_columns(
    include: list[str] | None = None, exclude: list[str] | None = None
):
    """Project the before/after structs down to allowed row fields (the
    column.include.list / column.exclude.list projection). Works on
    envelope frames; column pruning then reaches the parquet scan."""

    def _keep(names: list[str]) -> list[str]:
        if include:
            return [n for n in names if any(re.fullmatch(p, n) for p in include)]
        if exclude:
            return [n for n in names if not any(re.fullmatch(p, n) for p in exclude)]
        return names

    def _apply(df: DataFrame) -> DataFrame:
        fields = [f.name for f in df.schema["after"].dataType.fields]
        kept = _keep(fields)
        def proj(side: str):
            return F.when(
                F.col(side).isNotNull(),
                F.struct(*[F.col(f"{side}.{c}").alias(c) for c in kept]),
            )
        return df.withColumn("before", proj("before")).withColumn("after", proj("after"))

    return _apply
