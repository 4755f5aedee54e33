"""T8/T9/T12/T13 — column-level transforms.

Reference:
- HeaderToValue: core/transforms/HeaderToValue.java (headers are just
  columns in the DataFrame model, so move/copy = withColumn/drop)
- TimezoneConverter: core/transforms/TimezoneConverter.java
- MaskStrings: core/relational/mapping/MaskStrings.java (constant mask or
  salted SHA-256 — builtin sha2, no UDF)
- TruncateColumn: core/relational/mapping/TruncateColumn.java
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rename_all_columns(df: DataFrame, fn, error_prefix: str) -> DataFrame:
    """Rename every column of a flat frame through ``fn``, rejecting
    fail-fast any two distinct columns that fold to one name (the shared
    collision contract of sink column-naming strategies and Avro
    field-name adjustment — a silent fold would build an invalid record
    or an ambiguous sink schema)."""
    new = [fn(c) for c in df.columns]
    if len(set(new)) != len(new):
        dupes = sorted({n for n in new if new.count(n) > 1})
        raise ValueError(
            f"{error_prefix} folds distinct fields together: {dupes}"
        )
    return df.toDF(*new)


def header_to_value(headers: list[str], fields: list[str], operation: str = "copy"):
    """Copy/move 'header' columns into value fields. In the envelope model
    the headers are top-level columns; values live in after.*; here we add
    them as __-prefixed flat columns like the reference's value fields."""

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        for h, f_ in zip(headers, fields):
            out = out.withColumn(f_, F.col(h))
            if operation == "move":
                out = out.drop(h)
        return out

    return _apply


def _convert_struct_ts(df: DataFrame, side: str, fields: list[str],
                       target_tz: str, gate=None):
    st = df.schema[side].dataType
    cols = []
    for f in st.fields:
        c = F.col(f"{side}.{f.name}")
        if f.name in fields:
            conv = F.convert_timezone(F.lit("UTC"), F.lit(target_tz), c)
            if gate is not None:
                g = gate(f.name)
                conv = F.when(g, conv).otherwise(c)
            c = conv
        cols.append(c.alias(f.name))
    return F.when(F.col(side).isNotNull(), F.struct(*cols))


def _tz_rule_gate(rules: list[str], topic_col, has_source: bool = True):
    """Compile TimezoneConverter include/exclude rules into a per-field
    row predicate builder (core/transforms/TimezoneConverter.java:67-91):

    - ``source:<table>[:<field>]`` — match on the envelope's
      ``source.table``;
    - ``topic:<topic>[:<field>]`` — match on the routing topic column;
    - ``<name>:<field>`` — heuristic: source.table when a source block
      exists, else the topic (the reference's <matchname> form).

    Returns ``gate(field) -> Column`` true where a rule matches that
    row+field. Rules without a field part match every time-based field."""
    parsed = []
    for r in rules:
        parts = [p.strip() for p in r.split(":")]
        if parts[0] in ("source", "topic"):
            kind, name = parts[0], parts[1]
            fld = parts[2] if len(parts) > 2 else None
        else:  # heuristic <matchname>[:<field>]
            kind, name = "auto", parts[0]
            fld = parts[1] if len(parts) > 1 else None
        parsed.append((kind, name, fld))

    def gate(field: str):
        conds = []
        for kind, name, fld in parsed:
            if fld is not None and fld != field:
                continue
            # Frames with no source block (flat routed output) can never
            # match a source rule; NULL source.table must read as
            # no-match, not NULL, so exclude's negation stays two-valued.
            src = (
                (F.col("source.table") == name) if has_source else F.lit(False)
            )
            top = (topic_col == name) if topic_col is not None else F.lit(False)
            if kind == "source":
                conds.append(src)
            elif kind == "topic":
                conds.append(top)
            elif has_source:  # auto: source block if present, else topic
                conds.append(
                    F.when(F.col("source").isNotNull(), src).otherwise(top)
                )
            else:
                conds.append(top)
        out = F.lit(False)
        for c in conds:
            out = out | c
        return F.coalesce(out, F.lit(False))

    return gate


def timezone_converter(
    target_tz: str,
    ts_fields: list[str] | None = None,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    topic_col: str | None = None,
):
    """Convert temporal fields to a target timezone. Converts envelope
    ``ts_ms`` companions and any named row fields inside before/after.

    ``include`` / ``exclude`` are the reference's rule lists
    (``source:<table>[:<field>]``, ``topic:<topic>[:<field>]``,
    ``<matchname>:<field>``) — mutually exclusive, as in
    TimezoneConverter.java's config validation. With ``include`` only
    matching rows/fields convert; with ``exclude`` matching rows/fields
    are left alone and everything else converts. ``topic_col`` names the
    routing-topic column for topic rules (e.g. after ByLogicalTableRouter
    added one); absent, topic rules never match."""
    ts_fields = ts_fields or []
    if include and exclude:
        raise ValueError(
            "include.list and exclude.list are mutually exclusive"
        )

    def _apply(df: DataFrame) -> DataFrame:
        tcol = F.col(topic_col) if topic_col and topic_col in df.columns else None
        has_source = "source" in df.columns
        gate = None
        if include:
            gate = _tz_rule_gate(include, tcol, has_source)
        elif exclude:
            ex = _tz_rule_gate(exclude, tcol, has_source)
            gate = lambda f: ~ex(f)  # noqa: E731
        out = df
        if ts_fields and "after" in df.columns:
            out = out.withColumn("before", _convert_struct_ts(
                out, "before", ts_fields, target_tz, gate))
            out = out.withColumn("after", _convert_struct_ts(
                out, "after", ts_fields, target_tz, gate))
        # flat frames: convert named columns directly
        for c in ts_fields:
            if c in out.columns:
                conv = F.convert_timezone(
                    F.lit("UTC"), F.lit(target_tz), F.col(c))
                if gate is not None:
                    conv = F.when(gate(c), conv).otherwise(F.col(c))
                out = out.withColumn(c, conv)
        return out

    return _apply


def mask_strings(columns: list[str], salt: str | None = None, mask_char: str = "*", length: int = 10):
    """MaskStrings.java semantics: replace with a constant mask, or — when a
    salt is given — with sha256(salt || value) hex (pseudonymization that
    preserves equality for joins). Operates on flat frames and on
    before/after struct fields of envelope frames."""

    def mask_expr(c):
        if salt is not None:
            return F.sha2(F.concat(F.lit(salt), c), 256)
        return F.lit(mask_char * length)

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        flat = [c for c in columns if c in df.columns]
        for c in flat:
            out = out.withColumn(c, F.when(F.col(c).isNotNull(), mask_expr(F.col(c))))
        if "after" in df.columns and hasattr(df.schema["after"].dataType, "fields"):
            targets = [
                f.name for f in df.schema["after"].dataType.fields if f.name in columns
            ]
            for side in ("before", "after"):
                if targets:
                    st = df.schema[side].dataType
                    cols = [
                        (
                            F.when(
                                F.col(f"{side}.{f.name}").isNotNull(),
                                mask_expr(F.col(f"{side}.{f.name}")),
                            )
                            if f.name in targets
                            else F.col(f"{side}.{f.name}")
                        ).alias(f.name)
                        for f in st.fields
                    ]
                    out = out.withColumn(
                        side, F.when(F.col(side).isNotNull(), F.struct(*cols))
                    )
        return out

    return _apply


def truncate_columns(columns: dict[str, int]):
    """TruncateColumn.java: truncate string columns to a max length."""

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        for c, n in columns.items():
            if c in out.columns:
                out = out.withColumn(c, F.substring(F.col(c), 1, n))
        if "after" in df.columns and hasattr(df.schema["after"].dataType, "fields"):
            for side in ("before", "after"):
                st = df.schema[side].dataType
                cols = [
                    (
                        F.substring(F.col(f"{side}.{f.name}"), 1, columns[f.name])
                        if f.name in columns
                        else F.col(f"{side}.{f.name}")
                    ).alias(f.name)
                    for f in st.fields
                ]
                out = out.withColumn(
                    side, F.when(F.col(side).isNotNull(), F.struct(*cols))
                )
        return out

    return _apply


#: schema-parameter keys the reference attaches when
#: ``column.propagate.source.type`` matches a column
#: (core/relational/TableSchemaBuilder.java: PropagateSourceTypeToSchemaParameter —
#: "__debezium.source.column.type" / ".length" / ".scale")
TYPE_PARAM = "__debezium.source.column.type"
LENGTH_PARAM = "__debezium.source.column.length"
SCALE_PARAM = "__debezium.source.column.scale"


def propagate_source_column_type(
    patterns: list[str],
    catalog: dict[str, dict],
    table: str = "",
):
    """``column.propagate.source.type`` (RelationalDatabaseConnectorConfig:
    propagate the captured column's ORIGINAL database type name, length and
    scale into the emitted schema, as ``__debezium.source.column.*``
    parameters, for columns whose fully-qualified name matches a regex).

    Kafka-Connect schema parameters map 1:1 onto Spark ``StructField``
    metadata, so the propagation is plan-free: matched columns are
    re-aliased with ``alias(name, metadata=...)`` — zero row work, and the
    metadata survives parquet/DataFrame round-trips (verified in tests).

    ``catalog``: column name → ``{"type": "VARCHAR", "length": 255,
    "scale": None}`` (see :func:`sparkcdc.ddl.raw_column_types` for building
    one from captured CREATE statements). ``patterns`` are regexes matched
    (entire-identifier, Predicates.java semantics) against
    ``<table>.<column>`` when ``table`` is given, else the bare column name.
    """
    import re

    def _metadata(col_name: str) -> dict | None:
        qualified = f"{table}.{col_name}" if table else col_name
        if not any(re.fullmatch(p, qualified) for p in patterns):
            return None
        info = catalog.get(col_name)
        if info is None:
            return None
        md = {TYPE_PARAM: str(info["type"]).upper()}
        if info.get("length") is not None:
            md[LENGTH_PARAM] = int(info["length"])
        if info.get("scale") is not None:
            md[SCALE_PARAM] = int(info["scale"])
        return md

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        for c in df.columns:
            if c in ("before", "after"):
                continue
            md = _metadata(c)
            if md is not None:
                out = out.withColumn(c, F.col(c).alias(c, metadata=md))
        if "after" in df.columns and hasattr(df.schema["after"].dataType, "fields"):
            st = df.schema["after"].dataType
            per_field = {f.name: _metadata(f.name) for f in st.fields}
            if any(md is not None for md in per_field.values()):
                for side in ("before", "after"):
                    cols = [
                        F.col(f"{side}.{f.name}").alias(
                            f.name, metadata=per_field[f.name] or {}
                        )
                        for f in st.fields
                    ]
                    out = out.withColumn(
                        side,
                        F.when(F.col(side).isNotNull(), F.struct(*cols)).alias(
                            side
                        ),
                    )
        return out

    return _apply


def read_to_insert(snapshot_aware: bool = True):
    """ReadToInsertEvent analog (reference:
    debezium-connector-postgres/.../transforms/ReadToInsertEvent.java):
    rewrite snapshot READ events (op='r') as INSERTs (op='c') so sinks
    that dispatch on op treat the initial snapshot like regular inserts.

    With ``snapshot_aware`` (the SMT's documented behavior) the
    ``source.snapshot`` flag is preserved — only the op changes — so
    provenance survives the rewrite.
    """

    def _apply(df: DataFrame) -> DataFrame:
        out = df.withColumn(
            "op",
            F.when(F.col("op") == "r", F.lit("c")).otherwise(F.col("op")),
        )
        if not snapshot_aware and "source" in df.columns:
            fields = df.schema["source"].dataType.fieldNames()
            out = out.withColumn(
                "source",
                F.struct(*[
                    (F.lit("false") if n == "snapshot"
                     else F.col("source")[n]).alias(n)
                    for n in fields
                ]),
            )
        return out

    return _apply
