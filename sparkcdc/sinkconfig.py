"""Sink key/insert-mode configuration (K5/K2 config parity).

Reference: jdbc-sink/JdbcSinkConnectorConfig.java —
``primary.key.mode = record_key | record_value | kafka | none`` +
``primary.key.fields`` (:384,541-558) and
``insert.mode = insert | upsert | update`` (:275-289). This module resolves
those configs against the envelope/value shape into the effective merge key
columns, and validates the combinations the reference rejects (e.g. upsert
requires a key; ``kafka`` mode keys on the coordinates triple).
"""

from __future__ import annotations

import re

#: kafka-coordinates key (topic, partition, offset) → our lake analog:
#: the source table plays the topic, part_id/offset are the coordinates
KAFKA_KEY_COLS = ["part_id", "offset"]


def resolve_key_columns(
    mode: str,
    *,
    envelope_key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    key_fields: list[str] | None = None,
) -> list[str]:
    """The effective primary-key columns for the sink table.

    - ``record_key``: the captured table's key (optionally narrowed by
      ``key_fields``) — the default and the only mode the engine's replay
      path uses.
    - ``record_value``: ``key_fields`` drawn from the VALUE columns (for
      sources whose key is absent/unusable).
    - ``kafka``: the (partition, offset) coordinates — every event is its
      own key (append-only audit shape).
    - ``none``: no key → insert-mode only (LakeTable.append), merge is
      rejected.
    """
    if mode == "record_key":
        base = envelope_key_cols or []
        if not base:
            raise ValueError("record_key mode requires envelope key columns")
        if key_fields:
            missing = [k for k in key_fields if k not in base]
            if missing:
                raise ValueError(
                    f"primary.key.fields {missing} not in record key {base}"
                )
            return list(key_fields)
        return list(base)
    if mode == "record_value":
        if not key_fields:
            raise ValueError("record_value mode requires primary.key.fields")
        missing = [k for k in key_fields if k not in (value_cols or [])]
        if missing:
            raise ValueError(f"primary.key.fields {missing} not in value columns")
        return list(key_fields)
    if mode == "kafka":
        return list(KAFKA_KEY_COLS)
    if mode == "none":
        return []
    raise ValueError(f"unknown primary.key.mode {mode!r}")


def validate_insert_mode(insert_mode: str, key_cols: list[str]) -> None:
    """upsert/update require a key (JdbcSinkConnectorConfig validators);
    insert works with or without one."""
    if insert_mode not in ("insert", "upsert", "update"):
        raise ValueError(f"unknown insert.mode {insert_mode!r}")
    if insert_mode in ("upsert", "update") and not key_cols:
        raise ValueError(
            f"insert.mode={insert_mode} requires key columns "
            "(primary.key.mode=none is insert-only)"
        )


# -- message.key.columns: per-table record-key override -----------------------

def message_key_overrides(spec: str) -> list[tuple["re.Pattern", list[str]]]:
    """Parse the ``message.key.columns`` spec
    (core/relational/Key.java CustomKeyMapper, configured at
    RelationalDatabaseConnectorConfig.MSG_KEY_COLUMNS):
    ``"<table-regex>:<col>,<col>;<table-regex>:<col>"`` — each regex is
    matched (entire identifier) against the fully-qualified table name; the
    FIRST matching entry supplies the record-key columns for that table,
    overriding the table's primary key."""
    import re

    out: list[tuple[re.Pattern, list[str]]] = []
    for entry in spec.split(";"):
        entry = entry.strip()
        if not entry:
            continue
        pattern, sep, cols = entry.rpartition(":")
        if not sep or not pattern:
            raise ValueError(
                f"message.key.columns entry {entry!r} is not <regex>:<columns>"
            )
        col_list = [c.strip() for c in cols.split(",") if c.strip()]
        if not col_list:
            raise ValueError(f"message.key.columns entry {entry!r} has no columns")
        out.append((re.compile(pattern), col_list))
    return out


def resolve_message_key(
    qualified_table: str,
    overrides: "str | list[tuple[re.Pattern, list[str]]] | None",
    default: list[str],
) -> list[str]:
    """The effective record-key columns for one captured table: the first
    matching ``message.key.columns`` entry, else the table's own key
    (CustomKeyMapper.getKeyMapper falls back to the PK-based mapper)."""
    if overrides is None:
        return list(default)
    if isinstance(overrides, str):
        overrides = message_key_overrides(overrides)
    for pattern, cols in overrides:
        if pattern.fullmatch(qualified_table):
            return list(cols)
    return list(default)


# -- collection.name.format: sink table naming strategy -----------------------

def resolve_collection_name(
    name_format: str, topic: str, source: dict | None = None
) -> str | None:
    """``collection.name.format`` (DefaultCollectionNamingStrategy): render
    the sink table name from a format string. ``${topic}`` substitutes the
    topic with dots replaced by underscores; ``${source.<field>}``
    placeholders read the Debezium envelope's source block — a record
    without one cannot be resolved and returns None (the reference logs
    and skips such records).

    >>> resolve_collection_name("${topic}", "app.public.orders")
    'app_public_orders'
    >>> resolve_collection_name("${source.db}_${source.table}", "t",
    ...                         {"db": "app", "table": "orders"})
    'app_orders'
    """
    import re

    out = name_format.replace("${topic}", topic.replace(".", "_"))
    if "${source." in out:
        if source is None:
            return None
        for m in re.findall(r"\$\{source\.(.*?)\}", out):
            if m not in source:
                # one skip contract for both unresolvable flavors: no
                # source block and missing referenced field both return
                # None (the reference logs and skips such records)
                return None
            out = out.replace("${source." + m + "}", str(source[m]))
    return out


# -- column.naming.strategy: sink column naming ------------------------------

#: built-in column naming strategies (ColumnNamingStrategy SPI,
#: debezium-sink/.../naming/DefaultColumnNamingStrategy.java — the default
#: is a no-op; the SPI exists for dialects that need case folding or
#: snake_case targets). Custom = pass any str -> str callable.
COLUMN_NAMING_STRATEGIES = {
    "none": lambda n: n,
    "lower": str.lower,
    "upper": str.upper,
    # camelCase / PascalCase -> snake_case (common JDBC dialect ask)
    "snake": lambda n: re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", n).lower(),
}


def resolve_column_name(field_name: str, strategy="none") -> str:
    """Map an envelope field name to its sink column name.

    ``strategy``: a key of :data:`COLUMN_NAMING_STRATEGIES` or a
    callable. Identity by default, like the reference.
    """
    fn = (
        strategy if callable(strategy)
        else COLUMN_NAMING_STRATEGIES.get(strategy)
    )
    if fn is None:
        raise ValueError(
            f"unknown column naming strategy {strategy!r} "
            f"(one of {sorted(COLUMN_NAMING_STRATEGIES)} or a callable)"
        )
    return fn(field_name)


def rename_columns(df, strategy="none"):
    """Apply a column naming strategy to a flat sink frame. Collisions
    (two fields folding to one name) are rejected fail-fast."""
    from .transforms.columns import rename_all_columns

    return rename_all_columns(
        df, lambda c: resolve_column_name(c, strategy),
        "column naming strategy",
    )
