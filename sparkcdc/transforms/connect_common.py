"""Kafka Connect's common SMTs — the non-Debezium transforms real
Debezium pipelines chain in the same ``transforms=`` list (the reference
runs on Connect, so InsertField / ReplaceField / Cast / RegexRouter /
Flatten / TimestampConverter appear in virtually every production config
alongside ExtractNewRecordState; Debezium's own docs route topics with
RegexRouter).

Re-expressed over FLAT frames (the post-ExtractNewRecordState shape the
``$Value`` variants see), as pure Catalyst projections — each is a
zero-shuffle map that fuses into the surrounding whole-stage-codegen
span. References are the public Kafka Connect transform classes
(org.apache.kafka.connect.transforms.InsertField/ReplaceField/Cast/
RegexRouter/Flatten/TimestampConverter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Connect Cast spec types -> Spark SQL types (Cast.java VALID_TYPES)
_CAST_TYPES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
}


def insert_field(
    static_field: str | None = None,
    static_value: str | None = None,
    offset_field: str | None = None,
    timestamp_field: str | None = None,
    topic_field: str | None = None,
    topic_col: str = "route",
):
    """InsertField$Value: add static / coordinate fields to the value.

    Connect's record coordinates map onto the engine's columns: the
    record offset is the envelope ``offset``, the record timestamp is
    ``ts_ms``, and the topic is the routing column (``route`` by
    default — whatever an upstream router produced). Connect's ``!``
    (required) / ``?`` (optional) suffixes are config-parse sugar, not
    semantics, and are accepted and stripped here.
    """

    def _clean(name):
        return name.rstrip("!?") if name else name

    sf, of = _clean(static_field), _clean(offset_field)
    tf, pf = _clean(timestamp_field), _clean(topic_field)

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        if sf is not None:
            out = out.withColumn(sf, F.lit(static_value))
        if of is not None:
            src = F.col("offset") if "offset" in df.columns else F.lit(None)
            out = out.withColumn(of, src.cast("long"))
        if tf is not None:
            src = F.col("ts_ms") if "ts_ms" in df.columns else F.lit(None)
            out = out.withColumn(tf, src.cast("long"))
        if pf is not None:
            src = (
                F.col(topic_col) if topic_col in df.columns
                else F.lit(None).cast("string")
            )
            out = out.withColumn(pf, src)
        return out

    return _apply


def replace_field(
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    renames: dict[str, str] | str | None = None,
):
    """ReplaceField$Value: drop, keep, and/or rename value fields.

    ``renames`` accepts a dict or Connect's ``"old:new,old2:new2"``
    string form. Include/exclude follow ReplaceField.java order:
    exclusion first, then the include allowlist, then renames.
    """
    if isinstance(renames, str):
        renames = dict(
            pair.split(":", 1) for pair in renames.split(",") if pair
        )
    renames = renames or {}

    def _apply(df: DataFrame) -> DataFrame:
        cols = [c for c in df.columns if c not in (exclude or [])]
        if include is not None:
            cols = [c for c in cols if c in include]
        return df.select(
            *[F.col(c).alias(renames.get(c, c)) for c in cols]
        )

    return _apply


def cast_fields(spec: dict[str, str] | str):
    """Cast$Value: re-type value fields. ``spec`` is a dict or Connect's
    ``"col1:int64,col2:string"`` form; types are Connect schema types
    (int8..int64, float32/64, boolean, string)."""
    if isinstance(spec, str):
        spec = dict(pair.split(":", 1) for pair in spec.split(",") if pair)
    bad = sorted(t for t in spec.values() if t not in _CAST_TYPES)
    if bad:
        raise ValueError(
            f"unknown Cast types {bad}; known: {sorted(_CAST_TYPES)}"
        )

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        for col, t in spec.items():
            if col in df.columns:
                out = out.withColumn(col, F.col(col).cast(_CAST_TYPES[t]))
        return out

    return _apply


def regex_router(regex: str, replacement: str, topic_col: str = "route"):
    """RegexRouter: rewrite the routing column by Java regex. Only a
    FULL match re-routes (RegexRouter.java uses Matcher.matches(), not
    find()), so the pattern is anchored before the replace; non-matching
    topics pass through unchanged. Backreferences are ``$1``-style in
    both engines (Java regex under the hood)."""
    anchored = f"^(?:{regex})$"

    def _apply(df: DataFrame) -> DataFrame:
        if topic_col not in df.columns:
            raise ValueError(
                f"regex_router needs a {topic_col!r} column; "
                f"have {df.columns}"
            )
        c = F.col(topic_col)
        return df.withColumn(
            topic_col,
            F.when(
                c.rlike(anchored), F.regexp_replace(c, anchored, replacement)
            ).otherwise(c),
        )

    return _apply


def flatten_value(delimiter: str = "."):
    """Flatten$Value: recursively flatten struct fields into top-level
    columns named ``outer<delimiter>inner``. A NULL struct yields NULL
    leaves (Spark's struct field access is already null-propagating)."""

    def _apply(df: DataFrame) -> DataFrame:
        cols, names = [], []

        def walk(name: str, path: str, dtype):
            if hasattr(dtype, "fields"):
                for f in dtype.fields:
                    walk(name + delimiter + f.name, f"{path}.{f.name}",
                         f.dataType)
            else:
                cols.append(F.col(path).alias(name))
                names.append(name)

        for f in df.schema.fields:
            walk(f.name, f.name, f.dataType)
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(
                f"Flatten with delimiter {delimiter!r} folds distinct "
                f"fields into {dupes} — rename the colliding fields or "
                "pick another delimiter"
            )
        return df.select(*cols)

    return _apply


def timestamp_converter(
    field: str,
    target_type: str = "string",
    format: str | None = None,
    unix_precision: str = "milliseconds",
):
    """TimestampConverter$Value: convert a field between epoch numbers,
    formatted strings, and native timestamps/dates.

    Source type is inferred from the column's Spark type (long = epoch
    in ``unix_precision``; string parses with ``format``; timestamp/date
    used as-is) — the same inference TimestampConverter.java does from
    the Connect schema. Target ``string`` requires ``format``
    (SimpleDateFormat in Connect; the equivalent Spark datetime pattern
    here).
    """
    tt = target_type.lower()
    if tt not in ("string", "unix", "timestamp", "date"):
        raise ValueError(f"unknown TimestampConverter target {target_type!r}")
    if tt == "string" and not format:
        raise ValueError("target.type=string requires a format")
    if unix_precision not in (
        "seconds", "milliseconds", "microseconds", "nanoseconds",
    ):
        raise ValueError(f"unknown unix.precision {unix_precision!r}")

    # exact integer conversions in BOTH directions — a scale-then-divide
    # like unix_micros(ts) * 1e6 / 1e6 overflows 64-bit for micro/nano
    # precision on current-era epochs, and double division loses exactness
    # beyond 2^53 (any nanosecond epoch after ~104 days)
    def _epoch_to_ts(c):
        if unix_precision == "seconds":
            return F.timestamp_seconds(c)
        if unix_precision == "milliseconds":
            return F.timestamp_millis(c)
        if unix_precision == "microseconds":
            return F.timestamp_micros(c)
        return F.timestamp_micros(
            F.floor(c.cast("decimal(38,0)") / 1000).cast("long")
        )

    def _ts_to_epoch(ts):
        if unix_precision == "seconds":
            return F.unix_seconds(ts)
        if unix_precision == "milliseconds":
            return F.unix_millis(ts)
        if unix_precision == "microseconds":
            return F.unix_micros(ts)
        # nanos overflow long past 2262, same bound as Connect's nanos
        return F.unix_micros(ts) * F.lit(1000)

    def _apply(df: DataFrame) -> DataFrame:
        st = df.schema[field].dataType.simpleString()
        c = F.col(field)
        if st in ("bigint", "int", "long"):
            ts = _epoch_to_ts(c.cast("long"))
        elif st == "string":
            ts = F.to_timestamp(c, format) if format else F.to_timestamp(c)
        else:
            ts = c.cast("timestamp")
        if tt == "string":
            out = F.date_format(ts, format)
        elif tt == "unix":
            out = _ts_to_epoch(ts)
        elif tt == "date":
            out = ts.cast("date")
        else:
            out = ts
        return df.withColumn(field, out)

    return _apply


def extract_field(field: str):
    """ExtractField$Value: the record value BECOMES the named field
    (ExtractField.java). A struct field expands to its members as the new
    flat value (the Connect value would be that Struct); a scalar field
    becomes a single column keeping its name; a missing field is a config
    error (Connect throws on missing field when schemas are enabled)."""

    def _apply(df: DataFrame) -> DataFrame:
        if field not in df.columns:
            raise ValueError(
                f"ExtractField: no field {field!r} in {df.columns}"
            )
        if hasattr(df.schema[field].dataType, "fields"):
            return df.select(f"{field}.*")
        return df.select(field)

    return _apply


def hoist_field(name: str):
    """HoistField$Value: wrap the entire value in a single struct field
    ``name`` (HoistField.java) — the inverse of ExtractField."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(
            F.struct(*[F.col(c) for c in df.columns]).alias(name)
        )

    return _apply


def value_to_key(fields: list[str] | str):
    """ValueToKey: replace the record key with a struct of the named
    value fields (ValueToKey.java). The engine's record key is a column,
    so the key lands as a ``__key`` struct column — the same column
    contract ``sinkconfig.resolve_message_key`` consumes; the value
    fields are kept (Connect copies, not moves)."""
    if isinstance(fields, str):
        fields = [f for f in fields.split(",") if f]

    def _apply(df: DataFrame) -> DataFrame:
        missing = [f for f in fields if f not in df.columns]
        if missing:
            raise ValueError(
                f"ValueToKey: no fields {missing} in {df.columns}"
            )
        return df.withColumn(
            "__key", F.struct(*[F.col(f) for f in fields])
        )

    return _apply


def insert_header(header: str, value_literal: str):
    """InsertHeader: add a static header (InsertHeader.java). Headers are
    columns in this model, so this is a literal column; chain with
    ``header_to_value`` / ``drop_headers`` like any other column."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(header, F.lit(value_literal))

    return _apply


def header_from(fields: list[str], headers: list[str],
                operation: str = "copy"):
    """HeaderFrom$Value: copy/move value fields into headers
    (HeaderFrom.java) — the inverse of the reference's HeaderToValue.
    ``operation`` is ``copy`` or ``move`` (move drops the value field)."""
    if operation not in ("copy", "move"):
        raise ValueError(f"unknown HeaderFrom operation {operation!r}")
    if len(fields) != len(headers):
        raise ValueError("HeaderFrom: fields and headers must pair up")

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        for f_, h in zip(fields, headers):
            out = out.withColumn(h, F.col(f_))
            if operation == "move":
                out = out.drop(f_)
        return out

    return _apply


def drop_headers(headers: list[str]):
    """DropHeaders: remove the named header columns (DropHeaders.java)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.drop(*headers)

    return _apply
