"""Debezium ``.properties`` configuration surface — build a sparkcdc
pipeline from the SAME flat key/value config a reference user already
has (SURVEY §2.10: the embedded-engine / Kafka-Connect deployment
contract).

The reference's embedded engine is configured with a
``java.util.Properties`` map (debezium-api
io/debezium/engine/DebeziumEngine.java Builder.using(Properties);
debezium-embedded/src/main/java/io/debezium/embedded/
EmbeddedEngineConfig.java), and every connector/SMT option is a dotted
property name. This module is the switch-over path: feed the exact
properties file that drives a Debezium deployment and get back the
sparkcdc equivalents —

- :func:`parse_properties`: the ``java.util.Properties`` text format
  (``=``/``:``/whitespace separators, ``\\`` escapes and line
  continuations, ``#``/``!`` comments, ``\\uXXXX``).
- :func:`pipeline_from_properties`: resolves the property map into a
  :class:`PipelineSpec` — ``EngineConfig`` kwargs, the Kafka-Connect
  ``transforms=``/``predicates=`` chain (via ``transforms.build_chain``,
  mirroring debezium-embedded Transformations.java:40-91 incl. the
  ``.predicate``/``.negate`` wrap at :101-120), connector-side column
  rules (mask/truncate/include — RelationalDatabaseConnectorConfig.java:
  475-491), sink options (JdbcSinkConnectorConfig.java), serialization
  format from the ``value.converter`` class, and topic naming.

Property names are the REFERENCE'S names, verbatim — including regex-ish
keys like ``column.mask.with.12.chars`` and per-table
``snapshot.select.statement.overrides.<table>`` — so a working Debezium
config ports without rewriting. Unknown keys fail fast in strict mode
(typo safety, cf. Field validation in io.debezium.config.Field) or are
collected in ``PipelineSpec.unknown`` otherwise. Connection-level keys
the sandbox has no server for (``database.*``, ``offset.storage*``, …)
are accepted and recorded in ``passthrough`` — they configure the part
of the reference this engine replaces with Spark-native equivalents.
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass, field

from .transforms import TRANSFORMS, build_chain
from .transforms.predicates import PREDICATES

__all__ = [
    "parse_properties",
    "pipeline_from_properties",
    "transform_specs_from_config",
    "PipelineSpec",
]


# ---------------------------------------------------------------------------
# java.util.Properties text format
# ---------------------------------------------------------------------------

_HEX = set("0123456789abcdefABCDEF")


def _unescape(s: str) -> str:
    # single left-to-right pass, as Java's load() does: '\\' consumes the
    # next char FIRST, so an escaped backslash followed by uXXXX stays a
    # literal backslash + text ('\\u0041' -> 'A', not 'A')
    out = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch != "\\" or i + 1 >= len(s):
            out.append(ch)
            i += 1
            continue
        nxt = s[i + 1]
        if nxt == "u" and i + 6 <= len(s) and all(
            c in _HEX for c in s[i + 2:i + 6]
        ):
            out.append(chr(int(s[i + 2:i + 6], 16)))
            i += 6
        else:
            out.append({"n": "\n", "t": "\t", "r": "\r", "f": "\f"}.get(nxt, nxt))
            i += 2
    return "".join(out)


def parse_properties(text: str) -> dict[str, str]:
    """Parse ``java.util.Properties`` *text* into an ordered dict.

    Implements the documented load() rules: natural lines join on a
    trailing odd ``\\`` (leading whitespace of the continuation
    stripped); the key ends at the first unescaped ``=``, ``:`` or
    whitespace; ``#``/``!`` lines are comments; values keep internal
    whitespace; ``\\uXXXX`` and the single-char escapes decode.
    """
    props: dict[str, str] = {}
    logical: list[str] = []
    pending: str | None = None
    for raw in text.splitlines():
        if pending is None:
            stripped = raw.lstrip()
            if not stripped or stripped[0] in "#!":
                continue  # blank/comment (comments cannot be continued)
            cur = stripped
        else:
            # a continuation line's LEADING whitespace is discarded; a
            # continuation is data even if it starts with # or !
            cur = pending + raw.lstrip()
        # odd number of trailing backslashes = line continuation
        n_bs = len(cur) - len(cur.rstrip("\\"))
        if n_bs % 2 == 1:
            pending = cur[:-1]
        else:
            logical.append(cur)
            pending = None
    if pending is not None:
        logical.append(pending)

    for line in logical:
        # find the key/value split: first unescaped '=', ':' or whitespace
        i, n = 0, len(line)
        key_end = None
        while i < n:
            ch = line[i]
            if ch == "\\":
                i += 2
                continue
            if ch in "=:" or ch.isspace():
                key_end = i
                break
            i += 1
        if key_end is None:
            key, val = line, ""
        else:
            key = line[:key_end]
            rest = line[key_end:].lstrip()
            if rest[:1] in "=:":
                rest = rest[1:].lstrip()
            val = rest
        props[_unescape(key)] = _unescape(val)
    return props


# ---------------------------------------------------------------------------
# Kafka-Connect transforms= / predicates= chain
# ---------------------------------------------------------------------------

def _strip_variant(cls: str) -> str:
    """``...ReplaceField$Value`` -> ``...ReplaceField`` (the $Key/$Value
    inner-class split doesn't exist here: keys live in the ``__key``
    struct, values are the row — each SMT documents which it touches)."""
    return cls.split("$", 1)[0]


#: full Java class name -> (TRANSFORMS registry name, {connect param -> kwarg})
#: Param names are the reference's (SMT ConfigDef names); anything not
#: listed maps generically dotted->snake_case against the factory
#: signature. Classes: io.debezium.transforms.* SMT pack +
#: org.apache.kafka.connect.transforms.* common pack.
TRANSFORM_CLASSES: dict[str, tuple[str, dict[str, str]]] = {
    "io.debezium.transforms.ExtractNewRecordState": (
        "ExtractNewRecordState",
        # delete.tombstone.handling.mode + the legacy pair
        # (delete.handling.mode, drop.tombstones) are combined in
        # _smt_spec, not mapped generically
        {"add.fields": "add_fields", "add.headers": "add_headers",
         "drop.fields": "drop_fields", "route.by.field": "route_by_field"},
    ),
    "io.debezium.transforms.ExtractChangedRecordState": (
        "ExtractChangedRecordState",
        {"header.changed.name": "changed_name",
         "header.unchanged.name": "unchanged_name"},
    ),
    "io.debezium.transforms.ExtractSchemaToNewRecord": (
        "ExtractSchemaToNewRecord", {}),
    "io.debezium.transforms.Filter": ("Filter", {"condition": "condition"}),
    "io.debezium.transforms.ContentBasedRouter": (
        "ContentBasedRouter", {"topic.expression": "expression"}),
    "io.debezium.transforms.ByLogicalTableRouter": (
        "ByLogicalTableRouter",
        {"topic.regex": "topic_regex",
         "topic.replacement": "topic_replacement",
         "key.enforce.uniqueness": "key_enforce_uniqueness",
         "key.field.name": "key_field_name",
         "key.field.regex": "key_field_regex",
         "key.field.replacement": "key_field_replacement"},
    ),
    "io.debezium.transforms.partitions.PartitionRouting": (
        "PartitionRouting",
        {"partition.payload.fields": "partition_payload_fields",
         "partition.topic.num": "partition_topic_num",
         "partition.hash.function": "hash_mode"},
    ),
    "io.debezium.transforms.outbox.EventRouter": (
        "OutboxEventRouter",
        {"table.field.event.key": "field_event_key",
         "table.field.event.type": "field_event_type",
         "table.field.event.payload": "field_payload",
         "route.by.field": "route_by_field",
         "table.fields.additional.placement": "additional_fields",
         "table.expand.json.payload": "expand_json_payload"},
    ),
    "io.debezium.transforms.HeaderToValue": (
        "HeaderToValue",
        {"headers": "headers", "fields": "fields", "operation": "operation"},
    ),
    "io.debezium.transforms.TimezoneConverter": (
        "TimezoneConverter",
        {"converted.timezone": "target_tz",
         "include.list": "include", "exclude.list": "exclude"},
    ),
    "io.debezium.transforms.SchemaChangeEventFilter": (
        "SchemaChangeEventFilter",
        {},  # exclude-list handled in _smt_spec (ours is include-based)
    ),
    "io.debezium.connector.mysql.transforms.ReadToInsertEvent": (
        "ReadToInsertEvent", {}),
    # Kafka Connect common pack (org.apache.kafka.connect.transforms.*)
    "org.apache.kafka.connect.transforms.InsertField": ("InsertField", {}),
    "org.apache.kafka.connect.transforms.ReplaceField": (
        "ReplaceField", {"whitelist": "include", "blacklist": "exclude"}),
    "org.apache.kafka.connect.transforms.Cast": ("Cast", {}),
    "org.apache.kafka.connect.transforms.RegexRouter": ("RegexRouter", {}),
    "org.apache.kafka.connect.transforms.Flatten": ("Flatten", {}),
    "org.apache.kafka.connect.transforms.TimestampConverter": (
        "TimestampConverter", {}),
    "org.apache.kafka.connect.transforms.ExtractField": ("ExtractField", {}),
    "org.apache.kafka.connect.transforms.HoistField": (
        "HoistField", {"field": "name"}),
    "org.apache.kafka.connect.transforms.ValueToKey": ("ValueToKey", {}),
    "org.apache.kafka.connect.transforms.InsertHeader": ("InsertHeader", {}),
    "org.apache.kafka.connect.transforms.HeaderFrom": ("HeaderFrom", {}),
    "org.apache.kafka.connect.transforms.DropHeaders": ("DropHeaders", {}),
}

PREDICATE_CLASSES: dict[str, tuple[str, dict[str, str]]] = {
    "org.apache.kafka.connect.transforms.predicates.TopicNameMatches": (
        "TopicNameMatches", {"pattern": "pattern"}),
    "org.apache.kafka.connect.transforms.predicates.HasHeaderKey": (
        "HasHeaderKey", {"name": "name"}),
    "org.apache.kafka.connect.transforms.predicates.RecordIsTombstone": (
        "RecordIsTombstone", {}),
}

#: ExtractNewRecordState delete.tombstone.handling.mode values (the
#: unified config that superseded delete.handling.mode + drop.tombstones;
#: ExtractNewRecordStateConfigDefinition.java DeleteTombstoneHandling) ->
#: our factory's delete_handling vocabulary.
_DELETE_TOMBSTONE_MODES = {
    "drop": "drop",
    "tombstone": "tombstone",
    "rewrite": "rewrite",
    "rewrite-with-tombstone": "rewrite-with-tombstone",
}

#: legacy (delete.handling.mode, drop.tombstones) -> unified mode, per the
#: reference's deprecation table (ExtractNewRecordStateConfigDefinition.java
#: DeleteHandling + DROP_TOMBSTONES; newer releases log the equivalent
#: delete.tombstone.handling.mode for each legacy pair). Legacy defaults:
#: delete.handling.mode=drop, drop.tombstones=true.
_LEGACY_DELETE_MODES = {
    ("drop", True): "drop",
    ("drop", False): "tombstone",
    ("rewrite", True): "rewrite",
    ("rewrite", False): "rewrite-with-tombstone",
}


def _resolve_delete_handling(params: dict[str, str]) -> str | None:
    """Combine the unified and legacy ExtractNewRecordState delete
    configs (popping all three keys from *params*). The unified
    ``delete.tombstone.handling.mode`` takes precedence over the legacy
    pair, matching the reference's config-resolution order."""
    unified = params.pop("delete.tombstone.handling.mode", None)
    legacy_mode = params.pop("delete.handling.mode", None)
    legacy_tomb = params.pop("drop.tombstones", None)
    if unified is not None:
        try:
            return _DELETE_TOMBSTONE_MODES[unified.strip()]
        except KeyError:
            raise ValueError(
                f"unknown delete.tombstone.handling.mode {unified!r}; one "
                f"of {sorted(_DELETE_TOMBSTONE_MODES)}"
            ) from None
    if legacy_mode is None and legacy_tomb is None:
        return None
    mode = (legacy_mode or "drop").strip()
    if mode == "none":
        raise ValueError(
            "delete.handling.mode=none keeps the raw delete envelope in "
            "the unwrapped stream, which a flat-row sink cannot represent; "
            "skip the ExtractNewRecordState stage instead (the envelope "
            "passes through untouched without it)"
        )
    tomb = (legacy_tomb or "true").strip().lower() == "true"
    try:
        return _LEGACY_DELETE_MODES[(mode, tomb)]
    except KeyError:
        raise ValueError(
            f"unknown delete.handling.mode {mode!r}; one of "
            "('drop', 'rewrite', 'none')"
        ) from None


def _resolve_class(cls: str, table: dict, kind: str):
    base = _strip_variant(cls)
    if base in table:
        return table[base]
    # native registry names are accepted directly (sparkcdc configs) —
    # but ONLY undotted ones: a fully-qualified third-party class that
    # happens to end in a registry name (com.acme.custom.Filter) has its
    # own semantics and must error, not silently run the builtin
    reg = TRANSFORMS if kind == "transform" else PREDICATES
    if "." not in base and base in reg:
        return base, {}
    raise ValueError(
        f"unknown {kind} class {cls!r}; known classes: "
        f"{sorted(table)} or registry names {sorted(reg)}"
    )


def _coerce(factory, kwarg: str, raw: str):
    """Cast a properties string to the factory kwarg's annotated type.
    Signatures annotate plain types ('bool', 'int', 'list[str]', ...);
    comma lists split, booleans accept true/false."""
    try:
        ann = str(inspect.signature(factory).parameters[kwarg].annotation)
    except KeyError:
        raise ValueError(
            f"{factory.__name__} has no parameter {kwarg!r}"
        ) from None
    if "list" in ann:
        return [p.strip() for p in raw.split(",") if p.strip()]
    if "bool" in ann:
        return raw.strip().lower() == "true"
    if "int" in ann and "str" not in ann:
        return int(raw)
    if "float" in ann and "str" not in ann:
        return float(raw)
    return raw


#: SchemaChangeEventType universe (history/SchemaChangeEvent.java) — the
#: reference SMT configures an EXCLUDE list; our filter keeps an include
#: list, so the exclude complements against this set.
_SCHEMA_CHANGE_TYPES = ("CREATE", "ALTER", "DROP", "TRUNCATE", "DATABASE")

#: partition.hash.function (PartitionRouting.java:52,59): java -> the
#: cheap builtin hash, murmur -> the engine's stable cross-run hash
_HASH_FUNCTIONS = {"java": "fast", "murmur": "stable"}


def _smt_spec(cls: str, params: dict[str, str]) -> dict:
    name, pmap = _resolve_class(cls, TRANSFORM_CLASSES, "transform")
    factory = TRANSFORMS[name]
    spec: dict = {"type": name}
    if name == "ExtractNewRecordState":
        params = dict(params)
        dh = _resolve_delete_handling(params)
        if dh is not None:
            spec["delete_handling"] = dh
    for pkey, raw in params.items():
        if pkey in ("predicate", "negate"):
            continue
        if pkey == "language":
            # reference Filter/ContentBasedRouter take a JSR-223 language
            # (Groovy); conditions here are Spark SQL expressions
            continue
        if (name == "SchemaChangeEventFilter"
                and pkey == "schema.change.event.exclude.list"):
            excluded = {t.strip().upper() for t in raw.split(",")}
            spec["include_types"] = [
                t for t in _SCHEMA_CHANGE_TYPES if t not in excluded]
            continue
        if name == "PartitionRouting" and pkey == "partition.hash.function":
            spec["hash_mode"] = _HASH_FUNCTIONS.get(raw.strip(), raw.strip())
            continue
        kwarg = pmap.get(pkey, pkey.replace(".", "_"))
        spec[kwarg] = _coerce(factory, kwarg, raw)
    return spec


def transform_specs_from_config(props: dict[str, str]) -> list[dict]:
    """``transforms=a,b`` + ``transforms.a.type=<class>`` + params ->
    ``build_chain`` specs, honoring ``transforms.X.predicate`` /
    ``.negate`` against the ``predicates=`` section
    (debezium-embedded Transformations.java:40-91,101-120)."""
    names = [n.strip() for n in props.get("transforms", "").split(",")
             if n.strip()]
    pred_names = [n.strip() for n in props.get("predicates", "").split(",")
                  if n.strip()]
    preds: dict[str, dict] = {}
    for pn in pred_names:
        prefix = f"predicates.{pn}."
        cls = props.get(prefix + "type")
        if cls is None:
            raise ValueError(f"predicates={pn} declared but no {prefix}type")
        pname, ppmap = _resolve_class(cls, PREDICATE_CLASSES, "predicate")
        pspec: dict = {"type": pname}
        pfactory = PREDICATES[pname]
        for k, v in props.items():
            if k.startswith(prefix) and k != prefix + "type":
                pkey = k[len(prefix):]
                kwarg = ppmap.get(pkey, pkey.replace(".", "_"))
                pspec[kwarg] = _coerce(pfactory, kwarg, v)
        preds[pn] = pspec

    specs = []
    for tn in names:
        prefix = f"transforms.{tn}."
        cls = props.get(prefix + "type")
        if cls is None:
            raise ValueError(f"transforms={tn} declared but no {prefix}type")
        params = {k[len(prefix):]: v for k, v in props.items()
                  if k.startswith(prefix) and k != prefix + "type"}
        spec = _smt_spec(cls, params)
        pred_ref = params.get("predicate")
        if pred_ref is not None:
            try:
                spec["predicate"] = preds[pred_ref]
            except KeyError:
                raise ValueError(
                    f"transforms.{tn}.predicate={pred_ref!r} not in "
                    f"predicates={sorted(preds)}"
                ) from None
            spec["negate"] = params.get("negate", "false").lower() == "true"
        elif "negate" in params:
            # Connect raises ConfigException here; a silently-dropped
            # negate would invert nothing without a sound
            raise ValueError(
                f"transforms.{tn}.negate set but no transforms.{tn}.predicate"
            )
        specs.append(spec)
    return specs


# ---------------------------------------------------------------------------
# connector / engine / sink / serialization properties
# ---------------------------------------------------------------------------

#: snapshot.mode aliases retired in newer reference versions but still in
#: the wild (BinlogConnectorConfig.java SnapshotMode history)
_SNAPSHOT_MODE_ALIASES = {
    "schema_only": "no_data",
    "schema_only_recovery": "recovery",
}

#: direct scalar EngineConfig mappings: property -> (field, cast)
_ENGINE_KEYS = {
    "max.batch.size": ("batch_size", int),
    "snapshot.mode": ("snapshot_mode",
                      lambda v: _SNAPSHOT_MODE_ALIASES.get(v, v)),
    "snapshot.mode.configuration.based.snapshot.data":
        ("snapshot_config_data", lambda v: v.lower() == "true"),
    "snapshot.mode.configuration.based.snapshot.schema":
        ("snapshot_config_schema", lambda v: v.lower() == "true"),
    "provide.transaction.metadata":
        ("provide_transaction_metadata", lambda v: v.lower() == "true"),
    "skipped.operations": ("skipped_operations", str),
    "truncate.enabled": ("truncate_enabled", lambda v: v.lower() == "true"),
}

#: accepted-but-Spark-replaced key prefixes: connection, storage, runtime
#: plumbing the engine implements natively (checkpointing = manifest
#: offsets; queues = micro-batches). Recorded, never an error.
_PASSTHROUGH_PREFIXES = (
    "name", "connector.class", "tasks.max",
    "database.", "schema.history.internal", "offset.",
    "plugin.name", "slot.name", "publication.",
    "heartbeat.", "signal.", "notification.",
    "errors.", "record.processing.", "converters",
    "max.queue.size", "poll.interval.ms", "retriable.restart.connector",
    "snapshot.fetch.size", "snapshot.max.threads", "snapshot.delay.ms",
    "snapshot.locking.mode", "include.schema.changes", "topic.creation.",
    "quote.identifiers", "connection.", "dialect.", "use.time.zone",
    "flush.", "batch.size",
)

_MASK_RE = re.compile(r"^column\.mask\.with\.(\d+)\.chars$")
_MASK_HASH_RE = re.compile(r"^column\.mask\.hash\.([^.]+)\.with\.salt\.(.+)$")
_TRUNC_RE = re.compile(r"^column\.truncate\.to\.(\d+)\.chars$")


#: a dot acts as a db/table/column QUALIFIER separator when what follows
#: starts an identifier or a regex group/class/any-char — so the column
#: part of ``db.tab..*`` is ``.*`` (the final dot is the separator, the
#: ``.*`` the column pattern), of ``db.tab.(id|name)`` is ``(id|name)``,
#: and a bare ``.*`` entry (no qualifier) is left whole
_QUAL_DOT = re.compile(r"\.(?=[\w.(\[])")


def _bare_columns(raw: str) -> list[str]:
    """Debezium column rules name columns FULLY-QUALIFIED —
    ``databaseName.tableName.columnName`` literals for mask/truncate,
    regexes over the qualified name for include/exclude
    (RelationalDatabaseConnectorConfig.java:306-330) — while the
    chain-level column transforms here match bare row-field names (one
    resolved chain serves one captured table, the engine's
    table-include list does the table scoping). Reduce each entry to its
    column part: the text after the last qualifier dot
    (:data:`_QUAL_DOT`; note java.util.Properties already collapses the
    ``\\.``-escaped spelling to plain dots before this sees it). Bare
    names pass through unchanged."""
    out = []
    for c in (x.strip() for x in raw.split(",")):
        if not c:
            continue
        ms = list(_QUAL_DOT.finditer(c))
        out.append(c[ms[-1].end():] if ms else c)
    return out

_CONVERTER_MODES = {
    "decimal.handling.mode": ("precise", "double", "string"),
    "time.precision.mode": ("adaptive", "adaptive_time_microseconds",
                            "microseconds", "nanoseconds", "connect"),
    "binary.handling.mode": ("bytes", "hex", "base64",
                             "base64-url-safe"),
}

#: value.converter class -> wire format implemented in transforms.*
_VALUE_CONVERTERS = {
    "org.apache.kafka.connect.json.JsonConverter": "json",
    "io.confluent.connect.avro.AvroConverter": "avro",
    "io.apicurio.registry.utils.converter.AvroConverter": "avro",
    "io.confluent.connect.protobuf.ProtobufConverter": "protobuf",
    "io.debezium.converters.CloudEventsConverter": "cloudevents",
}


@dataclass
class PipelineSpec:
    """Resolved pieces of a Debezium properties map, in sparkcdc terms.

    ``engine_kwargs`` feed ``EngineConfig(**engine_kwargs)``;
    ``transform_specs`` feed ``transforms.build_chain`` (``chain()``
    shortcut); the rest parameterize MultiTableEngine / sinkconfig /
    serializers at call sites. ``passthrough`` holds accepted
    connection/runtime keys the Spark engine replaces natively;
    ``unknown`` holds unrecognized keys (strict mode raises instead).
    """

    engine_kwargs: dict = field(default_factory=dict)
    transform_specs: list = field(default_factory=list)
    table_include: list[str] | None = None
    table_exclude: list[str] | None = None
    message_key_columns: str | None = None
    incremental_chunk_size: int | None = None
    failure_handling: str = "fail"
    converter_modes: dict = field(default_factory=dict)
    serialization: dict = field(default_factory=dict)
    sink: dict = field(default_factory=dict)
    topic: dict = field(default_factory=dict)
    passthrough: dict = field(default_factory=dict)
    unknown: dict = field(default_factory=dict)

    def chain(self):
        """One DataFrame -> DataFrame function applying the resolved
        transform chain in properties order."""
        return build_chain(self.transform_specs)


def pipeline_from_properties(
    props: dict[str, str] | str, *, strict: bool = True
) -> PipelineSpec:
    """Resolve a Debezium properties map (or ``.properties`` text) into a
    :class:`PipelineSpec`. Strict mode fails on unrecognized keys —
    the Field-validation posture of the reference's config layer."""
    if isinstance(props, str):
        props = parse_properties(props)
    props = dict(props)
    spec = PipelineSpec()
    consumed: set[str] = set()

    def take(key: str) -> str | None:
        v = props.get(key)
        if v is not None:
            consumed.add(key)
        return v

    # -- transforms / predicates sections -----------------------------------
    # consume only DECLARED aliases: a fully-configured transforms.X.*
    # block whose alias is missing from transforms= is a config mistake
    # that must surface in strict mode, not vanish from the chain
    spec.transform_specs = transform_specs_from_config(props)
    declared = {
        ("transforms", n.strip())
        for n in props.get("transforms", "").split(",") if n.strip()
    } | {
        ("predicates", n.strip())
        for n in props.get("predicates", "").split(",") if n.strip()
    }
    for k in props:
        if k in ("transforms", "predicates"):
            consumed.add(k)
        elif k.startswith(("transforms.", "predicates.")):
            section, rest = k.split(".", 1)
            if (section, rest.split(".", 1)[0]) in declared:
                consumed.add(k)

    # -- engine scalars -----------------------------------------------------
    for key, (fld, cast) in _ENGINE_KEYS.items():
        v = take(key)
        if v is not None:
            spec.engine_kwargs[fld] = cast(v)

    # snapshot.select.statement.overrides=<t1>,<t2> + per-table SQL keys
    # (RelationalDatabaseConnectorConfig.java:355,753)
    ov_tables = take("snapshot.select.statement.overrides")
    if ov_tables:
        overrides = {}
        for t in (x.strip() for x in ov_tables.split(",") if x.strip()):
            sql = take(f"snapshot.select.statement.overrides.{t}")
            if sql is None:
                raise ValueError(
                    f"snapshot.select.statement.overrides lists {t!r} but "
                    f"snapshot.select.statement.overrides.{t} is missing"
                )
            overrides[t] = sql
        spec.engine_kwargs["snapshot_select_overrides"] = overrides

    # tombstones.on.delete=false: the connector does not emit tombstones —
    # model as a leading DropTombstones stage (the filter sits source-side,
    # before SMTs, like the reference's emitter-level switch)
    tomb = take("tombstones.on.delete")
    if tomb is not None and tomb.lower() == "false":
        spec.transform_specs.insert(0, {"type": "DropTombstones"})

    # -- connector-side column rules (prepended in connector order) --------
    col_specs: list[dict] = []
    for k in list(props):
        m = _MASK_RE.match(k)
        if m:
            col_specs.append({
                "type": "MaskStrings",
                "columns": _bare_columns(props[k]),
                "length": int(m.group(1)),
            })
            consumed.add(k)
            continue
        m = _MASK_HASH_RE.match(k)
        if m:
            algo, salt = m.group(1), m.group(2)
            if algo.lower().replace("-", "") != "sha256":
                raise ValueError(
                    f"column.mask.hash algorithm {algo!r} unsupported; "
                    "the vectorized masker hashes with SHA-256"
                )
            col_specs.append({
                "type": "MaskStrings",
                "columns": _bare_columns(props[k]),
                "salt": salt,
            })
            consumed.add(k)
            continue
        m = _TRUNC_RE.match(k)
        if m:
            col_specs.append({
                "type": "TruncateColumns",
                "columns": {c: int(m.group(1))
                            for c in _bare_columns(props[k])},
            })
            consumed.add(k)
    inc_cols = take("column.include.list")
    exc_cols = take("column.exclude.list")
    if inc_cols or exc_cols:
        col_specs.append({
            "type": "IncludeExcludeColumns",
            "include": _bare_columns(inc_cols) if inc_cols else None,
            "exclude": _bare_columns(exc_cols) if exc_cols else None,
        })
    spec.transform_specs[:0] = col_specs

    # -- capture filters / keys --------------------------------------------
    ti_t, ti_c = take("table.include.list"), take("collection.include.list")
    te_t, te_c = take("table.exclude.list"), take("collection.exclude.list")
    ti, te = ti_t or ti_c, te_t or te_c
    spec.table_include = (
        [t.strip() for t in ti.split(",")] if ti else None)
    spec.table_exclude = (
        [t.strip() for t in te.split(",")] if te else None)
    spec.message_key_columns = take("message.key.columns")

    chunk = take("incremental.snapshot.chunk.size")
    if chunk is not None:
        spec.incremental_chunk_size = int(chunk)

    fh = take("event.processing.failure.handling.mode")
    if fh is not None:
        if fh not in ("fail", "skip", "warn", "ignore"):
            raise ValueError(
                f"unknown event.processing.failure.handling.mode {fh!r}")
        spec.failure_handling = {"warn": "skip", "ignore": "skip"}.get(fh, fh)

    # -- converter modes -----------------------------------------------------
    for key, allowed in _CONVERTER_MODES.items():
        v = take(key)
        if v is not None:
            if v not in allowed:
                raise ValueError(f"unknown {key} {v!r}; one of {allowed}")
            spec.converter_modes[key] = v

    # -- serialization --------------------------------------------------------
    vc = take("value.converter")
    if vc is not None:
        try:
            fmt = _VALUE_CONVERTERS[vc]
        except KeyError:
            raise ValueError(
                f"unknown value.converter {vc!r}; known: "
                f"{sorted(_VALUE_CONVERTERS)}"
            ) from None
        if fmt == "json":
            se = take("value.converter.schemas.enable")
            fmt = "connect_json" if (se is None or se.lower() == "true") \
                else "json"
        if fmt == "cloudevents":
            data = take("value.converter.data.serializer.type") or "json"
            spec.serialization["cloudevents_data_format"] = data
        spec.serialization["format"] = fmt
    for key, dst in (("schema.name.adjustment.mode", "schema_name_adjustment"),
                     ("field.name.adjustment.mode", "field_name_adjustment")):
        v = take(key)
        if v is not None:
            spec.serialization[dst] = v

    # -- sink (JdbcSinkConnectorConfig.java names) ---------------------------
    for key in ("primary.key.mode", "primary.key.fields", "insert.mode",
                "delete.enabled", "collection.name.format",
                "column.naming.strategy", "schema.evolution"):
        v = take(key)
        if v is not None:
            spec.sink[key] = v

    # -- topic naming ---------------------------------------------------------
    tp = take("topic.prefix")
    if tp is not None:
        spec.topic["prefix"] = tp
    td = take("topic.delimiter")
    if td is not None:
        spec.topic["delimiter"] = td
    tns = take("topic.naming.strategy")
    if tns is not None:
        short = tns.rsplit(".", 1)[-1]
        strategy = "schema" if "Schema" in short else "default"
        spec.topic["strategy"] = strategy
        if "Unicode" in short:
            spec.topic["replacement"] = "unicode"

    # -- classify the rest ------------------------------------------------------
    # custom-converter blocks (CustomConverter SPI): `converters=a,b`
    # declares names whose `<name>.*` subkeys configure the converter
    custom_converters = tuple(
        f"{n.strip()}."
        for n in props.get("converters", "").split(",") if n.strip()
    )
    for k, v in props.items():
        if k in consumed:
            continue
        if k.startswith(_PASSTHROUGH_PREFIXES) or k == "key.converter":
            spec.passthrough[k] = v
        elif k.startswith(("key.converter.", "value.converter.")):
            # converter subkeys (schema.registry.url, enhanced.avro.schema
            # .support, ...) configure the wire layer the engine's
            # serializers replace; accepted, recorded
            spec.passthrough[k] = v
        elif custom_converters and k.startswith(custom_converters):
            spec.passthrough[k] = v
        else:
            spec.unknown[k] = v
    if strict and spec.unknown:
        raise ValueError(
            "unrecognized properties (strict): "
            + ", ".join(sorted(spec.unknown))
        )
    return spec
