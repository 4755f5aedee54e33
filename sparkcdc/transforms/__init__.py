"""Transform library — Debezium's SMTs re-expressed as vectorized
``DataFrame -> DataFrame`` functions (SURVEY §2.2 T1-T16).

Every transform is Catalyst-native (built-in column expressions, no Python
row functions), so chains of transforms fuse into one whole-stage-codegen
span instead of the reference's per-record ``R apply(R)`` virtual calls
(the hot loop the async engine parallelizes at
AsyncEmbeddedEngine.java:1191 — here it's free).

Registry: ``TRANSFORMS`` maps SMT-style names to factories, mirroring the
Kafka-Connect ``transforms=...`` config list
(embedded/Transformations.java).
"""

from .extract import (
    extract_changed_record_state,
    extract_new_record_state,
    extract_schema_to_new_record,
)
from .filtering import (
    drop_tombstones,
    event_filter,
    include_exclude_columns,
    schema_change_filter,
    table_filter,
)
from .routing import (
    by_logical_table_router,
    content_based_router,
    outbox_event_router,
    partition_routing,
)
from .columns import (
    header_to_value,
    mask_strings,
    propagate_source_column_type,
    timezone_converter,
    truncate_columns,
    read_to_insert,
)
from .connect_common import (
    cast_fields,
    drop_headers,
    extract_field,
    flatten_value,
    header_from,
    hoist_field,
    insert_field,
    insert_header,
    regex_router,
    replace_field,
    timestamp_converter,
    value_to_key,
)
from .reselect import reselect_columns
from .serialize import (
    convert_cloudevent_to_saveable_form,
    corrupt_json_records,
    envelope_to_cloudevents,
    envelope_to_json,
    parse_cloudevents,
    parse_envelope_json,
    parse_envelope_json_arrow,
)
from .connect_json import (
    connect_envelope_schema_json,
    embedded_connect_schemas,
    envelope_to_connect_json,
    parse_connect_json,
)
from .avro import (
    envelope_avro_schema,
    envelope_to_avro,
    parse_envelope_avro,
)
from .protobuf import (
    envelope_proto_schema,
    envelope_to_protobuf,
    parse_envelope_protobuf,
)

TRANSFORMS = {
    "ExtractNewRecordState": extract_new_record_state,
    "ExtractChangedRecordState": extract_changed_record_state,
    "ExtractSchemaToNewRecord": extract_schema_to_new_record,
    "Filter": event_filter,
    "ContentBasedRouter": content_based_router,
    "ByLogicalTableRouter": by_logical_table_router,
    "PartitionRouting": partition_routing,
    "OutboxEventRouter": outbox_event_router,
    "HeaderToValue": header_to_value,
    "TimezoneConverter": timezone_converter,
    "MaskStrings": mask_strings,
    "TruncateColumns": truncate_columns,
    "SchemaChangeEventFilter": schema_change_filter,
    "TableFilter": table_filter,
    "IncludeExcludeColumns": include_exclude_columns,
    "DropTombstones": drop_tombstones,
    "ReselectColumns": reselect_columns,
    "PropagateSourceColumnType": propagate_source_column_type,
    "ReadToInsertEvent": read_to_insert,
    # Kafka Connect common SMTs (connect_common.py)
    "InsertField": insert_field,
    "ReplaceField": replace_field,
    "Cast": cast_fields,
    "RegexRouter": regex_router,
    "Flatten": flatten_value,
    "TimestampConverter": timestamp_converter,
    "ExtractField": extract_field,
    "HoistField": hoist_field,
    "ValueToKey": value_to_key,
    "InsertHeader": insert_header,
    "HeaderFrom": header_from,
    "DropHeaders": drop_headers,
}

def build_chain(specs: list[dict]):
    """Kafka-Connect-style transform chain from config
    (embedded/Transformations.java: ``transforms=a,b`` +
    ``transforms.a.type=...`` + per-transform params). Each spec is
    ``{"type": <TRANSFORMS name>, ...kwargs}``; returns one
    DataFrame -> DataFrame function applying them in order.

    A spec may carry ``"predicate": {"type": <PREDICATES name>, ...}``
    and ``"negate": bool`` — the Kafka Connect
    ``transforms.X.predicate``/``.negate`` contract: the transform then
    applies only to matching records, the rest pass through unchanged
    (schema-preserving transforms only, see :func:`predicates.guard`)."""
    from .predicates import PREDICATES, guard

    fns = []
    for spec in specs:
        spec = dict(spec)
        name = spec.pop("type")
        pred_spec = spec.pop("predicate", None)
        negate = spec.pop("negate", False)
        try:
            factory = TRANSFORMS[name]
        except KeyError:
            raise ValueError(
                f"unknown transform {name!r}; known: {sorted(TRANSFORMS)}"
            ) from None
        fn = factory(**spec)
        if pred_spec is not None:
            pred_spec = dict(pred_spec)
            pname = pred_spec.pop("type")
            try:
                pfactory = PREDICATES[pname]
            except KeyError:
                raise ValueError(
                    f"unknown predicate {pname!r}; known: {sorted(PREDICATES)}"
                ) from None
            fn = guard(fn, pfactory(**pred_spec), negate=negate)
        fns.append(fn)

    def _apply(df):
        for fn in fns:
            df = fn(df)
        return df

    return _apply


__all__ = list(TRANSFORMS) + [
    "TRANSFORMS",
    "build_chain",
    "envelope_to_json",
    "envelope_to_cloudevents",
    "parse_cloudevents",
    "corrupt_json_records",
    "parse_envelope_json",
    "parse_envelope_json_arrow",
    "envelope_avro_schema",
    "envelope_to_avro",
    "parse_envelope_avro",
    "envelope_proto_schema",
    "envelope_to_protobuf",
    "parse_envelope_protobuf",
]
