"""Protobuf binary serialization for change-event envelopes (T16).

Reference: Debezium's pluggable wire formats include Protobuf
(debezium-api/src/main/java/io/debezium/engine/format/Protobuf.java). This
implements the **proto3 wire format** per the public encoding spec —
varint tags ``(field_number << 3) | wire_type``, length-delimited strings
and nested messages, little-endian fixed64 doubles — with the message
layout exported as a ``.proto`` definition (:func:`envelope_proto_schema`)
so any protobuf toolchain can consume the stream. proto3 presence
semantics: unset (NULL) fields are simply omitted from the wire; nested
``before``/``after``/``source`` messages are omitted entirely when NULL
(field presence of the message distinguishes "no before image" from "a
before of nulls", matching proto3 message-field presence).

Execution model mirrors ``transforms.avro``: Arrow-batched ``mapInPandas``
over flattened leaf columns — per-record byte packing can't be a columnar
expression; it must never be a row-at-a-time Python UDF.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import envelope_schema
from .avro import _SOURCE_FIELDS, _avro_field_type

#: envelope field numbers (stable wire contract)
_ENV_FIELDS = [  # (number, name, kind)
    (1, "op", "string"),
    (2, "ts_ms", "long"),
    (3, "before", "message"),
    (4, "after", "message"),
    (5, "source", "message"),
    (6, "part_id", "int"),
    (7, "offset", "long"),
    (8, "tombstone", "boolean"),
]

_WT_VARINT, _WT_FIX64, _WT_LEN = 0, 1, 2


def _wire_type(kind: str) -> int:
    if kind in ("string", "bytes", "message"):
        return _WT_LEN
    if kind in ("double", "float"):
        return _WT_FIX64 if kind == "double" else 5  # float = fixed32
    return _WT_VARINT


def _put_varint(buf: bytearray, n: int) -> None:
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _put_tag(buf: bytearray, num: int, wt: int) -> None:
    _put_varint(buf, (num << 3) | wt)


def _put_scalar(buf: bytearray, num: int, kind: str, v) -> None:
    if kind == "string":
        raw = v.encode("utf-8")
        _put_tag(buf, num, _WT_LEN)
        _put_varint(buf, len(raw))
        buf += raw
    elif kind == "bytes":
        _put_tag(buf, num, _WT_LEN)
        _put_varint(buf, len(v))
        buf += v
    elif kind in ("long", "int"):
        # sint64 zigzag so negative offsets (snapshot -1) stay 1 byte
        _put_tag(buf, num, _WT_VARINT)
        _put_varint(buf, (int(v) << 1) ^ (int(v) >> 63))
    elif kind == "boolean":
        _put_tag(buf, num, _WT_VARINT)
        _put_varint(buf, 1 if v else 0)
    elif kind == "double":
        _put_tag(buf, num, _WT_FIX64)
        buf += struct.pack("<d", float(v))
    elif kind == "float":
        _put_tag(buf, num, 5)
        buf += struct.pack("<f", float(v))
    else:
        raise ValueError(kind)


def _put_message(buf: bytearray, num: int, fields, values: dict) -> None:
    sub = bytearray()
    for i, (name, kind) in enumerate(fields, start=1):
        v = values.get(name)
        if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
            continue  # proto3: unset field = omitted
        _put_scalar(sub, i, kind, v)
    _put_tag(buf, num, _WT_LEN)
    _put_varint(buf, len(sub))
    buf += sub


def _get_varint(mv: memoryview, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = mv[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _get_scalar(mv, pos, kind):
    if kind in ("string", "bytes"):
        n, pos = _get_varint(mv, pos)
        raw = bytes(mv[pos : pos + n])
        return (raw.decode("utf-8") if kind == "string" else raw), pos + n
    if kind in ("long", "int"):
        z, pos = _get_varint(mv, pos)
        return (z >> 1) ^ -(z & 1), pos
    if kind == "boolean":
        z, pos = _get_varint(mv, pos)
        return bool(z), pos
    if kind == "double":
        return struct.unpack_from("<d", mv, pos)[0], pos + 8
    if kind == "float":
        return struct.unpack_from("<f", mv, pos)[0], pos + 4
    raise ValueError(kind)


def _skip_field(mv: memoryview, pos: int, wt: int) -> int:
    """Skip an unknown field by wire type — required by the proto spec
    (forward compatibility with producers on a newer schema)."""
    if wt == _WT_VARINT:
        _, pos = _get_varint(mv, pos)
        return pos
    if wt == _WT_FIX64:
        return pos + 8
    if wt == _WT_LEN:
        n, pos = _get_varint(mv, pos)
        return pos + n
    if wt == 5:  # fixed32
        return pos + 4
    raise ValueError(f"unskippable wire type {wt}")


def _get_message(mv: memoryview, pos: int, fields) -> tuple[dict, int]:
    n, pos = _get_varint(mv, pos)
    end = pos + n
    out = {name: None for name, _ in fields}
    by_num = {i: (name, kind) for i, (name, kind) in enumerate(fields, 1)}
    while pos < end:
        tag, pos = _get_varint(mv, pos)
        entry = by_num.get(tag >> 3)
        if entry is None:
            pos = _skip_field(mv, pos, tag & 7)
            continue
        name, kind = entry
        out[name], pos = _get_scalar(mv, pos, kind)
    return out, end


def envelope_proto_schema(row_fields=None) -> str:
    """The wire contract as a proto3 definition."""
    from ..envelope import REPO_ROW_FIELDS

    row_fields = row_fields or REPO_ROW_FIELDS
    proto_t = {"string": "string", "long": "sint64", "int": "sint64",
               "double": "double", "float": "float", "boolean": "bool",
               "bytes": "bytes"}

    def msg(name, fields):
        body = "\n".join(
            f"  {proto_t[k]} {n} = {i};"
            for i, (n, k) in enumerate(fields, 1)
        )
        return f"message {name} {{\n{body}\n}}"

    row = [(n, _avro_field_type(t)) for n, t in row_fields]
    env_body = "\n".join(
        f"  {'Row' if k == 'message' and n in ('before', 'after') else 'Source' if k == 'message' else proto_t[k]} {n} = {i};"
        for i, n, k in _ENV_FIELDS
    )
    return "\n\n".join([
        'syntax = "proto3";', msg("Row", row), msg("Source", _SOURCE_FIELDS),
        f"message Envelope {{\n{env_body}\n}}",
    ])


def envelope_to_protobuf(
    df: DataFrame, row_fields=None, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Envelope DataFrame → proto3-encoded binary ``value`` column.

    ``passthrough``: existing STRING columns carried through beside the
    wire bytes (the CloudEvents composition hangs its extension
    attributes here, exactly like envelope_to_avro's passthrough)."""
    from ..envelope import REPO_ROW_FIELDS

    row_fields = row_fields or REPO_ROW_FIELDS
    row_f = [(n, _avro_field_type(t)) for n, t in row_fields]

    def enc_iter(batches):
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                buf = bytearray()
                if r["op"] is not None:
                    _put_scalar(buf, 1, "string", r["op"])
                if not pd.isna(r["ts_ms"]):
                    _put_scalar(buf, 2, "long", r["ts_ms"])
                for num, prefix, isnull, flds in (
                    (3, "b_", "b_isnull", row_f),
                    (4, "a_", "a_isnull", row_f),
                    (5, "s_", "s_isnull", _SOURCE_FIELDS),
                ):
                    if not r[isnull]:
                        _put_message(
                            buf, num, flds,
                            {n: r[f"{prefix}{n}"] for n, _ in flds},
                        )
                if not pd.isna(r["part_id"]):
                    _put_scalar(buf, 6, "int", r["part_id"])
                if not pd.isna(r["offset"]):
                    _put_scalar(buf, 7, "long", r["offset"])
                if r["tombstone"] is not None and not pd.isna(r["tombstone"]):
                    _put_scalar(buf, 8, "boolean", r["tombstone"])
                out.append(bytes(buf))
            res = pdf[["part_id", "offset", *passthrough]].copy()
            res["value"] = out
            yield res

    flat = df.select(
        "op", "ts_ms",
        F.col("before").isNull().alias("b_isnull"),
        *[F.col(f"before.{n}").alias(f"b_{n}") for n, _ in row_fields],
        F.col("after").isNull().alias("a_isnull"),
        *[F.col(f"after.{n}").alias(f"a_{n}") for n, _ in row_fields],
        F.col("source").isNull().alias("s_isnull"),
        *[F.col(f"source.{n}").alias(f"s_{n}") for n, _ in _SOURCE_FIELDS],
        "part_id", "offset", "tombstone",
        *passthrough,
    )
    out_schema = "part_id int, offset long, value binary" + "".join(
        f", {n} string" for n in passthrough
    )
    return flat.mapInPandas(enc_iter, out_schema)


def parse_envelope_protobuf(
    df: DataFrame, row_fields=None, value_col: str = "value"
) -> DataFrame:
    """proto3 ``value`` bytes → typed envelope DataFrame (round-trips
    :func:`envelope_to_protobuf`)."""
    from ..envelope import REPO_ROW_FIELDS

    row_fields = row_fields or REPO_ROW_FIELDS
    row_f = [(n, _avro_field_type(t)) for n, t in row_fields]
    out_schema = envelope_schema(row_fields)

    def dec_iter(batches):
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                mv = memoryview(raw)
                pos, end = 0, len(raw)
                r = {
                    "op": None, "ts_ms": None, "before": None, "after": None,
                    "source": None, "transaction": None, "part_id": None,
                    "offset": None, "tombstone": None,
                }
                while pos < end:
                    tag, pos = _get_varint(mv, pos)
                    num = tag >> 3
                    if num == 3:
                        r["before"], pos = _get_message(mv, pos, row_f)
                    elif num == 4:
                        r["after"], pos = _get_message(mv, pos, row_f)
                    elif num == 5:
                        r["source"], pos = _get_message(mv, pos, _SOURCE_FIELDS)
                    elif num in (1, 2, 6, 7, 8):
                        name = {1: "op", 2: "ts_ms", 6: "part_id",
                                7: "offset", 8: "tombstone"}[num]
                        kind = {"op": "string", "ts_ms": "long",
                                "part_id": "int", "offset": "long",
                                "tombstone": "boolean"}[name]
                        r[name], pos = _get_scalar(mv, pos, kind)
                    else:
                        pos = _skip_field(mv, pos, tag & 7)
                # proto3 scalar presence: a canonical producer OMITS
                # default values — an absent tombstone means false, and
                # leaving it NULL would silently drop the event from the
                # merge path's (~tombstone) filter
                if r["tombstone"] is None:
                    r["tombstone"] = False
                rows.append(r)
            yield pd.DataFrame(rows)

    return df.mapInPandas(dec_iter, out_schema)
