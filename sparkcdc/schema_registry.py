"""Subject/version schema registry with Avro compatibility enforcement.

A Debezium deployment serializing Avro registers every envelope schema in
a registry (Confluent Schema Registry wire contract: subjects, monotone
versions, a compatibility gate rejecting breaking registrations). The
registry itself is an external HTTP service; what the ENGINE needs from
it is the contract — register-or-reject under a compatibility mode — so
this module implements that contract over the lake's meta directory, with
the checks done against the Avro schema JSON
(:func:`sparkcdc.transforms.avro.envelope_avro_schema` output).

Compatibility rules (the Avro resolution rules the real registry
applies, public Avro spec "Schema Resolution"):

- BACKWARD: the NEW schema can read data written with the PREVIOUS one —
  every field the new schema adds must carry a default; a field it
  removes is simply ignored on read; a field's type may only change
  along a permitted promotion (int→long→float→double, string↔bytes).
- FORWARD: the PREVIOUS schema can read data the new one writes — the
  mirror image (removed fields need a default in the OLD schema).
- FULL: both. NONE: no gate.

BACKWARD checks only against the latest version (the registry's
default), matching Confluent's BACKWARD (vs BACKWARD_TRANSITIVE).
"""

from __future__ import annotations

import json
import os

#: permitted type promotions old → new (Avro schema-resolution rules)
_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"),
    ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


class IncompatibleSchema(ValueError):
    pass


def _unwrap(t):
    """['null', X] optional union → X; bare type passes through."""
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        return branches[0] if len(branches) == 1 else tuple(map(_field_key, t))
    return t


def _field_key(t):
    """Structural key of a type for comparison: records compare by their
    field (name, type) list, primitives by name."""
    t = _unwrap(t)
    if isinstance(t, dict) and t.get("type") == "record":
        return tuple(
            (f["name"], _field_key(f["type"])) for f in t["fields"]
        )
    return t


def _fields_of(schema: dict) -> dict:
    return {f["name"]: f for f in schema.get("fields", [])}


def _readable(reader: dict, writer: dict, path: str = "") -> list[str]:
    """Can ``reader`` read data written with ``writer``? Returns the list
    of violations (empty = compatible). Record-walking form of the Avro
    resolution rules this registry enforces."""
    errs: list[str] = []
    rf, wf = _fields_of(reader), _fields_of(writer)
    for name, rfield in rf.items():
        where = f"{path}{name}"
        if name not in wf:
            # reader-only field: needs a default to fill
            if "default" not in rfield:
                errs.append(f"added field {where!r} has no default")
            continue
        rt, wt = _field_key(rfield["type"]), _field_key(wf[name]["type"])
        if rt == wt:
            continue
        if isinstance(rt, tuple) and isinstance(wt, tuple):
            # nested records: recurse on the actual dicts
            errs.extend(
                _readable(
                    _unwrap(rfield["type"]), _unwrap(wf[name]["type"]),
                    path=f"{where}.",
                )
            )
        elif not (isinstance(wt, str) and isinstance(rt, str)
                  and (wt, rt) in _PROMOTIONS):
            errs.append(
                f"field {where!r} type {wt!r} cannot be read as {rt!r}"
            )
    # writer-only fields are ignored by the reader: always fine
    return errs


def check_compatibility(new: dict, old: dict, mode: str = "BACKWARD") -> list[str]:
    """Violations of ``mode`` when registering ``new`` after ``old``."""
    if mode == "NONE":
        return []
    if mode == "BACKWARD":
        return _readable(new, old)
    if mode == "FORWARD":
        return _readable(old, new)
    if mode == "FULL":
        return _readable(new, old) + _readable(old, new)
    raise ValueError(f"unknown compatibility mode {mode!r}")


#: *_TRANSITIVE modes gate against EVERY stored version, not just the
#: latest (Confluent's BACKWARD_TRANSITIVE family): a v3 that re-breaks
#: v1 readers passes plain BACKWARD (v3 vs v2) but not the transitive gate
TRANSITIVE_MODES = {
    "BACKWARD_TRANSITIVE": "BACKWARD",
    "FORWARD_TRANSITIVE": "FORWARD",
    "FULL_TRANSITIVE": "FULL",
}


class FileSchemaRegistry:
    """Subjects as directories of ``v<N>.json`` under ``root`` — the same
    durable-metadata posture as the schema-history journal. The real
    registry swap is mechanical: register → POST /subjects/<s>/versions,
    latest → GET .../versions/latest."""

    def __init__(self, root: str, compatibility: str = "BACKWARD"):
        self.root = root
        self.compatibility = compatibility
        os.makedirs(root, exist_ok=True)

    def _subject_dir(self, subject: str) -> str:
        return os.path.join(self.root, subject)

    def versions(self, subject: str) -> list[int]:
        d = self._subject_dir(subject)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[1:-5]) for f in os.listdir(d)
            if f.startswith("v") and f.endswith(".json")
        )

    def get(self, subject: str, version: int) -> dict:
        with open(os.path.join(self._subject_dir(subject), f"v{version}.json")) as fh:
            return json.load(fh)

    def latest(self, subject: str) -> tuple[int, dict] | None:
        vs = self.versions(subject)
        if not vs:
            return None
        return vs[-1], self.get(subject, vs[-1])

    def register(self, subject: str, schema: str | dict) -> int:
        """Register a schema version; idempotent for an unchanged schema
        (returns the existing version, like the registry's schema-id
        dedup); raises :class:`IncompatibleSchema` on a gated violation."""
        if isinstance(schema, str):
            schema = json.loads(schema)
        cur = self.latest(subject)
        if cur is not None:
            version, latest = cur
            if latest == schema:
                return version
            base = TRANSITIVE_MODES.get(self.compatibility)
            if base is not None:
                # gate against EVERY stored version, oldest first so the
                # error names the earliest reader the change breaks
                errs = []
                for v in self.versions(subject):
                    for e in check_compatibility(
                            schema, self.get(subject, v), base):
                        errs.append(f"v{v}: {e}")
            else:
                errs = check_compatibility(
                    schema, latest, self.compatibility)
            if errs:
                raise IncompatibleSchema(
                    f"subject {subject!r} {self.compatibility}: "
                    + "; ".join(errs)
                )
            version += 1
        else:
            version = 1
        d = self._subject_dir(subject)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".v{version}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(schema, fh, sort_keys=True)
        os.replace(tmp, os.path.join(d, f"v{version}.json"))
        return version
