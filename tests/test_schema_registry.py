"""Schema registry stand-in: subject versioning + Avro compatibility
gates over envelope schemas (the register-or-reject contract the engine
needs from a Confluent-style registry)."""

import json

import pytest
from pyspark.sql import types as T

from sparkcdc.schema_registry import (
    FileSchemaRegistry,
    IncompatibleSchema,
    check_compatibility,
)
from sparkcdc.transforms.avro import envelope_avro_schema

V1 = [("repo", T.StringType()), ("path", T.StringType()),
      ("content", T.StringType())]
V2_ADDED = V1 + [("lang", T.StringType())]          # nullable+default: ok
V2_WIDENED = [("repo", T.StringType()), ("path", T.StringType()),
              ("content", T.StringType()), ("size", T.LongType())]


def env_schema(fields):
    return json.loads(envelope_avro_schema(fields))


def test_register_versions_and_idempotency(tmp_path):
    reg = FileSchemaRegistry(str(tmp_path / "registry"))
    s1 = env_schema(V1)
    assert reg.register("repos-value", s1) == 1
    assert reg.register("repos-value", s1) == 1  # unchanged → same version
    assert reg.register("repos-value", env_schema(V2_ADDED)) == 2
    assert reg.versions("repos-value") == [1, 2]
    v, latest = reg.latest("repos-value")
    assert v == 2 and latest == env_schema(V2_ADDED)
    assert reg.get("repos-value", 1) == s1


def test_backward_allows_defaulted_add_and_promotion(tmp_path):
    # every envelope field is ["null", X] default null → adds are fine
    assert check_compatibility(env_schema(V2_ADDED), env_schema(V1)) == []
    # int→long promotion inside the row record
    old = env_schema([("n", T.IntegerType())])
    new = env_schema([("n", T.LongType())])
    assert check_compatibility(new, old) == []
    # narrowing rejected
    errs = check_compatibility(old, new)
    assert errs and "cannot be read" in errs[0]


def test_backward_rejects_add_without_default(tmp_path):
    reg = FileSchemaRegistry(str(tmp_path / "r"))
    reg.register("s", env_schema(V1))
    bad = env_schema(V2_ADDED)
    # strip the default from the added row field (a required column)
    before = next(f for f in bad["fields"] if f["name"] == "before")
    lang = next(f for f in before["type"][1]["fields"] if f["name"] == "lang")
    del lang["default"]
    with pytest.raises(IncompatibleSchema, match="lang"):
        reg.register("s", bad)


def test_forward_and_full_modes(tmp_path):
    old, new = env_schema(V1), env_schema(V2_ADDED)
    # FORWARD: old reader sees new writer's extra field → ignored, fine
    assert check_compatibility(new, old, mode="FORWARD") == []
    assert check_compatibility(new, old, mode="FULL") == []
    # NONE never gates
    assert check_compatibility({"fields": []}, old, mode="NONE") == []
    with pytest.raises(ValueError):
        check_compatibility(new, old, mode="SIDEWAYS")


def test_engine_registers_schema_epochs(spark, tmp_root):
    """Engine wiring: each schema epoch's envelope Avro schema lands in
    the attached registry under <table>-value, compatibility-gated."""
    import os

    from sparkcdc.engine import CdcEngine, EngineConfig
    from sparkcdc.envelope import cdc_events
    from sparkcdc.lake import LakeTable

    t = LakeTable.create(
        spark, tmp_root, "t",
        fields=[("repo", "string"), ("path", "string"), ("commit", "string"),
                ("lang", "string"), ("content", "string")],
        key_cols=["repo", "path"], n_buckets=4,
    )
    eng = CdcEngine(spark, t, EngineConfig(batch_size=400, n_keys=30, n_parts=4))
    eng.schema_registry = FileSchemaRegistry(os.path.join(tmp_root, "registry"))
    src = cdc_events(spark, 100, n_keys=30).filter("op != 'd'").select(
        "after.*").dropDuplicates(["repo", "path"])
    eng.run_snapshot(src)  # registers the baseline (v1) automatically
    eng.replay(
        800,
        schema_changes=[(200, "ALTER TABLE t ADD stars BIGINT")],
    )
    reg = eng.schema_registry
    assert reg.versions("t-value") == [1, 2]
    v2 = reg.get("t-value", 2)
    before = next(f for f in v2["fields"] if f["name"] == "before")
    names = [f["name"] for f in before["type"][1]["fields"]]
    assert "stars" in names
    # v2 reads v1 data (BACKWARD) — the gate that admitted it
    assert check_compatibility(v2, reg.get("t-value", 1)) == []


def test_backward_transitive_gates_all_versions(tmp_path):
    """*_TRANSITIVE modes check every stored version: a v3 that is
    compatible with v2 but re-breaks v1 readers must be rejected (and
    plain BACKWARD, latest-only, must admit it — the Confluent split)."""
    v1 = env_schema([("a", T.StringType()), ("size", T.IntegerType())])
    v2 = env_schema([("a", T.StringType())])                # drop: bwd-ok
    v3 = env_schema([("a", T.StringType()), ("size", T.StringType())])

    plain = FileSchemaRegistry(str(tmp_path / "plain"))
    plain.register("s-value", v1)
    plain.register("s-value", v2)
    assert plain.register("s-value", v3) == 3  # latest-only gate admits

    trans = FileSchemaRegistry(
        str(tmp_path / "trans"), compatibility="BACKWARD_TRANSITIVE")
    trans.register("s-value", v1)
    trans.register("s-value", v2)
    with pytest.raises(IncompatibleSchema, match="v1:"):
        trans.register("s-value", v3)
    assert trans.versions("s-value") == [1, 2]  # rejection left no state
