"""Multi-writer commit-conflict retry (round-2 verdict 'missing #2').

Two engines merge into one table; the loser of the optimistic-concurrency
race must re-read the manifest and retry on top of the winner — both
commits land, fences for BOTH writers survive, and a redelivered batch is
still a total no-op (no double-apply)."""

import pytest

from sparkcdc.engine import CdcEngine, EngineConfig
from sparkcdc.envelope import cdc_events
from sparkcdc.lake import CommitConflict, LakeTable

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
KEY = ["repo", "path"]


def _engines(spark, tmp_root):
    LakeTable.create(spark, tmp_root, "t", FIELDS, KEY, n_buckets=4)
    a = CdcEngine(spark, LakeTable.load(spark, tmp_root, "t"),
                  EngineConfig(batch_size=500, n_keys=20, n_parts=2,
                               writer="A", seed=1))
    b = CdcEngine(spark, LakeTable.load(spark, tmp_root, "t"),
                  EngineConfig(batch_size=500, n_keys=20, n_parts=2,
                               writer="B", seed=99))
    return a, b


def _inject_race(loser, winner_action):
    """Make the loser's FIRST manifest commit lose a race: right before it
    writes, the winner commits the same version number."""
    orig = loser.table._write_manifest
    state = {"injected": False}

    def race(m, **kw):
        if not state["injected"]:
            state["injected"] = True
            winner_action()
        return orig(m, **kw)

    loser.table._write_manifest = race
    return state


def test_conflict_loser_retries_and_both_commits_land(spark, tmp_root):
    eng_a, eng_b = _engines(spark, tmp_root)

    def b_commits():
        env_b = cdc_events(spark, 200, n_keys=20, n_parts=2, seed=99)
        eng_b._apply_batch(env_b, batch_id=0, kind="replay",
                           offsets={"lo": 0, "next": 200})

    state = _inject_race(eng_a, b_commits)
    env_a = cdc_events(spark, 200, n_keys=20, n_parts=2, seed=1)
    res = eng_a._apply_batch(env_a, batch_id=0, kind="replay",
                             offsets={"lo": 0, "next": 200})
    assert state["injected"] and not res.get("skipped")
    # both writers' fences recorded atomically with the data
    m = eng_a.table.manifest()
    assert m.summary["last_batch"] == {"A": 0, "B": 0}
    # both change sets are present (different seeds -> different commits)
    st = eng_a.table.read()
    assert st.count() > 0
    # conflict was observed and reported
    assert any(n["type"] == "CONFLICT_RETRY"
               for n in eng_a.notifications.read())
    # no double-apply: redelivering A's batch is a total no-op
    v = eng_a.table.current_version()
    res2 = eng_a._apply_batch(env_a, batch_id=0, kind="replay",
                              offsets={"lo": 0, "next": 200})
    assert res2.get("skipped") and eng_a.table.current_version() == v


def test_conflict_exhausted_retries_raises(spark, tmp_root):
    eng_a, eng_b = _engines(spark, tmp_root)
    eng_a.cfg.commit_retries = 0

    def b_commits():
        env_b = cdc_events(spark, 100, n_keys=20, n_parts=2, seed=99)
        eng_b._apply_batch(env_b, batch_id=0, kind="replay",
                           offsets={"lo": 0, "next": 100})

    _inject_race(eng_a, b_commits)
    env_a = cdc_events(spark, 100, n_keys=20, n_parts=2, seed=1)
    with pytest.raises(CommitConflict):
        eng_a._apply_batch(env_a, batch_id=0, kind="replay",
                           offsets={"lo": 0, "next": 100})
