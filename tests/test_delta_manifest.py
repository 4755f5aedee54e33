"""Append/delta manifests (round-2 verdict 'Next round #1': a commit must
not rewrite the full O(files) list — at 64k buckets that is megabytes of
driver-serial json+fsync per commit).

Contract:
- steady-state commits store ``base`` + add/remove path delta; a full file
  list is forced every FULL_MANIFEST_EVERY commits (bounded resolution);
- resolution is exact: a FRESH LakeTable.load (no cache) sees byte-equal
  file lists and state at every retained version;
- GC keeps chain-base manifest FILES (tiny) while still GC'ing their data
  files, and never breaks a kept version's resolution."""

import json
import os

from pyspark.sql import functions as F

from sparkcdc.lake import FULL_MANIFEST_EVERY, LakeTable

FIELDS = [("repo", "string"), ("path", "string"), ("content", "string")]
KEY = ["repo", "path"]


def _mk(spark, root):
    return LakeTable.create(spark, root, "t", FIELDS, KEY, n_buckets=4)


def _ch(spark, i):
    return spark.createDataFrame(
        [("r", f"p{i % 7}", f"v{i}", "u")],
        ["repo", "path", "content", "_op"],
    )


def _raw(t, v):
    with open(os.path.join(t.meta_dir, f"v{v}.json")) as fh:
        return json.load(fh)


def test_commits_store_deltas_and_resolve_exactly(spark, tmp_root):
    t = _mk(spark, tmp_root)
    for i in range(1, 6):
        t.merge(_ch(spark, i), batch_id=i, mode="mor")
    # on-disk: v0 full; v1 may store full (its 1-entry delta ties the full
    # list — ties prefer full, resetting the chain for free); v2..v5 MUST
    # be delta-form with small add/remove lists
    assert _raw(t, 0).get("base") is None
    for v in range(2, 6):
        raw = _raw(t, v)
        assert raw["base"] == v - 1
        assert "files" not in raw
        assert len(raw["delta"]["add"]) <= 2
    # a fresh table handle (cold cache) resolves every version identically
    t2 = LakeTable.load(spark, tmp_root, "t")
    for v in range(6):
        assert t2.manifest(v).files == t.manifest(v).files
    rows = sorted(tuple(r) for r in t2.read().collect())
    assert rows == sorted(
        ("r", f"p{p}", f"v{max(i for i in range(1, 6) if i % 7 == p)}")
        for p in {i % 7 for i in range(1, 6)}
    )


def test_full_manifest_forced_at_chain_bound(spark, tmp_root):
    t = _mk(spark, tmp_root)
    n = FULL_MANIFEST_EVERY + 3
    for i in range(1, n + 1):
        t.merge(_ch(spark, i), batch_id=i, mode="mor")
    fulls = [v for v in range(n + 1) if _raw(t, v).get("base") is None]
    # full manifests are rare (v0, possibly the tie-case v1, and the
    # chain-bound resets); no delta chain may exceed FULL_MANIFEST_EVERY
    assert fulls[0] == 0 and len(fulls) <= 3
    gaps = [b - a for a, b in zip(fulls, fulls[1:])] + [n - fulls[-1]]
    assert max(gaps) <= FULL_MANIFEST_EVERY
    # resolution across the boundary still exact from a cold load
    t2 = LakeTable.load(spark, tmp_root, "t")
    assert t2.manifest().files == t.manifest().files


def test_gc_preserves_chain_resolution(spark, tmp_root):
    t = _mk(spark, tmp_root)
    for i in range(1, 10):
        t.merge(_ch(spark, i), batch_id=i, mode="mor")
        t.expire_versions(keep_last=2)
    # kept versions resolve from a COLD load (chain bases retained)
    t2 = LakeTable.load(spark, tmp_root, "t")
    cur = t2.current_version()
    for v in (cur, cur - 1):
        assert t2.manifest(v).files
    state = sorted(tuple(r) for r in t2.read().collect())
    assert state and all(r[2].startswith("v") for r in state)
    # retained below-horizon manifests are chain bases only, and their
    # non-live data files were GC'd
    live = {f["path"] for f in t2.manifest(cur).files} | {
        f["path"] for f in t2.manifest(cur - 1).files
    }
    on_disk = set()
    for dirpath, _dirs, files in os.walk(t2.data_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                on_disk.add(
                    os.path.relpath(os.path.join(dirpath, fn), t2.dir)
                )
    assert on_disk <= live


def test_time_travel_reads_through_deltas(spark, tmp_root):
    t = _mk(spark, tmp_root)
    for i in range(1, 4):
        t.merge(_ch(spark, i), batch_id=i, mode="mor")
    # version 1 state: only the first merge applied
    v1 = sorted(tuple(r) for r in t.read(version=1).collect())
    assert v1 == [("r", "p1", "v1")]
    # delta path removal is honored in resolution (cow rewrite removes)
    t.merge(_ch(spark, 1), batch_id=4, mode="cow")
    cold = LakeTable.load(spark, tmp_root, "t")
    assert sorted(tuple(r) for r in cold.read().collect()) == sorted(
        tuple(r) for r in t.read().collect()
    )
