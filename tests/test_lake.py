"""LakeTable: atomic versioned commits, copy-on-write MERGE, fencing,
schema evolution by field id, time travel. (SURVEY §2.8 K1-K7.)"""

import pytest
from pyspark.sql import functions as F

from sparkcdc.lake import LakeTable


FIELDS = [("repo", "string"), ("path", "string"), ("content", "string")]
KEY = ["repo", "path"]


def mk(spark, root, n_buckets=4):
    return LakeTable.create(spark, root, "t", FIELDS, KEY, n_buckets=n_buckets)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def ch(spark, data):
    return spark.createDataFrame(data, ["repo", "path", "content", "_op"])


def test_create_read_empty(spark, tmp_root):
    t = mk(spark, tmp_root)
    assert t.read().count() == 0
    assert t.current_version() == 0


def test_merge_upsert_delete(spark, tmp_root):
    t = mk(spark, tmp_root)
    t.merge(ch(spark, [("r", "a", "1", "u"), ("r", "b", "1", "u")]), batch_id=1)
    assert rows(t.read()) == [("r", "a", "1"), ("r", "b", "1")]
    t.merge(ch(spark, [("r", "a", "2", "u"), ("r", "b", "x", "d"), ("r", "c", "1", "u")]), batch_id=2)
    assert rows(t.read()) == [("r", "a", "2"), ("r", "c", "1")]


def test_merge_is_fenced_idempotent(spark, tmp_root):
    t = mk(spark, tmp_root)
    t.merge(ch(spark, [("r", "a", "1", "u")]), batch_id=1)
    v = t.current_version()
    res = t.merge(ch(spark, [("r", "a", "IGNORED", "u")]), batch_id=1)
    assert res["skipped"] is True
    assert t.current_version() == v
    assert rows(t.read()) == [("r", "a", "1")]


def test_copy_on_write_prunes_buckets(spark, tmp_root):
    t = mk(spark, tmp_root, n_buckets=8)
    big = spark.range(200).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("v1").alias("content"),
        F.lit("u").alias("_op"),
    )
    t.merge(big, batch_id=1)
    res = t.merge(ch(spark, [("r", "p0", "v2", "u")]), batch_id=2)
    # a single-key batch touches exactly one bucket
    assert res["affected_buckets"] == 1
    m = t.manifest()
    prev = t.manifest(m.parent)
    untouched_prev = [f["path"] for f in prev.files if f["bucket"] not in set(m.summary["affected_buckets"])]
    # untouched buckets' files are carried over, not rewritten
    assert set(untouched_prev) <= {f["path"] for f in m.files}
    assert t.read().filter("path='p0'").first().content == "v2"
    assert t.read().count() == 200


def test_time_travel(spark, tmp_root):
    t = mk(spark, tmp_root)
    t.merge(ch(spark, [("r", "a", "1", "u")]), batch_id=1)
    v1 = t.current_version()
    t.merge(ch(spark, [("r", "a", "2", "u")]), batch_id=2)
    assert t.read(version=v1).first().content == "1"
    assert t.read().first().content == "2"


def test_evolve_add_rename_widen(spark, tmp_root):
    t = LakeTable.create(
        spark, tmp_root, "t",
        [("repo", "string"), ("path", "string"), ("stars", "int")],
        KEY, n_buckets=2,
    )
    t.merge(
        spark.createDataFrame([("r", "a", 5, "u")], ["repo", "path", "stars", "_op"]),
        batch_id=1,
    )
    t.evolve([
        {"action": "add", "name": "lang", "type": "string"},
        {"action": "rename", "from": "path", "to": "file_path"},
        {"action": "widen", "name": "stars", "type": "long"},
    ])
    df = t.read()
    assert set(df.columns) == {"repo", "file_path", "stars", "lang"}
    r = df.first()
    # old file read through the new schema: rename mapped by field id,
    # widened type cast, added column null
    assert (r.repo, r.file_path, r.stars, r.lang) == ("r", "a", 5, None)
    assert dict(df.dtypes)["stars"] == "bigint"
    # key_cols followed the rename; merging on the new schema works
    t.merge(
        spark.createDataFrame(
            [("r", "a", 7, "py", "u")], ["repo", "file_path", "stars", "lang", "_op"]
        ).withColumn("stars", F.col("stars").cast("long")),
        batch_id=2,
    )
    r2 = t.read().first()
    assert (r2.stars, r2.lang) == (7, "py")


def test_evolve_rejects_illegal_widen(spark, tmp_root):
    t = LakeTable.create(spark, tmp_root, "t", [("repo", "string"), ("path", "string"), ("n", "long")], KEY)
    with pytest.raises(ValueError):
        t.evolve([{"action": "widen", "name": "n", "type": "int"}])


def test_delete_where_truncate(spark, tmp_root):
    t = mk(spark, tmp_root)
    t.merge(ch(spark, [("r1", "a", "1", "u"), ("r2", "b", "1", "u")]), batch_id=1)
    t.delete_where("repo = 'r1'")
    assert rows(t.read()) == [("r2", "b", "1")]
    # TRUNCATE fast path: empty manifest, no files
    t.delete_where("true")
    assert t.read().count() == 0 and t.manifest().files == []


def test_delete_where_prunes_untouched_buckets(spark, tmp_root):
    """A selective delete rewrites ONLY the buckets holding matching rows;
    every other bucket's files are carried over untouched (round-2
    verdict minor #4)."""
    from pyspark.sql import functions as F

    t = LakeTable.create(
        spark, tmp_root, "p",
        [("repo", "string"), ("path", "string"), ("content", "string")],
        KEY, n_buckets=8,
    )
    base = spark.range(400).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("v").alias("content"), F.lit("u").alias("_op"),
    )
    t.merge(base, batch_id=1)
    before = {f["path"] for f in t.manifest().files}
    res = t.delete_where("path = 'p7'")
    assert res["rewritten_buckets"] == 1
    after = {f["path"] for f in t.manifest().files}
    # 7 of 8 bucket files survive by identity (no rewrite)
    assert len(before & after) == 7
    assert t.read().count() == 399
    assert t.read().filter("path = 'p7'").count() == 0


def test_touched_buckets_point_probe(spark, tmp_root):
    """touched_buckets gives the exact pruning set for a point probe: a
    probe key matches index state iff it matches in read(buckets=touched),
    and the set is a strict subset for a small probe over many buckets."""
    t = mk(spark, tmp_root, n_buckets=8)
    data = [("r", f"p{i}", str(i), "u") for i in range(64)]
    t.merge(ch(spark, data), batch_id=1)

    probe = spark.createDataFrame(
        [("r", "p7"), ("r", "p13"), ("zz", "nope")], ["repo", "path"]
    )
    touched = t.touched_buckets(probe)
    assert touched and len(touched) <= 3 < 8
    pruned = rows(t.read(buckets=touched).join(
        probe, ["repo", "path"], "left_semi"))
    full = rows(t.read().join(probe, ["repo", "path"], "left_semi"))
    assert pruned == full
    assert [r[1] for r in full] == ["p13", "p7"]


def test_expire_versions_gc(spark, tmp_root):
    t = mk(spark, tmp_root)
    for i in range(1, 5):
        t.merge(ch(spark, [("r", "a", str(i), "u")]), batch_id=i)
    removed = t.expire_versions(keep_last=2)
    assert removed > 0
    assert t.read().first().content == "4"  # current still intact


def test_add_column_with_default(spark, tmp_root):
    """K3: added columns may carry a default — old files AND old-epoch
    events read back with the default, not NULL."""
    from sparkcdc.engine import CdcEngine, EngineConfig

    t = LakeTable.create(
        spark, tmp_root, "dflt",
        fields=[("repo", "string"), ("path", "string"), ("commit", "string"),
                ("lang", "string"), ("content", "string")],
        key_cols=["repo", "path"], n_buckets=4,
    )
    eng = CdcEngine(spark, t, EngineConfig(batch_size=1000, n_keys=20))
    eng.replay(200)
    t.evolve([{"action": "add", "name": "stars", "type": "int", "default": 5}])
    # old files: default visible
    assert {r["stars"] for r in t.read().collect()} == {5}
    # old-epoch events applied after the evolve: default filled too
    from sparkcdc.envelope import cdc_events
    eng._apply_batch(cdc_events(spark, 100, start=200, n_keys=20),
                     batch_id=eng.committed_batch() + 1, kind="replay",
                     offsets={"lo": 200, "next": 300})
    assert {r["stars"] for r in t.read().collect()} == {5}


def test_concurrent_commit_conflict(spark, tmp_root):
    """Optimistic concurrency: two writers racing to commit the same next
    version — the second gets CommitConflict, the first's commit survives."""
    import pytest
    from pyspark.sql import functions as F
    from sparkcdc.lake import CommitConflict

    t = LakeTable.create(
        spark, tmp_root, "race",
        fields=[("id", "string"), ("v", "long")], key_cols=["id"], n_buckets=2,
    )
    batch = spark.range(10).select(
        F.concat(F.lit("k"), F.col("id")).alias("id"),
        F.col("id").alias("v"), F.lit("u").alias("_op"),
    )
    # writer A reads manifest and commits
    t.merge(batch, batch_id=0, writer="a")
    v_after_a = t.current_version()
    # simulate writer B having read the OLD manifest: craft a manifest with
    # the same next version number and try to write it
    m = t.manifest(v_after_a - 1)
    m.version = v_after_a
    with pytest.raises(CommitConflict):
        t._write_manifest(m)
    # table state untouched by the loser
    assert t.current_version() == v_after_a
    assert t.read().count() == 10
