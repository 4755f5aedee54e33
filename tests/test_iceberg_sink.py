"""IcebergTableSink: statement snapshots (the exact SQL the adapter
emits), control-flow tests against a recording fake (fencing, skip
paths, statement ordering, manifest mirror round-trip), and an
end-to-end conformance run that auto-skips unless the session has a
real Iceberg catalog (no jars ship in this sandbox)."""

import json
import re

import pytest

from sparkcdc.iceberg import (
    IcebergTableSink,
    compact_sql,
    create_table_sql,
    delete_where_sql,
    evolve_sql,
    expire_sql,
    insert_sql,
    merge_sql,
    set_properties_sql,
)
from sparkcdc.sink import TableSink

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
KEY = ["repo", "path"]
IDENT = "ice.cdc.source_code_repos"


# -- statement snapshots -------------------------------------------------------


def test_create_table_statement():
    assert create_table_sql(IDENT, FIELDS, KEY, 16) == (
        "CREATE TABLE ice.cdc.source_code_repos (\n"
        "  repo string,\n  path string,\n  commit string,\n"
        "  lang string,\n  content string\n)\n"
        "USING iceberg\nPARTITIONED BY (bucket(16, repo))\n"
        "TBLPROPERTIES (\n"
        "  'format-version' = '2',\n"
        "  'write.delete.mode' = 'merge-on-read',\n"
        "  'write.update.mode' = 'merge-on-read',\n"
        "  'write.merge.mode' = 'merge-on-read'\n)"
    )


def test_merge_statement():
    cols = [n for n, _ in FIELDS]
    assert merge_sql(IDENT, "batch_v", cols, KEY) == (
        "MERGE INTO ice.cdc.source_code_repos t\n"
        "USING batch_v s\n"
        "ON t.repo = s.repo AND t.path = s.path\n"
        "WHEN MATCHED AND s._op = 'd' THEN DELETE\n"
        "WHEN MATCHED THEN UPDATE SET t.repo = s.repo, t.path = s.path, "
        "t.commit = s.commit, t.lang = s.lang, t.content = s.content\n"
        "WHEN NOT MATCHED AND s._op != 'd' THEN "
        "INSERT (repo, path, commit, lang, content) "
        "VALUES (s.repo, s.path, s.commit, s.lang, s.content)"
    )


def test_evolve_statements():
    assert evolve_sql(IDENT, [
        {"action": "add", "name": "stars", "type": "long"},
        {"action": "rename", "from": "lang", "to": "language"},
        {"action": "widen", "name": "stars", "type": "long"},
        {"action": "drop", "name": "commit"},
    ]) == [
        "ALTER TABLE ice.cdc.source_code_repos ADD COLUMN stars bigint",
        "ALTER TABLE ice.cdc.source_code_repos RENAME COLUMN lang TO language",
        "ALTER TABLE ice.cdc.source_code_repos ALTER COLUMN stars TYPE bigint",
        "ALTER TABLE ice.cdc.source_code_repos DROP COLUMN commit",
    ]


def test_maintenance_statements():
    assert compact_sql("ice", "cdc.t", "ice.system.bucket(16, repo) IN (3)") == (
        "CALL ice.system.rewrite_data_files(\n"
        "  table => 'cdc.t',\n"
        "  where => 'ice.system.bucket(16, repo) IN (3)'\n)"
    )
    assert expire_sql("ice", "cdc.t", 2) == (
        "CALL ice.system.expire_snapshots(\n"
        "  table => 'cdc.t', retain_last => 2\n)"
    )
    assert delete_where_sql(IDENT, "lang = 'py'") == (
        "DELETE FROM ice.cdc.source_code_repos WHERE lang = 'py'"
    )
    assert insert_sql(IDENT, "v", ["a", "b"]) == (
        "INSERT INTO ice.cdc.source_code_repos (a, b)\nSELECT a, b FROM v"
    )
    assert set_properties_sql(IDENT, {"k": "a'b"}) == (
        "ALTER TABLE ice.cdc.source_code_repos SET TBLPROPERTIES ('k' = 'a''b')"
    )


# -- control flow against a recording fake ------------------------------------


class _FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class RecordingSpark:
    """Intercepts .sql(): records every statement, keeps SET TBLPROPERTIES
    state so SHOW TBLPROPERTIES round-trips, serves canned rows for
    metadata-table queries. Everything else (temp views, DataFrame ops)
    delegates to the real session."""

    def __init__(self, spark, canned=None):
        self._spark = spark
        self.log = []
        self.props = {}
        self.canned = canned or {}  # substring -> rows

    def sql(self, q):
        self.log.append(q)
        m = re.match(
            r"ALTER TABLE \S+ SET TBLPROPERTIES \('(.+?)' = '(.*)'\)",
            q, re.S,
        )
        if m:
            self.props[m.group(1)] = m.group(2).replace("''", "'")
            return _FakeResult([])
        if q.startswith("SHOW TBLPROPERTIES"):
            return _FakeResult(
                [{"key": k, "value": v} for k, v in self.props.items()]
            )
        for frag, rows in self.canned.items():
            if frag in q:
                return _FakeResult(rows)
        return _FakeResult([])

    @property
    def catalog(self):
        return self._spark.catalog


def _mk(spark, canned=None):
    rec = RecordingSpark(spark, canned)
    sink = IcebergTableSink.create(rec, IDENT, FIELDS, KEY,
                                   meta_dir="/tmp/ice-meta", n_buckets=16)
    return rec, sink


def test_satisfies_protocol(spark):
    rec, sink = _mk(spark)
    assert isinstance(sink, TableSink)


def test_create_then_merge_flow_and_fencing(spark):
    rec, sink = _mk(spark)
    assert rec.log[0].startswith("CREATE TABLE ice.cdc.source_code_repos")
    batch = spark.createDataFrame(
        [("r1", "p1", "c", "py", "x", "u"), ("r2", "p2", "c", "py", "y", "d")],
        [n for n, _ in FIELDS] + ["_op"],
    )
    r = sink.merge(batch, batch_id=7, writer="w",
                   summary={"offsets": {"next": 700}})
    assert r == {"version": 1, "skipped": False, "files": -1,
                 "affected_buckets": 16}
    merges = [q for q in rec.log if q.startswith("MERGE INTO")]
    assert len(merges) == 1
    assert "WHEN MATCHED AND s._op = 'd' THEN DELETE" in merges[0]
    # the fence + offsets landed in the state mirror...
    m = sink.manifest()
    assert m.summary["last_batch"] == {"w": 7}
    assert m.summary["offsets"] == {"next": 700}
    assert sink.current_version() == 1
    # ...and a redelivered batch is a no-op: no new MERGE statement
    n_stmts = len(rec.log)
    r2 = sink.merge(batch, batch_id=7, writer="w")
    assert r2["skipped"] and r2["reason"] == "fenced"
    assert not any(q.startswith("MERGE INTO") for q in rec.log[n_stmts:])


def test_evolve_flow_validates_before_altering(spark):
    rec, sink = _mk(spark)
    sink.evolve([{"action": "add", "name": "stars", "type": "long"},
                 {"action": "rename", "from": "lang", "to": "language"}])
    alters = [q for q in rec.log if "ADD COLUMN" in q or "RENAME COLUMN" in q]
    assert alters == [
        "ALTER TABLE ice.cdc.source_code_repos ADD COLUMN stars bigint",
        "ALTER TABLE ice.cdc.source_code_repos RENAME COLUMN lang TO language",
    ]
    m = sink.manifest()
    assert m.epoch == 1
    assert [f.name for f in m.fields] == [
        "repo", "path", "commit", "language", "content", "stars"]
    # rename kept the field id (old files stay readable)
    assert next(f.id for f in m.fields if f.name == "language") == 4
    # an illegal change is rejected BEFORE any ALTER reaches the catalog
    n = len(rec.log)
    with pytest.raises(ValueError, match="key column"):
        sink.evolve([{"action": "widen", "name": "repo", "type": "long"}])
    assert not any("ALTER COLUMN" in q for q in rec.log[n:])


def test_commit_state_conflict_detection(spark):
    """SET TBLPROPERTIES has no conditional form, so the state commit
    carries a token and raises CommitConflict when another writer's
    commit landed between read and write — instead of silently clobbering
    the winner's fence/offset state (the engine retries on conflict)."""
    import copy

    from sparkcdc.lake import CommitConflict

    rec, sink = _mk(spark)
    stale = copy.deepcopy(sink._read_state())  # writer B's snapshot
    batch = spark.createDataFrame(
        [("r1", "p1", "c", "py", "x", "u")],
        [n for n, _ in FIELDS] + ["_op"],
    )
    sink.merge(batch, batch_id=0, writer="a")  # writer A wins the race
    with pytest.raises(CommitConflict, match="concurrent"):
        sink._commit_state(stale, "b", 0, {"offsets": {"next": 1}})
    # the winner's fence state survived untouched
    m = sink.manifest()
    assert m.summary["last_batch"] == {"a": 0}
    assert sink.current_version() == 1


def test_append_rejected_on_keyed_table(spark):
    rec, sink = _mk(spark)
    rows = spark.createDataFrame([("r", "p", "c", "py", "x")],
                                 [n for n, _ in FIELDS])
    with pytest.raises(ValueError, match="use merge"):
        sink.append(rows, batch_id=0)


def test_delta_counts_and_scoped_compaction(spark):
    canned = {".files": [{"bucket": 3, "n": 5}, {"bucket": 9, "n": 1}]}
    rec, sink = _mk(spark, canned)
    assert sink.delta_counts() == {3: 5, 9: 1}
    sink.compact(buckets={3})
    call = [q for q in rec.log if "rewrite_data_files" in q][-1]
    assert "where => 'ice.system.bucket(16, repo) IN (3)'" in call


def test_bucket_pruned_read_predicate(spark):
    rec, sink = _mk(spark)
    # multi-column key: pruning is skipped (bucket scope is an
    # optimization, never semantics)
    sink.read(buckets={1, 2})
    assert rec.log[-1] == "SELECT * FROM ice.cdc.source_code_repos"
    # single-column key: the partition-transform predicate is emitted
    state = json.loads(rec.props[IcebergTableSink.PROPS])
    state["key_cols"] = ["repo"]
    rec.props[IcebergTableSink.PROPS] = json.dumps(state)
    sink.read(buckets={2, 1})
    assert rec.log[-1] == (
        "SELECT * FROM ice.cdc.source_code_repos"
        " WHERE ice.system.bucket(16, repo) IN (1, 2)"
    )


# -- real-catalog conformance (auto-skipped without Iceberg jars) --------------


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_engine_conformance_on_real_catalog(spark, tmp_root):
    """The same protocol-level run test_sink_protocol drives against
    MemoryTableSink, against a real Iceberg catalog when one is on the
    classpath."""
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg jars on the classpath (expected in sandbox)")
    from sparkcdc.engine import CdcEngine, EngineConfig

    spark.conf.set("spark.sql.catalog.ice",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", f"{tmp_root}/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.cdc")
    sink = IcebergTableSink.create(spark, IDENT, FIELDS, KEY,
                                   meta_dir=f"{tmp_root}/meta")
    eng = CdcEngine(spark, sink,
                    EngineConfig(batch_size=500, n_keys=30, n_parts=2, seed=5))
    eng.replay(1500)
    assert eng.committed_offset() == 1500
    assert eng.table.read().count() > 0
    assert eng.replay(1500)["batches"] == 0  # fenced resume


# -- single-commit fence (snapshot-summary properties) -------------------------


def _mk_single_commit(spark, canned=None):
    """Sink wired with a recording commit-properties runner — the test
    stand-in for the JVM CommitMetadata shim: records which statements
    ran inside the props context."""
    rec = RecordingSpark(spark, canned)
    committed = []

    def runner(props, fn):
        n = len(rec.log)
        fn()
        committed.append((dict(props), rec.log[n:]))

    sink = IcebergTableSink.create(
        rec, IDENT, FIELDS, KEY, meta_dir="/tmp/ice-meta", n_buckets=16,
        commit_properties_runner=runner,
    )
    return rec, sink, committed


def test_single_commit_fence_rides_data_statement(spark):
    """Fence + offsets land in the SAME Iceberg commit as the MERGE: the
    post-commit state JSON is attached as a snapshot-summary property of
    the data statement itself, and only the best-effort mirror property
    write follows."""
    rec, sink, committed = _mk_single_commit(spark)
    batch = spark.createDataFrame(
        [("r1", "p1", "c", "py", "x", "u")],
        [n for n, _ in FIELDS] + ["_op"],
    )
    sink.merge(batch, batch_id=3, writer="w",
               summary={"offsets": {"next": 400}})
    assert len(committed) == 1
    props, stmts = committed[0]
    # the data statement executed inside the props context...
    assert len(stmts) == 1 and stmts[0].startswith("MERGE INTO")
    # ...carrying the EXACT post-commit state (fence + offsets + version)
    state = json.loads(props[IcebergTableSink.PROPS])
    assert state["last_batch"] == {"w": 3}
    assert state["offsets"] == {"next": 400}
    assert state["version"] == 1
    # the mirror property write happened strictly AFTER the data commit
    merge_at = rec.log.index(stmts[0])
    prop_writes = [i for i, q in enumerate(rec.log)
                   if q.startswith("ALTER TABLE") and "TBLPROPERTIES" in q
                   and i > merge_at]
    assert prop_writes, "mirror write missing"
    # and the mirror carries the same state the snapshot carried
    assert json.loads(rec.props[IcebergTableSink.PROPS]) == state


def test_read_state_heals_lost_mirror_from_snapshot(spark):
    """Crash window closed: if the property mirror write is lost after a
    single-commit data statement, _read_state adopts the newer state from
    the snapshot summary and rewrites the mirror."""
    rec, sink, committed = _mk_single_commit(spark)
    batch = spark.createDataFrame(
        [("r1", "p1", "c", "py", "x", "u")],
        [n for n, _ in FIELDS] + ["_op"],
    )
    sink.merge(batch, batch_id=5, writer="w",
               summary={"offsets": {"next": 600}})
    snap_state = committed[0][0][IcebergTableSink.PROPS]
    # simulate the crash: roll the mirror back to the pre-merge state and
    # serve the snapshot-summary copy from the .snapshots metadata table
    stale = json.loads(rec.props[IcebergTableSink.PROPS])
    stale["version"] = 0
    stale["last_batch"] = {}
    stale["offsets"] = {}
    rec.props[IcebergTableSink.PROPS] = json.dumps(stale)
    rec.canned[".snapshots"] = [{"state": snap_state}]
    m = sink.manifest()  # reads state -> must self-heal
    assert m.summary["last_batch"] == {"w": 5}
    assert m.summary["offsets"] == {"next": 600}
    assert sink.current_version() == 1
    # the mirror was healed in place
    assert json.loads(rec.props[IcebergTableSink.PROPS])["version"] == 1
    # and the redelivered batch is fenced off the healed state
    r = sink.merge(batch, batch_id=5, writer="w")
    assert r["skipped"] and r["reason"] == "fenced"


def test_delete_where_carries_lineage_and_fence_check(spark):
    """delete_where records the triggering batch in the committed summary
    (LakeTable parity) and skips a redelivered batch's delete — without
    advancing the fence, so the same batch's merge still applies."""
    rec, sink = _mk(spark)
    sink.delete_where("lang = 'py'", batch_id=2)
    m = sink.manifest()
    assert m.summary["op"] == "delete_where"
    assert m.summary["delete_batch_id"] == 2
    assert m.summary["predicate"] == "lang = 'py'"
    # fence map untouched: batch 2's own merge must not be skipped
    assert m.summary["last_batch"] == {}
    batch = spark.createDataFrame(
        [("r1", "p1", "c", "py", "x", "u")],
        [n for n, _ in FIELDS] + ["_op"],
    )
    r = sink.merge(batch, batch_id=2, writer="default")
    assert not r["skipped"]
    # NOW batch 2 is fenced: its redelivered delete is a no-op
    n = len(rec.log)
    r2 = sink.delete_where("lang = 'py'", batch_id=2)
    assert r2["skipped"] and r2["reason"] == "fenced"
    assert not any(q.startswith("DELETE FROM") for q in rec.log[n:])
