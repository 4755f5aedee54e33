"""Tests: multi-table capture — one stream split by source.table into
independent sink tables with per-table fencing and include filters."""

from pyspark.sql import functions as F

from sparkcdc.engine import EngineConfig
from sparkcdc.envelope import cdc_events
from sparkcdc.lake import LakeTable
from sparkcdc.multitable import MultiTableEngine

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def two_table_stream(spark, lo, hi):
    """Generator stream with source.table split by key hash parity."""
    env = cdc_events(spark, hi - lo, start=lo, n_keys=100, n_parts=4)
    shard = F.when(
        F.pmod(F.xxhash64(F.coalesce(F.col("after.path"), F.col("before.path"))), F.lit(2)) == 0,
        F.lit("repos_a"),
    ).otherwise(F.lit("repos_b"))
    return env.withColumn("source", F.col("source").withField("table", shard))


def make_tables(spark, tmp_root, names):
    return {
        f"code.{n}": LakeTable.create(
            spark, tmp_root, n, fields=FIELDS, key_cols=["repo", "path"], n_buckets=4
        )
        for n in names
    }


def test_split_apply_and_isolation(spark, tmp_root):
    tables = make_tables(spark, tmp_root, ["repos_a", "repos_b"])
    mte = MultiTableEngine(spark, tables, EngineConfig(n_keys=100, n_parts=4))
    mte.replay(2000, lambda lo, hi: two_table_stream(spark, lo, hi), batch_size=1000)

    a = mte.state("code.repos_a")
    b = mte.state("code.repos_b")
    assert a.count() > 0 and b.count() > 0
    # no key crosses tables, and the union equals single-table replay state
    a_keys = {(r["repo"], r["path"]) for r in a.collect()}
    b_keys = {(r["repo"], r["path"]) for r in b.collect()}
    assert not (a_keys & b_keys)

    single_root = tmp_root + "/single"
    single = LakeTable.create(spark, single_root, "all", fields=FIELDS,
                              key_cols=["repo", "path"], n_buckets=4)
    from sparkcdc.engine import CdcEngine
    eng = CdcEngine(spark, single, EngineConfig(batch_size=1000, n_keys=100, n_parts=4))
    eng.replay(2000)
    assert a_keys | b_keys == {
        (r["repo"], r["path"]) for r in single.read().collect()
    }


def test_include_filter_drops_tables(spark, tmp_root):
    tables = make_tables(spark, tmp_root, ["repos_a", "repos_b"])
    mte = MultiTableEngine(
        spark, tables, EngineConfig(n_keys=100, n_parts=4),
        include=[r"code\.repos_a"],
    )
    assert set(mte.engines) == {"code.repos_a"}
    mte.replay(500, lambda lo, hi: two_table_stream(spark, lo, hi), batch_size=500)
    assert mte.state("code.repos_a").count() > 0
    assert tables["code.repos_b"].read().count() == 0


def test_per_table_fencing_on_reapply(spark, tmp_root):
    tables = make_tables(spark, tmp_root, ["repos_a", "repos_b"])
    mte = MultiTableEngine(spark, tables, EngineConfig(n_keys=100, n_parts=4))
    mte.replay(1000, lambda lo, hi: two_table_stream(spark, lo, hi), batch_size=500)
    va = tables["code.repos_a"].current_version()
    # re-apply an old batch id directly: both tables fence it
    out = mte.apply_batch(two_table_stream(spark, 0, 500), batch_id=0,
                          offsets={"lo": 0, "next": 500})
    assert all(r.get("skipped") for r in out.values())
    assert tables["code.repos_a"].current_version() == va


def test_multi_table_snapshot_with_progress(spark, tmp_root):
    """run_snapshot drives each captured table's snapshot and journals
    the global (tables_total, tables_completed) MXBean position; a
    filtered-out source is skipped like an apply_batch slice."""
    tables = make_tables(spark, tmp_root, ["repos_a", "repos_b"])
    mte = MultiTableEngine(spark, tables, EngineConfig(n_keys=100, n_parts=4))

    def src(tag):
        return spark.createDataFrame(
            [(f"org/{tag}", f"f{i}.py", "c0", "py", f"{tag}-{i}")
             for i in range(5)],
            "repo string, path string, commit string, lang string, "
            "content string",
        )

    out = mte.run_snapshot({
        "code.repos_a": src("a"),
        "code.repos_b": src("b"),
        "code.ignored": src("x"),  # not captured -> skipped
    })
    assert set(out) == {"code.repos_a", "code.repos_b"}
    assert mte.state("code.repos_a").count() == 5
    assert mte.state("code.repos_b").count() == 5

    # per-table MXBean position: sorted order means repos_a completed 1/2,
    # repos_b closed the phase at 2/2
    pa = mte.engines["code.repos_a"].metrics.snapshot_progress()
    pb = mte.engines["code.repos_b"].metrics.snapshot_progress()
    assert pa["total_table_count"] == 2 and pa["completed_table_count"] == 1
    assert pa["snapshot_running"] is True
    assert pb["completed_table_count"] == 2
    assert pb["snapshot_completed"] is True
    assert pb["rows_scanned"] == {"repos_b": 5}
