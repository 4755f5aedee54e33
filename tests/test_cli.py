"""CLI: the spark-submit surface. Focus on `ingest` — wire-format lines
from files → envelopes → fenced apply, resuming at the committed offset."""

import json
import os

from sparkcdc.cli import main
from sparkcdc.sources.wal2json import events_to_wal2json_lines

FIELDS = "user_id:long,event_type:string,value:double,props:string"


def _write_lines(spark, tmp_root, events):
    path = os.path.join(tmp_root, "wal")
    events_to_wal2json_lines(events).coalesce(1).write.mode(
        "overwrite").text(path)
    return path


def test_ingest_applies_and_resumes(spark, tmp_root, capsys):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    wal = _write_lines(spark, tmp_root, events)
    root = os.path.join(tmp_root, "lake")
    argv = ["ingest", "--root", root, "--table", "events_sink",
            "--format", "wal2json", "--path", wal + "/*.txt",
            "--fields", FIELDS, "--key", "user_id",
            "--source-table", "events", "--buckets", "4"]
    assert main(argv) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["skipped"] is False and out1["resumed_from"] == 0

    # the sink holds the LWW survivors
    from sparkcdc.lake import LakeTable

    t = LakeTable.load(spark, root, "events_sink")
    n = t.read().count()
    assert n > 0

    # second invocation: committed offset excludes every line -> no-op,
    # state unchanged
    assert main(argv) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {"applied": 0, "skipped": True,
                    "committed": out1["next_offset"]}
    assert t.read().count() == n


def test_ingest_mongo_format(spark, tmp_root, capsys):
    from sparkcdc.sources.mongo import events_to_change_stream_docs

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = os.path.join(tmp_root, "cs")
    events_to_change_stream_docs(events).coalesce(1).write.mode(
        "overwrite").text(path)
    root = os.path.join(tmp_root, "lake2")
    assert main(["ingest", "--root", root, "--table", "events_sink",
                 "--format", "mongo", "--path", path + "/*.txt",
                 "--fields", FIELDS, "--key", "user_id",
                 "--source-table", "events", "--buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] is False

    from sparkcdc.lake import LakeTable

    assert LakeTable.load(spark, root, "events_sink").read().count() > 0


def test_ingest_pgoutput_format(spark, tmp_root, capsys):
    """The one binary-protocol format: slot frames land as parquet
    (lsn, xid, data bytea) and the CLI reads parquet instead of text."""
    from sparkcdc.sources.pgoutput import events_to_pgoutput_frames

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = os.path.join(tmp_root, "pgout")
    events_to_pgoutput_frames(events).write.mode("overwrite").parquet(path)
    root = os.path.join(tmp_root, "lake_pg")
    argv = ["ingest", "--root", root, "--table", "events_sink",
            "--format", "pgoutput", "--path", path,
            "--fields", FIELDS, "--key", "user_id",
            "--source-table", "events", "--buckets", "4"]
    assert main(argv) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] is False

    from sparkcdc.lake import LakeTable

    n = LakeTable.load(spark, root, "events_sink").read().count()
    assert n > 0

    # redelivery: committed offset excludes every frame -> no-op
    assert main(argv) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["skipped"] is True


def test_ingest_sqlserver_format(spark, tmp_root, capsys):
    from sparkcdc.sources.sqlserver import events_to_change_table_rows

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = os.path.join(tmp_root, "ct")
    events_to_change_table_rows(events).coalesce(1).write.mode(
        "overwrite").text(path)
    root = os.path.join(tmp_root, "lake3")
    assert main(["ingest", "--root", root, "--table", "events_sink",
                 "--format", "sqlserver", "--path", path + "/*.txt",
                 "--fields", FIELDS, "--key", "user_id",
                 "--source-table", "dbo_events", "--buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] is False

    from sparkcdc.lake import LakeTable

    assert LakeTable.load(spark, root, "events_sink").read().count() > 0


def test_ingest_maxwell_format(spark, tmp_root, capsys):
    from sparkcdc.sources.maxwell import events_to_maxwell_lines

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = os.path.join(tmp_root, "mx")
    events_to_maxwell_lines(events).coalesce(1).write.mode(
        "overwrite").text(path)
    root = os.path.join(tmp_root, "lake_mx")
    assert main(["ingest", "--root", root, "--table", "events_sink",
                 "--format", "maxwell", "--path", path + "/*.txt",
                 "--fields", FIELDS, "--key", "user_id",
                 "--source-table", "events", "--buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] is False

    from sparkcdc.lake import LakeTable

    assert LakeTable.load(spark, root, "events_sink").read().count() > 0


def test_ingest_sqlserver_boundary_tx_not_lost(spark, tmp_root, capsys):
    """A tailer can flush mid-transaction: run 1 ships only the op-3
    half of the max-LSN transaction. The sqlserver format commits an
    INCLUSIVE watermark (next = max commit LSN), so run 2 — which ships
    the complete pair — re-reads the boundary transaction and lands the
    update instead of losing the op-4 half forever."""
    import json as _json

    half = _json.dumps({
        "start_lsn": "00000025:00000100:0001",
        "seqval": "00000025:000000ff:0001", "operation": 3,
        "update_mask": "0f", "capture_instance": "dbo_events",
        "commit_time": 1700000000000,
        "data": {"user_id": 5, "event_type": "signup",
                 "value": 1.0, "props": None},
    })
    full = _json.dumps({
        "start_lsn": "00000025:00000100:0001",
        "seqval": "00000025:000000ff:0001", "operation": 4,
        "update_mask": "0f", "capture_instance": "dbo_events",
        "commit_time": 1700000000000,
        "data": {"user_id": 5, "event_type": "click",
                 "value": 9.0, "props": "late"},
    })
    d1 = os.path.join(tmp_root, "run1")
    os.makedirs(d1)
    with open(os.path.join(d1, "a.txt"), "w") as f:
        f.write(half + "\n")
    d2 = os.path.join(tmp_root, "run2")
    os.makedirs(d2)
    with open(os.path.join(d2, "a.txt"), "w") as f:
        f.write(half + "\n" + full + "\n")

    root = os.path.join(tmp_root, "lake4")
    base = ["ingest", "--root", root, "--table", "events_sink",
            "--format", "sqlserver", "--fields", FIELDS,
            "--key", "user_id", "--source-table", "dbo_events",
            "--buckets", "4"]
    assert main(base + ["--path", d1 + "/*.txt"]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # inclusive watermark: next == the boundary commit LSN itself
    boundary = (0x25 << 48) | (0x100 << 16) | 1
    assert out1["next_offset"] == boundary

    from sparkcdc.lake import LakeTable

    assert main(base + ["--path", d2 + "/*.txt"]) == 0
    t = LakeTable.load(spark, root, "events_sink")
    rows = {r["user_id"]: r for r in t.read().collect()}
    assert rows[5]["event_type"] == "click" and rows[5]["props"] == "late"


def test_dedup_ingest_two_batches_and_fence(spark, tmp_root, capsys):
    import json as _json

    docs1 = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")], "doc_id long, text string"
    )
    p1 = f"{tmp_root}/in1.parquet"
    docs1.write.parquet(p1)
    assert main(["dedup-ingest", "--root", f"{tmp_root}/lake",
                 "--path", p1, "--batch-id", "1", "--buckets", "4"]) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["admitted"] == 2 and out1["corpus_rows"] == 2

    docs2 = spark.createDataFrame(
        [(9, "beta"), (10, "gamma")], "doc_id long, text string"
    )
    p2 = f"{tmp_root}/in2.parquet"
    docs2.write.parquet(p2)
    assert main(["dedup-ingest", "--root", f"{tmp_root}/lake",
                 "--path", p2, "--batch-id", "2", "--buckets", "4"]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["admitted"] == 1 and out2["corpus_rows"] == 3

    # redelivering batch 2 is a total no-op (both fences hold)
    assert main(["dedup-ingest", "--root", f"{tmp_root}/lake",
                 "--path", p2, "--batch-id", "2", "--buckets", "4"]) == 0
    out3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["admitted"] == 0 and out3["corpus_rows"] == 3
    assert out3["index_rows"] == 3


def test_dedup_ingest_minhash_method(spark, tmp_root, capsys):
    import json as _json

    t = "one stable document body for the minhash ingest path"
    docs1 = spark.createDataFrame(
        [(0, t), (1, "entirely different material here")],
        "doc_id long, text string",
    )
    p1 = f"{tmp_root}/nin1.parquet"
    docs1.write.parquet(p1)
    assert main(["dedup-ingest", "--root", f"{tmp_root}/lake",
                 "--path", p1, "--batch-id", "1", "--buckets", "4",
                 "--method", "minhash"]) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["admitted"] == 2

    docs2 = spark.createDataFrame(
        [(9, t), (10, "a third body unlike the others")],
        "doc_id long, text string",
    )
    p2 = f"{tmp_root}/nin2.parquet"
    docs2.write.parquet(p2)
    assert main(["dedup-ingest", "--root", f"{tmp_root}/lake",
                 "--path", p2, "--batch-id", "2", "--buckets", "4",
                 "--method", "minhash"]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # doc 9 is a (near-)dup of committed doc 0 -> dropped
    assert out2["admitted"] == 1 and out2["corpus_rows"] == 3


def test_metrics_subcommand(spark, tmp_root, capsys):
    """`metrics` prints the MXBean-shaped progress readers straight from
    the lineage log — after a replay the streaming status must carry the
    committed batches/events and the throughput must be positive."""
    import json as _json

    root = os.path.join(tmp_root, "lake_metrics")
    assert main(["replay", "--root", root, "--events", "2000",
                 "--batch-size", "1000", "--buckets", "4",
                 "--keys", "50"]) == 0
    capsys.readouterr()
    assert main(["metrics", "--root", root]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["streaming"]["number_of_committed_batches"] >= 2
    assert out["streaming"]["total_number_of_events_seen"] == 2000
    assert out["streaming"]["milliseconds_behind_source"] is not None
    assert out["throughput"]["events_per_sec"] > 0
    # replay-only run: the snapshot phase never started, and the reader
    # says so rather than inventing progress
    assert out["snapshot"]["snapshot_running"] is False
    assert out["snapshot"]["snapshot_completed"] is False
    assert out["snapshot"]["total_table_count"] == 0


def test_snapshot_subcommand(spark, tmp_root, capsys):
    """`snapshot` bootstraps a table from a parquet source (schema derived,
    op='r' envelopes, fenced batch) and the metrics poll sees the phase."""
    import json as _json

    src = spark.createDataFrame(
        [(f"org/r{i}", f"src/f{i}.py", "c0", "py", f"body-{i}")
         for i in range(25)],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    path = os.path.join(tmp_root, "snap_src.parquet")
    src.write.parquet(path)
    root = os.path.join(tmp_root, "lake_snap")
    assert main(["snapshot", "--root", root, "--path", path,
                 "--key", "repo,path", "--buckets", "4"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 25
    assert out["snapshot"]["snapshot_completed"] is True
    assert out["snapshot"]["rows_scanned"] == {"source_code_repos": 25}

    # the snapshot state is the LWW base: a subsequent wire ingest
    # upserts over it through the normal fenced path
    from sparkcdc.lake import LakeTable

    t = LakeTable.load(spark, root, "source_code_repos")
    assert {r["repo"] for r in t.read().select("repo").collect()} == {
        f"org/r{i}" for i in range(25)
    }


def test_replay_with_snapshot_mode(spark, tmp_root, capsys):
    """--snapshot-mode runs the full coordinator: initial snapshot of the
    parquet source, then the bounded replay, one command — and a re-run in
    mode=initial skips the snapshot phase (done_before)."""
    import json as _json

    src = spark.createDataFrame(
        [(f"org/s{i}", f"f{i}.py", "c0", "py", f"seed-{i}")
         for i in range(10)],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    path = os.path.join(tmp_root, "coord_src.parquet")
    src.write.parquet(path)
    root = os.path.join(tmp_root, "lake_coord")
    argv = ["replay", "--root", root, "--events", "1000",
            "--batch-size", "500", "--buckets", "4", "--keys", "50",
            "--snapshot-mode", "initial", "--snapshot-source", path]
    assert main(argv) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["snapshot"] is not None
    assert out1["replay"]["batches"] == 2

    # second start in mode=initial: progress exists -> no snapshot, no
    # replay work left
    assert main(argv) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["snapshot"] is None
    assert out2["replay"]["batches"] == 0
