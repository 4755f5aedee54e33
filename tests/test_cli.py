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
