"""spark-submit entry point.

Examples (cluster deployment is ``spark-submit --py-files sparkcdc.zip``;
local dev just runs python):

  # snapshot + bounded replay into a lake table
  python -m sparkcdc.cli replay --root /tmp/lake --events 1000000 \
      --batch-size 250000 --buckets 64

  # resume after interruption (picks up at the committed offset; fenced)
  python -m sparkcdc.cli replay --root /tmp/lake --events 2000000

  # continuous streaming mode
  python -m sparkcdc.cli stream --root /tmp/lake --rps 100000

  # table inspection
  python -m sparkcdc.cli describe --root /tmp/lake

  # ingest shipped wire-format lines (wal2json / mongo change streams /
  # LogMiner redo rows / SQL Server CDC change tables / Maxwell binlog
  # JSON), resuming at the table's committed offset
  python -m sparkcdc.cli ingest --root /tmp/lake --table events \
      --format wal2json --path /data/wal/*.jsonl \
      --fields user_id:long,event_type:string,value:double,props:string \
      --key user_id --source-table events

  # the full operational loop: bootstrap from a pinned source, tail the
  # log, watch progress
  python -m sparkcdc.cli snapshot --root /tmp/lake --table events \
      --path /data/initial.parquet --key user_id
  python -m sparkcdc.cli ingest --root /tmp/lake --table events \
      --format wal2json --path /data/wal/*.jsonl \
      --fields user_id:long,event_type:string,value:double,props:string \
      --key user_id --source-table events
  python -m sparkcdc.cli metrics --root /tmp/lake --table events

  # or both phases as one coordinator start (snapshot.mode semantics)
  python -m sparkcdc.cli replay --root /tmp/lake --events 1000000 \
      --snapshot-mode initial --snapshot-source /data/initial.parquet
"""

from __future__ import annotations

import argparse
import json
import sys

from .engine import EngineConfig, default_engine
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sparkcdc")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--root", required=True, help="lake root directory")
        sp.add_argument("--table", default="source_code_repos")
        sp.add_argument("--master", default=None)
        sp.add_argument("--buckets", type=int, default=64)
        sp.add_argument("--batch-size", type=int, default=1_000_000)
        sp.add_argument("--keys", type=int, default=100_000)
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument("--hot-key-permille", type=int, default=0)
        sp.add_argument("--salt-buckets", type=int, default=0)
        sp.add_argument("--commit-mode", default="mor", choices=["mor", "cow"])
        sp.add_argument("--compact-max-deltas", type=int, default=8)
        sp.add_argument(
            "--reduce-strategy", default="fat",
            choices=["fat", "narrow", "narrow_cached", "refetch"],
        )

    sp = sub.add_parser("replay", help="bounded replay of generated envelopes")
    common(sp)
    sp.add_argument("--events", type=int, required=True)
    sp.add_argument(
        "--snapshot-mode", default=None,
        choices=["always", "initial", "initial_only", "when_needed",
                 "no_data", "never", "recovery", "configuration_based"],
        help="run the full coordinator (doSnapshot -> streamEvents) in "
             "this snapshot mode instead of replay-only; modes that read "
             "data need --snapshot-source",
    )
    sp.add_argument("--snapshot-source", default=None,
                    help="parquet path snapshotted as the initial state "
                         "when --snapshot-mode wants a data phase")

    sp = sub.add_parser("stream", help="continuous rate-source streaming")
    common(sp)
    sp.add_argument("--rps", type=int, default=100_000)
    sp.add_argument("--seconds", type=int, default=0, help="0 = run until killed")

    sp = sub.add_parser("describe", help="print table manifest summary")
    sp.add_argument("--root", required=True)
    sp.add_argument("--table", default="source_code_repos")
    sp.add_argument("--master", default=None)

    sp = sub.add_parser(
        "compact", help="fold merge-on-read deltas into base files"
    )
    sp.add_argument("--root", required=True)
    sp.add_argument("--table", default="source_code_repos")
    sp.add_argument("--master", default=None)

    sp = sub.add_parser(
        "ingest",
        help="parse wire-format JSON lines (files) into envelopes and "
             "apply them to a lake table, resuming at the committed offset",
    )
    common(sp)
    from .sources.wire import WIRE_FORMATS

    sp.add_argument(
        "--format", required=True, dest="wire_format",
        choices=list(WIRE_FORMATS),
        help="wire shape of the input lines",
    )
    sp.add_argument("--path", required=True,
                    help="input file or glob of one-JSON-per-line records; "
                         "for --format pgoutput: a parquet file/dir of "
                         "(lsn string, xid long, data binary) slot rows "
                         "(the pg_logical_slot_peek_binary_changes shape)")
    sp.add_argument(
        "--fields", required=True,
        help="row fields as name:type,... (manifest type names, e.g. "
             "user_id:long,event_type:string,value:double,props:string)",
    )
    sp.add_argument("--key", required=True,
                    help="comma-joined key column(s); mongo uses the first "
                         "as the _id-mapped field")
    sp.add_argument("--source-table", default=None,
                    help="captured table/collection filter (include list)")
    sp.add_argument("--database", default=None,
                    help="database / schema-owner filter (maxwell database,"
                         " logminer seg_owner)")
    sp.add_argument("--failure-handling", default="skip",
                    choices=["skip", "fail"],
                    help="event.processing.failure.handling.mode at the "
                         "parse boundary")

    sp = sub.add_parser(
        "dedup-ingest",
        help="one-shot incremental dedup: dedupe a document batch against "
             "the persistent fingerprint index and append first-seen docs "
             "to the corpus table (resumable; fenced per --batch-id)",
    )
    sp.add_argument("--root", required=True, help="lake root directory")
    sp.add_argument("--master", default=None)
    sp.add_argument("--buckets", type=int, default=16)
    sp.add_argument("--path", required=True,
                    help="input docs: .parquet dir/file or JSON-lines")
    sp.add_argument("--json", action="store_true",
                    help="input is JSON lines (default: parquet)")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--batch-id", type=int, required=True,
                    help="monotone per-ingest fence token (redelivering a "
                         "committed batch id is a no-op)")
    sp.add_argument("--method", default="exact",
                    choices=["exact", "minhash"],
                    help="exact: fingerprint index; minhash: LSH band "
                         "index (near-duplicates also dropped)")

    sp = sub.add_parser(
        "snapshot",
        help="initial consistent snapshot (S1): read a pinned source "
             "(parquet or JSON-lines), wrap rows as op='r' envelopes and "
             "apply them as the table's first fenced batch; creates the "
             "sink table from the source schema when absent",
    )
    sp.add_argument("--root", required=True, help="lake root directory")
    sp.add_argument("--table", default="source_code_repos")
    sp.add_argument("--master", default=None)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--path", required=True,
                    help="source rows: .parquet dir/file or JSON-lines")
    sp.add_argument("--json", action="store_true",
                    help="input is JSON lines (default: parquet)")
    sp.add_argument("--key", default=None,
                    help="comma-joined key column(s); required when the "
                         "table does not exist yet")

    sp = sub.add_parser(
        "metrics",
        help="print the table's progress metrics, MXBean-shaped: snapshot "
             "phase (total/completed/remaining tables, rows scanned, "
             "current chunk), streaming status (ms-behind-source, batches, "
             "events seen) and cumulative throughput — read straight from "
             "the lineage log, no Spark session",
    )
    sp.add_argument("--root", required=True, help="lake root directory")
    sp.add_argument("--table", default="source_code_repos")

    sp = sub.add_parser(
        "properties",
        help="resolve a Debezium .properties file into the sparkcdc "
             "pipeline it configures (engine kwargs, transform chain, "
             "sink/serialization options) and print the plan as JSON — "
             "the dry-run for porting a reference deployment",
    )
    sp.add_argument("--file", required=True, help=".properties path")
    sp.add_argument("--no-strict", action="store_true",
                    help="collect unknown keys instead of failing")

    args = p.parse_args(argv)

    if args.cmd == "metrics":
        import os

        from .metrics import MetricsLog

        # the engine writes <root>/<table>/meta/metrics.jsonl (engine.py);
        # reading it needs no Spark session — this is the dashboard poll
        log = MetricsLog(
            os.path.join(args.root, args.table, "meta", "metrics.jsonl")
        )
        print(json.dumps({
            "snapshot": log.snapshot_progress(),
            "streaming": log.streaming_status(),
            "throughput": log.throughput(),
        }, indent=2))
        return 0

    if args.cmd == "properties":
        from .properties import pipeline_from_properties

        with open(args.file, encoding="utf-8") as fh:
            spec = pipeline_from_properties(
                fh.read(), strict=not args.no_strict)
        print(json.dumps({
            "engine_kwargs": spec.engine_kwargs,
            "transforms": spec.transform_specs,
            "table_include": spec.table_include,
            "table_exclude": spec.table_exclude,
            "message_key_columns": spec.message_key_columns,
            "incremental_chunk_size": spec.incremental_chunk_size,
            "failure_handling": spec.failure_handling,
            "converter_modes": spec.converter_modes,
            "serialization": spec.serialization,
            "sink": spec.sink,
            "topic": spec.topic,
            "passthrough": spec.passthrough,
            "unknown": spec.unknown,
        }, indent=2))
        return 0

    spark = get_spark("sparkcdc-cli", master=args.master)

    if args.cmd == "snapshot":
        from .engine import CdcEngine
        from .lake import LakeTable

        src = (spark.read.json(args.path) if args.json
               else spark.read.parquet(args.path))
        # source schema -> manifest field vocabulary, same mapping as
        # dedup-ingest (bigint -> long, ...)
        _SQL_TO_MANIFEST = {"bigint": "long", "smallint": "int",
                            "tinyint": "int", "real": "float"}
        fields = [
            (f.name,
             _SQL_TO_MANIFEST.get(f.dataType.simpleString(),
                                  f.dataType.simpleString()))
            for f in src.schema.fields
        ]
        if LakeTable.exists(args.root, args.table):
            table = LakeTable.load(spark, args.root, args.table)
        else:
            if not args.key:
                p.error("--key is required when creating a new table")
            table = LakeTable.create(
                spark, args.root, args.table, fields=fields,
                key_cols=args.key.split(","), n_buckets=args.buckets,
            )
        eng = CdcEngine(spark, table, EngineConfig())
        res = eng.run_snapshot(src)
        print(json.dumps({
            "version": res.get("version"), "skipped": res.get("skipped"),
            "rows": table.read().count(),
            "snapshot": eng.metrics.snapshot_progress(),
        }))
        return 0

    if args.cmd == "describe":
        from .lake import LakeTable

        t = LakeTable.load(spark, args.root, args.table)
        m = t.manifest()
        print(json.dumps({
            "version": m.version, "epoch": m.epoch,
            "fields": [f.to_json() for f in m.fields],
            "n_buckets": m.n_buckets, "key_cols": m.key_cols,
            "files": len(m.files), "deltas": t.delta_counts(m),
            "summary": m.summary,
        }, indent=2))
        return 0

    if args.cmd == "compact":
        from .lake import LakeTable

        t = LakeTable.load(spark, args.root, args.table)
        print(json.dumps(t.compact()))
        return 0

    if args.cmd == "dedup-ingest":
        from .lake import LakeTable
        from .pipeline.ingest_dedup import (
            IncrementalDeduper,
            IncrementalNearDeduper,
        )

        docs = (spark.read.json(args.path) if args.json
                else spark.read.parquet(args.path))
        # corpus fields derive from the batch frame; Spark simpleString
        # names map onto the manifest vocabulary (bigint -> long, ...)
        _SQL_TO_MANIFEST = {"bigint": "long", "smallint": "int",
                            "tinyint": "int", "real": "float"}
        corpus_fields = [
            (f.name,
             _SQL_TO_MANIFEST.get(f.dataType.simpleString(),
                                  f.dataType.simpleString()))
            for f in docs.schema.fields
        ]
        if LakeTable.exists(args.root, "corpus_docs"):
            corpus = LakeTable.load(spark, args.root, "corpus_docs")
        else:
            corpus = LakeTable.create(
                spark, args.root, "corpus_docs", fields=corpus_fields,
                key_cols=[], n_buckets=args.buckets,
            )
        cls = (IncrementalNearDeduper if args.method == "minhash"
               else IncrementalDeduper)
        ded = cls.create_or_load(spark, args.root, n_buckets=args.buckets)
        cols = [f.name for f in docs.schema.fields]
        fresh = ded.process_batch(
            docs, batch_id=args.batch_id,
            text_col=args.text_col, id_col=args.id_col,
            sink=lambda fr: corpus.append(
                fr.select(*cols), batch_id=args.batch_id,
                writer="dedup_ingest_cli",
            ),
        )
        print(json.dumps({
            "batch_id": args.batch_id,
            "input_rows": docs.count(),
            "admitted": fresh.count(),
            "corpus_rows": corpus.read().count(),
            "index_rows": ded.table.read().count(),
        }))
        return 0

    cfg = EngineConfig(
        batch_size=args.batch_size, n_keys=args.keys, seed=args.seed,
        hot_key_permille=args.hot_key_permille, salt_buckets=args.salt_buckets,
        commit_mode=args.commit_mode,
        compact_max_deltas=args.compact_max_deltas,
        reduce_strategy=args.reduce_strategy,
        **({"snapshot_mode": args.snapshot_mode}
           if getattr(args, "snapshot_mode", None) else {}),
    )

    if args.cmd == "ingest":
        import re

        from pyspark.sql import functions as F

        from .engine import CdcEngine
        from .lake import LakeTable, type_of
        from .sources.wire import parse_wire_lines

        # split on commas NOT inside parentheses: decimal(10,2) is a
        # type name type_of() supports and must survive the list split
        fields = [tuple(f.split(":", 1))
                  for f in re.split(r",(?![^(]*\))", args.fields)]
        row_fields = [(n, type_of(t)) for n, t in fields]
        key_cols = args.key.split(",")
        if LakeTable.exists(args.root, args.table):
            table = LakeTable.load(spark, args.root, args.table)
        else:
            table = LakeTable.create(
                spark, args.root, args.table, fields=fields,
                key_cols=key_cols, n_buckets=args.buckets,
            )
        eng = CdcEngine(spark, table, cfg)
        # pgoutput is a binary protocol landed as (lsn, xid, data bytea)
        # parquet rows (the pg_logical_slot_peek_binary_changes shape);
        # every other shipped format is one JSON/text line per record
        lines = (spark.read.parquet(args.path)
                 if args.wire_format == "pgoutput"
                 else spark.read.text(args.path))
        # ONE dispatch table shared with streaming.wire_envelope_stream;
        # n_parts = the engine's, so the committed per-partition offset
        # vector keys on the same hash granularity as every other writer
        env = parse_wire_lines(
            lines, args.wire_format, row_fields, key_cols,
            source_table=args.source_table, database=args.database,
            n_parts=cfg.n_parts, failure_handling=args.failure_handling,
        )
        committed = eng.committed_offset()
        # persist: the max-offset probe and the apply otherwise each
        # rerun the whole read+parse (+ the sqlserver pairing shuffle)
        env = env.filter(F.col("offset") >= committed).persist()
        try:
            mx = env.agg(F.max("offset")).first()[0]
            if mx is None:
                print(json.dumps({"applied": 0, "skipped": True,
                                  "committed": committed}))
                return 0
            # sqlserver offsets are COMMIT LSNs shared by every row of a
            # transaction, and a tailer can flush mid-transaction — so the
            # max-offset transaction may still be incomplete in this run's
            # files. Commit next = mx (not mx+1): the boundary transaction
            # is re-read next run — redelivery is idempotent through the
            # merge, and a later run that ships the missing rows refreshes
            # the net change. Per-event-offset formats keep the exact
            # exclusive watermark.
            nxt = int(mx) + (0 if args.wire_format == "sqlserver" else 1)
            res = eng._apply_batch(
                env, batch_id=eng.committed_batch() + 1, kind="replay",
                offsets={"lo": committed, "next": nxt},
            )
        finally:
            env.unpersist()
        print(json.dumps({
            "version": res.get("version"), "skipped": res.get("skipped"),
            "resumed_from": committed, "next_offset": nxt,
        }))
        return 0
    eng = default_engine(spark, args.root, name=args.table,
                         n_buckets=args.buckets, config=cfg)

    if args.cmd == "replay":
        if args.snapshot_mode:
            src = (spark.read.parquet(args.snapshot_source)
                   if args.snapshot_source else None)
            stats = eng.run(args.events, source_df=src)
        else:
            stats = eng.replay(args.events)
        print(json.dumps(stats))
        return 0

    if args.cmd == "stream":
        from .streaming import rate_envelope_stream, start_stream

        stream = rate_envelope_stream(eng, rows_per_second=args.rps)
        # checkpoint dir derives from the table root (stream_ckpt under
        # meta) so streaming batch ids — the fence tokens — survive
        # restarts; a fresh tempdir would reset them to 0 and the retained
        # fence would silently drop live batches
        q = start_stream(eng, stream)
        if args.seconds > 0:
            import time

            time.sleep(args.seconds)
            q.stop()
        else:
            q.awaitTermination()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
