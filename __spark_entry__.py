"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry exercises one operator family from SURVEY.md §2 (or
one training-data pipeline operator) through the real ``sparkcdc`` package
code, and — where ANSI-SQL can express the semantics — has an exact DuckDB
oracle in ``oracle_sql()`` with matching column names and types.

Output discipline (cross-engine value-hash safety): result columns are
ints and strings only — real-valued quantities are emitted as scaled
integers (``*_cents``, ``*_ppm``, ``*_e6``) computed with the identical
double-precision expression tree on both sides, so the bits match before
the round. Engine-level queries whose inputs come from the xxhash64-based
synthetic generator (not expressible in DuckDB) have no oracle entry →
rows-only check.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkcdc import apply as apply_mod
from sparkcdc import snapshot as snap_mod
from sparkcdc.engine import EngineConfig, default_engine
from sparkcdc.envelope import snapshot_events
from sparkcdc.functions.hashing import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    stable_hash_sql,
)
from sparkcdc.lake import LakeTable
from sparkcdc.pipeline import dedup as dd
from sparkcdc.pipeline import similarity as sim
from sparkcdc.pipeline.multimodal import decode_image_stub, frame_sample
from sparkcdc.pipeline.textstats import document_stats
from sparkcdc.sources import events_to_envelopes
from sparkcdc.transforms import (
    build_chain,
    by_logical_table_router,
    content_based_router,
    extract_changed_record_state,
    extract_new_record_state,
    mask_strings,
    outbox_event_router,
    partition_routing,
    reselect_columns,
    table_filter,
    truncate_columns,
)
from sparkcdc.transforms.filtering import drop_tombstones

EVENT_ROW_COLS = ["user_id", "event_type", "value", "props"]

#: normalized-text SQL (DuckDB side), mirroring functions.text.normalized
_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _env(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_to_envelopes(_t(spark, sf_dir, "events"))


def _wire_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events rows for the wire-format emitters. The sandbox events
    table is ONE small parquet file, so without intervention every wire
    parse runs as a single task — a bench artifact, not the production
    shape (a WAL/redo shipper produces many files; Kafka has many
    partitions, and the adapters are narrow-only so they inherit that
    parallelism 1:1). Restore it by repartitioning the COMPACT events
    rows BEFORE the emitter generates fat wire text: the shuffle moves
    ~2 MB of columnar events, not the generated JSON."""
    return _t(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )


def _cents(c) -> F.Column:
    return F.round(c * 100, 0).cast("long")


def _ppm(c) -> F.Column:
    return F.round(c * 1_000_000, 0).cast("long")


def _dup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ copies of the first 100 docs (id+10000) — a corpus with
    known duplicate groups for the dedup operators."""
    d = _t(spark, sf_dir, "documents")
    dups = d.filter(F.col("doc_id") < 100).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    return d.unionByName(dups)


_DUP_DOCS_SQL = (
    "SELECT * FROM documents UNION ALL "
    "SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars "
    "FROM documents WHERE doc_id < 100"
)


# ---------------------------------------------------------------------------
# CDC operator queries (events table as the change stream; SURVEY §2)
# ---------------------------------------------------------------------------


def q_cdc_lww_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 ReducedRecordBuffer: per-key last-write-wins reduction."""
    env = _env(spark, sf_dir)
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    red = apply_mod.reduce_last_write_wins(ch, ["user_id"])
    return red.select(
        "user_id",
        "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props",
        "_op",
    )


def q_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2 merge semantics: surviving rows after full replay (deletes
    applied)."""
    return q_cdc_lww_reduce(spark, sf_dir).filter(F.col("_op") != "d").drop("_op")


def q_cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read (the downstream-consumer surface): net
    per-key changes needed to move a checkpoint from offset max/2 to
    max. One hash aggregation computes both endpoint LWW states
    (max_by with a conditional ordering rides the same shuffle), so
    intra-window churn collapses and create+delete inside the window
    emits nothing."""
    env = _env(spark, sf_dir)
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    m = ch.agg(F.max("offset")).collect()[0][0]
    feed = apply_mod.change_feed(ch, ["user_id"], lo=m // 2, hi=m)
    return feed.select(
        "user_id",
        F.col("_change_op").alias("op"),
        "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props",
    )


def q_cdc_connect_smt_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka Connect common SMTs composed through the config-driven
    chain (InsertField → Cast → RegexRouter → ReplaceField), the way a
    production Debezium worker stacks them after flattening."""
    env = _env(spark, sf_dir)
    flat = env.filter(F.col("op") != "d").select(
        F.col("after.user_id").alias("user_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("offset"),
        F.concat(F.lit("srv.app."), F.col("after.event_type")).alias("route"),
    )
    chain = build_chain([
        {"type": "InsertField", "static_field": "src", "static_value": "cdc",
         "offset_field": "__offset"},
        {"type": "Cast", "spec": "user_id:string"},
        {"type": "RegexRouter", "regex": r"srv\.app\.(.*)",
         "replacement": "events_$1"},
        {"type": "ReplaceField", "exclude": ["offset"],
         "renames": "event_type:et"},
    ])
    return chain(flat)


def q_cdc_wal2json_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 Postgres WAL wire format: events → deterministic wal2json v2
    lines (the synthetic WAL-decoder output) → pure-Catalyst parse back
    into envelopes (from_json + map_from_entries, zero UDFs) → per-key
    LWW reduce. Offsets are pg LSNs ((hi<<32)|lo decoded from 'X/Y'
    text), so last_lsn proves the lsn codec roundtrips through the JSON
    wire. Must equal the LWW oracle computed straight from events."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.wal2json import (
        events_to_wal2json_lines,
        wal2json_to_envelopes,
    )

    lines = events_to_wal2json_lines(_wire_feed(spark, sf_dir))
    env = wal2json_to_envelopes(
        lines, EVENT_ROW_FIELDS, ["user_id"], table="events"
    )
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    red = apply_mod.reduce_last_write_wins(ch, ["user_id"])
    return red.select(
        "user_id",
        "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props",
        "_op",
        F.col("offset").alias("last_lsn"),
    )


def q_cdc_pgoutput_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 Postgres pgoutput (the server's BUILT-IN logical replication
    plugin, the reference's default decoder): events → deterministic
    binary slot frames (Relation/Begin/DML/Commit per the public
    protocol) → relation-registry collect + Arrow tuple decode +
    pure-Catalyst Begin-timestamp join → per-key LWW reduce. Offsets are
    pg LSNs, so last_lsn proves the binary wire roundtrips them."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.pgoutput import (
        events_to_pgoutput_frames,
        pgoutput_to_envelopes,
    )

    # pin the landing: the adapter scans it twice (registry collect +
    # decode) and the per-row python emitter is the expensive part
    frames = events_to_pgoutput_frames(
        _wire_feed(spark, sf_dir)
    ).localCheckpoint(eager=False)
    env = pgoutput_to_envelopes(
        frames, EVENT_ROW_FIELDS, ["user_id"], table="events"
    )
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    red = apply_mod.reduce_last_write_wins(ch, ["user_id"])
    return red.select(
        "user_id",
        "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props",
        "_op",
        F.col("offset").alias("last_lsn"),
    )


def q_cdc_mongo_changestream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 MongoDB change-stream wire format: events → deterministic
    change-stream documents (the synthetic watch() output, updateLookup
    shape) → pure-Catalyst parse back into envelopes (one typed
    from_json, zero UDFs) → per-key LWW reduce. Offsets pack the BSON
    clusterTime ((t<<32)|i), so last_cluster_pos proves the codec
    roundtrips through the JSON wire. Must equal the LWW oracle computed
    straight from events."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.mongo import (
        change_stream_to_envelopes,
        events_to_change_stream_docs,
    )

    docs = events_to_change_stream_docs(_wire_feed(spark, sf_dir))
    env = change_stream_to_envelopes(
        docs, EVENT_ROW_FIELDS, "user_id", collection="events"
    )
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    red = apply_mod.reduce_last_write_wins(ch, ["user_id"])
    return red.select(
        "user_id",
        "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props",
        "_op",
        F.col("offset").alias("last_cluster_pos"),
    )


def q_cdc_logical_message_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres logical decoding messages (pg_logical_emit_message →
    wal2json action "M"): parse message lines, filter by prefix channel,
    and decode the JSON content into typed rows — the
    DecodeLogicalDecodingMessageContent SMT as one Catalyst projection."""
    from sparkcdc.sources.wal2json import (
        decode_message_content,
        events_to_wal2json_message_lines,
        wal2json_messages,
    )

    lines = events_to_wal2json_message_lines(
        _wire_feed(spark, sf_dir), prefix="app.audit"
    )
    msgs = wal2json_messages(lines, prefix="app.audit")
    out = decode_message_content(
        msgs,
        "user_id bigint, event_type string, value double, props string",
    )
    return out.select(
        F.col("offset").alias("msg_offset"), "xid", "transactional",
        "prefix", "user_id", "event_type",
        _cents(F.col("value")).alias("value_cents"), "props",
    )


def q_cdc_mongo_delta_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-only Mongo capture (capture.mode=change_streams): updates
    carry ONLY updateDescription patches — folded into final state by the
    field-level LWW reduce (transforms/document.py), never needing
    post-images. Barrier rule: last insert/delete wins; patches after the
    live barrier apply per-field."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.mongo import events_to_change_stream_docs
    from sparkcdc.transforms.document import reduce_document_patches

    docs = events_to_change_stream_docs(
        _wire_feed(spark, sf_dir), capture_mode="delta"
    )
    out = reduce_document_patches(docs, EVENT_ROW_FIELDS, "user_id",
                                  collection="events")
    return out.select(
        "user_id", "event_type",
        _cents(F.col("value")).alias("value_cents"), "props",
    )


def q_cdc_logminer_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 Oracle LogMiner wire format: events → deterministic
    V$LOGMINER_CONTENTS rows (canonical single-row redo SQL) →
    pure-Catalyst parse back into envelopes (anchored regex atoms — a
    comma or 'where' inside a quoted value cannot split a match; zero
    UDFs) → per-key LWW reduce. The SCN is the offset (already 64-bit),
    so last_scn proves positions ride through the redo wire unchanged.
    Must equal the LWW oracle computed straight from events."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.logminer import (
        events_to_logminer_rows,
        logminer_to_envelopes,
    )

    rows = events_to_logminer_rows(_wire_feed(spark, sf_dir))
    env = logminer_to_envelopes(
        rows, EVENT_ROW_FIELDS, ["user_id"], table="EVENTS", owner="APP"
    )
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    red = apply_mod.reduce_last_write_wins(ch, ["user_id"])
    return red.select(
        "user_id",
        "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props",
        "_op",
        F.col("offset").alias("last_scn"),
    )


def q_cdc_sqlserver_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL Server CDC change-table wire format: events → deterministic
    change-table rows (updates ship as the reference's operation-3/4
    before/after pair sharing one seqval) → pure-Catalyst parse whose
    pairing is ONE hash aggregation per (commit LSN, key) instead of the
    reference's serial adjacency walk → per-key LWW reduce. The offset
    packs the 10-byte commit LSN into 63 bits ((vlf&0x7fff)<<48 |
    block<<16 | slot), so last_commit_lsn proves the codec roundtrips
    through the JSON wire: the emitter makes it exactly (0x25<<48) +
    event_id. Must equal the LWW oracle computed straight from events,
    with deleted keys masked to the key-only image deletes carry."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.sqlserver import (
        change_table_to_envelopes,
        events_to_change_table_rows,
    )

    rows = events_to_change_table_rows(_wire_feed(spark, sf_dir))
    env = change_table_to_envelopes(
        rows, EVENT_ROW_FIELDS, ["user_id"], capture_instance="dbo_events"
    )
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    red = apply_mod.reduce_last_write_wins(ch, ["user_id"])
    live = F.col("_op") != "d"
    return red.select(
        "user_id",
        F.when(live, F.col("event_type")).alias("event_type"),
        F.when(live, _cents(F.col("value"))).alias("value_cents"),
        F.when(live, F.col("props")).alias("props"),
        "_op",
        F.col("offset").alias("last_commit_lsn"),
    )


def q_cdc_maxwell_binlog_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL binlog wire format (Maxwell JSON lines): events →
    deterministic Maxwell lines (update ``old`` carries ONLY the changed
    column, so the parse must presence-merge the before-image from
    data+old) → pure-Catalyst parse back into envelopes (typed from_json
    plus a map re-parse for old-key presence, zero UDFs, no shuffle) →
    per-key LWW reduce. The offset packs the binlog (file-suffix, pos)
    pair ((suffix<<32)|pos, files rotate every 2^20 events in the
    emitter), so last_binlog_pos proves the codec roundtrips through the
    JSON wire. Deleted keys mask to key-only images: Maxwell ships the
    full deleted row in ``data`` but the oracle's delete carries no
    payload. Must equal the LWW oracle computed straight from events."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.maxwell import (
        events_to_maxwell_lines,
        maxwell_to_envelopes,
    )

    lines = events_to_maxwell_lines(_wire_feed(spark, sf_dir))
    env = maxwell_to_envelopes(
        lines, EVENT_ROW_FIELDS, ["user_id"], database="app", table="events"
    )
    ch = apply_mod.envelopes_to_changes(env, EVENT_ROW_COLS)
    red = apply_mod.reduce_last_write_wins(ch, ["user_id"])
    live = F.col("_op") != "d"
    return red.select(
        "user_id",
        F.when(live, F.col("event_type")).alias("event_type"),
        F.when(live, _cents(F.col("value"))).alias("value_cents"),
        F.when(live, F.col("props")).alias("props"),
        "_op",
        F.col("offset").alias("last_binlog_pos"),
    )


def q_cdc_extract_new_record_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 ExtractNewRecordState, rewrite mode + add.fields."""
    env = _env(spark, sf_dir)
    flat = extract_new_record_state(
        "rewrite", add_fields=["op", "ts_ms", "source.pos"]
    )(env)
    return flat.select(
        "user_id",
        "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props",
        "__op",
        "__ts_ms",
        "__source_pos",
        "__deleted",
    )


def q_cdc_extract_changed_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 ExtractChangedRecordState: changed-field lists on update envelopes
    whose before-image is the previous per-key row (lag)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    with_prev = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.lag("event_type").over(w).alias("p_et"),
        F.lag("value").over(w).alias("p_v"),
        F.lag("props").over(w).alias("p_p"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") > 1)
    env = with_prev.select(
        F.lit("u").alias("op"),
        F.struct(
            F.col("user_id").alias("user_id"),
            F.col("p_et").alias("event_type"),
            F.col("p_v").alias("value"),
            F.col("p_p").alias("props"),
        ).alias("before"),
        F.struct(
            F.col("user_id").alias("user_id"),
            F.col("event_type").alias("event_type"),
            F.col("value").alias("value"),
            F.col("props").alias("props"),
        ).alias("after"),
        F.col("event_id"),
        F.col("user_id").alias("uid"),
    )
    out = extract_changed_record_state()(env)
    return out.select(
        F.col("event_id"),
        F.col("uid").alias("user_id"),
        F.array_join(F.col("__changed"), ",").alias("changed_csv"),
    )


def q_cdc_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4/EventDispatcher tombstones: emit one tombstone per delete, then
    drop them pre-merge; op counts prove the accounting."""
    env = _env(spark, sf_dir)
    tomb = env.filter(F.col("op") == "d").withColumn(
        "tombstone", F.lit(True)
    ).withColumn("before", F.lit(None).cast(env.schema["before"].dataType)).withColumn(
        "after", F.lit(None).cast(env.schema["after"].dataType)
    )
    with_tombs = env.unionByName(tomb)
    kept = drop_tombstones()(with_tombs)
    return kept.groupBy("op").agg(F.count(F.lit(1)).alias("n"))


def q_cdc_mask_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 MaskStrings (salted sha256) + T13 TruncateColumn."""
    env = _env(spark, sf_dir)
    flat = extract_new_record_state("drop", add_fields=["source.pos"])(env)
    masked = mask_strings(["props"], salt="s3cr3t")(flat)
    out = truncate_columns({"event_type": 4})(masked)
    return out.select(
        F.col("__source_pos").alias("event_id"),
        "user_id",
        "event_type",
        "props",
    )


def q_cdc_properties_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 configuration surface: a verbatim Debezium ``.properties``
    text (EmbeddedEngineConfig / Transformations.java names, including the
    LEGACY delete.handling.mode + drop.tombstones pair and connector-side
    column.mask/truncate rules) resolves into the full transform chain via
    sparkcdc.properties — same flat config a reference deployment runs."""
    from sparkcdc.properties import pipeline_from_properties

    spec = pipeline_from_properties("""
name=app-connector
connector.class=io.debezium.connector.mysql.MySqlConnector
database.hostname=mysql
database.port=3306
topic.prefix=app
table.include.list=app.events
tombstones.on.delete=false
column.mask.hash.SHA-256.with.salt.s3cr3t=props
column.truncate.to.4.chars=event_type
transforms=unwrap,filt
transforms.unwrap.type=io.debezium.transforms.ExtractNewRecordState
transforms.unwrap.delete.handling.mode=rewrite
transforms.unwrap.drop.tombstones=true
transforms.unwrap.add.fields=op,source.pos
transforms.filt.type=io.debezium.transforms.Filter
transforms.filt.condition=user_id % 7 != 3
""")
    flat = spec.chain()(_env(spark, sf_dir))
    return flat.select(
        F.col("__source_pos").alias("event_id"),
        "user_id",
        "event_type",
        "props",
        "__op",
        "__deleted",
    )


def q_cdc_content_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 ContentBasedRouter: destination computed from record content."""
    env = _env(spark, sf_dir)
    routed = content_based_router(
        "concat('t.', coalesce(after.event_type, 'del'))"
    )(env)
    return routed.groupBy(F.col("__route").alias("route")).agg(
        F.count(F.lit(1)).alias("n")
    )


def q_cdc_logical_table_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 ByLogicalTableRouter: merge shard tables into one logical route,
    keeping the physical id as an extra key column."""
    env = _env(spark, sf_dir).withColumn(
        "source",
        F.col("source").withField(
            "table",
            F.concat(F.lit("events_shard_"), F.pmod(F.col("part_id"), F.lit(4))),
        ),
    )
    routed = by_logical_table_router(
        r"(.*)\.events_shard_\d+", r"$1.events_all"
    )(env)
    return routed.groupBy(
        F.col("__route").alias("route"),
        F.col("__dbz__physicalTableIdentifier").alias("physical"),
    ).agg(F.count(F.lit(1)).alias("n"))


def q_cdc_partition_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 PartitionRouting: part = pmod(stable_hash(payload fields), N)."""
    env = _env(spark, sf_dir)
    flat = extract_new_record_state("rewrite")(env)
    routed = partition_routing(["user_id"], 16, partition_col="part", hash_mode="stable")(
        flat
    )
    return routed.groupBy("part").agg(F.count(F.lit(1)).alias("n"))


def q_cdc_outbox_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 Outbox EventRouter over an outbox-shaped projection of events."""
    ev = _t(spark, sf_dir, "events")
    outbox = ev.select(
        F.col("user_id").alias("aggregateid"),
        F.col("event_type").alias("type"),
        F.col("props").alias("payload"),
        F.lit("user").alias("aggregatetype"),
        F.col("event_id"),
    )
    routed = outbox_event_router()(outbox)
    return routed.select(
        F.col("key"),
        F.col("event_type"),
        F.get_json_object(F.col("payload"), "$.k").cast("long").alias("payload_k"),
        F.col("__route").alias("route"),
    )


def q_cdc_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 TimezoneConverter: UTC source timestamps rendered in a target TZ
    (DST-correct via IANA rules)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format(
            F.from_utc_timestamp(F.col("ts"), "America/New_York"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("ts_nyc"),
    )


def q_cdc_kafka_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped source adapter (sources/kafka.py): envelopes serialized
    onto a Kafka-record-shaped frame (value JSON; partition = user_id%2;
    offset = dense per-partition row number ordered by event_id) and parsed
    back through envelopes_from_kafka — the transport position must
    override the payload's. Oracle recomputes the same layout with a SQL
    window. Reference: the per-(topic,partition,offset) consumer contract
    of SURVEY §3.2 / KafkaSignalChannel.java:36."""
    from pyspark.sql import Window

    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.sources.kafka import TopicPartitionCodec, envelopes_from_kafka

    env = _env(spark, sf_dir)
    kafka_part = (F.col("part_id") % 2).cast("int")
    w = Window.partitionBy(kafka_part).orderBy("offset")
    raw = env.withColumn(
        "__v", F.to_json(F.struct(*[F.col(c) for c in env.columns]))
    ).select(
        F.col("__v").cast("binary").alias("value"),
        F.lit(None).cast("binary").alias("key"),
        F.lit("app.events").alias("topic"),
        kafka_part.alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
    )
    codec = TopicPartitionCodec(("app.events",), stride=100)
    out = envelopes_from_kafka(raw, codec, EVENT_ROW_FIELDS)
    return out.select(
        F.col("op"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias("user_id"),
        F.col("source.pos").alias("pos"),
        F.col("part_id").alias("kafka_part"),
        F.col("offset").alias("kafka_offset"),
    )


def q_cdc_timezone_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 TimezoneConverter include-list scoping
    (core/transforms/TimezoneConverter.java:67): only rows whose
    source.table matches the rule convert; everything else passes through
    unchanged. Envelopes are routed to two logical tables by user parity."""
    from sparkcdc.transforms.columns import timezone_converter

    ev = _t(spark, sf_dir, "events")
    env = _env(spark, sf_dir)
    # carry the raw event timestamp as a row field and split the stream
    # across two logical source tables by user parity
    ts = ev.select(F.col("event_id").alias("offset"),
                   F.col("ts").cast("timestamp").alias("__ts"))
    work = env.join(ts, "offset").withColumn(
        "after",
        F.when(F.col("after").isNotNull(),
               F.col("after").withField("ts", F.col("__ts"))),
    ).withColumn(
        "before",
        F.when(F.col("before").isNotNull(),
               F.col("before").withField("ts", F.col("__ts"))),
    ).withColumn(
        "source",
        F.col("source").withField(
            "table",
            F.concat(F.lit("events_"),
                     (F.coalesce(F.col("after.user_id"),
                                 F.col("before.user_id")) % 2).cast("string")),
        ),
    ).drop("__ts")
    out = timezone_converter(
        "America/New_York", ["ts"], include=["source:events_0:ts"],
    )(work)
    return out.select(
        F.col("offset"),
        F.col("source.table").alias("src_table"),
        F.date_format(
            F.coalesce(F.col("after.ts"), F.col("before.ts")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("ts_out"),
    )


def q_cdc_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/S12 incremental snapshot: backfill minus keys changed in the
    watermark window [5000, 10000) — the window-dedup anti-join."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("name")
    )
    env = _env(spark, sf_dir)
    out = snap_mod.incremental_snapshot(
        cust, env, ["user_id"], window_lo=5000, window_hi=10000
    )
    return out.select("user_id", "name")


def q_cdc_chunk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 keyset-paginated chunk query."""
    orders = _t(spark, sf_dir, "orders")
    chunk = snap_mod.chunk_query(orders, ["o_orderkey"], (1000,), 500)
    return chunk.select(
        "o_orderkey",
        _cents(F.col("o_totalprice")).alias("total_cents"),
        "o_orderpriority",
    )


def q_cdc_offsets_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6/S14 offset bookkeeping: per-partition high-water offset + count
    (the per-micro-batch lineage row)."""
    env = _env(spark, sf_dir)
    return env.groupBy("part_id").agg(
        F.max("offset").alias("last_offset"), F.count(F.lit(1)).alias("n_events")
    )


def q_cdc_tx_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 transaction metadata through the engine component
    (sparkcdc.txmetadata, TransactionMonitor.java:31-117): BEGIN/END
    marker rows per 100-event commit batch, END carrying event and
    collection counts. Collections are routed by event_type so the count
    is non-trivial (the adapter's single source table would always be 1)."""
    from sparkcdc.txmetadata import transaction_markers

    env = _env(spark, sf_dir).withColumn(
        "source",
        F.col("source").withField(
            "table", F.coalesce(F.col("after.event_type"), F.lit("__deleted"))
        ),
    )
    out = transaction_markers(env)
    return out.select(
        F.col("tx_id").cast("long").alias("tx_id"),
        "status", "event_count", "n_collections",
        "first_offset", "last_offset", "ts_ms",
    )


def q_cdc_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14 table include-list regex (entire-identifier match)."""
    env = _env(spark, sf_dir).withColumn(
        "source",
        F.col("source").withField(
            "table",
            F.concat(F.lit("events_shard_"), F.pmod(F.col("part_id"), F.lit(4))),
        ),
    )
    kept = table_filter(include=[r"app\.events_shard_[01]"])(env)
    return kept.groupBy(
        F.col("source.table").alias("table")
    ).agg(F.count(F.lit(1)).alias("n"))


def q_cdc_reselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15 ReselectColumnsPostProcessor: fill unavailable (TOAST-style)
    columns from current sink state via a lookup join."""
    ev = _t(spark, sf_dir, "events")
    current = apply_mod.reduce_last_write_wins(
        ev.select("user_id", "props", F.col("event_id").alias("offset")),
        ["user_id"],
    ).select("user_id", "props")
    changes = ev.filter(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        F.lit("__debezium_unavailable_value").alias("props"),
    )
    out = reselect_columns(current, ["user_id"], ["props"])(changes)
    return out.select("event_id", "user_id", "props")


# ---------------------------------------------------------------------------
# Engine-level queries, driven from the `events` parquet through the REAL
# engine path (MOR deltas, compaction, fencing, schema history) so DuckDB
# can compute the expected final state — these upgrade the core loop from
# rows-only to full oracle checks.
# ---------------------------------------------------------------------------

EVENT_TABLE_FIELDS = [
    ("user_id", "long"), ("event_type", "string"),
    ("value", "double"), ("props", "string"),
]


def _event_engine(spark: SparkSession, prefix: str, n_buckets: int = 8,
                  **cfg) -> "CdcEngine":
    from sparkcdc.engine import CdcEngine

    root = tempfile.mkdtemp(prefix=prefix)
    t = LakeTable.create(
        spark, root, "t", fields=EVENT_TABLE_FIELDS,
        key_cols=["user_id"], n_buckets=n_buckets,
    )
    return CdcEngine(spark, t, EngineConfig(n_parts=8, **cfg))


def q_cdc_replay_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M2 end-to-end: replay the events change stream through the real
    engine (reduce → MOR delta commits → auto-compaction → offset commit),
    in two batches plus a REDELIVERY of batch 0 that must be fenced to a
    no-op; return the final table state. The DuckDB oracle computes the
    same state with one window query — a hash match proves merge
    semantics, delete handling, fencing, and MOR reconciliation at once."""
    eng = _event_engine(spark, "sparkcdc_q_replay_",
                        commit_mode="mor", compact_max_deltas=2)
    env = _env(spark, sf_dir)
    hi = env.agg(F.max("offset")).first()[0] + 1
    mid = hi // 2
    b1 = env.filter(F.col("offset") < mid)
    b2 = env.filter(F.col("offset") >= mid)
    eng._apply_batch(b1, batch_id=0, kind="replay",
                     offsets={"lo": 0, "next": mid})
    eng._apply_batch(b2, batch_id=1, kind="replay",
                     offsets={"lo": mid, "next": hi})
    # redelivered batch: the (writer, batch_id) fence makes it a no-op —
    # if it were applied, stale batch-0 winners would overwrite batch-1
    # rows and the oracle hash would mismatch
    eng._apply_batch(b1, batch_id=0, kind="replay",
                     offsets={"lo": 0, "next": mid})
    return eng.table.read().select(
        "user_id", "event_type",
        _cents(F.col("value")).alias("value_cents"), "props",
    )


def q_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 mid-stream evolution on the live engine path: batch 1 applies
    under the original schema; then rename event_type→etype (field-id
    mapped) + add props_sha; batch 2 applies under the new schema with
    props_sha = sha256(props). Old-epoch files and old-epoch winners read
    back through the new schema. The oracle reproduces the final state:
    etype always present (rename is metadata-only), props_sha only for
    keys whose winning event arrived after the evolution."""
    from sparkcdc.sources.events_adapter import events_to_envelopes

    eng = _event_engine(spark, "sparkcdc_q_evolve_")
    ev = _t(spark, sf_dir, "events")
    mid = ev.agg(F.max("event_id")).first()[0] // 2
    env1 = events_to_envelopes(ev.filter(F.col("event_id") <= mid))
    eng._apply_batch(env1, batch_id=0, kind="replay",
                     offsets={"lo": 0, "next": mid + 1})
    eng.table.evolve([
        {"action": "rename", "from": "event_type", "to": "etype"},
        {"action": "add", "name": "props_sha", "type": "string"},
    ])
    # batch 2 carries the POST-evolution schema: etype + props_sha
    ev2 = ev.filter(F.col("event_id") > mid).select(
        "event_id", "ts", "user_id",
        F.col("event_type"), F.col("value"),
        F.sha2(F.col("props"), 256).alias("props"),
    )
    env2 = events_to_envelopes(ev2)
    env2 = env2.select(
        "op", "ts_ms",
        F.col("before").withField("etype", F.col("before.event_type"))
        .withField("props_sha", F.col("before.props"))
        .dropFields("event_type", "props").alias("before"),
        F.col("after").withField("etype", F.col("after.event_type"))
        .withField("props_sha", F.col("after.props"))
        .dropFields("event_type", "props").alias("after"),
        "source", "transaction", "part_id", "offset", "tombstone",
    )
    eng._apply_batch(env2, batch_id=1, kind="replay",
                     offsets={"lo": mid + 1, "next": 2 * mid})
    return eng.table.read().select(
        "user_id", "etype", _cents(F.col("value")).alias("value_cents"),
        "props_sha",
    )


def q_cdc_resume_fencing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 resume + exactly-once: apply the stream, then re-open the table
    from disk as a NEW engine (crash-restart analog) — the resume point
    must equal the committed offset and a replay to the same target must
    run zero batches; the surviving state must equal a single clean apply.
    Result columns carry the per-key state + the probe outcomes, all
    oracle-reproducible."""
    eng = _event_engine(spark, "sparkcdc_q_fence_", commit_mode="mor")
    env = _env(spark, sf_dir)
    hi = env.agg(F.max("offset")).first()[0] + 1
    eng._apply_batch(env, batch_id=0, kind="replay",
                     offsets={"lo": 0, "next": hi})
    # crash-restart: fresh engine over the same on-disk table
    from sparkcdc.engine import CdcEngine
    from sparkcdc.lake import LakeTable as LT

    eng2 = CdcEngine(spark, LT.load(spark, eng.table.root, "t"),
                     EngineConfig(n_parts=8))
    resumed_ok = eng2.committed_offset() == hi
    redelivery = eng2._apply_batch(env, batch_id=0, kind="replay",
                                   offsets={"lo": 0, "next": hi})
    return eng2.table.read().select(
        "user_id", "event_type",
        _cents(F.col("value")).alias("value_cents"),
        F.lit(bool(resumed_ok)).alias("resumed_at_committed"),
        F.lit(bool(redelivery.get("skipped", False))).alias("replay_fenced"),
    )


def q_cdc_chunked_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+S10 chunked RESUMABLE incremental snapshot through the real
    engine: backfill the customer table in keyset-paginated chunks while
    deduping against the change window [5000, 10000), KILLED after 2
    chunks (max_chunks) and resumed by a fresh engine from the
    checkpointed last_key. Final state must equal the one-shot backfill
    semantics (the cdc_incremental_snapshot oracle) with both probe flags
    true: resumed mid-backfill, and completed."""
    from sparkcdc.engine import CdcEngine
    from sparkcdc.lake import LakeTable as LT

    root = tempfile.mkdtemp(prefix="sparkcdc_q_chunked_")
    t = LakeTable.create(
        spark, root, "t",
        fields=[("user_id", "long"), ("name", "string")],
        key_cols=["user_id"], n_buckets=8,
    )
    cfg = EngineConfig(n_parts=8)
    eng = CdcEngine(spark, t, cfg)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("name")
    )
    window = _env(spark, sf_dir).filter(
        (F.col("offset") >= 5000) & (F.col("offset") < 10000)
    )
    # 5 chunks at ANY sf so the max_chunks=2 kill always lands mid-backfill
    chunk = max(1, cust.count() // 5)
    partial = eng.run_incremental_snapshot(
        cust, 5000, 10000, stream_window=window,
        chunk_size=chunk, max_chunks=2,
    )
    # crash-restart: fresh engine resumes at the checkpoint, not chunk 0
    eng2 = CdcEngine(spark, LT.load(spark, root, "t"), cfg)
    finish = eng2.run_incremental_snapshot(
        cust, 5000, 10000, stream_window=window, chunk_size=chunk,
    )
    resumed_mid = (
        not partial["done"] and finish["resumed_from"] is not None
    )
    return eng2.table.read().select(
        "user_id", "name",
        F.lit(bool(resumed_mid)).alias("resumed_mid_backfill"),
        F.lit(bool(finish["done"])).alias("backfill_completed"),
    )


def q_cdc_range_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 chunked backfill, ``chunk_mode='range'``: the Spark-first chunk
    planner for UNSORTED sources — ONE repartitionByRange staging pass
    (Spark's RangePartitioner IS the chunk planner), then per-chunk
    partition-pruned commits, vs the reference's keyset pagination
    (AbstractChunkQueryBuilder.java:48-170) which assumes a key-clustered
    source. Same kill-after-2-chunks + fresh-engine resume protocol as
    cdc_chunked_backfill, dedup window [2000, 8000); the resume must reuse
    the staged dirs (resumed_from = the checkpointed chunk_idx) and the
    final state must equal the one-shot backfill semantics."""
    from sparkcdc.engine import CdcEngine
    from sparkcdc.lake import LakeTable as LT

    root = tempfile.mkdtemp(prefix="sparkcdc_q_rangebf_")
    t = LakeTable.create(
        spark, root, "t",
        fields=[("user_id", "long"), ("name", "string")],
        key_cols=["user_id"], n_buckets=8,
    )
    cfg = EngineConfig(n_parts=8)
    eng = CdcEngine(spark, t, cfg)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("name")
    )
    window = _env(spark, sf_dir).filter(
        (F.col("offset") >= 2000) & (F.col("offset") < 8000)
    )
    # 5 chunks at ANY sf so the max_chunks=2 kill always lands mid-backfill
    chunk = max(1, cust.count() // 5)
    partial = eng.run_incremental_snapshot(
        cust, 2000, 8000, stream_window=window,
        chunk_size=chunk, max_chunks=2, chunk_mode="range",
    )
    eng2 = CdcEngine(spark, LT.load(spark, root, "t"), cfg)
    finish = eng2.run_incremental_snapshot(
        cust, 2000, 8000, stream_window=window, chunk_size=chunk,
        chunk_mode="range",
    )
    resumed_mid = (
        not partial["done"] and finish["resumed_from"] is not None
    )
    return eng2.table.read().select(
        "user_id", "name",
        F.lit(bool(resumed_mid)).alias("resumed_mid_backfill"),
        F.lit(bool(finish["done"])).alias("backfill_completed"),
    )


def q_cdc_blocking_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13+S4 blocking snapshot via the signal control plane
    (ExecuteSnapshot.java:82 type=BLOCKING + AdditionalCondition.java:24):
    an execute-snapshot signal with ``type: blocking`` and two
    additional-conditions (one matching this table, one for another
    table that must NOT apply) arrives on the file channel; the engine
    re-snapshots the condition-filtered source as a full run_snapshot.
    Result = the customers the matching filter admits."""
    import json as _json

    from sparkcdc.engine import CdcEngine
    from sparkcdc.signals import FileSignalChannel, SignalProcessor

    root = tempfile.mkdtemp(prefix="sparkcdc_q_blocking_")
    t = LakeTable.create(
        spark, root, "t",
        fields=[("user_id", "long"), ("name", "string"),
                ("balance_cents", "long")],
        key_cols=["user_id"], n_buckets=8,
    )
    sig_path = os.path.join(root, "signals.jsonl")
    with open(sig_path, "w") as fh:
        fh.write(_json.dumps({
            "id": "blk-1", "type": "execute-snapshot",
            "data": {
                "type": "blocking",
                "data-collections": ["t"],
                "additional-conditions": [
                    {"data-collection": "t",
                     "filter": "balance_cents >= 500000"},
                    {"data-collection": "unrelated",
                     "filter": "balance_cents < 0"},
                ],
            }}) + "\n")
    eng = CdcEngine(spark, t, EngineConfig(n_parts=8),
                    signal_processor=SignalProcessor(
                        [FileSignalChannel(sig_path)]))
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("name"),
        # explicit round before the cast: Spark's long cast truncates
        # while DuckDB's rounds — round() on both sides pins the value
        F.round(F.col("c_acctbal") * 100).cast("long").alias("balance_cents"),
    )
    eng.process_signals(source_for_snapshot=lambda req: cust)
    return eng.table.read().select("user_id", "name", "balance_cents")


# ---------------------------------------------------------------------------
# Training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dup_documents(spark, sf_dir)
    return dd.exact_duplicates(corpus)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dd.minhash_lsh_candidates(docs, num_hashes=16, band_size=4)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash(docs, bits=32)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dup_documents(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(corpus, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", _ppm(F.col("jaccard")).alias("jaccard_ppm")
    )


def q_dedup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022, k-token window form):
    per-doc counts of k-windows that recur corpus-wide. The duplicated
    corpus makes the first 100 docs (and their copies) fully duplicated;
    self-repetition inside ordinary docs also registers."""
    # the sandbox table is ONE parquet file -> the window explode would
    # run as a single task; repartition the compact doc rows first (same
    # artifact-fix as _wire_feed — production corpora have many files)
    corpus = _dup_documents(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return dd.duplicate_span_stats(corpus, k=5, fast=True)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via banded sign-LSH candidates (two 4-plane
    bands; a pair is a candidate if either band matches) + exact cosine
    verify — the sub-quadratic scale path (all-pairs is O(n²): measured
    81 s at sf0.1 vs ~2 s here)."""
    emb = _t(spark, sf_dir, "embeddings")
    b0 = sim.hyperplane_lsh_buckets(emb, n_planes=4, dim=64)
    b1 = sim.hyperplane_lsh_buckets(emb, n_planes=8, dim=64).select(
        "id", F.expr("shiftright(bucket, 4)").alias("bucket")
    )
    cand = None
    for b in (b0, b1):
        a = b.alias("a")
        c = b.alias("c")
        p = a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.id") < F.col("c.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"))
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    pairs = dd.embedding_near_duplicates(emb, threshold=0.3, candidates=cand)
    return pairs.select("id_a", "id_b", _ppm(F.col("cos")).alias("cos_ppm"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster grouping: near-dup PAIRS (the q_dedup_embedding
    pipeline, sign-LSH candidates + exact cosine >= 0.3) folded into
    connected components by iterative min-label propagation — the
    keep-one-per-cluster step of a dedup pipeline. The oracle computes
    the same components with a recursive CTE over the identical pair
    set."""
    emb = _t(spark, sf_dir, "embeddings")
    b0 = sim.hyperplane_lsh_buckets(emb, n_planes=4, dim=64)
    b1 = sim.hyperplane_lsh_buckets(emb, n_planes=8, dim=64).select(
        "id", F.expr("shiftright(bucket, 4)").alias("bucket")
    )
    cand = None
    for b in (b0, b1):
        a = b.alias("a")
        c = b.alias("c")
        p = a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.id") < F.col("c.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"))
        cand = p if cand is None else cand.unionByName(p)
    pairs = dd.embedding_near_duplicates(
        emb, threshold=0.3, candidates=cand.distinct()
    )
    return dd.duplicate_clusters(pairs).select("doc", "cluster")


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = sim.cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", _ppm(F.col("cos")).alias("cos_ppm")
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = sim.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4)
    return out.select(
        "query_id", "neighbor_id", "rank", _ppm(F.col("cos")).alias("cos_ppm")
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    st = document_stats(docs)
    return st.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("mean_word_len") * 100, 0).cast("long").alias("mwl_e2"),
        _ppm(F.col("stopword_ratio")).alias("stop_ppm"),
        _ppm(F.col("quality")).alias("quality_ppm"),
        "lang_pred",
        "fingerprint",
    )


def q_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_image_stub(docs)


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return frame_sample(docs, frame_bytes=16, every_k=4)


def q_ann_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing of embeddings (the scale path for near-dup
    candidate generation)."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.hyperplane_lsh_buckets(emb, n_planes=8, dim=64)


def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenization count per document."""
    from sparkcdc.functions.text import bpe_ish_token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", bpe_ish_token_count("text").alias("n_bpe_tokens")
    )


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII audit + redaction: deterministic PII is injected per doc
    (the synthetic corpus has none), then counted and redacted with chained
    builtin regexes — pure whole-stage-codegen map stage, no shuffle. The
    oracle re-runs the same chain in DuckDB's RE2, so a match proves the
    patterns behave identically across engines."""
    from sparkcdc.functions.text import pii_counts, pii_redact

    docs = _t(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com"),
            F.lit(" from 10.0."), F.pmod(F.col("doc_id"), F.lit(256)), F.lit(".17"),
            F.lit(" tel +1555"), (F.pmod(F.col("doc_id"), F.lit(10000)) + 1000000),
        ).alias("text"),
    )
    return salted.select(
        "doc_id",
        *pii_counts("text"),
        F.sha2(pii_redact("text"), 256).alias("redacted_sha"),
    )


def q_text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents laid end-to-end per shard and cut every
    2048 tokens (the concatenate-then-chunk step of LLM data prep). One
    shuffle on the derived shard, a prefix-sum window per shard, exact
    integer layout arithmetic — the full layout is verified by a SQL
    window-function oracle."""
    from sparkcdc.functions.text import bpe_ish_token_count
    from sparkcdc.pipeline.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", bpe_ish_token_count("text").alias("n_tok")
    )
    return pack_sequences(
        with_tokens, max_tokens=2048, tokens_col="n_tok",
        id_col="doc_id", n_shards=16,
    )


def q_cdc_predicate_gating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-Connect predicate gating end-to-end: a two-shard envelope
    stream with MaskStrings applied ONLY where TopicNameMatches one shard
    (transforms.X.predicate contract); rows of the other shard pass
    through unchanged. The oracle recomputes the salted mask with a SQL
    CASE over the same shard rule."""
    from sparkcdc.transforms import build_chain

    env = _env(spark, sf_dir).withColumn(
        "source",
        F.col("source").withField(
            "table",
            F.concat(
                F.lit("events_"),
                F.pmod(
                    F.coalesce(
                        F.col("after.user_id"), F.col("before.user_id")
                    ),
                    F.lit(2),
                ),
            ),
        ),
    )
    chain = build_chain([
        {
            "type": "MaskStrings", "columns": ["props"], "salt": "s3",
            "predicate": {
                "type": "TopicNameMatches", "pattern": r"app\.events_0",
            },
        },
    ])
    out = chain(env)
    return out.select(
        F.col("source.table").alias("shard"),
        "op",
        "offset",
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias(
            "user_id"
        ),
        F.col("after.props").alias("props"),
    )


def q_cdc_envelope_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16 serialization: envelope → JSON → vectorized from_json parse; the
    oracle recomputes the projected fields from the raw events, so a match
    proves the roundtrip is lossless for them."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.transforms import envelope_to_json, parse_envelope_json

    env = _env(spark, sf_dir)
    wire = envelope_to_json(env)
    back = parse_envelope_json(wire, EVENT_ROW_FIELDS)
    return back.select(
        F.col("op"),
        F.col("ts_ms"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias("user_id"),
        F.col("source.pos").alias("pos"),
        F.col("offset"),
    )


def q_cdc_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table capture (MultiTableEngine): one envelope stream routed
    by source.table into two shard sink tables (each with its own fence
    and offsets), read back as the union of both tables' final states."""
    from sparkcdc.engine import EngineConfig
    from sparkcdc.multitable import MultiTableEngine

    root = tempfile.mkdtemp(prefix="sparkcdc_q_mt_")
    tables = {
        f"app.events_{i}": LakeTable.create(
            spark, root, f"events_{i}", fields=EVENT_TABLE_FIELDS,
            key_cols=["user_id"], n_buckets=4,
        )
        for i in (0, 1)
    }
    mt = MultiTableEngine(spark, tables, EngineConfig(n_parts=8))
    env = _env(spark, sf_dir).withColumn(
        "source",
        F.col("source").withField(
            "table",
            F.concat(
                F.lit("events_"),
                F.pmod(
                    F.coalesce(F.col("after.user_id"), F.col("before.user_id")),
                    F.lit(2),
                ),
            ),
        ),
    )
    hi = env.agg(F.max("offset")).first()[0] + 1
    mt.apply_batch(env, batch_id=0, offsets={"lo": 0, "next": hi})
    parts = [
        mt.state(name).withColumn("shard", F.lit(name))
        for name in sorted(tables)
    ]
    out = parts[0].unionByName(parts[1])
    return out.select(
        "shard", "user_id", "event_type",
        _cents(F.col("value")).alias("value_cents"), "props",
    )


def q_cdc_envelope_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16 Avro binary wire format: envelope → Avro bytes (public-spec
    encoder, transforms.avro) → decode; the oracle recomputes the
    projected fields from raw events, so a match proves losslessness."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.transforms import envelope_to_avro, parse_envelope_avro

    env = _env(spark, sf_dir)
    back = parse_envelope_avro(
        envelope_to_avro(env, EVENT_ROW_FIELDS), EVENT_ROW_FIELDS
    )
    return back.select(
        F.col("op"),
        F.col("ts_ms"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias("user_id"),
        F.col("source.pos").alias("pos"),
        F.col("offset"),
    )


def q_cdc_envelope_cloudevents_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T16 CloudEvents with Avro-binary payload
    (CloudEventsConverter.java:89's non-JSON data format): envelope →
    Avro bytes → base64 data_base64 inside a CloudEvents 1.0 JSON
    envelope → parse both layers back. The oracle recomputes the
    projected fields from raw events, so a match proves the two-layer
    composition is lossless."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.transforms import envelope_to_cloudevents, parse_cloudevents

    env = _env(spark, sf_dir)
    wire = envelope_to_cloudevents(
        env, data_format="avro", row_fields=EVENT_ROW_FIELDS
    )
    back = parse_cloudevents(wire, EVENT_ROW_FIELDS, data_format="avro")
    return back.select(
        F.col("op"),
        F.col("ts_ms"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias("user_id"),
        F.col("source.pos").alias("pos"),
        F.col("offset"),
    )


def q_cdc_cloudevent_saveable_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConvertCloudEventToSaveableForm: CloudEvents JSON → one column per
    mapped attribute (fields.mapping syntax 'cefield:column'), data
    flattened to its JSON text; user_id re-extracted from the payload
    proves the data column carries the whole envelope."""
    from sparkcdc.transforms import envelope_to_cloudevents
    from sparkcdc.transforms.serialize import (
        convert_cloudevent_to_saveable_form,
    )

    wire = envelope_to_cloudevents(_env(spark, sf_dir))
    flat = convert_cloudevent_to_saveable_form(
        wire,
        ["id:ce_id", "source:ce_source", "type:ce_type", "data:payload"],
    )
    return flat.select(
        "ce_id", "ce_source", "ce_type",
        F.get_json_object("payload", "$.op").alias("op"),
        F.get_json_object("payload", "$.offset").cast("long").alias("offset"),
        F.coalesce(
            F.get_json_object("payload", "$.after.user_id"),
            F.get_json_object("payload", "$.before.user_id"),
        ).cast("long").alias("user_id"),
    )


def q_cdc_envelope_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16 proto3 wire format roundtrip (transforms.protobuf)."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.transforms import (
        envelope_to_protobuf,
        parse_envelope_protobuf,
    )

    env = _env(spark, sf_dir)
    back = parse_envelope_protobuf(
        envelope_to_protobuf(env, EVENT_ROW_FIELDS), EVENT_ROW_FIELDS
    )
    return back.select(
        F.col("op"),
        F.col("ts_ms"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias("user_id"),
        F.col("source.pos").alias("pos"),
        F.col("offset"),
    )


def q_cdc_envelope_cloudevents_proto_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T16 CloudEvents with proto3-binary payload — the converter's third
    data format (CloudEventsConverter.java:89 Json/Avro/Protobuf):
    envelope → proto3 bytes → base64 data_base64 inside a CloudEvents 1.0
    JSON envelope → parse both layers back. Oracle recomputes the
    projection from raw events, proving the two-layer composition is
    lossless."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.transforms import envelope_to_cloudevents, parse_cloudevents

    env = _env(spark, sf_dir)
    wire = envelope_to_cloudevents(
        env, data_format="protobuf", row_fields=EVENT_ROW_FIELDS
    )
    back = parse_cloudevents(wire, EVENT_ROW_FIELDS, data_format="protobuf")
    return back.select(
        F.col("op"),
        F.col("ts_ms"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias("user_id"),
        F.col("source.pos").alias("pos"),
        F.col("offset"),
    )


def q_cdc_envelope_connect_json_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T16 Kafka Connect JSON-with-schema (``schemas.enable=true`` — the
    reference's default JSON serialization, JsonConverter): envelope →
    {"schema": <Connect descriptor>, "payload": <envelope>} wire string →
    payload-typed ``from_json`` parse. Oracle recomputes the projection
    from raw events, proving the schema-bearing wrap is lossless."""
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.transforms import (
        envelope_to_connect_json,
        parse_connect_json,
    )

    env = _env(spark, sf_dir)
    wire = envelope_to_connect_json(env, row_fields=EVENT_ROW_FIELDS)
    back = parse_connect_json(wire, EVENT_ROW_FIELDS)
    return back.select(
        F.col("op"),
        F.col("ts_ms"),
        F.coalesce(F.col("after.user_id"), F.col("before.user_id")).alias("user_id"),
        F.col("source.pos").alias("pos"),
        F.col("offset"),
    )


def q_cdc_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 initial consistent snapshot: pinned table read → op='r' envelopes
    → flatten through the standard apply path."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
    )
    env = snapshot_events(
        cust, row_cols=["user_id", "name", "nation"], key_cols=["user_id"],
        table_name="customer", db_name="app",
    )
    ch = apply_mod.envelopes_to_changes(env, ["user_id", "name", "nation"])
    return ch.select("user_id", "name", "nation", "_op", "offset").withColumn(
        "snapshot_flag", F.lit("true")
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay of generated envelopes over the
    north-star source-code-repo table through reduce + MOR merge +
    auto-compaction; returns final state with the sha256 verification
    column (the north-rule invariant)."""
    root = tempfile.mkdtemp(prefix="sparkcdc_entry_")
    eng = default_engine(
        spark, root, n_buckets=8,
        config=EngineConfig(batch_size=10_000, n_keys=2_000, n_parts=8),
    )
    eng.replay(20_000)
    return eng.table.read().select(
        "repo", "path", "commit", "lang",
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


def q_curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the eval set is every 97th document;
    flag corpus docs sharing >= 2 distinct 3-gram shingles with any eval
    item. The eval shingle set is broadcast (plan-asserted in tests) —
    the corpus streams through a map-side join, never a doc-pair
    shuffle."""
    from sparkcdc.pipeline import curation as cu

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return cu.ngram_contamination(
        corpus, bench, bench_id_col="bench_id", n=3, min_hits=2
    )


def q_curation_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: per-document duplicate n-gram
    fractions for n=1,2,3 in exact ppm fixed point — a pure codegen
    projection, zero shuffles."""
    from sparkcdc.pipeline import curation as cu

    return cu.repetition_stats(_t(spark, sf_dir, "documents"), ns=(1, 2, 3))


def q_curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling: keep iff
    stable_hash64(seed, doc_id) % 1e6 < the language's ppm rate — the
    decision depends only on key bytes, so it reproduces across runs,
    engines, and repartitionings (df.sample can't promise any of that)."""
    from sparkcdc.pipeline import curation as cu

    docs = _t(spark, sf_dir, "documents")
    kept = cu.stratified_sample(
        docs,
        {"en": 250_000, "es": 500_000, "fr": 750_000, "de": 1_000_000},
        stratum_col="lang", key_cols=["doc_id"],
        default_ppm=100_000, seed="mix1",
    )
    return kept.select("doc_id", "lang", "source")


def q_curation_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning: one groupBy(source) token census →
    per-source keep rates hitting a 3k-token budget at fixed mixture
    weights (rates capped at keep-everything for undersized sources).
    Integer ppm fixed point end to end so the plan is engine-exact."""
    from sparkcdc.pipeline import curation as cu

    docs = _t(spark, sf_dir, "documents")
    return cu.mixture_rates(
        docs,
        {"src0": 300_000, "src1": 200_000, "src2": 150_000,
         "src3": 150_000, "src4": 100_000, "src5": 100_000},
        budget_tokens=3_000,
    )


def q_curation_quality_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-composed quality filter with reasons-as-data: every document
    gets its fixed-point signals, the comma-joined names of the rules it
    failed, and a keep boolean — so "why did we lose 40% of source X"
    is a groupBy(reasons), not a corpus re-read."""
    from sparkcdc.pipeline import curation as cu

    return cu.quality_verdicts(
        _t(spark, sf_dir, "documents"),
        min_tokens=30, max_tokens=80,
        max_dup_2gram_ppm=100_000,
        min_mwl_e2=300, max_mwl_e2=800,
    )


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb line-level dedup over the duplicated corpus: the
    word-soup docs carry no newlines, so segmentation uses fixed 10-word
    windows (``words_per_line=10``); every line seen in >= 2 distinct docs
    is dropped and the documents rewritten."""
    corpus = _dup_documents(spark, sf_dir)
    return dd.dedup_lines(corpus, words_per_line=10, min_docs=2)


def q_cdc_crdt_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-based PN-counter merge (core/crdt): per-partition cumulative
    count states derived from the event stream, with one partition's
    states REDELIVERED — the CRDT max-merge absorbs the duplicates and
    the read value equals the exact per-type event count."""
    from pyspark.sql import Window

    from sparkcdc.functions.crdt import merge_counter_states, pn_counter_value

    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type", F.pmod("user_id", F.lit(4)))
         .orderBy("event_id"))
    states = ev.select(
        F.col("event_type").alias("key"),
        F.pmod("user_id", F.lit(4)).cast("int").alias("replica"),
        F.row_number().over(w).cast("long").alias("adds"),
        F.lit(0).cast("long").alias("removes"),
    )
    redelivered = merge_counter_states(states, states.filter("replica = 0"))
    return pn_counter_value(redelivered, ["key"])


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time incremental dedup through a REAL fingerprint-index lake
    table: batch 1 (doc_id < 250), then batch 2 (the rest + exact copies of
    the first 100 docs) anti-joined against the committed index. Returns
    the final index — first-seen doc per fingerprint across batch order."""
    from sparkcdc.pipeline.ingest_dedup import IncrementalDeduper

    root = tempfile.mkdtemp(prefix="sparkcdc_q_ingest_dedup_")
    ded = IncrementalDeduper.create_or_load(spark, root, n_buckets=4)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250).unionByName(
        docs.filter(F.col("doc_id") < 100).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    ded.process_batch(b1, batch_id=1)
    ded.process_batch(b2, batch_id=2)
    return ded.table.read().select("fingerprint", "first_doc_id")


def q_dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time incremental NEAR-dedup through a persistent MinHash band
    index: batch 1 (doc_id < 250), then batch 2 (the rest + exact copies of
    the first 100 docs — every band collides, so all copies drop). Returns
    the final band index: every (band, band_sig) key registered by an
    admitted doc, labeled with the doc that registered it."""
    from sparkcdc.pipeline.ingest_dedup import IncrementalNearDeduper

    root = tempfile.mkdtemp(prefix="sparkcdc_q_ingest_neardedup_")
    ded = IncrementalNearDeduper.create_or_load(
        spark, root, n_buckets=4, fast=False,
        num_hashes=16, band_size=4, shingle_n=3,
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250).unionByName(
        docs.filter(F.col("doc_id") < 100).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    ded.process_batch(b1, batch_id=1)
    ded.process_batch(b2, batch_id=2)
    return ded.table.read().select("band", "band_sig", "first_doc_id")


def q_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: IVF-cell-scoped semantic dedup — cluster by the seeded
    centroids, drop any vector with a lower-id cell-mate at cosine >= 0.3,
    keep one representative per near-dup group."""
    emb = _t(spark, sf_dir, "embeddings")
    return dd.semdedup(emb, n_cells=16, threshold=0.3)


def q_curation_word_rank_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style statistical quality proxy: mean log word-frequency-rank
    per document against the corpus-derived frequency vocabulary
    (broadcast-joined). Low = natural common-word text, high = rare or
    garbled vocabulary."""
    from sparkcdc.pipeline import curation as cu

    return cu.word_rank_score(_t(spark, sf_dir, "documents"))


def q_cdc_scalar_converters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.3/§2.7 scalar converter registry (JdbcValueConverters.java:154-267
    dispatch table): unsigned widening, decimal handling modes, adaptive
    temporal precisions (epoch ms/µs/days, ISO zoned string), and
    binary.handling.mode hex/base64 — every converter a builtin Catalyst
    expression, zero Python in the row path."""
    from sparkcdc.functions import converters as cv

    ev = _t(spark, sf_dir, "events")
    c_int = (F.col("user_id") - 50).cast("int")
    dec = (F.col("event_id") % 100000).cast("decimal(18,4)")
    bin_props = F.encode(F.col("props"), "UTF-8")
    return ev.select(
        "event_id",
        cv.unsigned_widen_int(c_int).alias("uw_int"),
        cv.decimal_string(dec).alias("dec_str"),
        cv.decimal_double(dec).alias("dec_dbl"),
        cv.ts_to_epoch_millis(F.col("ts")).alias("ts_ms"),
        cv.ts_to_epoch_micros(F.col("ts")).alias("ts_us"),
        cv.date_to_epoch_days(F.col("ts")).alias("epoch_days"),
        cv.zoned_timestamp(F.col("ts")).alias("ts_iso"),
        cv.binary_hex(bin_props).alias("props_hex"),
        cv.binary_base64(bin_props).alias("props_b64"),
        cv.enum_string(F.col("event_type")).alias("etype"),
    )


def q_text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-mix detection for multilingual corpus cleaning: per-script
    character ppm (Latin/CJK/Cyrillic/Arabic/digit/space/other) + dominant
    script, pure codegen (one regexp_replace + two lengths per script —
    Java \\p{IsX} classes on the Spark side, RE2 \\p{X} in the oracle).
    Non-Latin runs are injected deterministically so the signal is real."""
    from sparkcdc.functions.text import dominant_script, script_ratios

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.lit(" 漢字テスト 한국")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit(" привет мир")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit(" مرحبا")).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit(" 42 007")).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        F.length(injected).alias("n_chars"),
        *script_ratios(injected),
        dominant_script(injected).alias("dominant"),
    )


def q_curation_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/UT1-style URL curation: normalize (scheme/host case, www,
    userinfo, port, fragment, tracking params), reduce host to its
    registrable domain (eTLD+1 incl. multi-part suffixes like co.uk),
    and gate against a domain blocklist via ONE broadcast equality join.
    URLs are synthesized deterministically from (doc_id, source) so the
    oracle rebuilds the identical inputs."""
    from sparkcdc.pipeline import curation as cu

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.when(d % 4 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 5 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.concat(F.lit("cdn"), s(d % 2), F.lit(".")))
        .otherwise(F.lit("")),
        F.col("source"),
        F.when(d % 7 == 0, F.lit(".co.uk")).otherwise(F.lit(".com")),
        F.when(d % 6 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/p/"), s(d % 50),
        F.when(d % 2 == 0,
               F.concat(F.lit("?utm_source=x&id="), s(d % 10),
                        F.lit("&utm_medium=m"))).otherwise(F.lit("")),
        F.when(d % 9 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", url.alias("url"))
    gated = cu.domain_gate(docs, ["src3.com", "WWW.src7.co.uk", "src5.com"])
    return gated.select(
        "doc_id",
        "host",
        "domain",
        "blocked",
        cu.normalize_url(F.col("url")).alias("norm_url"),
    )


def granular_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every operator as its own query — the round-1..4 registry shape.

    ``queries()`` (below) folds these into ≤50 composite entries so the
    driver's 50-slot correctness window covers every operator family;
    bench.py and tools/check_entry.py --granular still run these
    individually for per-operator timing and diagnosis."""
    return {
        "cdc_snapshot_read": q_cdc_snapshot_read,
        "cdc_lww_reduce": q_cdc_lww_reduce,
        "cdc_final_state": q_cdc_final_state,
        "cdc_change_feed": q_cdc_change_feed,
        "cdc_connect_smt_chain": q_cdc_connect_smt_chain,
        "cdc_wal2json_replay": q_cdc_wal2json_replay,
        "cdc_pgoutput_replay": q_cdc_pgoutput_replay,
        "cdc_mongo_changestream_replay": q_cdc_mongo_changestream_replay,
        "cdc_mongo_delta_fold": q_cdc_mongo_delta_fold,
        "cdc_logical_message_decode": q_cdc_logical_message_decode,
        "cdc_crdt_counters": q_cdc_crdt_counters,
        "cdc_logminer_replay": q_cdc_logminer_replay,
        "cdc_sqlserver_cdc_replay": q_cdc_sqlserver_cdc_replay,
        "cdc_maxwell_binlog_replay": q_cdc_maxwell_binlog_replay,
        "cdc_extract_new_record_state": q_cdc_extract_new_record_state,
        "cdc_extract_changed_state": q_cdc_extract_changed_state,
        "cdc_tombstones": q_cdc_tombstones,
        "cdc_mask_truncate": q_cdc_mask_truncate,
        "cdc_properties_pipeline": q_cdc_properties_pipeline,
        "cdc_content_router": q_cdc_content_router,
        "cdc_logical_table_router": q_cdc_logical_table_router,
        "cdc_partition_routing": q_cdc_partition_routing,
        "cdc_outbox_router": q_cdc_outbox_router,
        "cdc_timezone": q_cdc_timezone,
        "cdc_timezone_scoped": q_cdc_timezone_scoped,
        "cdc_kafka_envelopes": q_cdc_kafka_envelopes,
        "cdc_incremental_snapshot": q_cdc_incremental_snapshot,
        "cdc_chunk_query": q_cdc_chunk_query,
        "cdc_offsets_progress": q_cdc_offsets_progress,
        "cdc_tx_metadata": q_cdc_tx_metadata,
        "cdc_table_filter": q_cdc_table_filter,
        "cdc_reselect": q_cdc_reselect,
        "cdc_replay_merge": q_cdc_replay_merge,
        "cdc_schema_evolution": q_cdc_schema_evolution,
        "cdc_resume_fencing": q_cdc_resume_fencing,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_span_stats": q_dedup_span_stats,
        "dedup_embedding": q_dedup_embedding,
        "dedup_clusters": q_dedup_clusters,
        "dedup_lines": q_dedup_lines,
        "dedup_semdedup": q_dedup_semdedup,
        "dedup_incremental": q_dedup_incremental,
        "dedup_incremental_near": q_dedup_incremental_near,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_hyperplane_lsh": q_ann_hyperplane_lsh,
        "text_bpe_token_count": q_text_bpe_token_count,
        "cdc_envelope_json_roundtrip": q_cdc_envelope_json_roundtrip,
        "cdc_multitable": q_cdc_multitable,
        "cdc_envelope_avro_roundtrip": q_cdc_envelope_avro_roundtrip,
        "cdc_envelope_protobuf_roundtrip": q_cdc_envelope_protobuf_roundtrip,
        "cdc_envelope_cloudevents_roundtrip": q_cdc_envelope_cloudevents_roundtrip,
        "cdc_cloudevent_saveable_form": q_cdc_cloudevent_saveable_form,
        "cdc_envelope_cloudevents_proto_roundtrip":
            q_cdc_envelope_cloudevents_proto_roundtrip,
        "cdc_envelope_connect_json_roundtrip":
            q_cdc_envelope_connect_json_roundtrip,
        "cdc_chunked_backfill": q_cdc_chunked_backfill,
        "cdc_range_backfill": q_cdc_range_backfill,
        "cdc_blocking_snapshot": q_cdc_blocking_snapshot,
        "text_stats": q_text_stats,
        "cdc_predicate_gating": q_cdc_predicate_gating,
        "text_pii_redact": q_text_pii_redact,
        "text_pack_sequences": q_text_pack_sequences,
        "mm_decode_meta": q_mm_decode_meta,
        "mm_frame_sample": q_mm_frame_sample,
        "curation_contamination": q_curation_contamination,
        "curation_repetition": q_curation_repetition,
        "curation_stratified_sample": q_curation_stratified_sample,
        "curation_mixture_plan": q_curation_mixture_plan,
        "curation_quality_verdicts": q_curation_quality_verdicts,
        "curation_word_rank_score": q_curation_word_rank_score,
        "curation_url_filter": q_curation_url_filter,
        "cdc_scalar_converters": q_cdc_scalar_converters,
        "text_script_mix": q_text_script_mix,
    }


def _lsh_oracle_sql() -> str:
    """Sign-LSH oracle with the hyperplanes inlined as literal DOUBLE[]
    arrays (same closed-form constants as pipeline.similarity)."""
    from sparkcdc.pipeline.similarity import hyperplane

    bits = []
    for p in range(8):
        arr = ", ".join(repr(x) for x in hyperplane(p, 64))
        bits.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{arr}]::DOUBLE[]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return f"""
        SELECT vec_id AS id,
               CAST({" + ".join(bits)} AS BIGINT) AS bucket
        FROM embeddings
    """


def _embedding_lsh_oracle_sql() -> str:
    """Banded sign-LSH candidates (band0 = planes 0-3, band1 = planes 4-7)
    + exact cosine >= 0.3 verify, mirroring q_dedup_embedding."""
    from sparkcdc.pipeline.similarity import hyperplane

    def band(planes: list[int]) -> str:
        bits = []
        for j, p in enumerate(planes):
            arr = ", ".join(repr(x) for x in hyperplane(p, 64))
            bits.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{arr}]::DOUBLE[]) >= 0 "
                f"THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(bits)

    cos = (
        "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    return f"""
        WITH bk AS (
          SELECT vec_id, embedding,
                 CAST({band([0, 1, 2, 3])} AS BIGINT) AS b0,
                 CAST({band([4, 5, 6, 7])} AS BIGINT) AS b1
          FROM embeddings),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bk a JOIN bk b
            ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.vec_id < b.vec_id)
        SELECT id_a, id_b,
               CAST(round({cos} * 1000000) AS BIGINT) AS cos_ppm
        FROM cand
        JOIN embeddings a ON a.vec_id = id_a
        JOIN embeddings b ON b.vec_id = id_b
        WHERE {cos} >= 0.3
    """


def _dedup_clusters_oracle_sql() -> str:
    """Connected components of the embedding near-dup pair set via a
    recursive CTE: min reachable node per node == the min-label each node
    converges to in the Spark propagation."""
    return f"""
        WITH RECURSIVE pairs AS ({_embedding_lsh_oracle_sql()}),
        sym AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION
          SELECT id_b AS a, id_a AS b FROM pairs),
        reach(a, b) AS (
          SELECT a, a AS b FROM (SELECT DISTINCT a FROM sym)
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
        SELECT a AS doc, min(b) AS cluster FROM reach GROUP BY a
    """


def granular_oracle_sql() -> dict[str, str]:
    from sparkcdc.pipeline.curation import (
        MULTI_PART_SUFFIXES,
        TRACKING_PARAM_RE,
    )

    norm_text = _NORM.format(c="text")
    h15 = "CAST(concat('0x', substr(sha256({x}), 1, 15)) AS BIGINT)"
    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    tracking_re = TRACKING_PARAM_RE.replace("\\", "\\\\")
    return {
        "cdc_snapshot_read": """
            SELECT c_custkey AS user_id, c_name AS name, c_nationkey AS nation,
                   'u' AS _op, CAST(-1 AS BIGINT) AS offset, 'true' AS snapshot_flag
            FROM customer
        """,
        "cdc_lww_reduce": """
            WITH last AS (
              SELECT user_id, event_type, value, props,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op
            FROM last WHERE rn = 1
        """,
        "cdc_wal2json_replay": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op,
                   event_id AS last_lsn
            FROM last WHERE rn = 1
        """,
        "cdc_pgoutput_replay": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op,
                   event_id AS last_lsn
            FROM last WHERE rn = 1
        """,
        "cdc_mongo_changestream_replay": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op,
                   CAST((1700000000 + event_id // 1000) * 4294967296
                        + (event_id % 1000) AS BIGINT) AS last_cluster_pos
            FROM last WHERE rn = 1
        """,
        "cdc_logical_message_decode": """
            SELECT CAST(event_id AS BIGINT) AS msg_offset,
                   CAST(event_id AS BIGINT) AS xid,
                   true AS transactional,
                   'app.audit' AS prefix,
                   user_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents,
                   props
            FROM events
        """,
        "cdc_mongo_delta_fold": """
            WITH ev AS (
              SELECT event_id, user_id, event_type, value, props,
                     CASE WHEN event_type = 'signup' THEN 'insert'
                          WHEN event_type = 'error' THEN 'delete'
                          ELSE 'update' END AS act
              FROM events),
            b AS (
              SELECT user_id, max(event_id) AS b_id,
                     arg_max(act, event_id) AS b_act,
                     arg_max(event_type, event_id) AS b_et,
                     arg_max(value, event_id) AS b_val,
                     arg_max(props, event_id) AS b_props
              FROM ev WHERE act IN ('insert', 'delete') GROUP BY user_id),
            live AS (SELECT * FROM b WHERE b_act = 'insert'),
            u AS (
              SELECT e.user_id,
                     arg_max(e.event_type, e.event_id) AS last_et,
                     arg_max(e.value, e.event_id) AS last_val
              FROM ev e JOIN live l USING (user_id)
              WHERE e.act = 'update' AND e.event_id > l.b_id
              GROUP BY e.user_id)
            SELECT l.user_id,
                   coalesce(u.last_et, l.b_et) AS event_type,
                   CAST(round(coalesce(u.last_val, l.b_val) * 100) AS BIGINT)
                     AS value_cents,
                   l.b_props AS props
            FROM live l LEFT JOIN u USING (user_id)
        """,
        "cdc_logminer_replay": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op,
                   event_id AS last_scn
            FROM last WHERE rn = 1
        """,
        # packed commit LSN = (0x25 << 48) + event_id = 10414574138294272 + event_id
        "cdc_sqlserver_cdc_replay": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op,
                   CAST(10414574138294272 + event_id AS BIGINT) AS last_commit_lsn
            FROM last WHERE rn = 1
        """,
        # packed binlog position = (1 + event_id div 2^20) << 32
        #                          + event_id mod 2^20
        "cdc_maxwell_binlog_replay": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op,
                   CAST((1 + event_id // 1048576) * 4294967296
                        + (event_id % 1048576) AS BIGINT) AS last_binlog_pos
            FROM last WHERE rn = 1
        """,
        "cdc_final_state": """
            WITH last AS (
              SELECT user_id, event_type, value, props,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents, props
            FROM last WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_connect_smt_chain": """
            SELECT CAST(user_id AS VARCHAR) AS user_id,
                   event_type AS et,
                   concat('events_', event_type) AS route,
                   'cdc' AS src,
                   event_id AS __offset
            FROM events WHERE event_type <> 'error'
        """,
        "cdc_change_feed": """
            WITH mx AS (SELECT max(event_id) AS m FROM events),
            hi AS (
              SELECT user_id, event_type, value, props FROM (
                SELECT user_id, event_type, value, props,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY event_id DESC) rn
                FROM events) WHERE rn = 1),
            lo AS (
              SELECT user_id, event_type, value, props FROM (
                SELECT user_id, event_type, value, props,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY event_id DESC) rn
                FROM events, mx WHERE event_id <= m // 2) WHERE rn = 1),
            j AS (
              SELECT h.user_id,
                     h.event_type AS h_et, h.value AS h_v, h.props AS h_p,
                     l.event_type AS l_et, l.value AS l_v, l.props AS l_p,
                     (l.user_id IS NOT NULL AND l.event_type <> 'error')
                       AS live_lo,
                     (h.event_type <> 'error') AS live_hi
              FROM hi h LEFT JOIN lo l ON h.user_id = l.user_id),
            typed AS (
              SELECT user_id,
                     CASE WHEN NOT live_lo AND live_hi THEN 'c'
                          WHEN live_lo AND NOT live_hi THEN 'd'
                          WHEN live_lo AND live_hi AND (
                            h_et IS DISTINCT FROM l_et OR
                            h_v  IS DISTINCT FROM l_v  OR
                            h_p  IS DISTINCT FROM l_p) THEN 'u'
                     END AS op,
                     CASE WHEN live_lo AND NOT live_hi THEN l_et ELSE h_et END AS event_type,
                     CASE WHEN live_lo AND NOT live_hi THEN l_v  ELSE h_v  END AS value,
                     CASE WHEN live_lo AND NOT live_hi THEN l_p  ELSE h_p  END AS props
              FROM j)
            SELECT user_id, op, event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents, props
            FROM typed WHERE op IS NOT NULL
        """,
        "cdc_extract_new_record_state": """
            SELECT user_id,
                   CASE WHEN event_type='error' THEN NULL ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL ELSE props END AS props,
                   CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS __op,
                   epoch_us(ts) // 1000 AS __ts_ms,
                   event_id AS __source_pos,
                   CASE WHEN event_type='error' THEN 'true' ELSE 'false' END AS __deleted
            FROM events
        """,
        "cdc_extract_changed_state": """
            WITH w AS (
              SELECT event_id, user_id, event_type, value, props,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) p_et,
                     lag(value)      OVER (PARTITION BY user_id ORDER BY event_id) p_v,
                     lag(props)      OVER (PARTITION BY user_id ORDER BY event_id) p_p,
                     row_number()    OVER (PARTITION BY user_id ORDER BY event_id) rn
              FROM events)
            SELECT event_id, user_id,
                   concat_ws(',',
                     CASE WHEN p_et IS DISTINCT FROM event_type THEN 'event_type' END,
                     CASE WHEN p_v  IS DISTINCT FROM value      THEN 'value'      END,
                     CASE WHEN p_p  IS DISTINCT FROM props      THEN 'props'      END
                   ) AS changed_csv
            FROM w WHERE rn > 1
        """,
        "cdc_tombstones": """
            SELECT CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "cdc_mask_truncate": """
            SELECT event_id, user_id,
                   substr(event_type, 1, 4) AS event_type,
                   sha256(concat('s3cr3t', props)) AS props
            FROM events WHERE event_type <> 'error'
        """,
        "cdc_properties_pipeline": """
            SELECT event_id, user_id,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE substr(event_type, 1, 4) END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE sha256(concat('s3cr3t', props)) END AS props,
                   CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS __op,
                   CASE WHEN event_type='error' THEN 'true'
                        ELSE 'false' END AS __deleted
            FROM events WHERE user_id % 7 <> 3
        """,
        "cdc_content_router": """
            SELECT CASE WHEN event_type='error' THEN 't.del'
                        ELSE concat('t.', event_type) END AS route,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "cdc_logical_table_router": """
            SELECT 'app.events_all' AS route,
                   concat('app.events_shard_', CAST(user_id % 8 % 4 AS VARCHAR)) AS physical,
                   count(*) AS n
            FROM events GROUP BY 2
        """,
        "cdc_partition_routing": f"""
            SELECT CAST({stable_hash_sql("CAST(user_id AS VARCHAR)")} % 16 AS INTEGER) AS part,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "cdc_outbox_router": """
            SELECT user_id AS key, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS payload_k,
                   'user' AS route
            FROM events
        """,
        "cdc_timezone": """
            SELECT event_id,
                   strftime(timezone('America/New_York', timezone('UTC', ts)),
                            '%Y-%m-%d %H:%M:%S') AS ts_nyc
            FROM events
        """,
        "cdc_incremental_snapshot": """
            SELECT c_custkey AS user_id, c_name AS name
            FROM customer
            WHERE c_custkey NOT IN (
              SELECT user_id FROM events
              WHERE event_id >= 5000 AND event_id < 10000)
        """,
        "cdc_chunk_query": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
                   o_orderpriority
            FROM orders WHERE o_orderkey > 1000
            ORDER BY o_orderkey LIMIT 500
        """,
        "cdc_offsets_progress": """
            SELECT CAST(user_id % 8 AS INTEGER) AS part_id,
                   max(event_id) AS last_offset, count(*) AS n_events
            FROM events GROUP BY 1
        """,
        "cdc_tx_metadata": """
            WITH agg AS (
              SELECT event_id // 100 AS tx_id, count(*) AS event_count,
                     count(DISTINCT CASE WHEN event_type='error' THEN '__deleted'
                                         ELSE event_type END) AS n_collections,
                     min(event_id) AS first_offset, max(event_id) AS last_offset,
                     min(epoch_us(ts) // 1000) AS begin_ts, max(epoch_us(ts) // 1000) AS end_ts
              FROM events GROUP BY 1)
            SELECT tx_id, 'BEGIN' AS status,
                   CAST(NULL AS BIGINT) AS event_count,
                   CAST(NULL AS BIGINT) AS n_collections,
                   first_offset, last_offset, begin_ts AS ts_ms
            FROM agg
            UNION ALL
            SELECT tx_id, 'END', event_count, n_collections,
                   first_offset, last_offset, end_ts
            FROM agg
        """,
        "cdc_table_filter": """
            SELECT concat('events_shard_', CAST(user_id % 8 % 4 AS VARCHAR)) AS "table",
                   count(*) AS n
            FROM events WHERE user_id % 8 % 4 IN (0, 1) GROUP BY 1
        """,
        "cdc_reselect": """
            WITH cur AS (
              SELECT user_id, max_by(props, event_id) AS props
              FROM events GROUP BY user_id)
            SELECT e.event_id, e.user_id, cur.props AS props
            FROM events e JOIN cur USING (user_id)
            WHERE e.event_type = 'view'
        """,
        "cdc_replay_merge": """
            WITH last AS (
              SELECT user_id, event_type, value, props,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents, props
            FROM last WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_schema_evolution": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_type AS etype,
                   CAST(round(value * 100) AS BIGINT) AS value_cents,
                   CASE WHEN event_id > (SELECT max(event_id) // 2 FROM events)
                        THEN sha256(props) END AS props_sha
            FROM last WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_resume_fencing": """
            WITH last AS (
              SELECT user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT user_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents,
                   true AS resumed_at_committed, true AS replay_fenced
            FROM last WHERE rn = 1 AND event_type <> 'error'
        """,
        "dedup_exact": f"""
            SELECT sha256({norm_text}) AS fingerprint,
                   doc_id AS keep_id, CAST(2 AS BIGINT) AS dup_count
            FROM documents WHERE doc_id < 100
        """,
        "dedup_minhash_lsh": f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array({norm_text}, ' ') w
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                              i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
                FROM toks)),
            hashed AS (
              SELECT doc_id, {h15.format(x="shingle")} % {MINHASH_P} AS h FROM sh),
            sig AS (
              SELECT doc_id,
                     {", ".join(
                        f"min((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}) AS mh{i}"
                        for i in range(16))}
              FROM hashed GROUP BY doc_id),
            bands AS (
              {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band, concat_ws(',', "
                + ", ".join(f"mh{b * 4 + j}" for j in range(4))
                + ") AS band_sig FROM sig"
                for b in range(4))}
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        """,
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array({norm_text}, ' ')) AS tok
              FROM documents),
            hashed AS (
              SELECT doc_id, {h15.format(x="tok")} AS h
              FROM toks WHERE tok <> ''),
            votes AS (
              SELECT doc_id, bit,
                     sum(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
              FROM hashed, (SELECT unnest(range(0, 32)) AS bit) bits
              GROUP BY doc_id, bit)
            SELECT doc_id AS doc,
                   CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id
        """,
        "dedup_ngram_jaccard": f"""
            WITH corpus AS ({_DUP_DOCS_SQL}),
            toks AS (
              SELECT doc_id, regexp_split_to_array({norm_text}, ' ') w
              FROM corpus),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                              i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
                FROM toks)),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   CAST(round(round(i / (sa.n + sb.n - i), 6) * 1000000) AS BIGINT) AS jaccard_ppm
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE round(i / (sa.n + sb.n - i), 6) >= 0.5
        """,
        "dedup_span_stats": f"""
            WITH corpus AS ({_DUP_DOCS_SQL}),
            toks AS (
              SELECT doc_id, regexp_split_to_array({norm_text}, ' ') w
              FROM corpus),
            wins AS (
              SELECT doc_id,
                     unnest(list_transform(
                       range(1, greatest(len(w) - 4, 0) + 1),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])
                     )) AS win
              FROM toks),
            dc AS (SELECT doc_id, win, count(*) AS dc FROM wins GROUP BY 1, 2),
            gc AS (SELECT win, sum(dc) AS c FROM dc GROUP BY 1),
            per AS (
              SELECT doc_id, sum(dc) AS n_windows,
                     sum(CASE WHEN c > 1 THEN dc ELSE 0 END) AS dup_windows
              FROM dc JOIN gc USING (win) GROUP BY 1)
            SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows,
                   CAST(dup_windows AS BIGINT) AS dup_windows,
                   CAST(round(dup_windows / n_windows * 1000000) AS BIGINT)
                     AS dup_ppm
            FROM per
        """,
        "dedup_embedding": _embedding_lsh_oracle_sql(),
        "dedup_clusters": _dedup_clusters_oracle_sql(),
        "dedup_lines": f"""
            WITH corpus AS ({_DUP_DOCS_SQL}),
            w AS (SELECT doc_id, split(text, ' ') AS ws FROM corpus),
            sized AS (
              SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 10.0) AS BIGINT) AS nl
              FROM w),
            lines AS (
              SELECT doc_id,
                     unnest(range(0, nl)) AS line_no,
                     unnest(list_transform(range(0, nl),
                            i -> array_to_string(
                                   list_slice(ws, i*10 + 1, i*10 + 10), ' ')
                           )) AS line
              FROM sized),
            dups AS (
              SELECT line FROM lines
              GROUP BY line HAVING count(DISTINCT doc_id) >= 2)
            SELECT l.doc_id,
                   coalesce(string_agg(
                     CASE WHEN d.line IS NULL THEN l.line END,
                     ' ' ORDER BY l.line_no), '') AS clean_text,
                   CAST(count(*) FILTER (WHERE d.line IS NULL) AS BIGINT)
                     AS n_kept,
                   CAST(count(*) FILTER (WHERE d.line IS NOT NULL) AS BIGINT)
                     AS n_removed
            FROM lines l LEFT JOIN dups d USING (line)
            GROUP BY l.doc_id
        """,
        "ann_cosine_topk": """
            WITH scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos
              FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
                   CAST(round(cos * 1000000) AS BIGINT) AS cos_ppm
            FROM ranked WHERE rank <= 5
        """,
        "cdc_crdt_counters": """
            SELECT event_type AS key,
                   CAST(count(*) AS BIGINT) AS adds,
                   CAST(0 AS BIGINT) AS removes,
                   CAST(count(*) AS BIGINT) AS value
            FROM events GROUP BY event_type
        """,
        "dedup_incremental": f"""
            WITH all_docs AS (
              SELECT doc_id, text, 1 AS batch FROM documents WHERE doc_id < 250
              UNION ALL
              SELECT doc_id, text, 2 FROM documents WHERE doc_id >= 250
              UNION ALL
              SELECT doc_id + 10000, text, 2 FROM documents WHERE doc_id < 100
            ),
            fp AS (
              SELECT sha256({norm_text}) AS fingerprint, doc_id, batch
              FROM all_docs),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY fingerprint ORDER BY batch ASC, doc_id ASC) AS rn
              FROM fp)
            SELECT fingerprint, doc_id AS first_doc_id
            FROM ranked WHERE rn = 1
        """,
        # incremental NEAR-dedup: replays the two-batch ingest in SQL —
        # batch-1 per-band-min admission, committed band keys, batch-2
        # drop-on-collision then per-band-min — and emits the final index
        "dedup_incremental_near": f"""
            WITH all_docs AS (
              SELECT doc_id, text, 1 AS batch FROM documents WHERE doc_id < 250
              UNION ALL
              SELECT doc_id, text, 2 FROM documents WHERE doc_id >= 250
              UNION ALL
              SELECT doc_id + 10000, text, 2 FROM documents WHERE doc_id < 100
            ),
            toks AS (
              SELECT doc_id, batch, regexp_split_to_array({norm_text}, ' ') w
              FROM all_docs),
            sh AS (
              SELECT DISTINCT doc_id, batch, shingle FROM (
                SELECT doc_id, batch,
                       unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                              i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
                FROM toks)),
            hashed AS (
              SELECT doc_id, batch, {h15.format(x="shingle")} % {MINHASH_P} AS h
              FROM sh),
            sig AS (
              SELECT doc_id, batch,
                     {", ".join(
                        f"min((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}) AS mh{i}"
                        for i in range(16))}
              FROM hashed GROUP BY doc_id, batch),
            bands AS (
              {" UNION ALL ".join(
                f"SELECT doc_id, batch, {b} AS band, concat_ws(',', "
                + ", ".join(f"mh{b * 4 + j}" for j in range(4))
                + ") AS band_sig FROM sig"
                for b in range(4))}
            ),
            b1 AS (SELECT doc_id, band, band_sig FROM bands WHERE batch = 1),
            b1_min AS (
              SELECT band, band_sig, min(doc_id) AS bmin
              FROM b1 GROUP BY band, band_sig),
            b1_keep AS (
              SELECT b.doc_id FROM b1 b JOIN b1_min m USING (band, band_sig)
              GROUP BY b.doc_id HAVING bool_and(b.doc_id = m.bmin)),
            committed AS (
              SELECT band, band_sig, doc_id FROM b1
              WHERE doc_id IN (SELECT doc_id FROM b1_keep)),
            b2 AS (SELECT doc_id, band, band_sig FROM bands WHERE batch = 2),
            b2_surv AS (
              SELECT * FROM b2 WHERE doc_id NOT IN (
                SELECT DISTINCT b.doc_id FROM b2 b
                JOIN committed c USING (band, band_sig))),
            b2_min AS (
              SELECT band, band_sig, min(doc_id) AS bmin
              FROM b2_surv GROUP BY band, band_sig),
            b2_keep AS (
              SELECT b.doc_id FROM b2_surv b JOIN b2_min m USING (band, band_sig)
              GROUP BY b.doc_id HAVING bool_and(b.doc_id = m.bmin)),
            admitted AS (
              SELECT band, band_sig, doc_id FROM committed
              UNION ALL
              SELECT band, band_sig, doc_id FROM b2_surv
              WHERE doc_id IN (SELECT doc_id FROM b2_keep))
            SELECT CAST(band AS INTEGER) AS band, band_sig,
                   CAST(doc_id AS BIGINT) AS first_doc_id
            FROM admitted
        """,
        "dedup_semdedup": """
            WITH cents AS (
              SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell, embedding
              FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT 16)),
            scored AS (
              SELECT v.vec_id AS id, c.cell,
                     round(list_dot_product(v.embedding::DOUBLE[], c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS csim
              FROM embeddings v, cents c),
            cells AS (
              SELECT id, cell FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY id ORDER BY csim DESC, cell ASC) AS crank
                FROM scored) WHERE crank = 1),
            member AS (
              SELECT cl.id, cl.cell, e.embedding
              FROM cells cl JOIN embeddings e ON e.vec_id = cl.id),
            dropped AS (
              SELECT DISTINCT b.id FROM member a JOIN member b
                ON a.cell = b.cell AND a.id < b.id
              WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
                    >= 0.3)
            SELECT m.id AS vec_id, CAST(m.cell AS INTEGER) AS cell,
                   d.id IS NULL AS keep
            FROM member m LEFT JOIN dropped d ON d.id = m.id
        """,
        "ann_ivf_topk": """
            WITH cents AS (
              SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell, embedding
              FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT 16)),
            corpus_scored AS (
              SELECT v.vec_id AS id, c.cell,
                     round(list_dot_product(v.embedding::DOUBLE[], c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS csim
              FROM embeddings v, cents c),
            corpus_cells AS (
              SELECT id AS neighbor_id, cell FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY id ORDER BY csim DESC, cell ASC) AS crank
                FROM corpus_scored) WHERE crank <= 1),
            query_cells AS (
              SELECT id AS query_id, cell FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY id ORDER BY csim DESC, cell ASC) AS crank
                FROM corpus_scored WHERE id < 10) WHERE crank <= 4),
            cand AS (
              SELECT DISTINCT qc.query_id, cc.neighbor_id,
                     round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) AS cos
              FROM query_cells qc
              JOIN corpus_cells cc ON qc.cell = cc.cell
              JOIN embeddings q ON q.vec_id = qc.query_id
              JOIN embeddings c ON c.vec_id = cc.neighbor_id
              WHERE qc.query_id <> cc.neighbor_id),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM cand)
            SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
                   CAST(round(cos * 1000000) AS BIGINT) AS cos_ppm
            FROM ranked WHERE rank <= 5
        """,
        "text_stats": f"""
            WITH base AS (
              SELECT doc_id, {norm_text} AS norm FROM documents),
            t AS (
              SELECT doc_id, norm, regexp_split_to_array(norm, ' ') AS w FROM base),
            m AS (
              SELECT doc_id, norm, w,
                     len(w) AS n_tokens,
                     list_sum(list_transform(w, x -> length(x))) AS total_chars,
                     len(list_filter(w, x -> list_contains(
                       ['the','a','of','and','to','in','is','it'], x))) AS n_stop,
                     len(list_filter(w, x -> list_contains(['the','of','and','a','to','in'], x))) AS s_en,
                     len(list_filter(w, x -> list_contains(['el','la','de','que','los','una'], x))) AS s_es,
                     len(list_filter(w, x -> list_contains(['le','la','les','des','est','une'], x))) AS s_fr,
                     len(list_filter(w, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS s_de
              FROM t)
            SELECT doc_id,
                   n_tokens,
                   CAST(round(round(CASE WHEN n_tokens > 0
                        THEN total_chars / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) * 100) AS BIGINT) AS mwl_e2,
                   CAST(round(round(CASE WHEN n_tokens > 0
                        THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) * 1000000) AS BIGINT) AS stop_ppm,
                   CAST(round(round(
                     0.5 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
                   + 0.5 * least((CASE WHEN n_tokens > 0
                          THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 4.0, 1.0)
                   - 0.25 * least((CASE WHEN length(d.text) > 0
                          THEN length(regexp_replace(d.text, '[a-zA-Z0-9\\s]', '', 'g'))
                               / CAST(length(d.text) AS DOUBLE) ELSE 0.0 END) * 5.0, 1.0)
                   , 6) * 1000000) AS BIGINT) AS quality_ppm,
                   CASE
                     WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                     WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                     WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
                     WHEN s_en >= s_de THEN 'en'
                     ELSE 'de' END AS lang_pred,
                   sha256(norm) AS fingerprint
            FROM m JOIN documents d USING (doc_id)
        """,
        "ann_hyperplane_lsh": _lsh_oracle_sql(),
        "text_bpe_token_count": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens
            FROM documents
        """,
        "text_pii_redact": """
            WITH salted AS (
              SELECT doc_id,
                     concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                            '@example.com', ' from 10.0.',
                            CAST(doc_id % 256 AS VARCHAR), '.17', ' tel +1555',
                            CAST(doc_id % 10000 + 1000000 AS VARCHAR)) AS text
              FROM documents)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS email_n,
                   CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) AS ipv4_n,
                   CAST(len(regexp_extract_all(text, '\\+\\d{7,15}')) AS INTEGER) AS phone_n,
                   sha256(regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IPV4]', 'g'),
                     '\\+\\d{7,15}', '[PHONE]', 'g')) AS redacted_sha
            FROM salted
        """,
        "text_pack_sequences": """
            WITH tok AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text,
                          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
                     CAST(CAST(concat('0x', substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 16 AS INTEGER) AS shard
              FROM documents),
            lay AS (
              SELECT doc_id, shard, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
              FROM tok)
            SELECT doc_id, shard, n_tokens, tok_offset,
                   CAST(tok_offset // 2048 AS BIGINT) AS seq_start,
                   CAST(greatest(tok_offset + n_tokens - 1, tok_offset) // 2048 AS BIGINT) AS seq_end,
                   CAST(tok_offset % 2048 AS BIGINT) AS off_in_seq
            FROM lay
        """,

        "cdc_predicate_gating": """
            SELECT concat('events_', CAST(user_id % 2 AS VARCHAR)) AS shard,
                   CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   event_id AS offset,
                   user_id,
                   CASE WHEN event_type='error' THEN NULL
                        WHEN user_id % 2 = 0 AND props IS NOT NULL
                          THEN sha256(concat('s3', props))
                        ELSE props END AS props
            FROM events
        """,
        "cdc_envelope_json_roundtrip": """
            SELECT CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   epoch_us(ts) // 1000 AS ts_ms,
                   user_id,
                   event_id AS pos,
                   event_id AS offset
            FROM events
        """,
        "cdc_multitable": """
            WITH last AS (
              SELECT user_id, event_type, value, props,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
              FROM events)
            SELECT concat('app.events_', CAST(user_id % 2 AS VARCHAR)) AS shard,
                   user_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents, props
            FROM last WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_envelope_avro_roundtrip": """
            SELECT CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   epoch_us(ts) // 1000 AS ts_ms,
                   user_id,
                   event_id AS pos,
                   event_id AS offset
            FROM events
        """,
        "cdc_envelope_protobuf_roundtrip": """
            SELECT CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   epoch_us(ts) // 1000 AS ts_ms,
                   user_id,
                   event_id AS pos,
                   event_id AS offset
            FROM events
        """,
        "cdc_envelope_cloudevents_roundtrip": """
            SELECT CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   epoch_us(ts) // 1000 AS ts_ms,
                   user_id,
                   event_id AS pos,
                   event_id AS offset
            FROM events
        """,
        "cdc_cloudevent_saveable_form": """
            SELECT concat(CAST(user_id % 8 AS VARCHAR), ':',
                          CAST(event_id AS VARCHAR)) AS ce_id,
                   '/sparkcdc/source_code_repos' AS ce_source,
                   'io.debezium.connector.spark.DataChangeEvent' AS ce_type,
                   CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   event_id AS offset,
                   user_id
            FROM events
        """,
        "cdc_kafka_envelopes": """
            WITH env AS (
              SELECT event_id,
                     CASE WHEN event_type='signup' THEN 'c'
                          WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                     user_id,
                     (user_id % 8) % 2 AS kp
              FROM events)
            SELECT op, user_id, event_id AS pos,
                   CAST(kp AS INTEGER) AS kafka_part,
                   CAST(ROW_NUMBER() OVER (PARTITION BY kp ORDER BY event_id)
                        - 1 AS BIGINT) AS kafka_offset
            FROM env
        """,
        "cdc_timezone_scoped": """
            SELECT event_id AS offset,
                   concat('events_', CAST(user_id % 2 AS VARCHAR)) AS src_table,
                   strftime(CASE WHEN user_id % 2 = 0
                       THEN timezone('America/New_York', timezone('UTC', ts))
                       ELSE ts END, '%Y-%m-%d %H:%M:%S') AS ts_out
            FROM events
        """,
        "cdc_envelope_cloudevents_proto_roundtrip": """
            SELECT CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   epoch_us(ts) // 1000 AS ts_ms,
                   user_id,
                   event_id AS pos,
                   event_id AS offset
            FROM events
        """,
        "cdc_envelope_connect_json_roundtrip": """
            SELECT CASE WHEN event_type='signup' THEN 'c'
                        WHEN event_type='error' THEN 'd' ELSE 'u' END AS op,
                   epoch_us(ts) // 1000 AS ts_ms,
                   user_id,
                   event_id AS pos,
                   event_id AS offset
            FROM events
        """,
        "cdc_chunked_backfill": """
            SELECT c_custkey AS user_id, c_name AS name,
                   true AS resumed_mid_backfill,
                   true AS backfill_completed
            FROM customer
            WHERE c_custkey NOT IN (
              SELECT user_id FROM events
              WHERE event_id >= 5000 AND event_id < 10000)
        """,
        "cdc_range_backfill": """
            SELECT c_custkey AS user_id, c_name AS name,
                   true AS resumed_mid_backfill,
                   true AS backfill_completed
            FROM customer
            WHERE c_custkey NOT IN (
              SELECT user_id FROM events
              WHERE event_id >= 2000 AND event_id < 8000)
        """,
        "cdc_blocking_snapshot": """
            SELECT c_custkey AS user_id, c_name AS name,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS balance_cents
            FROM customer
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) >= 500000
        """,
        "mm_decode_meta": """
            WITH h AS (
              SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                     sha256(text) AS sha,
                     CAST(concat('0x', substr(sha256(text), 1, 15)) AS BIGINT) AS hv
              FROM documents)
            SELECT doc_id, n_bytes,
                   CAST(64 + hv % 1856 AS INTEGER) AS width,
                   CAST(64 + (hv // 1856) % 1016 AS INTEGER) AS height,
                   CASE hv % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
                   sha AS content_sha
            FROM h
        """,
        "mm_frame_sample": """
            SELECT doc_id,
                   CAST(frame_idx AS INTEGER) AS frame_idx,
                   sha256(substr(text, CAST(frame_idx * 16 + 1 AS INTEGER), 16)) AS frame_sha
            FROM (
              SELECT doc_id, text,
                     unnest(range(0, octet_length(encode(text)) // 16, 4)) AS frame_idx
              FROM documents)
        """,
        "curation_contamination": f"""
            WITH bench AS (
              SELECT doc_id AS bench_id, regexp_split_to_array({norm_text}, ' ') w
              FROM documents WHERE doc_id % 97 = 0),
            corpus AS (
              SELECT doc_id, regexp_split_to_array({norm_text}, ' ') w
              FROM documents WHERE doc_id % 97 <> 0),
            bsh AS (
              SELECT DISTINCT bench_id, shingle FROM (
                SELECT bench_id,
                       unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                              i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
                FROM bench)),
            csh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                              i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
                FROM corpus))
            SELECT doc_id, bench_id, count(*) AS n_hits
            FROM csh JOIN bsh USING (shingle)
            GROUP BY 1, 2
            HAVING count(*) >= 2
        """,
        "curation_repetition": f"""
            WITH g AS (
              SELECT doc_id, w,
                     list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                    i -> concat_ws(' ', w[i], w[i+1])) AS g2,
                     list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                                    i -> concat_ws(' ', w[i], w[i+1], w[i+2])) AS g3
              FROM (SELECT doc_id, regexp_split_to_array({norm_text}, ' ') w
                    FROM documents))
            SELECT doc_id,
              CAST(len(w) AS BIGINT) AS total_1,
              CAST(len(list_distinct(w)) AS BIGINT) AS distinct_1,
              CASE WHEN len(w) > 0 THEN CAST(floor(
                (len(w) - len(list_distinct(w))) * 1000000.0 / len(w)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS dup_frac_ppm_1,
              CAST(len(g2) AS BIGINT) AS total_2,
              CAST(len(list_distinct(g2)) AS BIGINT) AS distinct_2,
              CASE WHEN len(g2) > 0 THEN CAST(floor(
                (len(g2) - len(list_distinct(g2))) * 1000000.0 / len(g2)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS dup_frac_ppm_2,
              CAST(len(g3) AS BIGINT) AS total_3,
              CAST(len(list_distinct(g3)) AS BIGINT) AS distinct_3,
              CASE WHEN len(g3) > 0 THEN CAST(floor(
                (len(g3) - len(list_distinct(g3))) * 1000000.0 / len(g3)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS dup_frac_ppm_3
            FROM g
        """,
        "curation_stratified_sample": f"""
            SELECT doc_id, lang, source FROM documents
            WHERE {stable_hash_sql("CAST(doc_id AS VARCHAR)", seed="mix1")}
                  % 1000000 <
                  CASE lang WHEN 'en' THEN 250000 WHEN 'es' THEN 500000
                            WHEN 'fr' THEN 750000 WHEN 'de' THEN 1000000
                            ELSE 100000 END
        """,
        "cdc_scalar_converters": """
            SELECT event_id,
                   CASE WHEN CAST(user_id - 50 AS INTEGER) < 0
                        THEN CAST(user_id - 50 AS BIGINT) + 4294967296
                        ELSE CAST(user_id - 50 AS BIGINT) END AS uw_int,
                   CAST(CAST(event_id % 100000 AS DECIMAL(18,4)) AS VARCHAR)
                     AS dec_str,
                   CAST(CAST(event_id % 100000 AS DECIMAL(18,4)) AS DOUBLE)
                     AS dec_dbl,
                   epoch_ms(ts) AS ts_ms,
                   epoch_us(ts) AS ts_us,
                   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                        AS INTEGER) AS epoch_days,
                   strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS ts_iso,
                   lower(hex(encode(props))) AS props_hex,
                   to_base64(encode(props)) AS props_b64,
                   event_type AS etype
            FROM events
        """,
        "text_script_mix": """
            WITH t AS (
              SELECT doc_id,
                concat(text,
                  CASE WHEN doc_id % 3 = 0 THEN ' 漢字テスト 한국' ELSE '' END,
                  CASE WHEN doc_id % 4 = 0 THEN ' привет мир' ELSE '' END,
                  CASE WHEN doc_id % 5 = 0 THEN ' مرحبا' ELSE '' END,
                  CASE WHEN doc_id % 7 = 0 THEN ' 42 007' ELSE '' END
                ) AS s
              FROM documents),
            c AS (
              SELECT doc_id, length(s) AS n,
                length(s) - length(regexp_replace(s, '[\\p{Latin}]', '', 'g')) AS latin_c,
                length(s) - length(regexp_replace(s,
                  '[\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Hangul}]', '', 'g')) AS cjk_c,
                length(s) - length(regexp_replace(s, '[\\p{Cyrillic}]', '', 'g')) AS cyrillic_c,
                length(s) - length(regexp_replace(s, '[\\p{Arabic}]', '', 'g')) AS arabic_c,
                length(s) - length(regexp_replace(s, '[0-9]', '', 'g')) AS digit_c,
                length(s) - length(regexp_replace(s, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS space_c
              FROM t),
            c2 AS (
              SELECT *,
                n - (latin_c + cjk_c + cyrillic_c + arabic_c
                     + digit_c + space_c) AS other_c,
                greatest(latin_c, cjk_c, cyrillic_c, arabic_c, digit_c,
                         space_c,
                         n - (latin_c + cjk_c + cyrillic_c + arabic_c
                              + digit_c + space_c)) AS m
              FROM c)
            SELECT doc_id, CAST(n AS INTEGER) AS n_chars,
                   CAST(CASE WHEN n > 0 THEN floor(latin_c * 1000000.0 / n) ELSE 0 END AS BIGINT) AS latin_ppm,
                   CAST(CASE WHEN n > 0 THEN floor(cjk_c * 1000000.0 / n) ELSE 0 END AS BIGINT) AS cjk_ppm,
                   CAST(CASE WHEN n > 0 THEN floor(cyrillic_c * 1000000.0 / n) ELSE 0 END AS BIGINT) AS cyrillic_ppm,
                   CAST(CASE WHEN n > 0 THEN floor(arabic_c * 1000000.0 / n) ELSE 0 END AS BIGINT) AS arabic_ppm,
                   CAST(CASE WHEN n > 0 THEN floor(digit_c * 1000000.0 / n) ELSE 0 END AS BIGINT) AS digit_ppm,
                   CAST(CASE WHEN n > 0 THEN floor(space_c * 1000000.0 / n) ELSE 0 END AS BIGINT) AS space_ppm,
                   CAST(CASE WHEN n > 0 THEN floor(other_c * 1000000.0 / n) ELSE 0 END AS BIGINT) AS other_ppm,
                   CASE WHEN m = 0 THEN 'none'
                        WHEN latin_c = m THEN 'latin'
                        WHEN cjk_c = m THEN 'cjk'
                        WHEN cyrillic_c = m THEN 'cyrillic'
                        WHEN arabic_c = m THEN 'arabic'
                        WHEN digit_c = m THEN 'digit'
                        WHEN space_c = m THEN 'space'
                        ELSE 'other' END AS dominant
            FROM c2
        """,
        "curation_url_filter": f"""
            WITH u AS (
              SELECT doc_id,
                concat(
                  CASE WHEN doc_id % 4 = 0 THEN 'HTTPS' ELSE 'http' END,
                  '://',
                  CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END,
                  CASE WHEN doc_id % 3 = 0
                       THEN concat('cdn', CAST(doc_id % 2 AS VARCHAR), '.')
                       ELSE '' END,
                  source,
                  CASE WHEN doc_id % 7 = 0 THEN '.co.uk' ELSE '.com' END,
                  CASE WHEN doc_id % 6 = 0 THEN ':8080' ELSE '' END,
                  '/p/', CAST(doc_id % 50 AS VARCHAR),
                  CASE WHEN doc_id % 2 = 0
                       THEN concat('?utm_source=x&id=',
                                   CAST(doc_id % 10 AS VARCHAR),
                                   '&utm_medium=m')
                       ELSE '' END,
                  CASE WHEN doc_id % 9 = 0 THEN '#frag' ELSE '' END
                ) AS url
              FROM documents),
            parts AS (
              SELECT doc_id, url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                regexp_replace(regexp_replace(lower(regexp_replace(
                  regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                  '^[^@]*@', '')), ':[0-9]+$', ''), '\\.$', '') AS host,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
                coalesce(regexp_extract(url, '^[^#]*\\?([^#]*)', 1), '')
                  AS query
              FROM u),
            dom AS (
              SELECT *,
                string_split(host, '.') AS ls,
                len(string_split(host, '.')) AS n
              FROM parts),
            dom2 AS (
              SELECT *,
                array_to_string(ls[n-1:n], '.') AS last2,
                array_to_string(ls[n-2:n], '.') AS last3
              FROM dom),
            dom3 AS (
              SELECT *,
                coalesce(array_to_string(list_filter(
                  string_split(query, '&'),
                  x -> x <> '' AND NOT regexp_matches(lower(x),
                    '{tracking_re}')), '&'), '') AS q
              FROM dom2),
            res AS (
              SELECT doc_id, host,
                CASE WHEN n >= 3 AND last2 IN ({suffixes}) THEN last3
                     WHEN n >= 2 THEN last2
                     ELSE host END AS domain,
                concat(
                  scheme, '://', regexp_replace(host, '^www\\.', ''),
                  CASE WHEN path0 = '' THEN '/' ELSE path0 END,
                  CASE WHEN q = '' THEN '' ELSE concat('?', q) END
                ) AS norm_url
              FROM dom3)
            SELECT doc_id, host, domain,
                   domain IN ('src3.com', 'src7.co.uk', 'src5.com')
                     AS blocked,
                   norm_url
            FROM res
        """,
        "curation_word_rank_score": f"""
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array({norm_text}, ' ')) AS word
              FROM documents),
            tk AS (SELECT doc_id, word FROM t WHERE word <> ''),
            vocab AS (
              SELECT word,
                     CAST(row_number() OVER (
                       ORDER BY count(*) DESC, word ASC) AS BIGINT) AS rank
              FROM tk GROUP BY word)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(floor(count(*) FILTER (WHERE v.rank IS NULL)
                        * 1000000.0 / count(*)) AS BIGINT) AS oov_ppm,
                   CAST(round(round(avg(ln(v.rank)), 6) * 10000) AS BIGINT)
                     AS score_e4
            FROM tk LEFT JOIN vocab v USING (word)
            GROUP BY doc_id
        """,
        "curation_quality_verdicts": f"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array({norm_text}, ' ') w
              FROM documents),
            g AS (
              SELECT doc_id, w,
                     list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                    i -> concat_ws(' ', w[i], w[i+1])) AS g2
              FROM t),
            sig AS (
              SELECT doc_id,
                CAST(len(w) AS BIGINT) AS n_tokens,
                CASE WHEN len(g2) > 0 THEN CAST(floor(
                  (len(g2) - len(list_distinct(g2))) * 1000000.0 / len(g2))
                  AS BIGINT) ELSE CAST(0 AS BIGINT) END AS dup_frac_ppm_2,
                CAST(round(round(CASE WHEN len(w) > 0 THEN
                  list_sum(list_transform(w, x -> length(x)))
                  / CAST(len(w) AS DOUBLE) ELSE 0.0 END, 6) * 100)
                  AS BIGINT) AS mwl_e2
              FROM g),
            v AS (
              SELECT *, concat_ws(',',
                CASE WHEN n_tokens < 30 THEN 'too_short' END,
                CASE WHEN n_tokens > 80 THEN 'too_long' END,
                CASE WHEN dup_frac_ppm_2 > 100000 THEN 'repetitive' END,
                CASE WHEN mwl_e2 < 300 OR mwl_e2 > 800
                     THEN 'word_length' END) AS reasons
              FROM sig)
            SELECT doc_id, n_tokens, dup_frac_ppm_2, mwl_e2, reasons,
                   reasons = '' AS keep
            FROM v
        """,
        "curation_mixture_plan": f"""
            WITH per AS (
              SELECT source,
                     CAST(SUM(len(regexp_split_to_array({norm_text}, ' ')))
                          AS BIGINT) AS source_tokens
              FROM documents GROUP BY source),
            t AS (
              SELECT per.source, per.source_tokens,
                     CAST(floor(w.w_ppm * 3000.0 / 1000000) AS BIGINT)
                       AS target_tokens
              FROM per
              JOIN (VALUES ('src0', 300000), ('src1', 200000), ('src2', 150000),
                           ('src3', 150000), ('src4', 100000), ('src5', 100000))
                   AS w(source, w_ppm)
              ON per.source = w.source)
            SELECT source, source_tokens, target_tokens,
                   least(CAST(1000000 AS BIGINT),
                         CAST(floor(target_tokens * 1000000.0 / source_tokens)
                              AS BIGINT)) AS rate_ppm
            FROM t
        """,
    }


# ---------------------------------------------------------------------------
# Composite driver queries (round 5)
#
# The driver's correctness gate evaluates the FIRST 50 entries of
# ``queries()``; round 4 defined 76, leaving 26 operators judge-verified
# but never driver-verified. The composites below fold same-family
# operators into tagged unions / wide joins so EVERY SURVEY §2 +
# pipeline family fits inside the 50-slot window. Granular queries and
# oracles remain available via ``granular_queries()`` /
# ``granular_oracle_sql()`` for per-operator timing and diagnosis
# (bench.py uses them).
# ---------------------------------------------------------------------------


def _null(t: str) -> F.Column:
    return F.lit(None).cast(t)


def q_cdc_lww_reduce_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 both read surfaces: the reduced per-key LWW buffer (deletes as
    tombstone rows, surface='reduced') and the applied final state
    (deletes dropped, surface='final')."""
    red = q_cdc_lww_reduce(spark, sf_dir).select(
        F.lit("reduced").alias("surface"),
        "user_id", "event_type", "value_cents", "props", "_op",
    )
    fin = q_cdc_final_state(spark, sf_dir).select(
        F.lit("final").alias("surface"),
        "user_id", "event_type", "value_cents", "props",
        _null("string").alias("_op"),
    )
    return red.unionByName(fin)


def q_cdc_backfill_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+S10 all three chunking surfaces in one run: keyset-paginated
    resumable backfill (mode='keyset'), range-staged resumable backfill
    (mode='range'), and the raw keyset chunk-query builder's first page
    (mode='chunk_plan'). Each keeps its kill-after-2-chunks + fresh-engine
    resume protocol from the granular queries."""
    ks = q_cdc_chunked_backfill(spark, sf_dir).select(
        F.lit("keyset").alias("mode"),
        F.col("user_id").alias("key"), "name",
        _null("long").alias("total_cents"),
        "resumed_mid_backfill", "backfill_completed",
    )
    rg = q_cdc_range_backfill(spark, sf_dir).select(
        F.lit("range").alias("mode"),
        F.col("user_id").alias("key"), "name",
        _null("long").alias("total_cents"),
        "resumed_mid_backfill", "backfill_completed",
    )
    cq = q_cdc_chunk_query(spark, sf_dir).select(
        F.lit("chunk_plan").alias("mode"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("name"),
        F.col("total_cents"),
        _null("boolean").alias("resumed_mid_backfill"),
        _null("boolean").alias("backfill_completed"),
    )
    return ks.unionByName(rg).unionByName(cq)


def q_cdc_wire_replays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6/S8 every wire-format decoder end-to-end in one union: the
    same event history rendered as six different vendors' change-log wire
    formats, each parsed back and LWW-reduced; all six must converge on
    the identical final state, with last_pos proving each codec
    roundtrips its native offset packing."""
    parts = [
        ("wal2json", q_cdc_wal2json_replay, "last_lsn"),
        ("pgoutput", q_cdc_pgoutput_replay, "last_lsn"),
        ("mongo", q_cdc_mongo_changestream_replay, "last_cluster_pos"),
        ("logminer", q_cdc_logminer_replay, "last_scn"),
        ("sqlserver", q_cdc_sqlserver_cdc_replay, "last_commit_lsn"),
        ("maxwell", q_cdc_maxwell_binlog_replay, "last_binlog_pos"),
    ]
    out = None
    for src, fn, poscol in parts:
        d = fn(spark, sf_dir).select(
            F.lit(src).alias("src"),
            "user_id", "event_type", "value_cents", "props", "_op",
            F.col(poscol).alias("last_pos"),
        )
        out = d if out is None else out.unionByName(d)
    return out


def q_cdc_routers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4+T5+T6 routing transforms: ContentBasedRouter destination counts
    (router='content'), ByLogicalTableRouter logical/physical route pairs
    (router='logical'), PartitionRouting stable-hash partition census
    (router='partition')."""
    c = q_cdc_content_router(spark, sf_dir).select(
        F.lit("content").alias("router"), "route",
        _null("string").alias("detail"), "n",
    )
    l = q_cdc_logical_table_router(spark, sf_dir).select(
        F.lit("logical").alias("router"), "route",
        F.col("physical").alias("detail"), "n",
    )
    p = q_cdc_partition_routing(spark, sf_dir).select(
        F.lit("partition").alias("router"),
        F.col("part").cast("string").alias("route"),
        _null("string").alias("detail"), "n",
    )
    return c.unionByName(l).unionByName(p)


def q_cdc_timezone_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 TimezoneConverter, unscoped (variant='all': every source ts
    rendered in the target TZ) and include-list scoped (variant='scoped':
    only the matching shard converted, the other passes through)."""
    a = q_cdc_timezone(spark, sf_dir).select(
        F.lit("all").alias("variant"),
        F.col("event_id").alias("offset"),
        _null("string").alias("src_table"),
        F.col("ts_nyc").alias("ts_out"),
    )
    s = q_cdc_timezone_scoped(spark, sf_dir).select(
        F.lit("scoped").alias("variant"), "offset", "src_table", "ts_out",
    )
    return a.unionByName(s)


def q_cdc_serializer_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16 all six wire serializations roundtripped in one union: JSON,
    Avro-binary, proto3, CloudEvents(avro payload), CloudEvents(proto
    payload), Connect JSON-with-schema. The oracle recomputes the
    projection straight from events for every format, so a match proves
    each encoder/decoder pair is lossless."""
    parts = [
        ("json", q_cdc_envelope_json_roundtrip),
        ("avro", q_cdc_envelope_avro_roundtrip),
        ("protobuf", q_cdc_envelope_protobuf_roundtrip),
        ("cloudevents_avro", q_cdc_envelope_cloudevents_roundtrip),
        ("cloudevents_proto", q_cdc_envelope_cloudevents_proto_roundtrip),
        ("connect_json", q_cdc_envelope_connect_json_roundtrip),
    ]
    out = None
    for fmt, fn in parts:
        d = fn(spark, sf_dir).select(
            F.lit(fmt).alias("fmt"), "op", "ts_ms", "user_id", "pos",
            "offset",
        )
        out = d if out is None else out.unionByName(d)
    return out


def q_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate PAIR generators: MinHash banded LSH
    (method='minhash_lsh', raw corpus) and shingle-Jaccard verified pairs
    (method='ngram_jaccard', duplicated corpus, jaccard >= 0.5)."""
    mh = q_dedup_minhash_lsh(spark, sf_dir).select(
        F.lit("minhash_lsh").alias("method"), "doc_a", "doc_b",
        _null("long").alias("jaccard_ppm"),
    )
    ng = q_dedup_ngram_jaccard(spark, sf_dir).select(
        F.lit("ngram_jaccard").alias("method"), "doc_a", "doc_b",
        "jaccard_ppm",
    )
    return mh.unionByName(ng)


def q_dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup, all three surfaces over the same vector
    table: sign-LSH-banded verified pairs (kind='pair', v=cos ppm), their
    connected components via min-label propagation (kind='cluster',
    b=cluster label), and IVF-cell-scoped SemDeDup keep/drop verdicts
    (kind='semdedup', b=cell, v=keep as 0/1)."""
    pr = q_dedup_embedding(spark, sf_dir).select(
        F.lit("pair").alias("kind"),
        F.col("id_a").alias("a"), F.col("id_b").alias("b"),
        F.col("cos_ppm").alias("v"),
    )
    cl = q_dedup_clusters(spark, sf_dir).select(
        F.lit("cluster").alias("kind"),
        F.col("doc").alias("a"), F.col("cluster").alias("b"),
        _null("long").alias("v"),
    )
    sd = q_dedup_semdedup(spark, sf_dir).select(
        F.lit("semdedup").alias("kind"),
        F.col("vec_id").alias("a"), F.col("cell").cast("long").alias("b"),
        F.col("keep").cast("long").alias("v"),
    )
    return pr.unionByName(cl).unionByName(sd)


def q_dedup_lines_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup, both granularities joined per doc over the
    duplicated corpus: C4-style line-level rewrite (clean_text, kept/
    removed line counts) and Lee-et-al k-token-window duplication stats."""
    lines = q_dedup_lines(spark, sf_dir)
    spans = q_dedup_span_stats(spark, sf_dir)
    return lines.join(spans, "doc_id", "left").select(
        "doc_id", "clean_text", "n_kept", "n_removed",
        "n_windows", "dup_windows", "dup_ppm",
    )


def q_dedup_incremental_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time incremental dedup, exact and near, each through its
    persistent lake-table index across a two-batch ingest with
    redelivered copies: kind='exact' rows are the fingerprint index
    (sig=sha256), kind='near' rows the MinHash band index (band,
    sig=band signature)."""
    ex = q_dedup_incremental(spark, sf_dir).select(
        F.lit("exact").alias("kind"), _null("int").alias("band"),
        F.col("fingerprint").alias("sig"), "first_doc_id",
    )
    nr = q_dedup_incremental_near(spark, sf_dir).select(
        F.lit("near").alias("kind"), "band",
        F.col("band_sig").alias("sig"), "first_doc_id",
    )
    return ex.unionByName(nr)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k, the exact baseline and the scale path on the same
    queries: brute-force cosine (method='brute') vs IVF with n_probe
    cell pruning (method='ivf')."""
    br = q_ann_cosine_topk(spark, sf_dir).select(
        F.lit("brute").alias("method"), "query_id", "neighbor_id",
        "rank", "cos_ppm",
    )
    iv = q_ann_ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id",
        "rank", "cos_ppm",
    )
    return br.unionByName(iv)


def q_text_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis, one wide row per doc: quality/lang/
    stopword stats, BPE-ish token count, and script-mix ppm census —
    three zero-Python codegen projections joined on doc_id."""
    st = q_text_stats(spark, sf_dir)
    bpe = q_text_bpe_token_count(spark, sf_dir)
    sm = q_text_script_mix(spark, sf_dir)
    return (
        st.join(bpe, "doc_id").join(sm, "doc_id").select(
            "doc_id", "n_tokens", "mwl_e2", "stop_ppm", "quality_ppm",
            "lang_pred", "fingerprint", "n_bpe_tokens", "n_chars",
            "latin_ppm", "cjk_ppm", "cyrillic_ppm", "arabic_ppm",
            "digit_ppm", "space_ppm", "other_ppm", "dominant",
        )
    )


def q_mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, both stages: deterministic decode-stub
    metadata (stage='decode': n1=bytes, n2=width, n3=height, label=
    format) and every-k frame sampling (stage='frame': n1=frame_idx) —
    Arrow mapInPandas batches on binary payload columns."""
    dec = q_mm_decode_meta(spark, sf_dir).select(
        F.lit("decode").alias("stage"), "doc_id",
        F.col("n_bytes").alias("n1"),
        F.col("width").cast("long").alias("n2"),
        F.col("height").cast("long").alias("n3"),
        F.col("format").alias("label"),
        F.col("content_sha").alias("sha"),
    )
    fr = q_mm_frame_sample(spark, sf_dir).select(
        F.lit("frame").alias("stage"), "doc_id",
        F.col("frame_idx").cast("long").alias("n1"),
        _null("long").alias("n2"), _null("long").alias("n3"),
        _null("string").alias("label"),
        F.col("frame_sha").alias("sha"),
    )
    return dec.unionByName(fr)


def q_curation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation signals joined on doc_id: Gopher repetition
    fractions (n=1,2,3) and the CCNet word-frequency-rank quality proxy."""
    rep = q_curation_repetition(spark, sf_dir)
    wr = q_curation_word_rank_score(spark, sf_dir).select(
        "doc_id", F.col("n_tokens").alias("wr_tokens"), "oov_ppm",
        "score_e4",
    )
    return rep.join(wr, "doc_id").select(
        "doc_id",
        "total_1", "distinct_1", "dup_frac_ppm_1",
        "total_2", "distinct_2", "dup_frac_ppm_2",
        "total_3", "distinct_3", "dup_frac_ppm_3",
        "wr_tokens", "oov_ppm", "score_e4",
    )


def q_curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level gate decisions: benchmark-contamination hits
    (kind='contamination': v1=bench_id, v2=n_hits) and rule-composed
    quality verdicts with reasons-as-data (kind='quality': v1=n_tokens,
    v2=dup_frac_ppm_2, v3=mwl_e2)."""
    co = q_curation_contamination(spark, sf_dir).select(
        F.lit("contamination").alias("kind"), "doc_id",
        F.col("bench_id").alias("v1"), F.col("n_hits").alias("v2"),
        _null("long").alias("v3"), _null("string").alias("reasons"),
        _null("boolean").alias("keep"),
    )
    qu = q_curation_quality_verdicts(spark, sf_dir).select(
        F.lit("quality").alias("kind"), "doc_id",
        F.col("n_tokens").alias("v1"),
        F.col("dup_frac_ppm_2").alias("v2"),
        F.col("mwl_e2").alias("v3"), "reasons", "keep",
    )
    return co.unionByName(qu)


def q_curation_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition control: deterministic per-language stratified
    sampling (kind='sample', key=doc_id) and token-budget mixture
    planning (kind='mixture', key=source)."""
    sa = q_curation_stratified_sample(spark, sf_dir).select(
        F.lit("sample").alias("kind"),
        F.col("doc_id").cast("string").alias("key"),
        "lang", "source",
        _null("long").alias("source_tokens"),
        _null("long").alias("target_tokens"),
        _null("long").alias("rate_ppm"),
    )
    mx = q_curation_mixture_plan(spark, sf_dir).select(
        F.lit("mixture").alias("kind"),
        F.col("source").alias("key"),
        _null("string").alias("lang"), "source",
        "source_tokens", "target_tokens", "rate_ppm",
    )
    return sa.unionByName(mx)


def q_cdc_snapshot_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot/streaming progress-metrics parity
    (core/pipeline/metrics/{Snapshot,Streaming}ChangeEventSourceMetricsMXBean.java):
    snapshot the customer table as table 1-of-2, chunked-backfill it in a
    ceil(n/4) chunk grid, then replay one 5000-event generator batch on a
    second engine; emit the folded MXBean fields. Everything but the lag
    sign is closed-form in count(customer), so the oracle is exact; the
    lag itself is wall-clock and surfaces as the always-true
    ``lag_positive`` probe (generator event time is in the past)."""
    from sparkcdc.engine import CdcEngine

    root = tempfile.mkdtemp(prefix="sparkcdc_q_progress_")
    t = LakeTable.create(
        spark, root, "t",
        fields=[("user_id", "long"), ("name", "string")],
        key_cols=["user_id"], n_buckets=8,
    )
    eng = CdcEngine(spark, t, EngineConfig(n_parts=8))
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("name")
    )
    eng.run_snapshot(cust, tables_total=2, tables_completed=1)
    # chunk grid of exactly 4 recorded chunks for any n >= 4: ceil(n/4)
    # sized chunks; an n divisible by the size adds only the empty probe
    cnt = cust.count()
    chunk = -(-cnt // 4)
    empty_window = _env(spark, sf_dir).filter(F.col("offset") < 0)
    eng.run_incremental_snapshot(
        cust, 0, 1, stream_window=empty_window, chunk_size=chunk,
    )
    sp = eng.metrics.snapshot_progress()

    root2 = tempfile.mkdtemp(prefix="sparkcdc_q_progress_replay_")
    eng2 = default_engine(
        spark, root2, n_buckets=8,
        config=EngineConfig(batch_size=5000, n_keys=500, n_parts=8),
    )
    eng2.replay(5000)
    st = eng2.metrics.streaming_status()
    lag = st["milliseconds_behind_source"]
    rows = [
        ("snapshot", "t", sp["total_table_count"],
         sp["completed_table_count"], sp["rows_scanned"]["t"],
         None, None, None, None, None),
        ("backfill", "t", None, None, None,
         sp["current_chunk_id"], sp["chunk_rows_total"],
         None, None, None),
        ("streaming", "source_code_repos", None, None, None, None, None,
         st["number_of_committed_batches"],
         st["total_number_of_events_seen"],
         lag is not None and lag > 0),
    ]
    return spark.createDataFrame(
        rows,
        "phase string, table_name string, tables_total long, "
        "tables_completed long, rows_scanned long, chunk_id long, "
        "chunk_rows long, batches long, events_seen long, "
        "lag_positive boolean",
    )


def q_cdc_streaming_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 Structured-Streaming semantics, driver-verified end-to-end:
    the envelope stream serialized to JSON-lines files and streamed back
    through BOTH stateful operators —

    - ``stateful_lww_stream`` (applyInPandasWithState): final per-key
      emission must equal the batch LWW reduce (kind='lww'; deletes are
      tombstone emissions with _op='d' and NULL fields);
    - ``windowed_change_metrics`` (watermarked 1-minute windows, append
      mode): two far-future sentinel waves push the watermark past every
      real window, so each finalizes and emits exactly once (kind='win';
      the sentinels' own windows never finalize and the sentinel key is
      excluded from the LWW output).

    Wave files keep determinism: the file source takes each wave as one
    micro-batch, so no real event is ever late against the watermark its
    own wave established."""
    from sparkcdc.envelope import envelope_schema
    from sparkcdc.sources.events_adapter import EVENT_ROW_FIELDS
    from sparkcdc.streaming import (
        stateful_lww_stream,
        windowed_change_metrics,
    )
    from sparkcdc.transforms import envelope_to_json, parse_envelope_json

    root = tempfile.mkdtemp(prefix="sparkcdc_q_stream_")
    wire = os.path.join(root, "wire")
    os.makedirs(wire)
    env = _env(spark, sf_dir)
    hi = env.agg(F.max("ts_ms"), F.max("offset")).first()
    max_ts, max_off = int(hi[0]), int(hi[1])
    day_ms = 86_400_000

    def write_wave(name: str, df: DataFrame) -> None:
        pdf = envelope_to_json(df).toPandas()
        with open(os.path.join(wire, name), "w") as fh:
            fh.write("\n".join(pdf["value"]) + "\n")

    def sentinel(ts_ms: int, off: int) -> DataFrame:
        return spark.createDataFrame(
            [("c", ts_ms, None, (-1, "sentinel", 0.0, "s"), None, None,
              0, off, False)],
            envelope_schema(EVENT_ROW_FIELDS),
        )

    win_rows: list = []
    ckpt = os.path.join(root, "ckpt_win")

    def run_win_wave() -> None:
        raw = spark.readStream.text(wire)
        stream = parse_envelope_json(raw, EVENT_ROW_FIELDS)
        out = windowed_change_metrics(
            stream, window="1 minute", watermark="10 minutes", by_op=False
        )
        q = (out.writeStream.foreachBatch(
                lambda df, bid: win_rows.extend(
                    df.selectExpr(
                        "CAST(window.start AS LONG) * 1000 AS k",
                        "events", "max_offset",
                    ).collect()))
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    write_wave("w1.jsonl", env)
    run_win_wave()
    write_wave("w2.jsonl", sentinel(max_ts + day_ms, max_off + 1))
    run_win_wave()
    write_wave("w3.jsonl", sentinel(max_ts + 2 * day_ms, max_off + 2))
    run_win_wave()

    lww_rows: list = []
    raw = spark.readStream.text(wire)
    stream = parse_envelope_json(raw, EVENT_ROW_FIELDS)
    out = stateful_lww_stream(stream, EVENT_ROW_FIELDS, ["user_id"])
    q = (out.writeStream.foreachBatch(
            lambda df, bid: lww_rows.extend(df.collect()))
         .option("checkpointLocation", os.path.join(root, "ckpt_lww"))
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    best: dict = {}
    for r in lww_rows:
        if r["user_id"] == -1:
            continue
        cur = best.get(r["user_id"])
        if cur is None or r["offset"] > cur["offset"]:
            best[r["user_id"]] = r
    # cents conversion in Spark (not python round) so the double→int
    # rounding expression tree matches the oracle's exactly
    lww_df = spark.createDataFrame(
        [
            ("lww", int(r["user_id"]), r["event_type"], r["value"],
             r["props"], r["_op"], int(r["offset"]))
            for r in best.values()
        ],
        "kind string, k long, event_type string, value double, "
        "props string, _op string, offset long",
    ).select(
        "kind", "k", "event_type",
        _cents(F.col("value")).alias("value_cents"),
        "props", "_op", "offset",
    )
    win_df = spark.createDataFrame(
        [
            ("win", int(w["k"]), None, int(w["events"]), None, None,
             int(w["max_offset"]))
            for w in win_rows
            if int(w["k"]) <= max_ts
        ],
        "kind string, k long, event_type string, value_cents long, "
        "props string, _op string, offset long",
    )
    return lww_df.unionByName(win_df)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-facing registry: ≤50 entries, one per operator family
    (composites fold same-family granular queries; see their docstrings
    for what each folds)."""
    g = granular_queries()
    return {
        # --- engine / snapshot / sink ---
        "cdc_snapshot_read": g["cdc_snapshot_read"],
        "cdc_lww_reduce": q_cdc_lww_reduce_suite,
        "cdc_change_feed": g["cdc_change_feed"],
        "cdc_replay_merge": g["cdc_replay_merge"],
        "cdc_schema_evolution": g["cdc_schema_evolution"],
        "cdc_resume_fencing": g["cdc_resume_fencing"],
        "cdc_multitable": g["cdc_multitable"],
        "cdc_incremental_snapshot": g["cdc_incremental_snapshot"],
        "cdc_backfill_modes": q_cdc_backfill_modes,
        "cdc_blocking_snapshot": g["cdc_blocking_snapshot"],
        "cdc_offsets_progress": g["cdc_offsets_progress"],
        "cdc_snapshot_progress": q_cdc_snapshot_progress,
        "cdc_streaming_lww": q_cdc_streaming_lww,
        "cdc_tx_metadata": g["cdc_tx_metadata"],
        "cdc_crdt_counters": g["cdc_crdt_counters"],
        # --- wire sources ---
        "cdc_wire_replays": q_cdc_wire_replays,
        "cdc_logical_message_decode": g["cdc_logical_message_decode"],
        "cdc_mongo_delta_fold": g["cdc_mongo_delta_fold"],
        "cdc_kafka_envelopes": g["cdc_kafka_envelopes"],
        # --- transforms ---
        "cdc_extract_new_record_state": g["cdc_extract_new_record_state"],
        "cdc_extract_changed_state": g["cdc_extract_changed_state"],
        "cdc_tombstones": g["cdc_tombstones"],
        "cdc_mask_truncate": g["cdc_mask_truncate"],
        "cdc_connect_smt_chain": g["cdc_connect_smt_chain"],
        "cdc_properties_pipeline": g["cdc_properties_pipeline"],
        "cdc_routers": q_cdc_routers,
        "cdc_outbox_router": g["cdc_outbox_router"],
        "cdc_timezone": q_cdc_timezone_suite,
        "cdc_table_filter": g["cdc_table_filter"],
        "cdc_reselect": g["cdc_reselect"],
        "cdc_serializer_roundtrips": q_cdc_serializer_roundtrips,
        "cdc_cloudevent_saveable_form": g["cdc_cloudevent_saveable_form"],
        "cdc_predicate_gating": g["cdc_predicate_gating"],
        "cdc_scalar_converters": g["cdc_scalar_converters"],
        # --- training-data pipeline ---
        "dedup_exact": g["dedup_exact"],
        "dedup_pairs": q_dedup_pairs,
        "dedup_simhash": g["dedup_simhash"],
        "dedup_embedding_clusters": q_dedup_embedding_clusters,
        "dedup_lines_spans": q_dedup_lines_spans,
        "dedup_incremental": q_dedup_incremental_suite,
        "ann_topk": q_ann_topk,
        "ann_hyperplane_lsh": g["ann_hyperplane_lsh"],
        "text_stats": q_text_stats_suite,
        "text_pii_redact": g["text_pii_redact"],
        "text_pack_sequences": g["text_pack_sequences"],
        "mm_pipeline": q_mm_pipeline,
        "curation_scores": q_curation_scores,
        "curation_verdicts": q_curation_verdicts,
        "curation_sampling": q_curation_sampling,
        "curation_url_filter": g["curation_url_filter"],
    }


def oracle_sql() -> dict[str, str]:
    """Composite-aware oracle registry: pass-through entries reuse the
    granular SQL verbatim; composite entries wrap the granular SQL bodies
    as subqueries with the same tag/coercion scheme as the Spark side."""
    g = granular_oracle_sql()

    wire = " UNION ALL ".join(
        f"SELECT '{src}' AS src, user_id, event_type, value_cents, props,"
        f" _op, CAST({pos} AS BIGINT) AS last_pos FROM ({g[name]})"
        for src, name, pos in [
            ("wal2json", "cdc_wal2json_replay", "last_lsn"),
            ("pgoutput", "cdc_pgoutput_replay", "last_lsn"),
            ("mongo", "cdc_mongo_changestream_replay", "last_cluster_pos"),
            ("logminer", "cdc_logminer_replay", "last_scn"),
            ("sqlserver", "cdc_sqlserver_cdc_replay", "last_commit_lsn"),
            ("maxwell", "cdc_maxwell_binlog_replay", "last_binlog_pos"),
        ]
    )
    fmts = ["json", "avro", "protobuf", "cloudevents_avro",
            "cloudevents_proto", "connect_json"]
    fmt_arr = ", ".join(f"'{f}'" for f in fmts)

    out = {
        name: g[name]
        for name in [
            "cdc_snapshot_read", "cdc_change_feed", "cdc_replay_merge",
            "cdc_schema_evolution", "cdc_resume_fencing", "cdc_multitable",
            "cdc_incremental_snapshot", "cdc_blocking_snapshot",
            "cdc_offsets_progress", "cdc_tx_metadata", "cdc_crdt_counters",
            "cdc_logical_message_decode", "cdc_mongo_delta_fold",
            "cdc_kafka_envelopes", "cdc_extract_new_record_state",
            "cdc_extract_changed_state", "cdc_tombstones",
            "cdc_mask_truncate", "cdc_connect_smt_chain",
            "cdc_properties_pipeline", "cdc_outbox_router",
            "cdc_table_filter", "cdc_reselect",
            "cdc_cloudevent_saveable_form", "cdc_predicate_gating",
            "cdc_scalar_converters", "dedup_exact", "dedup_simhash",
            "ann_hyperplane_lsh", "text_pii_redact", "text_pack_sequences",
            "curation_url_filter",
        ]
    }
    out.update({
        "cdc_lww_reduce": f"""
            SELECT 'reduced' AS surface, user_id, event_type, value_cents,
                   props, _op
            FROM ({g["cdc_lww_reduce"]})
            UNION ALL
            SELECT 'final', user_id, event_type, value_cents, props,
                   CAST(NULL AS VARCHAR)
            FROM ({g["cdc_final_state"]})
        """,
        "cdc_backfill_modes": f"""
            SELECT 'keyset' AS mode, user_id AS key, name,
                   CAST(NULL AS BIGINT) AS total_cents,
                   resumed_mid_backfill, backfill_completed
            FROM ({g["cdc_chunked_backfill"]})
            UNION ALL
            SELECT 'range', user_id, name, CAST(NULL AS BIGINT),
                   resumed_mid_backfill, backfill_completed
            FROM ({g["cdc_range_backfill"]})
            UNION ALL
            SELECT 'chunk_plan', o_orderkey, o_orderpriority, total_cents,
                   CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN)
            FROM ({g["cdc_chunk_query"]})
        """,
        "cdc_wire_replays": wire,
        "cdc_snapshot_progress": """
            SELECT 'snapshot' AS phase, 't' AS table_name,
                   CAST(2 AS BIGINT) AS tables_total,
                   CAST(1 AS BIGINT) AS tables_completed,
                   (SELECT count(*) FROM customer) AS rows_scanned,
                   CAST(NULL AS BIGINT) AS chunk_id,
                   CAST(NULL AS BIGINT) AS chunk_rows,
                   CAST(NULL AS BIGINT) AS batches,
                   CAST(NULL AS BIGINT) AS events_seen,
                   CAST(NULL AS BOOLEAN) AS lag_positive
            UNION ALL
            SELECT 'backfill', 't', NULL, NULL, NULL,
                   CAST(4 AS BIGINT), (SELECT count(*) FROM customer),
                   NULL, NULL, NULL
            UNION ALL
            SELECT 'streaming', 'source_code_repos', NULL, NULL, NULL,
                   NULL, NULL, CAST(1 AS BIGINT), CAST(5000 AS BIGINT),
                   true
        """,
        "cdc_streaming_lww": """
            WITH last AS (
              SELECT user_id, event_type, value, props, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY event_id DESC) rn
              FROM events)
            SELECT 'lww' AS kind, user_id AS k,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE event_type END AS event_type,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE CAST(round(value * 100) AS BIGINT)
                        END AS value_cents,
                   CASE WHEN event_type='error' THEN NULL
                        ELSE props END AS props,
                   CASE WHEN event_type='error' THEN 'd' ELSE 'u' END AS _op,
                   event_id AS offset
            FROM last WHERE rn = 1
            UNION ALL
            SELECT 'win', (epoch_ms(ts) // 60000) * 60000,
                   CAST(NULL AS VARCHAR), CAST(count(*) AS BIGINT),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
                   max(event_id)
            FROM events GROUP BY 2
        """,
        "cdc_routers": f"""
            SELECT 'content' AS router, route,
                   CAST(NULL AS VARCHAR) AS detail, n
            FROM ({g["cdc_content_router"]})
            UNION ALL
            SELECT 'logical', route, physical, n
            FROM ({g["cdc_logical_table_router"]})
            UNION ALL
            SELECT 'partition', CAST(part AS VARCHAR),
                   CAST(NULL AS VARCHAR), n
            FROM ({g["cdc_partition_routing"]})
        """,
        "cdc_timezone": f"""
            SELECT 'all' AS variant, a.event_id AS offset,
                   CAST(NULL AS VARCHAR) AS src_table, a.ts_nyc AS ts_out
            FROM ({g["cdc_timezone"]}) a
            UNION ALL
            SELECT 'scoped', s.offset, s.src_table, s.ts_out
            FROM ({g["cdc_timezone_scoped"]}) s
        """,
        "cdc_serializer_roundtrips": f"""
            SELECT f.fmt, b.op, b.ts_ms, b.user_id, b.pos, b.offset
            FROM ({g["cdc_envelope_json_roundtrip"]}) b
            CROSS JOIN (SELECT unnest([{fmt_arr}]) AS fmt) f
        """,
        "dedup_pairs": f"""
            SELECT 'minhash_lsh' AS method, doc_a, doc_b,
                   CAST(NULL AS BIGINT) AS jaccard_ppm
            FROM ({g["dedup_minhash_lsh"]})
            UNION ALL
            SELECT 'ngram_jaccard', doc_a, doc_b, jaccard_ppm
            FROM ({g["dedup_ngram_jaccard"]})
        """,
        "dedup_embedding_clusters": f"""
            SELECT 'pair' AS kind, id_a AS a, id_b AS b, cos_ppm AS v
            FROM ({g["dedup_embedding"]})
            UNION ALL
            SELECT 'cluster', doc, cluster, CAST(NULL AS BIGINT)
            FROM ({g["dedup_clusters"]})
            UNION ALL
            SELECT 'semdedup', vec_id, CAST(cell AS BIGINT),
                   CAST(keep AS BIGINT)
            FROM ({g["dedup_semdedup"]})
        """,
        "dedup_lines_spans": f"""
            SELECT l.doc_id, l.clean_text, l.n_kept, l.n_removed,
                   s.n_windows, s.dup_windows, s.dup_ppm
            FROM ({g["dedup_lines"]}) l
            LEFT JOIN ({g["dedup_span_stats"]}) s USING (doc_id)
        """,
        "dedup_incremental": f"""
            SELECT 'exact' AS kind, CAST(NULL AS INTEGER) AS band,
                   fingerprint AS sig, first_doc_id
            FROM ({g["dedup_incremental"]})
            UNION ALL
            SELECT 'near', band, band_sig, first_doc_id
            FROM ({g["dedup_incremental_near"]})
        """,
        "ann_topk": f"""
            SELECT 'brute' AS method, query_id, neighbor_id, rank, cos_ppm
            FROM ({g["ann_cosine_topk"]})
            UNION ALL
            SELECT 'ivf', query_id, neighbor_id, rank, cos_ppm
            FROM ({g["ann_ivf_topk"]})
        """,
        "text_stats": f"""
            SELECT t.doc_id, t.n_tokens, t.mwl_e2, t.stop_ppm,
                   t.quality_ppm, t.lang_pred, t.fingerprint,
                   b.n_bpe_tokens, s.n_chars,
                   s.latin_ppm, s.cjk_ppm, s.cyrillic_ppm, s.arabic_ppm,
                   s.digit_ppm, s.space_ppm, s.other_ppm, s.dominant
            FROM ({g["text_stats"]}) t
            JOIN ({g["text_bpe_token_count"]}) b USING (doc_id)
            JOIN ({g["text_script_mix"]}) s USING (doc_id)
        """,
        "mm_pipeline": f"""
            SELECT 'decode' AS stage, doc_id, n_bytes AS n1,
                   CAST(width AS BIGINT) AS n2, CAST(height AS BIGINT) AS n3,
                   format AS label, content_sha AS sha
            FROM ({g["mm_decode_meta"]})
            UNION ALL
            SELECT 'frame', doc_id, CAST(frame_idx AS BIGINT),
                   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                   CAST(NULL AS VARCHAR), frame_sha
            FROM ({g["mm_frame_sample"]})
        """,
        "curation_scores": f"""
            SELECT r.doc_id,
                   r.total_1, r.distinct_1, r.dup_frac_ppm_1,
                   r.total_2, r.distinct_2, r.dup_frac_ppm_2,
                   r.total_3, r.distinct_3, r.dup_frac_ppm_3,
                   w.n_tokens AS wr_tokens, w.oov_ppm, w.score_e4
            FROM ({g["curation_repetition"]}) r
            JOIN ({g["curation_word_rank_score"]}) w USING (doc_id)
        """,
        "curation_verdicts": f"""
            SELECT 'contamination' AS kind, doc_id, bench_id AS v1,
                   n_hits AS v2, CAST(NULL AS BIGINT) AS v3,
                   CAST(NULL AS VARCHAR) AS reasons,
                   CAST(NULL AS BOOLEAN) AS keep
            FROM ({g["curation_contamination"]})
            UNION ALL
            SELECT 'quality', doc_id, n_tokens, dup_frac_ppm_2, mwl_e2,
                   reasons, keep
            FROM ({g["curation_quality_verdicts"]})
        """,
        "curation_sampling": f"""
            SELECT 'sample' AS kind, CAST(doc_id AS VARCHAR) AS key,
                   lang, source,
                   CAST(NULL AS BIGINT) AS source_tokens,
                   CAST(NULL AS BIGINT) AS target_tokens,
                   CAST(NULL AS BIGINT) AS rate_ppm
            FROM ({g["curation_stratified_sample"]})
            UNION ALL
            SELECT 'mixture', source, CAST(NULL AS VARCHAR), source,
                   source_tokens, target_tokens, rate_ppm
            FROM ({g["curation_mixture_plan"]})
        """,
    })
    return out
