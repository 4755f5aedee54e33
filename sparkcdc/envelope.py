"""The Debezium change-event envelope as a Spark StructType, plus a
deterministic, closed-form synthetic envelope generator.

Reference semantics:
- envelope fields / ops: core/data/Envelope.java:37-127
  (READ "r", CREATE "c", UPDATE "u", DELETE "d", TRUNCATE "t", MESSAGE "m";
  fields before/after/op/source/transaction/ts_ms)
- source block: core/connector/AbstractSourceInfo.java:22-33 and
  binlog/BinlogSourceInfo.java:90-97 (file/pos/row/gtid)
- tombstones: core/pipeline/EventDispatcher.java:519 (null-value record after
  each DELETE, for Kafka log compaction)
- snapshot marker values: core/connector/SnapshotRecord.java:16-44

The generator replaces the reference's binlog tail
(binlog/BinlogStreamingChangeEventSource.java:128-199) with a pure
``spark.range`` pipeline: every column is a deterministic closed-form
expression of the global event id, so any slice ``[lo, hi)`` of a 10^10-event
stream can be produced on demand with zero state, zero shuffle and zero
Python — this is what makes full-scale replay benchmarkable without ever
materializing the stream.

Ordering invariant (cf. binlog/BinlogOffsetContext.java:325-336): events for
one key all live in one ``part_id`` (hash routing, PartitionRouting.java:241)
and are strictly ordered by ``offset`` within it. Here offset == global id,
which is monotonic everywhere, so the invariant holds trivially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------

#: north-star row schema (BASELINE.json input_hint): source-code repo files
REPO_ROW_FIELDS = [
    ("repo", T.StringType()),
    ("path", T.StringType()),
    ("commit", T.StringType()),
    ("lang", T.StringType()),
    ("content", T.StringType()),
]

#: primary key of the north-star table
REPO_KEY = ["repo", "path"]

LANGS = ["py", "java", "ts", "go", "rs", "c", "cpp", "rb", "scala", "sql"]

OPS = ["r", "c", "u", "d", "t", "m"]  # Envelope.java:37-63


def row_struct(fields: list[tuple[str, T.DataType]] | None = None) -> T.StructType:
    fields = fields or REPO_ROW_FIELDS
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def source_struct() -> T.StructType:
    # AbstractSourceInfo.java:22-33 + BinlogSourceInfo.java:90-97
    return T.StructType(
        [
            T.StructField("name", T.StringType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("snapshot", T.StringType(), True),
            T.StructField("file", T.StringType(), True),
            T.StructField("pos", T.LongType(), True),
            T.StructField("row", T.IntegerType(), True),
            T.StructField("gtid", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def transaction_struct() -> T.StructType:
    # core/pipeline/txmetadata/TransactionMonitor.java transaction block
    return T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("total_order", T.LongType(), True),
            T.StructField("data_collection_order", T.LongType(), True),
        ]
    )


def envelope_schema(
    row_fields: list[tuple[str, T.DataType]] | None = None,
) -> T.StructType:
    """Envelope.java:90-127 as a StructType, plus replay bookkeeping columns
    (part_id/offset/tombstone) that Kafka would carry as partition/offset."""
    rs = row_struct(row_fields)
    return T.StructType(
        [
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("before", rs, True),
            T.StructField("after", rs, True),
            T.StructField("source", source_struct(), True),
            T.StructField("transaction", transaction_struct(), True),
            T.StructField("part_id", T.IntegerType(), True),
            T.StructField("offset", T.LongType(), True),
            T.StructField("tombstone", T.BooleanType(), True),
        ]
    )


# ---------------------------------------------------------------------------
# Deterministic generator (closed-form; scales to 10^10)
# ---------------------------------------------------------------------------


# (hash primitive: xxhash64 — JVM-side and stable across runs/versions for
# fixed input, unlike F.hash's seed behavior; used as SQL text below)


def cdc_events(
    spark: SparkSession,
    n_events: int,
    *,
    start: int = 0,
    n_keys: int = 1000,
    n_repos: int = 50,
    n_parts: int = 8,
    seed: int = 42,
    hot_key_permille: int = 0,
    content_chars: int = 64,
    delete_pct: int = 5,
    tombstones: bool = False,
    base_ts_ms: int = 1_700_000_000_000,
) -> DataFrame:
    """Generate envelope rows for global event ids ``[start, start+n_events)``.

    Closed-form per-id columns; no shuffle, no state. ``hot_key_permille``
    routes that fraction of events to key 0 (the "hot repo" for skew tests,
    cf. SURVEY §4 hot-key salting note).
    """
    return cdc_events_over_ids(
        spark.range(start, start + n_events).toDF("id"),
        n_keys=n_keys, n_repos=n_repos, n_parts=n_parts, seed=seed,
        hot_key_permille=hot_key_permille, content_chars=content_chars,
        delete_pct=delete_pct, tombstones=tombstones, base_ts_ms=base_ts_ms,
    )


def cdc_events_over_ids(
    ids: DataFrame,
    *,
    n_keys: int = 1000,
    n_repos: int = 50,
    n_parts: int = 8,
    seed: int = 42,
    hot_key_permille: int = 0,
    content_chars: int = 64,
    delete_pct: int = 5,
    tombstones: bool = False,
    base_ts_ms: int = 1_700_000_000_000,
) -> DataFrame:
    """The generator as a pure projection over an ``id`` column — works on
    batch AND streaming DataFrames (streaming.py maps the rate source's
    ``value`` through this, so streamed and batch replays of the same
    offsets are byte-identical).

    Plan-shape note: everything below is inlined into ONE select (no
    intermediate withColumn Projects) — shared sub-expressions are
    duplicated textually on purpose so the optimizer keeps a single
    Project (whole-stage codegen's common-subexpression elimination
    recovers the sharing at runtime). Caveat, verified on the physical
    plan: a key-only downstream projection still computes the full
    struct because CollapseProject refuses to inline a struct whose
    fields are extracted more than once (the key has two columns), so
    generated-source envelopes don't field-prune. Real columnar sources
    are unaffected — parquet/Kafka scans nested-schema-prune at the
    scan — and the un-pruned work here is pure hash CPU, which the
    scaling bench shows scaling at the host's CPU ceiling.

    Construction-shape note (round-3 scaling finding): the projection is
    built as SQL TEXT and handed to ``selectExpr`` in ONE py4j call.
    Building the same tree through the Column API costs ~2.7 s of
    DRIVER-SERIAL py4j round-trips per micro-batch — identical at every
    parallelism level, so at 8M-event batches it alone capped N→4N
    scaling efficiency (profiled: ~4-5 s serial per batch, of which the
    Column-API build was the largest share). SQL text is parsed JVM-side
    in milliseconds. The expressions are literal-for-literal identical to
    the original Column build (int literals stay INT, doubles use the
    ``D`` suffix) — byte-equality is locked by golden checksums in
    ``test_envelope.py::test_generator_golden_checksums``."""
    create_pct = 30
    uniform_key = f"pmod(xxhash64({seed}, id), {n_keys})"
    if hot_key_permille > 0:
        key = (
            f"CAST(CASE WHEN pmod(xxhash64({seed + 1}, id), 1000) < "
            f"{hot_key_permille} THEN 0 ELSE {uniform_key} END AS BIGINT)"
        )
    else:
        key = f"CAST({uniform_key} AS BIGINT)"

    # keys -> repos with a quadratic ramp: low repo ids own many keys
    # (deterministic layout skew, independent of event-rate skew)
    repo = (
        "format_string('org/repo-%04d', CAST(floor("
        f"pow(CAST({key} AS DOUBLE) / {float(n_keys)!r}D, 2.0D)"
        f" * {float(n_repos)!r}D) AS INT))"
    )
    path = f"format_string('src/k_%06d.py', CAST({key} AS INT))"
    op_rnd = f"pmod(xxhash64({seed + 2}, id), 100)"
    op = (
        f"CASE WHEN {op_rnd} < {delete_pct} THEN 'd' "
        f"WHEN {op_rnd} < {delete_pct + create_pct} THEN 'c' "
        "ELSE 'u' END"
    )
    commit = (
        f"substring(sha2(concat_ws('|', 'commit', {key}, id), 256), 1, 40)"
    )
    langs = ", ".join(f"'{x}'" for x in LANGS)
    lang = (
        f"element_at(array({langs}), "
        f"CAST(pmod({key}, {len(LANGS)}) + 1 AS INT))"
    )
    # content: versioned deterministic body, padded to content_chars
    content = (
        f"rpad(concat_ws(':', 'v', {key}, id, "
        f"sha2(concat_ws('|', 'content', {key}, id), 256)), "
        f"{content_chars}, 'x')"
    )
    after_s = (
        f"named_struct('repo', {repo}, 'path', {path}, 'commit', {commit}, "
        f"'lang', {lang}, 'content', {content})"
    )
    # before: key identity only (apply path never reads non-key before fields;
    # Debezium fills the full old row image, which the generator cannot know
    # statelessly — T2 diff tests use their own fixtures)
    before_s = (
        f"named_struct('repo', {repo}, 'path', {path}, "
        "'commit', CAST(NULL AS STRING), 'lang', CAST(NULL AS STRING), "
        "'content', CAST(NULL AS STRING))"
    )
    part_id = f"CAST(pmod({key}, {n_parts}) AS INT)"
    ts_ms = f"CAST({base_ts_ms} + id AS BIGINT)"
    src = (
        "named_struct('name', 'sparkcdc', 'db', 'code', "
        "'table', 'source_code_repos', 'snapshot', 'false', "
        "'file', format_string('binlog.%06d', CAST(id / 100000 AS INT)), "
        f"'pos', id, 'row', CAST(pmod(id, 1000) AS INT), "
        f"'gtid', concat('srv:1-', id), 'ts_ms', {ts_ms})"
    )
    txn = (
        "CAST(NULL AS STRUCT<id: STRING, total_order: BIGINT, "
        "data_collection_order: BIGINT>)"
    )

    out = ids.selectExpr(
        f"{op} AS op",
        f"{ts_ms} AS ts_ms",
        f"CASE WHEN {op} IN ('u', 'd') THEN {before_s} END AS before",
        f"CASE WHEN {op} != 'd' THEN {after_s} END AS after",
        f"{src} AS source",
        f"{txn} AS transaction",
        f"{part_id} AS part_id",
        "id AS offset",
        "false AS tombstone",
    )
    if tombstones:
        # EventDispatcher.java:519 — synthetic null-value record after each
        # delete; same offset, tombstone flag set, before/after null.
        tomb = out.filter(F.col("op") == "d").select(
            F.lit("d").alias("op"),
            F.col("ts_ms"),
            F.lit(None).cast(row_struct()).alias("before"),
            F.lit(None).cast(row_struct()).alias("after"),
            F.col("source"),
            F.col("transaction"),
            F.col("part_id"),
            F.col("offset"),
            F.lit(True).alias("tombstone"),
        )
        out = out.unionByName(tomb)
    return out.to(envelope_schema())


def snapshot_events(
    source_df: DataFrame,
    *,
    row_cols: list[str] | None = None,
    key_cols: list[str] | None = None,
    n_parts: int = 8,
    snapshot_ts_ms: int = 1_700_000_000_000,
    table_name: str = "source_code_repos",
    db_name: str = "code",
    snapshot_marker: str = "true",
    mark_boundaries: bool = False,
) -> DataFrame:
    """Wrap a consistent table read as op='r' envelopes.

    Reference: RelationalSnapshotChangeEventSource.java:120-182 — the initial
    snapshot emits every existing row as a READ event before streaming starts.
    Here a snapshot is just a pinned read of the source table (Iceberg
    snapshot isolation; no locks, cf. BinlogSnapshotChangeEventSource.java:155-209
    whose FLUSH TABLES WITH READ LOCK this replaces for free).

    ``source.snapshot`` marker granularity (SnapshotRecord.java:16-44):
    ``snapshot_marker`` is the base value ('true', or 'incremental' for
    ad-hoc backfills); with ``mark_boundaries`` the rows holding the
    min/max KEY TUPLE (exact lexicographic struct bounds — collision-free
    by construction, unlike a hash) are tagged
    ``first_in_data_collection`` / ``last_in_data_collection`` so
    downstream consumers can detect per-table snapshot completion (the
    reference's FIRST/LAST markers). The bounds are one scalar aggregate
    — an extra pass over the source, which is why boundary marking is
    opt-in (the engine enables it for the one-time initial snapshot,
    where completion detection is worth one extra scan; trickle paths
    leave it off).
    """
    row_cols = row_cols or [n for n, _ in REPO_ROW_FIELDS]
    key_cols = key_cols or REPO_KEY
    after_s = F.struct(*[F.col(c) for c in row_cols])
    row_schema = T.StructType(
        [source_df.schema[c] for c in row_cols]
    )
    # hash routing of keys to partitions (PartitionRouting.java:241)
    key_hash = F.xxhash64(*[F.col(c) for c in key_cols])
    marker = F.lit(snapshot_marker)
    if mark_boundaries:
        key_struct = F.struct(*[F.col(c) for c in key_cols])
        bounds = source_df.agg(
            F.min(key_struct).alias("lo"), F.max(key_struct).alias("hi")
        ).first()
        if bounds["lo"] is not None:
            def _lit_struct(row):
                return F.struct(*[
                    F.lit(row[c]).alias(c) for c in key_cols
                ])

            marker = (
                F.when(key_struct == _lit_struct(bounds["lo"]),
                       F.lit("first_in_data_collection"))
                .when(key_struct == _lit_struct(bounds["hi"]),
                      F.lit("last_in_data_collection"))
                .otherwise(marker)
            )
    src = F.struct(
        F.lit("sparkcdc").alias("name"),
        F.lit(db_name).alias("db"),
        F.lit(table_name).alias("table"),
        marker.alias("snapshot"),  # SnapshotRecord.java:16-44
        F.lit(None).cast("string").alias("file"),
        F.lit(-1).cast("long").alias("pos"),
        F.lit(0).alias("row"),
        F.lit(None).cast("string").alias("gtid"),
        F.lit(snapshot_ts_ms).cast("long").alias("ts_ms"),
    )
    return source_df.select(
        F.lit("r").alias("op"),
        F.lit(snapshot_ts_ms).cast("long").alias("ts_ms"),
        F.lit(None).cast(row_schema).alias("before"),
        after_s.alias("after"),
        src.alias("source"),
        F.lit(None).cast(transaction_struct()).alias("transaction"),
        F.pmod(key_hash, F.lit(n_parts)).cast("int").alias("part_id"),
        F.lit(-1).cast("long").alias("offset"),  # snapshot sorts before all log offsets
        F.lit(False).alias("tombstone"),
    )
