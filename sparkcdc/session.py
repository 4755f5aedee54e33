"""SparkSession factory tuned for the CDC workload.

Local mode is a single JVM; on a real cluster the same config applies per
executor. AQE is on so merge joins re-plan at runtime (skew-join splitting,
partition coalescing) — this is the production path for hot-repo skew.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkcdc",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism in local mode; on a cluster this would be
        # 2-3x total cores and AQE coalesces downward.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = int(cpus) if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd beats lz4 here: shuffle bytes are mostly high-entropy hex
        # (sha-derived), and fewer spill/page-cache bytes measurably beats
        # the lighter codec (+11% replay throughput, BASELINE.md)
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # write timestamps as annotated INT64 micros (not legacy INT96) so
        # pyarrow task-side reads (compaction) see the exact Spark type
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # TypedImperativeAggregates (collect_list/set, percentile) plan as
        # ObjectHashAggregate, which silently falls back to SORT-based
        # aggregation after 128 distinct keys per task (the default) —
        # raise it so they stay hash-based. NOTE: max_by with a struct
        # buffer is a DeclarativeAggregate and plans as SortAggregate
        # regardless (verified on the physical plan) — that sort is
        # intrinsic to whole-row LWW in Spark and is exactly why the
        # narrow/refetch reduce strategies exist (their max(long) is a
        # plain HashAggregate).
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                "16777216")
        # the narrow LWW reduce semi-joins a winners set of (key, offset)
        # rows back to the batch; it is deliberately UN-hinted so huge key
        # counts degrade gracefully to a shuffled join instead of OOMing a
        # mandatory broadcast — raise the auto threshold so AQE still
        # broadcasts the common case (millions of keys ≈ tens of MB)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # task-side output commit (v2): v1's driver-side serial rename of
        # one file per bucket per commit is pure serial tail. The weaker
        # job-commit atomicity of v2 is irrelevant here — files become
        # visible only via the table's own atomic manifest commit, which
        # is the actual transaction boundary (+4% replay, measured)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
                "2")
        # no _SUCCESS markers: visibility is decided by the manifest, and
        # the marker is one more serial driver fs op per commit
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
                "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARKCDC_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
