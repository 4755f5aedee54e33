"""Generator determinism + envelope-shape tests (SURVEY §1.1)."""

from pyspark.sql import functions as F

from pyspark.sql import types as T

from sparkcdc.envelope import cdc_events, envelope_schema, snapshot_events


def relax(dt):
    """Schema equality ignoring nullability (Spark tightens non-null lits)."""
    if isinstance(dt, T.StructType):
        return T.StructType([T.StructField(f.name, relax(f.dataType), True) for f in dt])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(relax(dt.elementType), True)
    return dt


def test_schema_matches_contract(spark):
    df = cdc_events(spark, 10)
    assert relax(df.schema) == relax(envelope_schema())


def test_deterministic_and_sliceable(spark):
    whole = cdc_events(spark, 200, seed=7).orderBy("offset").collect()
    again = cdc_events(spark, 200, seed=7).orderBy("offset").collect()
    assert whole == again
    # slicing the stream produces byte-identical events (resume correctness)
    part = cdc_events(spark, 80, start=120, seed=7).orderBy("offset").collect()
    assert part == whole[120:]


def test_op_shape_invariants(spark):
    df = cdc_events(spark, 500)
    bad_d = df.filter((F.col("op") == "d") & F.col("after").isNotNull()).count()
    bad_c = df.filter((F.col("op") == "c") & F.col("before").isNotNull()).count()
    assert bad_d == 0 and bad_c == 0
    # all events of one key share one part_id (ordering invariant)
    parts = (
        df.selectExpr("after.repo as repo", "after.path as path", "part_id")
        .where("repo is not null")
        .groupBy("repo", "path")
        .agg(F.countDistinct("part_id").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert parts == 1


def test_hot_key_skew(spark):
    df = cdc_events(spark, 2000, hot_key_permille=300)
    hot = df.filter(F.col("after.path") == "src/k_000000.py").count()
    assert hot > 400  # ~30% of events routed to key 0


def test_tombstones_follow_deletes(spark):
    df = cdc_events(spark, 300, tombstones=True)
    n_d = df.filter((F.col("op") == "d") & (~F.col("tombstone"))).count()
    n_t = df.filter(F.col("tombstone")).count()
    assert n_d == n_t > 0
    assert df.filter(F.col("tombstone") & F.col("after").isNotNull()).count() == 0


def test_snapshot_events_are_reads(spark):
    src = spark.createDataFrame(
        [("r1", "p1", "c" * 40, "py", "body")],
        ["repo", "path", "commit", "lang", "content"],
    )
    env = snapshot_events(src)
    row = env.first()
    assert row.op == "r"
    assert row.source.snapshot == "true"
    assert row.after.content == "body"
    assert relax(env.schema) == relax(envelope_schema())
