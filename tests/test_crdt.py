"""State-based CRDT counters: merge algebra (associative, commutative,
idempotent) and value reads against hand ground truth."""

from sparkcdc.functions.crdt import (
    g_counter_value,
    merge_counter_states,
    pn_counter_value,
)


def _states(spark, rows):
    return spark.createDataFrame(
        rows, "key string, replica int, adds long, removes long"
    )


def test_pn_counter_value_and_idempotence(spark):
    # replica 0 reports twice (retry) — the stale and fresh cumulative
    # states must merge to the fresh one, not add up
    s = _states(spark, [
        ("a", 0, 3, 1),
        ("a", 0, 5, 2),   # later cumulative state of the same replica
        ("a", 1, 4, 0),
        ("b", 0, 7, 7),
    ])
    out = {r.key: r for r in pn_counter_value(s, ["key"]).collect()}
    assert out["a"].adds == 9 and out["a"].removes == 2
    assert out["a"].value == 7
    assert out["b"].value == 0

    # idempotence: merging the full state with itself changes nothing
    doubled = pn_counter_value(merge_counter_states(s, s), ["key"])
    assert {tuple(r) for r in doubled.collect()} == {
        tuple(r) for r in pn_counter_value(s, ["key"]).collect()
    }


def test_g_counter_commutative_merge(spark):
    a = _states(spark, [("k", 0, 10, 0), ("k", 1, 1, 0)])
    b = _states(spark, [("k", 0, 12, 0), ("k", 2, 5, 0)])
    ab = g_counter_value(merge_counter_states(a, b), ["key"]).first()
    ba = g_counter_value(merge_counter_states(b, a), ["key"]).first()
    assert ab.value == ba.value == 12 + 1 + 5


def test_counter_over_duplicated_event_stream(spark):
    """The engine-world use: per-partition cumulative counts derived from
    an event stream, with one partition's states redelivered — the merged
    value still equals the exact distinct-event count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = (Window.partitionBy("event_type", F.pmod("user_id", F.lit(4)))
         .orderBy("event_id"))
    states = ev.select(
        F.col("event_type").alias("key"),
        F.pmod("user_id", F.lit(4)).cast("int").alias("replica"),
        F.row_number().over(w).cast("long").alias("adds"),
        F.lit(0).cast("long").alias("removes"),
    )
    redelivered = merge_counter_states(
        states, states.filter("replica = 0")
    )
    got = {r.key: r.value for r in
           pn_counter_value(redelivered, ["key"]).collect()}
    want = {r.event_type: r["cnt"] for r in
            ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    assert got == want
