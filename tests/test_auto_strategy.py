"""reduce_strategy='auto' selection matrix (round-2 verdict 'What's wrong
#3' / 'Next round #5'): the engine must not default wide-row replays onto
the fat payload-shuffle plan. The chosen strategy is recorded per batch in
the metrics log, which is what these tests assert."""

from sparkcdc.engine import EngineConfig, default_engine
from sparkcdc.envelope import cdc_events


def _mk(spark, root, **cfg):
    base = dict(batch_size=1000, n_keys=50, n_parts=4)
    base.update(cfg)
    return default_engine(
        spark, root, config=EngineConfig(**base), n_buckets=4
    )


def _strategies(eng, kind="replay"):
    return [m.get("strategy") for m in eng.metrics.read() if m["kind"] == kind]


def test_auto_picks_refetch_for_seekable_source(spark, tmp_root):
    # the built-in generator is offset-addressable (closed form) -> the
    # two-phase O(keys)-payload plan wins at every measured row width
    eng = _mk(spark, tmp_root)
    eng.replay(2000)
    assert _strategies(eng) == ["refetch", "refetch"]


def test_auto_picks_narrow_cached_for_unknown_external(spark, tmp_root):
    # external source (no refetch accessor, no width hint): the safe plan
    # shuffles only (key, offset) and probes the persisted batch
    eng = _mk(spark, tmp_root)
    eng.replay(
        1000,
        envelopes_for=lambda lo, hi: cdc_events(
            spark, hi - lo, start=lo, n_keys=50, n_parts=4
        ),
    )
    assert _strategies(eng) == ["narrow_cached"]


def test_auto_picks_fat_for_known_narrow_rows(spark, tmp_root):
    eng = _mk(spark, tmp_root, estimated_row_bytes=128)
    eng.replay(
        1000,
        envelopes_for=lambda lo, hi: cdc_events(
            spark, hi - lo, start=lo, n_keys=50, n_parts=4
        ),
    )
    assert _strategies(eng) == ["fat"]


def test_auto_picks_narrow_cached_for_known_wide_rows(spark, tmp_root):
    eng = _mk(spark, tmp_root, estimated_row_bytes=4096)
    eng.replay(
        1000,
        envelopes_for=lambda lo, hi: cdc_events(
            spark, hi - lo, start=lo, n_keys=50, n_parts=4
        ),
    )
    assert _strategies(eng) == ["narrow_cached"]


def test_auto_snapshot_batches_use_fat(spark, tmp_root):
    from pyspark.sql import functions as F

    eng = _mk(spark, tmp_root)
    src = spark.range(100).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("c").alias("commit"), F.lit("py").alias("lang"),
        F.lit("x").alias("content"),
    )
    eng.run_snapshot(src)
    assert _strategies(eng, kind="snapshot") == ["fat"]


def test_explicit_strategy_is_respected(spark, tmp_root):
    eng = _mk(spark, tmp_root, reduce_strategy="narrow")
    eng.replay(1000)
    assert _strategies(eng) == ["narrow"]
