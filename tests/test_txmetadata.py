"""Transaction metadata component (A3) —
core/pipeline/txmetadata/TransactionMonitor.java:31-117 semantics."""

from pyspark.sql import functions as F

from sparkcdc.envelope import cdc_events
from sparkcdc.txmetadata import (
    collection_counts,
    transaction_markers,
    with_transaction_metadata,
)


def test_transaction_block_orders(spark):
    env = cdc_events(spark, 250, n_keys=20, n_parts=4)
    out = with_transaction_metadata(env)  # tx = offset div 100
    rows = out.select("offset", "transaction.*").collect()
    by_tx = {}
    for r in rows:
        by_tx.setdefault(r["id"], []).append(r)
    assert set(by_tx) == {"0", "1", "2"}
    for tx, rs in by_tx.items():
        rs = sorted(rs, key=lambda r: r["offset"])
        # total_order is the 1-based position of the event inside its tx
        assert [r["total_order"] for r in rs] == list(range(1, len(rs) + 1))
        # data_collection_order counts within (tx, table); single source
        # table here → identical to total_order
        assert [r["data_collection_order"] for r in rs] == [
            r["total_order"] for r in rs
        ]


def test_markers_begin_end_counts(spark):
    env = cdc_events(spark, 250, n_keys=20, n_parts=4)
    mk = transaction_markers(env)
    rows = {(r["tx_id"], r["status"]): r for r in mk.collect()}
    assert len(rows) == 6  # 3 txs × BEGIN+END
    end0 = rows[("0", "END")]
    assert end0["event_count"] == 100
    assert end0["first_offset"] == 0 and end0["last_offset"] == 99
    begin0 = rows[("0", "BEGIN")]
    # BEGIN precedes data events: counts unknown (NULL), offsets known
    assert begin0["event_count"] is None
    end2 = rows[("2", "END")]
    assert end2["event_count"] == 50  # partial last tx


def test_collection_counts_sum_to_totals(spark):
    env = cdc_events(spark, 200, n_keys=20, n_parts=4)
    cc = collection_counts(env)
    total = cc.groupBy("tx_id").agg(F.sum("event_count").alias("n")).collect()
    assert {r["tx_id"]: r["n"] for r in total} == {"0": 100, "1": 100}


def test_engine_emits_tx_log(spark, tmp_root):
    from sparkcdc.engine import CdcEngine, EngineConfig
    from sparkcdc.lake import LakeTable

    t = LakeTable.create(
        spark, tmp_root, "t",
        fields=[("repo", "string"), ("path", "string"), ("commit", "string"),
                ("lang", "string"), ("content", "string")],
        key_cols=["repo", "path"], n_buckets=4,
    )
    eng = CdcEngine(spark, t, EngineConfig(
        batch_size=100, n_keys=20, n_parts=4,
        provide_transaction_metadata=True,
    ))
    eng.replay(300)
    log = eng.tx_log()
    assert log is not None
    # one BEGIN + one END per tx, tagged with the emitting batch
    sts = log.groupBy("status").count().collect()
    assert {r["status"]: r["count"] for r in sts} == {"BEGIN": 3, "END": 3}
    assert log.select("__batch").distinct().count() == 3
