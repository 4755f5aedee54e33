"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "replay_events_per_sec": ...}

Usage:
  python bench.py                 # the driver's per-round benchmark
  python bench.py --scaling       # same replay job at local[8] vs local[32]
                                  # → prints throughput + scaling efficiency
                                  # (the sandbox stand-in for N vs 4N executors)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: replay volume for the headline CDC metric (events), scaled so the bench
#: finishes in minutes at any sf while batches stay large enough to
#: amortize fixed per-batch cost
REPLAY_EVENTS = 4_000_000
REPLAY_KEYS = 200_000
REPLAY_BATCH = 2_000_000


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_replay(spark, n_events: int, n_parts: int, *, salt_buckets: int = 0,
               hot_key_permille: int = 0) -> dict:
    """The north-star job: generated envelope stream → per-key reduce →
    bucketed MERGE, measured end-to-end including commits."""
    from sparkcdc.engine import EngineConfig, default_engine

    root = tempfile.mkdtemp(prefix="sparkcdc_bench_")
    try:
        eng = default_engine(
            spark, root, n_buckets=64,
            config=EngineConfig(
                batch_size=REPLAY_BATCH, n_keys=REPLAY_KEYS, n_parts=n_parts,
                salt_buckets=salt_buckets, hot_key_permille=hot_key_permille,
            ),
        )
        return eng.replay(n_events)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline operator queries (subset of __spark_entry__.queries),
    each fully materialized via a cheap count-style action."""
    import __spark_entry__ as em

    names = [
        "cdc_lww_reduce",
        "cdc_extract_new_record_state",
        "cdc_incremental_snapshot",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_cosine_topk",
        "text_stats",
        "mm_decode_meta",
    ]
    qs = em.queries()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    from sparkcdc.session import get_spark

    if "--scaling" in sys.argv:
        # same job, two parallelism levels on identical input — evidences
        # the north_rule's N -> 4N scaling criterion in a single-host sandbox
        results = {}
        for cores in (8, 32):
            spark = get_spark(
                f"sparkcdc-bench-{cores}", master=f"local[{cores}]",
                shuffle_partitions=cores,
            )
            run_replay(spark, 200_000, n_parts=cores)  # warmup JIT/codegen
            st = run_replay(spark, REPLAY_EVENTS, n_parts=cores)
            results[cores] = st["events_per_sec"]
            spark.stop()
        eff = results[32] / (4 * results[8])
        print(json.dumps({
            "scaling": {
                "local8_events_per_sec": round(results[8]),
                "local32_events_per_sec": round(results[32]),
                "cores_ratio": 4,
                "scaling_efficiency": round(eff, 3),
            }
        }))
        return

    spark = get_spark("sparkcdc-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    t_total0 = time.time()

    t0 = time.time()
    replay_stats = run_replay(spark, REPLAY_EVENTS, n_parts=CPUS)
    replay_sec = round(time.time() - t0, 3)

    queries = {"cdc_replay_4m": replay_sec}
    queries.update(bench_queries(spark, SF_DIR))

    total = round(time.time() - t_total0, 3)
    print(json.dumps({
        "metric": "sparkcdc headline: 4M-event CDC replay (gen→reduce→merge) + operator suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "replay_events_per_sec": round(replay_stats["events_per_sec"]),
    }))


if __name__ == "__main__":
    main()
