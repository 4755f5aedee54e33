"""A/B the refetch headline (cdc_replay_refetch_64m) between configs in
ONE window (VERDICT r3 'What's wrong #2': refetch regressed 15% r2→r3
while everything else got faster — suspect merge_adaptive / RAM-shuffle
interaction).

Each sample is a fresh subprocess running exactly the headline's refetch
job (64M events, one 64M batch, local[32]); configs are interleaved
A B B A B A so monotone host drift cancels. Prints one JSON line with
per-config times and the verdict.

Usage: python tools/ab_refetch.py [--runs N] [--events N]
Configs (selected with --worker <name>):
  r3: merge_adaptive=auto (AQE off for join-free merges), /dev/shm local dir
  r2: merge_adaptive=on   (AQE stays on),                default local dir
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(os.environ.get("SPARKCDC_AB_EVENTS", 64_000_000))

CONFIGS = {
    "r3": {"SPARKCDC_MERGE_ADAPTIVE": "auto"},
    "r2": {"SPARKCDC_MERGE_ADAPTIVE": "on", "SPARKCDC_LOCAL_DIR": ""},
    # isolating the two factors:
    "r3_aqe_on": {"SPARKCDC_MERGE_ADAPTIVE": "on"},
    "r3_disk_shuffle": {"SPARKCDC_MERGE_ADAPTIVE": "auto",
                        "SPARKCDC_LOCAL_DIR": ""},
}


def _worker(name: str) -> None:
    from bench import _fast_local_conf, run_replay
    from sparkcdc.session import get_spark

    spark = get_spark(
        f"ab-refetch-{name}", master="local[32]", shuffle_partitions=32,
        extra_conf={
            "spark.driver.extraJavaOptions":
                "-Xms24g -XX:+AlwaysPreTouch -XX:+UseParallelGC",
            "spark.driver.memory": "24g",
            **_fast_local_conf(),
        },
    )
    run_replay(spark, 1_000_000, n_parts=32)  # warmup
    t0 = time.time()
    st = run_replay(spark, EVENTS, n_parts=32, batch_size=EVENTS,
                    strategy="refetch")
    print(json.dumps({"config": name, "sec": round(time.time() - t0, 3),
                      "eps": round(st["events_per_sec"])}))


def main() -> None:
    if "--worker" in sys.argv:
        _worker(sys.argv[sys.argv.index("--worker") + 1])
        return
    names = (sys.argv[sys.argv.index("--configs") + 1].split(",")
             if "--configs" in sys.argv else ["r3", "r2"])
    a, b = names[0], names[1]
    order = [a, b, b, a, b, a]
    results: dict[str, list[dict]] = {n: [] for n in names}
    for name in order:
        env = {**os.environ, **CONFIGS[name]}
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", name],
            capture_output=True, text=True, check=True, env=env,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        results[name].append(r)
        print(f"  {name}: {r['sec']}s ({r['eps']:,} eps)", file=sys.stderr)
    best = {n: max(r["eps"] for r in rs) for n, rs in results.items()}
    med = {n: sorted(r["eps"] for r in rs)[len(rs) // 2]
           for n, rs in results.items()}
    print(json.dumps({
        "events": EVENTS,
        "best_eps": best,
        "median_eps": med,
        "all": results,
        "winner_by_best": max(best, key=best.get),
    }))


if __name__ == "__main__":
    main()
