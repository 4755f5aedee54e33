"""Interleaved same-window A/B of the 32M-event replay between two
checkouts of this repo (e.g. HEAD vs a round-tag worktree), one fresh
JVM per leg, order A B B A — the same discipline as tools/ab_refetch.py
but across TREES instead of configs. Used to separate host-regime drift
from code regressions when a round's bench numbers move.

Usage: python tools/ab_replay_tree.py TREE_A TREE_B [legs_per_side]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
os.chdir(tree)
from bench import REPLAY_EVENTS, run_replay, _fast_local_conf, CPUS
from sparkcdc.session import get_spark
spark = get_spark(
    "ab-replay", master=f"local[{CPUS}]", shuffle_partitions=CPUS,
    extra_conf={
        "spark.driver.extraJavaOptions":
            "-Xms24g -XX:+AlwaysPreTouch -XX:+UseParallelGC",
        "spark.driver.memory": "24g",
        **_fast_local_conf(),
    },
)
run_replay(spark, 1_000_000, n_parts=CPUS)  # JIT/codegen warmup
t0 = time.time()
st = run_replay(spark, REPLAY_EVENTS, n_parts=CPUS)
print(json.dumps({"sec": round(time.time() - t0, 3),
                  "eps": st["events_per_sec"]}))
"""


def leg(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, tree],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    order = ("A", "B", "B", "A") if n == 2 else ("A", "B") * n
    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for side in order:
        r = leg(tree_a if side == "A" else tree_b)
        runs[side].append(r)
        print(f"{side}: {r}", flush=True)
    best = {s: max(r["eps"] for r in runs[s]) for s in runs}
    print(json.dumps({
        "tree_a": tree_a, "tree_b": tree_b, "order": order,
        "runs": runs, "best_eps": best,
        "a_over_b": round(best["A"] / best["B"], 3),
    }))


if __name__ == "__main__":
    main()
