"""Same-window scaling decomposition (north-rule evidence): three loads
at local[8] vs local[32], interleaved in one window —

  calib     pure-CPU sha256 (allocation-free, L1-resident): what the
            host's cores can deliver, no memory pressure
  generate  the envelope generator alone → noop write (allocation-heavy
            string pipeline, NO shuffle, NO engine, NO commit): the
            irreducible compute of any replay on this host
  pipeline  the full refetch replay (generate → two-phase reduce →
            bucketed MOR merge + commit), the north-star job

If pipeline-efficiency ≈ generate-efficiency < calib-efficiency, the
scaling gap lives in the host's shared memory path (string allocation
bandwidth at 32 threads on one socket), not in the engine's plan — a
real N→4N executor scale-out brings 4× memory controllers and the gap
term vanishes by construction.

Usage: python tools/scaling_profile.py [--events N]
Prints one JSON line with per-load throughputs and efficiencies.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(os.environ.get("SPARKCDC_PROFILE_EVENTS", 128_000_000))


def _worker(load: str, cores: int) -> None:
    from bench import _fast_local_conf, run_replay
    from sparkcdc.session import get_spark

    spark = get_spark(
        f"profile-{load}-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.driver.extraJavaOptions":
                "-Xms24g -XX:+AlwaysPreTouch -XX:+UseParallelGC",
            "spark.driver.memory": "24g",
            **_fast_local_conf(),
        },
    )
    if load == "generate":
        from sparkcdc.envelope import cdc_events

        cdc_events(spark, 1_000_000, n_keys=200_000,
                   n_parts=cores * 2).write.format("noop").mode(
                       "overwrite").save()  # warmup
        t0 = time.time()
        cdc_events(spark, EVENTS, n_keys=200_000,
                   n_parts=cores * 2).write.format("noop").mode(
                       "overwrite").save()
        eps = EVENTS / (time.time() - t0)
    elif load == "pipeline":
        run_replay(spark, 1_000_000, n_parts=cores * 2)  # warmup
        st = run_replay(spark, EVENTS, n_parts=cores * 2,
                        batch_size=EVENTS, strategy="refetch")
        eps = st["events_per_sec"]
    else:
        raise ValueError(load)
    print(json.dumps({"load": load, "cores": cores, "eps": round(eps)}))


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker(sys.argv[i + 1], int(sys.argv[i + 2]))
        return
    from bench import _cpu_calibration

    # interleave: (load, cores) pairs ordered so the two levels of each
    # load bracket each other inside one window
    runs: dict[str, dict[int, list[float]]] = {
        "generate": {8: [], 32: []}, "pipeline": {8: [], 32: []},
    }
    order = [("generate", 8), ("pipeline", 8), ("generate", 32),
             ("pipeline", 32), ("generate", 32), ("pipeline", 32),
             ("generate", 8), ("pipeline", 8)]
    for load, cores in order:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             load, str(cores)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        runs[load][cores].append(r["eps"])
        print(f"  {load}@{cores}: {r['eps']:,} eps", file=sys.stderr)
    calib = _cpu_calibration()
    result = {"events": EVENTS, "cpu_calibration": calib}
    for load, by_cores in runs.items():
        b8, b32 = max(by_cores[8]), max(by_cores[32])
        result[load] = {
            "local8_eps": round(b8), "local32_eps": round(b32),
            "efficiency": round(b32 / (4 * b8), 3),
            "all": {k: [round(v) for v in vs] for k, vs in by_cores.items()},
        }
    result["pipeline_vs_generate"] = round(
        result["pipeline"]["efficiency"] / result["generate"]["efficiency"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
