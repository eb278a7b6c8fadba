"""Scaling-efficiency evidence: the same CDC replay job at N and 4N cores.

The north rule requires >= 0.8 throughput scaling efficiency from N to 4N
executors. A real multi-executor cluster does not exist in this sandbox, so
per BASELINE.md row 8 the evidence is the identical job run at two local
parallelism levels on the same input, reporting both throughputs and

    efficiency = throughput(4N) / (4 * throughput(N))

Each configuration runs in its OWN spark-submit subprocess (fresh JVM) so
thread pools, codegen caches, and GC state cannot leak between levels.

Usage: python tools/bench_scaling.py [--n 8] [--txs 200000] [--repeat 2]
Writes the result line to stdout and appends a markdown row to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cores = int(sys.argv[1]); n_txs = int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .appName(f"olr-scaling-{{cores}}")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch
# bucket count sized for the LARGER level so the merge write is never the
# parallelism cap (a 4N deployment raises bucket count the same way)
cfg = EngineConfig(num_buckets=64)
spark.range(10).count()  # JVM warmup outside timing
feed = generate_change_events(spark, n_txs=n_txs, n_convs=max(n_txs // 10, 10), payload_chars=200)
n = feed.count()
tmp = tempfile.mkdtemp(prefix="olr_scaling_tbl_")
table = bootstrap_target(tmp, cfg)
t0 = time.time()
replay_batch(spark, feed, table, cfg, batch_id=0)
dt = time.time() - t0
rows = table.read(spark).count()
print("RESULT " + json.dumps(dict(cores=cores, events=n, sec=round(dt, 2),
                                  eps=round(n / dt, 1), rows=rows)))
spark.stop()
"""


def run_level(cores: int, n_txs: int, pin: bool = True) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD.format(repo=REPO))
        path = f.name
    cmd = [sys.executable, path, str(cores), str(n_txs)]
    if pin:
        # pin the whole child (JVM + python workers) to exactly `cores` CPUs:
        # an N-executor cluster gives the job N CPUs total, so unpinned
        # local[N] (whose GC/IO/python helper threads overflow onto other
        # cores) would overstate small-N throughput and understate scaling
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout}\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="base parallelism N (4N must fit the host)")
    ap.add_argument("--txs", type=int, default=200000)
    ap.add_argument("--repeat", type=int, default=2, help="runs per level; best is kept (noisy-neighbor shield)")
    ap.add_argument("--no-pin", action="store_true", help="disable taskset CPU pinning")
    args = ap.parse_args()

    levels = {}
    for cores in (args.n, 4 * args.n):
        best = None
        for _ in range(args.repeat):
            r = run_level(cores, args.txs, pin=not args.no_pin)
            if best is None or r["eps"] > best["eps"]:
                best = r
        levels[cores] = best
        print(json.dumps(best))

    lo, hi = levels[args.n], levels[4 * args.n]
    eff = hi["eps"] / (4 * lo["eps"])
    result = {
        "metric": "scaling_efficiency_NtoLevel4N",
        "n_cores": args.n, "events": lo["events"],
        "eps_N": lo["eps"], "eps_4N": hi["eps"],
        "speedup": round(hi["eps"] / lo["eps"], 2),
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"| local[{args.n}] vs local[{4*args.n}] | {lo['events']} events | "
            f"{lo['eps']} ev/s | {hi['eps']} ev/s | "
            f"{result['speedup']}x | {result['efficiency']} |\n"
        )


if __name__ == "__main__":
    main()
