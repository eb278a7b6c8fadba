"""Concurrent-executors contention probe: K fully-independent local[2]
replays at once (own JVM, own generated feed) — the single-box analog of
K separate 2-core executors. Per-job throughput vs the solo number
isolates MACHINE-level contention (shared memory subsystem) from
engine-level scaling; see BENCH.md 'Round-3 scaling re-examination'.

Usage: python tools/probe_contention.py [K] [n_txs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
NTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

procs = [
    subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "probe_replay.py"),
         "2", str(NTX), "auto"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    for _ in range(K)
]
results = []
for p in procs:
    out, _ = p.communicate()
    for line in out.splitlines():
        if line.startswith("RESULT"):
            results.append(json.loads(line.split(" ", 1)[1]))

agg = sum(r["eps"] for r in results)
print("RESULT", json.dumps({
    "concurrent_jobs": K, "cores_each": 2, "events_each": results[0]["events"]
    if results else 0,
    "per_job_eps": sorted(r["eps"] for r in results),
    "aggregate_eps": agg,
}))
