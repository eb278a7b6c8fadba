"""Probe: apply_scd2_batch's persist of the batch SCD2 window plan
(round-4 verdict, What's wrong #2 — the plan used to be traversed ~3x:
history MERGE, open-store upserts, delete anti-join).

Measures, per persist_plan arm, the wall time and the number of Spark jobs
the batch apply runs (job-group scoped via the status tracker — the
verdict's 'Spark UI job count' evidence). Interleaved repeats on the same
session/table fixtures; fresh tables per run (merges mutate them).

Run: python tools/probe_scd2_persist.py [--txs 4000] [--repeats 3]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from openlogreplicator_spark.config import EngineConfig  # noqa: E402
from openlogreplicator_spark.feed import generate_change_events  # noqa: E402
from openlogreplicator_spark.operators.assembly import (  # noqa: E402
    assemble_transactions_sql,
)
from openlogreplicator_spark.plans.scd2_apply import (  # noqa: E402
    apply_scd2_batch,
    bootstrap_scd2_open_target,
    bootstrap_scd2_target,
)

PAYLOAD = ("role", "text", "ts")
KEYS = ["conv_id", "turn_idx"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--txs", type=int, default=4000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    sc = spark.sparkContext
    cfg = EngineConfig(num_buckets=8)
    feed = generate_change_events(spark, n_txs=args.txs, n_convs=64, seed=3)
    surv = assemble_transactions_sql(feed, cfg).select(
        *KEYS, "op", "scn", "seq", "xid", "commit_scn",
        F.struct(*[F.col("after").getField(c).alias(c) for c in PAYLOAD])
        .alias("after"),
        "cols_set",
    ).localCheckpoint()
    n = surv.count()
    print(f"scd2 persist probe: {args.txs} txs -> {n} surviving events, "
          f"interleaved x{args.repeats}")

    def run(persist: bool, tag: str):
        root = tempfile.mkdtemp(prefix=f"scd2p_{tag}_")
        hist = bootstrap_scd2_target(os.path.join(root, "h"), cfg)
        open_t = bootstrap_scd2_open_target(os.path.join(root, "o"), cfg)
        group = f"probe-{tag}-{time.monotonic_ns()}"
        sc.setJobGroup(group, "scd2 apply")
        t0 = time.perf_counter()
        apply_scd2_batch(spark, surv, hist, cfg, batch_id=1,
                         open_table=open_t, persist_plan=persist)
        dt = time.perf_counter() - t0
        sc.setJobGroup("idle", "")
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        shutil.rmtree(root, ignore_errors=True)
        return dt, jobs

    res: dict = {"on": [], "off": []}
    jobs_seen: dict = {}
    for i in range(args.repeats):
        for tag, persist in (("off", False), ("on", True)):
            dt, jobs = run(persist, f"{tag}{i}")
            res[tag].append(dt)
            jobs_seen[tag] = jobs
    for tag in ("off", "on"):
        best = min(res[tag])
        print(f"  persist_plan={tag:3s}  best {best:.2f}s  "
              f"spark jobs/batch {jobs_seen[tag]}")
    print(f"  speedup {min(res['off']) / min(res['on']):.2f}x, "
          f"jobs {jobs_seen['off']} -> {jobs_seen['on']}")
    spark.stop()


if __name__ == "__main__":
    main()
