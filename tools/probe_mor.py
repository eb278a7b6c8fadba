"""CoW vs MoR write-amplification probe: probe_mor.py <cores> <n_txs> <n_batches>.

Replays the same generated feed in scn-ordered microbatches against a
copy-on-write table and a merge-on-read table (+ one final compact), and
reports per-mode: wall seconds, TOTAL data-file rows written across all
commits (the write-amplification number), bytes written, and final-state
row count. The steady-state claim under test: CoW rewrites every touched
bucket per batch (O(table) per batch once buckets fill), MoR writes
O(batch) plus one bounded compaction.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ntx = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch

spark.range(10).count()  # JVM warm-up
feed = generate_change_events(
    spark, n_txs=ntx, n_convs=max(ntx // 10, 10), payload_chars=200
)
n = feed.count()
# scn-ordered batch boundaries (cumulative slices; hwm dedups re-applies)
bounds = list(feed.selectExpr(
    f"percentile(scn, array({','.join(str((i + 1) / n_batches) for i in range(n_batches))}))"
).first()[0])


def run(mode):
    cfg = EngineConfig(num_buckets=64, merge_mode=mode)
    tmp = tempfile.mkdtemp(prefix=f"olr_mor_probe_{mode}_")
    t = bootstrap_target(tmp, cfg)
    t0 = time.time()
    for i, hi in enumerate(bounds):
        replay_batch(spark, feed.where(feed.scn <= hi), t, cfg, batch_id=i)
    if mode == "mor":
        t.compact(spark)
    dt = time.time() - t0
    # total rows/bytes ever written = sum over all snapshots' NEW files
    seen, rows_written, bytes_written, files = set(), 0, 0, 0
    for v in range(t.current_version() + 1):
        try:
            m = t.manifest(v)
        except FileNotFoundError:
            continue
        for f in m["files"]:
            if f["path"] in seen:
                continue
            seen.add(f["path"])
            rows_written += f["rows"]
            files += 1
            p = os.path.join(t.path, f["path"])
            if os.path.exists(p):
                bytes_written += os.path.getsize(p)
    final_rows = t.read(spark).count()
    shutil.rmtree(tmp, ignore_errors=True)
    return dict(mode=mode, sec=round(dt, 1), eps=round(n / dt),
                rows_written=rows_written, mb_written=round(bytes_written / 1e6, 1),
                files=files, final_rows=final_rows)


out = {"events": n, "batches": n_batches, "cores": cores,
       "cow": run("cow"), "mor": run("mor")}
out["write_amp_ratio"] = round(
    out["cow"]["rows_written"] / max(out["mor"]["rows_written"], 1), 2)
print("RESULT", json.dumps(out))
