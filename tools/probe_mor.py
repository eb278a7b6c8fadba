"""CoW vs MoR write-amplification probe: probe_mor.py <cores> <n_txs> <n_batches>.

Measures the STEADY-STATE CDC regime the two modes actually differ in:
bootstrap a large table from the first 90% of the feed (identical cost in
both modes, excluded from the comparison), then apply the last 10% as
``n_batches`` small scn-ordered microbatches and compare per-mode
steady-state wall seconds and TOTAL data-file rows/bytes written by those
batches (+ one final MoR compact, included honestly in both numbers).

The claim under test: per small batch, CoW rewrites every touched bucket
(~= the whole table once keys spray across buckets), MoR writes O(batch);
compaction amortizes the fold-back over the cadence.
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
# scn split: 90% bootstrap, then n_batches equal slices of the tail
fracs = [0.9] + [0.9 + 0.1 * (i + 1) / n_batches for i in range(n_batches)]
bounds = list(feed.selectExpr(
    f"percentile(scn, array({','.join(str(f) for f in fracs)}))"
).first()[0])


def _stats(t, from_version):
    seen, rows_w, bytes_w, files = set(), 0, 0, 0
    for v in range(t.current_version() + 1):
        try:
            m = t.manifest(v)
        except FileNotFoundError:
            continue
        for f in m["files"]:
            if f["path"] in seen:
                continue
            seen.add(f["path"])
            if v <= from_version:
                continue  # bootstrap files excluded
            rows_w += f["rows"]
            files += 1
            p = os.path.join(t.path, f["path"])
            if os.path.exists(p):
                bytes_w += os.path.getsize(p)
    return rows_w, bytes_w, files


def run(mode, compact_every=None):
    engine_mode = "mor" if mode.startswith("mor") else "cow"
    cfg = EngineConfig(num_buckets=64, merge_mode=engine_mode)
    tmp = tempfile.mkdtemp(prefix=f"olr_mor_probe_{mode}_")
    t = bootstrap_target(tmp, cfg)
    replay_batch(spark, feed.where(feed.scn <= bounds[0]), t, cfg, batch_id=0)
    boot_version = t.current_version()
    table_rows = t.read(spark).count()

    t0 = time.time()
    for i, hi in enumerate(bounds[1:]):
        replay_batch(spark, feed.where(feed.scn <= hi), t, cfg, batch_id=i + 1)
        if compact_every and (i + 1) % compact_every == 0:
            t.compact(spark)
    if engine_mode == "mor":
        t.compact(spark)
    dt = time.time() - t0

    rows_w, bytes_w, files = _stats(t, boot_version)
    final_rows = t.read(spark).count()
    shutil.rmtree(tmp, ignore_errors=True)
    return dict(mode=mode, steady_sec=round(dt, 1),
                table_rows_at_steady=table_rows,
                rows_written=rows_w, mb_written=round(bytes_w / 1e6, 1),
                files=files, final_rows=final_rows)


out = {"events": n, "steady_batches": n_batches, "cores": cores,
       "cow": run("cow"), "mor": run("mor"),
       "mor_cadence4": run("mor_cadence4", compact_every=4)}
out["write_amp_ratio"] = round(
    out["cow"]["rows_written"] / max(out["mor"]["rows_written"], 1), 2)
out["write_amp_ratio_cadence"] = round(
    out["cow"]["rows_written"] / max(out["mor_cadence4"]["rows_written"], 1), 2)
assert out["cow"]["final_rows"] == out["mor"]["final_rows"] \
    == out["mor_cadence4"]["final_rows"]
print("RESULT", json.dumps(out))
