"""Per-phase replay timing: probe_phases.py <cores> <n_txs> <mem> <parts>"""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

cores, ntx, mem, parts = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", parts)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", mem)
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.local.dir", "/dev/shm/spark_local_ph")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import openlogreplicator_spark.lake as L
import openlogreplicator_spark.plans.replay as R
from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events

phases = {}

def wrap(obj, name, label):
    orig = getattr(obj, name)
    def timed(*a, **k):
        t0 = time.time()
        r = orig(*a, **k)
        phases[label] = phases.get(label, 0) + time.time() - t0
        return r
    setattr(obj, name, timed)

wrap(L.LakeTable, "_write_data", "merge_write")
wrap(L.LakeTable, "merge", "merge_total")
wrap(L.LakeTable, "merge_direct", "merge_total")  # bootstrap fast path
wrap(R, "collect_ddls", "ddl_collect")

cfg = EngineConfig(num_buckets=64)
spark.range(10).count()
feed = generate_change_events(spark, n_txs=ntx, n_convs=max(ntx // 10, 10),
                              payload_chars=200)
n = feed.count()
tmp = tempfile.mkdtemp(prefix="olr_ph_", dir="/dev/shm")
t = R.bootstrap_target(tmp, cfg)
t0 = time.time()
R.replay_batch(spark, feed, t, cfg, batch_id=0)
total = time.time() - t0
shutil.rmtree(tmp, ignore_errors=True)
phases["stage_write_etc"] = total - phases.pop("merge_total") - phases["ddl_collect"]
print("RESULT", json.dumps(dict(cores=cores, events=n, total=round(total, 1),
    **{k: round(v, 1) for k, v in phases.items()})))
