"""One replay run for scaling probes: probe_replay.py <cores> <n_txs> <mode>.
mode: 1/pandas, 0/sql, or auto (assembly_mode='auto' — resolve per batch)."""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

cores = int(sys.argv[1])
ntx = int(sys.argv[2])
mode = sys.argv[3] if len(sys.argv) > 3 else "1"
mode = {"1": "pandas", "0": "sql"}.get(mode, mode)
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

cfg = EngineConfig(num_buckets=64, assembly_mode=mode)
spark.range(10).count()
feed = generate_change_events(
    spark, n_txs=ntx, n_convs=max(ntx // 10, 10), payload_chars=200
)
n = feed.count()
tmp = tempfile.mkdtemp(prefix="olr_probe_")
t = bootstrap_target(tmp, cfg)
t0 = time.time()
replay_batch(spark, feed, t, cfg, batch_id=0)
dt = time.time() - t0
shutil.rmtree(tmp, ignore_errors=True)
print("RESULT", json.dumps(dict(cores=cores, mode=mode, events=n,
                                sec=round(dt, 1), eps=round(n / dt))))
