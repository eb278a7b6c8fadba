"""Grid probe: probe_grid.py <cores> <n_txs> <mem> <shuffle_parts>"""
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
    .config("spark.sql.adaptive.enabled", __import__("os").environ.get("OLR_AQE", "true"))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", mem)
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.local.dir", "/dev/shm/spark_local_grid")
    .config("spark.io.compression.codec", __import__("os").environ.get("OLR_CODEC", "lz4"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch

cfg = EngineConfig(num_buckets=64)
spark.range(10).count()
feed = generate_change_events(spark, n_txs=ntx, n_convs=max(ntx // 10, 10),
                              payload_chars=200)
n = feed.count()
tmp = tempfile.mkdtemp(prefix="olr_grid_", dir="/dev/shm")
t = bootstrap_target(tmp, cfg)
t0 = time.time()
replay_batch(spark, feed, t, cfg, batch_id=0)
dt = time.time() - t0
shutil.rmtree(tmp, ignore_errors=True)
print("RESULT", json.dumps(dict(cores=cores, mem=mem, parts=parts, events=n,
                                sec=round(dt, 1), eps=round(n / dt))))
