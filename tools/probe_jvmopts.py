"""A/B JVM options for local[32] replay: probe_jvmopts.py <mem> <extraJavaOptions...>"""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

mem = sys.argv[1]
opts = " ".join(sys.argv[2:])
b = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", mem)
)
if opts:
    b = b.config("spark.driver.extraJavaOptions", opts)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch

cfg = EngineConfig(num_buckets=64)
spark.range(10).count()
feed = generate_change_events(spark, n_txs=300000, n_convs=30000, payload_chars=200)
n = feed.count()
tmp = tempfile.mkdtemp(prefix="olr_jvm_")
t = bootstrap_target(tmp, cfg)
t0 = time.time()
replay_batch(spark, feed, t, cfg, batch_id=0)
dt = time.time() - t0
shutil.rmtree(tmp, ignore_errors=True)
print("RESULT", json.dumps(dict(mem=mem, opts=opts, events=n, sec=round(dt, 1),
                                eps=round(n / dt))))
