"""Replay A/B over a FILE-BACKED feed (the production shape — archived-log
parquet files): probe_replay_files.py <cores> <n_txs> <mode> <feed_dir>.
The feed is generated ONCE into <feed_dir> and reused across runs, so the
A/B isolates the replay path. Companion to probe_assembly_slim.py; the
results (BENCH.md 'Slim SQL assembly: a measured NO') drove the decision
to keep slim_join opt-in."""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

cores, ntx, mode = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
feed_path = sys.argv[4]
spark = (SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
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

if not os.path.exists(feed_path):
    generate_change_events(spark, n_txs=ntx, n_convs=max(ntx // 10, 10),
                           payload_chars=200).write.parquet(feed_path)
spark.range(10).count()
feed = spark.read.parquet(feed_path)
n = feed.count()
cfg = EngineConfig(num_buckets=64, assembly_mode=mode)
tmp = tempfile.mkdtemp(prefix="olr_probe_files_")
t = bootstrap_target(tmp, cfg)
t0 = time.time()
replay_batch(spark, feed, t, cfg, batch_id=0)
dt = time.time() - t0
shutil.rmtree(tmp, ignore_errors=True)
print("RESULT", json.dumps(dict(cores=cores, mode=mode, events=n,
                                sec=round(dt, 1), eps=round(n / dt))))
