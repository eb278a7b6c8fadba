"""A/B: current full-width SQL window assembly vs a slim-verdict SQL
variant (windows over (xid, scn, seq, op) only, payload joined back by
event identity with a SHUFFLE join — no broadcast-threshold dependence).

Hypothesis from the scaling analysis: the window sorts' memory traffic is
payload-dominated and bandwidth-bound; sorting 6x narrower rows + one
hash join may beat sorting wide rows, most at higher core counts.

Usage: probe_assembly_slim.py <cores> <n_txs> [mode: full|slim]
Writes a noop sink (full materialization, no disk).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, Window, functions as F

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ntx = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
mode = sys.argv[3] if len(sys.argv) > 3 else "full"

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
from openlogreplicator_spark.operators.assembly import (
    DML, assemble_transactions_sql,
)

cfg = EngineConfig()
spark.range(10).count()
feed = generate_change_events(
    spark, n_txs=ntx, n_convs=max(ntx // 10, 10), payload_chars=200)
n = feed.count()


def slim_sql(events):
    """Verdict on slim columns; payload joined back by (xid, scn, seq)."""
    slim = events.select("xid", "scn", "seq", "op")
    w_tx = Window.partitionBy("xid")
    commit_scn = F.max(F.when(F.col("op") == "C", F.col("scn"))).over(w_tx)
    has_begin = F.max(F.when(F.col("op") == "B", 1).otherwise(0)).over(w_tx) == 1
    rolled = F.max(F.when(F.col("op") == "R", 1).otherwise(0)).over(w_tx) == 1
    committed = commit_scn.isNotNull() & ~rolled & has_begin
    w_ord = Window.partitionBy("xid").orderBy("scn", "seq")
    delta = (F.when(F.col("op") == "PR", F.lit(-1))
             .when(F.col("op").isin(*DML), F.lit(1)).otherwise(F.lit(0)))
    running = F.sum(delta).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    suffix_min = F.min(running).over(
        w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    survives = F.col("op").isin(*DML) & (suffix_min >= running)
    verdict = (slim.select("xid", "scn", "seq",
                           commit_scn.alias("commit_scn"),
                           (committed & survives).alias("_keep"))
               .where(F.col("_keep")).drop("_keep"))
    return events.join(verdict, ["xid", "scn", "seq"], "inner")


t0 = time.time()
out = (assemble_transactions_sql(feed, cfg) if mode == "full"
       else slim_sql(feed))
out.write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print("RESULT", json.dumps(dict(cores=cores, mode=mode, events=n,
                                sec=round(dt, 1), eps=round(n / dt))))
