"""Salted net-change equivalence, hot-key detection, streaming metrics (M3),
and the in-band control-channel shutdown (M4)."""

import os

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.operators.assembly import assemble_transactions_sql
from openlogreplicator_spark.operators.decode import decode_events
from openlogreplicator_spark.operators.lww import net_changes
from openlogreplicator_spark.operators.skew import hot_keys, salted_net_changes

CFG = EngineConfig()
PAYLOAD = ["role", "text", "tool", "ts"]
KEYS = ["conv_id", "turn_idx"]


def _norm(df):
    rows = df.withColumn("cols_set", F.array_sort("cols_set")).collect()
    return sorted((tuple(r) for r in rows), key=repr)


def test_salted_net_changes_equals_unsalted(spark):
    events = decode_events(
        generate_change_events(spark, n_txs=400, n_convs=10, zipf_a=6.0), CFG
    )
    assembled = assemble_transactions_sql(events, CFG).persist()
    try:
        plain = net_changes(assembled, KEYS, PAYLOAD)
        for s in (2, 16):
            salted = salted_net_changes(assembled, KEYS, PAYLOAD, salt_partitions=s)
            assert _norm(salted) == _norm(plain), f"salt={s} diverged"
    finally:
        assembled.unpersist()


def test_hot_keys_detects_zipf_head(spark):
    events = decode_events(
        generate_change_events(spark, n_txs=500, n_convs=50, zipf_a=8.0), CFG
    ).where(F.col("op").isin("I", "U", "D"))
    hot = hot_keys(events, ["conv_id"], min_share=0.10)
    rows = hot.collect()
    assert len(rows) >= 1  # zipf head exists
    total = events.count()
    for r in rows:
        assert r["n"] >= total * 0.10


def test_metrics_listener_and_control_shutdown(spark, tmp_path):
    """Stream a feed containing a _control event: pipeline must record
    metrics, apply every data batch, flag shutdown, and stop gracefully."""
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.streaming.metrics import read_metrics
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    import glob
    import shutil

    feed_dir = str(tmp_path / "feed")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)
    events = generate_change_events(spark, n_txs=50, n_convs=10)
    # a control event appended after the data (flat files: the file stream
    # source does not recurse into subdirectories)
    ctl = events.limit(1).select(
        F.lit(10**15).alias("scn"), F.lit(0).cast("long").alias("seq"),
        F.lit("ctl").alias("xid"), F.lit("B").alias("op"),
        F.lit("_control").alias("table"),
        *[F.col(c) for c in events.columns[5:]],
    )
    for i, df in enumerate([events, ctl]):
        tmp = os.path.join(feed_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(feed_dir, f"seq{i:04d}.parquet"))
        shutil.rmtree(tmp)

    table = bootstrap_target(str(tmp_path / "tbl"), CFG)
    stream_out = str(tmp_path / "change_stream")
    pipe = CDCStreamPipeline(table, CFG, state_dir,
                             change_stream_dir=stream_out)
    try:
        q = pipe.run_stream(spark, feed_dir, ckpt, available_now=True)
        pipe.run_until_shutdown(q)

        assert pipe.shutdown_requested
        assert table.read(spark).count() > 0
        # listener events are delivered asynchronously on the listener bus —
        # poll with a timeout instead of racing it (in-suite flake fix)
        import time
        deadline = time.time() + 30
        while time.time() < deadline:
            evs = read_metrics(state_dir)
            kinds = {e["event"] for e in evs}
            if ("started" in kinds and "progress" in kinds
                    and any(e.get("num_input_rows", 0) > 0 for e in evs)):
                break
            time.sleep(0.25)
        assert "started" in kinds and "progress" in kinds
        assert any(e.get("num_input_rows", 0) > 0 for e in evs)
        # W2 change-stream file sink rode the stream: JSON lines present
        import json as _json
        lines = []
        for root, _d, names in os.walk(stream_out):
            for n in names:
                if n.startswith("part-"):
                    with open(os.path.join(root, n)) as fh:
                        lines += [l for l in fh.read().splitlines() if l]
        assert lines, "streaming change-stream sink wrote no messages"
        msg = _json.loads(lines[0])
        assert {"scn", "xid", "payload"} <= set(msg)
    finally:
        pipe.detach_metrics()
