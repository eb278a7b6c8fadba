"""Streaming-native stateful assembly (applyInPandasWithState): state-store
variant of G1 must produce exactly the batch assembler's output, including
transactions and partial rollbacks spanning microbatches, and drive the
same final table state end-to-end."""

import glob
import os
import shutil
import time

import pandas as pd

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import (
    CHANGE_EVENT_SCHEMA, generate_change_events, pandas_to_events_df,
    sequential_oracle,
)
from openlogreplicator_spark.operators.assembly import assemble_transactions_sql
from openlogreplicator_spark.plans.replay import apply_committed, bootstrap_target
from openlogreplicator_spark.streaming.native_state import streaming_assembly

CFG = EngineConfig(num_buckets=4)


def _write_feed_files(spark, events, feed_dir, n_files):
    os.makedirs(feed_dir, exist_ok=True)
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    for i in range(n_files):
        chunk = pdf.iloc[(n * i) // n_files:(n * (i + 1)) // n_files]
        sdf = pandas_to_events_df(spark, chunk)
        tmp = os.path.join(feed_dir, f"_tmp{i}")
        sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(feed_dir, f"seq{i:04d}.parquet"))
        shutil.rmtree(tmp)
        time.sleep(0.05)
    return pdf


def test_streaming_assembly_equals_batch_assembler(spark, tmp_path):
    events = generate_change_events(spark, n_txs=150, n_convs=20, seed=83,
                                    p_partial_rollback=0.15)
    feed_dir = str(tmp_path / "feed")
    _write_feed_files(spark, events, feed_dir, n_files=5)

    src = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # transactions span microbatches
        .parquet(feed_dir)
    )
    committed = streaming_assembly(src, CFG)
    out_dir = str(tmp_path / "out")
    q = (
        committed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out_dir)
        .select("xid", "scn", "seq", "op", "commit_scn")
        .toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    )
    want = (
        assemble_transactions_sql(events, CFG)
        .select("xid", "scn", "seq", "op", "commit_scn")
        .toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_streaming_assembly_kill_and_resume(spark, tmp_path):
    """Open-transaction state in the state store must survive a query
    restart: stop after the first files, resume from the same checkpoint,
    and end at exactly the batch assembler's output (no dupes, no loss)."""
    events = generate_change_events(spark, n_txs=120, n_convs=15, seed=91,
                                    p_partial_rollback=0.12)
    feed_dir = str(tmp_path / "feed")
    _write_feed_files(spark, events, feed_dir, n_files=6)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: hide the tail, run to exhaustion, stop
    hidden = sorted(glob.glob(os.path.join(feed_dir, "seq*.parquet")))[-3:]
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    for h in hidden:
        os.rename(h, os.path.join(stash, os.path.basename(h)))

    def run_once():
        src = (
            spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        q = (
            streaming_assembly(src, CFG)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # phase 2: tail arrives, resume from the same checkpoint + state store
    for h in hidden:
        os.rename(os.path.join(stash, os.path.basename(h)), h)
    run_once()

    got = (
        spark.read.parquet(out_dir)
        .select("xid", "scn", "seq", "op", "commit_scn")
        .toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    )
    want = (
        assemble_transactions_sql(events, CFG)
        .select("xid", "scn", "seq", "op", "commit_scn")
        .toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_streaming_assembly_end_to_end_merge(spark, tmp_path):
    """native-state assembly -> foreachBatch MERGE == sequential oracle."""
    events = generate_change_events(spark, n_txs=120, n_convs=15, seed=89)
    feed_dir = str(tmp_path / "feed")
    pdf = _write_feed_files(spark, events, feed_dir, n_files=4)
    oracle = sequential_oracle(pdf).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), CFG)

    def apply(batch_df, batch_id):
        apply_committed(batch_df.sparkSession, batch_df, [], table, CFG,
                        batch_id)

    src = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    q = (
        streaming_assembly(src, CFG)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        table.read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )
    pd.testing.assert_frame_equal(
        got[oracle.columns.tolist()],
        oracle.astype({"turn_idx": "int64"}).reset_index(drop=True),
        check_dtype=False,
    )
