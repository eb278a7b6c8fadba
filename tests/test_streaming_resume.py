"""Streaming pipeline: microbatch apply, cross-batch open transactions,
kill-and-resume from checkpoint, exactly-once under batch replay.

Mirrors the reference's confirm/checkpoint contract (Writer.cpp:76-393,
RedoLog.cpp:751-762): restart must produce no duplicates and no loss.
"""

import glob
import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import (
    CHANGE_EVENT_SCHEMA,
    generate_change_events,
    pandas_to_events_df,
    sequential_oracle,
)
from openlogreplicator_spark.plans.replay import bootstrap_target
from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline


def _write_feed_files(spark, events, feed_dir, n_files):
    """Write the feed as scn-ordered parquet files (archived-log analog)."""
    import shutil

    os.makedirs(feed_dir, exist_ok=True)
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    paths = []
    for i in range(n_files):
        lo, hi = (n * i) // n_files, (n * (i + 1)) // n_files
        chunk = pdf.iloc[lo:hi]
        sdf = pandas_to_events_df(spark, chunk)
        tmp = os.path.join(feed_dir, f"_tmp{i}")
        sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(feed_dir, f"seq{i:04d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        time.sleep(0.05)  # monotonic mod times -> file source delivers in order
        paths.append(dst)
    return pdf, paths


def _state(table, spark, cols):
    pdf = table.read(spark).toPandas()
    return (
        pdf[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )


def _assert_eq(got, want):
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"turn_idx": "int64"}).reset_index(drop=True),
        check_dtype=False,
    )


def test_manual_microbatches_with_replay_are_exactly_once(spark, tmp_path):
    """Drive process_batch directly: spanning transactions + a replayed batch."""
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, n_txs=250, n_convs=30, seed=21)
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    oracle = sequential_oracle(pdf).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"))

    n = len(pdf)
    cuts = [0, n // 3, (2 * n) // 3, n]
    batches = [
        pandas_to_events_df(spark, pdf.iloc[cuts[i]:cuts[i + 1]])
        for i in range(3)
    ]
    pipe.process_batch(batches[0], 0)
    pipe.process_batch(batches[1], 1)
    # crash + replay of batch 1 (same input, same id) -> must be a no-op merge
    out = pipe.process_batch(batches[1], 1)
    assert all(s.get("skipped") for s in out)
    pipe.process_batch(batches[2], 2)

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    _assert_eq(_state(table, spark, cols), oracle)

    lin = pipe.read_lineage(spark).toPandas()
    assert set(lin["batch_id"]) == {0, 1, 2}
    assert (lin["events"] >= 0).all()


def test_stream_kill_and_resume(spark, tmp_path):
    """availableNow run, stop, extend the feed, resume from checkpoint."""
    cfg = EngineConfig(num_buckets=4, maxFilesPerTrigger=2)
    events = generate_change_events(spark, n_txs=200, n_convs=25, seed=5)
    feed_dir = str(tmp_path / "feed")
    pdf, _ = _write_feed_files(spark, events, feed_dir, n_files=6)
    oracle = sequential_oracle(pdf).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"))
    ckpt = str(tmp_path / "ckpt")

    # phase 1: hide the last 2 files (not yet "archived")
    hidden = sorted(glob.glob(os.path.join(feed_dir, "seq*.parquet")))[-2:]
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    for h in hidden:
        os.rename(h, os.path.join(stash, os.path.basename(h)))

    try:
        q = pipe.run_stream(spark, feed_dir, ckpt, available_now=True)
        q.awaitTermination(120)
        assert not q.isActive

        # phase 2: new files arrive; resume from the same checkpoint
        for h in hidden:
            os.rename(os.path.join(stash, os.path.basename(h)), h)
        q = pipe.run_stream(spark, feed_dir, ckpt, available_now=True)
        q.awaitTermination(120)
    finally:
        # the shared test SparkSession outlives tmp_path — leaving the
        # listener attached would have it append to a deleted dir later
        pipe.detach_metrics()

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    _assert_eq(_state(table, spark, cols), oracle)
    # every merge snapshot is tagged with its scn range (lineage contract)
    merges = [s for s in table.snapshots() if s["summary"].get("operation") == "merge"]
    assert merges and all("scn_max" in s["summary"] for s in merges)


def test_schema_evolution_mid_stream(spark, tmp_path):
    """ADD COLUMN + WIDEN DDL events inside the feed evolve the target."""
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, n_txs=200, n_convs=25, seed=9,
                                    with_ddl=True)
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    oracle = sequential_oracle(pdf)  # includes meta

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"))

    n = len(pdf)
    for i in range(4):
        lo, hi = (n * i) // 4, (n * (i + 1)) // 4
        pipe.process_batch(
            pandas_to_events_df(spark, pdf.iloc[lo:hi]), i
        )

    schema = {f.name: f.dataType.simpleString() for f in table.schema().fields}
    assert schema.get("meta") == "string"
    assert schema.get("turn_idx") == "bigint"
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "meta"]
    _assert_eq(_state(table, spark, cols), oracle)
