"""Incremental conversation-rollup maintenance (plans/rollup_apply.py):

  * batch-split equivalence — streaming/batched maintenance equals a full
    re-roll of the final primary state;
  * a conversation whose last turn is deleted leaves the view;
  * empty batch is a no-op; idempotent retry.
"""

import glob
import os
import shutil
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import (
    generate_change_events, pandas_to_events_df,
)
from openlogreplicator_spark.functions.transcripts import (
    reconstruct_conversations,
)
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch
from openlogreplicator_spark.plans.rollup_apply import (
    apply_conv_rollup_batch,
    bootstrap_conversations_target,
)

CFG = EngineConfig(num_buckets=4)


def _norm(df):
    pdf = df.toPandas()
    return pdf.sort_values("conv_id").reset_index(drop=True).astype(
        {c: "int64" for c in ("n_turns", "first_turn", "last_turn", "n_chars")
         if c in pdf.columns}
    )


def _full_roll(spark, table):
    return _norm(reconstruct_conversations(table.read(spark)).select(
        "conv_id", "n_turns", "first_turn", "last_turn", "roles",
        "full_text", "n_chars",
    ))


def test_incremental_rollup_equals_full(spark, tmp_path):
    feed = generate_change_events(spark, n_txs=250, n_convs=25, seed=61)
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    conv = bootstrap_conversations_target(str(tmp_path / "c"), CFG)
    for i in range(3):
        lo, hi = (n * i) // 3, (n * (i + 1)) // 3
        batch = pandas_to_events_df(spark, pdf.iloc[lo:hi])
        replay_batch(spark, batch, table, CFG, batch_id=i)
        touched = batch.where(F.col("op").isin("I", "U", "D", "MI", "MD"))
        apply_conv_rollup_batch(
            spark, touched.select("conv_id"), table, conv, CFG, batch_id=i
        )
    got = _norm(conv.read(spark))
    pd.testing.assert_frame_equal(got, _full_roll(spark, table))
    assert len(got) > 5


def test_deleted_conversation_leaves_view(spark, tmp_path):
    feed = generate_change_events(spark, n_txs=120, n_convs=12, seed=67)
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    conv = bootstrap_conversations_target(str(tmp_path / "c"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=0)
    apply_conv_rollup_batch(
        spark, feed.select("conv_id"), table, conv, CFG, batch_id=0
    )
    victim = conv.read(spark).select("conv_id").first()[0]

    # delete every surviving turn of one conversation directly on the
    # primary (a batch whose net effect is full-conversation removal)
    dead = table.read(spark).where(F.col("conv_id") == victim).select(
        "conv_id", "turn_idx",
        *[F.lit(None).cast(table.schema()[c].dataType).alias(c)
          for c in table.schema().fieldNames()
          if c not in ("conv_id", "turn_idx")],
        F.lit("D").alias("op"),
        F.array().cast("array<string>").alias("cols_set"),
    )
    assert dead.count() > 0
    table.merge(spark, dead, batch_id=1)
    apply_conv_rollup_batch(
        spark, dead.select("conv_id"), table, conv, CFG, batch_id=1
    )
    assert conv.read(spark).where(F.col("conv_id") == victim).count() == 0
    pd.testing.assert_frame_equal(_norm(conv.read(spark)),
                                  _full_roll(spark, table))

    # retry of the same batch id: primary and view merges both skip
    r = apply_conv_rollup_batch(
        spark, dead.select("conv_id"), table, conv, CFG, batch_id=1
    )
    assert r.get("skipped")
    # empty batch: no touched convs, no-op (new batch id, zero-row merge)
    empty = dead.select("conv_id").limit(0)
    r2 = apply_conv_rollup_batch(spark, empty, table, conv, CFG, batch_id=2)
    assert not r2.get("skipped") and r2.get("rows_merged", 0) == 0
    pd.testing.assert_frame_equal(_norm(conv.read(spark)),
                                  _full_roll(spark, table))


def test_streaming_conversations_view(spark, tmp_path):
    """Pipeline with conversations_table: the view tracks the primary
    through multi-batch streaming."""
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4, maxFilesPerTrigger=1)
    feed = generate_change_events(spark, n_txs=120, n_convs=15, seed=71)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    for i in range(3):
        lo, hi = (n * i) // 3, (n * (i + 1)) // 3
        sdf = pandas_to_events_df(spark, pdf.iloc[lo:hi])
        tmp = os.path.join(feed_dir, f"_tmp{i}")
        sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(feed_dir, f"seq{i:04d}.parquet"))
        shutil.rmtree(tmp)
        time.sleep(0.05)

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    conv = bootstrap_conversations_target(str(tmp_path / "c"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             conversations_table=conv)
    q = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                        available_now=True)
    q.awaitTermination(180)
    pipe.detach_metrics()

    pd.testing.assert_frame_equal(_norm(conv.read(spark)),
                                  _full_roll(spark, table))


def test_streaming_sig_index_tracks_view(spark, tmp_path):
    """conversations view + SimHash index maintained through multi-batch
    streaming: the index equals a fresh batch signing of the final view,
    and index-only candidate pairs equal pairs computed from full text."""
    from openlogreplicator_spark.functions.dedup import (
        simhash, simhash_neardup_pairs,
    )
    from openlogreplicator_spark.plans.dedup_index import (
        bootstrap_sig_index, neardup_candidates,
    )
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4, maxFilesPerTrigger=1)
    feed = generate_change_events(spark, n_txs=100, n_convs=12, seed=101)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    for i in range(3):
        lo, hi = (n * i) // 3, (n * (i + 1)) // 3
        sdf = pandas_to_events_df(spark, pdf.iloc[lo:hi])
        tmp = os.path.join(feed_dir, f"_tmp{i}")
        sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(feed_dir, f"seq{i:04d}.parquet"))
        shutil.rmtree(tmp)
        time.sleep(0.05)

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    conv = bootstrap_conversations_target(str(tmp_path / "c"), cfg)
    idx = bootstrap_sig_index(str(tmp_path / "i"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             conversations_table=conv, sig_index_table=idx)
    q = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                        available_now=True)
    q.awaitTermination(180)
    pipe.detach_metrics()

    got = {
        r["conv_id"]: r["simhash"]
        for r in idx.read(spark).collect()
    }
    want = {
        r["conv_id"]: r["simhash"]
        for r in simhash(
            conv.read(spark).select(
                "conv_id", F.col("full_text").alias("text")),
            bits=32, id_col="conv_id",
        ).collect()
    }
    assert got == want and len(got) > 5

    # index-only candidates == full-text banded pairs over the view
    from_idx = sorted(
        (r["conv_a"], r["conv_b"], r["hamming"])
        for r in neardup_candidates(idx, spark).collect()
    )
    from_text = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(
            conv.read(spark).select(
                F.col("conv_id").alias("doc_id"),
                F.col("full_text").alias("text"),
            ),
            bits=32, radius=3, bands=4,
        ).collect()
    )
    assert from_idx == from_text


def test_crash_between_primary_and_view_then_resume(spark, tmp_path,
                                                    monkeypatch):
    """Exactly-once across the side-output chain: the primary merge commits,
    then the view stage crashes mid-batch. On restart the batch replays —
    the primary merge is skipped by its write-audit, the view applies from
    the same post-merge state, and the chain converges with no duplicates
    or loss."""
    from openlogreplicator_spark.plans import rollup_apply as RA
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4)
    feed = generate_change_events(spark, n_txs=80, n_convs=10, seed=113)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    feed.coalesce(1).write.mode("append").parquet(feed_dir)

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    conv = bootstrap_conversations_target(str(tmp_path / "c"), cfg)

    orig = RA.apply_conv_rollup_batch
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash after the primary merge")
        return orig(*a, **k)

    monkeypatch.setattr(RA, "apply_conv_rollup_batch", flaky)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             conversations_table=conv)
    q = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                        available_now=True)
    with pytest.raises(Exception):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise RuntimeError(q.exception().desc)
    pipe.detach_metrics()
    assert calls["n"] == 1
    assert table.read(spark).count() > 0, "primary committed before crash"
    assert conv.read(spark).count() == 0, "view stage crashed"

    monkeypatch.setattr(RA, "apply_conv_rollup_batch", orig)
    pipe2 = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                              conversations_table=conv)
    q2 = pipe2.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                          available_now=True)
    q2.awaitTermination(120)
    pipe2.detach_metrics()
    pd.testing.assert_frame_equal(_norm(conv.read(spark)),
                                  _full_roll(spark, table))
