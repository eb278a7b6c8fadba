"""Incremental SCD2 maintenance (plans/scd2_apply.py):

  * batch-split equivalence — applying a feed in any split yields the same
    history table as one-shot scd2_history over the full feed;
  * closed versions are never rewritten (partial-update close);
  * idempotent retry of a batch id.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_sql,
)
from openlogreplicator_spark.operators.scd2 import scd2_history
from openlogreplicator_spark.plans.scd2_apply import (
    apply_scd2_batch,
    bootstrap_scd2_target,
)

CFG = EngineConfig(num_buckets=4)
PAYLOAD = ("role", "text", "ts")


def _norm(df):
    pdf = df.select(
        "conv_id", "turn_idx", "valid_from", "valid_to", "is_current",
        "role", "text",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    ).toPandas()
    return (
        pdf.sort_values(["conv_id", "turn_idx", "valid_from"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64", "valid_from": "int64"})
    )


def _assembled_with_state(spark, seed):
    feed = generate_change_events(spark, n_txs=200, n_convs=25, seed=seed)
    surv = assemble_transactions_sql(feed, CFG)
    return surv.select(
        "conv_id", "turn_idx", "op", "scn", "seq", "commit_scn",
        F.struct(*[F.col("after").getField(c).alias(c) for c in PAYLOAD])
        .alias("after"),
        "cols_set",
    )


def test_batch_split_equals_one_shot(spark, tmp_path):
    surv = _assembled_with_state(spark, seed=31).localCheckpoint()
    want = _norm(scd2_history(surv, ["conv_id", "turn_idx"], list(PAYLOAD)))

    mid = surv.agg(F.expr("percentile_approx(commit_scn, 0.5)")).first()[0]
    b1 = surv.where(F.col("commit_scn") <= mid)
    b2 = surv.where(F.col("commit_scn") > mid)
    assert b1.count() > 0 and b2.count() > 0

    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    apply_scd2_batch(spark, b1, hist, CFG, batch_id=1)
    mid_state = _norm(hist.read(spark))
    # batch 1 alone is also internally consistent SCD2
    want_mid = _norm(scd2_history(b1, ["conv_id", "turn_idx"], list(PAYLOAD)))
    pd.testing.assert_frame_equal(mid_state, want_mid)

    apply_scd2_batch(spark, b2, hist, CFG, batch_id=2)
    got = _norm(hist.read(spark))
    pd.testing.assert_frame_equal(got, want)


def test_three_way_split_and_closed_rows_stable(spark, tmp_path):
    surv = _assembled_with_state(spark, seed=37).localCheckpoint()
    want = _norm(scd2_history(surv, ["conv_id", "turn_idx"], list(PAYLOAD)))

    qs = surv.approxQuantile("commit_scn", [0.33, 0.66], 0.0)
    cuts = [int(q) for q in qs]
    parts = [
        surv.where(F.col("commit_scn") <= cuts[0]),
        surv.where(
            (F.col("commit_scn") > cuts[0]) & (F.col("commit_scn") <= cuts[1])
        ),
        surv.where(F.col("commit_scn") > cuts[1]),
    ]
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    closed_after_1 = None
    for i, p in enumerate(parts, start=1):
        apply_scd2_batch(spark, p, hist, CFG, batch_id=i)
        if i == 1:
            closed_after_1 = _norm(
                hist.read(spark).where(~F.col("is_current"))
            )
    got = _norm(hist.read(spark))
    pd.testing.assert_frame_equal(got, want)
    # versions closed by batch 1 are bit-identical in the final table
    # (closed history is immutable — later merges only touch open rows)
    final = _norm(hist.read(spark))
    merged = closed_after_1.merge(
        final, on=["conv_id", "turn_idx", "valid_from"],
        suffixes=("_a", "_b"),
    )
    assert len(merged) == len(closed_after_1)
    for c in ("valid_to", "is_current", "role", "text", "ts_str"):
        pd.testing.assert_series_equal(
            merged[f"{c}_a"], merged[f"{c}_b"],
            check_names=False, check_dtype=False,
        )


def test_retry_batch_is_skipped(spark, tmp_path):
    surv = _assembled_with_state(spark, seed=41).localCheckpoint()
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    r1 = apply_scd2_batch(spark, surv, hist, CFG, batch_id=1)
    assert not r1.get("skipped")
    before = _norm(hist.read(spark))
    r2 = apply_scd2_batch(spark, surv, hist, CFG, batch_id=1)
    assert r2.get("skipped")
    pd.testing.assert_frame_equal(_norm(hist.read(spark)), before)


def test_streaming_history_side_output(spark, tmp_path):
    """Pipeline with history_table: after streaming the feed in single-file
    microbatches, the history table equals one-shot scd2_history over the
    full committed set."""
    import glob
    import os
    import shutil
    import time

    from openlogreplicator_spark.feed import pandas_to_events_df
    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4, maxFilesPerTrigger=1)
    feed = generate_change_events(spark, n_txs=150, n_convs=20, seed=53)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    for i in range(4):
        lo, hi = (n * i) // 4, (n * (i + 1)) // 4
        sdf = pandas_to_events_df(spark, pdf.iloc[lo:hi])
        tmp = os.path.join(feed_dir, f"_tmp{i}")
        sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(feed_dir, f"seq{i:04d}.parquet"))
        shutil.rmtree(tmp)
        time.sleep(0.05)

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             history_table=hist)
    q = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                        available_now=True)
    q.awaitTermination(180)
    pipe.detach_metrics()

    surv = assemble_transactions_sql(feed, cfg).select(
        "conv_id", "turn_idx", "op", "scn", "seq", "commit_scn",
        F.struct(*[F.col("after").getField(c).alias(c) for c in PAYLOAD])
        .alias("after"),
        "cols_set",
    )
    want = _norm(scd2_history(surv, ["conv_id", "turn_idx"], list(PAYLOAD)))
    got = _norm(hist.read(spark))
    pd.testing.assert_frame_equal(got, want)
    # and the open versions agree with the primary target's final state
    cur = hist.read(spark).where("is_current").count()
    assert cur == table.read(spark).count()
