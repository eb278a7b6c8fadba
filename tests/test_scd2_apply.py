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
        "conv_id", "turn_idx", "op", "scn", "seq", "xid", "commit_scn",
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


def test_open_store_batch_split_equals_one_shot(spark, tmp_path):
    """Round-4 open-version store: same batch-split equivalence as the
    legacy path, with the seed read served from the bucketed open store
    (O(live keys in touched buckets)) instead of a full history scan; the
    store itself always equals history's is_current slice."""
    from openlogreplicator_spark.plans.scd2_apply import (
        bootstrap_scd2_open_target,
    )

    surv = _assembled_with_state(spark, seed=41).localCheckpoint()
    want = _norm(scd2_history(surv, ["conv_id", "turn_idx"], list(PAYLOAD)))

    qs = surv.approxQuantile("commit_scn", [0.33, 0.66], 0.0)
    cuts = [int(q) for q in qs]
    parts = [
        surv.where(F.col("commit_scn") <= cuts[0]),
        surv.where((F.col("commit_scn") > cuts[0])
                   & (F.col("commit_scn") <= cuts[1])),
        surv.where(F.col("commit_scn") > cuts[1]),
    ]
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    for i, b in enumerate(parts, start=1):
        s = apply_scd2_batch(spark, b, hist, CFG, batch_id=i,
                             open_table=open_t)
        assert not s.get("skipped") and not s["open_store"].get("skipped")

    pd.testing.assert_frame_equal(_norm(hist.read(spark)), want)
    # the open store is exactly history's is_current slice
    got_open = (open_t.read(spark).toPandas()
                .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want_open = (hist.read(spark).where("is_current")
                 .select("conv_id", "turn_idx", "role", "text", "ts",
                         "valid_from")
                 .toPandas().sort_values(["conv_id", "turn_idx"])
                 .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_open, want_open, check_dtype=False)

    # idempotent retry: replaying a batch id is skipped on BOTH tables
    s = apply_scd2_batch(spark, parts[-1], hist, CFG, batch_id=3,
                         open_table=open_t)
    assert s.get("skipped") and s["open_store"].get("skipped")
    pd.testing.assert_frame_equal(_norm(hist.read(spark)), want)


def test_open_store_crash_between_merges_then_retry(spark, tmp_path):
    """Crash INJECTED between the history merge and the open-store merge:
    the retry of the same batch recomputes from the not-yet-updated store,
    the history merge is skipped by its write-audit, the open merge lands —
    final state equals the uninterrupted run (the module-doc replay
    argument, pinned)."""
    from openlogreplicator_spark.plans.scd2_apply import (
        bootstrap_scd2_open_target,
    )

    surv = _assembled_with_state(spark, seed=43).localCheckpoint()
    mid = surv.agg(F.expr("percentile_approx(commit_scn, 0.5)")).first()[0]
    b1 = surv.where(F.col("commit_scn") <= mid)
    b2 = surv.where(F.col("commit_scn") > mid)

    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    apply_scd2_batch(spark, b1, hist, CFG, batch_id=1, open_table=open_t)

    # batch 2: history merge lands, then the process "dies" before the
    # open-store merge
    orig = open_t.merge
    open_t.merge = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected crash before open-store merge"))
    with pytest.raises(RuntimeError, match="injected crash"):
        apply_scd2_batch(spark, b2, hist, CFG, batch_id=2, open_table=open_t)
    open_t.merge = orig
    assert hist.last_batch_id() == 2      # history landed
    assert open_t.last_batch_id() == 1    # store did not

    # retry of batch 2 (same batch_id)
    s = apply_scd2_batch(spark, b2, hist, CFG, batch_id=2, open_table=open_t)
    assert s.get("skipped")                       # history audit skip
    assert not s["open_store"].get("skipped")     # store catches up

    want = _norm(scd2_history(surv, ["conv_id", "turn_idx"], list(PAYLOAD)))
    pd.testing.assert_frame_equal(_norm(hist.read(spark)), want)
    got_open = (open_t.read(spark).select("conv_id", "turn_idx", "valid_from")
                .toPandas().sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))
    want_open = (hist.read(spark).where("is_current")
                 .select("conv_id", "turn_idx", "valid_from")
                 .toPandas().sort_values(["conv_id", "turn_idx"])
                 .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_open, want_open, check_dtype=False)


ASSEMBLED_SCHEMA = (
    "conv_id string, turn_idx long, op string, scn long, seq long,"
    " xid string, commit_scn long,"
    " after struct<role:string,text:string,ts:timestamp>,"
    " cols_set array<string>"
)

# adjacent transactions whose event scns differ by >> 2^22 (the round-3
# packing commit_scn*2^22+scn INVERTED these), plus one transaction whose
# unnested MI packs TWO versions of the same key (shared scn, seq 0/1)
_BIG_SCN_ROWS = [
    ("c1", 1, "I", 99_999_999, 0, "a", 100_000_000,
     ("user", "A1", None), ["role", "text"]),
    ("c1", 1, "U", 50_000_000, 0, "b", 100_000_001,
     (None, "B1", None), ["text"]),
    ("c1", 1, "U", 60_000_000, 0, "c", 100_000_002,
     (None, "C1", None), ["text"]),
    ("c1", 1, "U", 60_000_000, 1, "c", 100_000_002,
     (None, "C2", None), ["text"]),
    # a second key in tx c so the rank window really mixes keys
    ("c2", 7, "I", 60_000_000, 2, "c", 100_000_002,
     ("user", "X1", None), ["role", "text"]),
]


def test_ordinal_large_scn_spread_and_multirow_packing(spark, tmp_path):
    """Round-4 pin of verdict item 1: the default ordinal keeps commit
    order when event scns exceed 2^22 spread, and distinguishes two
    unnested versions of one key inside one transaction."""
    ev = spark.createDataFrame(_BIG_SCN_ROWS, ASSEMBLED_SCHEMA)
    hist = scd2_history(ev, ["conv_id", "turn_idx"], list(PAYLOAD))
    rows = (hist.where("conv_id = 'c1'")
            .orderBy("valid_from").collect())
    assert [r["text"] for r in rows] == ["A1", "B1", "C1", "C2"]
    # strictly increasing, commit-major ordinals; C1/C2 differ by rank only
    vf = [r["valid_from"] for r in rows]
    assert vf == sorted(vf) and len(set(vf)) == 4
    assert vf[3] - vf[2] == 1  # same tx, adjacent ranks
    assert rows[-1]["is_current"] and not rows[0]["is_current"]
    # chained ranges: each version closes exactly at the next's start
    assert [r["valid_to"] for r in rows[:-1]] == vf[1:]

    # incremental apply across a batch split equals the one-shot result
    want = _norm(hist)
    h = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    b1 = ev.where(F.col("commit_scn") <= 100_000_001)
    b2 = ev.where(F.col("commit_scn") > 100_000_001)
    apply_scd2_batch(spark, b1, h, CFG, batch_id=1)
    apply_scd2_batch(spark, b2, h, CFG, batch_id=2)
    pd.testing.assert_frame_equal(_norm(h.read(spark)), want)


def test_ordinal_overflow_guard_raises(spark):
    """The packing is GUARDED: a transaction larger than 2^rank_bits ops,
    or a commit_scn beyond 2^(63-rank_bits), fails loudly instead of
    silently reordering history."""
    from openlogreplicator_spark.operators.scd2 import packed_version_ord

    ev = spark.createDataFrame(_BIG_SCN_ROWS, ASSEMBLED_SCHEMA)
    # rank overflow: tx 'c' has 3 ops > 2^1
    with pytest.raises(Exception, match="scd2 ordinal overflow"):
        ev.withColumn("o", packed_version_ord(rank_bits=1)).collect()
    # commit_scn overflow at the default width
    big = ev.withColumn("commit_scn", F.col("commit_scn") + F.lit(1 << 43))
    with pytest.raises(Exception, match="scd2 ordinal overflow"):
        big.withColumn("o", packed_version_ord()).collect()
    # in-range data is untouched by the guard
    assert ev.withColumn("o", packed_version_ord()).count() == len(_BIG_SCN_ROWS)


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

    from openlogreplicator_spark.plans.scd2_apply import (
        bootstrap_scd2_open_target,
    )

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), cfg)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             history_table=hist,
                             history_open_table=open_t)
    q = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                        available_now=True)
    q.awaitTermination(180)
    pipe.detach_metrics()

    surv = assemble_transactions_sql(feed, cfg).select(
        "conv_id", "turn_idx", "op", "scn", "seq", "xid", "commit_scn",
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
    # the streamed open store tracks history's is_current slice exactly
    assert open_t.read(spark).count() == cur
    diff = (open_t.read(spark).select("conv_id", "turn_idx", "valid_from")
            .exceptAll(hist.read(spark).where("is_current")
                       .select("conv_id", "turn_idx", "valid_from")))
    assert diff.count() == 0
