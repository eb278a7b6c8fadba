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


class _FakeState:
    """Minimal GroupState stand-in for kernel-level unit tests."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None


def _run_kernel(rows, state=None):
    import pandas as pd

    from openlogreplicator_spark.streaming.native_state import make_assembler

    fn = make_assembler(CFG)
    st = state or _FakeState()
    pdf = pd.DataFrame(rows, columns=[
        "xid", "scn", "seq", "op", "conv_id", "turn_idx", "payload"])
    out = [f for f in fn(("x1",), [pdf], st) if len(f)]
    import pandas as _pd
    emitted = _pd.concat(out, ignore_index=True) if out else _pd.DataFrame(
        columns=["xid", "scn", "seq", "op", "commit_scn"])
    return emitted, st


def test_kernel_rollback_then_new_tx_same_batch():
    """R mid-batch discards only the pre-R buffer; a reused xid's later
    B/I/C in the same batch commits independently (terminators processed in
    order, not just the last one)."""
    emitted, st = _run_kernel([
        ("x1", 1, 0, "I", "c1", 1, "{}"),
        ("x1", 2, 1, "R", None, None, None),
        ("x1", 3, 0, "B", None, None, None),
        ("x1", 4, 1, "I", "c1", 2, "{}"),
        ("x1", 5, 2, "C", None, None, None),
    ])
    assert sorted(emitted["scn"]) == [4]
    assert list(emitted["commit_scn"]) == [5]
    assert not st.exists


def test_kernel_rollback_then_open_tx_same_batch():
    """After an R, a new open (unterminated) transaction of the same xid
    must persist in state — not be dropped with the rolled-back one."""
    emitted, st = _run_kernel([
        ("x1", 1, 0, "I", "c1", 1, "{}"),
        ("x1", 2, 1, "R", None, None, None),
        ("x1", 3, 0, "B", None, None, None),
        ("x1", 4, 1, "I", "c1", 2, "{}"),
    ])
    assert len(emitted) == 0
    assert st.exists
    *arrays, has_begin = st.get  # parallel flat arrays (round-3 slim state)
    assert has_begin and len(arrays[0]) == 1
    # the follow-up commit in the next batch emits the surviving I@4
    emitted2, st2 = _run_kernel([("x1", 5, 2, "C", None, None, None)], st)
    assert sorted(emitted2["scn"]) == [4] and not st2.exists


def test_kernel_two_commits_same_batch():
    emitted, st = _run_kernel([
        ("x1", 1, 0, "B", None, None, None),
        ("x1", 2, 1, "I", "c1", 1, "{}"),
        ("x1", 3, 2, "C", None, None, None),
        ("x1", 4, 0, "B", None, None, None),
        ("x1", 5, 1, "U", "c1", 1, "{}"),
        ("x1", 6, 2, "C", None, None, None),
    ])
    got = sorted(zip(emitted["scn"], emitted["commit_scn"]))
    assert got == [(2, 3), (5, 6)]
    assert not st.exists


def test_streaming_assembly_preserves_microseconds(spark, tmp_path):
    """The state-store JSON round-trip must not truncate timestamps to
    milliseconds (explicit micros timestampFormat)."""
    import datetime

    from openlogreplicator_spark.feed import pandas_to_events_df

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    events = generate_change_events(spark, n_txs=5, n_convs=2, seed=7)
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    pdf["ts"] = ts
    pdf["after"] = pdf["after"].map(
        lambda a: None if a is None else {**a.asDict(), "ts": ts})
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    sdf = pandas_to_events_df(spark, pdf)
    tmp = os.path.join(feed_dir, "_t")
    sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(tmp + "/part-*.parquet")[0],
                os.path.join(feed_dir, "seq0000.parquet"))
    shutil.rmtree(tmp)

    src = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(feed_dir)
    out_dir = str(tmp_path / "out")
    q = (
        streaming_assembly(src, CFG)
        .writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [r["ts"] for r in
           spark.read.parquet(out_dir).select("after.ts").collect()
           if r["ts"] is not None]  # D / trimmed-U rows carry no after.ts
    assert got and all(v.microsecond == 123456 for v in got)


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


def test_slim_assembly_equals_full_including_payload(spark, tmp_path):
    """Keys-only state form: slim streaming assembly + batch-side payload
    re-join from the feed files == the batch assembler's FULL output
    (payload text included), across microbatch-spanning transactions and
    packed multi-row events."""
    from openlogreplicator_spark.operators.decode import unnest_multirow
    from openlogreplicator_spark.streaming.native_state import (
        rejoin_payload, streaming_assembly_slim,
    )

    events = generate_change_events(spark, n_txs=150, n_convs=20, seed=83,
                                    p_partial_rollback=0.15)
    feed_dir = str(tmp_path / "feed")
    _write_feed_files(spark, events, feed_dir, n_files=5)

    src = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_assembly_slim(src, CFG)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    slim = spark.read.parquet(out_dir)
    assert "payload" not in slim.columns and "after" not in slim.columns
    full = rejoin_payload(spark, slim, feed_dir)

    cols = ["xid", "scn", "seq", "op", "commit_scn", "conv_id", "turn_idx"]
    got = (
        full.select(*cols, F.col("after.text").alias("text"))
        .toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    )
    want = (
        unnest_multirow(assemble_transactions_sql(events, CFG))
        .select(*cols, F.col("after.text").alias("text"))
        .toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)

    # the re-join's feed scan is scn-bounded (pushed to the parquet scan)
    plan = rejoin_payload(spark, slim, feed_dir) \
        ._jdf.queryExecution().toString()
    assert "GreaterThanOrEqual(scn" in plan and "LessThanOrEqual(scn" in plan

    # the boundless form caches the slim side but DRAINS the previous
    # call's cache — per-microbatch use never accumulates (round-3 ADVICE)
    from openlogreplicator_spark.streaming import native_state as ns

    assert len(ns._REJOIN_CACHED) == 1  # only the latest call's handle
    rejoin_payload(spark, slim, feed_dir)
    assert len(ns._REJOIN_CACHED) == 1
    ns.release_rejoin_cache()
    assert not ns._REJOIN_CACHED
    # bounded form never caches
    rejoin_payload(spark, slim, feed_dir, bounds=(0, 10))
    assert not ns._REJOIN_CACHED


def test_rejoin_cache_scoped_per_feed_dir():
    """Two pipelines in one driver (round-4 ADVICE): releasing one feed
    dir's cached slim frame must not unpersist the other's in-flight
    frame; a bare release drains everything."""
    from openlogreplicator_spark.streaming import native_state as ns

    class Stub:
        unpersisted = False

        def unpersist(self):
            self.unpersisted = True

    a, b = Stub(), Stub()
    with ns._REJOIN_LOCK:
        saved = dict(ns._REJOIN_CACHED)
        ns._REJOIN_CACHED.clear()
    try:
        ns._REJOIN_CACHED["feedA"] = a
        ns._REJOIN_CACHED["feedB"] = b
        ns.release_rejoin_cache("feedA")
        assert a.unpersisted and not b.unpersisted
        assert list(ns._REJOIN_CACHED) == ["feedB"]
        ns.release_rejoin_cache("feedA")  # absent key: no-op
        assert not b.unpersisted
        ns.release_rejoin_cache()  # None: drain ALL
        assert b.unpersisted and not ns._REJOIN_CACHED
    finally:
        with ns._REJOIN_LOCK:
            ns._REJOIN_CACHED.clear()
            ns._REJOIN_CACHED.update(saved)
