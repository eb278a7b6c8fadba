"""Round-3 hardening features:

  * bucket-count evolution (LakeTable.rebucket — Iceberg rewrite_data_files
    under a new bucket spec);
  * Kafka producer contract (sinks/kafka.py — merge-key partitioning +
    idempotent re-send, WriterKafka.cpp:52-57,116-138 analog);
  * multi-table staging for 2 targets (feed scanned/assembled once);
  * assembly_mode='auto' (broadcast-threshold policy).
"""

import glob
import json
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import (
    generate_change_events,
    sequential_oracle,
)
from openlogreplicator_spark.lake import LakeTable
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch

CFG = EngineConfig(num_buckets=4)


def _final_state(table, spark):
    pdf = table.read(spark).toPandas()
    return (
        pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )


def _assert_eq(got, want):
    want = want.astype({"turn_idx": "int64"})
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


# ------------------------------------------------------------------ rebucket

def test_rebucket_mid_stream(spark, tmp_path):
    """Rebucket between two batches: reads stay correct, subsequent merges
    hash with the new count, old snapshots keep their files, watermarks
    survive (a rebucket never licenses re-applying batches)."""
    events = generate_change_events(spark, n_txs=200, n_convs=25, seed=61)
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    oracle = sequential_oracle(pdf).drop(columns=["meta"])
    half_scn = int(pdf["scn"].median())

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    first = events.where(F.col("scn") <= half_scn)
    second = events.where(F.col("scn") > half_scn)
    replay_batch(spark, first, table, CFG, batch_id=1)
    wm_batch, wm_scn = table.last_batch_id(), table.last_scn()
    rows_before = table.read(spark).count()

    s = table.rebucket(spark, 16)
    assert s["operation"] == "rebucket" and s["num_buckets"] == 16
    assert table.num_buckets == 16
    # watermarks preserved; content unchanged
    assert table.last_batch_id() == wm_batch and table.last_scn() == wm_scn
    assert table.read(spark).count() == rows_before
    # every live file carries a bucket id under the new spec
    assert all(0 <= f["bucket"] < 16 for f in table.manifest()["files"])
    # bucket pruning agrees with the new bucket_expr
    full = table.read(spark)
    b0 = table.read(spark, buckets=[0]).count()
    expect_b0 = full.where(table.bucket_expr() == 0).count()
    assert b0 == expect_b0

    # idempotent no-op on same count
    assert table.rebucket(spark, 16).get("skipped")

    # subsequent merge lands correctly under the new spec
    replay_batch(spark, second, table, CFG, batch_id=2)
    _assert_eq(_final_state(table, spark), oracle)

    # old snapshot (pre-rebucket) still readable: its manifest references
    # intact files under the old bucket count
    old_v = [i for i, sn in enumerate(table.snapshots())
             if sn["summary"].get("operation") == "merge"][0]
    old_m = table.manifest(old_v)
    for f in old_m["files"]:
        assert os.path.exists(os.path.join(table.path, f["path"]))

    # a RETRY of batch 2 after the rebucket is still skipped
    out = replay_batch(spark, second, table, CFG, batch_id=2)
    assert all(x.get("skipped") for x in out if x is not None)


# --------------------------------------------------------------- kafka (W1)

def _spool_producer_factory(spool_dir):
    """Factory-of-factories for a picklable mock producer that appends
    records to a per-task spool file. The producer class is defined INSIDE
    this function so cloudpickle ships it by value (a module-level class in
    a pytest file is pickled by reference, and executors can't import the
    test module). The 'broker' (the test) replays spools to check the
    contract."""

    def make():
        import json as _json
        import os as _os
        import uuid as _uuid

        class SpoolProducer:
            def __init__(self):
                self.path = _os.path.join(
                    spool_dir, f"task-{_uuid.uuid4().hex}.jsonl"
                )
                self.rows = []

            def send(self, key, value, dedup_id):
                self.rows.append(
                    {"key": key, "value": value, "dedup_id": dedup_id}
                )

            def flush(self):
                with open(self.path, "w") as f:
                    for r in self.rows:
                        f.write(_json.dumps(r) + "\n")

        return SpoolProducer()

    return make


def _spooled(spool_dir):
    rows = []
    per_task = []
    for p in sorted(glob.glob(os.path.join(spool_dir, "task-*.jsonl"))):
        t = [json.loads(l) for l in open(p).read().splitlines() if l]
        if t:
            per_task.append(t)
            rows += t
    return rows, per_task


def test_kafka_contract_keying_order_and_idempotent_resend(spark, tmp_path):
    from openlogreplicator_spark.operators.assembly import (
        assemble_transactions_sql,
    )
    from openlogreplicator_spark.operators.decode import decode_events
    from openlogreplicator_spark.sinks import change_stream_ops, kafka_records
    from openlogreplicator_spark.sinks.kafka import produce

    cfg = EngineConfig()
    events = decode_events(
        generate_change_events(spark, n_txs=60, n_convs=6, seed=67), cfg
    )
    assembled = assemble_transactions_sql(events, cfg)
    msgs = change_stream_ops(assembled, cfg)
    recs = kafka_records(msgs, cfg, batch_id=7)

    # round 4: the routing key comes from the carried merge-key COLUMNS —
    # the plan must not re-parse it out of the rendered JSON message
    plan = recs._jdf.queryExecution().toString()
    assert "get_json_object" not in plan

    spool1 = str(tmp_path / "spool1")
    os.makedirs(spool1)
    produce(recs, _spool_producer_factory(spool1))
    rows, per_task = _spooled(spool1)
    assert len(rows) == msgs.count() > 0

    # contract 1: KEY = the merge key from the message payload itself
    for r in rows:
        v = json.loads(r["value"])
        assert r["key"] == json.dumps(v["payload"]["key"], separators=(",", ":")) or \
            json.loads(r["key"]) == v["payload"]["key"]

    # contract 2: all records of one key live in ONE task's spool, in
    # commit order (Kafka per-partition ordering analog)
    key_home = {}
    for ti, t in enumerate(per_task):
        seen_ord = {}
        for r in t:
            key_home.setdefault(r["key"], ti)
            assert key_home[r["key"]] == ti, "key split across partitions"
            v = json.loads(r["value"])
            prev = seen_ord.get(r["key"])
            cur = (v["scn"], v.get("op_scn", 0))
            if prev is not None:
                assert cur >= prev, "per-key commit order violated"
            seen_ord[r["key"]] = cur

    # contract 3: idempotent re-send — the SAME batch re-produced yields
    # byte-identical records with identical dedup ids; a dedup store
    # collapses the retry to zero new records
    spool2 = str(tmp_path / "spool2")
    os.makedirs(spool2)
    produce(kafka_records(msgs, cfg, batch_id=7), _spool_producer_factory(spool2))
    rows2, _ = _spooled(spool2)
    first = {r["dedup_id"]: r["value"] for r in rows}
    second = {r["dedup_id"]: r["value"] for r in rows2}
    assert first == second
    # and a NEW batch id produces distinct dedup ids (no false dedupe)
    spool3 = str(tmp_path / "spool3")
    os.makedirs(spool3)
    produce(kafka_records(msgs, cfg, batch_id=8), _spool_producer_factory(spool3))
    rows3, _ = _spooled(spool3)
    assert {r["dedup_id"] for r in rows3}.isdisjoint(first.keys())


# ------------------------------------------------- multi-table staging (2)

def test_two_target_multi_replay_stages_once(spark, tmp_path, monkeypatch):
    """With 2 targets the assembled output is staged once (round-2 verdict:
    the old <=2 path re-ran scan+assembly per target); results still match
    per-table sequential oracles."""
    import openlogreplicator_spark.plans.replay as R

    # p_partial_rollback=0: PR pops the globally-last DML regardless of
    # table, which a per-table filtered oracle can't replay; the global-PR
    # multi-table path is oracle-checked by the driver's cdc_multi_table
    events = generate_change_events(
        spark, n_txs=150, n_convs=20, p_partial_rollback=0.0, seed=71
    )
    ev = events.withColumn(
        "table",
        F.when(~F.col("op").isin("I", "U", "D"), F.lit("transcripts"))
        .otherwise(F.when(F.col("scn") % 2 == 0, F.lit("transcripts"))
                   .otherwise(F.lit("notes"))),
    )
    staged = {"n": 0}
    real_mkdtemp = R._tmp_mkdtemp if hasattr(R, "_tmp_mkdtemp") else None

    import tempfile as _tmp
    orig = _tmp.mkdtemp

    def counting_mkdtemp(*a, **k):
        if k.get("prefix", "").startswith("olr_multi_stage"):
            staged["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(_tmp, "mkdtemp", counting_mkdtemp)

    from openlogreplicator_spark.feed import TRANSCRIPTS_SCHEMA

    tables = {
        name: LakeTable.create(str(tmp_path / name), TRANSCRIPTS_SCHEMA,
                               ["conv_id", "turn_idx"], num_buckets=4)
        for name in ("transcripts", "notes")
    }
    R.replay_batch_multi(spark, ev, tables, CFG, batch_id=1)
    assert staged["n"] == 1, "2-target replay must stage assembled output once"

    pdf = ev.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    for name, table in tables.items():
        is_dml = pdf["op"].isin(["I", "U", "D", "MI", "MD"])
        keep = ~is_dml | (
            (pdf["scn"] % 2 == 0) if name == "transcripts" else (pdf["scn"] % 2 == 1)
        )
        oracle = sequential_oracle(
            pdf[keep].reset_index(drop=True)
        ).drop(columns=["meta"])
        _assert_eq(_final_state(table, spark), oracle)


# ------------------------------------------------------- assembly_mode=auto

def test_assembly_auto_policy(spark):
    from openlogreplicator_spark.plans.replay import resolve_assembly_mode

    ev = generate_change_events(spark, n_txs=50, n_convs=5, seed=73)
    # explicit modes pass through
    assert resolve_assembly_mode(ev, EngineConfig(assembly_mode="pandas")) is True
    assert resolve_assembly_mode(ev, EngineConfig(assembly_mode="sql")) is False
    # auto: a tiny feed broadcasts -> pandas
    assert resolve_assembly_mode(ev, EngineConfig(assembly_mode="auto")) is True
    # auto: verdict side over the broadcast threshold -> sql
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        assert resolve_assembly_mode(ev, EngineConfig(assembly_mode="auto")) is False
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_assembly_auto_replay_matches_oracle(spark, tmp_path):
    """Full replay under the new default ('auto') matches the oracle on a
    feed with every event class (multirow, partial rollback, DDL)."""
    cfg = EngineConfig(num_buckets=4)
    assert cfg.assembly_mode == "auto"
    events = generate_change_events(
        spark, n_txs=150, n_convs=12, p_multirow=0.2, p_partial_rollback=0.15,
        p_rollback=0.1, with_ddl=True, seed=79,
    )
    oracle = sequential_oracle(events.toPandas())
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    replay_batch(spark, events, table, cfg, batch_id=1)
    got = _final_state(table, spark)
    got = got[[c for c in got.columns if c in oracle.columns]]
    _assert_eq(got, oracle[got.columns.tolist()])


# ----------------------------------------------- NOW / relative start modes

def test_start_now_resolves_past_feed_end(spark):
    """start_now resolves to feed-max-scn + 1 once (reference NOW start):
    the entire existing feed is excluded; a later event is included."""
    from openlogreplicator_spark.operators.decode import (
        apply_start_position,
        resolve_start_position,
    )

    events = generate_change_events(spark, n_txs=50, n_convs=10, seed=83)
    mx = events.agg(F.max("scn")).collect()[0][0]
    cfg = resolve_start_position(events, EngineConfig(start_now=True))
    assert cfg.start_now is False and cfg.start_scn == mx + 1
    assert apply_start_position(events, cfg).count() == 0
    # a "future" event (scn past the resolution point) passes the predicate
    future = events.withColumn("scn", F.col("scn") + F.lit(mx + 1))
    assert apply_start_position(future, cfg).count() == events.count()
    # batch path resolves inline too (static frame)
    assert apply_start_position(
        events, EngineConfig(start_now=True)
    ).count() == 0


def test_start_relative_time_resolves_window(spark):
    """start_relative_s keeps only the trailing N seconds of the feed
    (reference start-time-rel), and intersects with an explicit start_ts."""
    from openlogreplicator_spark.operators.decode import (
        apply_start_position,
        resolve_start_position,
    )

    events = generate_change_events(spark, n_txs=100, n_convs=10, seed=89)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo).total_seconds()
    assert span > 2, "fixture needs a multi-second ts span"
    cfg = resolve_start_position(
        events, EngineConfig(start_relative_s=int(span // 2))
    )
    assert cfg.start_relative_s is None and cfg.start_ts is not None
    kept = apply_start_position(events, cfg).count()
    assert 0 < kept < events.count()
    # an explicit later start_ts wins over a looser relative window
    cfg2 = resolve_start_position(
        events,
        EngineConfig(start_relative_s=int(span * 10), start_ts=cfg.start_ts),
    )
    assert cfg2.start_ts == cfg.start_ts
    assert apply_start_position(events, cfg2).count() == kept


def test_start_now_streaming_resolves_once(spark, tmp_path):
    """A stream opened with start_now skips the pre-existing feed files and
    applies only later events (resolution happens at stream setup, not per
    microbatch)."""
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4, start_now=True)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    pre = generate_change_events(spark, n_txs=60, n_convs=8, seed=97)
    pre.coalesce(1).write.mode("append").parquet(feed_dir)
    mx = pre.agg(F.max("scn")).collect()[0][0]

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"))
    # later events: same feed shifted past the resolution point
    post = pre.withColumn("scn", F.col("scn") + F.lit(mx + 1))
    post_pdf = post.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    oracle = sequential_oracle(post_pdf).drop(columns=["meta"])

    q = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                        available_now=True)
    q.awaitTermination(120)
    # resolution happened once at setup: config now carries the concrete scn
    assert pipe.cfg.start_now is False and pipe.cfg.start_scn == mx + 1
    assert table.read(spark).count() == 0, "pre-existing feed skipped"

    post.coalesce(1).write.mode("append").parquet(feed_dir)
    q2 = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                         available_now=True)
    q2.awaitTermination(120)
    pipe.detach_metrics()
    _assert_eq(_final_state(table, spark), oracle)
