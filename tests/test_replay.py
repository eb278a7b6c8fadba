"""End-to-end replay equality: engine final state == sequential oracle.

Mirrors OLR's replay contract (SURVEY.md §5): after replaying the full change
feed, the target table equals a one-event-at-a-time materialization, with
per-turn text equality under stable (conv_id, turn_idx) ordering.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as pd_F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events, sequential_oracle
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch


def _final_state(table, spark) -> pd.DataFrame:
    pdf = table.read(spark).toPandas()
    return (
        pdf.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )


def _assert_state_equals(got: pd.DataFrame, want: pd.DataFrame):
    want = want.astype({"turn_idx": "int64"})
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


@pytest.mark.parametrize("use_pandas", [True, False])
def test_replay_matches_sequential_oracle(spark, tmp_path, use_pandas):
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, n_txs=300, n_convs=40, seed=42)
    oracle = sequential_oracle(events.toPandas())
    # drop `meta` (no DDL in this feed -> column never exists on target)
    oracle = oracle.drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    summaries = replay_batch(
        spark, events, table, cfg, batch_id=1, use_pandas_assembly=use_pandas
    )
    assert summaries and summaries[0]["rows_merged"] > 0
    _assert_state_equals(_final_state(table, spark), oracle)


def test_replay_in_chunks_matches_oracle(spark, tmp_path):
    """Feed split into scn-ordered chunks (microbatch analog) -> same state."""
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, n_txs=200, n_convs=30, seed=7)
    pdf = events.toPandas().sort_values(["scn", "seq"])
    oracle = sequential_oracle(pdf).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    # NOTE: chunking by scn rank keeps whole transactions out of order across
    # chunks; transactions spanning chunks are exercised in streaming tests
    # (pending state). Here each chunk is a contiguous scn slice and
    # transactions may span chunks -> accumulate raw events and replay the
    # union each time with the hwm filter doing the dedup.
    cuts = [0.0, 0.4, 0.75, 1.0]
    scns = sorted(pdf["scn"].tolist())
    for i in range(3):
        lo = scns[int(cuts[i] * (len(scns) - 1))]
        hi = scns[int(cuts[i + 1] * (len(scns) - 1))]
        chunk = events.where(
            (events.scn > (lo if i else -1)) & (events.scn <= hi)
        )
        # carry all events so far: spanning txs need earlier events
        upto = events.where(events.scn <= hi)
        replay_batch(spark, upto, table, cfg, batch_id=i + 1)
    _assert_state_equals(_final_state(table, spark), oracle)


def test_replay_idempotent_retry(spark, tmp_path):
    """Re-running the same batch id must be a no-op (write-audit skip)."""
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, n_txs=100, n_convs=20, seed=3)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    replay_batch(spark, events, table, cfg, batch_id=1)
    v1 = table.current_version()
    state1 = _final_state(table, spark)
    out = replay_batch(spark, events, table, cfg, batch_id=1)
    assert all(s.get("skipped") for s in out)
    assert table.current_version() == v1
    _assert_state_equals(_final_state(table, spark), state1)


def test_assembly_sql_equals_pandas(spark, tmp_path):
    cfg = EngineConfig()
    from openlogreplicator_spark.operators.assembly import (
        assemble_transactions_pandas,
        assemble_transactions_sql,
    )
    from openlogreplicator_spark.operators.decode import decode_events

    events = decode_events(generate_change_events(spark, n_txs=150, seed=11), cfg)
    a = assemble_transactions_sql(events, cfg).select("scn", "seq", "xid", "commit_scn")
    b = assemble_transactions_pandas(events, cfg).select("scn", "seq", "xid", "commit_scn")
    pa = a.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)


@pytest.mark.parametrize(
    "kw",
    [
        # heavy partial-rollback pressure (stack retraction, D6)
        dict(n_txs=250, n_convs=25, p_partial_rollback=0.25, p_rollback=0.15, seed=101),
        # delete-heavy with hot-key skew (RP resurrection semantics)
        dict(n_txs=250, n_convs=10, p_delete=0.3, zipf_a=6.0, seed=202),
        # long transactions, few conversations (key collisions across txs)
        dict(n_txs=120, n_convs=5, max_dml=16, seed=303),
    ],
)
def test_replay_oracle_stress(spark, tmp_path, kw):
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, **kw)
    oracle = sequential_oracle(events.toPandas()).drop(columns=["meta"])
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    replay_batch(spark, events, table, cfg, batch_id=1)
    _assert_state_equals(_final_state(table, spark), oracle)


@pytest.mark.parametrize("use_pandas", [True, False])
def test_replay_multirow_matches_oracle(spark, tmp_path, use_pandas):
    """D5 real path: MI/MD events stay PACKED through assembly (one PR pops
    the whole vector, reference TransactionBuffer.cpp:159-183 whole-record
    pop) and unnest afterwards; final state equals the sequential oracle."""
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(
        spark, n_txs=250, n_convs=30, p_multirow=0.25,
        p_partial_rollback=0.12, seed=57,
    )
    n_multi = events.where(events.op.isin("MI", "MD")).count()
    assert n_multi > 10, "fixture must contain packed multi-row events"
    oracle = sequential_oracle(events.toPandas()).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    replay_batch(spark, events, table, cfg, batch_id=1,
                 use_pandas_assembly=use_pandas)
    _assert_state_equals(_final_state(table, spark), oracle)


def test_unnest_drops_keyless_packed_rows(spark, tmp_path):
    """A malformed packed row with null merge keys must be dropped at
    unnest — the row-class keyless-DML invariant, which decode exempts
    MI/MD from because their keys live inside `rows`."""
    import datetime

    from openlogreplicator_spark.feed import CHANGE_EVENT_SCHEMA

    T0 = datetime.datetime(2024, 1, 1)
    img = ("user", "ok", None, T0, None)
    good = ("c1", 1, img, ["role", "text", "ts"])
    bad = (None, None, img, ["role", "text", "ts"])
    rows = [
        (1, 0, "x1", "B", "transcripts", None, None, None, None, [], [],
         None, None, T0),
        (2, 1, "x1", "MI", "transcripts", None, None, None, None, [], [],
         [good, bad], None, T0),
        (3, 2, "x1", "C", "transcripts", None, None, None, None, [], [],
         None, None, T0),
    ]
    ev = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    cfg = EngineConfig(num_buckets=2)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    replay_batch(spark, ev, table, cfg, batch_id=1)
    got = table.read(spark).collect()
    assert len(got) == 1
    assert (got[0]["conv_id"], got[0]["turn_idx"]) == ("c1", 1)


def test_streaming_multirow_matches_oracle(spark, tmp_path):
    """MI/MD through the streaming pipeline: packed vectors may sit in the
    pending store across batches before their commit arrives."""
    from openlogreplicator_spark.feed import pandas_to_events_df
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(
        spark, n_txs=150, n_convs=20, p_multirow=0.3, seed=63,
    )
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    oracle = sequential_oracle(pdf).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"))
    n = len(pdf)
    for i in range(3):
        pipe.process_batch(
            pandas_to_events_df(spark, pdf.iloc[(n * i) // 3:(n * (i + 1)) // 3]), i
        )
    _assert_state_equals(_final_state(table, spark), oracle)


def test_replay_kitchen_sink_matches_oracle(spark, tmp_path):
    """Everything at once: packed multi-row events + heavy partial rollback
    + hot-key skew + schema-evolution DDL + start position, against the
    sequential oracle."""
    cfg = EngineConfig(num_buckets=4, start_scn=None)
    events = generate_change_events(
        spark, n_txs=300, n_convs=12, p_multirow=0.2,
        p_partial_rollback=0.15, p_rollback=0.1, zipf_a=5.0,
        with_ddl=True, seed=71,
    )
    oracle = sequential_oracle(events.toPandas())
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    replay_batch(spark, events, table, cfg, batch_id=1)
    got = _final_state(table, spark)
    assert "meta" in got.columns
    _assert_state_equals(got, oracle)


def test_replay_with_ddl_matches_oracle(spark, tmp_path):
    """Batch replay with mid-feed ADD COLUMN + WIDEN: the target evolves and
    post-DDL events populate the new column (reference only *reports* DDL —
    OutputBuffer.cpp:1957-2007; we apply it)."""
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, n_txs=200, n_convs=30, with_ddl=True, seed=5)
    oracle = sequential_oracle(events.toPandas())  # keeps `meta`
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    replay_batch(spark, events, table, cfg, batch_id=1)
    got = _final_state(table, spark)
    assert "meta" in got.columns
    assert got["meta"].notna().any(), "post-DDL events must populate meta"
    assert str(table.schema()["turn_idx"].dataType) == "LongType()"
    _assert_state_equals(got, oracle)


def test_sql_assembly_slim_join_equals_full(spark):
    """slim_join=True (verdict windows over slim columns + payload re-join)
    must produce EXACTLY the full-width window form's output — committed
    rows and open rows — on a feed with partial rollbacks and packed
    multi-row events."""
    from openlogreplicator_spark.operators.assembly import (
        assemble_transactions_sql,
    )

    cfg = EngineConfig()
    events = generate_change_events(spark, n_txs=150, n_convs=20, seed=77,
                                    p_partial_rollback=0.2)
    # drop terminators for some txs so open rows exist
    cut = events.agg(pd_F.expr("percentile(scn, 0.9)")).first()[0]
    ev = events.where(events.scn <= cut)

    full_out, full_open = assemble_transactions_sql(ev, cfg, emit_open=True)
    slim_out, slim_open = assemble_transactions_sql(ev, cfg, emit_open=True,
                                                    slim_join=True)
    assert full_out.columns == slim_out.columns
    assert full_open.columns == slim_open.columns

    def norm(df, cols):
        return (df.select(*cols).toPandas()
                .sort_values(["xid", "scn", "seq"]).reset_index(drop=True))

    key_cols = ["xid", "scn", "seq", "op", "conv_id", "turn_idx",
                "commit_scn"]
    pd.testing.assert_frame_equal(norm(full_out, key_cols),
                                  norm(slim_out, key_cols))
    open_cols = ["xid", "scn", "seq", "op"]
    pd.testing.assert_frame_equal(norm(full_open, open_cols),
                                  norm(slim_open, open_cols))
    assert norm(full_open, open_cols).shape[0] > 0
    # payload equality on the committed side
    txt = ["xid", "scn", "seq"]
    a = (full_out.select(*txt, pd_F.col("after.text").alias("t"))
         .toPandas().sort_values(txt).reset_index(drop=True))
    b = (slim_out.select(*txt, pd_F.col("after.text").alias("t"))
         .toPandas().sort_values(txt).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
