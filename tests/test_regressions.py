"""Regression pins for round-2 advice findings.

1. merge_direct must advance the table's last_scn watermark at bootstrap —
   otherwise the commit-scn high-water-mark skip (apply_committed; OLR
   confirmed-SCN skip, RedoLog.cpp:751-762) is disabled and a re-delivered
   overlapping feed under a NEW batch id re-applies stale transactions.
2. Null-xid DML rows must be dropped by BOTH assembly paths (the pandas path
   used pd.factorize, whose -1 code for nulls indexed the last group's
   verdict — a null-xid row silently inherited another tx's commit).
3. The JVM and pandas text-normalize kernels must agree on Unicode trailing
   whitespace (NBSP / NEL / ideographic space), not just ASCII.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch


def test_bootstrap_advances_scn_watermark(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4)
    events = generate_change_events(spark, n_txs=100, n_convs=20, seed=3)
    max_scn = events.agg(F.max("scn")).collect()[0][0]

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    assert table.last_scn() == -1
    replay_batch(spark, events, table, cfg, batch_id=1)
    # bootstrap goes through merge_direct: the watermark must still advance
    assert table.last_scn() > 0
    assert table.last_scn() <= max_scn

    # an overlapping re-delivery under a NEW batch id must be filtered by the
    # commit-scn high-water mark: no snapshot with changed rows may land
    state1 = table.read(spark).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    out = replay_batch(spark, events, table, cfg, batch_id=2)
    assert all(s is None or s.get("skipped") or s.get("events_in") in (0, None)
               for s in out)
    state2 = table.read(spark).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(state1, state2)


_NULLXID_SCHEMA = StructType([
    StructField("scn", LongType(), False),
    StructField("seq", LongType(), False),
    StructField("xid", StringType(), True),   # nullable on purpose
    StructField("op", StringType(), False),
])


@pytest.mark.parametrize("use_pandas", [True, False])
def test_null_xid_rows_dropped(spark, use_pandas):
    from openlogreplicator_spark.operators.assembly import (
        assemble_transactions_pandas, assemble_transactions_sql,
    )
    cfg = EngineConfig()
    rows = [
        (1, 0, "x1", "B"),
        (2, 1, "x1", "I"),
        (3, 0, None, "I"),   # null-xid DML — must NOT inherit x1's commit
        (4, 2, "x1", "C"),
    ]
    ev = spark.createDataFrame(rows, _NULLXID_SCHEMA)
    fn = assemble_transactions_pandas if use_pandas else assemble_transactions_sql
    got = fn(ev, cfg).select("scn", "commit_scn").collect()
    assert sorted((r["scn"], r["commit_scn"]) for r in got) == [(2, 4)]


def test_normalize_paths_equal_unicode(spark):
    from openlogreplicator_spark.operators.decode import (
        _normalize_text_jvm, _normalize_text_pandas,
    )
    samples = [
        "plain tail   ",
        "nbsp tail\u00a0\u00a0",
        "nel tail\u0085",
        "ideographic\u3000\u3000",
        "thin+em space\u2009\u2003 \t \n",
        "ctrl\x00mid\x1ftail \x1c\x1d",
        "line-sep\u2028 para-sep\u2029",
        "no-trim",
        "",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    out = df.select(
        _normalize_text_jvm(F.col("t")).alias("jvm"),
        _normalize_text_pandas(F.col("t")).alias("pd"),
    ).collect()
    for r, s in zip(out, samples):
        assert r["jvm"] == r["pd"], f"paths diverge on {s!r}: {r}"
