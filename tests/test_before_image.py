"""D3 before-image consumption: changed-column trim against the before image
(reference COLUMN_FORMAT_CHANGED, OutputBuffer.cpp:1893-1927)."""

import datetime

import pandas as pd

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import CHANGE_EVENT_SCHEMA
from openlogreplicator_spark.operators.decode import before_image_trim
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _img(role=None, text=None, tool=None, ts=None, meta=None):
    return (role, text, tool, ts, meta)


def _ev(scn, seq, xid, op, key=None, before=None, after=None,
        before_cols=(), cols_set=()):
    conv, turn = key if key else (None, None)
    return (scn, seq, xid, op, "transcripts", conv, turn, before, after,
            list(before_cols), list(cols_set), None, None, T0)


def test_trim_drops_only_verified_equal_columns(spark):
    rows = [
        # U with before: role equal (drop), text differs (keep), ts equal
        # but NOT carried by before_cols (keep — unverifiable)
        _ev(10, 0, "x1", "U", ("c1", 1),
            before=_img(role="user", text="old", ts=T0),
            after=_img(role="user", text="new", ts=T0),
            before_cols=["role", "text"],
            cols_set=["role", "text", "ts"]),
        # U with both images carrying an equal real NULL in tool -> drop
        _ev(11, 1, "x1", "U", ("c1", 2),
            before=_img(role="a", tool=None),
            after=_img(role="b", tool=None),
            before_cols=["role", "tool"],
            cols_set=["role", "tool"]),
        # I rows are never trimmed even if a before image leaks in
        _ev(12, 2, "x1", "I", ("c1", 3),
            before=_img(text="same"), after=_img(text="same"),
            before_cols=["text"], cols_set=["text"]),
    ]
    ev = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    got = {r["scn"]: sorted(r["cols_set"])
           for r in before_image_trim(ev).collect()}
    assert got[10] == ["text", "ts"]
    assert got[11] == ["role"]
    assert got[12] == ["text"]


def test_trim_preserves_final_state_with_true_before_images(spark, tmp_path):
    """When before images reflect true prior state, replay WITH trim equals
    replay WITHOUT trim (it only removes dead writes)."""
    rows = [
        _ev(1, 0, "x1", "B"),
        _ev(2, 1, "x1", "I", ("c1", 1),
            after=_img(role="user", text="t1", ts=T0),
            cols_set=["role", "text", "ts"]),
        _ev(3, 2, "x1", "C"),
        _ev(4, 0, "x2", "B"),
        # true before image: role/ts unchanged, text changes
        _ev(5, 1, "x2", "U", ("c1", 1),
            before=_img(role="user", text="t1", ts=T0),
            after=_img(role="user", text="t2", ts=T0),
            before_cols=["role", "text", "ts"],
            cols_set=["role", "text", "ts"]),
        _ev(6, 2, "x2", "C"),
        _ev(7, 0, "x3", "B"),
        # role actually changes -> must survive the trim
        _ev(8, 1, "x3", "U", ("c1", 1),
            before=_img(role="user", text="t2", ts=T0),
            after=_img(role="assistant", text="t2", ts=T0),
            before_cols=["role", "text", "ts"],
            cols_set=["role", "text"]),
        _ev(9, 2, "x3", "C"),
    ]
    ev = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)

    states = {}
    for trim in (False, True):
        cfg = EngineConfig(num_buckets=2, trim_unchanged=trim)
        table = bootstrap_target(str(tmp_path / f"t{int(trim)}"), cfg)
        replay_batch(spark, ev, table, cfg, batch_id=1)
        states[trim] = (
            table.read(spark).toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(states[False], states[True])
    row = states[True].iloc[0]
    assert row["role"] == "assistant" and row["text"] == "t2"


def test_trim_keeps_columns_without_before_image(spark):
    rows = [
        _ev(20, 0, "x9", "U", ("c2", 1),
            before=None,
            after=_img(role="user", text="x"),
            before_cols=[], cols_set=["role", "text"]),
    ]
    ev = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    got = before_image_trim(ev).collect()[0]
    assert sorted(got["cols_set"]) == ["role", "text"]
