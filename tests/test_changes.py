"""Snapshot-diff changelog (plans/changes.py) + time-travel reads:

  * table_changes equals a hand diff of the two snapshots' states;
  * untouched buckets are pruned at the manifest level (no data I/O);
  * read(version=...) returns the historical snapshot (Iceberg VERSION AS OF),
    including pre-rename column names.
"""

import pandas as pd
import pytest

from pyspark.sql import Window, functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.plans.changes import changed_buckets, table_changes
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch

CFG = EngineConfig(num_buckets=8)


def _two_snapshot_table(spark, tmp_path, seed=87):
    feed = generate_change_events(spark, n_txs=200, n_convs=20, seed=seed)
    mid = feed.agg(F.max("scn")).first()[0] // 2
    term = F.max("scn").over(Window.partitionBy("xid"))
    tagged = feed.withColumn("_t", term)
    b0 = tagged.where(F.col("_t") <= mid).drop("_t")
    b1 = tagged.where(F.col("_t") > mid).drop("_t")
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, b0, table, CFG, batch_id=0)
    v0 = table.current_version()
    replay_batch(spark, b1, table, CFG, batch_id=1)
    v1 = table.current_version()
    return table, v0, v1


def _state(df, cols=("conv_id", "turn_idx", "role", "text")):
    return {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols[2:])
        for r in df.select(*cols).collect()
    }


def test_table_changes_equals_hand_diff(spark, tmp_path):
    table, v0, v1 = _two_snapshot_table(spark, tmp_path)
    s0 = _state(table.read(spark, version=v0))
    s1 = _state(table.read(spark, version=v1))
    want = {}
    for k in set(s0) | set(s1):
        if k not in s0:
            want[k] = ("I", s1[k], None)
        elif k not in s1:
            want[k] = ("D", None, s0[k])
        elif s0[k] != s1[k]:
            want[k] = ("U", s1[k], s0[k])
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["change"],
            (r["role"], r["text"]) if r["change"] != "D" else None,
            (r["prev_role"], r["prev_text"]) if r["change"] != "I" else None,
        )
        for r in table_changes(spark, table, v0, v1).collect()
    }
    assert got == want and len(got) > 10
    # time travel: v0 read is reproducible after later snapshots landed
    assert _state(table.read(spark, version=v0)) == s0


def test_changed_buckets_prune(spark, tmp_path):
    """A merge touching ONE key rewrites one bucket; the changelog between
    those snapshots prunes every other bucket without reading data."""
    table, _, v1 = _two_snapshot_table(spark, tmp_path, seed=91)
    row = table.read(spark).first()
    upd = spark.createDataFrame(
        [(row["conv_id"], row["turn_idx"], "edited")],
        "conv_id string, turn_idx long, text string",
    ).select(
        "conv_id", "turn_idx",
        *[F.lit(None).cast(table.schema()[c].dataType).alias(c)
          for c in table.schema().fieldNames()
          if c not in ("conv_id", "turn_idx", "text")],
        "text",
        F.lit("U").alias("op"),
        F.array(F.lit("text")).alias("cols_set"),
    )
    table.merge(spark, upd, batch_id=9999)
    v2 = table.current_version()
    touched = changed_buckets(table, v1, v2)
    assert len(touched) == 1
    chg = table_changes(spark, table, v1, v2).collect()
    assert len(chg) == 1
    assert chg[0]["change"] == "U" and chg[0]["text"] == "edited"
    assert chg[0]["prev_text"] == row["text"]


def test_table_changes_across_rename(spark, tmp_path):
    """Changelog spanning a RENAME COLUMN: both sides bind through stable
    field ids, unchanged keys emit nothing, prev values appear under the
    new name."""
    table, _, v1 = _two_snapshot_table(spark, tmp_path, seed=95)
    table.alter_rename_column("text", "body")
    row = table.read(spark).first()
    upd = spark.createDataFrame(
        [(row["conv_id"], row["turn_idx"], "renamed-edit")],
        "conv_id string, turn_idx long, body string",
    ).select(
        "conv_id", "turn_idx",
        *[F.lit(None).cast(table.schema()[c].dataType).alias(c)
          for c in table.schema().fieldNames()
          if c not in ("conv_id", "turn_idx", "body")],
        "body",
        F.lit("U").alias("op"),
        F.array(F.lit("body")).alias("cols_set"),
    )
    table.merge(spark, upd, batch_id=9999)
    v2 = table.current_version()
    chg = table_changes(spark, table, v1, v2).collect()
    assert len(chg) == 1
    assert chg[0]["body"] == "renamed-edit"
    assert chg[0]["prev_body"] == row["body"]
    # and the old snapshot still reads under its own (pre-rename) schema
    assert "text" in table.read(spark, version=v1).columns


def test_table_changes_null_key_rows(spark, tmp_path):
    """Null-keyed rows classify correctly (presence markers, not key-null
    tests): unchanged null-key row -> absent from the diff; deleted
    null-key row -> 'D'."""
    from pyspark.sql.types import LongType, StringType, StructType

    from openlogreplicator_spark.lake import LakeTable

    schema = StructType().add("k", LongType()).add("v", StringType())
    t = LakeTable.create(str(tmp_path / "nk"), schema, ["k"], num_buckets=2)
    t.overwrite(spark.createDataFrame(
        [(None, "nullrow"), (1, "one"), (2, "two")], schema), batch_id=1)
    v0 = t.current_version()
    # delete key 2, keep the null-key row untouched, update key 1
    upd = spark.createDataFrame(
        [(2, None, "D", None), (1, "one2", "U", ["v"])],
        "k long, v string, op string, cols_set array<string>")
    t.merge(spark, upd, batch_id=2)
    ch = table_changes(spark, t, v0, t.current_version()).toPandas()
    # the untouched null-key row must NOT appear (it would previously
    # surface as a spurious 'I')
    assert not ch["k"].isna().any()
    by_k = ch.set_index("k")
    assert by_k.loc[1, "change"] == "U"
    assert by_k.loc[2, "change"] == "D"

    # now delete the null-key row: it must classify as 'D', not 'I'
    v1 = t.current_version()
    upd2 = spark.createDataFrame(
        [(None, None, "D", None)],
        "k long, v string, op string, cols_set array<string>")
    t.merge(spark, upd2, batch_id=3)
    ch2 = table_changes(spark, t, v1, t.current_version()).toPandas()
    nulls = ch2[ch2["k"].isna()]
    assert len(nulls) == 1 and nulls.iloc[0]["change"] == "D"
