"""Lifecycle DDL (TRUNCATE / DROP / unknown verbs) — reference DDL types
85/12/86/15 (OpCode1801.cpp:50-57). Round-1 behavior raised ValueError on
any verb beyond ADD COLUMN / WIDEN, poisoning the batch; now TRUNCATE commits
an empty snapshot, DROP tombstones the table, and unrecognized DDL is
logged-and-skipped (the reference itself only reports DDL text and keeps
streaming, OutputBuffer.cpp:1957-2007).
"""

import pandas as pd

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import (
    CHANGE_EVENT_SCHEMA,
    generate_change_events,
    pandas_to_events_df,
    sequential_oracle,
)
from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch
from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

CFG = EngineConfig(num_buckets=4)


def _with_ddl_row(spark, events, ddl_text, scn=None):
    """Inject one DDL event at (just above) the median scn of the feed."""
    if scn is None:
        scns = sorted(r[0] for r in events.select("scn").collect())
        scn = scns[len(scns) // 2]
    row = spark.createDataFrame(
        [(int(scn), 0, "ddl-x", "DDL", "transcripts", None, None, None, None,
          [], [], None, ddl_text, None)],
        CHANGE_EVENT_SCHEMA,
    )
    # keep (scn, seq) unique: drop any data event sharing the scn
    return events.where(F.col("scn") != int(scn)).unionByName(row), int(scn)


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


def test_replay_with_truncate_matches_oracle(spark, tmp_path):
    events = generate_change_events(spark, n_txs=200, n_convs=25, seed=13)
    feed, _scn = _with_ddl_row(spark, events, "TRUNCATE TABLE transcripts")
    oracle = sequential_oracle(feed.toPandas()).drop(columns=["meta"])
    assert len(oracle) > 0, "transactions after the truncate must survive"

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=1)
    ops = [s["summary"]["operation"] for s in
           (table.manifest(v) for v in range(table.current_version() + 1))]
    assert "truncate" in ops
    _assert_eq(_final_state(table, spark), oracle)


def test_streaming_with_truncate_matches_oracle(spark, tmp_path):
    events = generate_change_events(spark, n_txs=150, n_convs=20, seed=17)
    feed, _scn = _with_ddl_row(spark, events, "TRUNCATE")
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    oracle = sequential_oracle(pdf).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"))
    n = len(pdf)
    for i in range(3):
        lo, hi = (n * i) // 3, (n * (i + 1)) // 3
        pipe.process_batch(pandas_to_events_df(spark, pdf.iloc[lo:hi]), i)
    _assert_eq(_final_state(table, spark), oracle)


def test_truncate_retry_is_noop(spark, tmp_path):
    """Replaying a batch containing a TRUNCATE must NOT re-truncate: the DDL
    applies only when its following slice is above the write-audit watermark
    (a re-applied truncate would wipe rows merged after it — caught by the
    spark-submit verify drive)."""
    events = generate_change_events(spark, n_txs=150, n_convs=20, seed=31)
    feed, _scn = _with_ddl_row(spark, events, "TRUNCATE TABLE transcripts")
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=1)
    rows1 = table.read(spark).count()
    assert rows1 > 0
    v1 = table.current_version()
    out = replay_batch(spark, feed, table, CFG, batch_id=1)
    assert all(s.get("skipped") for s in out if s is not None)
    assert table.current_version() == v1
    assert table.read(spark).count() == rows1


def test_drop_tombstones_table(spark, tmp_path):
    events = generate_change_events(spark, n_txs=120, n_convs=15, seed=19)
    feed, _scn = _with_ddl_row(spark, events, "DROP TABLE transcripts")

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=1)
    assert table.is_dropped()
    assert table.read(spark).count() == 0
    # post-drop batches are consumed as no-ops, never an error
    more = generate_change_events(spark, n_txs=20, n_convs=5, seed=23)
    out = replay_batch(spark, more, table, CFG, batch_id=2)
    assert all(s.get("skipped") for s in out if s is not None)
    assert table.read(spark).count() == 0


def test_drop_verbs_match_precisely(spark, tmp_path):
    """'DROP INDEX i' must NOT tombstone the table; 'DROP COLUMN x' evolves
    the schema; dropping a merge-key column is refused (logged, not fatal)."""
    events = generate_change_events(spark, n_txs=80, n_convs=10, seed=37)
    feed, _ = _with_ddl_row(spark, events, "DROP INDEX some_index")
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=1)
    assert not table.is_dropped()
    assert table.read(spark).count() > 0
    # the sequential oracle classifies lifecycle verbs identically
    # (verb+unit): 'DROP INDEX' is NOT a table drop there either
    oracle = sequential_oracle(feed.toPandas()).drop(columns=["meta"])
    _assert_eq(_final_state(table, spark), oracle)

    # DROP COLUMN removes a payload column from the current schema
    table.alter_add_column("meta", __import__(
        "pyspark.sql.types", fromlist=["StringType"]).StringType())
    assert "meta" in [f.name for f in table.schema().fields]
    from openlogreplicator_spark.plans.replay import _apply_ddl
    _apply_ddl(table, "DROP COLUMN meta")
    assert "meta" not in [f.name for f in table.schema().fields]
    _apply_ddl(table, "DROP COLUMN conv_id")  # key col: refused, not fatal
    assert "conv_id" in [f.name for f in table.schema().fields]
    # reads still work against pre-drop files
    assert table.read(spark).count() > 0


def test_unknown_ddl_is_skipped_not_fatal(spark, tmp_path):
    events = generate_change_events(spark, n_txs=100, n_convs=15, seed=29)
    feed, _scn = _with_ddl_row(spark, events, "ANALYZE TABLE transcripts")
    oracle = sequential_oracle(feed.toPandas()).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=1)  # must not raise
    _assert_eq(_final_state(table, spark), oracle)


import pytest

from pyspark.sql import types as T

from openlogreplicator_spark.plans.replay import _spark_type


@pytest.mark.parametrize("token,expect", [
    ("string", T.StringType()),
    ("bigint", T.LongType()),
    ("long", T.LongType()),
    ("int", T.IntegerType()),
    ("integer", T.IntegerType()),
    ("smallint", T.ShortType()),
    ("tinyint", T.ByteType()),
    ("double", T.DoubleType()),
    ("float", T.FloatType()),
    ("boolean", T.BooleanType()),
    ("date", T.DateType()),
    ("timestamp", T.TimestampType()),
    ("binary", T.BinaryType()),
    ("decimal", T.DecimalType(10, 0)),
    ("DECIMAL(12,3)", T.DecimalType(12, 3)),
    ("varchar(255)", T.StringType()),
])
def test_spark_type_vocabulary(token, expect):
    """The DDL type map covers the Spark primitive vocabulary — the analog of
    the reference's full Oracle type surface (OutputBufferJson.cpp:270-358).
    Round-2 verdict: only string|bigint|long were mapped and anything else
    raised KeyError, poisoning the batch."""
    assert _spark_type(token) == expect


@pytest.mark.parametrize("token", ["clob", "array<int>", "int8", "number", ""])
def test_spark_type_unknown_returns_none(token):
    assert _spark_type(token) is None


@pytest.mark.parametrize(
    "typ", ["int", "double", "decimal(10,2)", "timestamp", "boolean"]
)
def test_add_column_each_type_mid_feed(spark, tmp_path, typ):
    """ADD COLUMN with every primitive type mid-feed: the batch completes,
    the column lands in the schema with the right type, and row state still
    matches the sequential oracle."""
    events = generate_change_events(spark, n_txs=120, n_convs=15, seed=41)
    feed, _scn = _with_ddl_row(spark, events, f"ADD COLUMN extra_{typ.split('(')[0]} {typ}")
    oracle = sequential_oracle(feed.toPandas()).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=1)  # must not raise
    from openlogreplicator_spark.plans.replay import _spark_type as st

    name = f"extra_{typ.split('(')[0]}"
    fld = {f.name: f for f in table.schema().fields}[name]
    assert fld.dataType == st(typ)
    got = _final_state(table, spark)
    assert got[name].isna().all()  # no event populates it: null-filled
    _assert_eq(got.drop(columns=[name]), oracle)


def test_add_column_unknown_type_is_skipped_not_fatal(spark, tmp_path):
    """Round-2 verdict #1: 'ADD COLUMN c clob' must log-and-skip per
    _apply_ddl's own contract, not KeyError-poison the batch (reference
    reports unknown schema, OutputBuffer.cpp:1957-2007)."""
    events = generate_change_events(spark, n_txs=120, n_convs=15, seed=43)
    feed, _scn = _with_ddl_row(spark, events, "ADD COLUMN c clob")
    feed, _ = _with_ddl_row(spark, feed, "WIDEN turn_idx number", scn=_scn + 7)
    oracle = sequential_oracle(feed.toPandas()).drop(columns=["meta"])

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    replay_batch(spark, feed, table, CFG, batch_id=1)  # must not raise
    assert "c" not in [f.name for f in table.schema().fields]
    _assert_eq(_final_state(table, spark), oracle)


# --------------------------------------------------- RENAME COLUMN (round 3)

def test_rename_column_metadata_only(spark, tmp_path):
    """Rename is metadata-only: historical files bind through the stable
    field id — pre-rename values appear under the new name, later merges
    write the new name, and both schema eras read back unified."""
    from openlogreplicator_spark.lake import LakeTable

    cfg = EngineConfig(num_buckets=4)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    feed = generate_change_events(spark, n_txs=80, n_convs=10, seed=73)
    replay_batch(spark, feed, table, cfg, batch_id=0)
    before = table.read(spark).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)

    table.alter_rename_column("text", "body")
    after = table.read(spark)
    assert "body" in after.columns and "text" not in after.columns
    pdf = after.toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(pdf["body"]) == list(before["text"])

    # a later merge writes the NEW name; the two file eras unify on read
    upd = after.limit(1).select(
        "conv_id", "turn_idx",
        *[F.lit(None).cast(table.schema()[c].dataType).alias(c)
          for c in table.schema().fieldNames()
          if c not in ("conv_id", "turn_idx", "body")],
        F.lit("renamed!").alias("body"),
        F.lit("U").alias("op"),
        F.array(F.lit("body")).alias("cols_set"),
    )
    key = upd.select("conv_id", "turn_idx").first()
    table.merge(spark, upd, batch_id=1)
    got = table.read(spark).where(
        (F.col("conv_id") == key["conv_id"])
        & (F.col("turn_idx") == key["turn_idx"])
    ).first()
    assert got["body"] == "renamed!"
    assert table.read(spark).count() == len(before)
    # retried rename (old gone, new present) is a no-op
    table.alter_rename_column("text", "body")


def test_rename_column_via_ddl_feed(spark, tmp_path):
    """RENAME COLUMN arriving as a DDL event mid-feed applies in order;
    unknown/key-column renames are skipped, not fatal."""
    cfg = EngineConfig(num_buckets=4)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    feed = generate_change_events(spark, n_txs=60, n_convs=8, seed=79)
    ev, _ = _with_ddl_row(spark, feed, "RENAME COLUMN tool TO gadget")
    replay_batch(spark, ev, table, cfg, batch_id=0)
    assert "gadget" in table.read(spark).columns
    assert "tool" not in table.read(spark).columns

    # key-column rename: reported-and-skipped, batch completes
    ev2 = generate_change_events(spark, n_txs=30, n_convs=8, seed=83)
    ev2, _ = _with_ddl_row(spark, ev2, "RENAME COLUMN conv_id TO cid")
    replay_batch(spark, ev2, table, cfg, batch_id=1)
    assert "conv_id" in table.read(spark).columns


# ---------------------------------------- ADD COLUMN DEFAULT (round 3)

def test_add_column_initial_default(spark, tmp_path):
    """Iceberg initial-default: rows from files that PREDATE the column
    read the default with no rewrite; rows written afterwards get what the
    writer set (explicit value or null) — never the default."""
    cfg = EngineConfig(num_buckets=4)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    feed = generate_change_events(spark, n_txs=60, n_convs=8, seed=103)
    replay_batch(spark, feed, table, cfg, batch_id=0)
    n = table.read(spark).count()

    from pyspark.sql import types as T
    table.alter_add_column("score", T.LongType(), default="7")
    got = table.read(spark)
    assert got.where(F.col("score") == 7).count() == n

    # explicit write wins; untouched rows keep reading the default
    row = got.first()
    upd = spark.createDataFrame(
        [(row["conv_id"], row["turn_idx"], 42)],
        "conv_id string, turn_idx long, score long",
    ).select(
        "conv_id", "turn_idx",
        *[F.lit(None).cast(table.schema()[c].dataType).alias(c)
          for c in table.schema().fieldNames()
          if c not in ("conv_id", "turn_idx", "score")],
        "score",
        F.lit("U").alias("op"),
        F.array(F.lit("score")).alias("cols_set"),
    )
    table.merge(spark, upd, batch_id=9999)
    out = table.read(spark)
    assert out.where(F.col("score") == 42).count() == 1
    assert out.where(F.col("score") == 7).count() == n - 1


def test_add_column_default_via_ddl_feed(spark, tmp_path):
    """DEFAULT arriving in the DDL text mid-feed: batch completes, pre-DDL
    rows carry the default."""
    cfg = EngineConfig(num_buckets=4)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    feed = generate_change_events(spark, n_txs=60, n_convs=8, seed=107)
    ev, _ = _with_ddl_row(spark, feed, "ADD COLUMN score bigint DEFAULT 7")
    replay_batch(spark, ev, table, cfg, batch_id=0)
    got = table.read(spark)
    assert "score" in got.columns
    assert got.where(F.col("score") == 7).count() > 0


def test_add_after_drop_never_reuses_field_id(spark, tmp_path):
    """A dropped column's stable field id must NEVER be re-issued: if ADD
    COLUMN reused it, read() would bind the new column to the dropped
    column's bytes in historical files and resurrect deleted data
    (Iceberg's last-column-id contract)."""
    from pyspark.sql.types import LongType, StringType, StructType

    from openlogreplicator_spark.lake import LakeTable

    schema = (StructType().add("k", LongType()).add("a", StringType())
              .add("c", StringType()))
    t = LakeTable.create(str(tmp_path / "t"), schema, ["k"], num_buckets=2)
    t.overwrite(spark.createDataFrame(
        [(1, "a1", "SECRET1"), (2, "a2", "SECRET2")], schema), batch_id=1)

    t.alter_drop_column("c")
    t.alter_add_column("d", StringType())
    # the new column's id is fresh, not c's
    fids = t.manifest()["schemas_fids"][str(t.manifest()["schema_id"])]
    all_prior = [v for sid, f in t.manifest()["schemas_fids"].items()
                 if int(sid) < t.manifest()["schema_id"]
                 for v in f.values()]
    assert fids["d"] not in all_prior
    # pre-evolution rows read NULL for d — never the dropped column's data
    pdf = t.read(spark).toPandas().sort_values("k")
    assert "c" not in pdf.columns
    assert pdf["d"].isna().all()
    assert not pdf.astype(str).apply(
        lambda col: col.str.contains("SECRET", na=False)).any().any()


def test_alter_lookups_case_insensitive(spark, tmp_path):
    """Spark resolves column references case-insensitively; the alter
    lookups must match (round-5 review: duplicate checks were
    case-insensitive but lookups were not, so 'RENAME Role x' against a
    schema holding 'role' silently no-opped, and a case-only rename could
    never apply)."""
    t = bootstrap_target(str(tmp_path / "t"), EngineConfig(num_buckets=2))

    # rename resolves 'ROLE' -> 'role'
    t.alter_rename_column("ROLE", "speaker")
    cols = [f.name for f in t.schema().fields]
    assert "speaker" in cols and "role" not in cols

    # case-only rename changes the display name of the SAME field
    t.alter_rename_column("speaker", "SPEAKER")
    cols = [f.name for f in t.schema().fields]
    assert "SPEAKER" in cols and "speaker" not in cols
    # exact no-op rename is idempotent
    v = t.current_version()
    t.alter_rename_column("SPEAKER", "SPEAKER")
    assert t.current_version() == v

    # rename onto a DIFFERENT existing column still refuses (ci)
    with pytest.raises(ValueError, match="already exists"):
        t.alter_rename_column("SPEAKER", "TEXT")

    # key-column guards are case-insensitive too
    with pytest.raises(ValueError, match="merge-key"):
        t.alter_rename_column("CONV_ID", "x")
    with pytest.raises(ValueError, match="merge-key"):
        t.alter_drop_column("TURN_IDX")

    # drop + widen resolve case-insensitively
    t.alter_add_column("score", T.IntegerType())
    t.alter_widen("SCORE", T.LongType())
    assert dict((f.name, f.dataType) for f in t.schema().fields)[
        "score"] == T.LongType()
    # widen of an absent column is a clean no-op (no empty schema bump)
    v = t.current_version()
    t.alter_widen("nope", T.LongType())
    assert t.current_version() == v
    t.alter_drop_column("Score")
    assert "score" not in [f.name for f in t.schema().fields]


def test_widen_refuses_narrowing(tmp_path):
    from openlogreplicator_spark.lake import LakeTable

    """alter_widen only accepts true widening transitions (Iceberg's
    evolution matrix): long -> int would wrap historical values past 2^31
    at read time (round-5 review finding)."""
    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([
            T.StructField("k", T.StringType(), False),
            T.StructField("n", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("i", T.IntegerType(), True),
        ]),
        ["k"], num_buckets=2)
    with pytest.raises(ValueError, match="not a widening"):
        t.alter_widen("n", T.IntegerType())
    with pytest.raises(ValueError, match="not a widening"):
        t.alter_widen("s", T.LongType())
    t.alter_widen("i", T.LongType())  # int -> bigint still fine
    assert dict((f.name, f.dataType) for f in t.schema().fields)["i"] == \
        T.LongType()
    # the DDL applier log-and-skips it (never poisons the batch), and the
    # wire twin mirrors the skip
    from openlogreplicator_spark.plans.replay import (
        _apply_ddl,
        evolve_schema,
    )

    _apply_ddl(t, "WIDEN s bigint")  # must not raise
    sch = t.schema()
    assert dict((f.name, f.dataType) for f in sch.fields)["s"] == \
        T.StringType()
    assert evolve_schema(sch, "WIDEN s bigint", ("k",)) is sch


def test_reserved_internal_names_refused(tmp_path):
    from openlogreplicator_spark.lake import LakeTable

    """User columns must never shadow the writers' working columns (_b,
    _olr_seq, _olr_content) — the bucket hash would silently overwrite
    them in every written file (round-5 review finding). create() and the
    alters refuse; the DDL applier log-and-skips."""
    with pytest.raises(ValueError, match="reserved"):
        LakeTable.create(
            str(tmp_path / "bad"),
            T.StructType([
                T.StructField("k", T.StringType(), False),
                T.StructField("_b", T.IntegerType(), True),
            ]),
            ["k"], num_buckets=2)
    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.StringType(), True),
        ]),
        ["k"], num_buckets=2)
    with pytest.raises(ValueError, match="reserved"):
        t.alter_add_column("_olr_seq", T.LongType())
    with pytest.raises(ValueError, match="reserved"):
        t.alter_rename_column("v", "_b")
    from openlogreplicator_spark.plans.replay import (
        _apply_ddl,
        evolve_schema,
    )

    _apply_ddl(t, "ADD COLUMN _b bigint")  # log-and-skip, not poison
    assert "_b" not in t.schema().fieldNames()
    sch = t.schema()
    assert evolve_schema(sch, "ADD COLUMN _b bigint", ("k",)) is sch
    assert evolve_schema(sch, "RENAME COLUMN v TO _b", ("k",)) is sch
