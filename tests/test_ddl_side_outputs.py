"""Mid-stream DDL propagation to the side-output tables (round-4 verdict,
top item): a column added/widened on the primary mid-stream must reach the
SCD2 history + open-version store IN THE SAME BATCH (post-DDL versions carry
it), lifecycle DDL must be refused loudly while side outputs are configured
(never silent divergence), and multi-table routed mode takes per-table side
outputs (a bare table is a configuration error, not a silent skip).
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import (
    CHANGE_EVENT_SCHEMA,
    generate_change_events,
    pandas_to_events_df,
)
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_sql,
)
from openlogreplicator_spark.operators.scd2 import scd2_history
from openlogreplicator_spark.plans.replay import bootstrap_target
from openlogreplicator_spark.plans.rollup_apply import (
    bootstrap_conversations_target,
)
from openlogreplicator_spark.plans.scd2_apply import (
    bootstrap_scd2_open_target,
    bootstrap_scd2_target,
)
from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

CFG = EngineConfig(num_buckets=4)
KEYS = ["conv_id", "turn_idx"]


def _norm(df, extra=()):
    pdf = df.select(
        "conv_id", "turn_idx", "valid_from", "valid_to", "is_current",
        "role", "text",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        *[F.col(c) for c in extra],
    ).toPandas()
    return (
        pdf.sort_values(["conv_id", "turn_idx", "valid_from"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64", "valid_from": "int64"})
    )


def _one_shot(feed, payload):
    surv = assemble_transactions_sql(
        feed.where(F.col("op") != "DDL"), CFG
    ).select(
        *KEYS, "op", "scn", "seq", "xid", "commit_scn",
        F.struct(*[F.col("after").getField(c).alias(c) for c in payload])
        .alias("after"),
        "cols_set",
    )
    return scd2_history(surv, KEYS, list(payload))


def _ddl_row(spark, events, ddl_text, table="transcripts", scn=None):
    if scn is None:
        scns = sorted(r[0] for r in events.select("scn").collect())
        scn = scns[len(scns) // 2]
    row = spark.createDataFrame(
        [(int(scn), 0, "ddl-x", "DDL", table, None, None, None, None,
          [], [], None, ddl_text, None)],
        CHANGE_EVENT_SCHEMA,
    )
    return (
        events.where(F.col("scn") != int(scn)).unionByName(row), int(scn)
    )


@pytest.mark.parametrize("n_chunks", [2, 4])
def test_add_column_mid_stream_reaches_history_and_open_store(
        spark, tmp_path, n_chunks):
    """Feed with `ADD COLUMN meta string` + `WIDEN turn_idx bigint` DDL
    mid-stream, applied in scn-ordered microbatches: the history and the
    open store evolve in the DDL's batch, post-DDL versions carry real meta
    values, and the whole history equals one-shot scd2_history with meta in
    the payload — for every batch split."""
    feed = generate_change_events(
        spark, n_txs=150, n_convs=20, seed=59, with_ddl=True,
    ).localCheckpoint()

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist,
                             history_open_table=open_t)
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    for i in range(n_chunks):
        lo, hi = (n * i) // n_chunks, (n * (i + 1)) // n_chunks
        pipe.process_batch(pandas_to_events_df(spark, pdf.iloc[lo:hi]), i)

    got = hist.read(spark)
    assert "meta" in got.columns
    assert "meta" in open_t.read(spark).columns
    # `WIDEN turn_idx bigint` widens a MERGE-KEY column: the primary's
    # alter_widen has no key refusal, so the history and open store must
    # widen their key too, not skip it (round-5 review finding — the old
    # guard left the side-output key narrower than the primary's)
    prim_key_t = {f.name: f.dataType for f in table.schema().fields}[
        "turn_idx"]
    assert str(prim_key_t) == "LongType()"
    for side in (hist, open_t):
        side_key_t = {f.name: f.dataType
                      for f in side.schema().fields}["turn_idx"]
        assert side_key_t == prim_key_t, side.path
    # post-DDL events set meta -> present in post-DDL versions
    assert got.where(F.col("meta").isNotNull()).count() > 0

    want = _norm(_one_shot(feed, ("role", "text", "ts", "meta")),
                 extra=("meta",))
    pd.testing.assert_frame_equal(_norm(got, extra=("meta",)), want)

    # the open store stays exactly the current versions (with meta)
    cur = got.where("is_current").select(
        *KEYS, "role", "text", "ts", "meta", "valid_from")
    opn = open_t.read(spark).select(
        *KEYS, "role", "text", "ts", "meta", "valid_from")
    assert cur.exceptAll(opn).count() == 0
    assert opn.exceptAll(cur).count() == 0


def test_lifecycle_ddl_refused_with_history(spark, tmp_path):
    """TRUNCATE arriving while an SCD2 side output is configured must refuse
    BEFORE anything applies — the primary stays untouched (atomic batch)."""
    feed = generate_change_events(spark, n_txs=40, n_convs=8, seed=61)
    ev, _ = _ddl_row(spark, feed, "TRUNCATE TABLE transcripts")
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist)
    v0 = table.current_version()
    with pytest.raises(RuntimeError, match="TRUNCATE"):
        pipe.process_batch(ev, 0)
    assert table.current_version() == v0
    assert hist.read(spark).count() == 0

    # DROP TABLE likewise
    ev2, _ = _ddl_row(spark, feed, "DROP TABLE transcripts")
    with pytest.raises(RuntimeError, match="DROP"):
        pipe.process_batch(ev2, 0)

    # without side outputs, the same feed applies fine (existing contract)
    table2 = bootstrap_target(str(tmp_path / "t2"), CFG)
    pipe2 = CDCStreamPipeline(table2, CFG, str(tmp_path / "state2"))
    pipe2.process_batch(ev, 0)


def test_reserved_name_collision_refused(spark, tmp_path):
    feed = generate_change_events(spark, n_txs=30, n_convs=8, seed=67)
    ev, _ = _ddl_row(spark, feed, "ADD COLUMN valid_from bigint")
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist)
    with pytest.raises(RuntimeError, match="valid_from"):
        pipe.process_batch(ev, 0)


def test_view_input_removal_refused_add_is_fine(spark, tmp_path):
    feed = generate_change_events(spark, n_txs=40, n_convs=8, seed=71)
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    conv = bootstrap_conversations_target(str(tmp_path / "conv"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             conversations_table=conv)

    ev, _ = _ddl_row(spark, feed, "RENAME COLUMN text TO body")
    with pytest.raises(RuntimeError, match="text"):
        pipe.process_batch(ev, 0)
    ev2, _ = _ddl_row(spark, feed, "DROP COLUMN role")
    with pytest.raises(RuntimeError, match="role"):
        pipe.process_batch(ev2, 0)

    # ADD COLUMN does not change the view's derived contract -> applies
    ev3, _ = _ddl_row(spark, feed, "ADD COLUMN score bigint")
    pipe.process_batch(ev3, 0)
    assert "score" in table.read(spark).columns
    assert conv.read(spark).count() > 0


def test_routed_mode_side_output_configuration_errors(spark, tmp_path):
    tables = {
        "a": bootstrap_target(str(tmp_path / "a"), CFG),
        "b": bootstrap_target(str(tmp_path / "b"), CFG),
    }
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    # bare table in routed mode: configuration error, never a silent skip
    with pytest.raises(ValueError, match="per-table dict"):
        CDCStreamPipeline(tables, CFG, str(tmp_path / "s1"),
                          history_table=hist)
    # dict key naming no routed target
    with pytest.raises(ValueError, match="no routed target"):
        CDCStreamPipeline(tables, CFG, str(tmp_path / "s2"),
                          history_table={"zzz": hist})
    # dict in single-table mode
    with pytest.raises(ValueError, match="multi-table"):
        CDCStreamPipeline(tables["a"], CFG, str(tmp_path / "s3"),
                          history_table={"a": hist})
    # open store without its history
    with pytest.raises(ValueError, match="history_open_table"):
        CDCStreamPipeline(tables["a"], CFG, str(tmp_path / "s4"),
                          history_open_table=bootstrap_scd2_open_target(
                              str(tmp_path / "open"), CFG))
    # sig index without the conversations view
    from openlogreplicator_spark.plans.dedup_index import bootstrap_sig_index
    with pytest.raises(ValueError, match="sig_index_table"):
        CDCStreamPipeline(tables["a"], CFG, str(tmp_path / "s5"),
                          sig_index_table=bootstrap_sig_index(
                              str(tmp_path / "sig"), CFG))


def test_routed_mode_per_table_history_with_ddl(spark, tmp_path):
    """Per-table SCD2 side outputs in multi-table routed mode: each routed
    table's history equals one-shot scd2_history over ITS slice, and a DDL
    routed to one table evolves only that table's history/open store."""
    cfg = EngineConfig(num_buckets=4, table_filter=None)
    events = generate_change_events(spark, n_txs=120, n_convs=16, seed=73)
    is_dml = F.col("op").isin("I", "U", "D")
    routed = events.withColumn(
        "table",
        F.when(~is_dml, F.lit("transcripts")).otherwise(
            F.when(F.col("scn") % 2 == 0, F.lit("transcripts"))
            .otherwise(F.lit("notes"))
        ),
    )
    routed, _ = _ddl_row(spark, routed, "ADD COLUMN meta string",
                         table="transcripts")
    routed = routed.localCheckpoint()
    tables = {
        "transcripts": bootstrap_target(str(tmp_path / "t1"), cfg),
        "notes": bootstrap_target(str(tmp_path / "t2"), cfg),
    }
    hists = {
        "transcripts": bootstrap_scd2_target(str(tmp_path / "h1"), cfg),
        "notes": bootstrap_scd2_target(str(tmp_path / "h2"), cfg),
    }
    opens = {
        "transcripts": bootstrap_scd2_open_target(str(tmp_path / "o1"), cfg),
    }
    pipe = CDCStreamPipeline(tables, cfg, str(tmp_path / "state"),
                             history_table=hists,
                             history_open_table=opens)
    pdf = routed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    for i in range(2):
        lo, hi = (n * i) // 2, (n * (i + 1)) // 2
        pipe.process_batch(pandas_to_events_df(spark, pdf.iloc[lo:hi]), i)

    # DDL routed to transcripts evolved only transcripts' side outputs
    assert "meta" in hists["transcripts"].read(spark).columns
    assert "meta" in opens["transcripts"].read(spark).columns
    assert "meta" not in hists["notes"].read(spark).columns

    for name in ("transcripts", "notes"):
        slice_ = routed.where(
            ~F.col("op").isin("I", "U", "D") | (F.col("table") == name))
        payload = (("role", "text", "ts", "meta")
                   if name == "transcripts" else ("role", "text", "ts"))
        extra = ("meta",) if name == "transcripts" else ()
        want = _norm(_one_shot(slice_, payload), extra=extra)
        got = _norm(hists[name].read(spark), extra=extra)
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want)


def test_crash_between_primary_and_history_with_ddl(spark, tmp_path):
    """Process dies AFTER the primary merge (DDL already applied +
    propagated) but BEFORE the history merge, in the very batch carrying
    an ADD COLUMN. The retried batch id must skip the primary by its
    write-audit, re-propagate the (idempotent) DDL, land the history +
    open-store merges, and converge to the one-shot history."""
    feed = generate_change_events(
        spark, n_txs=100, n_convs=16, seed=79,
    ).localCheckpoint()
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    half_scn = int(pdf.iloc[n // 2]["scn"])

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist,
                             history_open_table=open_t)

    b0 = pandas_to_events_df(spark, pdf[pdf.scn <= half_scn])
    pipe.process_batch(b0, 0)

    # batch 1 = second half + an injected ADD COLUMN at its median scn
    rest = pandas_to_events_df(spark, pdf[pdf.scn > half_scn])
    b1, _ = _ddl_row(spark, rest, "ADD COLUMN meta string")
    b1 = b1.localCheckpoint()

    orig = hist.merge
    hist.merge = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected crash before history merge"))
    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.process_batch(b1, 1)
    hist.merge = orig
    # primary landed (with meta): DDL-sliced merges carry composite ids
    # (batch_id * 1024 + sub, plans/replay.py)
    assert table.last_batch_id() // 1024 == 1
    assert "meta" in table.read(spark).columns
    assert hist.last_batch_id() == 0    # history merge did not
    # scn-sliced semantics: the history's schema evolves only when its own
    # post-DDL slice applies — the crash in slice 0 means no alter yet
    assert "meta" not in hist.read(spark).columns

    # retry of the same batch id converges (composite slice ids, * 1024)
    pipe.process_batch(b1, 1)
    assert "meta" in hist.read(spark).columns
    assert hist.last_batch_id() == 1025 and open_t.last_batch_id() == 1025

    full = feed.where(F.col("scn") <= half_scn).unionByName(b1)
    want = _norm(_one_shot(
        full.where(F.col("op") != "DDL"), ("role", "text", "ts", "meta")),
        extra=("meta",))
    pd.testing.assert_frame_equal(_norm(hist.read(spark), extra=("meta",)),
                                  want)
    cur = hist.read(spark).where("is_current").select(*KEYS, "valid_from")
    opn = open_t.read(spark).select(*KEYS, "valid_from")
    assert cur.exceptAll(opn).count() == 0
    assert opn.exceptAll(cur).count() == 0


def test_add_column_default_mid_batch_matches_primary(spark, tmp_path):
    """`ADD COLUMN ... DEFAULT dv` in the middle of ONE batch (round-5
    review): the history is evolved by the SAME scn slicing as the primary,
    so its pre-DDL version files predate its own alter and read the
    initial-default — is_current history state must equal the primary
    row-for-row, and pre-DDL-only keys must read 'dv' on BOTH sides (an
    up-front-evolved history would have written explicit NULLs)."""
    feed = generate_change_events(
        spark, n_txs=80, n_convs=12, seed=83,
    ).localCheckpoint()
    ev, _ = _ddl_row(spark, feed, "ADD COLUMN meta string DEFAULT dv")
    ev = ev.localCheckpoint()

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist,
                             history_open_table=open_t)
    pipe.process_batch(ev, 0)

    prim = table.read(spark).select(*KEYS, F.col("meta").alias("p_meta"))
    cur = hist.read(spark).where("is_current").select(
        *KEYS, F.col("meta").alias("h_meta"))
    both = prim.join(cur, KEYS, "full")
    assert both.where(~F.col("p_meta").eqNullSafe(F.col("h_meta"))).count() \
        == 0
    # the default is actually observable (pre-DDL keys read 'dv')
    assert prim.where("p_meta = 'dv'").count() > 0
    # open store agrees with is_current (including meta)
    opn = open_t.read(spark).select(*KEYS, F.col("meta").alias("h_meta"))
    assert cur.exceptAll(opn).count() == 0
    assert opn.exceptAll(cur).count() == 0


def test_rename_mid_batch_matches_primary(spark, tmp_path):
    """RENAME COLUMN mid-batch: pre-DDL events merge into the history under
    the OLD name (their slice runs before the alter), the rename is
    metadata-only with stable field ids, so post-rename reads surface those
    values under the new name — identical to the primary. An
    up-front-evolved history would have dropped them (cols_set says 'role',
    payload says 'speaker')."""
    feed = generate_change_events(
        spark, n_txs=80, n_convs=12, seed=89,
    ).localCheckpoint()
    ev, _ = _ddl_row(spark, feed, "RENAME COLUMN role TO speaker")
    ev = ev.localCheckpoint()

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist)
    pipe.process_batch(ev, 0)

    assert "speaker" in hist.read(spark).columns
    assert "role" not in hist.read(spark).columns
    prim = table.read(spark).select(*KEYS, F.col("speaker").alias("p"))
    cur = hist.read(spark).where("is_current").select(
        *KEYS, F.col("speaker").alias("h"))
    both = prim.join(cur, KEYS, "full")
    assert both.where(~F.col("p").eqNullSafe(F.col("h"))).count() == 0
    # pre-DDL values are NOT lost: real non-null speakers exist
    assert cur.where("h is not null").count() > 0


def test_case_variant_collision_refused(spark, tmp_path):
    """Spark resolves columns case-insensitively: 'VALID_FROM' collides
    with the SCD2 bookkeeping column and must refuse like 'valid_from'."""
    feed = generate_change_events(spark, n_txs=30, n_convs=8, seed=97)
    ev, _ = _ddl_row(spark, feed, "ADD COLUMN VALID_FROM string")
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist)
    with pytest.raises(RuntimeError, match="VALID_FROM"):
        pipe.process_batch(ev, 0)
    # and a case-variant re-ADD of an existing column is an idempotent
    # no-op at the lake layer (never a second, ambiguous column)
    from pyspark.sql.types import StringType
    before = table.read(spark).columns
    table.alter_add_column("ROLE", StringType())
    assert table.read(spark).columns == before


def test_noop_ddl_never_bricks_side_outputs(spark, tmp_path):
    """A DDL the primary logs-and-skips (unknown type token) must not be
    refused by the side-output preflight — a no-op DDL bricking the stream
    into an eternal replay loop is worse than skipping it (round-5
    review)."""
    feed = generate_change_events(spark, n_txs=30, n_convs=8, seed=101)
    ev, _ = _ddl_row(spark, feed, "ADD COLUMN valid_from blob")
    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist)
    pipe.process_batch(ev, 0)  # applies; the bogus DDL is skipped
    assert "blob" not in " ".join(table.read(spark).columns)
    assert hist.read(spark).count() > 0


def test_crash_between_history_and_open_store_alter(spark, tmp_path):
    """Process dies AFTER the history's mid-batch alter but BEFORE the open
    store's (the two are separate lake commits). The replayed batch must
    re-synchronize the open store to the history's schema BEFORE any slice
    reads it — without the entry re-sync, slice 0's payload (derived from
    the evolved history) selects the new column from a never-evolved store:
    an eternal AnalysisException replay loop (round-5 review finding)."""
    feed = generate_change_events(
        spark, n_txs=80, n_convs=12, seed=103,
    ).localCheckpoint()
    ev, _ = _ddl_row(spark, feed, "ADD COLUMN meta string")
    ev = ev.localCheckpoint()

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist,
                             history_open_table=open_t)

    orig = open_t.alter_add_column
    open_t.alter_add_column = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected crash before open-store alter"))
    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.process_batch(ev, 0)
    open_t.alter_add_column = orig
    # exactly the crash window: history evolved, open store did not
    assert "meta" in hist.read(spark).columns
    assert "meta" not in open_t.read(spark).columns

    # replay of the same batch heals and converges (no AnalysisException)
    pipe.process_batch(ev, 0)
    assert "meta" in open_t.read(spark).columns
    want = _norm(_one_shot(ev, ("role", "text", "ts", "meta")),
                 extra=("meta",))
    pd.testing.assert_frame_equal(_norm(hist.read(spark), extra=("meta",)),
                                  want)
    cur = hist.read(spark).where("is_current").select(
        *KEYS, "meta", "valid_from")
    opn = open_t.read(spark).select(*KEYS, "meta", "valid_from")
    assert cur.exceptAll(opn).count() == 0
    assert opn.exceptAll(cur).count() == 0


def test_bookkeeping_column_ddl_is_noop_on_both_sides(spark, tmp_path):
    """'DROP COLUMN is_current' / 'RENAME COLUMN valid_from x' name columns
    the PRIMARY does not have: the primary log-and-skips them, and the side
    outputs must do the same — the round-5 review found the history applied
    the DROP (corrupting is_current reads) and the open store applied the
    RENAME (bricking the next slice's seed projection)."""
    feed = generate_change_events(
        spark, n_txs=120, n_convs=12, seed=107,
    ).localCheckpoint()
    # split ONE feed by scn (batches must stay scn-ordered) and plant one
    # bookkeeping-column DDL in each half
    scns = sorted(r[0] for r in feed.select("scn").distinct().collect())
    mid = scns[len(scns) // 2]
    ev, _ = _ddl_row(spark, feed.where(F.col("scn") <= mid),
                     "DROP COLUMN is_current", scn=scns[len(scns) // 4])
    ev = ev.localCheckpoint()
    ev2, _ = _ddl_row(spark, feed.where(F.col("scn") > mid),
                      "RENAME COLUMN valid_from TO vf",
                      scn=scns[(3 * len(scns)) // 4])
    ev2 = ev2.localCheckpoint()

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist,
                             history_open_table=open_t)
    pipe.process_batch(ev, 0)  # not refused (primary no-op), not applied
    assert "is_current" in hist.read(spark).columns

    pipe.process_batch(ev2, 1)
    assert "valid_from" in open_t.read(spark).columns
    assert "valid_from" in hist.read(spark).columns

    # history still equals one-shot over both batches
    full = ev.unionByName(ev2).where(F.col("op") != "DDL")
    want = _norm(_one_shot(full, ("role", "text", "ts")))
    pd.testing.assert_frame_equal(_norm(hist.read(spark)), want)

    # pathological twin: the primary GENUINELY carries a colliding column
    # -> the DDL would apply there and the history cannot follow: refuse
    from pyspark.sql.types import StringType
    table.alter_add_column("valid_to", StringType())
    ev3, _ = _ddl_row(
        spark, generate_change_events(spark, n_txs=20, n_convs=8, seed=113),
        "DROP COLUMN valid_to")
    with pytest.raises(RuntimeError, match="valid_to"):
        pipe.process_batch(ev3, 2)


def test_legacy_plain_id_history_replays_without_double_apply(
        spark, tmp_path):
    """Migration shim (round-5 review): a history written by the PRE-SLICED
    scheme (plain batch_id audit ids) whose stream crashed between the
    history and open-store merges of batch N must, when replayed by the
    sliced code, SKIP the history merge (not re-apply under a composite id
    the old watermark cannot gate) and catch the open store up — then
    switch to composite ids from the next batch on."""
    from openlogreplicator_spark.operators.scd2 import scd2_history
    from openlogreplicator_spark.plans.scd2_apply import (
        apply_scd2_batch,
        apply_scd2_batch_sliced,
    )

    feed = generate_change_events(spark, n_txs=120, n_convs=16, seed=127)
    surv = assemble_transactions_sql(feed, CFG).select(
        *KEYS, "op", "scn", "seq", "xid", "commit_scn",
        F.struct(*[F.col("after").getField(c).alias(c)
                   for c in ("role", "text", "ts")]).alias("after"),
        "cols_set",
    ).localCheckpoint()
    qs = surv.approxQuantile("commit_scn", [0.33, 0.66], 0.0)
    b0 = surv.where(F.col("commit_scn") <= qs[0])
    b1 = surv.where(
        (F.col("commit_scn") > qs[0]) & (F.col("commit_scn") <= qs[1]))
    b2 = surv.where(F.col("commit_scn") > qs[1])

    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    # simulate a round-4-created table: no id-scheme stamp
    hist.set_property("scd2.id_scheme", None)

    # legacy batches 0 and 1 under PLAIN ids; batch 1 crashed between the
    # history merge and the open-store merge (history landed, store didn't)
    apply_scd2_batch(spark, b0, hist, CFG, 0, open_table=open_t)
    apply_scd2_batch(spark, b1, hist, CFG, 1, open_table=None)
    assert hist.last_batch_id() == 1 and open_t.last_batch_id() == 0

    # upgraded code replays batch 1: shim must audit-skip the history merge
    n_before = hist.read(spark).count()
    s = apply_scd2_batch_sliced(
        spark, b1, None, hist, CFG, 1, open_table=open_t)
    assert len(s) == 1 and s[0].get("skipped")
    assert hist.read(spark).count() == n_before  # no duplicated versions
    assert open_t.last_batch_id() == 1           # store caught up

    # next batch applies under composite ids and stamps the scheme
    apply_scd2_batch_sliced(spark, b2, None, hist, CFG, 2, open_table=open_t)
    assert hist.prop("scd2.id_scheme") == "sliced"
    assert hist.last_batch_id() == 2 * 1024

    want = _norm(scd2_history(surv, KEYS, ["role", "text", "ts"]))
    pd.testing.assert_frame_equal(_norm(hist.read(spark)), want)
    cur = hist.read(spark).where("is_current").select(*KEYS, "valid_from")
    opn = open_t.read(spark).select(*KEYS, "valid_from")
    assert cur.exceptAll(opn).count() == 0
    assert opn.exceptAll(cur).count() == 0


def test_case_variant_add_column_values_survive(spark, tmp_path):
    """'ADD COLUMN META string' (case variant of the feed's after.meta):
    the lake alters resolve case-insensitively and add 'META', the feed
    keeps setting after.meta with cols_set ['meta'] — values must land on
    the primary AND in the history (round-5 review finding: case-sensitive
    membership/padding dropped them to NULL, and the primary's struct
    padding fabricated an ambiguous duplicate field)."""
    from openlogreplicator_spark.feed import generate_change_events
    from openlogreplicator_spark.plans.replay import bootstrap_target

    feed = generate_change_events(
        spark, n_txs=80, n_convs=10, seed=61, with_ddl=True,
    ).withColumn(
        "ddl",
        F.when(F.col("ddl") == "ADD COLUMN meta string",
               F.lit("ADD COLUMN META string")).otherwise(F.col("ddl")),
    ).localCheckpoint()

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist,
                             history_open_table=open_t)
    pipe.process_batch(feed, 0)

    # the canonical column is the DDL's spelling; values are the feed's
    assert "META" in table.schema().fieldNames()
    prim_set = table.read(spark).where(F.col("META").isNotNull()).count()
    assert prim_set > 0
    hist_set = hist.read(spark).where(F.col("META").isNotNull()).count()
    assert hist_set > 0
    assert open_t.read(spark).where(F.col("META").isNotNull()).count() > 0


def test_noop_rename_onto_bookkeeping_not_refused(spark, tmp_path):
    """'RENAME COLUMN ghost TO valid_from' where the primary has no
    'ghost': the primary log-and-skips it, so the preflight must NOT
    refuse — a no-op DDL refused forever would brick the stream on every
    replay of the batch (round-5 review finding). A rename whose source
    EXISTS still refuses."""
    from openlogreplicator_spark.feed import generate_change_events
    from openlogreplicator_spark.plans.replay import bootstrap_target

    feed = generate_change_events(spark, n_txs=40, n_convs=8, seed=63)
    ev, _ = _ddl_row(spark, feed, "RENAME COLUMN ghost TO valid_from")

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"),
                             history_table=hist)
    pipe.process_batch(ev, 0)  # must not raise
    assert "valid_from" not in table.schema().fieldNames()
    assert table.read(spark).count() > 0

    # source exists -> the collision is real -> still refused
    ev2, _ = _ddl_row(spark, feed, "RENAME COLUMN role TO is_current")
    with pytest.raises(RuntimeError, match="bookkeeping"):
        pipe.process_batch(ev2, 1)


def test_evolve_schema_tracks_lake_alters(tmp_path):
    """Parity fuzz: over random DDL sequences (valid, malformed, case
    variants, retries), evolve_schema applied to the starting schema
    agrees with the REAL lake alters' end state, field for field — the
    pure twin must never drift from _apply_ddl (round-5 review theme)."""
    import random

    from openlogreplicator_spark.feed import TRANSCRIPTS_SCHEMA
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.plans.replay import (
        _apply_ddl,
        evolve_schema,
    )

    keys = ("conv_id", "turn_idx")
    names = ["role", "text", "tool", "ts", "meta", "extra", "META",
             "Role", "turn_idx", "conv_id", "ghost", "body"]
    types = ["string", "bigint", "int", "double", "blob"]
    rng = random.Random(51)

    def rand_ddl():
        kind = rng.choice(["add", "widen", "rename", "drop", "junk"])
        n = rng.choice(names)
        if kind == "add":
            return f"ADD COLUMN {n} {rng.choice(types)}"
        if kind == "widen":
            return f"WIDEN {n} {rng.choice(types)}"
        if kind == "rename":
            to = " TO " if rng.random() < 0.5 else " "
            return f"RENAME COLUMN {n}{to}{rng.choice(names)}"
        if kind == "drop":
            return f"DROP COLUMN {n}"
        return rng.choice(["FROBNICATE x", "RENAME COLUMN onlyone",
                           "ADD COLUMN", "WIDEN"])

    for trial in range(12):
        table = LakeTable.create(
            str(tmp_path / f"t{trial}"), TRANSCRIPTS_SCHEMA, list(keys),
            num_buckets=2)
        sch = table.schema()
        ddls = [rand_ddl() for _ in range(10)]
        for ddl in ddls:
            _apply_ddl(table, ddl)
            sch = evolve_schema(sch, ddl, keys)
        got = [(f.name, f.dataType) for f in sch.fields]
        want = [(f.name, f.dataType) for f in table.schema().fields]
        assert got == want, (trial, ddls, got, want)


def test_routed_change_stream_schema_sliced_per_table(spark, tmp_path):
    """Multi-table routed mode + schema bit0 + a DDL routed to ONE table:
    each table's change-stream subdir advertises ITS schema — transcripts'
    post-DDL messages carry 'meta' (pre-DDL ones don't), notes' never do."""
    import glob
    import json as _json
    import os

    from openlogreplicator_spark.sinks import JsonFormat

    cfg = EngineConfig(num_buckets=4, table_filter=None)
    events = generate_change_events(spark, n_txs=80, n_convs=12, seed=79)
    is_dml = F.col("op").isin("I", "U", "D")
    routed = events.withColumn(
        "table",
        F.when(~is_dml, F.lit("transcripts")).otherwise(
            F.when(F.col("scn") % 2 == 0, F.lit("transcripts"))
            .otherwise(F.lit("notes"))
        ),
    )
    routed, add_scn = _ddl_row(spark, routed, "ADD COLUMN meta string",
                               table="transcripts")
    routed = routed.localCheckpoint()
    tables = {
        "transcripts": bootstrap_target(str(tmp_path / "t1"), cfg),
        "notes": bootstrap_target(str(tmp_path / "t2"), cfg),
    }
    cs_dir = str(tmp_path / "cs")
    pipe = CDCStreamPipeline(tables, cfg, str(tmp_path / "state"),
                             change_stream_dir=cs_dir,
                             change_stream_fmt=JsonFormat(schema_format=1))
    pipe.process_batch(routed, 0)  # DDL lands MID-batch

    def cols_by_scn(sub):
        out = []
        for r in spark.read.text(*sorted(glob.glob(
                os.path.join(cs_dir, sub, "batch_*")))).collect():
            m = _json.loads(r["value"])
            for p in m["payload"]:
                out.append((m["scn"],
                            [c["name"] for c in p["schema"]["columns"]]))
        return out

    t_msgs = cols_by_scn("transcripts")
    n_msgs = cols_by_scn("notes")
    assert t_msgs and n_msgs
    pre = [s for s, cols in t_msgs if "meta" not in cols]
    post = [s for s, cols in t_msgs if "meta" in cols]
    assert pre and post
    assert max(pre) <= add_scn < min(post)
    # the DDL was routed to transcripts only
    assert all("meta" not in cols for _s, cols in n_msgs)


def test_foreign_table_ddl_not_applied_single_mode(spark, tmp_path):
    """Single-table mode: a DDL addressed to a table OUTSIDE the dictionary
    must not reach the configured target — a foreign TRUNCATE used to wipe
    it (round-5 review finding; the reference's schema masks select which
    tables' DDL is tracked, OracleAnalyzerOnline.cpp:213-214)."""
    from openlogreplicator_spark.feed import generate_change_events
    from openlogreplicator_spark.plans.replay import bootstrap_target

    feed = generate_change_events(spark, n_txs=40, n_convs=8, seed=87)
    ev, _ = _ddl_row(spark, feed, "TRUNCATE TABLE orders", table="orders")
    ev2, _ = _ddl_row(spark, ev, "ADD COLUMN foreign_col string",
                      table="orders")

    table = bootstrap_target(str(tmp_path / "t"), CFG)
    pipe = CDCStreamPipeline(table, CFG, str(tmp_path / "state"))
    pipe.process_batch(ev2.localCheckpoint(), 0)
    assert table.read(spark).count() > 0  # foreign TRUNCATE never applied
    assert "foreign_col" not in table.schema().fieldNames()
    # a matching-table DDL still applies
    ev3, _ = _ddl_row(spark, feed, "ADD COLUMN own_col string")
    pipe.process_batch(ev3.localCheckpoint(), 1)
    assert "own_col" in table.schema().fieldNames()


def test_control_probe_honors_start_position(spark, tmp_path):
    """A '_control' shutdown event BEFORE the configured start position
    must not stop a fresh 'start from here and tail' run (round-5 review
    finding: the probe scanned the raw batch)."""
    from openlogreplicator_spark.feed import generate_change_events
    from openlogreplicator_spark.plans.replay import bootstrap_target

    feed = generate_change_events(spark, n_txs=30, n_convs=6, seed=91)
    max_scn = feed.agg(F.max("scn")).first()[0]
    ctl = spark.createDataFrame(
        [(5, 0, "ctl-x", "I", "_control", "c0", 0, None, None,
          [], [], None, None, None)],
        CHANGE_EVENT_SCHEMA)
    ev = feed.unionByName(ctl).localCheckpoint()

    cfg = EngineConfig(num_buckets=4, start_scn=10)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"))
    pipe.process_batch(ev, 0)
    assert pipe.shutdown_requested is False  # historical event skipped

    ctl2 = spark.createDataFrame(
        [(int(max_scn) + 10, 0, "ctl-y", "I", "_control", "c0", 0, None,
          None, [], [], None, None, None)],
        CHANGE_EVENT_SCHEMA)
    pipe.process_batch(feed.unionByName(ctl2).localCheckpoint(), 1)
    assert pipe.shutdown_requested is True  # live event still stops
