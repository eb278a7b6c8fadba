"""Incremental SCD2 maintenance: keep a version-history lake table current
batch-by-batch, instead of recomputing `operators/scd2.py` over all history.

The reference streams each committed transaction exactly once in commit
order (RedoLog.cpp:751-762); a downstream history table therefore only ever
(a) CLOSES the open version of keys the batch touches and (b) APPENDS that
batch's new versions — closed history is immutable. This plan exploits
that: per batch it reads ONLY the open versions of touched keys, seeds the
batch-local SCD2 computation with them, and MERGEs the result keyed by
(key..., valid_from) — the close of an old version is a PARTIAL update
(cols_set = [valid_to, is_current]) that rides the engine's own
update-trim machinery, so the closed version's payload columns are never
rewritten.

Equivalence invariant (pinned by tests/test_scd2_apply.py): applying a feed
in any batch split yields a history table identical to one-shot
``scd2_history`` over the whole feed. It holds because the seed
pseudo-event replays the open version's full state at its original ordinal
(carry-forward across the batch boundary), and a delete in an earlier
batch leaves no open version — so the next batch starts the fresh epoch
exactly like the global computation does.

Requires: ordinals monotone across batches (commit_scn-major ordering —
guaranteed by commit-ordered flush, G3). A batch with a lower ordinal than
an already-closed version would interleave history and must be replayed
through the bounded path instead.

Scale: per batch the work is O(batch). The seed source is, by preference:

  * an OPEN-VERSION STORE (round 4, ``open_table``): a second bucketed
    lake table holding exactly one row per live key (its current open
    version). The seed read prunes to the batch's TOUCHED BUCKETS via the
    manifest (file-level pruning) and semi-joins the touched keys — bytes
    read are O(live keys in touched buckets) and FLAT as closed history
    grows (tools/probe_scd2_open.py measures this). The store is
    maintained in the same batch with the same batch_id write-audit, so
    crash-between-merges replays deterministically: history's merge is
    skipped by the audit, the open store's re-applies, and the seed read
    (from the not-yet-updated store) reproduces the same batch output.
  * without a store, the legacy path scans ``history.read().where(
    is_current)`` — correct, but the seed read grows with closed history;
    kept for one-shot/backfill use.

The MERGE prunes to touched buckets as always; the seed semi-join
broadcasts the batch's distinct keys at typical batch sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.lake import LakeTable
from openlogreplicator_spark.operators.scd2 import scd2_history

# SCD2 bookkeeping columns: everything else in the history schema is key or
# payload. apply_scd2_batch_sliced derives each slice's payload set from the
# history table's CURRENT schema minus these minus the key, so mid-stream
# ADD/RENAME COLUMN enters version rows the same batch — and the same scn
# slice — it lands on the primary.
SCD2_META_COLS = ("valid_from", "valid_to", "is_current")


def bootstrap_scd2_target(
    path: str,
    cfg: EngineConfig,
    payload_schema: StructType | None = None,
    write_mode: str = "cow",
) -> LakeTable:
    """Create the history table: payload columns + (valid_from, valid_to,
    is_current), keyed by (key..., valid_from) — each version is a row.
    ``write_mode='mor'`` gives the history a merge-on-read layout (same
    trade as the primary: O(batch) appends + read-time resolve + periodic
    compaction — the natural choice for an append-mostly history at 100 TB,
    pinned read-equivalent by tests/test_round5_features.py)."""
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, TimestampType,
    )

    if payload_schema is None:
        payload_schema = StructType([
            StructField("role", StringType(), True),
            StructField("text", StringType(), True),
            StructField("ts", TimestampType(), True),
        ])
    fields = (
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", LongType(), False),
            StructField("valid_from", LongType(), False),
        ]
        + list(payload_schema.fields)
        + [
            StructField("valid_to", LongType(), True),
            StructField("is_current", BooleanType(), True),
        ]
    )
    t = LakeTable.create(
        path,
        StructType(fields),
        ["conv_id", "turn_idx", "valid_from"],
        num_buckets=cfg.num_buckets,
        write_mode=write_mode,
    )
    # stamp the write-audit id scheme at birth: tables created by this code
    # only ever receive composite (sliced) ids, so the legacy plain-id
    # migration shim in apply_scd2_batch_sliced can never misfire on them
    t.set_property("scd2.id_scheme", "sliced")
    return t


def bootstrap_scd2_open_target(
    path: str,
    cfg: EngineConfig,
    payload_schema: StructType | None = None,
    write_mode: str = "cow",
) -> LakeTable:
    """Create the OPEN-VERSION store: one row per live key — the key's
    current open version (payload state + its valid_from ordinal), keyed
    by the key alone. This is the O(live keys) seed source for
    ``apply_scd2_batch``; the history table holds the full version record.
    """
    from pyspark.sql.types import (
        LongType, StringType, StructField, TimestampType,
    )

    if payload_schema is None:
        payload_schema = StructType([
            StructField("role", StringType(), True),
            StructField("text", StringType(), True),
            StructField("ts", TimestampType(), True),
        ])
    fields = (
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", LongType(), False),
        ]
        + list(payload_schema.fields)
        + [StructField("valid_from", LongType(), False)]
    )
    return LakeTable.create(
        path,
        StructType(fields),
        ["conv_id", "turn_idx"],
        num_buckets=cfg.num_buckets,
        write_mode=write_mode,
    )


def _payload_cols(history: LakeTable, key_cols: list) -> tuple[str, ...]:
    """Payload = the history's CURRENT schema minus SCD2 bookkeeping minus
    the key — re-derived after every alter so mid-stream DDL enters version
    rows the same slice it lands on the primary."""
    return tuple(
        f.name for f in history.schema().fields
        if f.name not in SCD2_META_COLS and f.name not in key_cols
    )


def _apply_side_ddl(table: LakeTable, ddl: str) -> None:
    """Apply one column DDL to a side-output table, UNLESS the PRIMARY
    itself no-ops it — the side output must mirror the primary's effect
    exactly, skip for skip and apply for apply:

      * a DDL operating on an SCD2 bookkeeping column (valid_from/valid_to/
        is_current): the primary has no such column (it would have collided
        at bootstrap) and log-and-skips it, so skip here too — applying
        would drop or rename the side output's own machinery (round-5
        review finding: 'DROP COLUMN is_current' silently corrupted the
        history; 'RENAME COLUMN valid_from x' bricked the open store's
        seed projection);
      * RENAME/DROP of a merge-key column: the primary's alter_rename_
        column/alter_drop_column raise ValueError for key columns and
        _apply_ddl catches-and-skips, so skip here without relying on the
        side table sharing the same key set.

    WIDEN of a merge-key column is NOT guarded: the primary's alter_widen
    has no key refusal and applies it, so the history and open store widen
    their key in the same slice (round-5 review finding: guarding it left
    the side-output key narrower than the primary's — events past the old
    type's range would cast to the stale narrow type on merge while the
    primary stored them correctly). Skips are logged, mirroring
    _apply_ddl's own log-and-skip contract."""
    import logging

    from openlogreplicator_spark.plans.replay import (
        _apply_ddl,
        _ddl_tokens,
        ddl_source_columns,
    )

    _parts, verb, _unit = _ddl_tokens(ddl)
    guarded = set(SCD2_META_COLS)
    if verb != "WIDEN":
        guarded |= {k.lower() for k in table.key_cols}
    hit = {c.lower() for c in ddl_source_columns(ddl)} & guarded
    if hit:
        logging.getLogger(__name__).warning(
            "skipping DDL %r on SCD2 side output %s: it operates on "
            "bookkeeping/key column(s) %s the primary no-ops it on "
            "(skip-for-skip)", ddl, table.path, sorted(hit))
        return
    _apply_ddl(table, ddl)


def apply_scd2_batch_sliced(
    spark: SparkSession,
    assembled: DataFrame,
    ddls: "list[tuple[int, str]] | None",
    history: LakeTable,
    cfg: EngineConfig,
    batch_id: int,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    open_table: "LakeTable | None" = None,
) -> list[dict]:
    """Apply one batch to the SCD2 history, interleaving column DDL by scn —
    the SAME slicing the primary merge does (plans/replay.py
    apply_committed; shared ddl_slice_bounds/slice_by_scn so the boundary
    arithmetic cannot drift), so history version rows for events BEFORE a
    mid-batch DDL are written under the pre-DDL schema and events after
    under the evolved one. Without slicing, an `ADD COLUMN ... DEFAULT d`
    mid-batch diverges: the primary's pre-DDL files predate the alter and
    read the initial-default, while an up-front-evolved history would write
    explicit NULLs for the same events (round-5 review finding). Slicing
    makes the history's files predate its own alter identically.

    Composite batch ids mirror the primary exactly (batch_id * 1024 + sub,
    ALWAYS composite so ids stay monotonic across DDL-free and DDL-carrying
    batches); each slice is an ordinary apply_scd2_batch, so crash-replay
    inherits the pinned per-slice semantics (write-audit skip + open-store
    catch-up). Only idempotent column alters are applied here — lifecycle
    verbs are refused at pipeline preflight — and alters are guarded by
    ``ddl_applied`` + ``_apply_side_ddl`` so retried slices re-apply their
    DDL safely and bookkeeping-column DDL stays the no-op it is on the
    primary.

    Crash windows (both pinned by tests/test_ddl_side_outputs.py):

      * between the history alter and the open-store alter — entry
        re-synchronizes the open store to any DDL the history already
        reflects, so a retried slice never selects an evolved-history
        column from a never-evolved store;
      * a history written by the PRE-SLICED scheme (plain batch_id audit
        ids) being replayed by this code — detected via the
        ``scd2.id_scheme`` table property (absent + last_batch_id equal to
        the replayed plain id) and replayed with the legacy semantics
        (one unsliced apply under the plain id: the history merge
        audit-skips, the open store catches up) instead of composite ids
        the old audit watermark would not skip (round-5 review finding:
        the scheme switch would otherwise double-apply exactly the
        crash-recovery batch the audit exists for).
    """
    from openlogreplicator_spark.plans.replay import (
        classify_ddl,
        ddl_applied,
        ddl_slice_bounds,
        slice_by_scn,
    )

    kc = list(key_cols)
    col_ddls = sorted(
        (scn, txt) for scn, txt in (ddls or [])
        if classify_ddl(txt) == "column"
    )

    sliced_scheme = history.prop("scd2.id_scheme") == "sliced"
    if not sliced_scheme and history.last_batch_id() == batch_id:
        # legacy plain-id migration shim: this batch already landed under
        # the pre-sliced scheme and is being replayed by upgraded code.
        for _scn, txt in col_ddls:
            for t in (history, open_table):
                if t is not None and not ddl_applied(t, txt):
                    _apply_side_ddl(t, txt)
        return [apply_scd2_batch(
            spark, assembled, history, cfg, batch_id,
            payload_cols=_payload_cols(history, kc), key_cols=key_cols,
            open_table=open_table,
        )]
    if not sliced_scheme:
        history.set_property("scd2.id_scheme", "sliced")

    if open_table is not None:
        # crash re-sync: a prior attempt may have died between the two
        # tables' alters — bring the open store up to whatever the history
        # already reflects before any slice reads it
        for _scn, txt in col_ddls:
            if ddl_applied(history, txt) and not ddl_applied(open_table, txt):
                _apply_side_ddl(open_table, txt)

    summaries: list[dict] = []
    for sub, (lo, hi) in enumerate(ddl_slice_bounds(col_ddls)):
        if sub > 0:
            for t in (history, open_table):
                if t is not None and not ddl_applied(t, col_ddls[sub - 1][1]):
                    _apply_side_ddl(t, col_ddls[sub - 1][1])
        summaries.append(apply_scd2_batch(
            spark, slice_by_scn(assembled, lo, hi), history, cfg,
            batch_id * 1024 + sub,
            payload_cols=_payload_cols(history, kc), key_cols=key_cols,
            open_table=open_table,
        ))
    return summaries


def apply_scd2_batch(
    spark: SparkSession,
    assembled: DataFrame,
    history: LakeTable,
    cfg: EngineConfig,
    batch_id: int,
    payload_cols: tuple[str, ...] = ("role", "text", "ts"),
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ord_expr: Column | None = None,
    open_table: "LakeTable | None" = None,
    persist_plan: bool = True,
) -> dict:
    """Apply one assembled batch to the SCD2 history table (see module doc).

    ``assembled``: the assemble_transactions output (op/after/cols_set/scn/
    commit_scn). Returns the MERGE summary (idempotent: a retried batch_id
    is skipped by the snapshot write-audit).

    ``payload_cols`` must be columns of the HISTORY schema; each event's
    ``after`` value is cast to the history's (possibly evolved) type, and a
    history column the feed's after-struct has never carried (mid-stream
    ADD COLUMN) is padded with a typed NULL — cols_set can never name it on
    pre-DDL events, so it stays unset exactly like the primary merge path
    (plans/replay.py _merge_slice).

    ``persist_plan``: cache the batch's SCD2 window plan for its three
    consumers (history MERGE, open-store upserts, delete anti-join) — one
    execution of the seed-union + window stages per batch instead of ~3
    (round-4 verdict, What's wrong #2; tools/probe_scd2_persist.py measures
    it). The frame is batch-sized, not corpus-sized.
    """
    kc = list(key_cols)
    hsch = history.schema()
    # default: the guarded rank-packed ordinal (operators/scd2.py) — a pure
    # function of each transaction's own content, so per-batch values equal
    # the one-shot computation (transactions never split across assembled
    # batches) and multi-row unnested ``seq`` sub-ordinals are folded in.
    # Computed on the batch events BEFORE the seed union: seeds replay
    # their STORED ordinal, never re-rank.
    from openlogreplicator_spark.operators.scd2 import packed_version_ord

    o = ord_expr if ord_expr is not None else packed_version_ord()
    ev = assembled.withColumn("_ord0", o.cast("long"))

    # open versions of keys this batch touches (left-semi: no payload dup).
    # With an open-version store the read is pruned to the touched BUCKETS
    # via the manifest — O(live keys in touched buckets), flat as closed
    # history grows; without one, the legacy is_current scan of history.
    keys = ev.select(*kc).distinct()
    if open_table is not None:
        touched = sorted(
            r[0] for r in keys.select(
                open_table.bucket_expr(kc).alias("_b")).distinct().collect()
        )
        open_v = (
            open_table.read(spark, buckets=touched)
            .join(keys, kc, "left_semi")
            .withColumn("is_current", F.lit(True))
        )
    else:
        open_v = (
            history.read(spark)
            .where(F.col("is_current"))
            .join(keys, kc, "left_semi")
        )

    # seed pseudo-events: replay each open version's full state at its
    # original ordinal, so batch-local carry-forward starts from it. Casts
    # to the history's CURRENT types make both union legs agree after a
    # mid-stream WIDEN (the feed's after-struct keeps the narrow type).
    seed = open_v.select(
        *[F.col(k) for k in kc],
        F.lit("I").alias("op"),
        F.struct(*[
            F.col(c).cast(hsch[c].dataType).alias(c) for c in payload_cols
        ]).alias("after"),
        F.array(*[F.lit(c) for c in payload_cols]).alias("cols_set"),
        F.col("valid_from").alias("_ord0"),
    )
    # case-INSENSITIVE presence check, matching getField's resolver: after
    # a case-variant 'ADD COLUMN META' the canonical history column differs
    # from the feed's after.meta only by case, and a case-sensitive check
    # padded it with NULL, silently dropping every post-DDL value from the
    # history (round-5 review finding)
    ev_after_l = {n.lower() for n in ev.schema["after"].dataType.fieldNames()}
    unified = seed.unionByName(
        ev.select(
            *kc, "op",
            F.struct(*[
                (F.col("after").getField(c)
                 if c.lower() in ev_after_l else F.lit(None))
                .cast(hsch[c].dataType).alias(c)
                for c in payload_cols
            ]).alias("after"),
            "cols_set", "_ord0",
        )
    )
    hist_out = scd2_history(
        unified, kc, list(payload_cols), ord_expr=F.col("_ord0")
    )
    if persist_plan:
        hist_out = hist_out.persist()
    try:
        # rows re-emitting a seeded (already-stored) version only close it:
        # partial update of (valid_to, is_current); new versions set
        # everything
        seeded = open_v.select(
            *kc, "valid_from", F.lit(True).alias("_seeded")
        )
        upd = hist_out.join(seeded, kc + ["valid_from"], "left").select(
            *kc,
            "valid_from",
            *[F.col(c) for c in payload_cols],
            "valid_to",
            "is_current",
            F.lit("U").alias("op"),
            F.when(
                F.col("_seeded"),
                F.array(F.lit("valid_to"), F.lit("is_current")),
            )
            .otherwise(
                F.array(
                    *[F.lit(c) for c in payload_cols],
                    F.lit("valid_to"), F.lit("is_current"),
                )
            )
            .alias("cols_set"),
        )
        smry = history.merge(spark, upd, batch_id=batch_id)
        if open_table is not None:
            # maintain the open store in the same batch: every touched key's
            # last surviving version re-opens it (I/U) or, when its last
            # event was a delete, drops it. One row per key by construction
            # (at most one is_current version per key; the anti-join is
            # disjoint). Same batch_id write-audit => crash-between-merges
            # replays clean.
            osch = open_table.schema()
            all_cols = list(payload_cols) + ["valid_from"]
            opens = hist_out.where(F.col("is_current"))
            up_rows = opens.select(
                *[F.col(k).cast(osch[k].dataType).alias(k) for k in kc],
                *[F.col(c).cast(osch[c].dataType).alias(c)
                  for c in all_cols],
                F.lit("U").alias("op"),
                F.array(*[F.lit(c) for c in all_cols]).alias("cols_set"),
            )
            del_rows = keys.join(opens.select(*kc), kc, "left_anti").select(
                *[F.col(k).cast(osch[k].dataType).alias(k) for k in kc],
                *[F.lit(None).cast(osch[c].dataType).alias(c)
                  for c in all_cols],
                F.lit("D").alias("op"),
                F.lit(None).cast("array<string>").alias("cols_set"),
            )
            smry["open_store"] = open_table.merge(
                spark, up_rows.unionByName(del_rows),
                batch_id=batch_id, touched=touched,
            )
    finally:
        if persist_plan:
            hist_out.unpersist()
    return smry
