"""Vectorized decode / normalize of the raw change feed.

Reference parity:
  * opcode dispatch (RedoLog.cpp:444-570) — the feed is already structured, so
    dispatch degenerates to validating/normalizing the ``op`` code;
  * table-dictionary filter (Schema.cpp:430-435, RedoLog.cpp:803-807) — rows
    whose table is not in the configured dictionary are dropped BEFORE any
    payload work, so Catalyst pushes the predicate into the Parquet scan;
  * row-class filters (RedoLog.cpp:699-705,773-780) — malformed / keyless DML
    dropped;
  * payload transform — runs through an Arrow-vectorized pandas UDF
    (BASELINE.json: "no per-row Python"): normalizes text (strip control
    chars / trailing whitespace). Everything else stays JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from openlogreplicator_spark.config import EngineConfig

VALID_OPS = ("B", "C", "R", "I", "U", "D", "PR", "MI", "MD", "DDL")
DML_OPS = ("I", "U", "D")
# multi-row ops (QMI/QMD, reference 11.11/11.12): ONE event packs N rows in
# `rows`; they stay packed through assembly (a partial rollback pops the
# WHOLE vector, TransactionBuffer.cpp:159-183) and unnest afterwards
MULTI_OPS = ("MI", "MD")


# Unicode-aware trailing-whitespace class, spelled out explicitly because
# Java regex \s is ASCII-only while Python/pandas \s is Unicode-aware: both
# paths use this SAME class so they cannot diverge on NBSP/NEL/ideographic
# space in real transcript text. (Python \s additionally matches \x1c-\x1f,
# but those are removed by the control-char strip first, so the paths are
# exactly equivalent — pinned by test_functions.test_normalize_paths_equal.)
_TRAILING_WS = (
    "[\\s\\u0085\\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]+$"
)


@pandas_udf(StringType())
def _normalize_text_pandas(s: pd.Series) -> pd.Series:
    """Arrow-batched payload transform (vectorized pandas string kernel).
    Semantically identical to the JVM expression below; kept as the escape
    hatch for transforms built-ins can't express (tested equal)."""
    return (
        s.str.replace(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", regex=True)
        .str.replace(_TRAILING_WS, "", regex=True)
    )


def _normalize_text_jvm(c):
    """Whole-stage-codegen path: control-char strip + trailing-ws trim.
    Hot-path default — stays inside Tungsten, no Python exchange."""
    return F.regexp_replace(
        F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""),
        _TRAILING_WS, ""
    )


def resolve_start_position(events: DataFrame, cfg: EngineConfig):
    """Resolve the NOW / relative-time start modes to concrete pushed-down
    predicates — ONCE, before the first batch (the reference resolves NOW to
    the current database scn and start-time-rel to now-minus-N before it
    starts tailing, OracleAnalyzerOnline.cpp:513-626). Returns a new config
    with start_scn / start_ts filled in; a no-op if neither mode is set.

    ``events`` must be a STATIC view of the feed (one bounded one-row agg on
    the driver). Resolving inside foreachBatch would re-resolve per
    microbatch against that batch alone — wrong, and apply_start_position
    raises if handed unresolved modes on a streaming frame.
    """
    from dataclasses import replace as _replace

    if not cfg.start_now and cfg.start_relative_s is None:
        return cfg
    row = events.select(
        F.max("scn").alias("mx_scn"), F.max("ts").alias("mx_ts")
    ).first()
    out = _replace(cfg, start_now=False, start_relative_s=None)
    if cfg.start_now and row is not None and row["mx_scn"] is not None:
        # NOW = only events strictly after the feed's current end
        resolved = int(row["mx_scn"]) + 1
        out = _replace(out, start_scn=max(out.start_scn or 0, resolved))
    if (cfg.start_relative_s is not None and row is not None
            and row["mx_ts"] is not None):
        import datetime as _dt

        ts = row["mx_ts"] - _dt.timedelta(seconds=int(cfg.start_relative_s))
        resolved_ts = ts.strftime("%Y-%m-%d %H:%M:%S.%f")
        # intersection semantics: keep the LATER of an explicit start_ts and
        # the relative resolution (both predicates must hold)
        cand = [t for t in (out.start_ts, resolved_ts) if t]
        out = _replace(out, start_ts=max(cand))
    return out


def apply_start_position(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Start-position predicate (reference start modes: scn / sequence /
    timestamp / NOW — OpenLogReplicator.cpp:661-704,
    OracleAnalyzerOnline.cpp:513-626). Plain column predicates so Catalyst
    pushes them into the parquet scan (PushedFilters) — the feed files below
    the start position are never read at scale. NOW / relative modes are
    resolved here for a static frame; streaming callers must
    resolve_start_position against the static feed first."""
    if cfg.start_now or cfg.start_relative_s is not None:
        if events.isStreaming:
            raise ValueError(
                "start_now / start_relative_s must be resolved against the "
                "static feed before streaming (resolve_start_position)"
            )
        cfg = resolve_start_position(events, cfg)
    if cfg.start_scn is not None:
        events = events.where(F.col("scn") >= F.lit(int(cfg.start_scn)))
    if cfg.start_seq is not None:
        events = events.where(F.col("seq") >= F.lit(int(cfg.start_seq)))
    if cfg.start_ts is not None:
        events = events.where(
            F.col("ts").isNull()
            | (F.col("ts") >= F.to_timestamp(F.lit(cfg.start_ts)))
        )
    return events


def before_image_trim(events: DataFrame) -> DataFrame:
    """D3 before-image consumption: drop unchanged columns from an UPDATE's
    ``cols_set`` by comparing the before and after images per column — the
    reference's COLUMN_FORMAT_CHANGED trim (OutputBuffer.cpp:1893-1927
    compares before/after bytes and skips equal non-PK columns).

    Rules (mirroring the reference):
      * only op='U' rows with a before image are trimmed;
      * a column is dropped iff BOTH images carry it and the values are
        null-safe EQUAL — if the before value is absent/unverifiable the
        column is kept (the reference keeps columns lacking a before image);
      * merge keys ride outside cols_set, so they are never trimmed (K1).

    Correctness precondition: the before image must reflect the row's true
    prior state (a real redo/WAL feed guarantees this — supplemental
    logging). Then dropping an equal-valued write cannot change the final
    table state, it only removes dead bytes from every downstream shuffle
    and MERGE.
    """
    if "before" not in events.columns:
        return events
    fields = [f.name for f in events.schema["after"].dataType.fields]

    # a column is verifiable iff the before image explicitly carries it
    # (before_cols — the supplemental-log column list); a null value in a
    # carried column is a real NULL and may legitimately equal the after side
    have_bc = "before_cols" in events.columns
    bc = (F.coalesce(F.col("before_cols"), F.array().cast("array<string>"))
          if have_bc else None)

    def keep(c):
        e = F.lit(True)
        for name in fields:
            b = F.col("before").getField(name)
            a = F.col("after").getField(name)
            verifiable = (F.array_contains(bc, name) if have_bc
                          else b.isNotNull())
            e = F.when(c == F.lit(name), ~(verifiable & b.eqNullSafe(a))
                       ).otherwise(e)
        return e

    trimmable = (
        (F.col("op") == "U")
        & F.col("before").isNotNull()
        & F.col("after").isNotNull()
    )
    return events.withColumn(
        "cols_set",
        F.when(trimmable, F.filter(F.col("cols_set"), keep))
        .otherwise(F.col("cols_set")),
    )


def decode_events(
    events: DataFrame,
    cfg: EngineConfig,
    normalize_text: bool = True,
    use_pandas_normalize: bool = False,
) -> DataFrame:
    """Filter + normalize a raw change-event DataFrame (CHANGE_EVENT_SCHEMA)."""
    out = apply_start_position(events, cfg).where(F.col("op").isin(*VALID_OPS))

    # schemaless mode: no dictionary, no key requirement — every event
    # passes decode untouched (types.h:139 analog); consumers are the
    # change-stream serializer, not the keyed MERGE
    row_ops = DML_OPS + MULTI_OPS
    if not cfg.schemaless:
        # table-dictionary predicate — pushed down to the scan by Catalyst
        # (control ops B/C/R/PR carry the table too in our feed, be lenient).
        # Entries containing '%' are SQL LIKE masks, matching the reference's
        # mask selection (OracleAnalyzerOnline.cpp:213-214:
        # U.NAME||'.'||O.NAME LIKE UPPER(:mask)); others match exactly.
        if cfg.table_filter is not None:
            exact = [t for t in cfg.table_filter if "%" not in t]
            masks = [t for t in cfg.table_filter if "%" in t]
            pred = F.col("table").isin(*exact) if exact else F.lit(False)
            for m in masks:
                pred = pred | F.col("table").like(m)
            # DDL is table-addressed like the row ops: a DDL for a table
            # outside the dictionary must not survive decode (round-5
            # review finding: the single-table pipeline collected foreign
            # DDL and applied a foreign TRUNCATE/DROP to ITS target —
            # silent data loss; the reference's schema masks select which
            # tables' DDL is tracked, OracleAnalyzerOnline.cpp:213-214)
            dict_ops = list(row_ops) + ["DDL"]
            out = out.where((~F.col("op").isin(*dict_ops)) | pred)

        # row-class filter: single-row DML must carry a full merge key
        # (multi-row ops carry their keys inside `rows`)
        key_ok = F.lit(True)
        for k in cfg.key_cols:
            key_ok = key_ok & F.col(k).isNotNull()
        out = out.where((~F.col("op").isin(*DML_OPS)) | key_ok)

    return _post_decode(out, cfg, normalize_text, use_pandas_normalize)


def _post_decode(out: DataFrame, cfg: EngineConfig, normalize_text: bool,
                 use_pandas_normalize: bool) -> DataFrame:
    """Shared decode tail (single- and multi-table paths): payload
    normalize + optional D3 before-image trim."""
    if normalize_text and "after" in out.columns:
        norm = (_normalize_text_pandas if use_pandas_normalize
                else _normalize_text_jvm)
        out = out.withColumn(
            "after",
            F.when(
                F.col("after").isNotNull(),
                F.col("after").withField("text", norm(F.col("after.text"))),
            ),
        )
    if normalize_text and "rows" in out.columns:
        # packed multi-row payloads normalize too (JVM kernel only: a
        # pandas UDF cannot appear inside a higher-order transform lambda)
        out = out.withColumn(
            "rows",
            F.when(
                F.col("rows").isNotNull(),
                F.transform(
                    F.col("rows"),
                    lambda r: r.withField(
                        "after",
                        F.when(
                            r.getField("after").isNotNull(),
                            r.getField("after").withField(
                                "text",
                                _normalize_text_jvm(
                                    r.getField("after").getField("text")
                                ),
                            ),
                        ),
                    ),
                ),
            ),
        )
    if cfg.trim_unchanged:
        out = before_image_trim(out)
    return out


def unnest_multirow(assembled: DataFrame) -> DataFrame:
    """D5 multi-row unnest (reference OutputBuffer.cpp:1407-1522): expand
    committed MI/MD events into standard I/D rows AFTER assembly — the
    packed event is the partial-rollback unit (one pop retracts the whole
    vector), so unnesting earlier would change retraction semantics.

    Exploded rows get seq' = seq*256 + idx (QMI nrow is bounded by
    the block's slot count, < 256 in the reference) so the (commit_scn, scn, seq)
    apply order stays total (an MI inserting the same key twice resolves to
    the later packed row, matching the reference's slot order).
    """
    if "rows" not in assembled.columns:
        return assembled
    from openlogreplicator_spark.feed import MULTIROW_TYPE
    from pyspark.sql.types import ArrayType

    # single-pass explode (NO branch+union: a streaming stateful upstream
    # may appear only once in the plan, and batch avoids a double scan):
    # every row becomes an array — its packed rows, or a singleton of itself.
    # Packed rows missing a merge key are dropped here — the row-class
    # filter's keyless-DML invariant, which decode exempts MI/MD from
    # because their keys live inside `rows`. NOTE: MULTIROW_TYPE is typed to
    # the transcript key shape (conv_id, turn_idx); tables keyed differently
    # must use single-row events.
    is_multi = F.col("op").isin(*MULTI_OPS)
    packed_ok = F.filter(
        F.col("rows"),
        lambda r: r.getField("conv_id").isNotNull()
        & r.getField("turn_idx").isNotNull(),
    )
    items = F.when(is_multi, packed_ok).otherwise(
        F.array(F.struct(
            F.col("conv_id").alias("conv_id"),
            F.col("turn_idx").alias("turn_idx"),
            F.col("after").alias("after"),
            F.col("cols_set").alias("cols_set"),
        ))
    )
    m = assembled.select("*", F.posexplode(items).alias("_i", "_r"))
    proj = []
    for c in assembled.columns:
        if c == "seq":
            proj.append(
                F.when(is_multi, F.col("seq") * 256 + F.col("_i"))
                .otherwise(F.col("seq")).alias("seq")
            )
        elif c == "op":
            proj.append(
                F.when(F.col("op") == "MI", F.lit("I"))
                .when(F.col("op") == "MD", F.lit("D"))
                .otherwise(F.col("op")).alias("op")
            )
        elif c in ("conv_id", "turn_idx", "after", "cols_set"):
            proj.append(F.col(f"_r.{c}").alias(c))
        elif c == "rows":
            proj.append(F.lit(None).cast(ArrayType(MULTIROW_TYPE)).alias(c))
        else:
            proj.append(F.col(c))
    return m.select(*proj)


def decode_events_multi(
    events: DataFrame,
    tables: dict[str, "object"],
    cfg: EngineConfig,
    normalize_text: bool = True,
    use_pandas_normalize: bool = False,
) -> DataFrame:
    """Multi-table decode: dictionary filter over the ROUTED table set with a
    PER-TABLE merge-key check (reference: many OWNER.NAME masks each with its
    own key override — OpenLogReplicator.cpp:593-617, Schema.cpp:430-435;
    round 1 supported exactly one target).

    ``tables``: table name -> LakeTable (its manifest key_cols are the
    table's merge key). Control ops (B/C/R/PR) pass regardless of table.
    Honors the same cfg options as the single-table path: ``schemaless``
    (skip both filters), ``trim_unchanged``, pandas-normalize escape hatch.
    """
    out = apply_start_position(events, cfg).where(F.col("op").isin(*VALID_OPS))
    if not cfg.schemaless:
        names = list(tables)
        # prune unrouted single-row AND packed multi-row DML at the scan
        # (an unrouted MI would otherwise ride the assembly shuffle only to
        # be dropped by the per-table filter after unnest)
        out = out.where(
            (~F.col("op").isin(*(DML_OPS + MULTI_OPS)))
            | F.col("table").isin(*names)
        )
        # per-table row-class filter: DML must carry that table's full key
        key_ok = F.lit(False)
        for name, t in tables.items():
            ok = F.lit(True)
            for k in t.key_cols:
                ok = ok & F.col(k).isNotNull()
            key_ok = F.when(F.col("table") == name, ok).otherwise(key_ok)
        out = out.where((~F.col("op").isin(*DML_OPS)) | key_ok)
    return _post_decode(out, cfg, normalize_text, use_pandas_normalize)


def feed_audit(events: DataFrame) -> DataFrame:
    """S1 sequence-gap audit analog: OLR checks that archived log sequences are
    contiguous (OracleAnalyzer.cpp:584-644); here we audit that scn is strictly
    increasing along (scn, seq) per source partition and report gaps > expected.
    Returns one row per (min/max/count/distinct) for monitoring.
    """
    return events.agg(
        F.min("scn").alias("scn_min"),
        F.max("scn").alias("scn_max"),
        F.count(F.lit(1)).alias("events"),
        F.countDistinct("xid").alias("txs"),
    )
