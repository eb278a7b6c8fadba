"""Transaction assembly — the engine's core stateful operator.

Reference parity (what OpenLogReplicator does per transaction):
  * group change vectors by XID into an ordered buffer
    (RedoLog.cpp:768-902 appendToTransaction, TransactionBuffer.cpp:124-157);
  * begin/commit gating: flush only transactions whose begin was seen, at the
    commit vector (RedoLog.cpp:710-766); rollback discards the buffer;
  * partial rollback: opcodes 5.6/5.11 POP the latest buffered op of the same
    transaction (TransactionBuffer.cpp:159-183) — stack semantics;
  * commit-ordered emission: committed transactions replay in commit-SCN order,
    events within a transaction in insertion order (Transaction.cpp:122-392).

Two interchangeable implementations (tested equal):

  * ``assemble_transactions_sql`` — pure JVM window functions / whole-stage
    codegen. The partial-rollback stack is solved WITHOUT per-row logic via a
    prefix-sum + suffix-min trick: walking a transaction in (scn, seq) order
    with DML=+1 / PR=-1, a DML at running depth d survives iff the running sum
    never drops below d afterwards. This is also the ANSI-SQL oracle form.

  * ``assemble_transactions_pandas`` — the north-rule form: per-key state via
    ``groupBy(...).applyInPandas``. Transactions are grouped by a *salted*
    hash of xid (pmod(xxhash64(xid), G)) so thousands of transactions share
    one Arrow batch and hot groups cannot pin a task; inside the batch all
    logic is vectorized pandas/numpy (groupby transforms), never per-row
    Python. G scales with parallelism — at 1000 executors raise
    ``num_groups`` and the operator's shape is unchanged.

Both emit the committed, surviving DML events annotated with ``commit_scn``;
the apply order downstream is (commit_scn, scn) — commit order across
transactions, insertion order within (scn is per-tx increasing by feed
invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from openlogreplicator_spark.config import EngineConfig

# multi-row ops (MI/MD) count as ONE stack entry: a partial rollback pops
# the whole packed vector, exactly like the reference's per-record
# transaction-buffer pop (TransactionBuffer.cpp:159-183); they unnest only
# after assembly (operators/decode.py unnest_multirow)
DML = ("I", "U", "D", "MI", "MD")


def _flags(events: DataFrame, require_begin: bool):
    w = Window.partitionBy("xid")
    commit_scn = F.max(F.when(F.col("op") == "C", F.col("scn"))).over(w)
    has_begin = F.max(F.when(F.col("op") == "B", 1).otherwise(0)).over(w) == 1
    rolled = F.max(F.when(F.col("op") == "R", 1).otherwise(0)).over(w) == 1
    committed = commit_scn.isNotNull() & ~rolled
    if require_begin:
        committed = committed & has_begin
    # the commit event's timestamp — the transaction time the reference's
    # message header renders as tm/tms (OutputBufferJson.cpp:186-210);
    # same window as commit_scn, so it is free
    commit_ts = (
        F.max(F.when(F.col("op") == "C", F.col("ts"))).over(w)
        if "ts" in events.columns
        else F.lit(None).cast("timestamp")
    )
    return commit_scn, committed, commit_ts


def assemble_transactions_sql(
    events: DataFrame, cfg: EngineConfig, emit_open: bool = False,
    slim_join: bool = False, combined: bool = False,
) -> DataFrame:
    """Window-function assembly (JVM path). Input: decoded CHANGE_EVENT rows.

    Output: surviving DML rows of committed transactions with ``commit_scn``;
    with ``emit_open=True`` also returns rows of still-open transactions
    (no terminator yet) flagged ``is_open=true`` — the streaming pipeline
    carries those to the next microbatch (cross-batch open-transaction state,
    OLR's in-memory transaction map OracleAnalyzer.h:111-112).

    ``slim_join``: compute the verdict windows over ONLY (xid, scn, seq,
    op) and join the wide payload back by event identity afterwards (one
    hash shuffle). The default form drags every payload byte through the
    xid sort — on wide transcript rows that sort traffic is the
    bandwidth/spill bottleneck at scale (measured +23-43% assembly
    throughput from the slim form at 13M events / 8 cores, interleaved
    A/B in tools/probe_assembly_slim.py). The auto mode enables it in
    exactly the regime where the pandas slim path's broadcast re-join
    stops being available. Results are identical either way.
    """
    commit_scn, committed, commit_ts = _flags(events, cfg.require_begin)
    w_tx = Window.partitionBy("xid")
    terminated = (
        F.max(F.when(F.col("op").isin("C", "R"), 1).otherwise(0)).over(w_tx) == 1
    )

    w_ord = Window.partitionBy("xid").orderBy("scn", "seq")
    delta = (
        F.when(F.col("op") == "PR", F.lit(-1))
        .when(F.col("op").isin(*DML), F.lit(1))
        .otherwise(F.lit(0))
    )
    running = F.sum(delta).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    suffix_min = F.min(running).over(
        w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    survives = F.col("op").isin(*DML) & (suffix_min >= running)

    # slim base keeps ts (8 B/row) so the commit_ts window resolves
    base = (events.select(
        "xid", "scn", "seq", "op",
        *(["ts"] if "ts" in events.columns else [])) if slim_join
        else events)
    ann = base.select(
        "*",
        commit_scn.alias("commit_scn"),
        commit_ts.alias("commit_ts"),
        committed.alias("_committed"),
        terminated.alias("_terminated"),
        survives.alias("_survives"),
    )
    if slim_join:
        verdict = ann.where(
            F.col("_committed") & F.col("_survives")
        ).select("xid", "scn", "seq", "commit_scn", "commit_ts")
        out = (events.join(verdict, ["xid", "scn", "seq"], "inner")
               .select(*events.columns, "commit_scn", "commit_ts"))
        if not emit_open:
            return out
        open_keys = ann.where(~F.col("_terminated")).select(
            "xid", "scn", "seq")
        open_rows = (events.join(open_keys, ["xid", "scn", "seq"], "inner")
                     .select(*events.columns))
        return out, open_rows

    out = ann.where(F.col("_committed") & F.col("_survives")).drop(
        "_committed", "_terminated", "_survives"
    )
    if not emit_open:
        return out
    if combined:
        # ONE frame, committed-surviving rows flagged is_open=false and
        # still-open rows is_open=true — the streaming pipeline persists
        # this single frame instead of re-executing the assembly plan for
        # the open-rows split (round-5 review finding). Rolled-back rows
        # (terminated, not surviving) appear in neither subset, as before.
        return ann.where(
            (F.col("_committed") & F.col("_survives"))
            | ~F.col("_terminated")
        ).withColumn("is_open", ~F.col("_terminated")).drop(
            "_committed", "_terminated", "_survives")
    open_rows = ann.where(~F.col("_terminated")).drop(
        "_committed", "_terminated", "_survives", "commit_scn", "commit_ts"
    )
    return out, open_rows


def assemble_transactions_pandas(
    events: DataFrame,
    cfg: EngineConfig,
    num_groups: int | None = None,
    emit_open: bool = False,
):
    """applyInPandas assembly (north-rule path). Same semantics as the SQL
    form; per-key transaction state lives in vectorized pandas/numpy ops.

    Scale design: only the four slim verdict columns (xid, scn, seq, op) cross
    the Arrow boundary — the wide payload (before/after structs, arrays) stays
    JVM-side and is re-attached by an equi-join on the unique ``scn``. This
    keeps Python exchange bytes ~20x smaller than shipping full rows, at the
    cost of one extra shuffle of the feed (scn join) that AQE sizes freely.
    Transactions are grouped by a salted hash of xid (pmod(xxhash64(xid), G))
    so thousands of transactions share one Arrow batch and one hot transaction
    cannot pin a task; G scales with parallelism.
    """
    spark = events.sparkSession
    if num_groups is None:
        num_groups = max(
            1,
            spark.sparkContext.defaultParallelism * cfg.assembly_buckets_per_core,
        )
    require_begin = cfg.require_begin

    def verdicts(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["xid", "scn", "seq"], kind="mergesort").reset_index(
            drop=True
        )
        # factorize once: sorted input -> codes are contiguous runs
        codes, _ = pd.factorize(pdf["xid"], sort=False)
        op = pdf["op"].to_numpy()
        scn = pdf["scn"].to_numpy()
        n = len(pdf)
        ngrp = codes[-1] + 1 if n else 0
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if n else np.array([], dtype=int)

        is_c = op == "C"
        is_dml = np.isin(op, DML)
        # commit timestamp (micros since epoch; int64 min = null sentinel)
        ts_us = (pdf["ts"].astype("datetime64[us]").astype("int64")
                 .to_numpy() if "ts" in pdf.columns
                 else np.full(n, np.iinfo(np.int64).min))
        ts_us = np.where(pdf["ts"].notna().to_numpy(), ts_us,
                         np.iinfo(np.int64).min) if "ts" in pdf.columns \
            else ts_us
        # per-group reductions via reduceat over contiguous runs
        commit_ts_g = np.maximum.reduceat(
            np.where(is_c, ts_us, np.iinfo(np.int64).min), starts
        ) if n else np.array([])
        commit_g = np.maximum.reduceat(np.where(is_c, scn, -1), starts) if n else np.array([])
        begin_g = np.maximum.reduceat((op == "B").astype(np.int8), starts) if n else np.array([])
        rolled_g = np.maximum.reduceat((op == "R").astype(np.int8), starts) if n else np.array([])
        term_g = np.maximum.reduceat(np.isin(op, ("C", "R")).astype(np.int8), starts) if n else np.array([])
        committed_g = (commit_g >= 0) & (rolled_g == 0)
        if require_begin:
            committed_g &= begin_g == 1

        # partial-rollback stack via prefix-sum + suffix-min (segmented):
        # running depth resets per group; a DML survives iff the running sum
        # never drops below its own depth later in the transaction
        # (TransactionBuffer.cpp:159-183 pop semantics, vectorized)
        delta = np.where(op == "PR", -1, np.where(is_dml, 1, 0))
        csum = np.cumsum(delta)
        if n:
            lengths = np.diff(np.r_[starts, n])
            prev_end = np.r_[0, csum[starts[1:] - 1]]  # csum at prior group end
            running = csum - np.repeat(prev_end, lengths)
            # segmented suffix-min via reversed groupby cummin (C-speed)
            suffix_min = (
                pd.Series(running[::-1]).groupby(codes[::-1]).cummin()
                .to_numpy()[::-1]
            )
        else:
            running = csum
            suffix_min = csum
        survives = is_dml & (suffix_min >= running)

        committed_r = committed_g[codes] if n else np.array([], dtype=bool)
        commit_r = commit_g[codes] if n else np.array([])
        commit_ts_r = commit_ts_g[codes] if n else np.array([])
        term_r = (term_g[codes] == 1) if n else np.array([], dtype=bool)

        keep = committed_r & survives
        kept_ts = commit_ts_r[keep] if n else np.array([])
        res = pd.DataFrame({
            "scn": scn[keep],
            "commit_scn": commit_r[keep].astype("int64"),
            "commit_ts_us": pd.array(
                np.where(kept_ts == np.iinfo(np.int64).min, None, kept_ts),
                dtype="Int64"),
            "is_open": np.zeros(keep.sum(), dtype=bool),
        })
        if emit_open:
            n_open = int((~term_r).sum())
            openr = pd.DataFrame({
                "scn": scn[~term_r],
                "commit_scn": pd.array([None] * n_open, dtype="Int64"),
                "commit_ts_us": pd.array([None] * n_open, dtype="Int64"),
                "is_open": np.ones(n_open, dtype=bool),
            })
            res = pd.concat([res, openr], ignore_index=True)
        return res

    # drop null-xid rows BEFORE grouping: pd.factorize assigns code -1 to
    # nulls, which would index the LAST group's verdict (a null-xid DML would
    # silently inherit another transaction's commit). The SQL path drops them
    # too (a null-xid partition has no commit event -> not committed), so the
    # two paths stay equivalent.
    slim = events.where(F.col("xid").isNotNull()).select(
        "xid", "scn", "seq", "op",
        *(["ts"] if "ts" in events.columns else []),
        F.pmod(F.xxhash64(F.col("xid")), F.lit(num_groups)).alias("_g"),
    )
    v = slim.groupBy("_g").applyInPandas(
        verdicts,
        "scn long, commit_scn long, commit_ts_us long, is_open boolean",
    )
    res = events.join(v, on="scn", how="inner").withColumn(
        "commit_ts", F.timestamp_micros(F.col("commit_ts_us"))
    ).drop("commit_ts_us")
    if not emit_open:
        return res.where(~F.col("is_open")).drop("is_open")
    return res
