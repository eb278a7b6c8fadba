"""Deterministic synthetic change-event feed over conversation transcripts.

This is the redo/WAL analog of the reference's input: one row per change vector
(scn, xid, op, before/after images — RedoLogRecord.h:95-169 and the JSON payload
in OutputBufferJson.cpp:488-733), targeting the transcripts table
(conv_id, turn_idx, role, text, tool, ts) from BASELINE.json's input_hint.

Invariants mirrored from the redo log (FIXTURES.md §2):
  * total order by (scn, seq); scn globally unique (scn = step * n_txs + tx_id);
  * every I/U/D lies between its xid's B and its terminator C/R;
  * rollback (R) transactions are fully discarded; partial-rollback events
    (op 'PR') pop the latest not-yet-popped DML of the same xid — the analog of
    OLR opcode 5.6/5.11 retraction (TransactionBuffer.cpp:159-183);
  * U events may carry only changed columns (cols_set) — COLUMN_FORMAT_CHANGED
    trim analog (OutputBuffer.cpp:1893-1927);
  * conv_id is Zipf-skewed so a few conversations are hot (skew/salt tests);
  * a controlled fraction of DDL events drives schema evolution.

Generation is pure Spark SQL expressions over spark.range — fully parallel and
identical at any scale; determinism comes from xxhash64(seed, ...), never RNG.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

# ----------------------------------------------------------------- schemas

PAYLOAD_FIELDS = [
    ("role", StringType()),
    ("text", StringType()),
    ("tool", StringType()),
    ("ts", TimestampType()),
    ("meta", StringType()),  # appears only after the ADD COLUMN DDL event
]

IMAGE_TYPE = StructType([StructField(n, t, True) for n, t in PAYLOAD_FIELDS])

# one packed row of a multi-row (QMI/QMD) event — reference 11.11/11.12
# Quick Multi-row Insert/Delete carry nrow per-row slots in ONE redo vector
# (OpCode.cpp:631-654, unnested at OutputBuffer.cpp:1407-1522)
MULTIROW_TYPE = StructType([
    StructField("conv_id", StringType(), True),
    StructField("turn_idx", LongType(), True),
    StructField("after", IMAGE_TYPE, True),
    StructField("cols_set", ArrayType(StringType()), True),
])

CHANGE_EVENT_SCHEMA = StructType([
    StructField("scn", LongType(), False),
    StructField("seq", LongType(), False),
    StructField("xid", StringType(), False),
    StructField("op", StringType(), False),      # B C R I U D PR MI MD DDL
    StructField("table", StringType(), False),
    StructField("conv_id", StringType(), True),
    StructField("turn_idx", LongType(), True),
    StructField("before", IMAGE_TYPE, True),
    StructField("after", IMAGE_TYPE, True),
    StructField("before_cols", ArrayType(StringType()), True),
    StructField("cols_set", ArrayType(StringType()), True),  # after-image cols
    StructField("rows", ArrayType(MULTIROW_TYPE), True),     # MI/MD payload
    StructField("ddl", StringType(), True),
    StructField("ts", TimestampType(), True),
])

TRANSCRIPTS_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
    StructField("role", StringType(), True),
    StructField("text", StringType(), True),
    StructField("tool", StringType(), True),
    StructField("ts", TimestampType(), True),
])

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser"]


def _u(salt: str, *cols) -> "F.Column":
    """Deterministic uniform [0,1) from xxhash64 — the generator's only RNG."""
    h = F.xxhash64(F.lit(salt), *cols)
    return (F.pmod(h, F.lit(1_000_000)).cast("double") / 1_000_000.0)


def generate_change_events(
    spark: SparkSession,
    n_txs: int = 1000,
    n_convs: int = 100,
    turns_per_conv: int = 20,
    max_dml: int = 8,
    p_rollback: float = 0.05,
    p_partial_rollback: float = 0.05,
    p_delete: float = 0.08,
    p_insert: float = 0.35,
    p_multirow: float = 0.0,
    zipf_a: float = 3.0,
    with_ddl: bool = False,
    seed: int = 42,
    partitions: int | None = None,
    payload_chars: int = 0,
) -> DataFrame:
    """Spark-native generator: one row per change event, CHANGE_EVENT_SCHEMA."""
    s = F.lit(seed)
    tx = spark.range(0, n_txs, 1, partitions or spark.sparkContext.defaultParallelism)
    tx = tx.withColumnRenamed("id", "tx_id")

    # conversation for this tx: Zipf-ish skew via pow of a uniform
    conv_idx = F.floor(
        F.pow(_u("conv", s, F.col("tx_id")), F.lit(zipf_a)) * n_convs
    ).cast("long")
    n_dml = (F.floor(_u("ndml", s, F.col("tx_id")) * max_dml) + 1).cast("int")
    rolled = _u("roll", s, F.col("tx_id")) < F.lit(p_rollback)

    tx = tx.select(
        "tx_id",
        F.concat(F.lit("c"), conv_idx).alias("conv_id"),
        n_dml.alias("n_dml"),
        rolled.alias("rolled"),
        (F.floor(_u("stride", s, F.col("tx_id")) * 4) + 1).cast("long").alias("stride"),
        (F.col("tx_id") * (max_dml + 2) * 3).alias("tx_start"),  # interleaves txs
    )

    # explode to events: seq 0 = B, seq n_dml+1 = C/R, middle = DML/PR
    ev = tx.select(
        "*", F.posexplode(F.sequence(F.lit(0), F.col("n_dml") + 1)).alias("seq", "_i")
    ).drop("_i")
    seq = F.col("seq").cast("long")
    is_begin = seq == 0
    is_term = seq == (F.col("n_dml") + 1).cast("long")

    # scn: globally unique, per-tx increasing, interleaved across txs
    step = F.col("tx_start") + seq * F.col("stride")
    scn = (step * n_txs + F.col("tx_id")).cast("long")

    u_op = _u("op", s, F.col("tx_id"), seq)
    # PR only valid when a prior DML exists in this tx (seq >= 2)
    op = (
        F.when(is_begin, F.lit("B"))
        .when(is_term & F.col("rolled"), F.lit("R"))
        .when(is_term, F.lit("C"))
        .when((u_op < p_partial_rollback) & (seq >= 2), F.lit("PR"))
        .when(u_op < p_partial_rollback + p_delete, F.lit("D"))
        .when(u_op < p_partial_rollback + p_delete + p_insert, F.lit("I"))
        .otherwise(F.lit("U"))
    )

    turn_idx = F.floor(_u("turn", s, F.col("conv_id"), seq, F.col("tx_id")) * turns_per_conv).cast("long")
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (F.pmod(F.xxhash64(F.lit("role"), s, F.col("tx_id"), seq), F.lit(len(ROLES))) + 1).cast("int"),
    )
    tool = F.when(
        _u("hastool", s, F.col("tx_id"), seq) < 0.3,
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            (F.pmod(F.xxhash64(F.lit("tool"), s, F.col("tx_id"), seq), F.lit(len(TOOLS))) + 1).cast("int"),
        ),
    )
    text = F.concat(
        F.lit("turn "), F.col("conv_id"), F.lit("/"), turn_idx,
        F.lit(" v"), scn,
    )
    if payload_chars > 0:
        # realistic transcript-sized turn text: deterministic filler unique
        # per event (repeat of the event's own hash rendered in hex)
        filler = F.repeat(
            F.hex(F.xxhash64(F.lit("fill"), s, F.col("tx_id"), seq)),
            payload_chars // 16 + 1,
        ).substr(1, payload_chars)
        text = F.concat(text, F.lit(" "), filler)
    # scn can exceed 1e13 at large n_txs; cap the epoch offset so timestamp
    # micros stay well inside int64 (timestamp_seconds overflows otherwise)
    ets = F.timestamp_seconds(F.lit(1_700_000_000) + F.pmod(scn, F.lit(100_000_000)))

    is_dml = op.isin("I", "U", "D")
    # update trim: ~40% of U events carry only (text); I carries everything;
    # D carries nothing in the after image.
    trimmed = (op == "U") & (_u("trim", s, F.col("tx_id"), seq) < 0.4)
    all_payload = F.array(*[F.lit(n) for n, _ in PAYLOAD_FIELDS[:4]])  # no meta pre-DDL
    cols_set = (
        F.when(op == "D", F.array().cast("array<string>"))
        .when(trimmed, F.array(F.lit("text")))
        .when(is_dml, all_payload)
    )
    after = F.when(
        is_dml & (op != "D"),
        F.struct(
            F.when(~trimmed, role).alias("role"),
            text.alias("text"),
            F.when(~trimmed, tool).alias("tool"),
            F.when(~trimmed, ets).alias("ts"),
            F.lit(None).cast("string").alias("meta"),
        ),
    )
    # before image: deterministic placeholder for U/D (engines don't rely on it
    # for final state; it feeds the update-diff/trim operator + tests)
    before = F.when(
        op.isin("U", "D"),
        F.struct(
            role.alias("role"),
            F.concat(F.lit("prev "), text).alias("text"),
            tool.alias("tool"),
            ets.alias("ts"),
            F.lit(None).cast("string").alias("meta"),
        ),
    )
    before_cols = F.when(op.isin("U", "D"), all_payload).otherwise(
        F.array().cast("array<string>")
    )

    # multi-row events (QMI/QMD analog, reference 11.11/11.12): a fraction of
    # I/D events pack 2-4 rows into ONE event; decode unnests them back into
    # standard I/D events with a per-row seq sub-ordinal
    is_mi = (op == "I") & (_u("mi", s, F.col("tx_id"), seq) < F.lit(p_multirow))
    is_md = (op == "D") & (_u("md", s, F.col("tx_id"), seq) < F.lit(p_multirow))
    n_packed = (F.floor(_u("mrn", s, F.col("tx_id"), seq) * 3) + 2).cast("int")

    def _packed_row(j):
        p_turn = F.floor(
            _u("mrturn", s, F.col("conv_id"), seq, F.col("tx_id"), j)
            * turns_per_conv
        ).cast("long")
        p_text = F.concat(
            F.lit("turn "), F.col("conv_id"), F.lit("/"), p_turn,
            F.lit(" v"), scn, F.lit("."), j.cast("string"),
        )
        p_after = F.when(
            is_mi,
            F.struct(
                role.alias("role"), p_text.alias("text"), tool.alias("tool"),
                ets.alias("ts"), F.lit(None).cast("string").alias("meta"),
            ),
        )
        return F.struct(
            F.col("conv_id").alias("conv_id"),
            p_turn.alias("turn_idx"),
            p_after.alias("after"),
            F.when(is_mi, all_payload)
            .otherwise(F.array().cast("array<string>")).alias("cols_set"),
        )

    packed = F.when(
        is_mi | is_md,
        F.transform(F.sequence(F.lit(1), n_packed), _packed_row),
    ).cast(ArrayType(MULTIROW_TYPE))

    op_f = F.when(is_mi, F.lit("MI")).when(is_md, F.lit("MD")).otherwise(op)
    multi = is_mi | is_md

    # compute `rows` in its OWN projection step: inside the final select the
    # output list re-aliases "conv_id" to a when-nulled expression, and
    # Spark's lateral-column-alias resolution would rebind the packed rows'
    # F.col("conv_id") to THAT null — silently null-keying every packed row
    # (found when the keyless-row filter exposed the engine/oracle mismatch)
    ev = ev.withColumn("rows", packed)

    out = ev.select(
        scn.alias("scn"),
        seq.alias("seq"),
        F.concat(F.lit("x"), F.col("tx_id")).alias("xid"),
        op_f.alias("op"),
        F.lit("transcripts").alias("table"),
        F.when(is_dml & ~multi, F.col("conv_id")).alias("conv_id"),
        F.when(is_dml & ~multi, turn_idx).alias("turn_idx"),
        F.when(~multi, before).alias("before"),
        F.when(~multi, after).alias("after"),
        F.when(~multi, before_cols)
        .otherwise(F.array().cast("array<string>")).alias("before_cols"),
        F.when(~multi, cols_set).alias("cols_set"),
        F.col("rows"),
        F.lit(None).cast("string").alias("ddl"),
        ets.alias("ts"),
    )

    if with_ddl:
        mid = (n_txs // 2) * (max_dml + 2) * 3 * n_txs
        ddl_rows = spark.createDataFrame(
            [
                (mid, 0, "ddl-1", "DDL", "transcripts", None, None, None, None,
                 [], [], None, "ADD COLUMN meta string", None),
                (mid + 1, 0, "ddl-2", "DDL", "transcripts", None, None, None,
                 None, [], [], None, "WIDEN turn_idx bigint", None),
            ],
            CHANGE_EVENT_SCHEMA,
        )
        # post-DDL events may set `meta`
        post = out.where((F.col("scn") > mid) & F.col("op").isin("I", "U"))
        post = post.withColumn(
            "after",
            F.col("after").withField("meta", F.concat(F.lit("m"), F.col("scn"))),
        ).withColumn("cols_set", F.array_append(F.col("cols_set"), F.lit("meta")))
        out = out.where(~((F.col("scn") > mid) & F.col("op").isin("I", "U"))).unionByName(post).unionByName(ddl_rows)

    return out


def pandas_to_events_df(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Round-trip helper: a pandas slice of the feed back to a Spark DataFrame
    (nullable int columns come back as float NaN from pandas — fix dtypes)."""
    pdf = pdf.copy()
    pdf["turn_idx"] = pd.Series(
        [None if pd.isna(v) else int(v) for v in pdf["turn_idx"]],
        dtype=object,
        index=pdf.index,
    )
    pdf["scn"] = pdf["scn"].astype("int64")
    pdf["seq"] = pdf["seq"].astype("int64")
    return spark.createDataFrame(pdf, CHANGE_EVENT_SCHEMA)


# ------------------------------------------------------------------ oracle

def sequential_oracle(events: pd.DataFrame, require_begin: bool = True) -> pd.DataFrame:
    """Reference materialization: apply the feed one event at a time, in strict
    (scn, seq) order, with an interpreted transaction buffer — the semantics
    OpenLogReplicator implements in Transaction.cpp:122-392 / RedoLog.cpp:733-766.
    Deliberately slow and simple; used as the test oracle only.
    """
    events = events.sort_values(["scn", "seq"], kind="mergesort")
    payload = [n for n, _ in PAYLOAD_FIELDS]
    open_tx: dict[str, dict] = {}
    committed: list[tuple] = []  # (commit_scn, scn, seq, row dict)
    ddls: list[tuple] = []

    for r in events.itertuples(index=False):
        if r.op == "DDL":
            ddls.append((r.scn, r.ddl))
            continue
        st = open_tx.setdefault(r.xid, {"begin": False, "events": []})
        if r.op == "B":
            st["begin"] = True
        elif r.op == "PR":
            # pops ONE buffered entry — a packed MI/MD vector counts as one
            # (reference whole-record pop, TransactionBuffer.cpp:159-183)
            if st["events"]:
                st["events"].pop()
        elif r.op in ("I", "U", "D", "MI", "MD"):
            st["events"].append(r)
        elif r.op == "R":
            open_tx.pop(r.xid, None)
        elif r.op == "C":
            if (not require_begin) or st["begin"]:
                for e in st["events"]:
                    committed.append((r.scn, e.scn, e.seq, e))
            open_tx.pop(r.xid, None)

    committed.sort(key=lambda t: (t[0], t[1], t[2]))
    state: dict[tuple, dict] = {}
    # lifecycle DDL interleaves on commit_scn: a transaction with
    # commit_scn <= ddl_scn applies BEFORE the DDL (the engine slices the
    # apply identically in plans/replay.py apply_committed)
    def _life_verb(txt: str) -> str | None:
        """Verb+unit match, kept in lockstep with plans/replay._apply_ddl:
        only bare/TABLE/PARTITION TRUNCATE and bare/TABLE DROP are lifecycle
        ('DROP COLUMN x' evolves the schema, 'DROP INDEX i' is skipped)."""
        parts = (txt or "").strip().split()
        kind = parts[0].upper() if parts else ""
        unit = parts[1].upper() if len(parts) > 1 else ""
        if kind == "TRUNCATE" and unit in ("", "TABLE", "PARTITION"):
            return "TRUNCATE"
        if kind == "DROP" and unit in ("", "TABLE"):
            return "DROP"
        return None

    life_ddls = sorted(
        (scn, _life_verb(txt))
        for scn, txt in ddls
        if _life_verb(txt) is not None
    )
    dropped = False
    def _apply_one(op, key, img, cols):
        if op == "D":
            state.pop(key, None)
            return
        row = state.get(key)
        if row is None:
            row = {c: None for c in payload}
            state[key] = row
        img = img or {}
        for c in (cols or []):
            row[c] = img.get(c) if isinstance(img, dict) else img[c]

    for _cscn, _scn, _seq, e in committed:
        while life_ddls and life_ddls[0][0] < _cscn:
            _dscn, verb = life_ddls.pop(0)
            state.clear()
            dropped = dropped or (verb == "DROP")
        if dropped:
            break
        if e.op in ("MI", "MD"):
            # unnest the packed vector in slot order (D5)
            sub = "I" if e.op == "MI" else "D"
            for rr in (e.rows or []):
                _apply_one(sub, (rr["conv_id"], rr["turn_idx"]),
                           rr["after"], rr["cols_set"])
            continue
        _apply_one(e.op, (e.conv_id, e.turn_idx), e.after, e.cols_set)

    if life_ddls:  # DDL after the last commit still applies
        state.clear()

    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", *payload])
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
