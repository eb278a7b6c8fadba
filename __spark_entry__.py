"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Every query here exercises a real engine operator (SURVEY.md §2) over the
driver's parquet tables. CDC queries run over a change feed derived
deterministically from ``events.parquet`` (openlogreplicator_spark/
feed_from_events.py) with arithmetic that is bit-identical in Spark and
DuckDB, so the oracle can replay the same semantics in ANSI SQL.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import StructType

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed_from_events import FEED_SQL, derive_feed, feed_sql
from openlogreplicator_spark.lake import LakeTable
from openlogreplicator_spark.operators.decode import feed_audit
from openlogreplicator_spark.operators.lww import net_changes
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_pandas,
    assemble_transactions_sql,
)
from openlogreplicator_spark.plans.replay import replay_batch

# ordering encoder shared by Spark queries and the SQL oracles:
# (commit_scn, scn) -> one orderable bigint. scn < 10^7 at any driver sf.
_ORD = 10_000_000

_CFG = EngineConfig()

# payload columns of the derived target (feed_from_events never sets tool/meta)
_DERIVED_TARGET = StructType.fromJson({
    "type": "struct",
    "fields": [
        {"name": "conv_id", "type": "string", "nullable": False, "metadata": {}},
        {"name": "turn_idx", "type": "long", "nullable": False, "metadata": {}},
        {"name": "role", "type": "string", "nullable": True, "metadata": {}},
        {"name": "text", "type": "string", "nullable": True, "metadata": {}},
        {"name": "tool", "type": "string", "nullable": True, "metadata": {}},
        {"name": "ts", "type": "timestamp_ntz", "nullable": True, "metadata": {}},
    ],
})


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine pipeline: derived feed -> decode -> assemble (applyInPandas)
    -> net-change -> snapshot-atomic MERGE into a fresh lake table -> read back.
    This is the strongest end-to-end check: the DuckDB oracle recomputes the
    final table state independently in SQL."""
    feed = derive_feed(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="olr_entry_tbl_")
    table = LakeTable.create(
        path, _DERIVED_TARGET, ["conv_id", "turn_idx"], num_buckets=_CFG.num_buckets
    )
    try:
        replay_batch(spark, feed, table, _CFG, batch_id=0)
        out = table.read(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("ts_str"),
        )
        # materialize the (small, per-key) result so the temp lake dir can
        # be removed instead of leaking per driver/bench invocation
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        table.drop()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end CDC replay + final-state readback on sf0.001."""
    return _replay_final_state(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------- CDC queries

def _q_feed_audit(spark, sf_dir):
    return feed_audit(derive_feed(spark, sf_dir))


def _q_assembly_sql(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    out = assemble_transactions_sql(ev, _CFG)
    return out.select("xid", "scn", "op", "commit_scn")


def _q_assembly_pandas(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    out = assemble_transactions_pandas(ev, _CFG)
    return out.select("xid", "scn", "op", "commit_scn")


def _q_net_changes(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    assembled = assemble_transactions_sql(ev, _CFG)
    nc = net_changes(assembled, ["conv_id", "turn_idx"], ["role", "text", "ts"])
    return nc.select(
        "conv_id",
        "turn_idx",
        F.col("op").alias("action"),
        "role",
        "text",
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


def _q_final_state(spark, sf_dir):
    return _replay_final_state(spark, sf_dir)


def _q_final_state_mor(spark, sf_dir):
    """Same replay contract through the merge-on-read writer: two scn-chunked
    batches (the second layers equality-delete + data deltas over the first —
    O(batch) appends, no bucket rewrite) then a compact folds the deltas.
    Oracle identical to cdc_final_state: MoR must be read-equivalent."""
    import dataclasses

    feed = derive_feed(spark, sf_dir)
    cfg = dataclasses.replace(_CFG, merge_mode="mor")
    path = tempfile.mkdtemp(prefix="olr_entry_mor_")
    table = LakeTable.create(
        path, _DERIVED_TARGET, ["conv_id", "turn_idx"],
        num_buckets=cfg.num_buckets, write_mode="mor",
    )
    try:
        mid = feed.agg(F.expr("percentile(scn, 0.5)")).first()[0]
        replay_batch(spark, feed.where(F.col("scn") <= mid), table, cfg,
                     batch_id=0)
        # cumulative second chunk: the commit-scn high-water mark dedups
        # already-applied transactions (same contract as streaming resume)
        replay_batch(spark, feed, table, cfg, batch_id=1)
        table.compact(spark)
        out = table.read(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("ts_str"),
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        table.drop()


def _q_lww_dedup(spark, sf_dir):
    """G3 window form: last committed surviving write per key wins."""
    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("commit_scn"), F.desc("scn")
    )
    last = surv.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return last.where(F.col("op") != "D").select(
        "conv_id",
        "turn_idx",
        F.col("after.role").alias("role"),
        F.col("after.text").alias("text"),
        F.date_format(F.col("after.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


def _q_commit_order(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    return surv.groupBy("xid", "commit_scn").agg(
        F.count(F.lit(1)).alias("n_dml"),
        F.min("scn").alias("first_scn"),
        F.max("scn").alias("last_scn"),
    )


def _q_update_trim(spark, sf_dir):
    """A2 changed-column detection over the raw events stream (lag diff)."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = ev.select(
        "event_id",
        "user_id",
        (F.col("value") != F.lag("value").over(w)).alias("value_changed"),
        F.lag("value").over(w).isNotNull().alias("has_prev"),
    )
    return d.where(F.col("has_prev")).select("event_id", "user_id", "value_changed")


def _q_start_scn(spark, sf_dir):
    """Start-position mode (reference scn/seq/ts/NOW start resolution,
    OpenLogReplicator.cpp:661-704): assemble from the feed's median scn.
    require_begin=False because every xid in the driver feed interleaves
    across the full scn range — a mid-stream start applies the visible tail
    of in-flight transactions (their commit is still in view)."""
    from openlogreplicator_spark.operators.decode import apply_start_position

    ev = derive_feed(spark, sf_dir)
    start = ev.agg(F.max("scn")).collect()[0][0] // 2
    cfg = EngineConfig(start_scn=int(start), require_begin=False)
    out = assemble_transactions_sql(apply_start_position(ev, cfg), cfg)
    return out.select("xid", "scn", "op", "commit_scn")


def _q_multi_table(spark, sf_dir):
    """Multi-table routing: one feed carrying two targets (table routed by
    scn parity for DML); each target merges with its own watermark, then the
    final states are unioned with a table tag."""
    from openlogreplicator_spark.plans.replay import replay_batch_multi

    ev = derive_feed(spark, sf_dir)
    is_dml = F.col("op").isin("I", "U", "D")
    ev = ev.withColumn(
        "table",
        F.when(~is_dml, F.lit("transcripts")).otherwise(
            F.when(F.col("scn") % 2 == 0, F.lit("transcripts"))
            .otherwise(F.lit("notes"))
        ),
    )
    tables = {}
    for name in ("transcripts", "notes"):
        path = tempfile.mkdtemp(prefix=f"olr_multi_{name}_")
        tables[name] = LakeTable.create(
            path, _DERIVED_TARGET, ["conv_id", "turn_idx"],
            num_buckets=_CFG.num_buckets,
        )
    try:
        replay_batch_multi(spark, ev, tables, _CFG, batch_id=0)
        parts = []
        for name, t in tables.items():
            parts.append(t.read(spark).select(
                F.lit(name).alias("tbl"), "conv_id", "turn_idx", "role",
                "text",
                F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("ts_str"),
            ))
        out = parts[0].unionByName(parts[1])
        # materialize so the temp lake dirs can be removed, not leaked
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        for t in tables.values():
            t.drop()


def _q_before_trim(spark, sf_dir):
    """D3 before-image trim through the real operator: synthesize before
    images over the derived feed (text equal iff scn%4==1, role/ts always
    equal) and emit each U event's post-trim cols_set. The oracle predicts
    the surviving set per row with the same arithmetic."""
    from openlogreplicator_spark.operators.decode import before_image_trim

    ev = derive_feed(spark, sf_dir).where(F.col("op") == "U")
    prev_text = F.when(
        F.col("scn") % 4 == 1, F.col("after.text")
    ).otherwise(F.concat(F.lit("v"), (F.col("scn") - 1).cast("string")))
    ev = ev.withColumn(
        "before",
        F.struct(
            F.col("after.role").alias("role"),
            prev_text.alias("text"),
            F.col("after.tool").alias("tool"),
            F.col("after.ts").alias("ts"),
            F.col("after.meta").alias("meta"),
        ),
    ).withColumn(
        "before_cols",
        F.array(F.lit("role"), F.lit("text"), F.lit("tool"), F.lit("ts")),
    )
    out = before_image_trim(ev)
    return out.select(
        "scn",
        F.concat_ws(",", F.array_sort("cols_set")).alias("cols_eff"),
    )


def _q_json_stream(spark, sf_dir):
    """O1 oracle check: serialize per-transaction JSON messages
    (sinks/json_stream.py change_stream_messages — the reference's
    "message":1 mode, OutputBuffer.cpp:891-953), then PARSE THE JSON TEXT
    BACK and emit relational facts from it: op codes in (scn, seq) order,
    the key sequence, and the text payload sequence. The DuckDB oracle
    reconstructs the same facts from `surv` relationally — so a serializer
    bug (wrong order, dropped op, mangled field) breaks the match."""
    from openlogreplicator_spark.sinks.json_stream import change_stream_messages

    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    msgs = change_stream_messages(surv, _CFG)
    payload_schema = (
        "scn bigint, xid string, payload array<struct<"
        "op:string, key:struct<conv_id:string,turn_idx:bigint>, "
        "after:struct<text:string>>>"
    )
    p = msgs.select(F.from_json("value", payload_schema).alias("m"))
    pay = F.col("m.payload")
    return p.select(
        F.col("m.scn").alias("commit_scn"),
        F.col("m.xid").alias("xid"),
        F.size(pay).cast("long").alias("n_ops"),
        F.concat_ws("", F.transform(pay, lambda o: o["op"])).alias("ops_codes"),
        F.concat_ws(",", F.transform(
            pay,
            lambda o: F.concat_ws(":", o["key"]["conv_id"],
                                  o["key"]["turn_idx"].cast("string")),
        )).alias("keys_str"),
        F.concat_ws("|", F.transform(
            pay, lambda o: F.coalesce(o["after"]["text"], F.lit("")),
        )).alias("texts"),
    )


def _q_json_brackets(spark, sf_dir):
    """O1 SHORT-mode bracket stream (round 4, OutputBufferJson.cpp
    processBegin/processCommit): every transaction streams as a begin
    message, per-op messages, and a commit message. The query parses the
    RENDERED JSON back and emits per-tx facts — message count, bracket op
    names, the begin header's scn, a count of per-op messages that leaked
    a header scn (must be 0: headers are first-message-only by default),
    and the op/key/text sequences. The oracle predicts all of it from
    `surv` relationally."""
    from openlogreplicator_spark.sinks import change_stream_brackets

    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    msgs = change_stream_brackets(surv, _CFG)
    sch = ("scn bigint, xid string, payload array<struct<"
           "op:string, key:struct<conv_id:string,turn_idx:bigint>, "
           "after:struct<text:string>>>")
    p = msgs.select(
        "commit_scn", "xid", "kind", "scn", "seq",
        F.from_json("value", sch).alias("m"),
    )
    e0 = F.col("m.payload").getItem(0)
    op_entry = F.when(F.col("kind") == 1,
                      F.struct(F.col("scn"), F.col("seq"), e0.alias("e")))
    per_tx = p.groupBy("commit_scn", "xid").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.max(F.when(F.col("kind") == 0, e0["op"])).alias("first_op"),
        F.max(F.when(F.col("kind") == 2, e0["op"])).alias("last_op"),
        F.max(F.when(F.col("kind") == 0, F.col("m.scn"))).alias("begin_scn"),
        F.sum(F.when((F.col("kind") == 1) & F.col("m.scn").isNotNull(), 1)
              .otherwise(0)).alias("hdr_leaks"),
        F.array_sort(F.collect_list(op_entry)).alias("seq_ops"),
    )
    o = lambda x: x["e"]  # noqa: E731
    return per_tx.select(
        "commit_scn", "xid",
        (F.col("n_msgs") - 2).alias("n_ops"),
        "first_op", "last_op", "begin_scn", "hdr_leaks",
        F.concat_ws("", F.transform(F.col("seq_ops"),
                                    lambda x: o(x)["op"])).alias("ops_codes"),
        F.concat_ws(",", F.transform(
            F.col("seq_ops"),
            lambda x: F.concat_ws(":", o(x)["key"]["conv_id"],
                                  o(x)["key"]["turn_idx"].cast("string")),
        )).alias("keys_str"),
        F.concat_ws("|", F.transform(
            F.col("seq_ops"),
            lambda x: F.when(o(x)["op"] == "d", F.lit(""))
            .otherwise(F.coalesce(o(x)["after"]["text"], F.lit(""))),
        )).alias("texts"),
    )


def _q_protobuf_stream(spark, sf_dir):
    """O2 oracle check (the JSON sink graduated the same way in round 3):
    serialize per-transaction PROTOBUF messages against the reference's
    field numbers (sinks/protobuf_stream.py, OraProtoBuf.proto:118-152),
    DECODE THE BYTES BACK with the consumer-side reference decoder
    (decoded_ops verifies the BEGIN..COMMIT bracketing too), and emit the
    same relational facts as cdc_json_stream: op codes in (scn, seq)
    order, the key sequence, and the text payload sequence per
    transaction. The DuckDB oracle reconstructs them from `surv` — an
    encoder bug (wrong field number, oneof presence, dropped op, order)
    breaks the match."""
    from openlogreplicator_spark.sinks.protobuf_stream import (
        decoded_ops,
        protobuf_stream_messages,
    )

    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    ops = decoded_ops(protobuf_stream_messages(surv, _CFG))
    per_tx = ops.groupBy("commit_scn", "xid").agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.array_sort(F.collect_list(F.struct(
            F.col("pos"), F.struct("op", "conv_id", "turn_idx", "text")
            .alias("o")))).alias("seq"),
    )
    o = lambda x: x["o"]  # noqa: E731
    return per_tx.select(
        "commit_scn", "xid", "n_ops",
        F.concat_ws("", F.transform(
            F.col("seq"),
            lambda x: F.when(o(x)["op"] == "I", "c")
            .when(o(x)["op"] == "U", "u").otherwise("d"),
        )).alias("ops_codes"),
        F.concat_ws(",", F.transform(
            F.col("seq"),
            lambda x: F.concat_ws(":", o(x)["conv_id"],
                                  o(x)["turn_idx"].cast("string")),
        )).alias("keys_str"),
        F.concat_ws("|", F.transform(
            F.col("seq"),
            lambda x: F.when(o(x)["op"] == "D", F.lit(""))
            .otherwise(F.coalesce(o(x)["text"], F.lit(""))),
        )).alias("texts"),
    )


def _q_scd2(spark, sf_dir):
    """SCD Type-2 history: every committed I/U becomes a version row with
    the key's full reconstructed state and a [valid_from, valid_to) ordinal
    range; deletes close versions; values never leak across a delete
    (operators/scd2.py). The oracle rebuilds the same history with window
    functions over `surv`."""
    from openlogreplicator_spark.operators.scd2 import scd2_history

    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    # default ordinal = the guarded rank-packed packed_version_ord()
    hist = scd2_history(surv, ["conv_id", "turn_idx"], ["role", "text", "ts"])
    return hist.select(
        "conv_id", "turn_idx", "role", "text",
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("ts_str"),
        "valid_from", "valid_to", "is_current",
    )


def _q_conv_rollup(spark, sf_dir):
    """Transcripts payload rollup: reconstruct whole conversations (ordered
    turn sequence -> one row per conv_id) from the replayed per-turn state
    (functions/transcripts.py) — the inverse of the CDC decomposition."""
    from openlogreplicator_spark.functions.transcripts import (
        reconstruct_conversations,
    )

    ev = derive_feed(spark, sf_dir)
    assembled = assemble_transactions_sql(ev, _CFG)
    nc = net_changes(assembled, ["conv_id", "turn_idx"], ["role", "text", "ts"])
    state = nc.where(F.col("op") != "D").select(
        "conv_id", "turn_idx", "role", "text"
    )
    return reconstruct_conversations(state, sep="|")


def _q_table_changes(spark, sf_dir):
    """Snapshot-diff changelog (plans/changes.py — Iceberg changelog-scan
    analog): replay the feed as two transaction-atomic batches (split by
    terminator scn), then diff the two snapshots. Only buckets whose file
    sets differ are read (manifest-level pruning). Oracle: final state over
    commits <= mid vs over all commits, full-outer joined and classified
    I/U/D with null-safe comparison."""
    from openlogreplicator_spark.plans.changes import table_changes

    feed = derive_feed(spark, sf_dir)
    mid = feed.agg(F.max("scn")).first()[0] // 2
    term = F.max("scn").over(Window.partitionBy("xid"))
    tagged = feed.withColumn("_term", term)
    b0 = tagged.where(F.col("_term") <= mid).drop("_term")
    b1 = tagged.where(F.col("_term") > mid).drop("_term")
    path = tempfile.mkdtemp(prefix="olr_chg_tbl_")
    table = LakeTable.create(
        path, _DERIVED_TARGET, ["conv_id", "turn_idx"],
        num_buckets=_CFG.num_buckets,
    )
    try:
        replay_batch(spark, b0, table, _CFG, batch_id=0)
        v0 = table.current_version()
        replay_batch(spark, b1, table, _CFG, batch_id=1)
        v1 = table.current_version()
        out = table_changes(spark, table, v0, v1).select(
            "conv_id", "turn_idx", "change", "role", "text",
            F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("ts_str"),
            "prev_role", "prev_text",
            F.date_format(F.col("prev_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("prev_ts_str"),
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        table.drop()


def _q_multirow_unnest(spark, sf_dir):
    """D5 multi-row unnest analog: explode word arrays into per-word rows."""
    docs = _tbl(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------- free-operator analytics

def _q_pricing_summary(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.lit(1)).alias("count_order"),
    )


def _q_nation_orders(spark, sf_dir):
    cust = _tbl(spark, sf_dir, "customer")
    nat = _tbl(spark, sf_dir, "nation")
    orders = _tbl(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.countDistinct("o_custkey").alias("num_customers"),
        )
    )


def _q_quantiles(spark, sf_dir):
    """Exact grouped quantiles (Spark `percentile`, linear interpolation at
    rank p*(n-1)) — the profiling primitive a corpus-stats pass needs; the
    oracle is DuckDB's quantile_cont with the same interpolation rule. At
    scale the approximate form is `approx_percentile` (KLL sketch,
    mergeable map-side) — exact here so the cross-engine check is tight."""
    li = _tbl(spark, sf_dir, "lineitem")
    q = F.percentile(F.col("l_extendedprice"), F.array(
        F.lit(0.25), F.lit(0.5), F.lit(0.75)
    ))
    return li.groupBy("l_returnflag").agg(
        F.round(q[0], 6).alias("p25"),
        F.round(q[1], 6).alias("p50"),
        F.round(q[2], 6).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


def _q_top_orders(spark, sf_dir):
    orders = _tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_feed_audit": _q_feed_audit,
        "cdc_assembly": _q_assembly_sql,
        "cdc_assembly_pandas": _q_assembly_pandas,
        "cdc_net_changes": _q_net_changes,
        "cdc_final_state": _q_final_state,
        "cdc_final_state_mor": _q_final_state_mor,
        # cdc_lww_dedup (the G3 window form) is NOT a registry row: it proves
        # the same replay contract as cdc_final_state through a second plan,
        # so it is pinned by tests/test_entry_contract.py::
        # test_lww_dedup_matches_oracle instead — the driver's
        # oracle budget is 50 rows and a 51st registration silently drops the
        # last key from CORRECTNESS (round-4 verdict item 2).
        "cdc_commit_order": _q_commit_order,
        "cdc_start_scn": _q_start_scn,
        "cdc_multi_table": _q_multi_table,
        "cdc_before_trim": _q_before_trim,
        "cdc_update_trim": _q_update_trim,
        "cdc_json_stream": _q_json_stream,
        "cdc_json_brackets": _q_json_brackets,
        "cdc_protobuf_stream": _q_protobuf_stream,
        "cdc_multirow_unnest": _q_multirow_unnest,
        "cdc_scd2": _q_scd2,
        "cdc_conv_rollup": _q_conv_rollup,
        "cdc_table_changes": _q_table_changes,
        "agg_pricing_summary": _q_pricing_summary,
        "join_nation_orders": _q_nation_orders,
        "window_top_orders": _q_top_orders,
        "agg_quantiles": _q_quantiles,
        **_TRAINING_QUERIES,
    }


# -------------------------------------------------------------- oracle SQL

_ASSEMBLY_SQL = FEED_SQL + """
SELECT xid, scn, op, commit_scn FROM surv
"""

# per-key final state: per column, last set value after the last delete
_FINAL_STATE_SQL = FEED_SQL + f""",
acts AS (
  SELECT conv_id, turn_idx, op,
         commit_scn * {_ORD} + scn AS ord,
         CASE WHEN NOT trimmed THEN event_type END AS role_v,
         text_v,
         CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_v,
         NOT trimmed AS sets_role,
         op IN ('I','U') AS sets_text,
         NOT trimmed AS sets_ts
  FROM surv
), per_key AS (
  SELECT conv_id, turn_idx,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord,
    arg_max(ts_v, CASE WHEN op <> 'D' AND sets_ts AND ts_v IS NOT NULL
                       THEN ord END) AS ts_last,
    MAX(CASE WHEN op <> 'D' AND sets_ts THEN ord END) AS ts_ord
  FROM acts
  GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  CASE WHEN role_ord > del_ord THEN role_last END AS role,
  CASE WHEN text_ord > del_ord THEN text_last END AS text,
  CASE WHEN ts_ord > del_ord THEN ts_last END AS ts_str
FROM per_key
WHERE w_ord IS NOT NULL AND w_ord > del_ord
"""

_NET_CHANGES_SQL = FEED_SQL + f""",
acts AS (
  SELECT conv_id, turn_idx, op,
         commit_scn * {_ORD} + scn AS ord,
         CASE WHEN NOT trimmed THEN event_type END AS role_v,
         text_v,
         CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_v,
         NOT trimmed AS sets_role,
         op IN ('I','U') AS sets_text,
         NOT trimmed AS sets_ts
  FROM surv
), per_key AS (
  SELECT conv_id, turn_idx,
    MAX(CASE WHEN op = 'D' THEN ord END) AS del_ord_n,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord,
    arg_max(ts_v, CASE WHEN op <> 'D' AND sets_ts AND ts_v IS NOT NULL
                       THEN ord END) AS ts_last,
    MAX(CASE WHEN op <> 'D' AND sets_ts THEN ord END) AS ts_ord
  FROM acts
  GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  CASE WHEN w_ord IS NULL OR w_ord < del_ord THEN 'D'
       WHEN del_ord_n IS NOT NULL THEN 'RP'
       ELSE 'U' END AS action,
  CASE WHEN role_ord > del_ord THEN role_last END AS role,
  CASE WHEN text_ord > del_ord THEN text_last END AS text,
  CASE WHEN ts_ord > del_ord THEN ts_last END AS ts_str
FROM per_key
"""

# multi-table final state: same per-column LWW as _FINAL_STATE_SQL, but
# routed by scn parity (the driver query's table assignment) and grouped by
# (tbl, key) — each target evolves independently.
_MULTI_TABLE_SQL = FEED_SQL + f""",
acts AS (
  SELECT CASE WHEN scn % 2 = 0 THEN 'transcripts' ELSE 'notes' END AS tbl,
         conv_id, turn_idx, op,
         commit_scn * {_ORD} + scn AS ord,
         CASE WHEN NOT trimmed THEN event_type END AS role_v,
         text_v,
         CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_v,
         NOT trimmed AS sets_role,
         op IN ('I','U') AS sets_text,
         NOT trimmed AS sets_ts
  FROM surv
), per_key AS (
  SELECT tbl, conv_id, turn_idx,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord,
    arg_max(ts_v, CASE WHEN op <> 'D' AND sets_ts AND ts_v IS NOT NULL
                       THEN ord END) AS ts_last,
    MAX(CASE WHEN op <> 'D' AND sets_ts THEN ord END) AS ts_ord
  FROM acts
  GROUP BY tbl, conv_id, turn_idx
)
SELECT tbl, conv_id, turn_idx,
  CASE WHEN role_ord > del_ord THEN role_last END AS role,
  CASE WHEN text_ord > del_ord THEN text_last END AS text,
  CASE WHEN ts_ord > del_ord THEN ts_last END AS ts_str
FROM per_key
WHERE w_ord IS NOT NULL AND w_ord > del_ord
"""

# SCD2 version history: every surviving I/U is a version row carrying the
# key's carried state (per-epoch last-set per column — update trim carries
# values forward, a delete ends the epoch so nothing leaks across it), with
# [valid_from, valid_to) ordinal ranges (valid_to = next event of ANY op).
# the ordinal mirrors the engine's guarded default (packed_version_ord):
# commit_scn-major, intra-transaction (scn, seq)-rank minor — rank-packed so
# unbounded global scns can't invert commit order (round-3 verdict item 1)
_SCD2_SQL = FEED_SQL + f""",
acts AS (
  SELECT conv_id, turn_idx, op,
         commit_scn * {1 << 20} + (ROW_NUMBER() OVER (
           PARTITION BY xid, commit_scn ORDER BY scn, seq) - 1) AS ord,
         CASE WHEN op IN ('I','U') AND NOT trimmed THEN event_type END AS role_v,
         CASE WHEN op IN ('I','U') THEN text_v END AS set_text_v,
         CASE WHEN op IN ('I','U') AND NOT trimmed
              THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_v
  FROM surv
), e AS (
  SELECT *,
    COUNT(CASE WHEN op = 'D' THEN 1 END) OVER
      (PARTITION BY conv_id, turn_idx ORDER BY ord
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS epoch,
    LEAD(ord) OVER (PARTITION BY conv_id, turn_idx ORDER BY ord) AS valid_to
  FROM acts
), st AS (
  SELECT conv_id, turn_idx, op, ord, valid_to,
    last_value(role_v IGNORE NULLS) OVER wep AS role,
    last_value(set_text_v IGNORE NULLS) OVER wep AS text,
    last_value(ts_v IGNORE NULLS) OVER wep AS ts_str
  FROM e
  WINDOW wep AS (PARTITION BY conv_id, turn_idx, epoch ORDER BY ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT conv_id, turn_idx, role, text, ts_str,
       ord AS valid_from, valid_to, (valid_to IS NULL) AS is_current
FROM st WHERE op <> 'D'
"""

# snapshot-diff changelog: final state over commits <= mid (what the first
# transaction-atomic batch leaves) vs over all commits, full-outer joined
# and classified I/U/D with null-safe (IS DISTINCT FROM) comparison
_TABLE_CHANGES_SQL = FEED_SQL + f""",
acts AS (
  SELECT conv_id, turn_idx, op, commit_scn,
         commit_scn * {_ORD} + scn AS ord,
         CASE WHEN NOT trimmed THEN event_type END AS role_v,
         text_v,
         CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_v,
         NOT trimmed AS sets_role,
         op IN ('I','U') AS sets_text,
         NOT trimmed AS sets_ts
  FROM surv
), pk0 AS (
  SELECT conv_id, turn_idx,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord,
    arg_max(ts_v, CASE WHEN op <> 'D' AND sets_ts AND ts_v IS NOT NULL
                       THEN ord END) AS ts_last,
    MAX(CASE WHEN op <> 'D' AND sets_ts THEN ord END) AS ts_ord
  FROM acts WHERE commit_scn <= (SELECT MAX(event_id) // 2 FROM events)
  GROUP BY conv_id, turn_idx
), pk1 AS (
  SELECT conv_id, turn_idx,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord,
    arg_max(ts_v, CASE WHEN op <> 'D' AND sets_ts AND ts_v IS NOT NULL
                       THEN ord END) AS ts_last,
    MAX(CASE WHEN op <> 'D' AND sets_ts THEN ord END) AS ts_ord
  FROM acts GROUP BY conv_id, turn_idx
), s0 AS (
  SELECT conv_id, turn_idx,
    CASE WHEN role_ord > del_ord THEN role_last END AS role,
    CASE WHEN text_ord > del_ord THEN text_last END AS text,
    CASE WHEN ts_ord > del_ord THEN ts_last END AS ts_str
  FROM pk0 WHERE w_ord IS NOT NULL AND w_ord > del_ord
), s1 AS (
  SELECT conv_id, turn_idx,
    CASE WHEN role_ord > del_ord THEN role_last END AS role,
    CASE WHEN text_ord > del_ord THEN text_last END AS text,
    CASE WHEN ts_ord > del_ord THEN ts_last END AS ts_str
  FROM pk1 WHERE w_ord IS NOT NULL AND w_ord > del_ord
), diff AS (
  SELECT
    COALESCE(s1.conv_id, s0.conv_id) AS conv_id,
    COALESCE(s1.turn_idx, s0.turn_idx) AS turn_idx,
    CASE WHEN s0.conv_id IS NULL THEN 'I'
         WHEN s1.conv_id IS NULL THEN 'D'
         WHEN (s0.role IS DISTINCT FROM s1.role)
           OR (s0.text IS DISTINCT FROM s1.text)
           OR (s0.ts_str IS DISTINCT FROM s1.ts_str) THEN 'U'
    END AS change,
    s1.role AS role, s1.text AS text, s1.ts_str AS ts_str,
    s0.role AS prev_role, s0.text AS prev_text, s0.ts_str AS prev_ts_str
  FROM s0 FULL JOIN s1
    ON s0.conv_id = s1.conv_id AND s0.turn_idx = s1.turn_idx
)
SELECT * FROM diff WHERE change IS NOT NULL
"""

# conversation rollup over the final state (same state CTEs as
# _FINAL_STATE_SQL, then an ordered string_agg per conversation)
_CONV_ROLLUP_SQL = FEED_SQL + f""",
acts AS (
  SELECT conv_id, turn_idx, op,
         commit_scn * {_ORD} + scn AS ord,
         CASE WHEN NOT trimmed THEN event_type END AS role_v,
         text_v,
         NOT trimmed AS sets_role,
         op IN ('I','U') AS sets_text
  FROM surv
), per_key AS (
  SELECT conv_id, turn_idx,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord
  FROM acts
  GROUP BY conv_id, turn_idx
), state AS (
  SELECT conv_id, turn_idx,
    CASE WHEN role_ord > del_ord THEN role_last END AS role,
    CASE WHEN text_ord > del_ord THEN text_last END AS text
  FROM per_key
  WHERE w_ord IS NOT NULL AND w_ord > del_ord
)
SELECT conv_id, COUNT(*) AS n_turns,
  MIN(turn_idx) AS first_turn, MAX(turn_idx) AS last_turn,
  string_agg(COALESCE(role, ''), ',' ORDER BY turn_idx) AS roles,
  string_agg(COALESCE(text, ''), '|' ORDER BY turn_idx) AS full_text,
  CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS n_chars
FROM state GROUP BY conv_id
"""


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_feed_audit": FEED_SQL + """
            SELECT MIN(scn) AS scn_min, MAX(scn) AS scn_max,
                   COUNT(*) AS events, COUNT(DISTINCT xid) AS txs
            FROM keyed
        """,
        "cdc_assembly": _ASSEMBLY_SQL,
        "cdc_assembly_pandas": _ASSEMBLY_SQL,
        "cdc_net_changes": _NET_CHANGES_SQL,
        "cdc_final_state": _FINAL_STATE_SQL,
        "cdc_final_state_mor": _FINAL_STATE_SQL,
        "cdc_commit_order": FEED_SQL + """
            SELECT xid, commit_scn, COUNT(*) AS n_dml,
                   MIN(scn) AS first_scn, MAX(scn) AS last_scn
            FROM surv GROUP BY xid, commit_scn
        """,
        "cdc_start_scn": feed_sql(
            "scn >= (SELECT MAX(event_id)//2 FROM events)",
            require_begin=False,
        ) + """
            SELECT xid, scn, op, commit_scn FROM surv
        """,
        "cdc_multi_table": _MULTI_TABLE_SQL,
        # before-trim prediction: role/ts before==after (always dropped),
        # text equal iff scn%4==1; trimmed U events carry only text to begin
        # with, so the surviving set is 'text' or '' either way
        "cdc_before_trim": FEED_SQL + """
            SELECT scn,
                   CASE WHEN scn % 4 = 1 THEN '' ELSE 'text' END AS cols_eff
            FROM keyed WHERE op = 'U'
        """,
        "cdc_update_trim": """
            SELECT event_id, user_id, value <> prev AS value_changed
            FROM (
              SELECT event_id, user_id, value,
                     LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
              FROM events
            ) WHERE prev IS NOT NULL
        """,
        "cdc_json_stream": FEED_SQL + """
            SELECT commit_scn, xid,
                   CAST(COUNT(*) AS BIGINT) AS n_ops,
                   string_agg(CASE op WHEN 'I' THEN 'c' WHEN 'U' THEN 'u'
                              ELSE 'd' END, '' ORDER BY scn, seq) AS ops_codes,
                   string_agg(conv_id || ':' || CAST(turn_idx AS VARCHAR),
                              ',' ORDER BY scn, seq) AS keys_str,
                   string_agg(CASE WHEN op = 'D' THEN '' ELSE text_v END,
                              '|' ORDER BY scn, seq) AS texts
            FROM surv GROUP BY xid, commit_scn
        """,
        # bracket-stream facts predicted relationally: 2 bracket messages +
        # one per op, ordered op/key/text sequences, begin header carries
        # the commit scn, zero header leaks on op messages
        "cdc_json_brackets": FEED_SQL + """
            SELECT commit_scn, xid,
                   CAST(COUNT(*) AS BIGINT) AS n_ops,
                   'begin' AS first_op, 'commit' AS last_op,
                   commit_scn AS begin_scn,
                   CAST(0 AS BIGINT) AS hdr_leaks,
                   string_agg(CASE op WHEN 'I' THEN 'c' WHEN 'U' THEN 'u'
                              ELSE 'd' END, '' ORDER BY scn, seq) AS ops_codes,
                   string_agg(conv_id || ':' || CAST(turn_idx AS VARCHAR),
                              ',' ORDER BY scn, seq) AS keys_str,
                   string_agg(CASE WHEN op = 'D' THEN '' ELSE text_v END,
                              '|' ORDER BY scn, seq) AS texts
            FROM surv GROUP BY xid, commit_scn
        """,
        # same relational facts as the JSON row — the protobuf query decodes
        # its own wire bytes back before comparing
        "cdc_protobuf_stream": FEED_SQL + """
            SELECT commit_scn, xid,
                   CAST(COUNT(*) AS BIGINT) AS n_ops,
                   string_agg(CASE op WHEN 'I' THEN 'c' WHEN 'U' THEN 'u'
                              ELSE 'd' END, '' ORDER BY scn, seq) AS ops_codes,
                   string_agg(conv_id || ':' || CAST(turn_idx AS VARCHAR),
                              ',' ORDER BY scn, seq) AS keys_str,
                   string_agg(CASE WHEN op = 'D' THEN '' ELSE text_v END,
                              '|' ORDER BY scn, seq) AS texts
            FROM surv GROUP BY xid, commit_scn
        """,
        "cdc_scd2": _SCD2_SQL,
        "cdc_conv_rollup": _CONV_ROLLUP_SQL,
        "cdc_table_changes": _TABLE_CHANGES_SQL,
        "cdc_multirow_unnest": """
            SELECT doc_id, word, COUNT(*) AS cnt FROM (
              SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
              FROM documents WHERE doc_id < 50
            ) GROUP BY doc_id, word
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(SUM(FLOOR(l_extendedprice * 100 + 0.5)) AS BIGINT)
                     AS revenue_cents,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_nation_orders": """
            SELECT n_name, COUNT(*) AS num_orders,
                   COUNT(DISTINCT o_custkey) AS num_customers
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "agg_quantiles": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
                   ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
                   ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "window_top_orders": """
            SELECT o_custkey, o_orderkey, CAST(rnk AS INT) AS rnk FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
              FROM orders
            ) WHERE rnk <= 3
        """,
        **_TRAINING_ORACLES,
    }


# ------------------------------------------------- training-data pipeline ops

from openlogreplicator_spark.functions import dedup as D
from openlogreplicator_spark.functions import similarity as S
from openlogreplicator_spark.functions import textstats as T
from openlogreplicator_spark.functions import multimodal as M
from openlogreplicator_spark.functions import sampling as SA
from openlogreplicator_spark.functions import temporal as TP


def _q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_tbl(spark, sf_dir, "documents"))


def _q_dedup_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_tbl(spark, sf_dir, "documents"), threshold_pct=60)


def _q_dedup_minhash_sig(spark, sf_dir):
    docs = _tbl(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return D.minhash_signatures(docs, k=32)


def _q_dedup_lsh_pairs(spark, sf_dir):
    return D.lsh_candidate_pairs(_tbl(spark, sf_dir, "documents"), k=32, band_rows=4)


def _q_dedup_simhash(spark, sf_dir):
    return D.simhash(_tbl(spark, sf_dir, "documents"), bits=32)


def _q_dedup_simhash_neardup(spark, sf_dir):
    """Banded-prefix Hamming join at radius 3 (complete by pigeonhole with
    4 bands); the oracle verifies with an all-pairs popcount at sf scale."""
    return D.simhash_neardup_pairs(
        _tbl(spark, sf_dir, "documents"), bits=32, radius=3, bands=4
    )


def _q_ann_topk_dot(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    return S.topk_dot_quantized(emb, emb.where(F.col("vec_id") < 5), k=5)


def _q_ann_ivf_topk(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    return S.topk_ivf(emb, emb.where(F.col("vec_id") < 5), k=5)


def _q_ann_cosine_topk(spark, sf_dir):
    # Spark F.aggregate is a strict left fold in index order; the DuckDB
    # oracle mirrors it with list_reduce (also a sequential left fold), so the
    # IEEE-double cosine is bit-exact on both sides.
    emb = _tbl(spark, sf_dir, "embeddings")
    return S.topk_cosine(emb, emb.where(F.col("vec_id") < 5), k=5)


def _q_dedup_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs at cos >= 0.40, decided with the
    integer-rational comparison (no floats) so the oracle is bit-exact.
    At corpus scale this exact verifier runs on sign-LSH candidates
    (dedup.embedding_neardup_lsh_candidates), not all pairs."""
    return D.embedding_neardup_pairs(
        _tbl(spark, sf_dir, "embeddings"), threshold_pct=40
    )


def _q_dedup_embed_lsh(spark, sf_dir):
    """Sign-LSH candidate pairs — the 100 TB candidate-generation path the
    exact verifier above (dedup_embed_neardup) is scoped to run on. The
    hyperplanes are a deterministic +-1 pattern of (plane, dim), so the
    banded self-join is reproducible in ANSI SQL bit-for-bit."""
    return D.embedding_neardup_lsh_candidates(
        _tbl(spark, sf_dir, "embeddings"), n_planes=16, band_bits=4
    )


def _q_text_token_count(spark, sf_dir):
    return T.token_count(_tbl(spark, sf_dir, "documents"))


def _q_text_quality(spark, sf_dir):
    return T.quality_stats(_tbl(spark, sf_dir, "documents"))


def _q_text_lang_id(spark, sf_dir):
    return T.lang_id(_tbl(spark, sf_dir, "documents"))


def _q_doc_fingerprint(spark, sf_dir):
    return T.fingerprint(_tbl(spark, sf_dir, "documents"))


def _q_text_pii_redact(spark, sf_dir):
    """Map-only PII scrub (email/SSN/IPv4/phone) with per-class counts —
    the pre-training hygiene pass; RE2-and-Java-compatible patterns make
    the DuckDB oracle exact."""
    from openlogreplicator_spark.functions.cleaning import redact_pii

    return redact_pii(_tbl(spark, sf_dir, "documents"))


def _q_text_repetition(spark, sf_dir):
    """Duplicate-3-gram load per doc (Gopher repetition filter inputs)."""
    from openlogreplicator_spark.functions.cleaning import repetition_stats

    return repetition_stats(_tbl(spark, sf_dir, "documents"))


def _q_text_contamination(spark, sf_dir):
    """Benchmark decontamination: shingle overlap vs an eval set (stood in
    by the doc_id % 17 == 0 slice, self-matches included deliberately —
    the op is corpus-vs-benchmark, not self-join)."""
    from openlogreplicator_spark.functions.cleaning import contamination_stats

    docs = _tbl(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    return contamination_stats(docs, bench)


def _q_winnow_fp(spark, sf_dir):
    docs = _tbl(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return T.winnow_fingerprints(docs, k=5, window=4)


def _q_multimodal_meta(spark, sf_dir):
    media = M.attach_binary_payload(_tbl(spark, sf_dir, "documents"))
    return M.extract_media_meta(media)


def _q_dedup_cluster(spark, sf_dir):
    """Connected components over the SimHash near-dup pairs -> duplicate
    clusters (cluster_id = component min doc id). Hash-min label
    propagation, one shuffle per round, rounds = component diameter; oracle
    is a recursive-CTE reachability walk over the same pair set."""
    pairs = D.simhash_neardup_pairs(
        _tbl(spark, sf_dir, "documents"), bits=32, radius=3, bands=4
    )
    return D.neardup_clusters(pairs)


def _q_evt_asof_join(spark, sf_dir):
    """Backward as-of join (union + window, ONE shuffle — never a range
    join): each click event picks the latest same-user view event at or
    before it. Right side pre-aggregated per (user, ts) so ties are
    deterministic; DuckDB's native ASOF LEFT JOIN is the oracle."""
    ev = _tbl(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = TP.asof_join(left, right, key="user_id", ts="ts")
    return out.select("event_id", "user_id", "view_value")


def _q_evt_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap) rolled up per session. The gap
    comparison runs in integer microseconds so the oracle is bit-exact."""
    return TP.session_stats(
        _tbl(spark, sf_dir, "events"), key="user_id", ts="ts",
        gap_seconds=1800,
    )


def _q_evt_sessionize_native(spark, sf_dir):
    """Spark's built-in session_window operator over the events table; the
    oracle replays the native half-open boundary (diff >= gap starts a new
    session) with lag + cumulative sum."""
    out = TP.session_stats_native(
        _tbl(spark, sf_dir, "events"), key="user_id", ts="ts",
        gap_seconds=1800,
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("start_str"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("end_str"),
        "n_events",
    )


def _q_sample_stratified(spark, sf_dir):
    """Deterministic 10-per-language sample: smallest id_hash per stratum.
    Reproducible across runs/engines, WindowGroupLimit keeps only k rows
    per partition."""
    return SA.stratified_sample(
        _tbl(spark, sf_dir, "documents"), stratum_col="lang", k=10
    ).select("doc_id", "lang", "sample_rank")


def _q_dedup_incremental(spark, sf_dir):
    """CDC-incremental near-dup: only pairs touching the new batch (odd
    doc_ids as the delta, even as the already-deduped corpus) — cost scales
    with the batch, not the corpus. Oracle: all-pairs filtered to pairs
    with at least one delta side."""
    docs = _tbl(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    delta = docs.where(F.col("doc_id") % 2 == 1)
    return D.simhash_neardup_incremental(
        corpus, delta, bits=32, radius=3, bands=4
    )


def _q_pack_chunks(spark, sf_dir):
    """Deterministic token-budget sharding: docs -> ~2000-token chunks per
    language by running token count (functions/packing.py)."""
    from openlogreplicator_spark.functions import packing as PK

    return PK.token_chunk_assign(
        _tbl(spark, sf_dir, "documents"), capacity_tokens=2000
    )


def _q_sample_fraction(spark, sf_dir):
    """Deterministic ~20% hash sample — map-only, no shuffle."""
    return SA.hash_fraction_sample(
        _tbl(spark, sf_dir, "documents"), fraction_pct=20
    ).select("doc_id", "lang")


_TRAINING_QUERIES = {
    "dedup_exact": _q_dedup_exact,
    "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
    "dedup_minhash_sig": _q_dedup_minhash_sig,
    "dedup_lsh_pairs": _q_dedup_lsh_pairs,
    "dedup_simhash": _q_dedup_simhash,
    "dedup_simhash_neardup": _q_dedup_simhash_neardup,
    "dedup_embed_neardup": _q_dedup_embed_neardup,
    "dedup_embed_lsh": _q_dedup_embed_lsh,
    "ann_topk_dot": _q_ann_topk_dot,
    "ann_ivf_topk": _q_ann_ivf_topk,
    "ann_cosine_topk": _q_ann_cosine_topk,
    "text_token_count": _q_text_token_count,
    "text_quality": _q_text_quality,
    "text_lang_id": _q_text_lang_id,
    "doc_fingerprint": _q_doc_fingerprint,
    "text_pii_redact": _q_text_pii_redact,
    "text_repetition": _q_text_repetition,
    "text_contamination": _q_text_contamination,
    "winnow_fp": _q_winnow_fp,
    "multimodal_meta": _q_multimodal_meta,
    "dedup_cluster": _q_dedup_cluster,
    "evt_asof_join": _q_evt_asof_join,
    "evt_sessionize": _q_evt_sessionize,
    "evt_sessionize_native": _q_evt_sessionize_native,
    "sample_stratified": _q_sample_stratified,
    "sample_fraction": _q_sample_fraction,
    "dedup_incremental": _q_dedup_incremental,
    "pack_chunks": _q_pack_chunks,
}

# ---- oracle SQL for the training-data ops (portable-hash mirrors) ----

# shared CTEs: normalized text, word arrays, distinct 3-gram shingles, and
# the portable polynomial shingle hash (see functions/hashing.py docstring)
_DOCS_SQL = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
), toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm
), sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
    FROM toks WHERE len(w) >= 3
  )
), shh AS (
  SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
      list_transform(string_split(s,''), c -> CAST(ascii(c) AS BIGINT))),
      (a,b) -> (a*31+b) % 1000000007) AS h
  FROM sh
)
"""

_MINHASH_SQL_BODY = r"""
, mh AS (
  SELECT doc_id, j, MIN(((2*j+1)*h + (5*j+3)) % 1000000007) AS minhash
  FROM shh, (SELECT unnest(generate_series(0,31)) AS j) js
  GROUP BY doc_id, j
)
"""


def _count_sql(word: str) -> str:
    needle = f" {word} "
    return (f"(length(' ' || t || ' ') - "
            f"length(replace(' ' || t || ' ', '{needle}', ''))) / {len(needle)}")


def _lang_id_sql() -> str:
    from openlogreplicator_spark.functions.textstats import LANG_MARKERS
    cols = []
    for lang in sorted(LANG_MARKERS):
        s = " + ".join(_count_sql(w) for w in LANG_MARKERS[lang])
        cols.append(f"CAST({s} AS BIGINT) AS s_{lang}")
    langs = sorted(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = best THEN '{l}'" for l in langs) + " END"
    return _DOCS_SQL + f""",
scored AS (SELECT doc_id, {', '.join(cols)} FROM norm),
withbest AS (SELECT *, {best} AS best FROM scored)
SELECT doc_id, {case} AS pred_lang, best AS score FROM withbest
"""


def _quality_sql() -> str:
    from openlogreplicator_spark.functions.textstats import STOPWORDS
    stop = " + ".join(_count_sql(w) for w in STOPWORDS)
    return _DOCS_SQL + f"""
SELECT n.doc_id,
  length(t) AS n_chars,
  CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
  CAST(length(regexp_replace(t, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
  CAST({stop} AS BIGINT) AS n_stopwords,
  CAST(list_max(list_transform(string_split(t, ' '), x -> length(x))) AS BIGINT)
    AS max_word_len
FROM norm n
"""


# SimHash computation shared by the signature + Hamming-near-dup oracles
_SIMHASH_BODY = """
, alltoks AS (
  SELECT doc_id, unnest(w) AS tok FROM toks
), th AS (
  SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
      list_transform(string_split(tok,''), c -> CAST(ascii(c) AS BIGINT))),
      (a,b) -> (a*31+b) % 1000000007) AS h
  FROM alltoks
), bitsums AS (
  SELECT doc_id, j, SUM(((h >> j) & 1) * 2 - 1) AS bsum
  FROM th, (SELECT unnest(generate_series(0,31)) AS j) js
  GROUP BY doc_id, j
), sims AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN bsum > 0 THEN (CAST(1 AS BIGINT) << j)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsums GROUP BY doc_id
)
"""

_TRAINING_ORACLES = {
    "dedup_exact": _DOCS_SQL + """
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dupes
        FROM (SELECT doc_id, md5(t) AS fp FROM norm) GROUP BY fp
    """,
    "dedup_ngram_jaccard": _DOCS_SQL + """
        , sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_cnt
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, inter_cnt, (sa.n_sh + sb.n_sh - inter_cnt) AS union_cnt
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE 100 * inter_cnt >= 60 * (sa.n_sh + sb.n_sh - inter_cnt)
    """,
    "dedup_minhash_sig": _DOCS_SQL.replace("FROM documents",
        "FROM documents WHERE doc_id < 100") + _MINHASH_SQL_BODY + """
        SELECT doc_id, CAST(j AS INT) AS j, minhash FROM mh
    """,
    "dedup_lsh_pairs": _DOCS_SQL + _MINHASH_SQL_BODY + """
        , bands AS (
          SELECT doc_id, CAST(j // 4 AS INT) AS band,
                 string_agg(CAST(minhash AS VARCHAR), '-' ORDER BY j) AS sig
          FROM mh GROUP BY doc_id, (j // 4)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """,
    "dedup_simhash": _DOCS_SQL + _SIMHASH_BODY + """
        SELECT doc_id, simhash FROM sims
    """,
    "dedup_simhash_neardup": _DOCS_SQL + _SIMHASH_BODY + """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    # incremental near-dup = the same all-pairs set restricted to pairs
    # with at least one side in the delta (odd doc_ids)
    "dedup_incremental": _DOCS_SQL + _SIMHASH_BODY + """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
    """,
    "pack_chunks": r"""
        WITH norm AS (
          SELECT doc_id, lang,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
          FROM documents
        ), tok AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
          FROM norm
        ), c AS (
          SELECT *,
            COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum_before
          FROM tok
        )
        SELECT doc_id, lang, n_tokens,
               CAST(cum_before // 2000 AS BIGINT) AS chunk_id,
               CAST(cum_before % 2000 AS BIGINT) AS chunk_offset
        FROM c
    """,
    # connected components over the same near-dup pair set: recursive
    # reachability walk carries every label to every node it can reach,
    # then min per node = the component's min id (what hash-min label
    # propagation converges to)
    "dedup_cluster": (_DOCS_SQL + _SIMHASH_BODY + """
        , prs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sims a JOIN sims b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ), edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION
          SELECT doc_b, doc_a FROM prs
        ), walk(node, label) AS (
          SELECT src, src FROM (SELECT DISTINCT src FROM edges)
          UNION
          SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
        )
        SELECT node AS doc_id, MIN(label) AS cluster_id
        FROM walk GROUP BY node
    """).replace("WITH norm", "WITH RECURSIVE norm", 1),
    "ann_topk_dot": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
            CAST(SUM(CAST(FLOOR(CAST(qv[i] AS DOUBLE)*1000) AS BIGINT)
              * CAST(FLOOR(CAST(cv[i] AS DOUBLE)*1000) AS BIGINT)) AS BIGINT)
              AS dot
          FROM q, c, (SELECT unnest(generate_series(1,64)) AS i) gi
          WHERE neighbor_id <> query_id
          GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, dot, CAST(rnk AS INT) AS rnk FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY dot DESC, neighbor_id ASC) AS rnk
          FROM scored
        ) WHERE rnk <= 5
    """,
    # fitted IVF mirror (similarity.fit_ivf_cells + topk_ivf): seed cells =
    # vec_id % 8, integer centroids (floor-mean per dim), argmin reassignment
    # encoded as MIN(dist*8 + cell), 2-probe fan-out, quantized-dot scoring —
    # every step integer/IEEE-exact on both sides.
    "ann_ivf_topk": """
        WITH v AS (
          SELECT vec_id,
            list_transform(generate_series(1,64),
              i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)*1000) AS BIGINT))
              AS qv,
            vec_id % 8 AS cell0
          FROM embeddings
        ), dims AS (SELECT unnest(generate_series(1,64)) AS i),
        cent AS (
          SELECT cell0 AS cell, i,
            CAST(FLOOR(CAST(SUM(qv[i]) AS DOUBLE)/COUNT(*)) AS BIGINT) AS c
          FROM v, dims GROUP BY cell0, i
        ), centv AS (
          SELECT cell, list(c ORDER BY i) AS cv FROM cent GROUP BY cell
        ), assign AS (
          SELECT vec_id, CAST(MIN(
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(generate_series(1,64),
                i -> (qv[i]-cv[i])*(qv[i]-cv[i]))), (a,b)->a+b) * 8 + cell
          ) % 8 AS INT) AS cell
          FROM v, centv GROUP BY vec_id
        ), q AS (SELECT vec_id AS query_id, qv AS qqv FROM v WHERE vec_id < 5),
        probes AS (
          SELECT query_id, qqv, cell FROM (
            SELECT q.query_id, q.qqv, centv.cell,
              ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(generate_series(1,64),
                    i -> (qqv[i]-cv[i])*(qqv[i]-cv[i]))), (a,b)->a+b) * 8
                  + centv.cell) AS pr
            FROM q, centv
          ) WHERE pr <= 2
        ), scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(generate_series(1,64),
                i -> p.qqv[i]*m.qv[i])), (a,b)->a+b) AS BIGINT) AS dot
          FROM probes p
          JOIN assign a ON a.cell = p.cell
          JOIN v m ON m.vec_id = a.vec_id
          WHERE a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, dot, CAST(rnk AS INT) AS rnk FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY dot DESC, neighbor_id ASC) AS rnk
          FROM scored
        ) WHERE rnk <= 5
    """,
    # integer-rational cosine threshold: cos >= t <=> dot>0 and
    # 100^2 dot^2 >= (100t)^2 |a|^2 |b|^2 over floor(x*100) ints — exact,
    # and x100 (not x1000) keeps the squared comparison inside int64
    "dedup_embed_neardup": """
        WITH v AS (
          SELECT vec_id,
            list_transform(generate_series(1,64),
              i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)*100) AS BIGINT))
              AS qv
          FROM embeddings
        ), n AS (
          SELECT vec_id, qv,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(generate_series(1,64), i -> qv[i]*qv[i])),
              (a,b)->a+b) AS n2
          FROM v
        ), p AS (
          SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(generate_series(1,64), i -> a.qv[i]*b.qv[i])),
              (x,y)->x+y) AS BIGINT) AS dot,
            a.n2 AS n2a, b.n2 AS n2b
          FROM n a JOIN n b ON a.vec_id < b.vec_id
        )
        SELECT doc_a, doc_b, dot FROM p
        WHERE dot > 0 AND 10000*dot*dot >= 1600*n2a*n2b
    """,
    # sign-LSH: 16 deterministic +-1 hyperplanes over floor(x*1000) ints,
    # sign bit per plane, 4 bands x 4 bits, banded self-join. The plane
    # pattern is a pure function of (plane h, dim d): +1 iff
    # ((h*31 + d*17) % 7) % 2 = 0 (dedup.py embedding_neardup_lsh_candidates)
    "dedup_embed_lsh": """
        WITH v AS (
          SELECT vec_id AS vid,
            list_transform(generate_series(1,64),
              i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)*1000) AS BIGINT))
              AS qv
          FROM embeddings
        ), bits AS (
          SELECT vid,
            list_transform(generate_series(0,15), h ->
              CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(generate_series(1,64),
                  i -> qv[i] * (CASE WHEN ((h*31+(i-1)*17)%7)%2=0
                                THEN 1 ELSE -1 END))),
                (a,b)->a+b) >= 0
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bb
          FROM v
        ), banded AS (
          SELECT vid, band,
            bb[band*4+1]*8 + bb[band*4+2]*4 + bb[band*4+3]*2 + bb[band*4+4]
              AS bv
          FROM bits, (SELECT unnest(generate_series(0,3)) AS band)
        )
        SELECT DISTINCT a.vid AS doc_a, b.vid AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bv = b.bv AND a.vid < b.vid
    """,
    # bit-exact double cosine: Spark's F.aggregate and DuckDB's list_reduce
    # are both strict left folds in array-index order, and float32 -> double
    # widening, IEEE multiply/add/sqrt/divide are all deterministic, so the
    # cos values (and hence the ranking) hash identically.
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(generate_series(1,64),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))),
              (a,b) -> a + b)
            / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(generate_series(1,64),
                    i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))),
                (a,b) -> a + b))
               * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(generate_series(1,64),
                      i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))),
                  (a,b) -> a + b))) AS cos
          FROM q, c
          WHERE neighbor_id <> query_id
        )
        SELECT query_id, neighbor_id, cos, CAST(rnk AS INT) AS rnk FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rnk
          FROM scored
        ) WHERE rnk <= 5
    """,
    "text_token_count": _DOCS_SQL + r"""
        SELECT doc_id,
          CAST(len(string_split(t, ' ')) AS BIGINT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(t, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
            AS n_bpe_tokens
        FROM norm
    """,
    "text_quality": _quality_sql(),
    "text_lang_id": _lang_id_sql(),
    # PII scrub: classes counted on the text AFTER earlier classes were
    # replaced (mirrors functions/cleaning.py pass order exactly)
    "text_pii_redact": r"""
        WITH s0 AS (SELECT doc_id, text AS t FROM documents),
        s1 AS (SELECT doc_id,
          CAST(len(regexp_extract_all(t,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
            AS n_email,
          regexp_replace(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
            '<EMAIL>', 'g') AS t
          FROM s0),
        s2 AS (SELECT doc_id, n_email,
          CAST(len(regexp_extract_all(t,
            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
          regexp_replace(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g')
            AS t
          FROM s1),
        s3 AS (SELECT doc_id, n_email, n_ssn,
          CAST(len(regexp_extract_all(t,
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
            AS n_ip,
          regexp_replace(t,
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
            AS t
          FROM s2),
        s4 AS (SELECT doc_id, n_email, n_ssn, n_ip,
          CAST(len(regexp_extract_all(t,
            '\+?[0-9][0-9\- ]{7,}[0-9]')) AS BIGINT) AS n_phone,
          regexp_replace(t, '\+?[0-9][0-9\- ]{7,}[0-9]', '<PHONE>', 'g') AS t
          FROM s3)
        SELECT doc_id, t AS clean_text, n_email, n_ssn, n_ip, n_phone,
               n_email + n_ssn + n_ip + n_phone AS n_pii
        FROM s4
    """,
    # duplicate-3-gram load (multiplicity-bearing grams, unlike sh's
    # DISTINCT shingles)
    "text_repetition": _DOCS_SQL + r"""
        , g AS (
          SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
          FROM toks WHERE len(w) >= 3
        ), pg AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(c) AS BIGINT) AS top_gram_count
        FROM pg GROUP BY doc_id
    """,
    # shingle overlap vs the doc_id % 17 == 0 eval slice
    "text_contamination": _DOCS_SQL + r"""
        , bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 0),
        hits AS (
          SELECT sh.doc_id, COUNT(*) AS n_contaminated
          FROM sh JOIN bench ON sh.s = bench.s GROUP BY 1
        ), tot AS (
          SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1
        )
        SELECT tot.doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
               CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated
        FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
    """,
    "doc_fingerprint": _DOCS_SQL + """
        SELECT doc_id, md5(t) AS fp FROM norm
    """,
    "winnow_fp": _DOCS_SQL.replace("FROM documents",
        "FROM documents WHERE doc_id < 20") + r"""
        , grams AS (
          SELECT doc_id, g.pos AS pos, g.gram AS gram FROM (
            SELECT doc_id, unnest(list_transform(generate_series(1, length(t)-4),
                i -> {'pos': i, 'gram': substr(t, i, 5)})) AS g
            FROM norm WHERE length(t) >= 5
          )
        ), gh AS (
          SELECT doc_id, pos, list_reduce(list_prepend(CAST(7 AS BIGINT),
              list_transform(string_split(gram,''), c -> CAST(ascii(c) AS BIGINT))),
              (a,b) -> (a*31+b) % 1000000007) AS h
          FROM grams
        ), winmin AS (
          SELECT doc_id, pos, h,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
          FROM gh
        )
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS pos, h AS fp_hash
        FROM winmin WHERE h = wmin GROUP BY doc_id, h
    """,
    "multimodal_meta": """
        SELECT doc_id, 'image/fake' AS media_type,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          CAST(octet_length(encode(text)) % 640 AS INT) AS width,
          CAST(octet_length(encode(text)) % 480 AS INT) AS height
        FROM documents
    """,
    # DuckDB's native ASOF LEFT JOIN checks our union+window implementation
    "evt_asof_join": """
        WITH l AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'
        ), r AS (
          SELECT user_id, ts, MAX(value) AS view_value FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts
        )
        SELECT l.event_id, l.user_id, r.view_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    # gap sessionization in integer microseconds (epoch_us both sides)
    "evt_sessionize": """
        WITH o AS (
          SELECT user_id, ts, event_id,
            LAG(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
          FROM events
        ), marked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM o
        ), sess AS (
          SELECT user_id, ts,
            CAST(SUM(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
              AS session_idx
          FROM marked
        )
        SELECT user_id, session_idx,
          COUNT(*) AS n_events,
          MIN(ts) AS session_start,
          MAX(ts) AS session_end,
          epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us
        FROM sess GROUP BY user_id, session_idx
    """,
    # native session_window boundary is INCLUSIVE (pinned by
    # test_session_window_boundary_semantics): an event at exactly
    # prev + gap merges, so a new session needs diff > gap — identical
    # boundary to the lag-form sessionize
    "evt_sessionize_native": """
        WITH o AS (
          SELECT user_id, ts, event_id,
            LAG(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
          FROM events
        ), marked AS (
          SELECT user_id, ts,
            CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM o
        ), sess AS (
          SELECT user_id, ts,
            SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM marked
        )
        SELECT user_id,
          strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_str,
          strftime(MAX(ts) + INTERVAL 30 MINUTE,
                   '%Y-%m-%d %H:%M:%S.%f') AS end_str,
          COUNT(*) AS n_events
        FROM sess GROUP BY user_id, session_idx
    """,
    # deterministic top-k per stratum by (id*2654435761 + 7) % 1000000007
    "sample_stratified": """
        SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank FROM (
          SELECT doc_id, lang,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY (doc_id * 2654435761 + 7) % 1000000007, doc_id)
              AS sample_rank
          FROM documents
        ) WHERE sample_rank <= 10
    """,
    "sample_fraction": """
        SELECT doc_id, lang FROM documents
        WHERE ((doc_id * 2654435761 + 7) % 1000000007) * 100
              < 20 * CAST(1000000007 AS BIGINT)
    """,
}
