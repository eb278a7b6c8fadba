"""Canonical JSON change-stream serializer + file sink (O1 / W2).

Reference parity: OpenLogReplicator's principal output is a JSON message
stream (OutputBufferJson.cpp:488-733 builds per-op entries with
op c/u/d, schema {owner, table}, before/after column maps; 185-224 the
message header {scn, tm, xid}; OutputBuffer.cpp:891-953 rotates one message
per op ("message":0) or one per transaction ("message":1)). The engine's
primary sink is the lake MERGE, but downstream consumers (Kafka-shaped
pipelines) want the serialized change stream itself — this module renders it
with pure JVM expressions (``to_json`` over structs), no Python in the path.

Scale notes:
  * per-op mode is a map-only projection — no shuffle at all;
  * per-transaction mode groups on (xid, commit_scn) — same key as assembly,
    one bounded shuffle; ``collect_list`` per transaction is bounded by
    transaction size. The reference caps serialized transactions with
    max-message-mb and force-splits (Transaction.cpp:346-352, M1) — at the
    lake layer no such cap exists, so giant transactions should prefer
    per-op mode (documented trade, same as the reference's "message":0).
  * the Kafka analog is one extra ``writeStream.format("kafka")`` hop with
    ``value`` = the rendered message; the file sink below is the W2 path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from openlogreplicator_spark.config import EngineConfig

# reference op codes (OutputBufferJson.cpp: 'c' create, 'u' update,
# 'd' delete — processInsert/processUpdate/processDelete)
_OP_MAP = {"I": "c", "U": "u", "D": "d"}


def _op_code():
    c = None
    for k, v in _OP_MAP.items():
        c = F.when(F.col("op") == k, F.lit(v)) if c is None else c.when(
            F.col("op") == k, F.lit(v)
        )
    return c.otherwise(F.col("op"))


def _entry(df: DataFrame, cfg: EngineConfig, owner: str,
           key_cols: "tuple[str, ...] | None" = None):
    """One payload entry: {op, schema:{owner,table}, key, before?, after?}.
    ``table``/``before`` are optional on the input (the replay plan projects
    them away before the shuffle) — absent columns are rendered as constants
    /omitted, matching the reference's schema-knob behavior (types.h:85-116)."""
    table_col = (F.col("table") if "table" in df.columns
                 else F.lit(cfg.table_filter[0] if cfg.table_filter else "?"))
    cols = [
        _op_code().alias("op"),
        F.struct(F.lit(owner).alias("owner"), table_col.alias("table"))
        .alias("schema"),
        F.struct(*[F.col(k) for k in (key_cols or cfg.key_cols)])
        .alias("key"),
    ]
    if "before" in df.columns:
        cols.append(F.col("before").alias("before"))
    cols.append(F.col("after").alias("after"))
    cols.append(F.col("cols_set").alias("cols_set"))
    return F.struct(*cols)


def change_stream_ops(
    assembled: DataFrame, cfg: EngineConfig, owner: str = "OLR",
    key_cols: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Per-op messages ("message":0 mode) — map-only, no shuffle.

    Output: (scn, commit_scn, xid, <key cols...>, value) where ``value``
    is the JSON text. The merge-key COLUMNS ride alongside the serialized
    message so downstream keyed sinks (sinks/kafka.py) partition on them
    directly — re-parsing the key out of the rendered JSON per record
    (round-3 kafka_records) both cost a JSON-path eval per row and forced
    a fresh hash exchange on a derived string.
    """
    kc = [k for k in (key_cols or cfg.key_cols) if k in assembled.columns]
    entry = _entry(assembled, cfg, owner, key_cols)
    msg = F.struct(
        F.col("commit_scn").alias("scn"),
        F.col("scn").alias("op_scn"),
        F.col("xid").alias("xid"),
        entry.alias("payload"),
    )
    return assembled.select(
        "scn", "commit_scn", "xid", *kc,
        F.to_json(msg, {"ignoreNullFields": "true"}).alias("value"),
    )


def change_stream_messages(
    assembled: DataFrame, cfg: EngineConfig, owner: str = "OLR",
    key_cols: "tuple[str, ...] | None" = None,
    max_ops_per_message: int | None = None,
) -> DataFrame:
    """Per-transaction messages ("message":1 mode): one JSON document per
    committed transaction, ops in (scn, seq) insertion order
    (OutputBuffer.cpp:891-953 outputBufferBegin/Commit rotation).

    ``max_ops_per_message`` is the M1 big-transaction split
    (Transaction.cpp:346-352 force-splits over max-message-mb): a
    transaction with more ops than the budget is emitted as several
    continuation messages in (scn, seq) order, each carrying
    ``msg_seq``/``n_msgs`` in its header so consumers can reassemble —
    the engine degrades gracefully where an unbounded document would OOM
    the consumer. An op-count budget stands in for the reference's byte
    budget: op payload size is bounded by the table's row width, so
    bytes ~= ops x row_width and the knob translates directly.

    Output: (commit_scn, xid, n_ops, value) — plus (msg_seq, n_msgs)
    when a split budget is configured. No extra shuffle for the split:
    the chunking is an array slice + explode on the already-grouped rows.
    """
    entry = _entry(assembled, cfg, owner, key_cols)
    per_tx = assembled.groupBy("xid", "commit_scn").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("scn"), F.col("seq"), entry.alias("e")))
        ).alias("ops")
    )
    if max_ops_per_message is None:
        msg = F.struct(
            F.col("commit_scn").alias("scn"),
            F.col("xid").alias("xid"),
            F.transform(F.col("ops"), lambda o: o["e"]).alias("payload"),
        )
        return per_tx.select(
            "commit_scn", "xid", F.size("ops").alias("n_ops"),
            F.to_json(msg, {"ignoreNullFields": "true"}).alias("value"),
        )
    if max_ops_per_message < 1:
        raise ValueError("max_ops_per_message must be >= 1")
    cap = int(max_ops_per_message)
    n_msgs = F.ceil(F.size("ops") / F.lit(cap)).cast("int")
    chunked = per_tx.select(
        "xid", "commit_scn", n_msgs.alias("n_msgs"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_msgs - 1),
                lambda i: F.slice(F.col("ops"), i * cap + 1, cap),
            )
        ).alias("msg_seq", "chunk"),
    )
    msg = F.struct(
        F.col("commit_scn").alias("scn"),
        F.col("xid").alias("xid"),
        F.col("msg_seq").alias("num"),
        F.col("n_msgs").alias("num_total"),
        F.transform(F.col("chunk"), lambda o: o["e"]).alias("payload"),
    )
    return chunked.select(
        "commit_scn", "xid", F.size("chunk").alias("n_ops"),
        "msg_seq", "n_msgs",
        F.to_json(msg, {"ignoreNullFields": "true"}).alias("value"),
    )


def write_change_stream(messages: DataFrame, path: str, mode: str = "overwrite",
                        order: bool = True) -> None:
    """File sink (W2 — WriterFile.cpp:59-71: write + newline, confirm).
    One JSON line per message; commit-scn ordered within each output file.
    For the Kafka analog, feed ``messages.select("value")`` to a kafka sink."""
    out = messages
    if order:
        out = out.sortWithinPartitions("commit_scn")
    out.select("value").write.mode(mode).text(path)
