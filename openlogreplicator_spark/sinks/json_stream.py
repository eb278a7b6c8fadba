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

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.sinks.oracle_types import SPARK_TO_ORACLE

# reference op codes (OutputBufferJson.cpp: 'c' create, 'u' update,
# 'd' delete — processInsert/processUpdate/processDelete)
_OP_MAP = {"I": "c", "U": "u", "D": "d"}


@dataclass(frozen=True)
class JsonFormat:
    """The reference's JSON message-format knobs (types.h:85-116, rendered
    by OutputBufferJson.cpp appendHeader :186-224):

      * ``scn_format``: bit0 HEX -> header carries ``"scns":"0x%016x"``
        instead of numeric ``"scn"``; bit1 ALL_PAYLOADS -> every message of
        a bracketed transaction repeats the scn (default: begin only);
      * ``timestamp_format``: bit0 ISO8601 -> ``"tms":"..Z"`` instead of
        unix-millis ``"tm"``; bit1 ALL_PAYLOADS as above. The timestamp is
        the transaction's COMMIT-event time (``commit_ts`` from assembly;
        the reference stamps the begin time — same transaction clock,
        different edge, documented deviation);
      * ``xid_format``: 0 TEXT ``"xid"`` (the feed's string xid — the
        reference renders usn.slt.sqn text); 1 NUMERIC ``"xidn"`` (the
        reference emits the raw 8-byte xid; string xids here map through
        xxhash64, a stable 64-bit numeric identity);
      * ``schema_format`` (OutputBufferJson.cpp:226-372 columns rendering,
        knobs types.h:104-116): bit0 (SCHEMA_FORMAT_FULL) -> each op's
        ``schema`` carries a ``columns`` array of {name, type, nullable}
        definitions (pass ``schema_columns``, see
        ``json_schema_columns_for``) on EVERY message (the reference's
        once-per-object dedupe is a single-producer notion; a parallel
        sink treats FULL as FULL|REPEATED — same documented deviation as
        the protobuf side); bit2 (SCHEMA_FORMAT_OBJ) -> ``schema.obj``,
        the stable CRC32 of owner.table (identical to protobuf's
        ``stable_obj_id``).

    ``change_stream_ops``/``change_stream_messages`` without a JsonFormat
    keep the engine's round-3 shape byte-for-byte (an all-payloads header
    extended with ``op_scn``); passing one opts into reference-shaped
    headers."""

    scn_format: int = 0
    timestamp_format: int = 0
    xid_format: int = 0
    schema_format: int = 0


# Spark simpleString -> the Oracle type NAME the reference renders in its
# JSON column definitions (OutputBufferJson.cpp:270-358 maps dictionary
# types to these names; we map back from the lake schema's Spark types).
# Derived from the ONE format-neutral dispatch (sinks/oracle_types.py) so
# the JSON and protobuf sinks can never drift on a type.
_SPARK_TO_ORATYPE = {k: v[0] for k, v in SPARK_TO_ORACLE.items()}


def json_schema_columns_for(schema) -> list[tuple]:
    """(name, oracle type name, nullable) triples for the JSON ``columns``
    schema section, from a Spark StructType (the target table's payload
    schema) — the JSON twin of protobuf's ``schema_columns_for`` (which
    emits the ColumnType ENUM instead of the name)."""
    out = []
    for f in schema.fields:
        simple = f.dataType.simpleString().split("(")[0]
        out.append((f.name, _SPARK_TO_ORATYPE.get(simple, "unknown"),
                    f.nullable))
    return out


def _header_cols(fmt: JsonFormat, have_ts: bool, first: bool) -> list:
    cols = []
    if first or (fmt.scn_format & 2):
        if fmt.scn_format & 1:
            cols.append(F.concat(
                F.lit("0x"),
                F.lpad(F.lower(F.hex(F.col("commit_scn"))), 16, "0"),
            ).alias("scns"))
        else:
            cols.append(F.col("commit_scn").alias("scn"))
    if have_ts and (first or (fmt.timestamp_format & 2)):
        # cast covers TIMESTAMP_NTZ feeds (session tz is UTC by contract)
        cts = F.col("commit_ts").cast("timestamp")
        if fmt.timestamp_format & 1:
            cols.append(F.date_format(
                cts, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("tms"))
        else:
            # reference emits lastTime.toTime() * 1000 — WHOLE-SECOND
            # granularity millis (OutputBuffer.cpp appendHeader); truncate
            # sub-second precision to match byte-for-byte
            cols.append((F.unix_timestamp(cts) * 1000).alias("tm"))
    if fmt.xid_format == 1:
        cols.append(F.xxhash64(F.col("xid")).alias("xidn"))
    else:
        cols.append(F.col("xid").alias("xid"))
    return cols


def _op_code():
    c = None
    for k, v in _OP_MAP.items():
        c = F.when(F.col("op") == k, F.lit(v)) if c is None else c.when(
            F.col("op") == k, F.lit(v)
        )
    return c.otherwise(F.col("op"))


def _entry(df: DataFrame, cfg: EngineConfig, owner: str,
           key_cols: "tuple[str, ...] | None" = None,
           fmt: "JsonFormat | None" = None,
           schema_columns: "list[tuple] | None" = None):
    """One payload entry: {op, schema:{owner,table[,obj][,columns]}, key,
    before?, after?}. ``table``/``before`` are optional on the input (the
    replay plan projects them away before the shuffle) — absent columns are
    rendered as constants/omitted, matching the reference's schema-knob
    behavior (types.h:85-116)."""
    table_col = (F.col("table") if "table" in df.columns
                 else F.lit(cfg.table_filter[0] if cfg.table_filter else "?"))
    schema_fields = [F.lit(owner).alias("owner"), table_col.alias("table")]
    if fmt is not None and (fmt.schema_format & 4):  # SCHEMA_FORMAT_OBJ
        # JVM-side CRC32 == zlib.crc32 == protobuf's stable_obj_id
        schema_fields.append(F.crc32(F.encode(
            F.concat(F.lit(owner), F.lit("."), table_col), "UTF-8"
        )).alias("obj"))
    if (fmt is not None and (fmt.schema_format & 1)
            and schema_columns):  # SCHEMA_FORMAT_FULL (|REPEATED)
        schema_fields.append(F.array(*[
            F.struct(F.lit(n).alias("name"), F.lit(t).alias("type"),
                     F.lit(bool(nn)).alias("nullable"))
            for n, t, nn in schema_columns
        ]).alias("columns"))
    cols = [
        _op_code().alias("op"),
        F.struct(*schema_fields).alias("schema"),
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
    fmt: "JsonFormat | None" = None,
    schema_columns: "list[tuple] | None" = None,
) -> DataFrame:
    """Per-op messages ("message":0 mode) — map-only, no shuffle.

    Output: (scn, commit_scn, xid, <key cols...>, value) where ``value``
    is the JSON text. The merge-key COLUMNS ride alongside the serialized
    message so downstream keyed sinks (sinks/kafka.py) partition on them
    directly — re-parsing the key out of the rendered JSON per record
    (round-3 kafka_records) both cost a JSON-path eval per row and forced
    a fresh hash exchange on a derived string.

    ``fmt``: reference-shaped headers (JsonFormat knobs); None keeps the
    round-3 shape (scn + op_scn + xid on every message) byte-for-byte.
    """
    kc = [k for k in (key_cols or cfg.key_cols) if k in assembled.columns]
    entry = _entry(assembled, cfg, owner, key_cols, fmt, schema_columns)
    if fmt is None:
        msg = F.struct(
            F.col("commit_scn").alias("scn"),
            F.col("scn").alias("op_scn"),
            F.col("xid").alias("xid"),
            entry.alias("payload"),
        )
    else:
        msg = F.struct(
            *_header_cols(fmt, "commit_ts" in assembled.columns, first=True),
            entry.alias("payload"),
        )
    return assembled.select(
        "scn", "commit_scn", "xid", *kc,
        F.to_json(msg, {"ignoreNullFields": "true"}).alias("value"),
    )


def change_stream_brackets(
    assembled: DataFrame, cfg: EngineConfig, owner: str = "OLR",
    key_cols: "tuple[str, ...] | None" = None,
    fmt: "JsonFormat | None" = None,
    schema_columns: "list[tuple] | None" = None,
) -> DataFrame:
    """Reference "message":0 SHORT mode, faithfully bracketed: each
    transaction streams as ``{header(first), payload:[{"op":"begin"}]}``,
    one message per DML with ``header(first=false)`` (xid only, unless the
    ALL_PAYLOADS format bits repeat scn/tm — OutputBufferJson.cpp
    processBegin :488-504 / processInsert :560-575 / processCommit
    :506-517), then ``{header, payload:[{"op":"commit"}]}``.

    Output: (commit_scn, xid, kind, scn, value) where kind 0/1/2 =
    begin/op/commit — ordering by (commit_scn, xid, kind, scn, seq) is the
    exact single-producer emission order. Map-only for the op messages;
    the begin/commit rows are one distinct over (xid, commit_scn) — the
    same grouping the per-tx sink pays."""
    fmt = fmt or JsonFormat()
    have_ts = "commit_ts" in assembled.columns
    entry = _entry(assembled, cfg, owner, key_cols, fmt, schema_columns)
    op_msg = F.struct(
        *_header_cols(fmt, have_ts, first=False),
        F.array(entry).alias("payload"),  # reference: "payload":[{op...}]
    )
    ops = assembled.select(
        "commit_scn", "xid", F.lit(1).alias("kind"), "scn", "seq",
        F.to_json(op_msg, {"ignoreNullFields": "true"}).alias("value"),
    )
    tx_cols = ["xid", "commit_scn"] + (["commit_ts"] if have_ts else [])
    txs = assembled.select(*tx_cols).distinct()

    def bracket(op_name: str, kind: int, first: bool):
        msg = F.struct(
            *_header_cols(fmt, have_ts, first=first),
            F.array(F.struct(F.lit(op_name).alias("op"))).alias("payload"),
        )
        return txs.select(
            "commit_scn", "xid", F.lit(kind).alias("kind"),
            F.lit(None).cast("long").alias("scn"),
            F.lit(None).cast("long").alias("seq"),
            F.to_json(msg, {"ignoreNullFields": "true"}).alias("value"),
        )

    return (bracket("begin", 0, first=True)
            .unionByName(ops)
            .unionByName(bracket("commit", 2, first=False)))


def change_stream_messages(
    assembled: DataFrame, cfg: EngineConfig, owner: str = "OLR",
    key_cols: "tuple[str, ...] | None" = None,
    max_ops_per_message: int | None = None,
    fmt: "JsonFormat | None" = None,
    schema_columns: "list[tuple] | None" = None,
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
    entry = _entry(assembled, cfg, owner, key_cols, fmt, schema_columns)
    have_ts = fmt is not None and "commit_ts" in assembled.columns
    gb = ["xid", "commit_scn"] + (["commit_ts"] if have_ts else [])
    per_tx = assembled.groupBy(*gb).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("scn"), F.col("seq"), entry.alias("e")))
        ).alias("ops")
    )

    def header():
        if fmt is None:
            return [F.col("commit_scn").alias("scn"), F.col("xid").alias("xid")]
        return _header_cols(fmt, have_ts, first=True)

    if max_ops_per_message is None:
        msg = F.struct(
            *header(),
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
        "xid", "commit_scn",
        *(["commit_ts"] if have_ts else []),
        n_msgs.alias("n_msgs"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_msgs - 1),
                lambda i: F.slice(F.col("ops"), i * cap + 1, cap),
            )
        ).alias("msg_seq", "chunk"),
    )
    msg = F.struct(
        *header(),
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
