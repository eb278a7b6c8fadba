"""OpenLogReplicator.json-analog configuration file.

The reference's entire UX is ONE JSON config: main() opens, locks and parses
``OpenLogReplicator.json`` and CONFIG_FAILs on anything malformed
(/root/reference/src/OpenLogReplicator.cpp:109-190), then builds every
analyzer from the ``sources`` array (:193-626 — reader type, format knobs,
table masks with per-table ``key`` overrides, ``event-table``) and every
writer from the ``targets`` array (:628-824 — writer type, start position,
message budgets). This module is the Spark engine's equivalent surface:

  * the SAME section and field names wherever the knob has a Spark meaning
    (``sources[].reader.type`` batch/online, ``sources[].format`` type/
    message/scn/timestamp/xid/schema ints with the reference's value
    ranges, ``sources[].tables[].table``/``key``, ``sources[].event-table``,
    ``targets[].writer`` start-scn/start-seq/start-time/start-time-rel/
    max-messages);
  * engine-specific fields for the Spark-only surfaces, namespaced inside
    the sections they configure: ``tables[].target`` (the lake table path —
    the engine's canonical sink is the Iceberg-style MERGE target, which
    the reference delegates to its consumers) plus optional per-table
    ``history``/``history-open``/``conversations`` side outputs, and a
    source-level ``lake`` object for merge-mode/buckets/maintenance
    cadences;
  * refusal of unknown fields — the reference CONFIG_FAILs rather than
    guessing, and a config knob that silently does nothing is the config
    analog of a silently-skipped side output;
  * a documented ACCEPT-WITH-NOTE set for reference knobs whose job Spark
    itself owns (memory pools, reader sleeps, checkpoint cadence): they are
    accepted so a reference-shaped config ports without edits, and logged
    with the Spark-native equivalent to tune instead.

Writer types: ``lake`` (primary MERGE only) and ``file`` (adds the
serialized change-stream side-channel the reference's file writer emits).
``kafka`` / ``network`` / ``zeromq`` are refused at parse time with
pointers to the in-package equivalents (sinks/kafka.py producer contract,
sinks/network.py serve_change_stream, ZeroMQ a documented descope) — the
grammar names them so a reference config fails with a actionable message,
not a mystery key error.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field

from openlogreplicator_spark.config import EngineConfig

log = logging.getLogger(__name__)

CONFIG_VERSION = "1.0"


class ConfigError(ValueError):
    """Reference CONFIG_FAIL analog — message style matches ('bad JSON, ...')."""


# reference knobs whose responsibility Spark itself owns: accepted (so an
# OpenLogReplicator.json ports without editing) and logged with the
# Spark-native knob to use instead. Keyed by section for exact placement.
_NOTED_SOURCE_KEYS = {
    "flags": "engine behavior flags are explicit EngineConfig fields",
    "memory-min-mb": "executor memory is a spark-submit/cluster setting",
    "memory-max-mb": "executor memory is a spark-submit/cluster setting",
    "read-buffer-max-mb": "scan batching is spark.sql.files.maxPartitionBytes",
    "redo-read-sleep": "the streaming trigger interval paces reads",
    "arch-read-sleep": "the streaming trigger interval paces reads",
    "redo-verify-delay": "lake files are immutable; no torn-write verify",
}
_NOTED_READER_KEYS = {
    "disable-checks": "feed validation is always on (decode_events)",
    "log-archive-format": "the feed is parquet files, not archived redo",
    "redo-copy-path": "the feed is already durable; no copy pass",
    "path-mapping": "feed paths are read as given",
}
_NOTED_WRITER_KEYS = {
    "poll-interval": "foreachBatch is push-driven; no writer poll",
    "checkpoint-interval": "Structured Streaming checkpoints every batch",
    "queue-size": "backpressure is reader.max-files-per-trigger",
}


def _check_keys(obj: dict, where: str, required: tuple = (),
                optional: tuple = (), noted: dict | None = None) -> None:
    if not isinstance(obj, dict):
        # a string section would otherwise pass `"type" in obj` as a
        # SUBSTRING test and fail later with a raw TypeError — everything
        # malformed must fail with the reference-style ConfigError
        raise ConfigError(
            f"bad JSON, {where} must be an object, got "
            f"{type(obj).__name__}")
    for k in required:
        if k not in obj:
            raise ConfigError(f"bad JSON, missing \"{k}\" in {where}")
    noted = noted or {}
    for k in obj:
        if k in noted:
            log.info("config: %s.%s accepted with note — %s",
                     where, k, noted[k])
        elif k not in required and k not in optional:
            raise ConfigError(
                f"bad JSON, unknown field \"{k}\" in {where} "
                f"(known: {sorted(set(required) | set(optional))})")


def _int_in(obj: dict, key: str, where: str, lo: int, hi: int,
            default: int) -> int:
    if key not in obj:
        return default
    v = obj[key]
    if not isinstance(v, int) or isinstance(v, bool) or not lo <= v <= hi:
        raise ConfigError(
            f"bad JSON, invalid \"{key}\" value: {v!r} in {where}, "
            f"expected integer in [{lo}, {hi}]")
    return v


def _opt_int(obj: dict, key: str, where: str, lo: int, hi: int):
    """Optional integer knob: absent -> None, present -> validated like
    _int_in. The reference parses every numeric knob through getJsonFieldU
    and CONFIG_FAILs on type/range (OpenLogReplicator.cpp:277-352); a JSON
    string \"5000\" or a bool must fail at parse, not deep inside a Spark
    filter (round-5 review finding: '\"expire-every\": true' made the
    cadence fire every batch)."""
    if key not in obj:
        return None
    return _int_in(obj, key, where, lo, hi, 0)


def _opt_str(obj: dict, key: str, where: str):
    """Optional string knob: absent -> None, present -> non-empty string."""
    if key not in obj:
        return None
    v = obj[key]
    if not isinstance(v, str) or not v:
        raise ConfigError(
            f"bad JSON, invalid \"{key}\" value: {v!r} in {where}, "
            "expected a non-empty string")
    return v


@dataclass
class TableSpec:
    """One ``sources[].tables[]`` entry: a routed table mask with its key
    override (OpenLogReplicator.cpp:593-617 Schema::elements) plus the
    engine's lake paths for it."""
    name: str
    target: str
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    history: str | None = None
    history_open: str | None = None
    conversations: str | None = None


@dataclass
class EngineSetup:
    """Everything parse_config extracts: build tables with
    ``bootstrap_tables``, run with ``run_config``."""
    reader_type: str                      # 'batch' | 'online'
    cfg: EngineConfig
    tables: list[TableSpec]
    redo_logs: list[str] = field(default_factory=list)  # batch feed paths
    feed_dir: str | None = None           # online feed directory
    event_table: str | None = None
    # writer
    writer_type: str = "lake"              # 'lake' | 'file'
    change_stream_dir: str | None = None
    change_stream_format: str = "json"     # format.type
    message_mode: str = "op"               # format.message: 0 op / 1 tx
    max_ops_per_message: int | None = None  # writer max-messages (M1 split)
    fmt_bits: dict = field(default_factory=dict)  # scn/timestamp/xid/schema
    checkpoint_dir: str | None = None
    state_dir: str | None = None


def load_config(path: str) -> EngineSetup:
    try:
        with open(path) as f:
            doc = json.load(f)
    except json.JSONDecodeError as e:
        raise ConfigError(f"parsing {path}: {e}") from e
    return parse_config(doc)


def parse_config(doc: dict) -> EngineSetup:
    _check_keys(doc, "the document", required=("version", "sources",
                                               "targets"),
                noted={"dump-redo-log": "no raw redo to dump",
                       "trace": "log level is logging configuration",
                       "trace2": "log level is logging configuration",
                       "dump-raw-data": "no raw redo to dump"})
    if str(doc["version"]) != CONFIG_VERSION:
        # the reference refuses on version mismatch (OpenLogReplicator.cpp
        # :159-163) — silent reinterpretation of an old config is worse
        raise ConfigError(
            f"bad JSON, incompatible \"version\" value, expected: "
            f"{CONFIG_VERSION}, got: {doc['version']}")
    sources = doc["sources"]
    targets = doc["targets"]
    if not isinstance(sources, list) or len(sources) != 1:
        # the engine runs one pipeline per spark-submit; several sources =
        # several jobs (the reference multiplexes threads in one process)
        raise ConfigError(
            "bad JSON, \"sources\" must be an array of exactly 1 source "
            "(run one engine job per source)")
    if not isinstance(targets, list) or len(targets) != 1:
        raise ConfigError(
            "bad JSON, \"targets\" must be an array of exactly 1 target")

    src = sources[0]
    _check_keys(
        src, "source",
        required=("alias", "name", "reader", "format", "tables"),
        optional=("event-table", "lake"),
        noted=_NOTED_SOURCE_KEYS)

    # ---- reader --------------------------------------------------------
    rd = src["reader"]
    _check_keys(rd, "reader", required=("type",),
                optional=("redo-logs", "feed-dir", "max-files-per-trigger"),
                noted=_NOTED_READER_KEYS)
    reader_type = rd["type"]
    redo_logs: list[str] = []
    feed_dir = None
    if reader_type == "batch":
        # OpenLogReplicator.cpp:564-576 — required file list
        if "redo-logs" not in rd or not isinstance(rd["redo-logs"], list) \
                or not rd["redo-logs"]:
            raise ConfigError(
                "bad JSON, missing \"redo-logs\" element which is required "
                "in \"batch\" reader type")
        redo_logs = [str(p) for p in rd["redo-logs"]]
        for k in ("feed-dir", "max-files-per-trigger"):
            if k in rd:
                # the bounded replay reads the listed files in one pass —
                # a tail directory / trigger budget would silently do
                # nothing (the module's refuse-or-note contract)
                raise ConfigError(
                    f"bad JSON, \"{k}\" runs with the \"online\" reader "
                    "only")
    elif reader_type == "online":
        if not rd.get("feed-dir"):
            raise ConfigError(
                "bad JSON, missing \"feed-dir\" element which is required "
                "in \"online\" reader type (the feed directory the stream "
                "tails — the engine's V$ connection analog)")
        feed_dir = str(rd["feed-dir"])
        if "redo-logs" in rd:
            raise ConfigError(
                "bad JSON, \"redo-logs\" runs with the \"batch\" reader "
                "only (the \"online\" reader tails \"feed-dir\")")
    else:
        raise ConfigError(
            f"bad JSON, invalid reader \"type\" value: {reader_type!r}, "
            "expected one of: {batch, online}")

    # ---- format --------------------------------------------------------
    fm = src["format"]
    _check_keys(fm, "format", required=("type",),
                optional=("message", "scn", "timestamp", "xid", "schema"),
                noted={"char": "feed strings are UTF-8; charset transcode "
                               "is functions/charset.py at decode",
                       "unknown": "a typed feed has no undecodable values",
                       "column": "the stream keeps the feed's native "
                                 "COLUMN_FORMAT_CHANGED trim"})
    fmt_type = fm["type"]
    if fmt_type not in ("json", "protobuf"):
        raise ConfigError(
            f"bad JSON, invalid \"type\" value: {fmt_type!r}, expected one "
            "of: {json, protobuf}")
    # the reference's value ranges (OpenLogReplicator.cpp:277-352)
    message = _int_in(fm, "message", "format", 0, 1, 0)
    fmt_bits = {
        "scn_format": _int_in(fm, "scn", "format", 0, 3, 0),
        "timestamp_format": _int_in(fm, "timestamp", "format", 0, 3, 0),
        "xid_format": _int_in(fm, "xid", "format", 0, 1, 0),
        "schema_format": _int_in(fm, "schema", "format", 0, 7, 0),
    }

    # ---- tables --------------------------------------------------------
    tj = src["tables"]
    if not isinstance(tj, list) or not tj:
        raise ConfigError("bad JSON, field \"tables\" should be a "
                          "non-empty array")
    specs: list[TableSpec] = []
    for j, t in enumerate(tj):
        _check_keys(t, f"tables[{j}]", required=("table", "target"),
                    optional=("key", "history", "history-open",
                              "conversations"))
        # path/name knobs are strings — a non-string must fail HERE, not
        # as a TypeError inside bootstrap_tables after the target table
        # was already created (round-5 review finding)
        for k in ("table", "target", "history", "history-open",
                  "conversations"):
            _opt_str(t, k, f"tables[{j}]")
        key = t.get("key")
        if key is None:
            kc: tuple[str, ...] = ("conv_id", "turn_idx")
        else:
            # the reference takes "key" as a comma-separated string
            # (OpenLogReplicator.cpp:603-617); a JSON array also accepted
            parts = (key if isinstance(key, list)
                     else str(key).split(","))
            kc = tuple(p.strip() for p in parts if p.strip())
            if not kc:
                raise ConfigError(
                    f"bad JSON, empty \"key\" in tables[{j}]")
        if t.get("history-open") and not t.get("history"):
            raise ConfigError(
                f"bad JSON, \"history-open\" requires \"history\" in "
                f"tables[{j}]")
        if (t.get("history") or t.get("conversations")) and \
                kc != ("conv_id", "turn_idx"):
            # the SCD2/rollup bootstrap schemas key on the transcript key;
            # a custom-keyed table would get side outputs keyed on columns
            # it doesn't merge by — refuse rather than diverge
            raise ConfigError(
                f"bad JSON, side outputs in tables[{j}] require the "
                "default key (conv_id, turn_idx); bootstrap custom-keyed "
                "side tables with plans/scd2_apply.py directly")
        specs.append(TableSpec(
            name=str(t["table"]), target=str(t["target"]), key_cols=kc,
            history=t.get("history"), history_open=t.get("history-open"),
            conversations=t.get("conversations"),
        ))
    names = [s.name for s in specs]
    if len(set(names)) != len(names):
        raise ConfigError("bad JSON, duplicate \"table\" masks in "
                          "\"tables\"")

    # ---- lake (engine section: merge strategy + maintenance) ------------
    lk = src.get("lake", {})
    _check_keys(lk, "lake", optional=(
        "merge-mode", "num-buckets", "compact-every", "expire-every",
        "expire-keep"))
    merge_mode = lk.get("merge-mode", "cow")
    if merge_mode not in ("cow", "mor"):
        raise ConfigError(
            f"bad JSON, invalid \"merge-mode\" value: {merge_mode!r}, "
            "expected one of: {cow, mor}")
    if "expire-keep" in lk and "expire-every" not in lk:
        # the retention depth only matters when the cadence fires —
        # accepting it alone would silently never expire anything
        raise ConfigError(
            "bad JSON, \"expire-keep\" requires \"expire-every\" (the "
            "retention cadence that consumes it)")

    # ---- target / writer -------------------------------------------------
    tgt = targets[0]
    _check_keys(tgt, "target", required=("alias", "source", "writer"))
    if tgt["source"] != src["alias"]:
        # OpenLogReplicator.cpp:638-645 — targets bind to sources by alias
        raise ConfigError(
            f"bad JSON, couldn't find reader for \"source\" value: "
            f"{tgt['source']!r}")
    wr = tgt["writer"]
    _check_keys(
        wr, "writer", required=("type",),
        optional=("name", "start-scn", "start-seq", "start-time",
                  "start-time-rel", "start-now", "max-messages",
                  "checkpoint-dir", "state-dir"),
        noted=_NOTED_WRITER_KEYS)
    writer_type = wr["type"]
    if writer_type in ("kafka", "network", "zeromq"):
        hint = {
            "kafka": "no broker in this deployment surface — drive "
                     "sinks/kafka.py kafka_records + produce with your "
                     "producer factory",
            "network": "the TCP pull protocol is consumer-driven — serve "
                       "with sinks/network.py serve_change_stream",
            "zeromq": "documented descope (no pyzmq); the message grammar "
                      "is identical over sinks/network.py",
        }[writer_type]
        raise ConfigError(
            f"bad JSON, writer \"type\" {writer_type!r} is not run from "
            f"the config entry point: {hint}")
    if writer_type not in ("lake", "file"):
        raise ConfigError(
            f"bad JSON, invalid writer \"type\" value: {writer_type!r}, "
            "expected one of: {lake, file}")
    change_stream_dir = None
    if writer_type == "file":
        if not wr.get("name"):
            # the reference's file writer takes the output name the same way
            raise ConfigError(
                "bad JSON, missing \"name\" (output directory) in the "
                "\"file\" writer")
        change_stream_dir = str(wr["name"])

    start_now = wr.get("start-now", False)
    if not isinstance(start_now, bool):
        raise ConfigError(
            f"bad JSON, invalid \"start-now\" value: {start_now!r} in "
            "writer, expected a boolean")

    # ---- cross-section refusals (accepted-but-ignored is a CONFIG_FAIL) --
    # the change-stream side-channel, its format knobs, the event-table
    # command channel and the streaming state/checkpoint dirs all live in
    # the online pipeline; with the batch reader they would parse fine and
    # silently do nothing — the exact failure mode the module's docstring
    # promises to refuse (round-5 review finding).
    if reader_type == "batch":
        if writer_type == "file":
            raise ConfigError(
                "bad JSON, the \"file\" writer (the change-stream "
                "side-channel) runs with the \"online\" reader only")
        for j, s in enumerate(specs):
            if s.history or s.history_open or s.conversations:
                raise ConfigError(
                    f"bad JSON, side outputs in tables[{j}] run with the "
                    "\"online\" reader only (the bounded replay would not "
                    "maintain them)")
        if src.get("event-table"):
            raise ConfigError(
                "bad JSON, \"event-table\" (the command channel) runs "
                "with the \"online\" reader only")
        for k in ("state-dir", "checkpoint-dir"):
            if k in wr:
                raise ConfigError(
                    f"bad JSON, writer \"{k}\" runs with the \"online\" "
                    "reader only")
    # the change-stream knobs need an actual change stream: with the
    # "lake" writer there is none, whatever the reader — accepting them
    # would be the same silent no-op the batch refusals close (round-5
    # review finding: online + lake dropped every format bit)
    if writer_type != "file" and (message or any(fmt_bits.values())
                                  or "max-messages" in wr):
        raise ConfigError(
            "bad JSON, format knobs (\"message\", \"scn\", \"timestamp\", "
            "\"xid\", \"schema\", writer \"max-messages\") shape the "
            "change stream, which runs with the \"file\" writer only")
    if writer_type != "file" and fmt_type != "json":
        # a non-default serialization with no change stream to serialize
        # is the same silent no-op as the bits above
        raise ConfigError(
            "bad JSON, format \"type\" \"protobuf\" selects the "
            "change-stream serialization, which runs with the \"file\" "
            "writer only (the \"lake\" writer's sink is the MERGE target)")
    if "max-messages" in wr and message == 0:
        # the M1 split budget divides per-TRANSACTION messages; in per-op
        # mode every message is one op and the knob silently does nothing
        raise ConfigError(
            "bad JSON, \"max-messages\" splits per-transaction messages "
            "and requires format \"message\": 1")

    cfg = EngineConfig(
        key_cols=specs[0].key_cols,
        table_filter=tuple(names),
        num_buckets=_int_in(lk, "num-buckets", "lake", 1, 1 << 16, 16),
        merge_mode=merge_mode,
        compact_every=_opt_int(lk, "compact-every", "lake", 1, 1 << 31),
        expire_every=_opt_int(lk, "expire-every", "lake", 1, 1 << 31),
        expire_keep=_int_in(lk, "expire-keep", "lake", 1, 1 << 31, 5),
        start_scn=_opt_int(wr, "start-scn", "writer", 0, 1 << 62),
        start_seq=_opt_int(wr, "start-seq", "writer", 0, 1 << 62),
        start_ts=_opt_str(wr, "start-time", "writer"),
        start_relative_s=_opt_int(wr, "start-time-rel", "writer",
                                  0, 1 << 62),
        start_now=start_now,
        maxFilesPerTrigger=_int_in(rd, "max-files-per-trigger", "reader",
                                   1, 1 << 20, 8),
    )

    return EngineSetup(
        reader_type=reader_type, cfg=cfg, tables=specs,
        redo_logs=redo_logs, feed_dir=feed_dir,
        event_table=_opt_str(src, "event-table", "source"),
        writer_type=writer_type, change_stream_dir=change_stream_dir,
        change_stream_format=fmt_type,
        message_mode="tx" if message == 1 else "op",
        max_ops_per_message=_opt_int(wr, "max-messages", "writer",
                                     1, 1 << 31),
        fmt_bits=fmt_bits,
        checkpoint_dir=_opt_str(wr, "checkpoint-dir", "writer"),
        state_dir=_opt_str(wr, "state-dir", "writer"),
    )


def _make_fmt(setup: EngineSetup):
    """Build the sink's format-knob object from the config's format ints —
    only when any bit is set, so a default config keeps each sink's default
    wire bytes."""
    if not any(setup.fmt_bits.values()):
        return None
    if setup.change_stream_format == "protobuf":
        from openlogreplicator_spark.sinks.protobuf_stream import ProtoFormat
        return ProtoFormat(**setup.fmt_bits)
    from openlogreplicator_spark.sinks.json_stream import JsonFormat
    return JsonFormat(**setup.fmt_bits)


def bootstrap_tables(setup: EngineSetup) -> dict:
    """Open-or-create every lake table the config names. Returns
    {"targets": {name: LakeTable}, "history": {...}, "history_open": {...},
    "conversations": {...}} keyed by routed table name."""
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.plans.rollup_apply import (
        bootstrap_conversations_target,
    )
    from openlogreplicator_spark.plans.scd2_apply import (
        bootstrap_scd2_open_target,
        bootstrap_scd2_target,
    )

    def open_or(path, make):
        return LakeTable(path) if LakeTable.exists(path) else make(path)

    out: dict = {"targets": {}, "history": {}, "history_open": {},
                 "conversations": {}}
    for s in setup.tables:
        from openlogreplicator_spark.feed import TRANSCRIPTS_SCHEMA

        out["targets"][s.name] = open_or(
            s.target,
            lambda p, kc=s.key_cols: LakeTable.create(
                p, TRANSCRIPTS_SCHEMA, list(kc),
                num_buckets=setup.cfg.num_buckets,
                write_mode=setup.cfg.merge_mode))
        if s.history:
            out["history"][s.name] = open_or(
                s.history,
                lambda p: bootstrap_scd2_target(p, setup.cfg))
        if s.history_open:
            out["history_open"][s.name] = open_or(
                s.history_open,
                lambda p: bootstrap_scd2_open_target(p, setup.cfg))
        if s.conversations:
            out["conversations"][s.name] = open_or(
                s.conversations,
                lambda p: bootstrap_conversations_target(p, setup.cfg))
    return out


def run_config(spark, setup: EngineSetup, batch_id: int = 0,
               available_now: bool = True) -> dict:
    """Execute the configured pipeline — the Spark analog of the reference's
    main() building analyzer + writer threads from the parsed document and
    blocking until done (OpenLogReplicator.cpp:826-831).

    batch reader -> one bounded replay over the listed feed files
    (replay_batch_multi routes per table); online reader -> the streaming
    pipeline with the configured side outputs and change-stream channel
    (available_now=True drains the feed then stops — pass False for a
    continuous tail). Returns {"tables": ..., "summaries"/"query": ...}.
    """
    # refuse BEFORE bootstrap_tables: a refused config must not leave
    # freshly created lake tables behind on disk (round-5 review finding —
    # a later corrected run would silently open them with the refused run's
    # num_buckets/merge-mode). parse_config already enforces these for
    # configs it produced; this guards hand-built EngineSetups too.
    if setup.reader_type == "batch":
        if setup.change_stream_dir or any(
                s.history or s.history_open or s.conversations
                for s in setup.tables):
            # same contract as job.py replay mode: accepting a side output
            # the bounded path won't maintain would silently diverge
            raise ConfigError(
                "bad JSON, side outputs (\"file\" writer, \"history\", "
                "\"conversations\") run with the \"online\" reader only")
    elif not (setup.state_dir and setup.checkpoint_dir):
        raise ConfigError(
            "bad JSON, the \"online\" reader requires writer "
            "\"state-dir\" and \"checkpoint-dir\"")

    tabs = bootstrap_tables(setup)

    if setup.reader_type == "batch":
        from openlogreplicator_spark.feed import CHANGE_EVENT_SCHEMA
        from openlogreplicator_spark.plans.replay import replay_batch_multi

        events = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(
            *setup.redo_logs)
        summaries = replay_batch_multi(
            spark, events, tabs["targets"], setup.cfg, batch_id=batch_id)
        return {"tables": tabs, "summaries": summaries}

    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    single = len(setup.tables) == 1
    pipe = CDCStreamPipeline(
        (next(iter(tabs["targets"].values())) if single
         else tabs["targets"]),
        setup.cfg, setup.state_dir,
        change_stream_dir=setup.change_stream_dir,
        change_stream_format=setup.change_stream_format,
        change_stream_message_mode=setup.message_mode,
        change_stream_fmt=_make_fmt(setup),
        change_stream_max_ops=setup.max_ops_per_message,
        history_table=_side(tabs["history"], single),
        history_open_table=_side(tabs["history_open"], single),
        conversations_table=_side(tabs["conversations"], single),
    )
    if setup.event_table:
        pipe.control_table = setup.event_table
    q = pipe.run_stream(spark, setup.feed_dir, setup.checkpoint_dir,
                        available_now=available_now)
    if available_now:
        pipe.run_until_shutdown(q)
        pipe.detach_metrics()
    return {"tables": tabs, "pipeline": pipe, "query": q}


def _side(d: dict, single: bool):
    """Side-output argument shape: the single-table pipeline takes a bare
    LakeTable, routed mode a per-table dict."""
    if not d:
        return None
    return next(iter(d.values())) if single else d
