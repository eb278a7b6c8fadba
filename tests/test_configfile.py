"""Config-file entry point: the OpenLogReplicator.json analog
(openlogreplicator_spark/configfile.py; reference parse:
OpenLogReplicator.cpp:109-190 CONFIG_FAIL, :193-626 sources, :628-824
targets). Unknown fields refuse, reference-shaped knobs port with a note,
and the parsed setup drives both the bounded batch replay and the streaming
pipeline with side outputs + the "message":0/1 stream shapes."""

import glob
import json
import os

import pytest

from openlogreplicator_spark.configfile import (
    ConfigError,
    load_config,
    parse_config,
    run_config,
)


def _doc(**over):
    """A minimal valid batch config; tests override pieces."""
    d = {
        "version": "1.0",
        "sources": [{
            "alias": "S1",
            "name": "feed",
            "reader": {"type": "batch", "redo-logs": ["/tmp/x"]},
            "format": {"type": "json"},
            "tables": [{"table": "transcripts", "target": "/tmp/t"}],
        }],
        "targets": [{
            "alias": "T1", "source": "S1", "writer": {"type": "lake"},
        }],
    }
    d.update(over)
    return d


def test_parse_refusals():
    cases = [
        # (mutator, message fragment)
        (lambda d: d.pop("version"), "missing \"version\""),
        (lambda d: d.update(version="9.9"), "incompatible \"version\""),
        (lambda d: d.update(bogus=1), "unknown field \"bogus\""),
        (lambda d: d["sources"][0].update(bogus=1), "unknown field"),
        (lambda d: d["sources"][0]["reader"].pop("redo-logs"),
         "missing \"redo-logs\""),
        (lambda d: d["sources"][0]["reader"].update(type="o c i"),
         "invalid reader \"type\""),
        (lambda d: d["sources"][0]["format"].update(type="xml"),
         "invalid \"type\""),
        (lambda d: d["sources"][0]["format"].update(message=7),
         "invalid \"message\""),
        (lambda d: d["sources"][0]["format"].update(schema=9),
         "invalid \"schema\""),
        (lambda d: d["sources"][0]["tables"][0].update(key="  , "),
         "empty \"key\""),
        (lambda d: d["sources"][0]["tables"].append(
            {"table": "transcripts", "target": "/tmp/u"}),
         "duplicate \"table\""),
        (lambda d: d["sources"][0]["tables"][0].update(
            {"history-open": "/tmp/o"}), "requires \"history\""),
        (lambda d: d["sources"][0]["tables"][0].update(
            {"key": "doc_id", "history": "/tmp/h"}),
         "require the default key"),
        (lambda d: d["targets"][0].update(source="NOPE"),
         "couldn't find reader"),
        (lambda d: d["targets"][0]["writer"].update(type="kafka"),
         "producer factory"),
        (lambda d: d["targets"][0]["writer"].update(type="zeromq"),
         "descope"),
        (lambda d: d["targets"][0]["writer"].update(type="carrier-pigeon"),
         "invalid writer \"type\""),
        (lambda d: d["targets"][0]["writer"].update(type="file"),
         "missing \"name\""),
    ]
    for mutate, frag in cases:
        d = _doc()
        mutate(d)
        with pytest.raises(ConfigError, match=".*") as ei:
            parse_config(d)
        assert frag in str(ei.value), (frag, str(ei.value))

    # online reader requires the feed dir
    d = _doc()
    d["sources"][0]["reader"] = {"type": "online"}
    with pytest.raises(ConfigError) as ei:
        parse_config(d)
    assert "feed-dir" in str(ei.value)


def test_reference_shaped_knobs_port_with_notes():
    """Knobs a real OpenLogReplicator.json carries whose job Spark owns are
    accepted (logged, not refused) so a reference config ports unchanged."""
    d = _doc()
    d["dump-redo-log"] = 1
    d["trace2"] = 2
    d["sources"][0].update({"flags": 32, "memory-min-mb": 64,
                            "memory-max-mb": 1024,
                            "redo-read-sleep": 10000})
    d["sources"][0]["reader"].update({"disable-checks": 1,
                                      "redo-copy-path": "/x"})
    d["sources"][0]["format"].update({"char": 1, "unknown": 1, "column": 2})
    d["targets"][0]["writer"].update({"poll-interval": 100000,
                                      "checkpoint-interval": 10,
                                      "queue-size": 65536})
    setup = parse_config(d)
    assert setup.reader_type == "batch"
    # the reference's comma-separated key string parses like :603-617
    d = _doc()
    d["sources"][0]["tables"][0]["key"] = "CONV_ID, TURN_IDX"
    assert parse_config(d).tables[0].key_cols == ("CONV_ID", "TURN_IDX")


def test_writer_start_and_format_bits_map():
    # format/message knobs shape the change stream -> online + file writer
    d = _doc()
    d["sources"][0]["reader"] = {"type": "online", "feed-dir": "/tmp/feed"}
    d["sources"][0]["format"].update(
        {"type": "protobuf", "message": 1, "scn": 1, "timestamp": 1,
         "xid": 1, "schema": 5})
    d["targets"][0]["writer"].update(
        {"type": "file", "name": "/tmp/stream",
         "start-scn": 1000, "start-seq": 2, "max-messages": 100,
         "state-dir": "/tmp/state", "checkpoint-dir": "/tmp/ckpt"})
    s = parse_config(d)
    assert s.change_stream_format == "protobuf"
    assert s.message_mode == "tx" and s.max_ops_per_message == 100
    assert s.cfg.start_scn == 1000 and s.cfg.start_seq == 2
    assert s.fmt_bits == {"scn_format": 1, "timestamp_format": 1,
                          "xid_format": 1, "schema_format": 5}
    # the batch reader still owns the bounded-start knobs
    d = _doc()
    d["targets"][0]["writer"].update({"start-scn": 1000})
    assert parse_config(d).cfg.start_scn == 1000


def test_scalar_knobs_validated_at_parse():
    """Writer/lake scalar knobs fail at parse on type/range like the format
    ints — a JSON string \"5000\" or a bool must not flow into Spark filter
    construction (round-5 review finding: '\"expire-every\": true' made the
    retention cadence fire every single batch)."""
    cases = [
        (lambda d: d["targets"][0]["writer"].update({"start-scn": "5000"}),
         "start-scn"),
        (lambda d: d["targets"][0]["writer"].update({"start-seq": -1}),
         "start-seq"),
        (lambda d: d["targets"][0]["writer"].update({"start-time": 12345}),
         "start-time"),
        (lambda d: d["targets"][0]["writer"].update(
            {"start-time-rel": 1.5}), "start-time-rel"),
        (lambda d: d["targets"][0]["writer"].update({"start-now": 1}),
         "start-now"),
        (lambda d: d["sources"][0].update(
            {"lake": {"expire-every": True}}), "expire-every"),
        (lambda d: d["sources"][0].update(
            {"lake": {"compact-every": -3}}), "compact-every"),
        (lambda d: d["sources"][0].update(
            {"lake": {"num-buckets": 0}}), "num-buckets"),
        (lambda d: d["sources"][0].update(
            {"lake": {"expire-every": 2, "expire-keep": "5"}}),
         "expire-keep"),
    ]
    for mutate, frag in cases:
        d = _doc()
        mutate(d)
        with pytest.raises(ConfigError) as ei:
            parse_config(d)
        assert frag in str(ei.value), (frag, str(ei.value))


def test_batch_reader_refuses_online_only_knobs():
    """Accepted-but-ignored is a CONFIG_FAIL: every knob the batch path
    would silently drop refuses at parse (round-5 review finding), and a
    refused config leaves NO freshly bootstrapped tables behind."""
    cases = [
        (lambda d: d["sources"][0].update({"event-table": "_control"}),
         "event-table"),
        (lambda d: d["targets"][0]["writer"].update(
            {"state-dir": "/tmp/s"}), "state-dir"),
        (lambda d: d["targets"][0]["writer"].update(
            {"checkpoint-dir": "/tmp/c"}), "checkpoint-dir"),
        (lambda d: d["sources"][0]["format"].update({"scn": 1}),
         "change stream"),
        (lambda d: d["sources"][0]["format"].update({"message": 1}),
         "change stream"),
        (lambda d: d["targets"][0]["writer"].update({"max-messages": 10}),
         "change stream"),
        (lambda d: d["sources"][0]["reader"].update(
            {"feed-dir": "/tmp/f"}), "feed-dir"),
        (lambda d: d["sources"][0]["reader"].update(
            {"max-files-per-trigger": 4}), "max-files-per-trigger"),
        (lambda d: d["sources"][0]["tables"][0].update(
            {"history": "/tmp/h"}), "side outputs"),
    ]
    for mutate, frag in cases:
        d = _doc()
        mutate(d)
        with pytest.raises(ConfigError) as ei:
            parse_config(d)
        assert frag in str(ei.value), (frag, str(ei.value))
    # and online refuses the batch-only file list
    d = _doc()
    d["sources"][0]["reader"] = {"type": "online", "feed-dir": "/tmp/f",
                                 "redo-logs": ["/tmp/x"]}
    d["targets"][0]["writer"].update({"state-dir": "/tmp/s",
                                      "checkpoint-dir": "/tmp/c"})
    with pytest.raises(ConfigError) as ei:
        parse_config(d)
    assert "redo-logs" in str(ei.value)


def test_lake_writer_refuses_change_stream_knobs():
    """The format bits need an actual change stream: online reader + lake
    writer accepted every bit and silently dropped them all (round-5 review
    finding); max-messages additionally requires per-tx message mode (the
    per-op stream has nothing to split)."""
    def online(d):
        d["sources"][0]["reader"] = {"type": "online",
                                     "feed-dir": "/tmp/f"}
        d["targets"][0]["writer"].update({"state-dir": "/tmp/s",
                                          "checkpoint-dir": "/tmp/c"})
        return d

    for mutate in (
            lambda d: d["sources"][0]["format"].update({"schema": 1}),
            lambda d: d["sources"][0]["format"].update({"message": 1}),
            lambda d: d["targets"][0]["writer"].update(
                {"max-messages": 9})):
        d = online(_doc())
        mutate(d)
        with pytest.raises(ConfigError) as ei:
            parse_config(d)
        assert "file" in str(ei.value)
    # max-messages with the per-op stream: refused even on the file writer
    d = online(_doc())
    d["targets"][0]["writer"].update({"type": "file", "name": "/tmp/cs",
                                      "max-messages": 9})
    with pytest.raises(ConfigError) as ei:
        parse_config(d)
    assert "message" in str(ei.value)
    # format "type": "protobuf" without a change stream: same refusal
    d = online(_doc())
    d["sources"][0]["format"] = {"type": "protobuf"}
    with pytest.raises(ConfigError) as ei:
        parse_config(d)
    assert "file" in str(ei.value)
    # the fixed combination parses
    d = online(_doc())
    d["sources"][0]["format"].update({"message": 1})
    d["targets"][0]["writer"].update({"type": "file", "name": "/tmp/cs",
                                      "max-messages": 9})
    assert parse_config(d).max_ops_per_message == 9


def test_expire_keep_requires_cadence():
    """expire-keep without expire-every would silently never expire —
    refuse the pairing (round-5 review finding)."""
    d = _doc()
    d["sources"][0]["lake"] = {"expire-keep": 2}
    with pytest.raises(ConfigError, match="expire-every"):
        parse_config(d)


def test_sections_must_be_objects():
    """A string/array where a section object belongs fails with the
    reference-style ConfigError, not a raw TypeError (round-5 review
    finding: '"reader": "batch"' ran a substring test and crashed)."""
    for mutate in (
            lambda d: d["sources"][0].update({"reader": "batch"}),
            lambda d: d["sources"][0].update({"lake": []}),
            lambda d: d["sources"][0].update({"format": "json"}),
            lambda d: d["sources"][0]["tables"].__setitem__(0, "transcripts"),
            lambda d: d["targets"][0].update({"writer": "lake"})):
        d = _doc()
        mutate(d)
        with pytest.raises(ConfigError, match="must be an object"):
            parse_config(d)


def test_path_knobs_must_be_strings():
    """tables[] path knobs and event-table fail at parse on non-string
    values instead of crashing mid-bootstrap with the target table already
    created (round-5 review finding)."""
    cases = [
        lambda d: d["sources"][0]["tables"][0].update({"history": 123}),
        lambda d: d["sources"][0]["tables"][0].update({"target": None}),
        lambda d: d["sources"][0]["tables"][0].update({"table": 7}),
        lambda d: d["sources"][0]["tables"][0].update(
            {"conversations": ""}),
    ]
    for mutate in cases:
        d = _doc()
        mutate(d)
        with pytest.raises(ConfigError, match="non-empty string"):
            parse_config(d)
    d = _doc()
    d["sources"][0]["reader"] = {"type": "online", "feed-dir": "/tmp/f"}
    d["sources"][0]["event-table"] = 777
    d["targets"][0]["writer"].update({"state-dir": "/tmp/s",
                                      "checkpoint-dir": "/tmp/c"})
    with pytest.raises(ConfigError, match="event-table"):
        parse_config(d)


def test_refused_run_config_bootstraps_nothing(spark, tmp_path):
    """run_config's own refusals fire BEFORE bootstrap_tables, so a refused
    hand-built EngineSetup leaves no half-configured lake tables on disk
    (round-5 review finding: the batch side-output refusal used to run
    after bootstrap)."""
    from openlogreplicator_spark.configfile import EngineSetup, TableSpec
    from openlogreplicator_spark.config import EngineConfig

    target = tmp_path / "t"
    hist = tmp_path / "h"
    setup = EngineSetup(
        reader_type="batch", cfg=EngineConfig(num_buckets=4),
        tables=[TableSpec(name="transcripts", target=str(target),
                          history=str(hist))],
        redo_logs=["/tmp/nonexistent"])
    with pytest.raises(ConfigError):
        run_config(spark, setup)
    assert not target.exists() and not hist.exists()
    # online without state/checkpoint dirs: same guarantee
    setup2 = EngineSetup(
        reader_type="online", cfg=EngineConfig(num_buckets=4),
        tables=[TableSpec(name="transcripts", target=str(target))],
        feed_dir="/tmp/feed")
    with pytest.raises(ConfigError):
        run_config(spark, setup2)
    assert not target.exists()


def test_batch_config_replays_to_oracle(spark, tmp_path):
    """A batch-reader config end-to-end: the configured replay's final
    table state equals the sequential oracle of the feed."""
    from openlogreplicator_spark.feed import (
        generate_change_events,
        sequential_oracle,
    )

    events = generate_change_events(spark, n_txs=120, n_convs=15, seed=11)
    feed_path = str(tmp_path / "redo")
    events.write.parquet(feed_path)

    d = _doc()
    d["sources"][0]["reader"]["redo-logs"] = [feed_path]
    d["sources"][0]["tables"][0]["target"] = str(tmp_path / "tbl")
    d["sources"][0]["lake"] = {"num-buckets": 4}
    cfg_path = str(tmp_path / "engine.json")
    with open(cfg_path, "w") as f:
        json.dump(d, f)

    setup = load_config(cfg_path)
    out = run_config(spark, setup, batch_id=1)
    table = out["tables"]["targets"]["transcripts"]
    got = (table.read(spark).toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
           .astype({"turn_idx": "int64"}))
    want = (sequential_oracle(events.toPandas()).drop(columns=["meta"])
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            .astype({"turn_idx": "int64"}))
    assert len(got) == len(want)
    assert (got["text"].values == want["text"].values).all()

    # side outputs refuse on the bounded path (job.py replay parity)
    d["sources"][0]["tables"][0]["history"] = str(tmp_path / "h")
    with pytest.raises(ConfigError) as ei:
        run_config(spark, parse_config(d), batch_id=2)
    assert "online" in str(ei.value)


def test_online_config_with_side_outputs_and_op_stream(spark, tmp_path):
    """An online-reader config: streaming apply with SCD2 history + open
    store + conversations view, retention cadence, and a "message":0 file
    writer — the bracket stream lands per batch and the side outputs agree
    with the primary."""
    from openlogreplicator_spark.feed import (
        generate_change_events,
        pandas_to_events_df,
    )

    feed = generate_change_events(spark, n_txs=100, n_convs=12, seed=23)
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    n, k = len(pdf), 3
    for i in range(k):
        chunk = pandas_to_events_df(
            spark, pdf.iloc[(n * i) // k:(n * (i + 1)) // k])
        chunk.coalesce(1).write.parquet(str(tmp_path / f"stage_{i}"))
        src = glob.glob(str(tmp_path / f"stage_{i}" / "part-*.parquet"))[0]
        os.rename(src, str(feed_dir / f"evt_{i:03d}.parquet"))

    d = _doc()
    d["sources"][0]["reader"] = {"type": "online",
                                 "feed-dir": str(feed_dir),
                                 "max-files-per-trigger": 1}
    d["sources"][0]["format"] = {"type": "json", "message": 0}
    d["sources"][0]["tables"][0].update({
        "target": str(tmp_path / "tbl"),
        "history": str(tmp_path / "hist"),
        "history-open": str(tmp_path / "open"),
        "conversations": str(tmp_path / "conv"),
    })
    d["sources"][0]["lake"] = {"num-buckets": 4, "expire-every": 2,
                               "expire-keep": 2}
    d["targets"][0]["writer"] = {
        "type": "file", "name": str(tmp_path / "stream"),
        "state-dir": str(tmp_path / "state"),
        "checkpoint-dir": str(tmp_path / "ckpt"),
    }
    out = run_config(spark, parse_config(d), available_now=True)

    table = out["tables"]["targets"]["transcripts"]
    hist = out["tables"]["history"]["transcripts"]
    open_t = out["tables"]["history_open"]["transcripts"]
    conv = out["tables"]["conversations"]["transcripts"]

    rows = table.read(spark).count()
    assert rows > 0
    # open versions track the primary exactly
    assert hist.read(spark).where("is_current").count() == rows
    assert open_t.read(spark).count() == rows
    assert conv.read(spark).count() > 0
    # retention cadence ran: fewer manifests than commits
    n_manifests = len(glob.glob(str(tmp_path / "tbl" / "_manifests" /
                                    "v*.json")))
    assert n_manifests <= 4
    # "message":0 bracket stream: begin/commit messages present per batch
    lines = []
    for p in glob.glob(str(tmp_path / "stream" / "batch_*" / "part-*")):
        with open(p) as f:
            lines += [ln for ln in f.read().splitlines() if ln]
    assert any('"op":"begin"' in ln for ln in lines)
    assert any('"op":"commit"' in ln for ln in lines)
    assert sum('"payload":[{"op":"begin"}]' in ln for ln in lines) == \
        sum('"payload":[{"op":"commit"}]' in ln for ln in lines)


def test_online_config_multi_table_routed(spark, tmp_path):
    """Two tables[] masks in one source: events route by their `table`
    column to per-table targets with per-table side outputs (history on one
    table only), matching the reference's many-masks-one-source shape
    (OpenLogReplicator.cpp:593-617)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from openlogreplicator_spark.feed import (
        generate_change_events,
        pandas_to_events_df,
        sequential_oracle,
    )

    feed = generate_change_events(spark, n_txs=80, n_convs=10, seed=41)
    is_dml = F.col("op").isin("I", "U", "D")
    routed = feed.withColumn(
        "table",
        F.when(~is_dml, F.col("table")).otherwise(
            F.when(F.col("scn") % 2 == 0, F.lit("transcripts"))
            .otherwise(F.lit("notes"))),
    )
    pdf = routed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    n, k = len(pdf), 2
    for i in range(k):
        chunk = pandas_to_events_df(
            spark, pdf.iloc[(n * i) // k:(n * (i + 1)) // k])
        chunk.coalesce(1).write.parquet(str(tmp_path / f"stage_{i}"))
        src = glob.glob(str(tmp_path / f"stage_{i}" / "part-*.parquet"))[0]
        os.rename(src, str(feed_dir / f"evt_{i:03d}.parquet"))

    d = _doc()
    d["sources"][0]["reader"] = {"type": "online",
                                 "feed-dir": str(feed_dir)}
    d["sources"][0]["tables"] = [
        {"table": "transcripts", "target": str(tmp_path / "t1"),
         "history": str(tmp_path / "h1")},
        {"table": "notes", "target": str(tmp_path / "t2")},
    ]
    d["sources"][0]["lake"] = {"num-buckets": 4}
    d["targets"][0]["writer"] = {
        "type": "lake",
        "state-dir": str(tmp_path / "state"),
        "checkpoint-dir": str(tmp_path / "ckpt"),
    }
    out = run_config(spark, parse_config(d), available_now=True)

    # each routed target equals the sequential oracle of its slice
    for name, tkey in (("transcripts", "t1"), ("notes", "t2")):
        table = out["tables"]["targets"][name]
        mask = (~pdf["op"].isin(["I", "U", "D"])) | (pdf["table"] == name)
        want = (sequential_oracle(pdf[mask]).drop(columns=["meta"])
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))
        got = (table.read(spark).toPandas()
               .sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        assert len(got) == len(want), name
        assert (got["text"].values == want["text"].values).all(), name

    # per-table side output: only transcripts carries a history, and its
    # open versions equal that routed slice's final state
    assert "notes" not in out["tables"]["history"]
    hist = out["tables"]["history"]["transcripts"]
    cur = hist.read(spark).where("is_current").count()
    assert cur == out["tables"]["targets"]["transcripts"].read(spark).count()
