"""spark-submit entry point for the CDC engine.

Deploy surface per the north rule: ``spark-submit --py-files engine.zip job.py``.

Modes:
  replay  — bounded batch replay (OLR reader.type="batch" analog,
            OracleAnalyzerBatch.cpp:42-57): synthesize/read a change feed,
            apply it to the lake target, print snapshot summaries, then retry
            the same batch id to demonstrate idempotent skip.
  stream  — Structured Streaming tail (OLR reader.type="online" analog):
            consume scn-ordered feed files from --feed-dir with exactly-once
            apply + checkpoint resume.

Examples:
  spark-submit --py-files /tmp/engine.zip job.py replay /tmp/target_tbl
  spark-submit --py-files /tmp/engine.zip job.py replay /tmp/tbl --n-txs 20000
  spark-submit --py-files /tmp/engine.zip job.py stream /tmp/tbl \
      --feed-dir /tmp/feed --checkpoint /tmp/ckpt --state-dir /tmp/state
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def build_spark(app: str) -> SparkSession:
    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def main(argv: list[str]) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["replay", "stream", "config"])
    p.add_argument("target", help="lake table path (replay/stream) or the "
                                  "engine config JSON path (config mode — "
                                  "the OpenLogReplicator.json analog, see "
                                  "openlogreplicator_spark/configfile.py)")
    p.add_argument("--n-txs", type=int)  # replay default 2000
    p.add_argument("--with-ddl", action="store_true")
    p.add_argument("--feed-dir")
    p.add_argument("--checkpoint")
    p.add_argument("--state-dir")
    p.add_argument("--batch-id", type=int)  # replay/config default 0
    # start-position modes (OLR start by scn/seq/timestamp,
    # OpenLogReplicator.cpp:661-704) — pushed-down feed predicates
    p.add_argument("--start-scn", type=int)
    p.add_argument("--start-seq", type=int)
    p.add_argument("--start-ts")
    # W1/W2 analog: serialize committed transactions as messages
    p.add_argument("--change-stream-dir")
    # message serialization: json (OutputBufferJson) or protobuf
    # (OutputBufferProtobuf — the reference's "format":"protobuf" writer)
    p.add_argument("--change-stream-format", choices=["json", "protobuf"],
                   default="json")
    # SCD2 side-output: maintain a version-history lake table per batch
    p.add_argument("--history-dir")
    # SCD2 open-version store: O(live keys) seed reads, flat as closed
    # history grows (round 4)
    p.add_argument("--history-open-dir")
    # materialized view: per-conversation rollup maintained per batch
    p.add_argument("--conversations-dir")
    # table maintenance: expire superseded snapshots — replay mode runs one
    # expiry after the run; stream mode expires the primary + all side
    # outputs every --expire-every batches, retaining --expire-keep each
    p.add_argument("--expire-keep", type=int)
    p.add_argument("--expire-every", type=int)
    # MERGE strategy (Iceberg write.merge.mode): cow rewrites touched
    # buckets, mor appends data + equality-delete files (write-optimized);
    # --compact-every folds MoR deltas back every N streaming batches
    p.add_argument("--merge-mode", choices=["cow", "mor"], default="cow")
    p.add_argument("--compact-every", type=int)
    args = p.parse_args(argv)

    if args.mode == "replay":
        # side outputs are maintained by the streaming pipeline's per-batch
        # hooks; accepting these here and doing nothing would look like a
        # successful run with silently-missing tables (same contract as the
        # pipeline's own refuse-at-construction rule). Checked before the
        # Spark session builds — fail in milliseconds, not after JVM warmup.
        ignored = [
            f for f, v in (("--history-dir", args.history_dir),
                           ("--history-open-dir", args.history_open_dir),
                           ("--conversations-dir", args.conversations_dir),
                           ("--change-stream-dir", args.change_stream_dir),
                           ("--expire-every", args.expire_every))
            if v
        ]
        if ignored:
            p.error(f"{' '.join(ignored)}: side outputs and per-batch "
                    "cadences run in stream mode only (replay is the "
                    "bounded primary-table path; use --expire-keep for "
                    "its one-shot post-run expiry)")
        # same accepted-but-ignored contract for the streaming-only knobs:
        # replay generates its own bounded feed and runs one batch
        ignored = [
            f for f, v in (("--feed-dir", args.feed_dir),
                           ("--checkpoint", args.checkpoint),
                           ("--state-dir", args.state_dir))
            if v
        ]
        if ignored:
            p.error(f"{' '.join(ignored)}: stream-mode knobs (replay "
                    "generates a bounded synthetic feed and keeps no "
                    "streaming state)")
        if args.compact_every is not None:
            p.error("--compact-every: streaming MoR compaction cadence "
                    "(replay runs one post-run COMPACT under "
                    "--merge-mode mor)")
        if args.change_stream_format != "json":
            p.error("--change-stream-format: meaningless without "
                    "--change-stream-dir, which runs in stream mode only")

    if args.mode == "stream":
        # the feed-generation knobs drive replay's synthetic feed only;
        # stream mode tails --feed-dir, and streaming assigns batch ids
        ignored = [
            f for f, v in (("--n-txs", args.n_txs),
                           ("--with-ddl", args.with_ddl or None),
                           ("--batch-id", args.batch_id))
            if v is not None
        ]
        if ignored:
            p.error(f"{' '.join(ignored)}: replay-mode knobs (stream "
                    "tails --feed-dir and assigns batch ids itself)")
        if args.expire_keep is not None and args.expire_every is None:
            p.error("--expire-keep requires --expire-every in stream mode "
                    "(the retention cadence that consumes it; replay mode "
                    "uses --expire-keep alone for its one-shot post-run "
                    "expiry)")

    if args.mode == "config":
        # the config FILE owns every engine knob (the reference's one-JSON
        # UX); a CLI flag beside it would be accepted-but-ignored — refuse,
        # pointing at the config section that owns it. --batch-id stays: it
        # is run_config's own parameter, not a config-file field.
        owned = [
            f for f, v in (
                ("--n-txs", args.n_txs),
                ("--with-ddl", args.with_ddl or None),
                ("--feed-dir", args.feed_dir),
                ("--checkpoint", args.checkpoint),
                ("--state-dir", args.state_dir),
                ("--start-scn", args.start_scn),
                ("--start-seq", args.start_seq),
                ("--start-ts", args.start_ts),
                ("--change-stream-dir", args.change_stream_dir),
                ("--history-dir", args.history_dir),
                ("--history-open-dir", args.history_open_dir),
                ("--conversations-dir", args.conversations_dir),
                ("--expire-keep", args.expire_keep),
                ("--expire-every", args.expire_every),
                ("--compact-every", args.compact_every),
            ) if v is not None
        ]
        if args.merge_mode != "cow":
            owned.append("--merge-mode")
        if args.change_stream_format != "json":
            owned.append("--change-stream-format")
        if owned:
            p.error(f"{' '.join(owned)}: config mode takes every engine "
                    "knob from the JSON file (reader/format/tables/lake/"
                    "writer sections) — move it there")
        # config-file entry point (the reference's only UX: main() builds
        # everything from OpenLogReplicator.json). Parse BEFORE the Spark
        # session: a bad config fails in milliseconds, like CONFIG_FAIL.
        from openlogreplicator_spark.configfile import load_config, run_config

        setup = load_config(args.target)
        spark = build_spark("olr-cdc-config")
        out = run_config(spark, setup, batch_id=args.batch_id or 0)
        for name, table in out["tables"]["targets"].items():
            print("ROWS", name, table.read(spark).count())
        for section in ("history", "conversations"):
            for name, table in out["tables"][section].items():
                print(section.upper(), name, table.read(spark).count())
        if "summaries" in out:
            for tname, ss in out["summaries"].items():
                for s in ss:
                    print("APPLY", tname, json.dumps(s))
        spark.stop()
        return

    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.feed import generate_change_events
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.plans.replay import bootstrap_target, replay_batch

    spark = build_spark(f"olr-cdc-{args.mode}")
    cfg = EngineConfig(
        start_scn=args.start_scn, start_seq=args.start_seq,
        start_ts=args.start_ts,
        merge_mode=args.merge_mode, compact_every=args.compact_every,
        expire_every=args.expire_every,
        expire_keep=args.expire_keep or 5,
    )

    if args.mode == "replay":
        table = (
            LakeTable(args.target)
            if LakeTable.exists(args.target)
            else bootstrap_target(args.target, cfg)
        )
        events = generate_change_events(
            spark, n_txs=2000 if args.n_txs is None else args.n_txs,
            with_ddl=args.with_ddl
        )
        summaries = replay_batch(
            spark, events, table, cfg, batch_id=args.batch_id or 0
        )
        for s in summaries:
            print("APPLY", json.dumps(s))
        # idempotent retry: the same batch id must be skipped (write-audit)
        retry = replay_batch(spark, events, table, cfg,
                             batch_id=args.batch_id or 0)
        for s in retry:
            print("RETRY", json.dumps(s))
        print("ROWS", table.read(spark).count())
        print("SNAPSHOTS", json.dumps(table.snapshots()[-3:]))
        if args.merge_mode == "mor":
            print("COMPACT", json.dumps(table.compact(spark)))
        if args.expire_keep:
            print("EXPIRE", json.dumps(
                table.expire_snapshots(keep_last=args.expire_keep)))
    else:
        from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

        if not (args.feed_dir and args.checkpoint and args.state_dir):
            p.error("stream mode requires --feed-dir --checkpoint --state-dir")
        if args.history_open_dir and not args.history_dir:
            # same silently-missing-table contract as the replay guard: the
            # open store only rides along with its history
            p.error("--history-open-dir requires --history-dir")
        table = (
            LakeTable(args.target)
            if LakeTable.exists(args.target)
            else bootstrap_target(args.target, cfg)
        )
        history = None
        history_open = None
        if args.history_dir:
            from openlogreplicator_spark.plans.scd2_apply import (
                bootstrap_scd2_open_target,
                bootstrap_scd2_target,
            )

            history = (
                LakeTable(args.history_dir)
                if LakeTable.exists(args.history_dir)
                else bootstrap_scd2_target(args.history_dir, cfg)
            )
            if args.history_open_dir:
                history_open = (
                    LakeTable(args.history_open_dir)
                    if LakeTable.exists(args.history_open_dir)
                    else bootstrap_scd2_open_target(args.history_open_dir, cfg)
                )
        conversations = None
        if args.conversations_dir:
            from openlogreplicator_spark.plans.rollup_apply import (
                bootstrap_conversations_target,
            )

            conversations = (
                LakeTable(args.conversations_dir)
                if LakeTable.exists(args.conversations_dir)
                else bootstrap_conversations_target(
                    args.conversations_dir, cfg)
            )
        pipe = CDCStreamPipeline(
            table, cfg, args.state_dir,
            change_stream_dir=args.change_stream_dir,
            change_stream_format=args.change_stream_format,
            history_table=history,
            history_open_table=history_open,
            conversations_table=conversations,
        )
        q = pipe.run_stream(
            spark, args.feed_dir, args.checkpoint, available_now=True
        )
        q.awaitTermination()
        print("ROWS", table.read(spark).count())
        if history is not None:
            print("HISTORY_VERSIONS", history.read(spark).count(),
                  "OPEN", history.read(spark).where("is_current").count())
        if conversations is not None:
            print("CONVERSATIONS", conversations.read(spark).count())
        pipe.read_lineage(spark).orderBy("batch_id", "partition_id").show(50, False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
