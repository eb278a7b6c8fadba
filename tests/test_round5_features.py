"""Round-5 features:

  * JSON schema/column-definition format knobs (the reference's
    SCHEMA_FORMAT_FULL/OBJ bits rendered by OutputBufferJson.cpp:226-372) —
    defaults byte-identical to round 4;
  * SCD2 side-output on a merge-on-read history table: batch-split
    equivalence with compaction mid-sequence (round-4 verdict item 8);
  * streaming snapshot-retention cadence stays bounded without changing
    semantics;
  * schema bit0 threaded end-to-end through the pipeline (JSON and
    protobuf), DDL-scn-SLICED so each message advertises the schema in
    force at its commit scn, case-insensitive like the lake alters, and
    replay-stable via LakeTable.schema_before_batch.
"""

import json

import pandas as pd
import pytest

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_sql,
)
from openlogreplicator_spark.operators.scd2 import scd2_history
from openlogreplicator_spark.plans.scd2_apply import (
    apply_scd2_batch,
    bootstrap_scd2_open_target,
    bootstrap_scd2_target,
)
from openlogreplicator_spark.sinks import (
    JsonFormat,
    change_stream_messages,
    change_stream_ops,
    json_schema_columns_for,
)
from openlogreplicator_spark.sinks.protobuf_stream import stable_obj_id

CFG = EngineConfig(num_buckets=4)
PAYLOAD = ("role", "text", "ts")
KEYS = ["conv_id", "turn_idx"]


def _surv(spark, seed=31, n_txs=60):
    feed = generate_change_events(spark, n_txs=n_txs, n_convs=10, seed=seed)
    return assemble_transactions_sql(feed, CFG)


# ------------------------------------------------- JSON schema format knobs

def test_json_schema_column_defs_and_obj(spark):
    from openlogreplicator_spark.feed import TRANSCRIPTS_SCHEMA

    surv = _surv(spark).limit(5)
    cols = json_schema_columns_for(TRANSCRIPTS_SCHEMA)
    assert ("conv_id", "varchar2", False) in cols
    assert ("turn_idx", "number", False) in cols
    assert ("ts", "timestamp", True) in cols

    fmt = JsonFormat(schema_format=5)  # FULL | OBJ
    rows = change_stream_ops(surv, CFG, fmt=fmt,
                             schema_columns=cols).collect()
    assert rows
    for r in rows:
        m = json.loads(r["value"])
        sch = m["payload"]["schema"]
        assert sch["owner"] == "OLR"
        # obj identical to the protobuf side's stable id (same CRC32)
        assert sch["obj"] == stable_obj_id("OLR", sch["table"])
        got = [(c["name"], c["type"], c["nullable"]) for c in sch["columns"]]
        assert got == cols

    # OBJ alone: obj but no columns
    m = json.loads(change_stream_ops(
        surv, CFG, fmt=JsonFormat(schema_format=4)).first()["value"])
    sch = m["payload"]["schema"]
    assert "obj" in sch and "columns" not in sch

    # per-transaction mode carries the same schema section per op
    m = json.loads(change_stream_messages(
        surv, CFG, fmt=fmt, schema_columns=cols).first()["value"])
    for p in m["payload"]:
        assert p["schema"]["obj"] == stable_obj_id("OLR",
                                                   p["schema"]["table"])
        assert len(p["schema"]["columns"]) == len(cols)


def test_json_schema_defaults_unchanged(spark):
    """Without schema_format the schema section stays {owner, table} —
    the cdc_json_stream / cdc_json_brackets oracle rows depend on it."""
    surv = _surv(spark).limit(3)
    for fmt in (None, JsonFormat()):
        m = json.loads(change_stream_ops(surv, CFG, fmt=fmt)
                       .first()["value"])
        assert set(m["payload"]["schema"]) == {"owner", "table"}


# --------------------------------------------------- SCD2 on merge-on-read

def _norm(df):
    pdf = df.select(
        "conv_id", "turn_idx", "valid_from", "valid_to", "is_current",
        "role", "text",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    ).toPandas()
    return (
        pdf.sort_values(["conv_id", "turn_idx", "valid_from"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64", "valid_from": "int64"})
    )


def _assembled(spark, seed):
    surv = _surv(spark, seed=seed, n_txs=200)
    return surv.select(
        *KEYS, "op", "scn", "seq", "xid", "commit_scn",
        F.struct(*[F.col("after").getField(c).alias(c) for c in PAYLOAD])
        .alias("after"),
        "cols_set",
    )


@pytest.mark.parametrize("compact_between", [False, True])
def test_scd2_on_mor_history_batch_split(spark, tmp_path, compact_between):
    """History + open store as merge-on-read tables: three-way batch split
    equals one-shot scd2_history, with a compaction folded in mid-sequence
    (round-4 verdict item 8 — MoR tests covered the primary only)."""
    surv = _assembled(spark, seed=41).localCheckpoint()
    want = _norm(scd2_history(surv, KEYS, list(PAYLOAD)))

    qs = surv.approxQuantile("commit_scn", [0.33, 0.66], 0.0)
    cuts = [int(q) for q in qs]
    parts = [
        surv.where(F.col("commit_scn") <= cuts[0]),
        surv.where((F.col("commit_scn") > cuts[0])
                   & (F.col("commit_scn") <= cuts[1])),
        surv.where(F.col("commit_scn") > cuts[1]),
    ]
    hist = bootstrap_scd2_target(str(tmp_path / "hist"), CFG,
                                 write_mode="mor")
    open_t = bootstrap_scd2_open_target(str(tmp_path / "open"), CFG,
                                        write_mode="mor")
    assert hist.write_mode == "mor" and open_t.write_mode == "mor"
    for i, p in enumerate(parts):
        apply_scd2_batch(spark, p, hist, CFG, batch_id=i + 1,
                         open_table=open_t)
        if compact_between and i == 1:
            hist.compact(spark)
            open_t.compact(spark)

    got = _norm(hist.read(spark))
    pd.testing.assert_frame_equal(got, want)
    # delete files really existed on the MoR path at some point
    kinds = {s["summary"].get("operation") for s in hist.snapshots()}
    assert "merge" in kinds
    # open store == current versions after the MoR resolve
    cur = hist.read(spark).where("is_current").select(*KEYS, "valid_from")
    opn = open_t.read(spark).select(*KEYS, "valid_from")
    assert cur.exceptAll(opn).count() == 0
    assert opn.exceptAll(cur).count() == 0
    # retry of the last batch id is skipped on both tables
    s = apply_scd2_batch(spark, parts[-1], hist, CFG, batch_id=3,
                         open_table=open_t)
    assert s.get("skipped")


# ------------------------------------------------ streaming retention cadence

def test_streaming_expire_cadence(spark, tmp_path):
    """``expire_every`` collects superseded CoW snapshots mid-stream on the
    primary AND the SCD2 side outputs: manifests and data files on disk stay
    bounded while the final state equals an unexpired twin run's (retention
    is collection, never semantics), and the write-audit survives expiry (a
    replayed batch id still skips)."""
    import glob
    import os

    from openlogreplicator_spark.feed import pandas_to_events_df
    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    feed = generate_change_events(
        spark, n_txs=120, n_convs=15, seed=67).localCheckpoint()
    pdf = feed.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n, n_chunks = len(pdf), 6

    def run(root, cfg):
        table = bootstrap_target(str(root / "t"), cfg)
        hist = bootstrap_scd2_target(str(root / "hist"), cfg)
        open_t = bootstrap_scd2_open_target(str(root / "open"), cfg)
        pipe = CDCStreamPipeline(table, cfg, str(root / "state"),
                                 history_table=hist,
                                 history_open_table=open_t)
        chunks = [
            pandas_to_events_df(
                spark, pdf.iloc[(n * i) // n_chunks:(n * (i + 1)) // n_chunks]
            )
            for i in range(n_chunks)
        ]
        for i, c in enumerate(chunks):
            pipe.process_batch(c, i)
        return table, hist, open_t, pipe, chunks

    keep = 2
    expired = tmp_path / "expired"
    plain = tmp_path / "plain"
    expired.mkdir(), plain.mkdir()
    t1, h1, o1, pipe1, chunks = run(
        expired, EngineConfig(num_buckets=4, expire_every=2,
                              expire_keep=keep))
    t2, h2, o2, _, _ = run(plain, EngineConfig(num_buckets=4))

    # bounded metadata: expired tables retain few manifests; the twin
    # retains one per commit
    for exp_t, plain_t in ((t1, t2), (h1, h2), (o1, o2)):
        exp_manifests = len(
            glob.glob(os.path.join(exp_t.path, "_manifests", "v*.json")))
        plain_manifests = len(
            glob.glob(os.path.join(plain_t.path, "_manifests", "v*.json")))
        assert exp_manifests < plain_manifests
        # last cadence point was batch 5 (after its merges); at most
        # keep_last survive it plus the commits since
        assert exp_manifests <= keep + 4
        # bounded data: superseded generations' files were really deleted
        exp_files = len(glob.glob(
            os.path.join(exp_t.path, "data", "**", "*.parquet"),
            recursive=True))
        plain_files = len(glob.glob(
            os.path.join(plain_t.path, "data", "**", "*.parquet"),
            recursive=True))
        assert exp_files < plain_files

    # collection never changes semantics: both runs read identically
    for exp_t, plain_t, key in (
            (t1, t2, ["conv_id", "turn_idx"]),
            (h1, h2, ["conv_id", "turn_idx", "valid_from"]),
            (o1, o2, ["conv_id", "turn_idx"])):
        a, b = exp_t.read(spark), plain_t.read(spark)
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # the write-audit watermark survives expiry: replaying the last batch
    # id is still skipped and the state is unchanged
    before = t1.read(spark).count()
    summaries = pipe1.process_batch(chunks[-1], n_chunks - 1)
    assert any(s.get("skipped") for s in summaries)
    assert t1.read(spark).count() == before


# ------------------------------- schema knob threaded through the pipeline

def test_pipeline_threads_schema_columns(spark, tmp_path):
    """A pipeline built with schema_format bit0 (the config entry point's
    ``"format": {"schema": 1}``) emits column definitions in the change
    stream's schema section — round-5 review finding: the knob was accepted
    by configfile but the pipeline never threaded ``schema_columns``, so
    the promised definitions were silently absent from the wire."""
    import glob
    import os

    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4)
    feed = generate_change_events(spark, n_txs=40, n_convs=8, seed=83)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    cs_dir = str(tmp_path / "cs")
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             change_stream_dir=cs_dir,
                             change_stream_fmt=JsonFormat(schema_format=1))
    pipe.process_batch(feed, 0)

    want = json_schema_columns_for(table.schema())
    msgs = spark.read.text(
        *sorted(glob.glob(os.path.join(cs_dir, "batch_*")))).collect()
    assert msgs
    for r in msgs:
        m = json.loads(r["value"])
        for p in m["payload"]:
            got = [(c["name"], c["type"], c["nullable"])
                   for c in p["schema"]["columns"]]
            assert got == want


def test_pipeline_threads_schema_columns_protobuf(spark, tmp_path):
    """Same knob through the protobuf sink: the pipeline passes the
    ColumnType-enum column list and the consumer-side decoder reads it
    back from every payload's Schema message."""
    import glob
    import os

    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.sinks.protobuf_stream import (
        ProtoFormat,
        decode_response,
        schema_columns_for,
    )
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4)
    feed = generate_change_events(spark, n_txs=40, n_convs=8, seed=89)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    cs_dir = str(tmp_path / "cs")
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             change_stream_dir=cs_dir,
                             change_stream_format="protobuf",
                             change_stream_message_mode="tx",
                             change_stream_fmt=ProtoFormat(schema_format=1))
    pipe.process_batch(feed, 0)

    want = schema_columns_for(table.schema())
    msgs = spark.read.parquet(
        *sorted(glob.glob(os.path.join(cs_dir, "batch_*")))).collect()
    assert msgs
    seen = 0
    for r in msgs:
        resp = decode_response(bytes(r["value"]))
        for p in resp["payloads"]:
            if p["schema"] is None:  # BEGIN/COMMIT brackets carry none
                continue
            assert p["columns"] == want
            seen += 1
    assert seen > 0


def test_change_stream_schema_sliced_by_ddl(spark, tmp_path):
    """A batch carrying 'ADD COLUMN meta string' mid-batch: messages whose
    commit scn precedes the DDL advertise the pre-DDL column list; messages
    after it carry 'meta' — the change stream slices on the same
    ddl_slice_bounds as the primary apply, instead of stamping the
    end-of-batch schema on every message (round-5 review finding)."""
    import glob
    import os

    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4)
    feed = generate_change_events(
        spark, n_txs=60, n_convs=10, seed=97, with_ddl=True,
    ).localCheckpoint()
    add_scn = min(r["scn"] for r in feed.where("op = 'DDL'").collect())

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    cs_dir = str(tmp_path / "cs")
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             change_stream_dir=cs_dir,
                             change_stream_fmt=JsonFormat(schema_format=1))
    pipe.process_batch(feed, 0)  # the DDL lands MID-batch

    pre = post = 0
    for r in spark.read.text(
            *sorted(glob.glob(os.path.join(cs_dir, "batch_*")))).collect():
        m = json.loads(r["value"])
        for p in m["payload"]:
            names = [c["name"] for c in p["schema"]["columns"]]
            if m["scn"] <= add_scn:
                assert "meta" not in names, m["scn"]
                pre += 1
            else:
                assert "meta" in names, m["scn"]
                post += 1
    assert pre > 0 and post > 0


def test_evolve_schema_mirrors_apply_ddl():
    """evolve_schema is the pure twin of _apply_ddl: same verbs, same
    skips (unknown types, malformed RENAME, key-column RENAME/DROP), and
    defensively idempotent for the retried-batch path."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    from openlogreplicator_spark.plans.replay import evolve_schema

    base = StructType([
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("text", StringType(), True),
    ])
    keys = ("conv_id", "turn_idx")

    s = evolve_schema(base, "ADD COLUMN meta string", keys)
    assert [f.name for f in s.fields] == ["conv_id", "turn_idx", "text",
                                          "meta"]
    # idempotent re-apply (retried batch whose start schema has the DDL)
    assert evolve_schema(s, "ADD COLUMN meta string", keys) is s

    w = evolve_schema(base, "WIDEN turn_idx bigint", keys)
    assert dict((f.name, f.dataType) for f in w.fields)["turn_idx"] == \
        LongType()
    assert evolve_schema(base, "WIDEN nosuch bigint", keys) is base
    assert evolve_schema(base, "WIDEN turn_idx blob", keys) is base

    r = evolve_schema(base, "RENAME COLUMN text TO body", keys)
    assert [f.name for f in r.fields] == ["conv_id", "turn_idx", "body"]
    # key-column rename/drop: the primary skips, so does the wire schema
    assert evolve_schema(base, "RENAME COLUMN conv_id TO cid", keys) is base
    assert evolve_schema(base, "DROP COLUMN turn_idx", keys) is base
    d = evolve_schema(base, "DROP COLUMN text", keys)
    assert [f.name for f in d.fields] == ["conv_id", "turn_idx"]
    assert evolve_schema(d, "DROP COLUMN text", keys) is d
    # lifecycle / unknown verbs: schema untouched
    for ddl in ("TRUNCATE TABLE transcripts", "DROP TABLE transcripts",
                "FROBNICATE x"):
        assert evolve_schema(base, ddl, keys) is base


def test_evolve_schema_case_insensitive():
    """Case-variant DDL resolves like the lake alters (Spark's default
    resolver) — a 'WIDEN Turn_idx bigint' that widens the table must widen
    the wire schema too, and a case-variant re-ADD must not fabricate a
    duplicate column (round-5 review finding)."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    from openlogreplicator_spark.plans.replay import evolve_schema

    base = StructType([
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("text", StringType(), True),
    ])
    keys = ("conv_id", "turn_idx")

    w = evolve_schema(base, "WIDEN Turn_idx bigint", keys)
    assert dict((f.name, f.dataType) for f in w.fields)["turn_idx"] == \
        LongType()
    assert evolve_schema(base, "ADD COLUMN TEXT string", keys) is base
    r = evolve_schema(base, "RENAME COLUMN Text TO body", keys)
    assert [f.name for f in r.fields] == ["conv_id", "turn_idx", "body"]
    d = evolve_schema(base, "DROP COLUMN TEXT", keys)
    assert [f.name for f in d.fields] == ["conv_id", "turn_idx"]
    # key guard is case-insensitive too
    assert evolve_schema(base, "DROP COLUMN Turn_idx", keys) is base


def test_change_stream_schema_stable_on_replayed_batch(spark, tmp_path):
    """A replayed DDL-carrying batch re-serializes the change stream with
    the SAME per-slice schema sections as the original write: the pipeline
    recovers the batch-start schema from the snapshot history
    (schema_before_batch) instead of reading the live schema, which on a
    replay already carries the batch's DDLs (round-5 review finding)."""
    import glob
    import os

    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4)
    feed = generate_change_events(
        spark, n_txs=60, n_convs=10, seed=97, with_ddl=True,
    ).localCheckpoint()

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    cs_dir = str(tmp_path / "cs")
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             change_stream_dir=cs_dir,
                             change_stream_fmt=JsonFormat(schema_format=1))
    pipe.process_batch(feed, 0)

    def snap():
        out = {}
        for r in spark.read.text(*sorted(glob.glob(
                os.path.join(cs_dir, "batch_*")))).collect():
            m = json.loads(r["value"])
            cols = tuple(
                (c["name"], c["type"]) for c in
                m["payload"][0]["schema"]["columns"])
            out.setdefault(m["scn"], set()).add(cols)
        return out

    first = snap()
    # crash-after-write replay: the DDLs are already on the table; the
    # merges skip via the write audit but the stream re-serializes
    pipe2 = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                              change_stream_dir=cs_dir,
                              change_stream_fmt=JsonFormat(schema_format=1))
    pipe2.process_batch(feed, 0)
    assert snap() == first


def test_schema_before_batch_degrades_after_expiry(spark, tmp_path):
    """schema_before_batch walks retained snapshots; when retention expired
    every pre-batch manifest it degrades to the oldest surviving schema
    instead of crashing — and on a table whose watermark precedes the
    batch it is just the current schema with no walk."""
    from openlogreplicator_spark.plans.replay import (
        apply_committed,
        bootstrap_target,
    )

    cfg = EngineConfig(num_buckets=4)
    table = bootstrap_target(str(tmp_path / "t"), cfg)
    # fresh table: watermark -1 < any batch -> current schema
    assert table.schema_before_batch(0).fieldNames() == \
        table.schema().fieldNames()

    surv = _assembled(spark, seed=43).localCheckpoint()
    apply_committed(spark, surv, [(0, "ADD COLUMN extra string")], table,
                    cfg, batch_id=5)
    # batch 5 applied the DDL; batch-start schema (recovered from history)
    # lacks it, current has it
    assert "extra" not in table.schema_before_batch(5).fieldNames()
    assert "extra" in table.schema()\
        .fieldNames()
    # expire everything but the newest: the pre-batch manifest is gone,
    # degrade to the oldest surviving schema without crashing
    table.expire_snapshots(keep_last=1)
    got = table.schema_before_batch(5)
    assert "conv_id" in got.fieldNames()
