"""Round-4 format-fidelity features:

  * assembly carries ``commit_ts`` (the commit event's timestamp) on both
    the SQL and pandas paths, equal across them;
  * JSON message-format knobs (types.h:85-116): scn hex / ISO8601 tms /
    unix tm / numeric xidn, and the SHORT-mode begin/commit BRACKET
    message stream (OutputBufferJson.cpp processBegin/Commit);
  * protobuf header knobs (scns/tm/tms/xidn) and Schema obj/column
    sub-messages (OutputBufferProtobuf.cpp appendHeader/appendSchema).
"""

import json

from pyspark.sql import functions as F

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed import generate_change_events
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_pandas,
    assemble_transactions_sql,
)
from openlogreplicator_spark.operators.decode import decode_events

CFG = EngineConfig()


def _assembled(spark, n_txs=30, seed=43):
    ev = decode_events(
        generate_change_events(spark, n_txs=n_txs, n_convs=6, seed=seed), CFG)
    return assemble_transactions_sql(ev, CFG), ev


# ------------------------------------------------------------- commit_ts

def test_commit_ts_matches_commit_event_and_paths_agree(spark):
    surv, ev = _assembled(spark)
    # commit_ts == the ts of the tx's commit event
    commits = {r["scn"]: r["ts"] for r in
               ev.where("op = 'C'").select("scn", "ts").collect()}
    rows = surv.select("commit_scn", "commit_ts").distinct().collect()
    assert rows and all(r["commit_ts"] == commits[r["commit_scn"]]
                        for r in rows)
    # pandas path agrees bit-for-bit
    pnd = assemble_transactions_pandas(ev, CFG)
    a = sorted((r["scn"], r["commit_scn"], r["commit_ts"])
               for r in surv.select("scn", "commit_scn", "commit_ts")
               .collect())
    b = sorted((r["scn"], r["commit_scn"], r["commit_ts"])
               for r in pnd.select("scn", "commit_scn", "commit_ts")
               .collect())
    assert a == b


# ------------------------------------------------------------ JSON knobs

def test_json_format_knobs(spark):
    from openlogreplicator_spark.sinks import JsonFormat, change_stream_ops

    surv, _ = _assembled(spark)
    one = surv.orderBy("commit_scn", "scn").limit(1)

    # default (no fmt): round-3 shape — scn + op_scn + xid
    d = json.loads(change_stream_ops(one, CFG).first()["value"])
    assert {"scn", "op_scn", "xid"} <= set(d)

    r = one.first()
    # hex scns + ISO tms + numeric xidn
    fmt = JsonFormat(scn_format=1, timestamp_format=1, xid_format=1)
    m = json.loads(change_stream_ops(one, CFG, fmt=fmt).first()["value"])
    assert m["scns"] == "0x%016x" % r["commit_scn"]
    assert m["tms"].endswith("Z") and "T" in m["tms"]
    assert isinstance(m["xidn"], int) and "xid" not in m
    assert "scn" not in m and "op_scn" not in m

    # numeric scn + unix-millis tm + text xid
    m2 = json.loads(change_stream_ops(one, CFG, fmt=JsonFormat())
                    .first()["value"])
    assert m2["scn"] == r["commit_scn"]
    # whole-second granularity millis (reference: lastTime.toTime() * 1000)
    assert m2["tm"] == int(r["commit_ts"].timestamp()) * 1000
    assert m2["xid"] == r["xid"]


def test_json_bracket_stream(spark):
    from openlogreplicator_spark.sinks import (
        JsonFormat, change_stream_brackets,
    )

    surv, _ = _assembled(spark, n_txs=20, seed=47)
    msgs = (change_stream_brackets(surv, CFG)
            .orderBy("commit_scn", "xid", "kind", "scn", "seq").collect())
    n_tx = surv.select("xid", "commit_scn").distinct().count()
    n_ops = surv.count()
    assert len(msgs) == n_ops + 2 * n_tx

    by_tx = {}
    for r in msgs:
        by_tx.setdefault((r["commit_scn"], r["xid"]), []).append(r)
    for (cs, xid), tx in by_tx.items():
        head = json.loads(tx[0]["value"])
        tail = json.loads(tx[-1]["value"])
        assert head["payload"] == [{"op": "begin"}]
        assert tail["payload"] == [{"op": "commit"}]
        # begin carries the full header; default op messages xid-only
        assert head["scn"] == cs and "tm" in head and head["xid"] == xid
        for r2 in tx[1:-1]:
            m = json.loads(r2["value"])
            assert m["xid"] == xid
            assert "scn" not in m and "tm" not in m  # first-message-only
            assert m["payload"][0]["op"] in ("c", "u", "d")

    # ALL_PAYLOADS bits repeat scn + tm on every message
    fmt = JsonFormat(scn_format=2, timestamp_format=2)
    all_msgs = change_stream_brackets(surv, CFG, fmt=fmt).collect()
    for r in all_msgs:
        m = json.loads(r["value"])
        assert "scn" in m and "tm" in m


# ------------------------------------------- protobuf streaming side-channel

def test_streaming_protobuf_change_stream(spark, tmp_path):
    """CDCStreamPipeline(change_stream_format='protobuf') writes per-batch
    protobuf message files whose decoded DML op count equals the committed
    stream (the reference's "format":"protobuf" writer wired end-to-end)."""
    import glob
    import os
    import shutil

    from openlogreplicator_spark.feed import pandas_to_events_df
    from openlogreplicator_spark.plans.replay import bootstrap_target
    from openlogreplicator_spark.sinks.protobuf_stream import decoded_ops
    from openlogreplicator_spark.streaming.pipeline import CDCStreamPipeline

    cfg = EngineConfig(num_buckets=4, maxFilesPerTrigger=1)
    events = generate_change_events(spark, n_txs=80, n_convs=10, seed=71)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    pdf = events.toPandas().sort_values(["scn", "seq"]).reset_index(drop=True)
    n = len(pdf)
    for i in range(3):
        sdf = pandas_to_events_df(spark, pdf.iloc[(n * i) // 3:
                                                  (n * (i + 1)) // 3])
        tmp = str(tmp_path / f"_s{i}")
        sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
                    os.path.join(feed_dir, f"seq{i:04d}.parquet"))
        shutil.rmtree(tmp)

    table = bootstrap_target(str(tmp_path / "t"), cfg)
    cs_dir = str(tmp_path / "cs")
    pipe = CDCStreamPipeline(table, cfg, str(tmp_path / "state"),
                             change_stream_dir=cs_dir,
                             change_stream_format="protobuf")
    q = pipe.run_stream(spark, feed_dir, str(tmp_path / "ckpt"),
                        available_now=True)
    q.awaitTermination(180)
    pipe.detach_metrics()

    batches = sorted(glob.glob(os.path.join(cs_dir, "batch_*")))
    assert batches
    msgs = spark.read.parquet(*batches)
    got = decoded_ops(msgs)
    from openlogreplicator_spark.operators.decode import (
        decode_events, unnest_multirow,
    )

    want = unnest_multirow(assemble_transactions_sql(
        decode_events(events, cfg), cfg))
    assert got.count() == want.count() > 0
    diff = (got.select("commit_scn", "xid", "op", "conv_id", "turn_idx")
            .exceptAll(want.select("commit_scn", "xid", "op",
                                   "conv_id", "turn_idx")))
    assert diff.count() == 0


# -------------------------------------------------------- protobuf knobs

def test_protobuf_format_knobs_and_schema_detail(spark):
    from openlogreplicator_spark.sinks.protobuf_stream import (
        ProtoFormat,
        decode_response,
        protobuf_stream_messages,
        schema_columns_for,
        stable_obj_id,
    )
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    surv, _ = _assembled(spark, n_txs=10, seed=59)
    cols = schema_columns_for(StructType([
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", LongType(), False),
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]))
    assert ("conv_id", 1, False) in cols and ("turn_idx", 2, False) in cols
    assert ("ts", 13, True) in cols

    fmt = ProtoFormat(scn_format=1, timestamp_format=0, xid_format=1,
                      schema_format=5)  # HEX scns, unix tm, xidn, FULL|OBJ
    rows = protobuf_stream_messages(surv, CFG, fmt=fmt,
                                    schema_columns=cols).collect()
    assert rows
    src_ts = {(r["commit_scn"], r["xid"]): r["commit_ts"] for r in
              surv.select("commit_scn", "xid", "commit_ts").distinct()
              .collect()}
    for r in rows:
        m = decode_response(bytes(r["value"]))
        assert m["scns"] == "%016x" % r["commit_scn"] and m["scn"] is None
        assert m["xidn"] is not None and m["xid"] is None
        want_tm = src_ts[(r["commit_scn"], r["xid"])]
        # whole-second millis, matching the reference's second-granularity
        assert m["tm"] == int(want_tm.timestamp()) * 1000
        for p in m["payloads"]:
            if p["op"] in ("I", "U", "D"):
                assert p["obj"] == stable_obj_id("OLR", p["schema"][1])
                assert p["columns"] == cols

    # defaults untouched: numeric scn, text xid, no tm, no schema detail
    plain = protobuf_stream_messages(surv, CFG).collect()
    for r in plain:
        m = decode_response(bytes(r["value"]))
        assert m["scn"] == r["commit_scn"] and m["scns"] is None
        assert m["xid"] == r["xid"] and m["tm"] is None and m["tms"] is None
        for p in m["payloads"]:
            if p["op"] in ("I", "U", "D"):
                assert p["obj"] is None and p["columns"] == []
