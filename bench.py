"""Benchmark harness. Prints ONE JSON line on stdout:

  {"metric": "...", "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...,
   "apply_events_per_sec": ..., "cpus": ...}

Headline: end-to-end CDC apply (derived change feed -> decode -> transaction
assembly -> net-change -> snapshot-atomic MERGE -> readback count) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
Per-query timings cover the operator surface from __spark_entry__.queries().

Scaling-efficiency evidence (N vs 4N cores) lives in tools/bench_scaling.py —
this script is single-configuration so the driver's per-round numbers are
comparable round over round.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("olr-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # 16g + throughput GC: G1 on a large heap serializes 32 local task
        # threads in GC/page-fault kernel time (measured 3x slowdown); the
        # string-heavy CDC payload wants a compacting throughput collector
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.feed_from_events import derive_feed
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.operators.assembly import (
        assemble_transactions_pandas,
        assemble_transactions_sql,
    )
    from openlogreplicator_spark.operators.lww import net_changes
    from openlogreplicator_spark.plans.replay import replay_batch
    import __spark_entry__ as entrymod

    cfg = EngineConfig()
    timings: dict[str, float] = {}
    # noise shield (round-4 verdict "what's wrong" #3): every timing is the
    # BEST of N executions inside one JVM — rounds 2 and 4 both recorded
    # phantom regressions that interleaved A/Bs later exonerated as host
    # weather; min-of-N is the standard way to report the code's cost rather
    # than the host's. The repeat count rides in the output payload.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    # warmup: JVM + parquet footer caches + Python/Arrow workers, outside all
    # timings. The pandas-UDF warmup matters: forking 32 Python workers costs
    # ~4-6 s once per JVM — a long-running cluster has warm workers, so
    # charging the fork to the first timed query would measure interpreter
    # startup, not engine throughput.
    derive_feed(spark, sf_dir).count()
    from pyspark.sql import functions as F
    from openlogreplicator_spark.operators.decode import _normalize_text_pandas

    (spark.range(10_000, numPartitions=cpus)
     .select(_normalize_text_pandas(F.col("id").cast("string"))).count())
    # miniature replay warms the whole-stage-codegen + exchange plans of the
    # merge path (a streaming deployment pays this once on its first batch,
    # then every batch runs warm — steady state is what we measure)
    wtmp = tempfile.mkdtemp(prefix="olr_bench_warm_")
    wtable = LakeTable.create(
        wtmp, entrymod._DERIVED_TARGET, ["conv_id", "turn_idx"],
        num_buckets=cfg.num_buckets,
    )
    replay_batch(spark, derive_feed(spark, sf_dir).limit(5_000), wtable, cfg,
                 batch_id=0)
    wtable.read(spark).count()
    shutil.rmtree(wtmp, ignore_errors=True)

    def timed(name, fn):
        best = None
        out = None
        for _ in range(repeats):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # ---- headline: end-to-end CDC replay (feed -> MERGE -> snapshot) ----
    feed = derive_feed(spark, sf_dir)
    n_events = feed.count()

    def _e2e(mode):
        tmp = tempfile.mkdtemp(prefix="olr_bench_tbl_")
        table = LakeTable.create(
            tmp, entrymod._DERIVED_TARGET, ["conv_id", "turn_idx"],
            num_buckets=cfg.num_buckets, write_mode=mode,
        )
        t0 = time.time()
        replay_batch(spark, derive_feed(spark, sf_dir), table, cfg,
                     batch_id=0)
        n = table.read(spark).count()
        dt = time.time() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        return dt, n

    e2e, rows = min(_e2e("cow") for _ in range(repeats))
    timings["cdc_replay_e2e"] = round(e2e, 3)

    # same e2e on a merge-on-read table (round-4, verdict item 10): tracks
    # the MoR resolve-path per round. Single-batch bootstrap writes data
    # files only; the readback still runs the MoR read plan.
    e2e_mor, rows_mor = min(_e2e("mor") for _ in range(repeats))
    timings["cdc_replay_e2e_mor"] = round(e2e_mor, 3)
    assert rows_mor == rows

    # ---- operator microbenchmarks (count() forces full execution) ----
    timed("cdc_assembly_sql",
          lambda: assemble_transactions_sql(derive_feed(spark, sf_dir), cfg).count())
    timed("cdc_assembly_pandas",
          lambda: assemble_transactions_pandas(derive_feed(spark, sf_dir), cfg).count())
    timed("cdc_net_changes", lambda: net_changes(
        assemble_transactions_sql(derive_feed(spark, sf_dir), cfg),
        ["conv_id", "turn_idx"], ["role", "text", "ts"]).count())

    # O1/W2: per-transaction JSON serialization + file sink (a real write —
    # count() would let Catalyst prune the to_json render)
    from openlogreplicator_spark.sinks import (
        change_stream_messages, write_change_stream,
    )

    def _json_stream():
        d = tempfile.mkdtemp(prefix="olr_bench_js_")
        write_change_stream(change_stream_messages(
            assemble_transactions_sql(derive_feed(spark, sf_dir), cfg), cfg), d)
        shutil.rmtree(d, ignore_errors=True)

    timed("cdc_json_stream", _json_stream)

    # driver-contract analytics queries at bench scale (incl. the round-3
    # operator surface: SCD2, conversation rollup, as-of, sessionization,
    # sampling, sharding, incremental dedup)
    # cdc_lww_dedup left the oracle registry (50-row driver budget; pinned by
    # tests/test_entry_contract.py instead) but stays a tracked bench query
    qs = dict(entrymod.queries())
    qs["cdc_lww_dedup"] = entrymod._q_lww_dedup
    for name in ("cdc_lww_dedup", "agg_pricing_summary", "join_nation_orders",
                 "window_top_orders", "cdc_multirow_unnest", "cdc_scd2",
                 "cdc_conv_rollup", "evt_asof_join", "evt_sessionize",
                 "sample_stratified", "pack_chunks", "dedup_incremental",
                 "cdc_protobuf_stream"):
        fn = qs[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).count())

    print(json.dumps({
        "metric": "cdc_replay_e2e_sec",
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "events": n_events,
        "rows_final": rows,
        "apply_events_per_sec": round(n_events / e2e, 1),
        "cpus": cpus,
        "repeats": repeats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
