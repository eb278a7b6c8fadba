"""Probe: SCD2 seed-read bytes vs closed-history growth (verdict round-3
item 3 'done' criterion).

Applies N sequential batches that keep updating the SAME small key set —
so the history table accumulates closed versions while the live-key count
stays constant — and after each batch reports the bytes the per-batch seed
read must scan under each strategy:

  * legacy: ``history.read().where(is_current)`` — no file-level pruning
    on is_current, so the scan covers every history data file and GROWS
    with closed history;
  * open store: bucket-pruned read of the open-version table — O(live
    keys in touched buckets), FLAT regardless of history size.

Usage: python tools/probe_scd2_open.py [n_batches] [n_keys]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from openlogreplicator_spark.config import EngineConfig  # noqa: E402
from openlogreplicator_spark.plans.scd2_apply import (  # noqa: E402
    apply_scd2_batch,
    bootstrap_scd2_open_target,
    bootstrap_scd2_target,
)


def table_bytes(table, buckets=None):
    m = table.manifest()
    tot = 0
    for f in m["files"]:
        if buckets is not None and f["bucket"] not in buckets:
            continue
        p = os.path.join(table.path, f["path"])
        if os.path.exists(p):
            tot += os.path.getsize(p)
    return tot


def batch_df(spark, batch, n_keys):
    base_scn = batch * 10_000
    rows = [
        (f"conv{k % 40}", k, "U", base_scn + k, 0, f"x{batch}",
         base_scn + n_keys + 1,
         (None, f"text b{batch} k{k}", None), ["text"])
        for k in range(n_keys)
    ]
    return spark.createDataFrame(rows, (
        "conv_id string, turn_idx long, op string, scn long, seq long,"
        " xid string, commit_scn long,"
        " after struct<role:string,text:string,ts:timestamp>,"
        " cols_set array<string>"))


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(num_buckets=8)
    d = tempfile.mkdtemp(prefix="scd2probe")
    hist = bootstrap_scd2_target(os.path.join(d, "hist"), cfg)
    open_t = bootstrap_scd2_open_target(os.path.join(d, "open"), cfg)

    print(f"{'batch':>5} {'hist_versions':>13} {'legacy_seed_B':>13} "
          f"{'open_seed_B':>11}")
    for b in range(1, n_batches + 1):
        ev = batch_df(spark, b, n_keys)
        touched = sorted(r[0] for r in ev.select(
            open_t.bucket_expr(["conv_id", "turn_idx"]).alias("_b"))
            .distinct().collect())
        apply_scd2_batch(spark, ev, hist, cfg, batch_id=b,
                         open_table=open_t)
        legacy = table_bytes(hist)              # is_current scan: all files
        open_b = table_bytes(open_t, set(touched))  # bucket-pruned store
        n_vers = hist.read(spark).count()
        print(f"{b:>5} {n_vers:>13} {legacy:>13} {open_b:>11}")
    spark.stop()


if __name__ == "__main__":
    main()
