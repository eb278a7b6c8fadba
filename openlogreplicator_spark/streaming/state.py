"""Cross-batch open-transaction state.

The reference keeps an in-memory map xid -> Transaction buffer across the whole
run (OracleAnalyzer.h:111-112, bounded 1 MB chunk pool); a transaction that
began in one LWN and commits in a later one simply stays in the map. A Spark
microbatch pipeline needs the same state to survive batch boundaries AND
driver restarts, so it lives on storage as a versioned parquet store:

    pending/v{batch_id}/*.parquet   events of transactions still open after batch
    pending/_current                pointer to the latest committed version

Determinism makes this crash-safe without coordination: batch b's pending set
is a pure function of (pending after b-1, batch b input). Structured Streaming
replays a failed batch with the same batch_id and the same input files; we
re-read pending v(b-1), recompute, and overwrite v(b) — while the target-table
merge for b is skipped by the snapshot write-audit if it already committed.
(This is the foreachBatch-era equivalent of applyInPandasWithState; it keeps
state inspectable and exactly-once-composable with the sink.)

Scale: pending size is bounded by open transactions only (OLR's memory-max-mb
analog); files are plain parquet, partitioned by Spark, readable in parallel.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from openlogreplicator_spark.lake import _atomic_write


class PendingStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def current_version(self) -> int:
        p = self._pointer()
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(f.read().strip())

    def read_for_batch(self, spark: SparkSession, schema, batch_id: int) -> DataFrame:
        """State input for batch b = committed pending of the LARGEST version
        < b. Normally that is v(b-1); after a crash between the target merge
        and the streaming checkpoint commit the pointer may already be at b,
        in which case the replayed batch must NOT see its own output."""
        best = -1
        for name in os.listdir(self.path):
            if name.startswith("v"):
                try:
                    v = int(name[1:])
                except ValueError:
                    continue
                if v < batch_id:
                    best = max(best, v)
        return self.read(spark, schema, version=best)

    def read(self, spark: SparkSession, schema, version: int | None = None) -> DataFrame:
        """Open-transaction events as of the given committed version (default:
        latest). Empty DataFrame when no state exists."""
        v = self.current_version() if version is None else version
        d = os.path.join(self.path, f"v{v}")
        if v < 0 or not os.path.exists(d):
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(d)

    def write(self, df: DataFrame, batch_id: int) -> None:
        """Persist the post-batch open set as version batch_id and advance the
        pointer (atomic). Overwrites any partial attempt from a crashed try."""
        d = os.path.join(self.path, f"v{batch_id}")
        df.write.mode("overwrite").parquet(d)
        _atomic_write(self._pointer(), str(batch_id))
        # retire older versions beyond a small safety window
        keep = {batch_id, batch_id - 1}
        for name in os.listdir(self.path):
            if name.startswith("v"):
                try:
                    v = int(name[1:])
                except ValueError:
                    continue
                if v not in keep:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
