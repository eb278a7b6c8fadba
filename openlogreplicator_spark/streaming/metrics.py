"""Ingest metrics (M3) — the reference's per-log performance trace
(RedoLog.cpp:1144-1155 under TRACE2_PERFORMANCE) as a streaming-native
listener: one JSON line per microbatch with rows/s, batch duration, and
source offsets, appended to ``<state_dir>/metrics.jsonl``.

Pairs with the per-partition lineage rows the pipeline itself writes
(batch_id, partition_id, scn range -> snapshot id); the listener covers the
query-level view (trigger cadence, backlog), lineage covers data provenance.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.streaming import StreamingQueryListener


class IngestMetricsListener(StreamingQueryListener):
    def __init__(self, metrics_path: str):
        self.metrics_path = metrics_path
        os.makedirs(os.path.dirname(metrics_path), exist_ok=True)

    def _write(self, payload: dict) -> None:
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(payload) + "\n")

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id),
                     "name": event.name, "ts": time.time()})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write({
            "event": "progress",
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "batch_duration_ms": p.batchDuration,
            "timestamp": p.timestamp,
        })

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id),
                     "exception": event.exception, "ts": time.time()})

    def onQueryIdle(self, event) -> None:
        pass


def attach(spark, state_dir: str) -> IngestMetricsListener:
    listener = IngestMetricsListener(os.path.join(state_dir, "metrics.jsonl"))
    spark.streams.addListener(listener)
    return listener


def read_metrics(state_dir: str) -> list[dict]:
    path = os.path.join(state_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
