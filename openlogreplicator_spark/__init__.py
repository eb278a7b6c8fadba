"""openlogreplicator_spark — a from-scratch PySpark-native CDC / incremental-ingest
engine with the capabilities of OpenLogReplicator (reference: /root/reference).

The reference is a C++ Oracle redo-log (WAL) tailer that reassembles physical redo
records into committed transactions and streams ordered change events with
confirm-based checkpointing. This engine plays the same role Spark-first:

    change-event feed (redo analog)                     [feed.py]
      -> vectorized decode / normalize                  [operators/decode.py]
      -> transaction assembly (begin/commit gating,
         rollback discard, partial-rollback retraction,
         update trim, net-change)                       [operators/assembly.py]
      -> per-key last-writer-wins reduction             [operators/lww.py]
      -> idempotent MERGE into a snapshot lake table    [lake.py]
      -> checkpoint / lineage / metrics                 [streaming/]

Design notes (scale-first):
  * Everything is DataFrame-declarative so Catalyst handles pushdown/pruning;
    Python appears only in Arrow-vectorized pandas UDFs (never per-row).
  * The reference is a single totally-SCN-ordered stream (RedoLog.cpp:1042-1052);
    parallelism here comes from key-partitioning with per-key order preserved
    (commit_scn, scn) and snapshot-atomic visibility.
  * Exactly-once = OLR's confirm/checkpoint contract (Writer.cpp:76-393) re-expressed
    as monotonic batch ids recorded in snapshot summaries + an scn high-water mark.
"""

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.lake import LakeTable

__all__ = ["EngineConfig", "LakeTable"]
__version__ = "0.1.0"
