"""Kafka producer contract (W1) — the record shape the engine hands to a
Kafka sink, plus a driver for any producer implementing the minimal
produce() surface.

Reference parity (/root/reference/src/WriterKafka.cpp):
  * the reference produces each serialized message to a topic with
    ``enable.idempotence=true`` (WriterKafka.cpp:52-57) and only confirms
    the checkpoint when the broker acknowledges delivery
    (dr_msg_cb -> confirmMessage, WriterKafka.cpp:91-97); QUEUE_FULL
    retries with poll backoff (WriterKafka.cpp:116-138).
  * it relies on a single producer for global ordering. A Spark sink is a
    PARALLEL producer fleet, so ordering must come from Kafka's own
    per-partition guarantee: this module keys every record by the MERGE KEY
    (per-op mode) or by xid (per-transaction mode), so all changes of one
    row land in one partition in send order, and a consumer replaying a
    partition sees that row's changes in commit order — the same per-row
    ordering contract the lake MERGE enforces.

Exactly-once analog without a broker: records carry a deterministic
``dedup_id`` = (batch_id, key, seq_in_key). A retried foreachBatch
re-produces byte-identical records with identical dedup_ids, so an
idempotent producer (Kafka's PID+sequence dedupe, or any at-least-once
sink with a dedup store) collapses the retry — the mock-producer contract
test pins exactly this. No broker ships in this sandbox, so ``produce``
takes a producer factory; the real deployment passes
``lambda: KafkaProducer(bootstrap_servers=..., enable_idempotence=True)``
and everything else is unchanged.

Scale: keying + sequence numbering is one window per key over the change
stream — in per-op mode the window partitions on the MERGE-KEY COLUMNS
that change_stream_ops carries alongside the message (round 4; previously
the key was JSON-path-parsed back out of the rendered message, paying a
per-record eval and a hash exchange on a derived string — when the
upstream stage is already hash-partitioned on the same columns, Catalyst
can now reuse that exchange outright). ``produce`` runs foreachPartition —
one producer per task, the standard Spark->Kafka shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from openlogreplicator_spark.config import EngineConfig


def kafka_records(
    messages: DataFrame, cfg: EngineConfig, batch_id: int,
    per_tx: bool = False,
    key_cols: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Change-stream messages -> Kafka record contract.

    Input: output of change_stream_ops (per-op; scn, commit_scn, xid, the
    merge-key COLUMNS, value) or change_stream_messages (per-tx;
    commit_scn, xid, n_ops, value).

    Output columns:
      key       partition-routing key: merge key rendered as compact JSON
                (per-op — byte-identical to the message's payload.key, so
                the contract is still checkable from the message alone)
                or xid (per-tx)
      value     the JSON message
      dedup_id  deterministic idempotence id (batch_id:key:seq_in_key)
      ord       per-key send order (commit_scn, scn) — producers must send
                in this order within a key
    """
    if per_tx:
        key = F.col("xid")
        w = Window.partitionBy(key).orderBy(F.col("commit_scn").asc())
    else:
        kc = [k for k in (key_cols or cfg.key_cols) if k in messages.columns]
        if not kc:
            raise ValueError(
                "per-op kafka_records needs the merge-key columns on the "
                "message frame (change_stream_ops passes them through); "
                f"none of {key_cols or cfg.key_cols} present")
        # partition the window by the RAW columns (hash-exchange reusable);
        # render the routing string from the same struct the payload carries
        key = F.to_json(F.struct(*[F.col(k) for k in kc]))
        w = Window.partitionBy(*kc).orderBy(
            F.col("commit_scn").asc(), F.col("scn").asc())
    seq = F.row_number().over(w)
    return messages.select(
        key.alias("key"),
        F.col("value"),
        seq.alias("ord"),
        F.concat_ws(
            ":", F.lit(int(batch_id)).cast("string"), key, seq.cast("string")
        ).alias("dedup_id"),
    )


def produce(records: DataFrame, producer_factory) -> None:
    """Send records through a producer fleet (one per partition task).

    ``producer_factory`` must be picklable and return an object with
    ``send(key: str, value: str, dedup_id: str)`` and ``flush()``.
    Records are sent in ``ord`` order within each key (sortWithinPartitions
    after hash-partitioning by key keeps every key's records in one task,
    ordered — the per-partition ordering Kafka's keyed producer preserves).
    """
    def _send(rows):
        p = producer_factory()
        for r in rows:
            p.send(r["key"], r["value"], r["dedup_id"])
        p.flush()

    (records.repartition(F.col("key"))
     .sortWithinPartitions("key", "ord")
     .foreachPartition(_send))
