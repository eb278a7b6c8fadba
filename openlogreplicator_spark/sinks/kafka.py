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

Scale: keying + sequence numbering is one window per key over the
already-grouped change stream (per-op mode: no extra shuffle beyond the
net-change groupBy upstream); ``produce`` runs foreachPartition — one
producer per task, the standard Spark->Kafka shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from openlogreplicator_spark.config import EngineConfig


def kafka_records(
    messages: DataFrame, cfg: EngineConfig, batch_id: int,
    per_tx: bool = False,
) -> DataFrame:
    """Change-stream messages -> Kafka record contract.

    Input: output of change_stream_ops (per-op; has scn, commit_scn, xid,
    value + the key columns upstream of serialization are inside value) or
    change_stream_messages (per-tx; commit_scn, xid, n_ops, value).

    Output columns:
      key       partition-routing key: merge key (per-op) or xid (per-tx)
      value     the JSON message
      dedup_id  deterministic idempotence id (batch_id:key:seq_in_key)
      ord       per-key send order (commit_scn, scn) — producers must send
                in this order within a key
    """
    if per_tx:
        key = F.col("xid")
        order = [F.col("commit_scn").asc()]
    else:
        # per-op messages carry the merge key in the payload; re-derive the
        # routing key from the serialized value's key struct so the record
        # contract depends only on the message itself
        key = F.get_json_object("value", "$.payload.key")
        order = [F.col("commit_scn").asc(), F.col("scn").asc()]
    w = Window.partitionBy(key).orderBy(*order)
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
