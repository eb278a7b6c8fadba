"""Batch replay plan: change feed -> decoded -> assembled -> net-change -> MERGE.

This is the reader.type="batch" entry point of the reference
(OpenLogReplicator.cpp:546-578, OracleAnalyzerBatch.cpp:42-57): process a
bounded feed once, applying committed transactions in commit order, honoring
the checkpoint high-water mark, and applying DDL mid-stream (an upgrade — the
reference only *reports* DDL, OutputBuffer.cpp:1957-2007; we evolve the target
schema with metadata-only Iceberg-style ALTERs).

Stage boundaries (Spark physical plan):
    scan (pushed-down table filter) -> [exchange on _g] assembly
    -> [exchange on key, map-side partial agg] net-change
    -> [exchange on key, pruned buckets only] MERGE write -> snapshot commit
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.lake import LakeTable
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_pandas,
    assemble_transactions_sql,
)
from openlogreplicator_spark.operators.decode import decode_events
from openlogreplicator_spark.operators.lww import net_changes


def bootstrap_target(path: str, cfg: EngineConfig) -> LakeTable:
    """Create the transcripts target table (dictionary bootstrap analog —
    OracleAnalyzerOnline.cpp:173-240 reads the catalog; we declare the schema)."""
    from openlogreplicator_spark.feed import TRANSCRIPTS_SCHEMA

    return LakeTable.create(
        path, TRANSCRIPTS_SCHEMA, list(cfg.key_cols), num_buckets=cfg.num_buckets
    )


def _apply_ddl(table: LakeTable, ddl: str) -> None:
    """Apply one DDL event to the target (schema evolution)."""
    parts = ddl.strip().split()
    kind = parts[0].upper()
    if kind == "ADD" and parts[1].upper() == "COLUMN":
        name, typ = parts[2], parts[3]
        table.alter_add_column(name, _spark_type(typ))
    elif kind == "WIDEN":
        name, typ = parts[1], parts[2]
        table.alter_widen(name, _spark_type(typ))
    else:
        raise ValueError(f"unsupported DDL: {ddl}")


def _spark_type(name: str):
    return {"string": StringType(), "bigint": LongType(), "long": LongType()}[
        name.lower()
    ]


def replay_batch(
    spark: SparkSession,
    events: DataFrame,
    table: LakeTable,
    cfg: EngineConfig,
    batch_id: int = 0,
    use_pandas_assembly: bool = True,
    extra_summary: dict | None = None,
) -> list[dict]:
    """Replay a bounded slice of the change feed into the target table.

    Idempotent: transactions with commit_scn <= the table's scn high-water
    mark are skipped (OLR RedoLog.cpp:751-762), and a batch_id already
    committed is a no-op (snapshot write-audit).
    Returns the list of snapshot summaries produced (one per DDL sub-range).
    """
    decoded = decode_events(events, cfg)

    # DDL events split the batch into sub-ranges; DDLs are rare + tiny -> collect
    ddls = sorted(
        (r["scn"], r["ddl"])
        for r in decoded.where(F.col("op") == "DDL").select("scn", "ddl").collect()
    )
    dml_stream = decoded.where(F.col("op") != "DDL")

    bounds = [(None, ddls[0][0]) if ddls else (None, None)]
    for i, (scn, _d) in enumerate(ddls):
        hi = ddls[i + 1][0] if i + 1 < len(ddls) else None
        bounds.append((scn, hi))

    summaries: list[dict] = []
    sub = 0
    for i, (lo, hi) in enumerate(bounds):
        part = dml_stream
        if lo is not None:
            part = part.where(F.col("scn") > lo)
        if hi is not None:
            part = part.where(F.col("scn") <= hi)

        if i > 0:
            _apply_ddl(table, ddls[i - 1][1])

        s = _apply_dml_slice(
            spark, part, table, cfg, batch_id, sub, use_pandas_assembly,
            extra_summary,
        )
        if s is not None:
            summaries.append(s)
        sub += 1
    return summaries


def _apply_dml_slice(
    spark: SparkSession,
    part: DataFrame,
    table: LakeTable,
    cfg: EngineConfig,
    batch_id: int,
    sub: int,
    use_pandas_assembly: bool,
    extra_summary: dict | None,
) -> dict | None:
    # composite batch id keeps the write-audit monotonic across DDL sub-ranges
    composite = batch_id * 1024 + sub
    if composite <= table.last_batch_id():
        return {"operation": "merge", "skipped": True, "batch_id": composite}

    if use_pandas_assembly:
        assembled = assemble_transactions_pandas(part, cfg)
    else:
        assembled = assemble_transactions_sql(part, cfg)

    # checkpoint high-water mark: skip already-applied commits (resume filter)
    hwm = table.last_scn()
    if hwm >= 0:
        assembled = assembled.where(F.col("commit_scn") > hwm)

    payload_cols = [
        f.name for f in table.schema().fields if f.name not in table.key_cols
    ]
    updates = net_changes(assembled, table.key_cols, payload_cols)
    if not updates.take(1):
        # still advance the write-audit watermark so retries stay idempotent
        m = dict(table.manifest())
        m.update(version=m["version"] + 1, parent=m["version"],
                 last_batch_id=composite,
                 summary={"operation": "noop", "batch_id": composite})
        table._commit(m)
        return None

    rng = part.agg(
        F.min("scn").alias("lo"), F.max("scn").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return table.merge(
        spark,
        updates,
        batch_id=composite,
        summary={
            "scn_min": int(rng["lo"]) if rng["lo"] is not None else -1,
            "scn_max": int(rng["hi"]) if rng["hi"] is not None else -1,
            "events_in": int(rng["n"]),
            **(extra_summary or {}),
        },
    )
