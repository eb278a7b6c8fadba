"""Derive a deterministic CDC change feed from the driver's ``events`` table.

The driver's correctness harness (CORRECTNESS_r{N}.json) compares each Spark
query against an ANSI-SQL oracle run by DuckDB over the same parquet tables.
The engine's native feed generator (feed.py) uses xxhash64, which DuckDB cannot
reproduce — so for the oracle-checked surface we derive a change feed from
``events.parquet`` using ONLY arithmetic that is bit-identical in Spark SQL and
DuckDB SQL (modulo, row_number, string concat of integers).

Mapping (locked — the SQL in FEED_SQL must mirror this exactly):

    scn      = event_id                       (globally unique, the redo SCN)
    xid      = cast(user_id as string)        (transaction id)
    seq      = row_number() over (partition by user_id order by event_id)
    cnt      = count(*)    over (partition by user_id)
    op       = B                      when seq = 1
               R if user_id%19=0 else C   when seq = cnt
               PR                     when event_id%11=0 and seq>=3
               D                      when event_id%7=0
               I                      when event_id%3=0
               U                      otherwise
    conv_id  = 'c' || (user_id % 50)          (merge key part 1 — collides across txs)
    turn_idx = event_id % 20                  (merge key part 2)
    role     = event_type
    text     = 'v' || event_id
    ts       = ts
    trimmed  = op='U' and event_id%5=0        (COLUMN_FORMAT_CHANGED analog:
                                               update carries only `text`)
    cols_set = []              for D
               ['text']        when trimmed
               ['role','text','ts'] otherwise

Every invariant of the native feed holds: (scn, seq) totally ordered, every DML
between its xid's B and terminator, PR pops the latest unpopped DML
(reference: TransactionBuffer.cpp:159-183), R discards the transaction, commit
order = commit-event SCN order (RedoLog.cpp:733-766).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# payload columns of the derived target table (no `tool`/`meta` — the derived
# feed never sets them, and all-NULL columns add nothing to the oracle check)
DERIVED_PAYLOAD = ("role", "text", "ts")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def derive_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> CHANGE_EVENT-shaped DataFrame (see module docstring)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    wp = Window.partitionBy("user_id")
    d = ev.select(
        F.col("event_id").alias("scn"),
        F.row_number().over(w).cast("long").alias("seq"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("ts").alias("src_ts"),
    )
    op = (
        F.when(F.col("seq") == 1, F.lit("B"))
        .when(
            F.col("seq") == F.col("cnt"),
            F.when(F.col("user_id") % 19 == 0, F.lit("R")).otherwise(F.lit("C")),
        )
        .when((F.col("scn") % 11 == 0) & (F.col("seq") >= 3), F.lit("PR"))
        .when(F.col("scn") % 7 == 0, F.lit("D"))
        .when(F.col("scn") % 3 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    d = d.withColumn("op", op)
    is_dml = F.col("op").isin("I", "U", "D")
    trimmed = (F.col("op") == "U") & (F.col("scn") % 5 == 0)
    text = F.concat(F.lit("v"), F.col("scn").cast("string"))
    after = F.when(
        F.col("op").isin("I", "U"),
        F.struct(
            F.when(~trimmed, F.col("event_type")).alias("role"),
            text.alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.when(~trimmed, F.col("src_ts")).alias("ts"),
            F.lit(None).cast("string").alias("meta"),
        ),
    )
    cols_set = (
        F.when(F.col("op") == "D", F.array().cast("array<string>"))
        .when(trimmed, F.array(F.lit("text")))
        .when(is_dml, F.array(F.lit("role"), F.lit("text"), F.lit("ts")))
    )
    return d.select(
        F.col("scn").cast("long").alias("scn"),
        F.col("seq"),
        F.col("user_id").cast("string").alias("xid"),
        F.col("op"),
        F.lit("transcripts").alias("table"),
        F.when(
            is_dml, F.concat(F.lit("c"), (F.col("user_id") % 50).cast("string"))
        ).alias("conv_id"),
        F.when(is_dml, F.col("scn") % 20).cast("long").alias("turn_idx"),
        F.lit(None)
        .cast("struct<role:string,text:string,tool:string,ts:timestamp,meta:string>")
        .alias("before"),
        after.alias("after"),
        F.array().cast("array<string>").alias("before_cols"),
        cols_set.alias("cols_set"),
        F.lit(None).cast("string").alias("ddl"),
        F.col("src_ts").alias("ts"),
    )


# --------------------------------------------------------------------- SQL

# The DuckDB mirror of derive_feed(): CTEs `feed` (raw) and `surv`
# (committed surviving DML, the assemble_transactions output). Oracle queries
# in __spark_entry__.py compose on top of these. ``feed_sql(start_pred)``
# injects a start-position predicate between op assignment and assembly —
# the mirror of apply_start_position() running before decode: ops are
# assigned on the FULL feed (seq/cnt windows), then pre-start rows drop, so
# transactions already in flight lose their begin and are skipped.
_FEED_SQL_TEMPLATE = """
WITH feed AS (
  SELECT
    event_id AS scn,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS seq,
    COUNT(*) OVER (PARTITION BY user_id) AS cnt,
    CAST(user_id AS VARCHAR) AS xid,
    user_id,
    event_type,
    ts AS src_ts
  FROM events
), ops AS (
  SELECT *,
    CASE
      WHEN seq = 1 THEN 'B'
      WHEN seq = cnt THEN (CASE WHEN user_id % 19 = 0 THEN 'R' ELSE 'C' END)
      WHEN scn % 11 = 0 AND seq >= 3 THEN 'PR'
      WHEN scn % 7 = 0 THEN 'D'
      WHEN scn % 3 = 0 THEN 'I'
      ELSE 'U'
    END AS op
  FROM feed
), keyed AS (
  SELECT *,
    'c' || CAST(user_id % 50 AS VARCHAR) AS conv_id,
    scn % 20 AS turn_idx,
    (op = 'U' AND scn % 5 = 0) AS trimmed,
    'v' || CAST(scn AS VARCHAR) AS text_v
  FROM ops
), started AS (
  SELECT * FROM keyed WHERE {start_pred}
), ann AS (
  SELECT *,
    MAX(CASE WHEN op = 'C' THEN scn END) OVER (PARTITION BY xid) AS commit_scn,
    MAX(CASE WHEN op = 'B' THEN 1 ELSE 0 END) OVER (PARTITION BY xid) AS has_begin,
    MAX(CASE WHEN op = 'R' THEN 1 ELSE 0 END) OVER (PARTITION BY xid) AS rolled,
    SUM(CASE WHEN op = 'PR' THEN -1
             WHEN op IN ('I','U','D') THEN 1 ELSE 0 END)
      OVER (PARTITION BY xid ORDER BY scn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM started
), ann2 AS (
  SELECT *,
    MIN(running) OVER (PARTITION BY xid ORDER BY scn
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suffix_min
  FROM ann
), surv AS (
  SELECT * FROM ann2
  WHERE op IN ('I','U','D')
    AND suffix_min >= running
    AND commit_scn IS NOT NULL AND rolled = 0 AND {begin_pred}
)
"""


def feed_sql(start_pred: str = "TRUE", require_begin: bool = True) -> str:
    """FEED_SQL with a start-position predicate (DuckDB boolean expression
    over the ``keyed`` columns, e.g. ``scn >= 1000``). ``require_begin=False``
    mirrors EngineConfig(require_begin=False): transactions whose begin lies
    before the start position still flush their visible tail (the events
    table interleaves every xid across the whole scn range, so a mid-stream
    start with begin-gating would always be empty)."""
    return _FEED_SQL_TEMPLATE.format(
        start_pred=start_pred,
        begin_pred="has_begin = 1" if require_begin else "TRUE",
    )


FEED_SQL = feed_sql()
