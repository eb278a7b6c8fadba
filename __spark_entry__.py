"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Every query here exercises a real engine operator (SURVEY.md §2) over the
driver's parquet tables. CDC queries run over a change feed derived
deterministically from ``events.parquet`` (openlogreplicator_spark/
feed_from_events.py) with arithmetic that is bit-identical in Spark and
DuckDB, so the oracle can replay the same semantics in ANSI SQL.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import StructType

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.feed_from_events import FEED_SQL, derive_feed
from openlogreplicator_spark.lake import LakeTable
from openlogreplicator_spark.operators.decode import feed_audit
from openlogreplicator_spark.operators.lww import net_changes
from openlogreplicator_spark.operators.assembly import (
    assemble_transactions_pandas,
    assemble_transactions_sql,
)
from openlogreplicator_spark.plans.replay import replay_batch

# ordering encoder shared by Spark queries and the SQL oracles:
# (commit_scn, scn) -> one orderable bigint. scn < 10^7 at any driver sf.
_ORD = 10_000_000

_CFG = EngineConfig()

# payload columns of the derived target (feed_from_events never sets tool/meta)
_DERIVED_TARGET = StructType.fromJson({
    "type": "struct",
    "fields": [
        {"name": "conv_id", "type": "string", "nullable": False, "metadata": {}},
        {"name": "turn_idx", "type": "long", "nullable": False, "metadata": {}},
        {"name": "role", "type": "string", "nullable": True, "metadata": {}},
        {"name": "text", "type": "string", "nullable": True, "metadata": {}},
        {"name": "tool", "type": "string", "nullable": True, "metadata": {}},
        {"name": "ts", "type": "timestamp_ntz", "nullable": True, "metadata": {}},
    ],
})


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine pipeline: derived feed -> decode -> assemble (applyInPandas)
    -> net-change -> snapshot-atomic MERGE into a fresh lake table -> read back.
    This is the strongest end-to-end check: the DuckDB oracle recomputes the
    final table state independently in SQL."""
    feed = derive_feed(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="olr_entry_tbl_")
    table = LakeTable.create(
        path, _DERIVED_TARGET, ["conv_id", "turn_idx"], num_buckets=_CFG.num_buckets
    )
    replay_batch(spark, feed, table, _CFG, batch_id=0)
    out = table.read(spark)
    return out.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end CDC replay + final-state readback on sf0.001."""
    return _replay_final_state(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------- CDC queries

def _q_feed_audit(spark, sf_dir):
    return feed_audit(derive_feed(spark, sf_dir))


def _q_assembly_sql(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    out = assemble_transactions_sql(ev, _CFG)
    return out.select("xid", "scn", "op", "commit_scn")


def _q_assembly_pandas(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    out = assemble_transactions_pandas(ev, _CFG)
    return out.select("xid", "scn", "op", "commit_scn")


def _q_net_changes(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    assembled = assemble_transactions_sql(ev, _CFG)
    nc = net_changes(assembled, ["conv_id", "turn_idx"], ["role", "text", "ts"])
    return nc.select(
        "conv_id",
        "turn_idx",
        F.col("op").alias("action"),
        "role",
        "text",
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


def _q_final_state(spark, sf_dir):
    return _replay_final_state(spark, sf_dir)


def _q_lww_dedup(spark, sf_dir):
    """G3 window form: last committed surviving write per key wins."""
    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("commit_scn"), F.desc("scn")
    )
    last = surv.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return last.where(F.col("op") != "D").select(
        "conv_id",
        "turn_idx",
        F.col("after.role").alias("role"),
        F.col("after.text").alias("text"),
        F.date_format(F.col("after.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


def _q_commit_order(spark, sf_dir):
    ev = derive_feed(spark, sf_dir)
    surv = assemble_transactions_sql(ev, _CFG)
    return surv.groupBy("xid", "commit_scn").agg(
        F.count(F.lit(1)).alias("n_dml"),
        F.min("scn").alias("first_scn"),
        F.max("scn").alias("last_scn"),
    )


def _q_update_trim(spark, sf_dir):
    """A2 changed-column detection over the raw events stream (lag diff)."""
    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = ev.select(
        "event_id",
        "user_id",
        (F.col("value") != F.lag("value").over(w)).alias("value_changed"),
        F.lag("value").over(w).isNotNull().alias("has_prev"),
    )
    return d.where(F.col("has_prev")).select("event_id", "user_id", "value_changed")


def _q_multirow_unnest(spark, sf_dir):
    """D5 multi-row unnest analog: explode word arrays into per-word rows."""
    docs = _tbl(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------- free-operator analytics

def _q_pricing_summary(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.lit(1)).alias("count_order"),
    )


def _q_nation_orders(spark, sf_dir):
    cust = _tbl(spark, sf_dir, "customer")
    nat = _tbl(spark, sf_dir, "nation")
    orders = _tbl(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.countDistinct("o_custkey").alias("num_customers"),
        )
    )


def _q_top_orders(spark, sf_dir):
    orders = _tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_feed_audit": _q_feed_audit,
        "cdc_assembly": _q_assembly_sql,
        "cdc_assembly_pandas": _q_assembly_pandas,
        "cdc_net_changes": _q_net_changes,
        "cdc_final_state": _q_final_state,
        "cdc_lww_dedup": _q_lww_dedup,
        "cdc_commit_order": _q_commit_order,
        "cdc_update_trim": _q_update_trim,
        "cdc_multirow_unnest": _q_multirow_unnest,
        "agg_pricing_summary": _q_pricing_summary,
        "join_nation_orders": _q_nation_orders,
        "window_top_orders": _q_top_orders,
    }


# -------------------------------------------------------------- oracle SQL

_ASSEMBLY_SQL = FEED_SQL + """
SELECT xid, scn, op, commit_scn FROM surv
"""

# per-key final state: per column, last set value after the last delete
_FINAL_STATE_SQL = FEED_SQL + f""",
acts AS (
  SELECT conv_id, turn_idx, op,
         commit_scn * {_ORD} + scn AS ord,
         CASE WHEN NOT trimmed THEN event_type END AS role_v,
         text_v,
         CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_v,
         NOT trimmed AS sets_role,
         op IN ('I','U') AS sets_text,
         NOT trimmed AS sets_ts
  FROM surv
), per_key AS (
  SELECT conv_id, turn_idx,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord,
    arg_max(ts_v, CASE WHEN op <> 'D' AND sets_ts AND ts_v IS NOT NULL
                       THEN ord END) AS ts_last,
    MAX(CASE WHEN op <> 'D' AND sets_ts THEN ord END) AS ts_ord
  FROM acts
  GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  CASE WHEN role_ord > del_ord THEN role_last END AS role,
  CASE WHEN text_ord > del_ord THEN text_last END AS text,
  CASE WHEN ts_ord > del_ord THEN ts_last END AS ts_str
FROM per_key
WHERE w_ord IS NOT NULL AND w_ord > del_ord
"""

_NET_CHANGES_SQL = FEED_SQL + f""",
acts AS (
  SELECT conv_id, turn_idx, op,
         commit_scn * {_ORD} + scn AS ord,
         CASE WHEN NOT trimmed THEN event_type END AS role_v,
         text_v,
         CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_v,
         NOT trimmed AS sets_role,
         op IN ('I','U') AS sets_text,
         NOT trimmed AS sets_ts
  FROM surv
), per_key AS (
  SELECT conv_id, turn_idx,
    MAX(CASE WHEN op = 'D' THEN ord END) AS del_ord_n,
    COALESCE(MAX(CASE WHEN op = 'D' THEN ord END), -1) AS del_ord,
    MAX(CASE WHEN op <> 'D' THEN ord END) AS w_ord,
    arg_max(role_v, CASE WHEN op <> 'D' AND sets_role AND role_v IS NOT NULL
                         THEN ord END) AS role_last,
    MAX(CASE WHEN op <> 'D' AND sets_role THEN ord END) AS role_ord,
    arg_max(text_v, CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_last,
    MAX(CASE WHEN op <> 'D' AND sets_text THEN ord END) AS text_ord,
    arg_max(ts_v, CASE WHEN op <> 'D' AND sets_ts AND ts_v IS NOT NULL
                       THEN ord END) AS ts_last,
    MAX(CASE WHEN op <> 'D' AND sets_ts THEN ord END) AS ts_ord
  FROM acts
  GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  CASE WHEN w_ord IS NULL OR w_ord < del_ord THEN 'D'
       WHEN del_ord_n IS NOT NULL THEN 'RP'
       ELSE 'U' END AS action,
  CASE WHEN role_ord > del_ord THEN role_last END AS role,
  CASE WHEN text_ord > del_ord THEN text_last END AS text,
  CASE WHEN ts_ord > del_ord THEN ts_last END AS ts_str
FROM per_key
"""

_LWW_SQL = FEED_SQL + """,
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY commit_scn DESC, scn DESC) AS rn
  FROM surv
)
SELECT conv_id, turn_idx,
  CASE WHEN NOT trimmed THEN event_type END AS role,
  text_v AS text,
  CASE WHEN NOT trimmed THEN strftime(src_ts, '%Y-%m-%d %H:%M:%S.%f') END AS ts_str
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_feed_audit": FEED_SQL + """
            SELECT MIN(scn) AS scn_min, MAX(scn) AS scn_max,
                   COUNT(*) AS events, COUNT(DISTINCT xid) AS txs
            FROM keyed
        """,
        "cdc_assembly": _ASSEMBLY_SQL,
        "cdc_assembly_pandas": _ASSEMBLY_SQL,
        "cdc_net_changes": _NET_CHANGES_SQL,
        "cdc_final_state": _FINAL_STATE_SQL,
        "cdc_lww_dedup": _LWW_SQL,
        "cdc_commit_order": FEED_SQL + """
            SELECT xid, commit_scn, COUNT(*) AS n_dml,
                   MIN(scn) AS first_scn, MAX(scn) AS last_scn
            FROM surv GROUP BY xid, commit_scn
        """,
        "cdc_update_trim": """
            SELECT event_id, user_id, value <> prev AS value_changed
            FROM (
              SELECT event_id, user_id, value,
                     LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
              FROM events
            ) WHERE prev IS NOT NULL
        """,
        "cdc_multirow_unnest": """
            SELECT doc_id, word, COUNT(*) AS cnt FROM (
              SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
              FROM documents WHERE doc_id < 50
            ) GROUP BY doc_id, word
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(SUM(FLOOR(l_extendedprice * 100 + 0.5)) AS BIGINT)
                     AS revenue_cents,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_nation_orders": """
            SELECT n_name, COUNT(*) AS num_orders,
                   COUNT(DISTINCT o_custkey) AS num_customers
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "window_top_orders": """
            SELECT o_custkey, o_orderkey, rnk FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
              FROM orders
            ) WHERE rnk <= 3
        """,
    }
