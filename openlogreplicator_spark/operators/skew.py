"""Explicit skew handling for hot conversations (north-rule requirement).

The feed's conv_id is Zipf-skewed: a few conversations carry a large share of
events. Three mechanisms, composable:

  * ``salted_net_changes`` — two-stage exact net-change reduction:
    stage 1 aggregates by (key, salt) where salt = hash(scn) % S, splitting a
    hot key's rows across S reducers; stage 2 combines the S partials by key.
    Every aggregate used is associative+commutative (max of an
    (ord, value) struct; min/max/sum for audits), so the composition is
    EXACT — the same trick as Spark's map-side partial aggregation, but with
    an explicit, tunable reducer fan-out for when the partial-agg hash map
    degrades (very high key cardinality forcing sort-based fallback, or an
    extreme single-key batch).
    The salt is derived from scn (the row), never from the key, so per-key
    ordering information is carried by the ord struct, not the partitioning —
    un-salting is just the second groupBy (cf. SURVEY.md §4 partitioning row).
  * ``hot_keys`` — frequency sketch of the current batch (approximate,
    one pass) to decide WHERE salting is worth it.
  * AQE skew-join splitting (spark.sql.adaptive.skewJoin) covers the merge
    join's base side; enabled by default in EngineConfig sessions.

Reference parity: OpenLogReplicator is single-threaded per database and has
no skew concept — parallelism itself is this engine's upgrade (SURVEY.md §4
"Partitioning / shuffle": custom logic needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from openlogreplicator_spark.operators.lww import _ord


def hot_keys(
    events: DataFrame,
    key_cols: list[str],
    min_share: float = 0.01,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Keys carrying more than ``min_share`` of the batch's rows (approximate
    if ``sample_fraction`` is set — one cheap pass either way)."""
    src = events.sample(sample_fraction) if sample_fraction else events
    total = src.count()
    return (
        src.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= F.lit(max(int(total * min_share), 1)))
    )


def salted_net_changes(
    assembled: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    salt_partitions: int = 16,
) -> DataFrame:
    """Two-stage exact net-change reduction with explicit salting.

    Semantics identical to operators.lww.net_changes (tested equal); use when
    a batch concentrates extreme row counts on few keys. Output: key cols,
    payload cols, op ('D'|'U'|'RP'), cols_set.
    """
    salt = F.pmod(F.xxhash64(F.col("scn")), F.lit(salt_partitions)).alias("_salt")
    o = _ord()

    # stage 1: partial per (key, salt) — splits hot keys across reducers
    partial_aggs = [
        F.max(F.when(F.col("op") == "D", o)).alias("_last_d"),
        F.max(F.when(F.col("op") != "D", o)).alias("_last_w"),
    ]
    for c in payload_cols:
        present = F.array_contains(
            F.coalesce(F.col("cols_set"), F.array().cast("array<string>")), c
        )
        partial_aggs.append(
            F.max(
                F.when(
                    (F.col("op") != "D") & present,
                    F.struct(o.alias("o"), F.col("after").getField(c).alias("v")),
                )
            ).alias(f"_m_{c}")
        )
    partial = (
        assembled.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
    )

    # stage 2: combine partials per key (max is associative/commutative)
    combine = [F.max("_last_d").alias("_last_d"), F.max("_last_w").alias("_last_w")]
    combine += [F.max(f"_m_{c}").alias(f"_m_{c}") for c in payload_cols]
    g = partial.groupBy(*key_cols).agg(*combine)

    # final projection — same classification as net_changes
    is_del = F.col("_last_w").isNull() | (
        F.col("_last_d").isNotNull() & (F.col("_last_d") > F.col("_last_w"))
    )
    replaced = F.col("_last_d").isNotNull() & ~is_del
    proj = [F.col(k) for k in key_cols]
    set_entries = []
    for c in payload_cols:
        m = F.col(f"_m_{c}")
        alive = m.isNotNull() & (
            F.col("_last_d").isNull() | (m.getField("o") > F.col("_last_d"))
        )
        proj.append(F.when(alive, m.getField("v")).alias(c))
        set_entries.append(F.when(alive, F.lit(c)))
    proj.append(
        F.when(is_del, F.lit("D"))
        .when(replaced, F.lit("RP"))
        .otherwise(F.lit("U"))
        .alias("op")
    )
    proj.append(F.array_compact(F.array(*set_entries)).alias("cols_set"))
    return g.select(*proj)
