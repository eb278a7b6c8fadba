"""Per-key net-change reduction (last-writer-wins with per-column coalescing).

OpenLogReplicator replays committed transactions strictly in commit-SCN order
(Transaction.cpp:122-392); applying that stream to a keyed table means: for
every merge key, the LAST committed write of each column wins, and a DELETE
kills every earlier value (RedoLog.cpp:751-762 guarantees each commit applies
once). This operator collapses a batch of assembled events into AT MOST ONE
merge action per key:

    op 'D'  — last effective event is a delete              -> MERGE delete
    op 'U'  — updates only, no delete in between            -> MERGE upsert,
              absent columns preserve target values (update-trim semantics,
              OutputBuffer.cpp:1893-1927)
    op 'RP' — a delete occurred before the last write       -> MERGE replace:
              target's prior values are dead; unset columns become NULL

Scale notes: implemented as a single groupBy().agg() of max(struct(ord, val))
expressions — Spark performs map-side partial aggregation, so a hot key
(Zipf-skewed conv_id) is pre-reduced on every input partition before the
shuffle; no explicit salting is needed on this path (see operators/skew.py for
the explicit two-stage salted variant used by the applyInPandas pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# encode the global apply order (commit_scn, scn, seq) as one orderable
# struct — seq breaks ties among rows unnested from one multi-row event
# (they share their packed event's scn)
def _ord():
    return F.struct(F.col("commit_scn").alias("c"), F.col("scn").alias("s"),
                    F.col("seq").alias("q"))


def net_changes(
    assembled: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    extra_aggs: list | None = None,
) -> DataFrame:
    """Reduce assembled committed events to one merge action per key.

    Input columns: key cols, op (I/U/D), after struct, cols_set, scn, commit_scn.
    Output: key cols, payload cols, op ('D'|'U'|'RP'), cols_set array<string>.
    ``extra_aggs``: additional per-key aggregate expressions passed through to
    the output unchanged (lets callers fold audits into this single shuffle).
    """
    o = _ord()
    # case-insensitive set-membership, matching getField's resolver: a
    # case-variant ADD COLUMN leaves the canonical (table) name and the
    # feed's cols_set entries differing only by case (round-5 review
    # finding: array_contains compares VALUES case-sensitively, so the
    # column was never seen as set). Lowered ONCE per row, not once per
    # payload column — N per-column transforms would N-plicate the array
    # walk in the pre-shuffle projection.
    assembled = assembled.withColumn(
        "_cols_set_l",
        F.transform(
            F.coalesce(F.col("cols_set"), F.array().cast("array<string>")),
            F.lower,
        ),
    )
    aggs = [
        F.max(F.when(F.col("op") == "D", o)).alias("_last_d"),
        F.max(F.when(F.col("op") != "D", o)).alias("_last_w"),
    ] + list(extra_aggs or [])
    for c in payload_cols:
        present = F.array_contains(F.col("_cols_set_l"), F.lit(c.lower()))
        aggs.append(
            F.max(
                F.when(
                    (F.col("op") != "D") & present,
                    F.struct(o.alias("o"), F.col("after").getField(c).alias("v")),
                )
            ).alias(f"_m_{c}")
        )

    g = assembled.groupBy(*key_cols).agg(*aggs)

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
    proj.append(
        F.array_compact(F.array(*set_entries)).alias("cols_set")
    )
    known = {"_last_d", "_last_w"} | {f"_m_{c}" for c in payload_cols}
    proj += [F.col(c) for c in g.columns if c not in known and c not in key_cols]
    return g.select(*proj)
