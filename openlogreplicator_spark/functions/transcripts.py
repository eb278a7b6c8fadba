"""Conversation-level operators over the replayed transcript state.

The engine's lake table holds one row per (conv_id, turn_idx); a training
pipeline consumes CONVERSATIONS — the ordered turn sequence rendered back
into one document per conv_id (the inverse of the CDC decomposition). This
is the payload-specific rollup the reference leaves to its consumers (it
ships per-op JSON, OutputBufferJson.cpp; re-assembly is downstream work).

Scale: one groupBy(conv_id) with collect_list — the per-group array is
bounded by the conversation's turn count (tens to hundreds), never by the
table size, so the agg buffer stays small; map-side partial aggregation
applies, and sorting happens per group on the executor
(``array_sort`` over the collected structs), not as a global sort. No
Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def reconstruct_conversations(
    state: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    sep: str = "\x1f",
) -> DataFrame:
    """Roll the per-turn state back up into one row per conversation:
    turn count, turn-index range, the role sequence, and the full text in
    turn order. ``array_sort`` on struct(turn_idx, ...) gives a
    deterministic turn order regardless of partitioning (turn_idx is unique
    per conversation — the merge key).

    Output: conv_id, n_turns, first_turn, last_turn, roles (','-joined),
    full_text (sep-joined), n_chars.
    """
    turns = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(turn_col).alias("t"),
                F.col("role").alias("r"),
                F.col("text").alias("x"),
            )
        )
    )
    g = state.groupBy(conv_col).agg(turns.alias("_turns"))
    return g.select(
        F.col(conv_col),
        F.size("_turns").cast("long").alias("n_turns"),
        F.col("_turns")[0]["t"].alias("first_turn"),
        F.element_at("_turns", -1)["t"].alias("last_turn"),
        F.concat_ws(
            ",", F.transform("_turns", lambda s: F.coalesce(s["r"], F.lit("")))
        ).alias("roles"),
        F.concat_ws(
            sep, F.transform("_turns", lambda s: F.coalesce(s["x"], F.lit("")))
        ).alias("full_text"),
        F.aggregate(
            F.transform(
                "_turns",
                lambda s: F.length(F.coalesce(s["x"], F.lit(""))).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars"),
    )
