"""Token-budget sharding for training-data assembly.

A pretraining pipeline cuts a corpus into shards of ~N tokens each (context
-window packing happens inside the trainer; the pipeline's job is the
deterministic, resumable assignment of documents to shards). This operator
assigns each document a ``chunk_id`` by cumulative token count within a
group (language here): chunk k holds the documents whose preceding
cumulative token count falls in [k*capacity, (k+1)*capacity).

Deterministic and incremental: the order is (group, doc_id), so appending
documents never reassigns an existing one — exactly the property a CDC-fed
corpus needs (new docs extend the tail shard or open a new one).

This is budget SHARDING, not strict first-fit bin packing: a document may
straddle a boundary (its chunk is chosen by where it STARTS). Strict
first-fit with reset-on-overflow is inherently sequential per group
(each boundary depends on every prior row) and needs a recursive walk —
the window form below is the one-shuffle, scale-stable formulation, and
the downstream trainer splits straddling documents anyway.

Scale: one shuffle on the group column; the running sum is a single window
pass, linear per group. Skewed groups (one dominant language) cost their
own size — salt by a coarse doc_id prefix into sub-groups and offset
chunk_ids by a per-subgroup exclusive prefix sum (two bounded passes) if a
single group ever exceeds a partition's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def token_chunk_assign(
    docs: DataFrame,
    capacity_tokens: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign docs to ~capacity_tokens shards per group (see module doc).

    Tokens = whitespace tokens of the canonical normalized text (same
    normalization as functions/textstats.py, so counts agree across the
    pipeline). Output: input id/group + ``n_tokens``, ``chunk_id``,
    ``chunk_offset`` (token offset where this doc starts in its chunk).
    """
    from openlogreplicator_spark.functions.dedup import normalize_text

    t = normalize_text(F.col(text_col))
    d = docs.select(
        F.col(id_col), F.col(group_col),
        F.size(F.split(t, " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    cap = F.lit(int(capacity_tokens)).cast("long")
    return d.select(
        id_col, group_col, "n_tokens",
        F.floor(cum_before / cap).cast("long").alias("chunk_id"),
        (cum_before % cap).alias("chunk_offset"),
    )
