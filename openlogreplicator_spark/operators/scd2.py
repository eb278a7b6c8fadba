"""SCD Type-2 history materialization of the committed change stream.

The reference emits a change stream and leaves history-keeping to the
consumer (OutputBufferJson.cpp renders each op with its scn so a downstream
warehouse can build a versioned table); this operator builds that versioned
table INSIDE the engine: every committed INSERT/UPDATE becomes a version row
carrying the key's full reconstructed state at that point, with a
``[valid_from, valid_to)`` ordinal range and an ``is_current`` flag. A
DELETE closes the last open version without opening a new one (classic
SCD2), and a later re-insert starts a fresh lineage "epoch" — values from
before the delete never leak across it (same dead-values rule as
``operators/lww.py`` net_changes, reference Transaction.cpp:122-392 replay
order).

Semantics per key (ordered by ``ord``, a caller-supplied globally-ordered
long — commit_scn-major, scn-minor):

  * epoch(e)      = number of DELETEs strictly before e (a delete ends its
                    epoch; the next write starts the new one)
  * state(e)      = per payload column, the last value SET (cols_set) by an
                    I/U event in e's epoch up to and including e — update
                    trim means an update that doesn't set a column carries
                    the prior version's value forward
  * valid_from(e) = e.ord;  valid_to(e) = ord of the key's next event (ANY
                    op, so a delete closes the version); NULL = open
  * is_current    = valid_to IS NULL (deletes never emit, so a key whose
                    last event is a delete has no current version)

Scale: two window passes over ONE hash-partitioning of the key — Catalyst
plans a single Exchange on the key columns and both window groups (epoch
count + lead, then the per-epoch state carry) run in the same stage where
the sort orders agree; per-key cost is linear in that key's event count.
The output is append-friendly: a later batch only ever (a) appends new
versions and (b) closes the previously-open version of touched keys, which
is exactly a keyed MERGE on (key, valid_from) — no rewrite of closed
history. No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def scd2_history(
    assembled: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    ord_expr: Column | None = None,
) -> DataFrame:
    """Build the SCD2 version table from assembled committed events.

    Input columns: key cols, ``op`` (I/U/D), ``after`` struct, ``cols_set``
    array, ``scn``, ``commit_scn`` (the assemble_transactions output
    contract). ``ord_expr`` must be a globally-ordered long, unique per
    (key, event) — default ``commit_scn * 2^22 + scn`` assumes scn < 2^22
    per commit window; callers with multi-row unnested events (shared scn)
    should fold ``seq`` in.

    Output: key cols, payload cols (reconstructed state), ``valid_from``,
    ``valid_to`` (nullable long), ``is_current``.
    """
    o = (
        ord_expr
        if ord_expr is not None
        else (F.col("commit_scn") * F.lit(1 << 22) + F.col("scn"))
    )
    df = assembled.withColumn("_ord", o.cast("long"))

    wk = Window.partitionBy(*key_cols).orderBy("_ord")
    df = df.withColumn(
        "_epoch",
        F.count(F.when(F.col("op") == "D", F.lit(1))).over(
            wk.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn("_valid_to", F.lead("_ord").over(wk))

    # per-epoch state carry on the SAME key partitioning (not (key, epoch) —
    # that would force a second exchange): carry the latest SET value per
    # column tagged with ITS epoch, and null it out when that epoch is older
    # than the current row's (ord is monotone per key, so the latest set row
    # overall is the latest in-epoch one whenever epochs match). The value
    # itself may legitimately be NULL, so it rides inside the struct —
    # last(ignorenulls) skips "not set" rows but keeps a set NULL (mirrors
    # net_changes' max(struct(ord, val)) trick).
    we = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    state_cols = []
    for c in payload_cols:
        present = (F.col("op") != "D") & F.array_contains(
            F.coalesce(F.col("cols_set"), F.array().cast("array<string>")),
            c,
        )
        wrapped = F.when(
            present,
            F.struct(
                F.col("_epoch").alias("e"),
                F.col("after").getField(c).alias("v"),
            ),
        )
        carry = F.last(wrapped, ignorenulls=True).over(we)
        state_cols.append(
            F.when(
                carry.getField("e") == F.col("_epoch"), carry.getField("v")
            ).alias(c)
        )

    out = df.select(
        *[F.col(k) for k in key_cols],
        *state_cols,
        F.col("op"),
        F.col("_ord").alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_valid_to").isNull().alias("is_current"),
    )
    return out.where(F.col("op") != "D").drop("op")
