"""Temporal operators a training-data / feature pipeline needs that Spark
lacks as built-ins: backward AS-OF join and gap-based sessionization.

Both are pure JVM compositions (union + window / lag + windowed sum) — no
Python in the path — and both are ANSI-SQL expressible, so the driver
oracle-checks them (DuckDB has a native ASOF JOIN to check ours against).

Scale design:
  * ``asof_join`` uses the UNION trick, not a range join: tag both sides,
    union, one window per key ordered by (ts, side) carrying the right
    side's payload forward with ``last(ignorenulls)``. ONE shuffle on the
    join key, partition size = rows per key — never the quadratic
    (left x right-rows-in-range) blowup a naive range join pays, and no
    broadcast requirement on either side. Skewed keys behave like any
    window: bounded by the hottest key's row count.
  * ``sessionize`` is lag + cumulative sum over (key, ts) — also one
    shuffle, map-side nothing (windows need the sort), linear per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _micros(c):
    """Integer epoch microseconds. The feed's parquet timestamps are NTZ;
    under the engine's UTC session (config contract) the cast to TIMESTAMP
    is the identity mapping DuckDB's epoch_us applies to a naive value."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row of the
    same key with right.ts <= left.ts (DuckDB ``ASOF LEFT JOIN`` semantics;
    nulls where no prior right row exists).

    Determinism: if the right side can carry multiple rows per (key, ts),
    pre-aggregate it first — this operator asserts nothing about such ties
    and will take the union-order-last one. The driver query dedupes with
    max() per (key, ts) so the oracle comparison is exact.

    Implementation: union with a side tag ordered so that at equal ts the
    right row sorts FIRST (asof <= includes same-instant rows), then ONE
    ``last(struct, ignorenulls=True)`` window per key up to the current
    row. The whole right row is carried as a single struct — never
    per-column — so a matched right row's legitimate NULL fields survive
    (per-column ignorenulls would stitch fields from DIFFERENT right rows
    whenever the latest row holds a NULL).
    """
    from pyspark.sql.types import StructType as _ST

    rc = right_cols or [c for c in right.columns if c not in (key, ts)]
    r_struct_t = _ST([right.schema[c] for c in rc])
    l_tag = left.select(
        F.col(key), F.col(ts).alias("_t"), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(r_struct_t).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(key), F.col(ts).alias("_t"), F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in rc]).alias("_rrow"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        F.last(F.col("_rrow"), ignorenulls=True).over(w).alias("_carry"),
    )
    out_left = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"_carry.{c}").alias(
            f"{c}{suffix}" if c in left.columns else c
        )
        for c in rc
    ]
    return carried.where(F.col("_side") == 1).select(*out_left, *out_right)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds``. Adds ``session_idx``
    (0-based per key, in ts order). Classic lag + cumulative-sum window —
    the batch analog of Structured Streaming's session_window.

    Tie handling: events sharing (key, ts) order by a stable tiebreaker
    column if present (``event_id``), else by ts alone (same session either
    way — a zero gap never splits).
    """
    order = [F.col(ts).asc()]
    if "event_id" in events.columns:
        order.append(F.col("event_id").asc())
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    # integer microseconds, not float seconds: the gap comparison is then
    # bit-exact in any engine (DuckDB mirror: epoch_us(ts) - epoch_us(prev))
    is_new = (
        prev.isNull()
        | (_micros(F.col(ts)) - _micros(prev)
           > gap_seconds * 1_000_000)
    ).cast("long")
    # cumulative count of session starts, minus 1 -> 0-based index
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1,
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup over ``sessionize``: event count, span seconds,
    start/end. GroupBy after the window — map-side partial agg applies, and
    AQE coalesces the second (smaller) shuffle."""
    s = sessionize(events, key=key, ts=ts, gap_seconds=gap_seconds)
    return s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(_micros(F.col(ts)))
         - F.min(_micros(F.col(ts)))).alias("span_us"),
    )


def session_stats_native(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Spark's BUILT-IN session operator (``F.session_window``) as the
    alternative formulation of ``session_stats``: one groupBy over
    (session_window, key), fully JVM-side with map-side partial merge of
    overlapping windows.

    Boundary semantics MATCH ``sessionize`` and are pinned by
    test_session_window_boundary_semantics: session_window's merge test is
    INCLUSIVE — an event at EXACTLY prev + gap stays in the session, the
    same outcome as the lag form's ``diff > gap`` merge test, so both
    operators share one honest driver oracle.

    Output: key, session_start (min ts), session_end (last ts + gap),
    n_events.
    """
    w = F.session_window(F.col(ts), f"{int(gap_seconds)} seconds")
    return (
        events.groupBy(w.alias("_w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )
