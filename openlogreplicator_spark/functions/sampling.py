"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is irreproducible across runs, partitions,
and engines; a training pipeline needs the SAME sample every run for
ablations and incremental rebuilds. These operators rank rows inside each
stratum by a deterministic integer hash of the row id — reproducible
bit-for-bit in ANSI SQL (the driver's DuckDB oracle) and stable under
repartitioning, added data (an old row's hash never changes), and engine
swaps.

Scale: one shuffle on the stratum column; per-stratum top-k runs as a
WindowGroupLimit (rank <= k pushes the limit into the sort, so each
partition keeps only k rows — no full sort of the stratum). Skewed strata
cost their own size, not the table's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Knuth multiplicative constant (2654435761 = floor(2^32/phi)) mod the same
# prime the portable string hash uses — any SQL engine reproduces this
_A = 2654435761
_B = 7
_P = 1_000_000_007


def id_hash(col):
    """(id * 2654435761 + 7) % 1000000007 — deterministic int hash.
    DuckDB mirror: (id * 2654435761 + 7) % 1000000007."""
    return (F.col(col).cast("long") * F.lit(_A) + F.lit(_B)) % F.lit(_P)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-stratum sample: the k rows with the smallest
    ``id_hash(id)`` in each stratum (ties broken by id). Equivalent to a
    uniform random sample under the hash's mixing, but identical on every
    run/engine. Output: input columns + ``sample_rank`` (1-based)."""
    w = Window.partitionBy(stratum_col).orderBy(
        id_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def hash_fraction_sample(
    df: DataFrame,
    fraction_pct: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash falls under
    fraction_pct% of the hash modulus. Map-only (NO shuffle, no window) —
    the scale path when per-stratum exactness isn't needed. Integer-exact:
    keep iff id_hash(id) * 100 < fraction_pct * P."""
    return df.where(
        id_hash(id_col) * F.lit(100)
        < F.lit(int(fraction_pct)).cast("long") * F.lit(_P).cast("long")
    )
