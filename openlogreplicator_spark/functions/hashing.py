"""Deterministic hash primitives shared by dedup / similarity operators.

Two families:

  * ``portable_hash`` — a char-fold polynomial hash expressed in pure Spark SQL
    expressions whose result is bit-identical to an ANSI-SQL re-implementation
    (DuckDB ``list_reduce``); used wherever the driver's DuckDB oracle must
    reproduce the value exactly.
  * ``fast_hash`` — xxhash64, the JVM-native production hash (an order of
    magnitude faster); drop-in replacement once oracle parity is not needed.

The reference has a family of scalar conversions in the same role
(RowId.cpp:26-120 base-64 encode, OutputBufferJson.cpp:374-486 appenders);
like there, hashing stays row-parallel and total-function (no state).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

P = 1_000_000_007  # modulus of the portable polynomial hash
SEED = 7


def portable_hash(col: Column) -> Column:
    """Left-fold (acc*31 + ascii(char)) % P over the string's characters.

    DuckDB mirror:
      list_reduce(list_prepend(CAST(7 AS BIGINT),
        list_transform(string_split(s,''), c -> CAST(ascii(c) AS BIGINT))),
        (a,b) -> (a*31+b) % 1000000007)
    """
    return F.aggregate(
        F.split(col, ""),
        F.lit(SEED).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % P,
    )


def fast_hash(col: Column) -> Column:
    """Production path: 64-bit xxhash (JVM intrinsic)."""
    return F.xxhash64(col)


def minhash_proj(h: Column, j: Column) -> Column:
    """j-th universal-hash projection of a shingle hash: ((2j+1)h + 5j+3) % P.
    Coefficients are fixed odd/affine so Spark and the SQL oracle agree."""
    return ((2 * j + 1) * h + (5 * j + 3)) % P
