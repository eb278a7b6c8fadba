"""Vector similarity search over an embedding column (array<float>).

Three tiers:
  * ``topk_dot_quantized`` — exact brute force on integer-quantized vectors
    (floor(x*1000) per component). Integer dot products are bit-reproducible
    in ANSI SQL, which makes this the oracle-checkable baseline.
  * ``topk_cosine`` — float brute force, the quality baseline
    (JVM ``zip_with``/``aggregate``, no UDF).
  * ``topk_ivf`` — pruned search: candidates restricted to the query's
    cluster (IVF cell). Here the cell assignment is the ``label`` column;
    in production the cells come from a k-means fit and the search fans out
    to n_probe nearest cells. Prunes compute by ~n_cells/n_probe.

Scale: brute force is a broadcast of the (small) query set against the
(huge) corpus — Spark broadcasts `queries` automatically below the join
threshold; the corpus side never shuffles. IVF additionally prunes the scan
by cell (partition the corpus by cell -> partition pruning on read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot_quantized(a: Column, b: Column) -> Column:
    """Integer dot product of floor(x*1000) quantized vectors (exact)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: F.floor(x.cast("double") * 1000)
            * F.floor(y.cast("double") * 1000),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def _rank_topk(scored: DataFrame, k: int, score_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc(score_col), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def topk_dot_quantized(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by quantized integer dot product.
    Output: (query_id, neighbor_id, dot, rnk). Ties broken by neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                _dot_quantized(F.col("qv"), F.col("cv")).alias("dot"))
    )
    return _rank_topk(scored, k, "dot").select("query_id", "neighbor_id", "dot", "rnk")


def topk_cosine(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Float cosine top-k (quality baseline; not oracle-exact)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                _cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    return _rank_topk(scored, k, "cos").select("query_id", "neighbor_id", "cos", "rnk")


def topk_ivf(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-pruned top-k: search only the query's cell (integer-exact scores).
    Output: (query_id, neighbor_id, dot, rnk)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col(cell_col).alias("qcell"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.col(cell_col).alias("ccell"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("ccell") == F.col("qcell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id",
                _dot_quantized(F.col("qv"), F.col("cv")).alias("dot"))
    )
    return _rank_topk(scored, k, "dot").select("query_id", "neighbor_id", "dot", "rnk")
