"""Vector similarity search over an embedding column (array<float>).

Three tiers:
  * ``topk_dot_quantized`` — exact brute force on integer-quantized vectors
    (floor(x*1000) per component). Integer dot products are bit-reproducible
    in ANSI SQL, which makes this the oracle-checkable baseline.
  * ``topk_cosine`` — float brute force, the quality baseline
    (JVM ``zip_with``/``aggregate``, no UDF).
  * ``topk_ivf`` — pruned search: a deterministic integer k-means-lite fit
    (``fit_ivf_cells``: seed cells = id % K, one Lloyd step, all-integer
    centroids/distances) assigns every vector a cell; each query fans out to
    its ``n_probe`` nearest cells. Prunes compute by ~n_cells/n_probe while
    staying bit-reproducible in ANSI SQL.

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


def _quantize(vec: Column, scale: int = 1000) -> Column:
    """floor(x*scale) per component — the integer domain the IVF / near-dup
    ops run in, so fit + assignment + scoring are bit-reproducible in SQL.
    Callers that SQUARE dot products (embedding_neardup_pairs) pass
    scale=100 to stay inside int64."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale).cast("long")
    )


def _dist2_int(a: Column, b: Column) -> Column:
    """Integer squared L2 between quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _dot_int(a: Column, b: Column) -> Column:
    """Integer dot between already-quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def fit_ivf_cells(
    emb: DataFrame, n_cells: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic integer k-means-lite IVF fit (one Lloyd step).

    Seed assignment: cell0 = vec_id % n_cells (deterministic, no RNG).
    Centroid: per-dimension floor(mean) of the quantized members — integer.
    Reassignment: argmin of squared L2 to the centroids, ties to the lowest
    cell id, encoded as one orderable bigint (dist * n_cells + cell) so the
    argmin is a plain MIN — exactly reproducible in ANSI SQL.

    Returns (assigned, centroids):
      assigned:  (vec_id, qv array<long>, cell int)
      centroids: (cell int, cv array<long>)

    Scale: the centroid fit is one explode + groupBy (linear, map-side
    partial agg); reassignment is corpus x n_cells with the centroid table
    BROADCAST (n_cells x dims values — bytes, not a shuffle of the corpus).
    More Lloyd rounds = repeat the same two jobs; cells then persist as a
    partition column so reads prune by cell (Iceberg partition transform).
    """
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        _quantize(F.col(vec_col)).alias("qv"),
        F.pmod(F.col(id_col), F.lit(n_cells)).cast("int").alias("cell0"),
    )
    per_dim = v.select("cell0", F.posexplode("qv").alias("i", "q"))
    cent = per_dim.groupBy("cell0", "i").agg(
        F.floor(F.sum("q").cast("double") / F.count(F.lit(1)))
        .cast("long").alias("c")
    )
    centroids = (
        cent.groupBy("cell0")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("i"), F.col("c")))),
                lambda s: s.getField("c"),
            ).alias("cv")
        )
        .select(F.col("cell0").alias("cell"), "cv")
    )
    ordc = (_dist2_int(F.col("qv"), F.col("cv")) * n_cells + F.col("cell"))
    assigned = (
        v.crossJoin(F.broadcast(centroids))
        .select("vec_id", "qv", ordc.alias("ord"))
        .groupBy("vec_id")
        .agg(F.pmod(F.min("ord"), F.lit(n_cells)).cast("int").alias("cell"))
        .join(v.select("vec_id", "qv"), "vec_id")
    )
    return assigned, centroids


def topk_ivf(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 8, n_probe: int = 2,
) -> DataFrame:
    """IVF-pruned top-k with COMPUTED cells + n_probe fan-out.

    Each query scans only its n_probe nearest cells (by squared L2 to the
    fitted centroids) — pruning compute by ~n_cells/n_probe vs brute force.
    Scores are integer quantized dots, so results are oracle-exact.
    Output: (query_id, neighbor_id, dot, rnk).
    """
    assigned, centroids = fit_ivf_cells(emb, n_cells, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("qqv")
    )
    ordc = (
        _dist2_int(F.col("qqv"), F.col("cv")) * n_cells + F.col("cell")
    ).alias("ord")
    w = Window.partitionBy("query_id").orderBy("ord")
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "qqv", F.col("cell"), ordc)
        .withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= n_probe)
        .select("query_id", "qqv", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot_int(F.col("qqv"), F.col("qv")).alias("dot"),
        )
    )
    return _rank_topk(scored, k, "dot").select(
        "query_id", "neighbor_id", "dot", "rnk"
    )
