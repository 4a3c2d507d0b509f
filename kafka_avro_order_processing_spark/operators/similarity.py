"""Embedding similarity search over array<float> columns.

Brute-force cosine top-k as the verifiable baseline, with the scale
path (IVF-style partition pruning) layered on the same kernel.

Determinism: the dot product is a sequential left fold in float64
(F.aggregate), which bit-matches DuckDB's list_sum over an explicitly
double-cast list_transform — verified empirically — so cosine scores
hash-match the oracle with no tolerance.

Scale notes (100 TB of vectors):
- queries are broadcast (small side), candidates stream — no shuffle of
  the big side at all for brute force; compute is one codegen'd
  expression over the scan.
- ranking is per-query top-k via window row_number (shuffle on
  query_id only, k rows survive per query).
- the IVF variant assigns each vector to its nearest of c centroids at
  write time (partition column), so a query probes only its cell's
  partitions — classic partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"


def _dot(a: str, b: str) -> Column:
    return F.expr(DOT.format(a=a, b=b))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector (reused across queries)."""
    return df.withColumn("norm", F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the k nearest
    candidates by cosine similarity (excluding self), deterministic
    tie-break on candidate id."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    # Spread candidates across cores: the dot products are CPU-bound
    # and a single-file scan would otherwise pin them to one task.
    n_par = vectors.sparkSession.sparkContext.defaultParallelism
    c = with_norm(vectors.repartition(n_par, F.col(id_col)), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF cell assignment: each vector -> nearest centroid by cosine
    (deterministic tie-break on centroid id).  At scale this is the
    write-time partitioning step; reads then prune to probed cells."""
    c = with_norm(centroids, vec_col).select(
        F.col(centroid_id),
        F.col(vec_col).alias("cent_vec"),
        F.col("norm").alias("cent_norm"),
    )
    v = with_norm(vectors, vec_col)
    scored = v.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col(centroid_id),
        (_dot(vec_col, "cent_vec") / (F.col("norm") * F.col("cent_norm"))).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc(centroid_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, centroid_id)
    )
