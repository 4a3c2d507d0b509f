"""Streaming centroid training: Lloyd rounds as bounded streaming
drains — the streaming twin of operators.similarity.kmeans_refine and
the unification of the engine's streaming and ANN-training surfaces.

Each round re-reads the vector stream, assigns every arriving vector
to its nearest current centroid (centroids are PLAN LITERALS — k
vectors baked into the assignment expression, nothing broadcast or
joined at runtime), and accumulates per-(cell, dim) sums as a
streaming aggregation.  The sums are the same 2^52-scaled
DECIMAL(38,0) partials as the batch operator (similarity.MEAN_SCALE):
decimal addition is associative, so the result is IDENTICAL no matter
how the stream is micro-batched — one file per trigger, one row per
trigger, or everything at once.  That associativity is what makes a
streaming Lloyd round well-defined at all: micro-batch boundaries are
an execution detail, not a semantic input (float sums would make the
centroids depend on trigger timing).

Reference lineage: the reference maintains running per-key aggregates
in consumer state (src/aggregator/price_aggregator.py:35-51); this
module is that pattern — unbounded stream in, incrementally-updated
keyed state, snapshot out — applied to centroid training, with the
per-record dict update replaced by a Structured Streaming aggregation
(k*dim state keys) drained per round.

At production scale: rounds over a Kafka source use update-mode with
the epoch changelog (streaming/pipeline.drain_to_df) instead of
complete-mode snapshots, and assignment literals refresh per round
exactly as here — k*dim doubles through the driver per round is the
sanctioned iterative-algorithm driver action (same budget class as
graph.py's convergence fingerprint).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import MEAN_SCALE
from .pipeline import drain_to_df, stream_table


def _fold_dot(vec_sql: str, lits: list[float]) -> str:
    """Sequential float64 fold of <vec, literal-vector> — the same op
    order as similarity.DOT, so scores bit-match the batch path."""
    arr = ", ".join(repr(v) + "D" for v in lits)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), "
        "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
    )


def _assign_expr(centroids: list[tuple[int, list[float]]], norm_col: str, vec_col: str):
    """Nearest-centroid cell id as ONE column expression (streaming-
    safe — no window, no join): argmax over k literal cosine scores,
    ties to the smallest cell id via lexicographic struct max on
    (sim, -cell).  Expects the row's L2 norm precomputed in
    `norm_col` (it is shared by all k scores)."""
    entries = []
    for cell_id, vec in centroids:
        # centroid norm: left fold in dim order, matching Spark's
        # aggregate() and DuckDB's list_sum evaluation order
        acc = 0.0
        for v in vec:
            acc += v * v
        cnorm = math.sqrt(acc)
        entries.append(
            f"struct({_fold_dot(vec_col, vec)} / ({norm_col} * {cnorm!r}D) AS sim, "
            f"{-cell_id} AS negcell)"
        )
    return (-F.expr(f"array_max(array({', '.join(entries)})).negcell")).alias(
        "centroid_id"
    )


def _round_means(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One streaming Lloyd round: drain the vector stream through
    assignment + per-(cell, dim) decimal-sum aggregation, return
    (centroid_id, dim, mean, n) — bit-equal to the batch
    operators.similarity.cell_means on the same data."""
    stream = stream_table(spark, sf_dir, table)
    with_n = stream.select(
        F.col(vec_col),
        F.expr(
            f"sqrt(aggregate(zip_with({vec_col}, {vec_col}, "
            "(x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v))"
        ).alias("_norm"),
    )
    assigned = with_n.select(_assign_expr(centroids, "_norm", vec_col), F.col(vec_col))
    elems = assigned.select(
        "centroid_id", F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    agg = elems.groupBy("centroid_id", "dim").agg(
        F.sum(
            F.expr(f"CAST(CAST(val AS DOUBLE) * {MEAN_SCALE}D AS DECIMAL(38,0))")
        ).alias("ssum"),
        F.count("*").alias("n"),
    )
    drained = drain_to_df(agg, "complete")
    return drained.select(
        "centroid_id",
        "dim",
        (
            F.col("ssum").cast("double")
            / (F.col("n").cast("double") * F.lit(float(MEAN_SCALE)))
        ).alias("mean"),
        F.col("n"),
    )


def streaming_kmeans_refine(
    spark: SparkSession,
    sf_dir: str,
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`iters` Lloyd rounds, each a bounded streaming drain; returns
    the same (cell_id, n_members, centroid_norm, centroid_sum) digest
    as the batch kmeans_refine and hash-matches the same unrolled SQL
    oracle — the proof that the streaming path computes the batch
    answer exactly."""
    from ..operators.similarity import _dot

    seeds = (
        stream_table(spark, sf_dir, table)
        .filter(F.col(id_col) < k)
        .select(F.col(id_col), F.col(vec_col))
    )
    # Bounded drain of the k seed rows (a stream is the only input
    # surface here); k vectors through the driver, same budget as the
    # per-round literal refresh.
    seed_rows = drain_to_df(seeds, "append").collect()
    centroids = sorted(
        (int(r[id_col]), [float(x) for x in r[vec_col]]) for r in seed_rows
    )
    per = None
    for _ in range(iters):
        per = _round_means(spark, sf_dir, table, centroids, id_col, vec_col)
        mean_rows = per.select("centroid_id", "dim", "mean").collect()
        by_cell: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cell.setdefault(int(r["centroid_id"]), {})[int(r["dim"])] = float(
                r["mean"]
            )
        centroids = sorted(
            (cell, [dims[d] for d in sorted(dims)]) for cell, dims in by_cell.items()
        )
    cents = per.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda s: s["mean"],
        ).alias(vec_col),
        F.max("n").alias("n_members"),
    )
    return cents.select(
        F.col("centroid_id").alias("cell_id"),
        F.col("n_members"),
        F.sqrt(_dot(vec_col, vec_col)).alias("centroid_norm"),
        F.expr(f"aggregate({vec_col}, 0D, (acc, v) -> acc + v)").alias("centroid_sum"),
    )
