"""Count-min sketch — sublinear frequency estimation (Cormode &
Muthukrishnan '05) as a distributed aggregation.

Why it matters at 100 TB: exact per-key counts of a high-cardinality
column need a shuffle keyed by that column (state linear in the number
of distinct keys); the CMS is a FIXED d x w integer grid whose cells
are plain sums — associative and mergeable, so map-side partials
combine freely, executors each fold their partitions into a local grid,
and the merged sketch answers any point-frequency query with
 est >= exact  and  est <= exact + eps * N  (w = ceil(e/eps), with
probability 1 - delta, d = ceil(ln 1/delta)).  The same grid is the
standard building block for heavy-hitter detection over streams (the
reference's per-product counters, at cardinalities where exact state
no longer fits).

Determinism: bucket hashes are the first two hex digits of
md5("cms<depth>:<key>") — integer arithmetic reproducible in any
engine (the repo-wide md5 convention), and every cell value is an
integer sum, so sketches and estimates hash-match an ANSI oracle
exactly.

The reference engine keeps exact dict counters
(/root/reference/src/aggregator/price_aggregator.py:35-51); this is
the bounded-memory scale path for the same ask.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256  # first two md5 hex digits: exactly [0, 256)


def _bucket(key_col: str, depth: int):
    """Bucket of `key_col` in row `depth`: first two hex digits of
    md5('cms<depth>:'||key) as an int in [0, 256)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"cms{depth}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        )
        .cast("int")
    )


def cms_build(df: DataFrame, key_col: str, depth: int = CMS_DEPTH) -> DataFrame:
    """Fold a column into a count-min sketch: (depth, bucket, cnt) rows,
    at most depth * CMS_WIDTH of them regardless of input size.

    One narrow projection (each input row contributes `depth`
    (depth, bucket) pairs via an inline explode) and one keyed sum with
    map-side partials over a key space of d*w values — the shuffle
    moves O(d*w) partial rows per task, not the data."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("depth"), _bucket(key_col, r).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.depth", "p.bucket")
    return pairs.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, depth: int = CMS_DEPTH
) -> DataFrame:
    """Point-frequency estimates: for each probe key, min over its
    depth cells.  The sketch is tiny (<= d*w rows) — broadcast it; the
    min is an integer aggregate (order-free)."""
    probe_cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("depth"), _bucket(key_col, r).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.depth", "p.bucket")
    return (
        probe_cells.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
