"""Sorts, limits, top-k (SURVEY.md §2.6 O1-O5 + top-k-per-group).

The reference sorts aggregate summaries driver-side
(/root/reference/src/aggregator/price_aggregator.py:128-132,
/root/reference/src/consumer/dead_letter_queue_consumer.py:146-159);
here sorting is a distributed range-shuffle and top-k per group is a
window rank — both scale-out primitives.  All orderings carry explicit
tiebreakers so results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def order_by_count_desc(df: DataFrame, count_col: str, *tiebreak: str) -> DataFrame:
    """O1-O3: sort a summary by count descending, stable tiebreak."""
    return df.orderBy(F.desc(count_col), *[F.asc(c) for c in tiebreak])


def top_k_per_group(
    df: DataFrame,
    group: str,
    order_col: str,
    k: int,
    tiebreak: str,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number over a partitioned window.

    One shuffle on the group key; rank + filter prunes to k rows per
    group before anything else happens downstream — at scale this is the
    standard pattern (no global sort, no collect).
    """
    ordering = [
        F.asc(order_col) if ascending else F.desc(order_col),
        F.asc(tiebreak),
    ]
    w = Window.partitionBy(group).orderBy(*ordering)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )


def top_k_global(df: DataFrame, order_col: str, k: int, tiebreak: str) -> DataFrame:
    """Global top-k: Spark compiles orderBy+limit to TakeOrderedAndProject
    (per-partition heap + driver merge of k rows, not a full sort)."""
    return df.orderBy(F.desc(order_col), F.asc(tiebreak)).limit(k)
