"""Streaming filter monitoring — operators/eval.py's twin: confusion
counts of a deployed quality filter over a labeled stream (the canary
slice of ingest that carries ground-truth labels), maintained as ONE
global streaming aggregation.

State is four integers — tp/fp/fn/tn are associative integer sums, so
the drained counts BIT-match :func:`operators.eval.confusion_at_threshold`
on the same rows under any micro-batching (suite-pinned, one epoch and
many).  Rates (precision/recall/F1) are derived at read time from the
exact counts, never accumulated as floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import drain_to_df


def streaming_confusion(
    stream_df: DataFrame,
    threshold: float,
    score_col: str = "quality_prob",
    label_col: str = "label",
) -> DataFrame:
    """Drain a labeled score stream into exact confusion counts at one
    threshold ('predict positive when score >= threshold'); NULL
    score/label rows are excluded, like the batch operator.  Output:
    one row (tp, fp, fn, tn) — O(1) state however large the stream."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("bigint")
    pred = (s >= F.lit(float(threshold))).cast("bigint")
    agg = (
        stream_df.filter(s.isNotNull() & y.isNotNull())
        .agg(
            F.sum(pred * y).alias("tp"),
            F.sum(pred * (1 - y)).alias("fp"),
            F.sum((1 - pred) * y).alias("fn"),
            F.sum((1 - pred) * (1 - y)).alias("tn"),
        )
    )
    return drain_to_df(agg, "complete")
