"""Streaming quality-filter scoring — operators/classifier.py's twin:
the trained model is a bag of LITERALS (weights, means, stds baked
into one JVM expression), so scoring a stream is a stateless map-side
projection — no join, no state store, no watermark.  Documents are
admitted/rejected by the learned filter as they land (the ingest-time
quality gate of a web-curation pipeline).

Scores are pure per-row arithmetic on that row alone, so the drained
stream BIT-matches the batch operator on the same rows under any
micro-batching (suite-pinned, one epoch and many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.classifier import score_logistic
from .pipeline import drain_to_df


def streaming_score_logistic(
    stream_df: DataFrame,
    model: dict,
    score_col: str = "quality_prob",
) -> DataFrame:
    """Score a feature stream under a batch-trained logistic model
    (bounded drain; in production the same plan runs continuously).
    Output schema matches :func:`operators.classifier.score_logistic`.
    """
    return drain_to_df(score_logistic(stream_df, model, score_col), "append")
