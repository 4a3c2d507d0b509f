"""Streaming LM quality scoring — operators/lm.py's twin: the trained
bigram tables are the STATIC side of a stream-static join, so
documents are fluency-scored as they land instead of in a nightly
batch (the CCNet filter applied at ingest time).

A document's exploded bigrams all travel in the row that carries the
document, so every doc's score finalizes within its own micro-batch;
the decimal log-prob partial sum is order-free and mergeable, so the
drained scores BIT-match the batch operator on the same rows under
any micro-batching (suite-pinned, one epoch and many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.lm import _logprob_rows, _score_agg
from .pipeline import drain_to_df


def streaming_lm_score(
    stream_docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score a document stream under a batch-trained LM (bounded
    drain; in production the same plan runs continuously).  Output
    schema matches :func:`operators.lm.lm_score`."""
    scored = _logprob_rows(
        stream_docs, bigrams, contexts, vocab_size, alpha, id_col, text_col
    )
    return drain_to_df(_score_agg(scored, id_col), "update", key_cols=(id_col,))
