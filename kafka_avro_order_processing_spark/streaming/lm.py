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


def streaming_ccnet_buckets(
    stream_docs: DataFrame,
    threshold_edges: DataFrame,
    score_col: str,
    group_col: str | None = None,
    lower_is_better: bool = True,
    out_col: str = "bucket",
) -> DataFrame:
    """Tag landing documents head/middle/tail against FROZEN CCNet
    cutoffs (:func:`operators.lm.ccnet_threshold_edges` over a
    reference corpus) — the production ingest shape: the percentile
    split is computed once batch-side, then every arriving doc
    compares its oriented score to the broadcast per-group cuts
    (stream-static join, stateless, no watermark).  On the SAME rows
    the tags BIT-match the batch :func:`operators.lm.ccnet_buckets`
    (monotonicity of the midrank percentile in the oriented score —
    suite-pinned, one epoch and many).  NULL scores keep a NULL
    bucket; a doc whose group has no edge row (unseen group) also
    tags NULL — unknown, never silently tail."""
    from pyspark.sql import functions as F

    oriented = (
        F.col(score_col).cast("double")
        if lower_is_better
        else -F.col(score_col).cast("double")
    )
    tagged = stream_docs.withColumn("__oriented", oriented)
    # __seen marks "this group HAS a reference row" — a degenerate
    # reference group can have BOTH cuts NULL (a 1-2 row group's
    # minimum percentile already exceeds 2/3: everything is tail),
    # which must not be confused with an unseen group (NULL bucket).
    edges_marked = threshold_edges.withColumn("__seen", F.lit(True))
    if group_col:
        joined = tagged.join(F.broadcast(edges_marked), group_col, "left")
    else:
        joined = tagged.crossJoin(F.broadcast(edges_marked))
    out = joined.withColumn(
        out_col,
        F.when(
            F.col("__oriented").isNull() | F.col("__seen").isNull(),
            F.lit(None).cast("string"),
        )
        .when(
            F.col("head_cut").isNotNull()
            & (F.col("__oriented") <= F.col("head_cut")),
            F.lit("head"),
        )
        .when(
            F.col("middle_cut").isNotNull()
            & (F.col("__oriented") <= F.col("middle_cut")),
            F.lit("middle"),
        )
        .otherwise(F.lit("tail")),
    ).drop("__oriented", "head_cut", "middle_cut", "__seen")
    return drain_to_df(out, "append")


def streaming_backoff_lm_score(
    stream_docs: DataFrame,
    lm,
    lam: float = 0.4,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stupid-backoff scoring at ingest — operators/lm.py's
    :func:`backoff_lm_score` twin.  The batch plan resolves scores per
    DISTINCT gram (a self-join a stream cannot do), so the twin joins
    each position row directly against the five static model tables
    instead; the resolving expression is shared verbatim
    (``_backoff_join_and_resolve``), so every position row carries the
    identical 2^52-scaled integer and the drained per-doc sums BIT-match
    the batch operator on the same rows under any micro-batching
    (suite-pinned).  Output schema matches ``backoff_lm_score``."""
    from ..operators.lm import (
        _backoff_agg,
        _backoff_join_and_resolve,
        _doc_trigram_positions,
    )

    if not (0.0 < lam <= 1.0):
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if lm.n_tokens <= 0:
        raise ValueError("streaming_backoff_lm_score: empty model")
    pos = _doc_trigram_positions(stream_docs, id_col, text_col)
    rows = _backoff_join_and_resolve(pos, lm, lam, alpha, (id_col,))
    return drain_to_df(_backoff_agg(rows, id_col), "update", key_cols=(id_col,))
