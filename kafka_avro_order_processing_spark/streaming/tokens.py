"""Streaming tokenizer-coverage monitoring — operators/tokens.py's
twin: the shipped vocab is the STATIC side of a stream-static join,
so the OOV rate of landing documents is watched at ingest (a creeping
rate means the corpus drifted away from the tokenizer's training set —
the moment to retrain, not three stages later when loss curves
wobble).

Same shape as the LM twin: a document's tokens travel in its own row,
explode + vocab join + ONE keyed streaming aggregation back to the
document (Spark supports a single stateful aggregation per stream —
corpus totals are a plain batch fold over the drained per-doc frame).
Counts are integers, so the drained rows BIT-match
:func:`operators.tokens.oov_stats`'s per-doc output on the same rows
under any micro-batching (suite-pinned, one epoch and many).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pipeline import drain_to_df


def streaming_oov_stats(
    stream_tokenized: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Drain a tokenized document stream into per-doc OOV stats under
    a batch-trained vocab.  Output schema matches
    :func:`operators.tokens.oov_stats`'s per_doc frame:
    (id_col, n_tokens, n_oov, oov_rate).  State is O(documents-in-
    flight); totals are a batch aggregation over the result."""
    pos = stream_tokenized.select(
        F.col(id_col),
        F.posexplode_outer(tokens_col).alias("pos", "token"),
    )
    joined = pos.join(F.broadcast(vocab), "token", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("pos").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_tokens"),
        F.sum(
            F.when(
                F.col("pos").isNotNull() & F.col("token_id").isNull(), 1
            ).otherwise(0)
        ).cast("long").alias("n_oov"),
    )
    out = drain_to_df(per_doc, "update", key_cols=(id_col,))
    return out.select(
        id_col,
        "n_tokens",
        "n_oov",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("oov_rate"),
    )


def streaming_wordpiece_encode(
    stream_docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WordPiece-encode documents AS THEY LAND against a batch-trained
    vocabulary (operators/wordpiece.py) — the tokenizer twin of the
    hygiene family's stateless contract: a landing document is ONE
    row, so the whole greedy longest-match segmentation happens inside
    that row (one Arrow-batched UDF over the word array, no explode,
    no keyed state, no watermark) and the drained frame BIT-matches
    :func:`operators.wordpiece.wordpiece_encode` on the same rows
    under any micro-batching (suite-pinned, one epoch and many).
    Output schema matches the batch operator:
    (id_col, pieces, n_pieces, n_unk)."""
    from ..operators.wordpiece import UNK_PIECE, _sql_str, _wp_pieces

    vset = set(vocab)
    # Batch wordpiece_encode segments with Spark's Java-regex
    # split(text, '\\s+'), where \s is ASCII-only [ \t\n\x0b\f\r];
    # Python str.split() splits on UNICODE whitespace (NBSP, \x1c-\x1f,
    # \x85, \u2000-\u200a, ...), which would break the BIT-match contract on
    # any document containing non-ASCII whitespace -- so split with the
    # Java \s class explicitly (same contract as the levenshtein/PII
    # ASCII pins, suite-pinned with a NBSP row).
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg_doc(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return []
            out: list[str] = []
            for w in java_ws.split(t):
                if w:
                    out.extend(_wp_pieces(w, vset))
            return out

        return texts.map(one)

    unk = _sql_str(UNK_PIECE)
    out = stream_docs.select(
        F.col(id_col),
        seg_doc(F.col(text_col)).alias("pieces"),
    ).select(
        F.col(id_col),
        "pieces",
        F.size("pieces").cast("long").alias("n_pieces"),
        F.expr(f"size(filter(pieces, p -> p = {unk}))").cast("long").alias("n_unk"),
    )
    return drain_to_df(out, "append")


def streaming_unigram_segment(
    stream_tokenized: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_piece_len: int = 8,
) -> DataFrame:
    """Unigram-LM segmentation AS DOCUMENTS LAND — the trio's third
    ingest twin (WordPiece: :func:`streaming_wordpiece_encode`; BPE
    rides the batch merge replay which is already stateless): the
    trained piece table collects ONCE into broadcast scores and every
    landing document's tokens Viterbi-segment inside their own row
    (one Arrow-batched UDF, no explode, no keyed state, no watermark)
    — the drained frame BIT-matches
    :func:`operators.unigram.unigram_segment` on the same rows under
    any micro-batching (same Viterbi, same pinned tie order).
    Output schema matches the batch operator: (id_col, pieces,
    n_pieces)."""
    from ..operators.unigram import _viterbi

    scores = {
        r["piece"]: float(r["logprob"])
        for r in pieces.select("piece", "logprob").collect()
    }

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg_doc(tok_lists: pd.Series) -> pd.Series:
        def one(toks):
            if toks is None:
                return []
            out: list[str] = []
            for t in toks:
                if t:
                    out.extend(_viterbi(t, scores, max_piece_len))
            return out

        return tok_lists.map(one)

    out = stream_tokenized.select(
        F.col(id_col),
        seg_doc(F.col(tokens_col)).alias("pieces"),
    ).select(
        F.col(id_col),
        "pieces",
        F.size("pieces").cast("long").alias("n_pieces"),
    )
    return drain_to_df(out, "append")
