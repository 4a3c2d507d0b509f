"""Streaming Naive Bayes classification — operators/nb.py's ingest
twin: the trained model ships as a broadcast artifact (the langid.py
deployment shape) and every landing document classifies inside its
own row — one Arrow-batched UDF, no join, no keyed state, no
watermark.

Bit-match contract (suite-pinned, one epoch and many): the drained
predictions equal the batch :func:`operators.nb.nb_predict` on the
same rows EXACTLY, because every float the twin touches is the same
f64 the batch plan produced —

- the per-(gram, label) correction terms are collected ALREADY
  QUANTIZED: the batch plan's single double->decimal rounding
  (``log((count+a)/a) * 2^52`` cast to DECIMAL(38,0), see
  ``operators.nb._log_term_scaled``) is evaluated in the JVM and
  shipped as exact Python ints, so Java's ``Double.toString`` digit
  generation (pre-Ryu, non-minimal — NOT reproducible via
  ``Decimal(x)`` or ``Decimal(repr(x))``) never needs replicating;
- the per-(doc, class) correction sum is then pure integer
  arithmetic (``cnt * term_int``), order-free and engine-free, and
  the final ``int -> f64`` conversion plus the ``/ 2^52`` exponent
  shift are correctly-rounded in both engines;
- the class constants (log prior, log miss) use the same
  ``math.log`` formula :func:`nb_score` itself uses driver-side, and
  the score combines them in the batch plan's association order.

Driver traffic: the collected model is O(vocab x classes) — the
sanctioned shipped-artifact budget class of the unigram/WordPiece
encode twins (langid-style models are MBs by construction).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.nb import _log_term_scaled
from ..operators.similarity import MEAN_SCALE
from .pipeline import drain_to_df


def collect_nb_model(
    priors: DataFrame, features: DataFrame, n_vocab: int, alpha: float = 1.0
) -> dict:
    """Freeze the trained tables into the broadcastable artifact:
    per-gram per-label JVM-quantized correction integers, class
    constants, and the vocabulary set."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    pri = priors.collect()
    if not pri:
        raise ValueError("collect_nb_model: empty priors table")
    n_total = sum(r["n_docs"] for r in pri)
    consts = {
        r["label"]: (
            math.log(r["n_docs"] / n_total),
            math.log(alpha / (r["n_grams"] + alpha * n_vocab)),
        )
        for r in pri
    }
    # the batch plan's own quantized integers — the exact expression
    # nb_score folds into its per-(doc, class) sums
    term_rows = features.select(
        "gram", "label", _log_term_scaled(alpha).alias("term_int")
    ).collect()
    terms: dict[str, dict[str, int]] = {}
    for r in term_rows:
        terms.setdefault(r["gram"], {})[r["label"]] = int(r["term_int"])
    return {"consts": consts, "terms": terms}


def _predict_one(text, model, n):
    if text is None or len(text) < n:
        grams: dict[str, int] = {}
    else:
        grams = {}
        for i in range(len(text) - n + 1):
            g = text[i : i + n]
            grams[g] = grams.get(g, 0) + 1
    terms = model["terms"]
    nv = sum(c for g, c in grams.items() if g in terms)
    best = None
    runner = None
    for label in model["consts"]:
        log_prior, log_miss = model["consts"][label]
        corr_int = 0
        for g, cnt in grams.items():
            t = terms.get(g)
            if t is None:
                continue
            lt = t.get(label)
            if lt is None:
                continue
            # the batch plan's exact arithmetic: integer cnt times the
            # JVM-quantized term integer — exact, order-free
            corr_int += cnt * lt
        corr = float(corr_int) / float(MEAN_SCALE) if corr_int else 0.0
        score = log_prior + float(nv) * log_miss + corr
        key = (-score, label)
        if best is None or key < best[0]:
            runner = best
            best = (key, label, score)
        elif runner is None or key < runner[0]:
            runner = (key, label, score)
    margin = best[2] - runner[2] if runner is not None else None
    return best[1], best[2], margin


def streaming_nb_predict(
    stream_docs: DataFrame,
    priors: DataFrame,
    features: DataFrame,
    n_vocab: int,
    alpha: float = 1.0,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify landing documents under the frozen model (bounded
    drain; in production the same plan runs continuously in front of
    per-language routing).  Output schema matches
    :func:`operators.nb.nb_predict`: (id_col, label, log_score,
    margin)."""
    model = collect_nb_model(priors, features, n_vocab, alpha)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("label", T.StringType()),
                T.StructField("log_score", T.DoubleType()),
                T.StructField("margin", T.DoubleType()),
            ]
        )
    )
    def clf(texts: pd.Series) -> pd.DataFrame:
        rows = [_predict_one(t, model, n) for t in texts]
        return pd.DataFrame(
            {
                "label": [r[0] for r in rows],
                "log_score": [r[1] for r in rows],
                # dtype=object so a single-class model's all-None
                # margin column crosses Arrow as SQL NULLs — a bare
                # list would infer float64 whose NaN is NOT null,
                # diverging from batch nb_predict's lead()-over-one-row
                # NULL (the r9 ADVICE edge)
                "margin": pd.Series(
                    [r[2] for r in rows], dtype=object, index=texts.index
                ),
            },
            index=texts.index,
        )

    out = stream_docs.select(
        F.col(id_col), clf(F.col(text_col)).alias("__p")
    ).select(
        F.col(id_col),
        F.col("__p.label").alias("label"),
        F.col("__p.log_score").alias("log_score"),
        F.col("__p.margin").alias("margin"),
    )
    return drain_to_df(out, "append")


__all__ = ["collect_nb_model", "streaming_nb_predict"]
