"""Streaming Naive Bayes classification — operators/nb.py's ingest
twin: the trained model ships as a broadcast artifact (the langid.py
deployment shape) and every landing document classifies inside its
own row — one Arrow-batched UDF, no join, no keyed state, no
watermark.

Bit-match contract (suite-pinned, one epoch and many): the drained
predictions equal the batch :func:`operators.nb.nb_predict` on the
same rows EXACTLY, because every float the twin touches is the same
f64 the batch plan produced or would produce —

- the per-(gram, label) correction terms ``log((count+a)/a)`` are
  EVALUATED IN THE JVM batch-side (one select over the sparse feature
  table, collected with the model) rather than recomputed with
  Python's libm, so the ln() cross-engine hazard never enters;
- the class constants (log prior, log miss) use the same
  ``math.log`` formula :func:`nb_score` itself uses driver-side;
- the per-(doc, class) sum replicates the batch plan's 2^52-scaled
  DECIMAL(38,0) discipline digit-for-digit: each term rounds to an
  integer via ``Decimal(x).quantize(ROUND_HALF_UP)`` — exactly
  Spark's double->decimal(38,0) cast (HALF_UP on the double's exact
  binary expansion; NOT Python round(), which is half-to-even) — and
  the integer sum is order-free.

Driver traffic: the collected model is O(vocab x classes) — the
sanctioned shipped-artifact budget class of the unigram/WordPiece
encode twins (langid-style models are MBs by construction).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.similarity import MEAN_SCALE
from .pipeline import drain_to_df

_ZERO = Decimal(1)


def collect_nb_model(
    priors: DataFrame, features: DataFrame, n_vocab: int, alpha: float = 1.0
) -> dict:
    """Freeze the trained tables into the broadcastable artifact:
    per-gram per-label JVM-evaluated correction terms, class
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
    # the JVM's own log values — the exact doubles the batch plan uses
    term_rows = features.select(
        "gram",
        "label",
        F.log(
            (F.col("count").cast("double") + F.lit(float(alpha)))
            / F.lit(float(alpha))
        ).alias("term"),
    ).collect()
    terms: dict[str, dict[str, float]] = {}
    for r in term_rows:
        terms.setdefault(r["gram"], {})[r["label"]] = float(r["term"])
    return {"consts": consts, "terms": terms}


def _dec_round(x: float) -> int:
    """Spark's CAST(double AS DECIMAL(38,0)): HALF_UP on the double's
    exact decimal expansion."""
    return int(Decimal(x).quantize(_ZERO, rounding=ROUND_HALF_UP))


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
            # the batch plan's exact arithmetic: (cnt_double * term)
            # scaled by 2^52 and HALF_UP-rounded per (gram, label)
            corr_int += _dec_round(float(cnt) * lt * float(MEAN_SCALE))
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
        return pd.DataFrame(rows, columns=["label", "log_score", "margin"])

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
