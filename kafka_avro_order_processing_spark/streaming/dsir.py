"""Streaming DSIR weighting — operators/dsir.py's ingest twin: the
fitted ratio table ships as a broadcast artifact and every landing
document computes its log importance weight inside its own row — one
Arrow-batched UDF, no join, no keyed state, no watermark.  The
at-ingest use: route or down-weight raw documents the moment they
land, before they ever hit the curation batch.

Bit-match contract (suite-pinned, one epoch and many): drained weights
equal batch :func:`operators.dsir.dsir_log_weights` on the same rows
EXACTLY — the artifact carries the batch plan's own JVM-quantized
2^52-scaled ratio integers (``_log_ratio_scaled``), per-doc sums are
pure integer arithmetic, and the featurization replicates the batch
expressions bit-for-bit: ASCII-whitespace split (the standing Java
``\\s`` contract), unigram+bigram grams, and the salted-md5 4-hex-digit
bucket (hashlib.md5 equals Spark ``md5`` on UTF-8 bytes by
definition).

Driver traffic: the collected table is O(n_buckets) — 10k rows at the
paper's configuration, the sanctioned shipped-artifact budget class.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dsir import _FEATURE_SALT
from ..operators.similarity import MEAN_SCALE
from .pipeline import drain_to_df

# Java \s semantics (ASCII-only) — the batch split contract.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def collect_dsir_ratios(ratios: DataFrame) -> dict[int, int]:
    """Freeze the fitted table into the broadcastable artifact:
    bucket -> JVM-quantized scaled log ratio (exact ints)."""
    return {
        int(r["bucket"]): int(r["ratio_int"])
        for r in ratios.select("bucket", "ratio_int").collect()
    }


def _py_bucket(gram: str, n_buckets: int) -> int:
    """The batch ``_bucket_expr`` bit-for-bit: first 4 hex digits of
    md5('dsir:' || gram), mod n_buckets."""
    h = hashlib.md5((_FEATURE_SALT + gram).encode("utf-8")).hexdigest()
    return int(h[:4], 16) % n_buckets


def _py_features(text, n_buckets: int) -> dict[int, int]:
    if not text:
        return {}
    words = [w for w in _JAVA_WS.split(text) if w]
    grams = list(words)
    grams.extend(
        f"{a} {b}" for a, b in zip(words, words[1:])
    )
    out: dict[int, int] = {}
    for g in grams:
        b = _py_bucket(g, n_buckets)
        out[b] = out.get(b, 0) + 1
    return out


def streaming_dsir_log_weights(
    stream_docs: DataFrame,
    ratios: DataFrame,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Weight landing documents under the frozen ratio table (bounded
    drain; in production the same plan runs continuously in front of
    mixture routing).  Output schema matches
    :func:`operators.dsir.dsir_log_weights`: (id_col, log_weight)."""
    table = collect_dsir_ratios(ratios)

    @F.pandas_udf(T.DoubleType())
    def weigh(texts: pd.Series) -> pd.Series:
        def one(t):
            acc = 0
            for b, cnt in _py_features(t, n_buckets).items():
                ri = table.get(b)
                if ri is not None:
                    # the batch plan's exact arithmetic: integer cnt
                    # times the JVM-quantized ratio integer
                    acc += cnt * ri
            return float(acc) / float(MEAN_SCALE) if acc else 0.0

        return texts.map(one)

    out = stream_docs.select(
        F.col(id_col), weigh(F.col(text_col)).alias("log_weight")
    )
    return drain_to_df(out, "append")


__all__ = ["collect_dsir_ratios", "streaming_dsir_log_weights"]
