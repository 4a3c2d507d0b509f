"""Two-pass heavy hitters — Misra–Gries candidate generation plus an
exact recount, with a PROVABLE no-false-negative guarantee and an
exactly-SQL-checkable output (Misra & Gries '82 "Finding repeated
elements"; mergeability per Agarwal, Cormode, Huang, Phillips, Wei &
Yi, PODS'12 "Mergeable summaries").

Why it matters at 100 TB: "which keys appear more than φ·N times?"
over a high-cardinality column is the canonical skew/abuse/hot-key
question, but the naive GROUP BY key shuffles EVERY distinct key — at
billions of distinct URLs/users that shuffle is the job.  This
operator never shuffles the key space:

- pass 1 is MAP-ONLY (`mapInPandas`): each input partition folds its
  rows into a Misra–Gries summary of k counters.  MG guarantees
  count_p(x) - mg_p(x) <= n_p/(k+1), so if x is NOT a survivor in any
  partition then freq(x) <= Σ_p n_p/(k+1) = N/(k+1): every key with
  freq > N/(k+1) MUST surface as a candidate.  Output: <= k keys per
  partition.
- pass 2 recounts ONLY the candidates exactly: rows tag themselves by
  broadcast-joining the tiny candidate set (no shuffle of data rows;
  the aggregation groups <= k·P + 1 keys with map-side combine) and
  the same pass counts N.
- the final filter freq·(k+1) > N — INTEGER arithmetic — then equals
  EXACTLY the set {x : freq(x) > N/(k+1)} with exact counts, so the
  whole operator hash-matches the ANSI `GROUP BY ... HAVING
  COUNT(*)*(k+1) > N` oracle despite the approximate first pass.

Inside pass 1 the per-arrow-batch update is vectorized: value_counts
per batch (C speed), then one mergeable-summaries reduction — add the
batch counts, and while more than k counters survive subtract the
(k+1)-th largest counter from all and drop the non-positive ones
(the PODS'12 merge; error budgets add, staying <= n_p/(k+1)).

NULL keys are excluded (COUNT on the key's semantics); the oracle
carries the same WHERE.

The reference keeps exact per-product dict counters
(/root/reference/src/aggregator/price_aggregator.py:35-51) — fine at
5 products, linear state at web scale; this is the bounded-memory
answer to the same "top products" ask.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_reduce(counters: dict, k: int) -> dict:
    """Mergeable-summaries reduction to <= k counters: subtract the
    (k+1)-th largest count from every counter, drop <= 0."""
    if len(counters) <= k:
        return counters
    # (k+1)-th largest value (1-based): sort desc once.
    vals = sorted(counters.values(), reverse=True)
    sub = vals[k]  # index k = (k+1)-th largest
    return {key: c - sub for key, c in counters.items() if c - sub > 0}


def _mg_partition(pdfs: Iterator[pd.DataFrame], key: str, k: int):
    """Fold one partition's batches into an MG summary; emit the
    survivor keys (in the key column's own dtype)."""
    counters: dict = {}
    for pdf in pdfs:
        vc = pdf[key].dropna().value_counts()
        if vc.empty:
            continue
        for kk, c in vc.items():
            counters[kk] = counters.get(kk, 0) + int(c)
        counters = _mg_reduce(counters, k)
    if counters:
        yield pd.DataFrame({key: list(counters.keys())})


def mg_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Pass 1: map-only Misra–Gries survivors per partition, distinct.
    Every key with global freq > N/(k+1) is guaranteed present.  At
    most k keys leave each partition regardless of input size."""
    if k < 1:
        raise ValueError(f"mg_candidates needs k >= 1, got {k}")
    field = df.schema[key_col]
    out_schema = T.StructType([T.StructField(key_col, field.dataType)])

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _mg_partition(it, key_col, k)

    return df.select(key_col).mapInPandas(fn, out_schema).distinct()


def exact_recount(df: DataFrame, cand: DataFrame, key_col: str, k: int) -> DataFrame:
    """Pass 2: exact counts for a (small) candidate frame, plus the
    exact non-NULL total, in ONE data pass; keep freq*(k+1) > N.
    Shared by the batch operator and the streaming-candidates twin —
    the candidate source only needs the no-false-negative property."""
    rows = df.select(key_col).filter(F.col(key_col).isNotNull())
    # Tag each row by broadcast-lookup; non-candidates collapse into a
    # single NULL group (map-side combined: one partial row per task).
    tagged = rows.join(
        F.broadcast(cand.withColumn("_is_cand", F.lit(True))),
        on=key_col,
        how="left",
    ).select(
        F.when(F.col("_is_cand"), F.col(key_col)).alias("_k")
    )
    counts = tagged.groupBy("_k").agg(F.count("*").alias("freq"))
    totals = counts.agg(F.sum("freq").alias("n_total"))
    return (
        counts.filter(F.col("_k").isNotNull())
        .crossJoin(F.broadcast(totals))
        .filter(F.col("freq") * (k + 1) > F.col("n_total"))
        .select(
            F.col("_k").alias(key_col),
            "freq",
            "n_total",
            (F.col("freq").cast("double") / F.col("n_total").cast("double")
             ).alias("frac"),
        )
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """EXACTLY the keys with freq(key) > N/(k+1), with exact counts —
    computed without ever shuffling the full key space.

    Returns (key_col, freq BIGINT, n_total BIGINT, frac DOUBLE),
    one row per heavy key.  Oracle:

        SELECT key, COUNT(*) AS freq, n, COUNT(*)/n AS frac
        FROM t WHERE key IS NOT NULL GROUP BY key
        HAVING COUNT(*) * (k+1) > n     -- n = COUNT(key IS NOT NULL)

    The integer comparison freq*(k+1) > N avoids any float threshold.
    """
    return exact_recount(df, mg_candidates(df, key_col, k), key_col, k)


def _wmg_partition(pdfs: Iterator[pd.DataFrame], key: str, w: str, k: int):
    """Weighted MG fold: per batch, sum weights per key (vectorized),
    merge, reduce to <= k counters by subtracting the (k+1)-th largest
    weight-sum.  Same PODS'12 merge, weights instead of counts."""
    counters: dict = {}
    for pdf in pdfs:
        sub = pdf[[key, w]].dropna()
        sums = sub.groupby(key, sort=False)[w].sum()
        for kk, c in sums.items():
            counters[kk] = counters.get(kk, 0.0) + float(c)
        counters = _mg_reduce(counters, k)
    if counters:
        yield pd.DataFrame({key: list(counters.keys())})


def weighted_mg_candidates(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Pass 1, weighted: every key with total weight > W/(k+1) is
    guaranteed present (the MG bound holds verbatim with weights:
    sum_p(x) - mg_p(x) <= W_p/(k+1)).  Weights must be >= 0 (negative
    weights break the subtract-and-drop reduction) — enforced by
    ``weighted_heavy_hitters``'s recount raising on them."""
    if k < 1:
        raise ValueError(f"weighted_mg_candidates needs k >= 1, got {k}")
    field = df.schema[key_col]
    out_schema = T.StructType([T.StructField(key_col, field.dataType)])

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _wmg_partition(it, key_col, weight_col, k)

    return (
        df.select(key_col, weight_col).mapInPandas(fn, out_schema).distinct()
    )


def weighted_heavy_hitters(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """EXACTLY the keys whose total weight exceeds W/(k+1), with exact
    decimal weight sums — the weighted twin of ``heavy_hitters`` (keys
    hot by bytes / spend / tokens rather than row count).  Weights ride
    the repo money convention (DECIMAL(18,2) exact sums), so the
    comparison sum*(k+1) > W and the output hash-match the ANSI
    GROUP BY/HAVING oracle.  NULL keys are excluded; NULL, NaN, or
    negative weights raise in-plan (they would corrupt the MG bound).
    """
    cand = weighted_mg_candidates(df, key_col, weight_col, k)
    wd = F.col(weight_col).cast("double")
    bad = F.col(weight_col).isNull() | F.isnan(wd) | (wd < 0)
    checked = F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_heavy_hitters: NULL/NaN/negative "
                    f"{weight_col} at key="
                ),
                F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
            )
        ).cast("decimal(18,2)"),
    ).otherwise(F.col(weight_col).cast("decimal(18,2)"))
    rows = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col), checked.alias("_w")
    )
    tagged = rows.join(
        F.broadcast(cand.withColumn("_is_cand", F.lit(True))),
        on=key_col,
        how="left",
    ).select(F.when(F.col("_is_cand"), F.col(key_col)).alias("_k"), "_w")
    sums = tagged.groupBy("_k").agg(
        F.sum("_w").alias("wsum"), F.count("*").alias("freq")
    )
    totals = sums.agg(F.sum("wsum").alias("w_total"))
    return (
        sums.filter(F.col("_k").isNotNull())
        .crossJoin(F.broadcast(totals))
        .filter(F.col("wsum") * (k + 1) > F.col("w_total"))
        .select(
            F.col("_k").alias(key_col),
            F.col("wsum").cast("double").alias("weight_sum"),
            "freq",
            F.col("w_total").cast("double").alias("weight_total"),
        )
    )
