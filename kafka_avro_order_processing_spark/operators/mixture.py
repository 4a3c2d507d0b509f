"""Temperature-scaled domain mixing — the multilingual/multi-domain
sampling rule (Arivazhagan et al. '19; T5's and ROOTS' corpus mixing):
sample domain i with probability proportional to n_i^alpha.  alpha = 1
keeps natural proportions, alpha -> 0 approaches uniform — the knob
that up-samples tail domains without hand-written weights.

This module computes the per-domain ACCEPTANCE RATES for a target
corpus size and applies them with the repo's retrieval-stable salted
md5-bucket filter (the deterministic-sampling idiom shared with
dataset splits and `domain_mixture_sample`), so reruns and incremental
ingests keep/drop identical documents.

Scale shape: one groupBy for domain counts, two scalar broadcasts
(the n^alpha normalizer and nothing else), and a map-side hash filter
— the rate table is rows-of-domains tiny, the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temperature_mixture_rates(
    docs: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
) -> DataFrame:
    """Per-domain acceptance rates for p_i ∝ n_i^alpha.  Returns
    (domain, n, rate, threshold) where rate = min(1, T * p_i / n_i)
    and threshold = floor(rate * 256) is the md5-bucket cutoff
    ``apply_mixture_rates`` uses.

    ``target_total`` T defaults to the LARGEST total the temperature
    distribution can honor without over-sampling any domain
    (T = min_i n_i / p_i): every domain's rate is then exactly
    feasible and the scarcest-relative-to-target domain is kept in
    full.  A smaller T scales every domain down proportionally; a
    larger one clamps head domains at rate 1 (stated, not hidden —
    the realized mixture then deviates from n^alpha exactly where
    clamping bit)."""
    counts = docs.select(F.col(domain_col).alias("domain")).groupBy(
        "domain"
    ).agg(F.count(F.lit(1)).alias("n"))
    powed = counts.withColumn(
        "w", F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
    )
    tot = powed.agg(F.sum("w").alias("w_sum"))
    with_p = powed.crossJoin(F.broadcast(tot)).withColumn(
        "p", F.col("w") / F.col("w_sum")
    )
    if target_total is None:
        t = with_p.agg(
            F.min(F.col("n").cast("double") / F.col("p")).alias("t")
        )
        with_t = with_p.crossJoin(F.broadcast(t))
    else:
        with_t = with_p.withColumn("t", F.lit(float(target_total)))
    return with_t.select(
        "domain",
        "n",
        F.least(
            F.lit(1.0), F.col("t") * F.col("p") / F.col("n").cast("double")
        ).alias("rate"),
    ).withColumn(
        "threshold", F.floor(F.col("rate") * 256).cast("bigint")
    )


def apply_mixture_rates(
    docs: DataFrame,
    rates: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Keep each document iff its salted md5 bucket (0..255) falls
    under its domain's threshold — deterministic per (salt, id), so
    the sample is stable across reruns and growing corpora.  The rate
    table broadcasts; the filter is map-side."""
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 2
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.join(
            F.broadcast(
                rates.select(
                    F.col("domain").alias(domain_col), "threshold"
                )
            ),
            domain_col,
        )
        .filter(bucket < F.col("threshold"))
        .drop("threshold")
    )
