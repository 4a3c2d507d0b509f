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

import math

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
    and threshold = floor(rate * 65536) is the md5-bucket cutoff
    ``apply_mixture_rates`` uses (16-bit buckets: an 8-bit space
    silently zeroed any rate under 1/256, and a positive rate that
    still quantizes to 0 raises in-plan rather than dropping the
    domain).

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
    ).withColumn("threshold", _threshold_expr())


#: 16-bit bucket space.  8 bits (the idiom's original size) zeroes any
#: rate under 1/256 — and UniMax routinely allocates a giant head
#: domain a tiny rate, so the finer space is load-bearing, not polish.
N_BUCKETS = 65536


def _threshold_expr():
    """floor(rate * N_BUCKETS) as the bucket cutoff, raising IN-PLAN
    when a POSITIVE rate quantizes to 0 — silently dropping a domain
    that was allocated budget is the one failure mode the mixture
    table must never hide."""
    raw = F.floor(F.col("rate") * N_BUCKETS).cast("bigint")
    msg = (
        f"mixture threshold: positive acceptance rate below 1/{N_BUCKETS} "
        "quantizes to bucket 0 and would silently drop the whole domain "
        "— coarsen the mixture or thin this domain upstream"
    )
    return F.when(
        (F.col("rate") > 0) & (raw <= 0),
        F.raise_error(F.lit(msg)).cast("bigint"),
    ).otherwise(raw)


def apply_mixture_rates(
    docs: DataFrame,
    rates: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Keep each document iff its salted md5 bucket (0..65535) falls
    under its domain's threshold — deterministic per (salt, id), so
    the sample is stable across reruns and growing corpora.  The rate
    table broadcasts; the filter is map-side."""
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
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


def unimax_rates(
    docs: DataFrame,
    domain_col: str,
    budget: int,
    max_epochs: float = 4.0,
    size_col: str | None = None,
) -> DataFrame:
    """UniMax sampling (Chung et al., ICLR 2023): spread a total token
    budget as UNIFORMLY as possible across domains, subject to a
    per-domain repeat cap — the published successor to temperature
    mixing (n^alpha needs a hand-tuned alpha and still over-samples
    heads / over-repeats tails; UniMax has one interpretable knob, the
    max epoch count C).

    The allocation is the paper's water-filling: visit domains by
    ascending capacity C*n_i; any domain whose capacity is below the
    current uniform share u = remaining_budget / remaining_domains is
    capped at its capacity (it simply cannot absorb more without more
    than C repeats), everyone else splits what is left equally.

    Returns (domain, n, budget, epochs, rate, threshold): ``epochs`` =
    budget/n may exceed 1 (the loader repeats that domain — upsampling
    is explicit, never hidden in a >1 "rate"); ``rate`` =
    min(1, epochs) is the one-pass acceptance rate and ``threshold``
    its md5-bucket cutoff, directly consumable by
    :func:`apply_mixture_rates`.

    ``size_col`` measures a domain by the SUM of that column (token
    counts — the paper's unit) instead of document counts.  Scale
    shape: one groupBy for the sizes, a driver loop over
    O(domains log domains) rows (model-sized — the kmeans budget), and
    a broadcast-ready rate table back out."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    size = (
        F.sum(F.col(size_col).cast("long"))
        if size_col
        else F.count(F.lit(1))
    )
    counts = (
        docs.select(F.col(domain_col).alias("domain"), *([size_col] if size_col else []))
        .groupBy("domain")
        .agg(size.cast("long").alias("n"))
        .collect()
    )
    if not counts:
        raise ValueError("unimax_rates: no domains (empty frame)")
    if any(r["domain"] is None for r in counts):
        raise ValueError(
            "unimax_rates: NULL domain values — filter or impute explicitly"
        )
    if any(r["n"] is None or r["n"] <= 0 for r in counts):
        raise ValueError("unimax_rates: every domain needs a positive size")
    # ascending capacity, domain (as string) the deterministic tiebreak
    order = sorted(
        counts, key=lambda r: (float(max_epochs) * r["n"], str(r["domain"]))
    )
    remaining = float(budget)
    alloc: dict[str, float] = {}
    for idx, r in enumerate(order):
        share = remaining / (len(order) - idx)
        cap = float(max_epochs) * r["n"]
        b = min(cap, share)
        alloc[r["domain"]] = b
        remaining -= b
    spark = docs.sparkSession
    rows = [
        (
            r["domain"],
            int(r["n"]),
            alloc[r["domain"]],
            alloc[r["domain"]] / r["n"],
            min(1.0, alloc[r["domain"]] / r["n"]),
        )
        for r in counts
    ]
    # driver-side twin of _threshold_expr's in-plan guard: a positive
    # allocation must survive quantization or fail loudly here, with
    # the offending domain named
    for domain, _, _, _, rate in rows:
        if rate > 0 and math.floor(rate * N_BUCKETS) <= 0:
            raise ValueError(
                f"unimax_rates: domain {domain!r} got a positive rate "
                f"{rate!r} below 1/{N_BUCKETS} — it would quantize to "
                "threshold 0 and be dropped entirely; raise the budget, "
                "lower max_epochs, or thin the domain upstream"
            )
    # keep the domain column's NATIVE type so apply_mixture_rates joins
    # cleanly against the source frame
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("domain", docs.schema[domain_col].dataType),
            StructField("n", LongType()),
            StructField("budget", DoubleType()),
            StructField("epochs", DoubleType()),
            StructField("rate", DoubleType()),
        ]
    )
    out = spark.createDataFrame(rows, schema)
    return out.withColumn(
        "threshold", _threshold_expr()
    )
