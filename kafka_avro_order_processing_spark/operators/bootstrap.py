"""Uncertainty for corpus-scale statistics — the Poisson bootstrap
(Chamandy et al., Google TR 2012 "Estimating Uncertainty for Massive
Data Streams"): the published way to bootstrap when the data cannot be
resampled-with-replacement in memory.  Each of B replicates gives every
row an independent Poisson(1) weight; for large n the replicate's
weighted statistic is distributed like a classical bootstrap
resample's, and the per-replicate weights need ONE streaming pass —
no shuffling of row indices, no n-sized resample materialization.

Determinism (the repo contract): the Poisson draws are NOT rand() —
each (row id, replicate) pair hashes through the salted-md5 idiom to a
uniform in (0,1], inverted through the Poisson(1) CDF as a fixed
8-term ladder (P(K >= 9) < 1.1e-6 at lambda = 1; the tail collapses
into k = 8, a documented truncation far below bootstrap noise).  Reruns,
repartitionings, and growing corpora reproduce the identical replicate
weights, and the test replica re-derives them bit-for-bit.

Float discipline: replicate means go through the 2^52-scaled
DECIMAL(38,0) sum (weights are small integers, so weight * scaled
value stays exact-integer) — every replicate statistic is
bit-deterministic under any partitioning; the percentile pick is then
driver-side order statistics over the B-row replicate frame.

Scale shape: ONE explode of B (replicate, weight) pairs per row —
weight-0 pairs are dropped at the source, so ~63% of nothing-rows
never exist — into one partial+final groupBy on the replicate id
(B groups, embarrassingly parallel), then an O(B) driver collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import MEAN_SCALE

_MAX_K = 8


def _poisson_cdf_ladder() -> list[float]:
    """Cumulative P(K <= k) for Poisson(1), k = 0.._MAX_K-1 — baked as
    float literals so the JVM expression and the Python replica compare
    the SAME constants."""
    out, acc, term = [], 0.0, math.exp(-1.0)
    for k in range(_MAX_K):
        acc += term
        out.append(acc)
        term /= k + 1
    return out


def _weight_expr(id_col: str, rep: str, salt: str) -> F.Column:
    """Deterministic Poisson(1) weight for (row, replicate): uniform
    from the first 13 md5 hex chars (52 bits — exactly a double's
    mantissa, uniform in [0,1)), stepped through the CDF ladder."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col(id_col).cast("string"), F.col(rep)
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 52))
    )
    w = F.lit(_MAX_K)
    for k, c in reversed(list(enumerate(_poisson_cdf_ladder()))):
        w = F.when(u < F.lit(c), F.lit(k)).otherwise(w)
    return w


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    b: int = 200,
    alpha: float = 0.05,
    salt: str = "boot:",
) -> dict:
    """Percentile-bootstrap CI for the mean of ``value_col``.  Returns
    {mean, lo, hi, b, alpha, n} — ``mean`` is the exact (decimal-sum)
    full-data mean, ``lo``/``hi`` the floor((B+1)*q)-th order statistics
    of the B replicate means (the standard percentile pick; B is the
    knob, not a corpus-sized resample).  Rows with a NULL value or id
    are rejected loudly — a silently shrinking denominator is a wrong
    CI, not a smaller one.  The NULL count rides in the SAME
    aggregation as the full-data mean (count in the one pass, fail
    after — the r10 verdict's single-pass validation), so rejection
    never costs an extra corpus scan."""
    if b < 2:
        raise ValueError(f"b must be >= 2, got {b}")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    scaled = F.expr(
        f"CAST(CAST(`{value_col}` AS DOUBLE) * {MEAN_SCALE}D AS DECIMAL(38,0))"
    )
    null_row = F.col(value_col).isNull() | F.col(id_col).isNull()
    base = df.select(
        F.col(id_col).alias("__id"),
        scaled.alias("__v"),
        null_row.cast("long").alias("__bad"),
    )
    full = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__bad").cast("long").alias("n_null"),
        (
            F.sum("__v").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(float(MEAN_SCALE)))
        ).alias("mean"),
    ).collect()[0]
    n_null = int(full["n_null"] or 0)
    if n_null:
        raise ValueError(
            f"poisson_bootstrap_mean_ci: {n_null} rows have a NULL "
            f"{value_col!r} or {id_col!r} — filter explicitly first"
        )
    n = int(full["n"])
    if n == 0:
        raise ValueError("poisson_bootstrap_mean_ci: empty frame")

    reps = base.select(
        "__id",
        "__v",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(int(b))),
                lambda r: r.cast("string"),
            )
        ).alias("__rep"),
    ).withColumn("__w", _weight_expr("__id", "__rep", salt)).filter(
        F.col("__w") > 0
    )
    rep_means = (
        reps.groupBy("__rep")
        .agg(
            (
                F.sum(F.col("__w").cast("decimal(18,0)") * F.col("__v"))
                .cast("double")
                / (
                    F.sum("__w").cast("double")
                    * F.lit(float(MEAN_SCALE))
                )
            ).alias("m")
        )
        .collect()
    )
    # replicates whose every weight drew 0 vanish from the groupBy —
    # possible only for tiny n; they re-enter as the full mean (the
    # resample of nothing is centered, and dropping them would bias
    # the percentile pick's index arithmetic)
    means = sorted(
        [float(r["m"]) for r in rep_means]
        + [float(full["mean"])] * (b - len(rep_means))
    )
    lo_i = max(0, min(b - 1, int(math.floor((b + 1) * (alpha / 2.0))) - 1))
    hi_i = max(0, min(b - 1, int(math.ceil((b + 1) * (1.0 - alpha / 2.0))) - 1))
    return {
        "mean": float(full["mean"]),
        "lo": means[lo_i],
        "hi": means[hi_i],
        "b": int(b),
        "alpha": float(alpha),
        "n": n,
    }
