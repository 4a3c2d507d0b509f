"""Split conformal prediction — distribution-free calibration of a
scoring model's error (Vovk et al., "Algorithmic Learning in a Random
World"; Papadopoulos et al. 2002 inductive form; Angelopoulos &
Bates 2023 tutorial): from a held-out calibration set of
nonconformity scores, the finite-sample-corrected quantile

    q_hat = the ceil((n + 1) * (1 - alpha))-th smallest score

guarantees P(score_test <= q_hat) >= 1 - alpha for exchangeable data
— the standard way to turn ANY quality/uncertainty score into a
coverage-guaranteed filter, which is exactly how a curation pipeline
wants to consume the repo's classifier / LM / calibration scores.

Why it fits this engine: the threshold is an ORDER STATISTIC — pure
integer index arithmetic plus an exact selection, so the result is
bit-deterministic, DuckDB-oracle-able, and composes with
``threshold_for_keep_rate`` (rate-targeted) as the coverage-targeted
twin.  No floats are manufactured: q_hat IS one of the observed
scores.

Scale shape: ``conformal_threshold`` is a global sort limited to one
row (TakeOrdered — never a full materialized sort at the driver);
``grouped_conformal_thresholds`` is one window rank per group (the
per-group sessionization bound); coverage audits are single integer
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: alpha is quantized to this denominator before any index arithmetic:
#: users pass DECIMAL alphas (0.1, 0.05, 0.01) whose float is a hair
#: off the intended rational, and float ceil((n+1)*(1-alpha))
#: mis-rounds at representable boundaries (10 * (1 - 0.95) =
#: 0.50000000000000044).  Millionths make the intended decimal EXACT,
#: keep (n+1)*(den-num) inside an int64 for any n < 9e12 per group,
#: and give the global and grouped paths identical k for the same n.
ALPHA_DEN = 1_000_000


def _alpha_num(alpha: float) -> int:
    num = round(float(alpha) * ALPHA_DEN)
    if not (0 < num < ALPHA_DEN):
        raise ValueError(
            f"alpha must be in (0, 1) at 1e-6 resolution, got {alpha}"
        )
    return num


def _k_of(n: int, alpha: float) -> int:
    """ceil((n+1)(1-alpha)) with alpha as the exact rational
    num/ALPHA_DEN — pure integer ceil-division, no float rounding."""
    num = _alpha_num(alpha)
    t = (n + 1) * (ALPHA_DEN - num)
    return (t + ALPHA_DEN - 1) // ALPHA_DEN


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    alpha: float = 0.1,
) -> dict:
    """The split-conformal quantile of the calibration scores.
    Returns {qhat, n, k, alpha} with qhat = the k-th smallest score,
    k = ceil((n+1)(1-alpha)).  Raises when k > n (the calibration set
    is too small for the requested coverage — the honest failure; a
    clamped max would silently promise less than 1 - alpha).  NULL
    scores are rejected in the same pass that counts rows."""
    _alpha_num(alpha)  # validates range at the 1e-6 quantization
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(score_col).isNull().cast("long")).cast("long").alias(
            "n_null"
        ),
    ).collect()[0]
    n = int(agg["n"])
    n_null = int(agg["n_null"] or 0)
    if n_null:
        raise ValueError(
            f"conformal_threshold: {n_null} rows have a NULL "
            f"{score_col!r} — filter explicitly first"
        )
    if n == 0:
        raise ValueError("conformal_threshold: empty calibration frame")
    k = _k_of(n, alpha)
    if k > n:
        raise ValueError(
            f"conformal_threshold: need ceil((n+1)(1-alpha)) = {k} <= n "
            f"= {n}; collect more calibration scores or raise alpha"
        )
    # k-th smallest via TakeOrdered (limit pushes into the sort: the
    # executors keep k rows each, the driver merges k — never a full
    # global sort materialization).  Ties are irrelevant: the order
    # STATISTIC is a value, not a row identity.
    row = (
        df.select(F.col(score_col).cast("double").alias("s"))
        .orderBy(F.asc("s"))
        .limit(k)
        .orderBy(F.desc("s"))
        .limit(1)
        .collect()
    )
    return {
        "qhat": float(row[0]["s"]),
        "n": n,
        "k": k,
        "alpha": float(alpha),
    }


def grouped_conformal_thresholds(
    df: DataFrame,
    score_col: str,
    group_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Mondrian (per-group) conformal thresholds: one row per group
    with (group_col, n, k, qhat), the group-conditional coverage
    variant (Vovk 2012 "Conditional validity").  Groups whose n is too
    small for ceil((n+1)(1-alpha)) <= n report a NULL qhat rather
    than a silently-weaker threshold — the caller decides whether to
    pool them.  One window rank per group; NULL scores/groups are
    rejected in-plan (single pass)."""
    num = _alpha_num(alpha)
    msg = (
        f"grouped_conformal_thresholds: NULL {score_col} / {group_col} "
        "row — filter explicitly first"
    )
    s_checked = F.when(
        F.col(score_col).isNull() | F.col(group_col).isNull(),
        F.raise_error(F.lit(msg)).cast("double"),
    ).otherwise(F.col(score_col).cast("double"))
    rows = df.select(F.col(group_col).alias("g"), s_checked.alias("s"))
    w = Window.partitionBy("g").orderBy(F.asc("s"))
    ranked = rows.select(
        "g", "s", F.row_number().over(w).alias("rk")
    )
    counted = ranked.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g")).cast("long")
    )
    # k = ceil((n+1)(ALPHA_DEN-num)/ALPHA_DEN) as integer-exact
    # ceil-division — the same arithmetic as _k_of, no doubles anywhere
    k_expr = F.expr(
        f"CAST(((n + 1) * {ALPHA_DEN - num} + {ALPHA_DEN} - 1)"
        f" DIV {ALPHA_DEN} AS BIGINT)"
    )
    out = (
        counted.withColumn("k", k_expr)
        .filter(F.col("rk") == F.least(F.col("k"), F.col("n")))
        .select(
            F.col("g").alias(group_col),
            F.col("n"),
            F.col("k"),
            F.when(F.col("k") <= F.col("n"), F.col("s")).alias("qhat"),
        )
    )
    return out


def conformal_coverage(
    df: DataFrame,
    score_col: str,
    qhat: float,
) -> dict:
    """Audit empirical coverage on a held-out frame: {n, n_covered,
    coverage} with coverage = the fraction of scores <= qhat — one
    integer aggregate, the number the 1 - alpha guarantee is checked
    against.  NULL scores counted and rejected in the same pass."""
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(score_col).isNull().cast("long")).cast("long").alias(
            "n_null"
        ),
        F.sum(
            (F.col(score_col).cast("double") <= F.lit(float(qhat)))
            .cast("long")
        ).cast("long").alias("n_cov"),
    ).collect()[0]
    n_null = int(agg["n_null"] or 0)
    if n_null:
        raise ValueError(
            f"conformal_coverage: {n_null} rows have a NULL "
            f"{score_col!r} — filter explicitly first"
        )
    n = int(agg["n"])
    if n == 0:
        raise ValueError("conformal_coverage: empty frame")
    n_cov = int(agg["n_cov"])
    return {"n": n, "n_covered": n_cov, "coverage": n_cov / n}
