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

import math

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


#: Weight quantization scale bits (the abtest.py idiom): weights are
#: quantized ONCE as floor(w * 2^WEIGHT_SCALE_BITS + 0.5) — a single
#: correctly-rounded IEEE multiply-add, identical on any engine — and
#: every cross-row statistic is a DECIMAL(38,0) sum of those integers.
WEIGHT_SCALE_BITS = 20


def _wq_expr(weight_col: str, scale_bits: int, op: str):
    """Quantized-weight expression with NULL / NaN / non-positive /
    magnitude rejection folded into the same projection (single-pass
    loud validation).  Likelihood-ratio weights are strictly positive
    (Tibshirani et al. 2019 §2: w = dP_target/dP_source > 0 on the
    support); a weight that quantizes to 0 would silently delete the
    row's calibration mass, so it raises instead."""
    ms = float(1 << scale_bits)
    bound = float(1 << (44 - scale_bits))
    msg = (
        f"{op}: NULL/NaN {weight_col}, non-positive weight, weight < "
        f"2^-{scale_bits + 1} (quantizes to zero mass), or weight >= "
        f"{bound!r} breaking DECIMAL(38,0) headroom at "
        f"scale_bits={scale_bits} — filter or rescale explicitly first"
    )
    w = F.col(weight_col).cast("double")
    q = F.floor(w * F.lit(ms) + F.lit(0.5)).cast("long")
    return F.when(
        w.isNull() | F.isnan(w) | (w <= F.lit(0.0))
        | (w >= F.lit(bound)) | (q <= F.lit(0)),
        F.raise_error(F.lit(msg)).cast("long"),
    ).otherwise(q)


def _s_checked(score_col: str, op: str):
    """Score cast with NULL/NaN rejection in-plan (NaN would sort into
    an engine-dependent position — reject rather than diverge)."""
    msg = f"{op}: NULL/NaN {score_col} row — filter explicitly first"
    s = F.col(score_col).cast("double")
    return F.when(
        s.isNull() | F.isnan(s), F.raise_error(F.lit(msg)).cast("double")
    ).otherwise(s)


def weighted_conformal_threshold(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    w_test: float = 1.0,
    alpha: float = 0.1,
    scale_bits: int = WEIGHT_SCALE_BITS,
) -> dict:
    """Weighted split-conformal quantile under covariate shift
    (Tibshirani, Barber, Candès & Ramdas, NeurIPS 2019, "Conformal
    Prediction Under Covariate Shift"): calibration scores carry
    likelihood-ratio weights w_i = dP_target/dP_source(x_i) and the
    test point carries ``w_test``; the threshold is

        qhat = inf{ s :  sum_{s_i <= s} w_i  >=  (1 - alpha) * (W + w_test) }

    i.e. the (1 - alpha)-quantile of the weighted score distribution
    with mass w_test placed at +infinity.  With all weights equal this
    reduces EXACTLY to :func:`conformal_threshold`'s order statistic
    (suite-pinned reduction law).  Raises when even the full
    calibration mass cannot reach the quantile (the +infinity case) —
    the same honest failure as the unweighted k > n.

    Exactness: weights quantize ONCE to 2^scale_bits integers (one
    correctly-rounded multiply-add — cross-engine identical), alpha to
    millionths, and the defining inequality is evaluated as the pure
    integer comparison

        cum_q * ALPHA_DEN  >=  (ALPHA_DEN - num) * (W_q + wtest_q)

    (the integer-threshold idiom: ``cw >= ceil(a/b)`` for integers is
    just ``cw * b >= a`` — no float ceil, no division) — so qhat is
    bit-deterministic under any partitioning and DuckDB-oracle-able.

    Scale shape: one validation+total aggregate over the calibration
    frame, then ties merge in a groupBy(score) and the cumulative pass
    runs over DISTINCT scores only — calibration sets are held-out
    samples orders of magnitude smaller than the corpus, and the
    single-partition cumulative window over their distinct scores is
    the documented bound (the grouped variant partitions by group).
    """
    num = _alpha_num(alpha)
    op = "weighted_conformal_threshold"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    wtest_q = int(math.floor(float(w_test) * ms + 0.5))
    if not (float(w_test) > 0.0 and wtest_q > 0):
        raise ValueError(
            f"{op}: w_test must be positive and not quantize to zero "
            f"mass at scale_bits={scale_bits}, got {w_test}"
        )
    rows = df.select(
        _s_checked(score_col, op).alias("s"),
        _wq_expr(weight_col, scale_bits, op).alias("wq"),
    )
    agg = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("wq").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("tw"),
    ).collect()[0]
    n = int(agg["n"])
    if n == 0:
        raise ValueError(f"{op}: empty calibration frame")
    total_wq = int(agg["tw"])
    # the +infinity case: (1-alpha)(W + w_test) > W  <=>  the target
    # mass is unreachable even by the largest score
    need = (ALPHA_DEN - num) * (total_wq + wtest_q)
    if total_wq * ALPHA_DEN < need:
        raise ValueError(
            f"{op}: (1 - alpha) * (W + w_test) exceeds the total "
            f"calibration mass W — qhat is +infinity; collect more "
            f"calibration data, raise alpha, or lower w_test"
        )
    merged = rows.groupBy("s").agg(
        F.sum(F.col("wq").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("gw")
    )
    w_cum = Window.orderBy(F.asc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hit = (
        merged.withColumn(
            "cw", F.sum("gw").over(w_cum).cast("decimal(38,0)")
        )
        .filter(
            F.col("cw") * F.lit(ALPHA_DEN)
            >= F.lit(need).cast("decimal(38,0)")
        )
        .orderBy(F.asc("s"))
        .limit(1)
        .collect()
    )
    return {
        "qhat": float(hit[0]["s"]),
        "n": n,
        "alpha": float(alpha),
        "w_total_q": total_wq,
        "w_test_q": wtest_q,
        "scale_bits": int(scale_bits),
    }


def grouped_weighted_conformal_thresholds(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    group_col: str,
    w_test: float = 1.0,
    alpha: float = 0.1,
    scale_bits: int = WEIGHT_SCALE_BITS,
) -> DataFrame:
    """Mondrian form of :func:`weighted_conformal_threshold`: one row
    per group with (group_col, n, w_total, qhat); a group whose total
    calibration mass cannot reach the quantile reports a NULL qhat
    (the +infinity case) rather than a silently-weaker threshold.
    Single pass: validation folds into the scan, ties merge per
    (group, score), and the cumulative + total sums are per-group
    windows — the sessionization-class bound."""
    num = _alpha_num(alpha)
    op = "grouped_weighted_conformal_thresholds"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    wtest_q = int(math.floor(float(w_test) * ms + 0.5))
    if not (float(w_test) > 0.0 and wtest_q > 0):
        raise ValueError(
            f"{op}: w_test must be positive and not quantize to zero "
            f"mass at scale_bits={scale_bits}, got {w_test}"
        )
    gmsg = f"{op}: NULL {group_col} row — filter explicitly first"
    g_checked = F.when(
        F.col(group_col).isNull(),
        F.raise_error(F.lit(gmsg)).cast(
            df.schema[group_col].dataType.simpleString()
        ),
    ).otherwise(F.col(group_col))
    rows = df.select(
        g_checked.alias("g"),
        _s_checked(score_col, op).alias("s"),
        _wq_expr(weight_col, scale_bits, op).alias("wq"),
    )
    merged = rows.groupBy("g", "s").agg(
        F.sum(F.col("wq").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("gw"),
        F.count(F.lit(1)).cast("long").alias("gn"),
    )
    w_cum = (
        Window.partitionBy("g")
        .orderBy(F.asc("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("g")
    ranked = (
        merged.withColumn(
            "cw", F.sum("gw").over(w_cum).cast("decimal(38,0)")
        )
        .withColumn("tw", F.sum("gw").over(w_all).cast("decimal(38,0)"))
        .withColumn("n", F.sum("gn").over(w_all).cast("long"))
    )
    # need = (DEN - num) * (tw + wtest_q), exact decimal arithmetic
    need = (
        (F.col("tw") + F.lit(wtest_q).cast("decimal(38,0)"))
        * F.lit(ALPHA_DEN - num)
    ).cast("decimal(38,0)")
    ok = F.col("cw") * F.lit(ALPHA_DEN) >= need
    w_first = Window.partitionBy("g").orderBy(
        F.desc(ok.cast("int")), F.asc("s")
    )
    return (
        ranked.withColumn("__ok", ok)
        .withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("n"),
            (F.col("tw").cast("double") / F.lit(ms)).alias("w_total"),
            F.when(F.col("__ok"), F.col("s")).alias("qhat"),
        )
    )


def weighted_conformal_coverage(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    qhat: float,
    scale_bits: int = WEIGHT_SCALE_BITS,
) -> dict:
    """Source-side weighted coverage audit: {n, w_total, w_covered,
    coverage} with coverage = the WEIGHTED fraction of scores <= qhat
    — the importance-weighted estimate of target-distribution coverage
    when the audit frame is source-distributed (on target-distributed
    holdout data use the unweighted :func:`conformal_coverage`).
    Exact decimal sums of the quantized weights, one pass."""
    op = "weighted_conformal_coverage"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    rows = df.select(
        _s_checked(score_col, op).alias("s"),
        _wq_expr(weight_col, scale_bits, op).alias("wq"),
    )
    agg = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("wq").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("tw"),
        F.sum(
            F.when(F.col("s") <= F.lit(float(qhat)), F.col("wq"))
            .otherwise(F.lit(0)).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("cw"),
    ).collect()[0]
    n = int(agg["n"])
    if n == 0:
        raise ValueError(f"{op}: empty frame")
    tw = int(agg["tw"])
    cw = int(agg["cw"])
    return {
        "n": n,
        "w_total": tw / ms,
        "w_covered": cw / ms,
        "coverage": cw / tw,
    }


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
