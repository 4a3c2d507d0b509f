"""A/B experiment readouts with CUPED variance reduction — the
controlled-experiment layer (Deng, Xu, Kohavi & Walker, WSDM 2013,
"Improving the Sensitivity of Online Controlled Experiments by
Utilizing Pre-Experiment Data"): the adjusted metric

    Y_cuped = Y - theta * (X - E[X]),   theta = cov(Y, X) / var(X)

keeps the treatment-effect estimate unbiased (X is pre-experiment, so
E[X | arm] is equal across arms under randomization) while removing
the covariate-explained variance — the industry-standard way to make
the same traffic detect smaller effects.

Float discipline (the repo rule): metric and covariate are quantized
ONCE per row as floor(v * 2^scale_bits + 0.5) — a single IEEE
multiply-add whose result is identical on any engine, the gram/pca
idiom — and every cross-row statistic is a DECIMAL(38,0) sum of those
integers, so moments, theta, and the final z readout are
bit-deterministic under any partitioning AND DuckDB-oracle-able.
theta and the means assemble on the driver from exact collected
integers in one fixed expression order.  The adjusted metric is
re-quantized per row (y_q - floor(theta * x_q + 0.5)); the constant
theta*E[X] shift cancels in every between-arm difference, so it is
dropped rather than smeared across rows.

Scale shape: two corpus passes, both single map-side-combinable keyed
aggregates (pass 1: per-arm moments for theta; pass 2: per-arm
adjusted moments) — O(arms) state, no joins, no windows; the
assembly is O(arms) driver work.  Magnitude bound enforced IN-PLAN:
|v| < 2^(44 - scale_bits) keeps every v_q^2 summand inside
DECIMAL(38,0) headroom for n up to ~1e11 rows per arm.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE_BITS = 20


def _dprod(a: str, b: str) -> F.Column:
    """Exact integer product of two quantized int64 columns, multiplied
    IN DECIMAL: the operands can each reach 2^44 under the documented
    |v| < 2^(44 - scale_bits) bound, so a plain long * long wraps (ANSI
    ARITHMETIC_OVERFLOW at 2^43 * 2^43) before the decimal cast ever
    sees it — the same int64-wrap class the r9 review caught in the
    gram builder.  decimal(19,0) * decimal(19,0) is exact at scale 0
    through the full headroom (2^88 < 10^38)."""
    return (
        F.col(a).cast("decimal(19,0)") * F.col(b).cast("decimal(19,0)")
    ).cast("decimal(38,0)")


def _q_expr(col: str, scale_bits: int, op: str) -> F.Column:
    """floor(v * 2^s + 0.5) as BIGINT with the magnitude bound and
    NULL rejection folded into the same expression (single-pass loud
    validation — no pre-scan)."""
    ms = float(1 << scale_bits)
    bound = float(1 << (44 - scale_bits))
    msg = (
        f"{op}: NULL {col}, or |{col}| >= {bound!r} breaking the "
        f"DECIMAL(38,0) headroom at scale_bits={scale_bits} — filter or "
        "rescale explicitly first"
    )
    v = F.col(col).cast("double")
    return (
        F.when(
            v.isNull() | F.isnan(v) | (F.abs(v) >= F.lit(bound)),
            F.raise_error(F.lit(msg)).cast("long"),
        )
        .otherwise(F.floor(v * F.lit(ms) + F.lit(0.5)).cast("long"))
    )


def _arm_checked(arm_col: str, op: str) -> F.Column:
    msg = f"{op}: NULL {arm_col} row — filter explicitly first"
    return F.when(
        F.col(arm_col).isNull(), F.raise_error(F.lit(msg)).cast("string")
    ).otherwise(F.col(arm_col).cast("string"))


def _arm_moments(
    df: DataFrame, metric_col: str, arm_col: str, scale_bits: int, op: str
) -> DataFrame:
    """(arm, n, sy, syy) — associative integer sums only, so the SAME
    aggregation runs identically as a batch groupBy or as update-mode
    streaming aggregation state (the streaming-correlation argument:
    micro-batch boundaries provably cannot move an integer sum)."""
    yq = _q_expr(metric_col, scale_bits, op)
    return (
        df.select(_arm_checked(arm_col, op).alias("arm"), yq.alias("y"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("y").cast("decimal(38,0)"))
            .cast("decimal(38,0)").alias("sy"),
            F.sum(_dprod("y", "y"))
            .cast("decimal(38,0)").alias("syy"),
        )
    )


def _arm_assemble(mo: DataFrame, scale_bits: int) -> DataFrame:
    ms = float(1 << scale_bits)
    dn = F.col("n").cast("decimal(19,0)")
    var_num = dn * F.col("syy") - F.col("sy") * F.col("sy")
    return mo.select(
        "arm",
        "n",
        (F.col("sy").cast("double")
         / (F.col("n").cast("double") * F.lit(ms))).alias("mean"),
        F.when(
            F.col("n") > 1,
            var_num.cast("double")
            / (
                F.col("n").cast("double")
                * (F.col("n") - 1).cast("double")
                * F.lit(ms * ms)
            ),
        ).alias("var"),
    )


def ab_arm_stats(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> DataFrame:
    """Per-arm exact-moment readout: (arm, n, mean, var) with mean and
    SAMPLE variance assembled from integer moments in one fixed
    expression — the repo's corr() shape, DuckDB-oracle-able
    (suite-proven).  One map-side-combinable aggregate."""
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    mo = _arm_moments(df, metric_col, arm_col, scale_bits, "ab_arm_stats")
    return _arm_assemble(mo, scale_bits)


def streaming_ab_arm_stats(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> DataFrame:
    """Streaming twin of :func:`ab_arm_stats`: the three integer
    moments accumulate as update-mode streaming aggregation state —
    the live experiment dashboard an unbounded event stream can
    maintain forever in O(arms) state — and the readout assembles in
    batch over the drained moment table, BIT-matching the batch
    operator on the same rows (suite-pinned)."""
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    from ..streaming.pipeline import drain_to_df

    mo = drain_to_df(
        _arm_moments(
            stream_df, metric_col, arm_col, scale_bits, "streaming_ab_arm_stats"
        ),
        "update",
        key_cols=("arm",),
    )
    return _arm_assemble(mo, scale_bits)


def _collect_moments(
    df: DataFrame,
    y_expr: F.Column,
    x_expr: F.Column | None,
    arm_expr: F.Column,
) -> list:
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sy"),
        F.sum(_dprod("y", "y"))
        .cast("decimal(38,0)").alias("syy"),
    ]
    cols = [arm_expr.alias("arm"), y_expr.alias("y")]
    if x_expr is not None:
        cols.append(x_expr.alias("x"))
        aggs += [
            F.sum(F.col("x").cast("decimal(38,0)"))
            .cast("decimal(38,0)").alias("sx"),
            F.sum(_dprod("x", "x"))
            .cast("decimal(38,0)").alias("sxx"),
            F.sum(_dprod("x", "y"))
            .cast("decimal(38,0)").alias("sxy"),
        ]
    return df.select(*cols).groupBy("arm").agg(*aggs).collect()


def _two_arms(rows: list, op: str) -> tuple:
    arms = sorted(r["arm"] for r in rows)
    if len(arms) != 2:
        raise ValueError(
            f"{op}: need exactly 2 arms, got {arms!r} — filter or split "
            "multi-arm experiments into pairwise readouts"
        )
    by = {r["arm"]: r for r in rows}
    return arms, by


def _mean_var(n: int, s: int, ss: int, ms: float) -> tuple[float, float]:
    """Fixed-order float assembly of (mean, sample variance) from the
    exact integer moments — the one place floats are manufactured."""
    mean = float(s) / (float(n) * ms)
    if n < 2:
        return mean, float("nan")
    var = float(n * ss - s * s) / (float(n) * float(n - 1) * ms * ms)
    return mean, var


def cuped_ab_test_multi(
    df: DataFrame,
    metric_col: str,
    covariate_cols: list[str],
    arm_col: str,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """Multi-covariate CUPED (regression adjustment): the adjusted
    metric is Y - theta^T X with theta the pooled OLS coefficient
    vector

        theta = Var(X)^{-1} Cov(X, Y)

    — Deng et al. 2013 §3.2's extension to several pre-experiment
    covariates (equivalently ANCOVA / the regression-adjusted
    estimator of Lin 2013, Ann. Appl. Stat.).  Reduces EXACTLY to
    :func:`cuped_ab_test` at d = 1 (suite-pinned).

    Exactness: the d x d centered Gram A = N*Sxx - Sx Sx^T and the
    vector b = N*Sxy - Sx*Sy assemble on the driver as PYTHON BIGINTS
    from exact decimal moment sums (the pca.py gram discipline), so
    they are bit-identical under any partitioning; theta = solve(A, b)
    is one deterministic d x d LAPACK call on those exact inputs, and
    pass 2 re-quantizes the adjusted metric per row with theta shipped
    as task literals — the whole readout is therefore bit-reproducible
    for a fixed driver environment and pinned against a Python replica
    exactly (suite).

    Scale shape: the same two corpus passes as the single-covariate
    form — pass 1 collects O(arms * d^2) integer moments in ONE
    map-side-combinable aggregate; pass 2 is one more keyed aggregate
    over the adjusted rows.  No joins, no windows, no extra shuffle;
    d is capped at 16 (the Gram has d(d+1)/2 = 136 sums — still one
    aggregate's worth of state).
    """
    import numpy as np

    op = "cuped_ab_test_multi"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    d = len(covariate_cols)
    if not (1 <= d <= 16):
        raise ValueError(f"{op}: need 1..16 covariates, got {d}")
    if len(set(covariate_cols)) != d or metric_col in covariate_cols:
        raise ValueError(
            f"{op}: covariate_cols must be distinct and exclude the "
            f"metric, got {covariate_cols!r}"
        )
    ms = float(1 << scale_bits)

    cols = [
        _arm_checked(arm_col, op).alias("arm"),
        _q_expr(metric_col, scale_bits, op).alias("y"),
    ] + [
        _q_expr(c, scale_bits, op).alias(f"x{j}")
        for j, c in enumerate(covariate_cols)
    ]
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("sy"),
        F.sum(_dprod("y", "y")).cast("decimal(38,0)").alias("syy"),
    ]
    for j in range(d):
        aggs.append(
            F.sum(F.col(f"x{j}").cast("decimal(38,0)"))
            .cast("decimal(38,0)").alias(f"sx{j}")
        )
        aggs.append(
            F.sum(_dprod(f"x{j}", "y")).cast("decimal(38,0)").alias(f"sx{j}y")
        )
        for k in range(j, d):
            aggs.append(
                F.sum(_dprod(f"x{j}", f"x{k}"))
                .cast("decimal(38,0)").alias(f"sx{j}x{k}")
            )
    rows = df.select(*cols).groupBy("arm").agg(*aggs).collect()
    arms, by = _two_arms(rows, op)

    # pooled exact-bigint centered Gram and cross-moment vector
    N = sum(int(by[a]["n"]) for a in arms)
    Sy = sum(int(by[a]["sy"]) for a in arms)
    Sx = [sum(int(by[a][f"sx{j}"]) for a in arms) for j in range(d)]
    Sxy = [sum(int(by[a][f"sx{j}y"]) for a in arms) for j in range(d)]
    A_int = [[0] * d for _ in range(d)]
    for j in range(d):
        for k in range(j, d):
            s = sum(int(by[a][f"sx{j}x{k}"]) for a in arms)
            A_int[j][k] = A_int[k][j] = N * s - Sx[j] * Sx[k]
    b_int = [N * Sxy[j] - Sx[j] * Sy for j in range(d)]
    A = np.array(A_int, dtype=np.float64)
    b = np.array(b_int, dtype=np.float64)
    diag = np.diag(A)
    if (diag <= 0).any():
        zero = [covariate_cols[j] for j in range(d) if diag[j] <= 0]
        raise ValueError(
            f"{op}: covariate(s) {zero!r} have zero variance — CUPED "
            "cannot adjust on a constant"
        )
    try:
        theta = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        raise ValueError(
            f"{op}: the covariate Gram is singular — covariates are "
            "collinear; drop the redundant one(s)"
        ) from None
    # reject numerically-meaningless solves the same way (collinear up
    # to rounding): the solve must actually reproduce b
    resid = A @ theta - b
    bscale = float(np.max(np.abs(b))) or 1.0
    ascale = float(np.max(np.abs(A))) or 1.0
    if float(np.max(np.abs(resid))) > 1e-6 * max(
        bscale, ascale * float(np.max(np.abs(theta)))
    ):
        raise ValueError(
            f"{op}: the covariate Gram is numerically singular — "
            "covariates are (near-)collinear; drop the redundant one(s)"
        )
    if float(np.sum(np.abs(theta))) >= float(1 << 18):
        raise ValueError(
            f"{op}: sum |theta_j| = {float(np.sum(np.abs(theta))):.3g} "
            ">= 2^18 — a covariate is on a wildly different scale than "
            "the metric; rescale it"
        )

    raw = {}
    for a in arms:
        r = by[a]
        mean, var = _mean_var(int(r["n"]), int(r["sy"]), int(r["syy"]), ms)
        raw[a] = {"n": int(r["n"]), "mean": mean, "var": var}

    # pass 2: adj = y_q - floor(sum_j theta_j * x_jq + 0.5), the dot
    # product evaluated in f64 in FIXED j order (task literals)
    yq = _q_expr(metric_col, scale_bits, op)
    dot = F.lit(0.0)
    for j, c in enumerate(covariate_cols):
        dot = dot + F.lit(float(theta[j])) * _q_expr(
            c, scale_bits, op
        ).cast("double")
    adj = yq - F.floor(dot + F.lit(0.5)).cast("long")
    arows = (
        df.select(_arm_checked(arm_col, op).alias("arm"), adj.alias("y"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("y").cast("decimal(38,0)"))
            .cast("decimal(38,0)").alias("sy"),
            F.sum(_dprod("y", "y")).cast("decimal(38,0)").alias("syy"),
        )
        .collect()
    )
    _, aby = _two_arms(arows, op)
    cuped = {}
    for a in arms:
        r = aby[a]
        mean, var = _mean_var(int(r["n"]), int(r["sy"]), int(r["syy"]), ms)
        cuped[a] = {"n": int(r["n"]), "mean": mean, "var": var}

    def _readout(stats: dict) -> dict:
        a, b_ = arms
        diff = stats[b_]["mean"] - stats[a]["mean"]
        se = math.sqrt(
            stats[a]["var"] / stats[a]["n"] + stats[b_]["var"] / stats[b_]["n"]
        )
        out = dict(stats)
        out["diff"] = diff
        out["se"] = se
        out["z"] = diff / se if se > 0 else float("nan")
        return out

    pooled_raw = sum(raw[a]["var"] * (raw[a]["n"] - 1) for a in arms)
    pooled_cuped = sum(cuped[a]["var"] * (cuped[a]["n"] - 1) for a in arms)
    return {
        "arms": arms,
        "theta": [float(t) for t in theta],
        "raw": _readout(raw),
        "cuped": _readout(cuped),
        "var_reduction": (
            1.0 - pooled_cuped / pooled_raw if pooled_raw > 0 else float("nan")
        ),
        "scale_bits": int(scale_bits),
    }


def cuped_ab_test(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    arm_col: str,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """The full CUPED readout.  Returns::

        {arms: [a, b], theta,
         raw:   {a: {n, mean, var}, b: {...}, diff, se, z},
         cuped: {a: {n, mean, var}, b: {...}, diff, se, z},
         var_reduction}

    ``diff`` = arm_b - arm_a in the arms' sorted order; ``z`` is the
    two-sample unpooled (Welch) z statistic; ``var_reduction`` = 1 -
    pooled CUPED variance / pooled raw variance — the number CUPED
    exists to maximize (≈ corr(X, Y)^2 by the paper's identity).
    theta is pooled across arms (the standard single-theta variant:
    under randomization a common theta keeps the difference unbiased).

    Two passes: the moment pass fixes theta from exact integer sums;
    the adjusted pass re-aggregates y_q - floor(theta * x_q + 0.5).
    The theta * E[X] centering constant shifts both arms equally and
    is dropped — between-arm differences and variances are shift-
    invariant, and omitting it keeps the adjusted row integer-exact.
    """
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    op = "cuped_ab_test"
    rows = _collect_moments(
        df,
        _q_expr(metric_col, scale_bits, op),
        _q_expr(covariate_col, scale_bits, op),
        _arm_checked(arm_col, op),
    )
    arms, by = _two_arms(rows, op)
    # pooled theta from exact global integer moments (Python bigints)
    N = sum(int(by[a]["n"]) for a in arms)
    Sx = sum(int(by[a]["sx"]) for a in arms)
    Sy = sum(int(by[a]["sy"]) for a in arms)
    Sxx = sum(int(by[a]["sxx"]) for a in arms)
    Sxy = sum(int(by[a]["sxy"]) for a in arms)
    var_x_num = N * Sxx - Sx * Sx
    if var_x_num == 0:
        raise ValueError(
            f"{op}: covariate {covariate_col!r} has zero variance — "
            "CUPED cannot adjust on a constant"
        )
    theta = float(N * Sxy - Sx * Sy) / float(var_x_num)
    # keep theta * x_q (and the adjusted square's decimal summand)
    # inside int64 by construction, like every other integer path here
    if abs(theta) >= float(1 << 18):
        raise ValueError(
            f"{op}: |theta| = {abs(theta):.3g} >= 2^18 — the covariate "
            "is on a wildly different scale than the metric; rescale it "
            "(CUPED is scale-invariant in the adjustment it produces)"
        )

    raw = {}
    for a in arms:
        r = by[a]
        mean, var = _mean_var(int(r["n"]), int(r["sy"]), int(r["syy"]), ms)
        raw[a] = {"n": int(r["n"]), "mean": mean, "var": var}

    # pass 2: adjusted metric, re-quantized per row (floor of ONE
    # multiply-add of a task literal — cross-engine-identical)
    yq = _q_expr(metric_col, scale_bits, op)
    xq = _q_expr(covariate_col, scale_bits, op)
    adj = (
        yq - F.floor(F.lit(theta) * xq.cast("double") + F.lit(0.5)).cast("long")
    )
    arows = (
        df.select(_arm_checked(arm_col, op).alias("arm"), adj.alias("y"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("y").cast("decimal(38,0)"))
            .cast("decimal(38,0)").alias("sy"),
            F.sum(_dprod("y", "y"))
            .cast("decimal(38,0)").alias("syy"),
        )
        .collect()
    )
    _, aby = _two_arms(arows, op)
    cuped = {}
    for a in arms:
        r = aby[a]
        mean, var = _mean_var(int(r["n"]), int(r["sy"]), int(r["syy"]), ms)
        cuped[a] = {"n": int(r["n"]), "mean": mean, "var": var}

    def _readout(stats: dict) -> dict:
        a, b = arms
        diff = stats[b]["mean"] - stats[a]["mean"]
        se = math.sqrt(
            stats[a]["var"] / stats[a]["n"] + stats[b]["var"] / stats[b]["n"]
        )
        out = dict(stats)
        out["diff"] = diff
        out["se"] = se
        out["z"] = diff / se if se > 0 else float("nan")
        return out

    raw_out = _readout(raw)
    cuped_out = _readout(cuped)
    pooled_raw = sum(raw[a]["var"] * (raw[a]["n"] - 1) for a in arms)
    pooled_cuped = sum(cuped[a]["var"] * (cuped[a]["n"] - 1) for a in arms)
    return {
        "arms": arms,
        "theta": theta,
        "raw": raw_out,
        "cuped": cuped_out,
        "var_reduction": (
            1.0 - pooled_cuped / pooled_raw if pooled_raw > 0 else float("nan")
        ),
        "scale_bits": int(scale_bits),
    }


# ------------------------------------------------ always-valid inference


def _lambda_p(diff: float, v: float, tau2: float) -> tuple[float, float]:
    """Mixture-SPRT likelihood ratio and its p contribution for one
    look: Lambda = sqrt(V/(V+tau^2)) * exp(tau^2*diff^2 / (2V(V+tau^2)))
    (Johari, Koomen, Pekelis & Walsh, "Peeking at A/B Tests", KDD'17,
    eq. for the normal mixture).  One fixed-order f64 expression."""
    lam = math.sqrt(v / (v + tau2)) * math.exp(
        tau2 * diff * diff / (2.0 * v * (v + tau2))
    )
    return lam, min(1.0, 1.0 / lam)


def msprt_ab_test(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    tau: float = 1.0,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """One-look mixture-SPRT readout: {arms, diff, se, lambda,
    p_always, tau} from the same exact integer moments as
    :func:`ab_arm_stats`.  ``p_always`` = min(1, 1/Lambda) is an
    always-valid p-value: the experimenter may compute it at ANY
    number of interim looks and the type-I error stays controlled —
    the published fix for the peeking problem a live dashboard
    (:func:`streaming_ab_arm_stats`) otherwise invites.  ``tau`` is
    the mixture scale — set it to the anticipated effect size (the
    test is valid for any tau > 0; tau only tunes power)."""
    if tau <= 0:
        raise ValueError(f"msprt_ab_test: tau must be > 0, got {tau}")
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    rows = _collect_moments(
        df,
        _q_expr(metric_col, scale_bits, "msprt_ab_test"),
        None,
        _arm_checked(arm_col, "msprt_ab_test"),
    )
    arms, by = _two_arms(rows, "msprt_ab_test")
    stats = {}
    for a in arms:
        r = by[a]
        mean, var = _mean_var(int(r["n"]), int(r["sy"]), int(r["syy"]), ms)
        stats[a] = {"n": int(r["n"]), "mean": mean, "var": var}
    a, b = arms
    if stats[a]["n"] < 2 or stats[b]["n"] < 2:
        raise ValueError(
            "msprt_ab_test: both arms need n >= 2 for a variance estimate"
        )
    diff = stats[b]["mean"] - stats[a]["mean"]
    v = stats[a]["var"] / stats[a]["n"] + stats[b]["var"] / stats[b]["n"]
    if v <= 0:
        raise ValueError(
            "msprt_ab_test: zero estimator variance — constant metric"
        )
    lam, p = _lambda_p(diff, v, tau * tau)
    return {
        "arms": arms,
        "diff": diff,
        "se": math.sqrt(v),
        "lambda": lam,
        "p_always": p,
        "tau": float(tau),
        "n": {a: stats[a]["n"], b: stats[b]["n"]},
    }


def _trajectory_rows(
    looks: list[tuple], ms: float, tau2: float
) -> list[tuple]:
    """Fixed-order driver-side assembly of the mSPRT trajectory from
    exact CUMULATIVE integer moments — the ``_mean_var`` convention:
    variance numerators are Python-int products (arbitrary precision,
    no in-plan decimal multiply), floats are manufactured once per
    look in one pinned expression order, so the output bit-matches
    the historical in-plan assembly wherever that assembly's decimal
    headroom held (suite-pinned) and keeps working far beyond it.

    ``looks`` is ordered by look key; each entry is
    (key, n_a, sy_a, syy_a, n_b, sy_b, syy_b) with Python ints.
    Returns (key, n_a, n_b, diff, se, lam, p_always) tuples; looks
    where either arm has n < 2 carry None diff/se/lam, constant-metric
    looks (v == 0) carry diff but None se/lam, and p_always carries
    the running min (1.0 until the first scored look)."""
    out = []
    p_run = 1.0
    for key, na, sya, syya, nb, syb, syyb in looks:
        diff = se = lam = None
        if na >= 2 and nb >= 2:
            mean_a = float(sya) / (float(na) * ms)
            mean_b = float(syb) / (float(nb) * ms)
            va = float(na * syya - sya * sya) / (
                float(na) * float(na - 1) * (ms * ms)
            )
            vb = float(nb * syyb - syb * syb) / (
                float(nb) * float(nb - 1) * (ms * ms)
            )
            diff = mean_b - mean_a
            v = va / float(na) + vb / float(nb)
            if v > 0:
                se = math.sqrt(v)
                lam = math.sqrt(v / (v + tau2)) * math.exp(
                    tau2 * diff * diff / (2.0 * v * (v + tau2))
                )
                p_run = min(p_run, min(1.0, 1.0 / lam))
        out.append((key, na, nb, diff, se, lam, p_run))
    return out


def _trajectory_schema(key_name: str, key_type) -> "object":
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField(key_name, key_type),
            StructField("n_a", LongType(), False),
            StructField("n_b", LongType(), False),
            StructField("diff", DoubleType()),
            StructField("se", DoubleType()),
            StructField("lam", DoubleType()),
            StructField("p_always", DoubleType(), False),
        ]
    )


def always_valid_pvalues(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    time_col: str,
    tau: float = 1.0,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> DataFrame:
    """The full peeking trajectory: one row per time bucket (the
    ``time_col`` value — pre-bucket upstream) with the CUMULATIVE
    readout at that look and the running always-valid p:

        (bucket, n_a, n_b, diff, se, lam, p_always)

    p_always is non-increasing by construction (the running min of the
    per-look 1/Lambda, capped at 1 — the mSPRT always-valid p-value
    process), so "stop when p_always < alpha" is a valid sequential
    rule at any cadence.  Looks where either arm still has n < 2 (no
    variance estimate yet) carry NULL diff/se/lam and p_always = 1.

    Exactness: ONE keyed integer aggregate over the corpus produces
    the per-(arm, bucket) moment deltas; the cumulative roll-up and
    the per-look float assembly happen DRIVER-SIDE on Python ints
    (``_trajectory_rows`` — the ``_mean_var`` convention), so the
    table is bit-identical under any partitioning (suite-pinned), the
    integer-derived columns are DuckDB-oracle-able exactly, and the
    ln/exp-bearing columns pin against a Python replica at tolerance
    (the repo's lm.py convention for libm-crossing floats).

    Headroom: the module-level contract only — |v| < 2^(44 - s) per
    row and per-(arm, bucket) moment sums inside DECIMAL(38,0)
    (~1e11 rows per bucket per arm at the maximal quantized square).
    The variance numerator n*syy - sy*sy is an arbitrary-precision
    Python-int product, so cumulative n is UNBOUNDED — this replaced
    the r12 in-plan decimal product whose n^2 * B^2 * 2^(2s) < 10^38
    cap aborted (loudly, under ANSI) near ~5.7e5 rows/arm at s=20,
    B=2^24 while sibling operators (msprt_ab_test's ``_mean_var``
    path) survived.

    Scale shape: one map-side-combinable keyed aggregate over the
    corpus, then O(buckets x arms) driver rows (time ticks —
    thousands, not corpus rows; the same documented driver-size class
    as the conformal cumulative pass, replacing r12's single-partition
    bucket window)."""
    if tau <= 0:
        raise ValueError(f"always_valid_pvalues: tau must be > 0, got {tau}")
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    op = "always_valid_pvalues"
    ms = float(1 << scale_bits)
    tau2 = float(tau) * float(tau)
    tmsg = f"{op}: NULL {time_col} row — filter explicitly first"
    t_checked = F.when(
        F.col(time_col).isNull(),
        F.raise_error(F.lit(tmsg)).cast(
            df.schema[time_col].dataType.simpleString()
        ),
    ).otherwise(F.col(time_col))
    per = (
        df.select(
            _arm_checked(arm_col, op).alias("arm"),
            t_checked.alias("bucket"),
            _q_expr(metric_col, scale_bits, op).alias("y"),
        )
        .groupBy("arm", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("y").cast("decimal(38,0)"))
            .cast("decimal(38,0)").alias("sy"),
            F.sum(_dprod("y", "y")).cast("decimal(38,0)").alias("syy"),
        )
    )
    # ONE job: arms are derived from the same collected delta table
    # (r12 ran a separate distinct() pass over the corpus aggregate).
    rows = per.collect()
    arms = sorted({r["arm"] for r in rows})
    if len(arms) != 2:
        raise ValueError(
            f"{op}: need exactly 2 arms, got {arms!r} — filter or split "
            "multi-arm experiments into pairwise readouts"
        )
    a, b = arms
    delta: dict = {}
    for r in rows:
        delta.setdefault(r["bucket"], {})[r["arm"]] = (
            int(r["n"]), int(r["sy"]), int(r["syy"])
        )
    na = sya = syya = nb = syb = syyb = 0
    looks = []
    for bk in sorted(delta):
        da = delta[bk].get(a)
        db = delta[bk].get(b)
        if da is not None:
            na += da[0]
            sya += da[1]
            syya += da[2]
        if db is not None:
            nb += db[0]
            syb += db[1]
            syyb += db[2]
        looks.append((bk, na, sya, syya, nb, syb, syyb))
    return df.sparkSession.createDataFrame(
        _trajectory_rows(looks, ms, tau2),
        _trajectory_schema("bucket", df.schema[time_col].dataType),
    )


def minimum_detectable_effect(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    alpha: float = 0.05,
    power: float = 0.8,
    target_mde: float | None = None,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """Power readout for the running experiment: from the same exact
    integer moments as :func:`ab_arm_stats`,

        MDE = (z_{1-alpha/2} + z_{power}) * se_diff

    — the smallest true difference the CURRENT sample detects with the
    requested power at the two-sided alpha (standard normal-theory
    sizing; z quantiles from the stdlib ``statistics.NormalDist``, no
    third-party dependency).  When ``target_mde`` is given, also
    returns ``n_per_arm_needed`` = the per-arm sample size at which
    the pooled-variance MDE shrinks to the target:
    n = (z_a + z_b)^2 * (var_a + var_b) / mde^2 (balanced arms).
    Returns {arms, n, mde, se, z_alpha, z_power[, n_per_arm_needed]}.
    One map-side-combinable aggregate; O(arms) driver work."""
    from statistics import NormalDist

    op = "minimum_detectable_effect"
    if not (0 < alpha < 1):
        raise ValueError(f"{op}: alpha must be in (0, 1), got {alpha}")
    if not (0 < power < 1):
        raise ValueError(f"{op}: power must be in (0, 1), got {power}")
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    rows = _collect_moments(
        df, _q_expr(metric_col, scale_bits, op), None, _arm_checked(arm_col, op)
    )
    arms, by = _two_arms(rows, op)
    stats = {}
    for a in arms:
        r = by[a]
        mean, var = _mean_var(int(r["n"]), int(r["sy"]), int(r["syy"]), ms)
        if int(r["n"]) < 2:
            raise ValueError(f"{op}: arm {a!r} needs n >= 2")
        stats[a] = {"n": int(r["n"]), "var": var}
    a, b = arms
    se = math.sqrt(stats[a]["var"] / stats[a]["n"]
                   + stats[b]["var"] / stats[b]["n"])
    nd = NormalDist()
    z_a = nd.inv_cdf(1.0 - alpha / 2.0)
    z_b = nd.inv_cdf(power)
    out = {
        "arms": arms,
        "n": {a: stats[a]["n"], b: stats[b]["n"]},
        "se": se,
        "mde": (z_a + z_b) * se,
        "z_alpha": z_a,
        "z_power": z_b,
        "alpha": float(alpha),
        "power": float(power),
    }
    if target_mde is not None:
        if target_mde <= 0:
            raise ValueError(f"{op}: target_mde must be > 0, got {target_mde}")
        out["n_per_arm_needed"] = int(math.ceil(
            (z_a + z_b) ** 2 * (stats[a]["var"] + stats[b]["var"])
            / (float(target_mde) ** 2)
        ))
    return out


def ratio_metric_ab_test(
    df: DataFrame,
    numerator_col: str,
    denominator_col: str,
    unit_col: str,
    arm_col: str,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """Ratio-metric readout with DELTA-METHOD standard errors under
    unit-level (cluster) randomization — Deng, Knoblich & Lu,
    "Applying the Delta Method in Metric Analytics" (KDD'18): the arm
    metric is sum(numerator) / sum(denominator) (e.g. clicks per
    pageview, revenue per session), randomization is by ``unit_col``
    (user), and event rows within a unit are arbitrarily correlated —
    the naive row-level variance is wrong; the correct one treats the
    per-unit pair (Y_u, N_u) as the iid observation:

        var(R) ≈ (var(Y) - 2 R cov(Y, N) + R^2 var(N)) / (n * mean(N)^2)

    Exactness: numerator and denominator quantize ONCE per row; the
    per-unit sums and the per-arm second moments of those sums are
    exact decimal integer arithmetic (mixed products via the decimal
    multiply), so R and its variance assemble on the driver from
    exact bigints in one fixed expression order — bit-deterministic
    under any partitioning (suite-pinned) and replica-exact.

    Returns {arms, per_arm: {arm: {n_units, num, den, ratio, var_ratio}},
    diff, se, z}.  Scale shape: ONE shuffle to (arm, unit) sums, then
    one map-side-combinable moment aggregate — the sessionization
    class; skew bounded by the busiest unit."""
    op = "ratio_metric_ab_test"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    umsg = f"{op}: NULL {unit_col} row — filter explicitly first"
    u_checked = F.when(
        F.col(unit_col).isNull(),
        F.raise_error(F.lit(umsg)).cast(
            df.schema[unit_col].dataType.simpleString()
        ),
    ).otherwise(F.col(unit_col))
    per_unit = (
        df.select(
            _arm_checked(arm_col, op).alias("arm"),
            u_checked.alias("unit"),
            _q_expr(numerator_col, scale_bits, op).alias("yq"),
            _q_expr(denominator_col, scale_bits, op).alias("nq"),
        )
        .groupBy("arm", "unit")
        .agg(
            F.sum(F.col("yq").cast("decimal(38,0)"))
            .cast("decimal(19,0)").alias("y"),
            F.sum(F.col("nq").cast("decimal(38,0)"))
            .cast("decimal(19,0)").alias("n"),
        )
    )
    # a unit assigned to two arms is a randomization bug — reject loudly
    dup = (
        per_unit.groupBy("unit").agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > 1).count()
    )
    if dup:
        raise ValueError(
            f"{op}: {dup} unit(s) appear in more than one arm — the "
            "randomization log is inconsistent"
        )
    d38 = "decimal(38,0)"
    mo = (
        per_unit.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
            F.sum(F.col("n").cast(d38)).cast(d38).alias("sn"),
            F.sum((F.col("y") * F.col("y")).cast(d38)).cast(d38).alias("syy"),
            F.sum((F.col("n") * F.col("n")).cast(d38)).cast(d38).alias("snn"),
            F.sum((F.col("y") * F.col("n")).cast(d38)).cast(d38).alias("syn"),
        )
        .collect()
    )
    arms, by = _two_arms(mo, op)
    per_arm = {}
    for a in arms:
        r = by[a]
        m = int(r["m"])
        sy, sn = int(r["sy"]), int(r["sn"])
        syy, snn, syn = int(r["syy"]), int(r["snn"]), int(r["syn"])
        if m < 2:
            raise ValueError(f"{op}: arm {a!r} needs >= 2 units")
        if sn <= 0:
            raise ValueError(
                f"{op}: arm {a!r} has non-positive denominator total"
            )
        # EXACT rational assembly (Fraction over the collected bigints)
        # with ONE float conversion per reported number: the delta-
        # method variance is homogeneous of degree zero in a per-unit
        # scaling (Y_u, N_u) -> (k Y_u, k N_u), and keeping the whole
        # expression rational makes that invariance hold EXACTLY in
        # the output, not just to an ulp (suite-pinned).
        from fractions import Fraction

        R = Fraction(sy, sn)
        mm1 = m * (m - 1)
        f_var_y = Fraction(m * syy - sy * sy, mm1)
        f_var_n = Fraction(m * snn - sn * sn, mm1)
        f_cov = Fraction(m * syn - sy * sn, mm1)
        f_mean_n = Fraction(sn, m)
        f_var_ratio = (
            (f_var_y - 2 * R * f_cov + R * R * f_var_n)
            / (m * f_mean_n * f_mean_n)
        )
        per_arm[a] = {
            "n_units": m,
            "num": float(sy) / ms,
            "den": float(sn) / ms,
            "ratio": float(R),
            "var_ratio": float(f_var_ratio),
        }
    a, b = arms
    diff = per_arm[b]["ratio"] - per_arm[a]["ratio"]
    se = math.sqrt(per_arm[a]["var_ratio"] + per_arm[b]["var_ratio"])
    return {
        "arms": arms,
        "per_arm": per_arm,
        "diff": diff,
        "se": se,
        "z": diff / se if se > 0 else float("nan"),
        "scale_bits": int(scale_bits),
    }


def mann_whitney_u(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Mann–Whitney U / Wilcoxon rank-sum test (Mann & Whitney 1947)
    — the nonparametric two-sample readout for skewed or ordinal
    metrics where the Welch z on means is wrong.  Returns
    {arms, n, u, mu, sigma, z, p, p_exact_ties} with ``u`` the
    second arm's U statistic, normal approximation with tie
    correction and continuity correction (the standard large-sample
    form; both arms here are experiment-sized).

    Exactness: no ranks are ever materialized — with per-distinct-
    value counts c1(v), c2(v) and the exclusive cumulative C1(<v),

        2*U2 = sum_v [ 2*c2(v)*C1(<v) + c2(v)*c1(v) ]

    is an exact integer computed as decimal sums (DuckDB-oracle-able,
    suite-proven), the tie term sum t_v^3 - t_v likewise; mu, sigma,
    and z assemble on the driver from exact Fractions with one float
    conversion each, p = erfc(|z|/sqrt 2).

    Scale shape / CARDINALITY CONTRACT: one groupBy over DISTINCT
    metric values, one cumulative window over those values, one
    aggregate.  The cumulative window has no partition key, so the
    distinct-value frame sorts in a SINGLE task: the documented
    contract is that the number of DISTINCT metric values stays
    task-sized (ordinal / categorical / already-bucketed metrics).
    For a CONTINUOUS corpus-scale metric (distinct ~ rows) pass
    ``quantize_bits=s``: the metric is pre-bucketed per row with the
    repo's exact floor(v * 2^s + 0.5) idiom (one correctly-rounded
    IEEE multiply-add — cross-engine reproducible), bounding distinct
    values by range * 2^s.  floor is monotone, so the result IS the
    exact tie-corrected U test applied to the bucketed metric —
    values within one 2^-s bucket become ties, which the tie term
    handles by construction (suite-pinned equal to the exact test on
    a pre-bucketed column).  The opt-in is explicit because bucketing
    changes the test's resolution; the magnitude bound
    |v| < 2^(44 - quantize_bits) is enforced in-plan."""
    op = "mann_whitney_u"
    from pyspark.sql import Window

    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    counts = (
        df.select(_arm_checked(arm_col, op).alias("arm"),
                  v_expr.alias("v"))
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return mann_whitney_u_from_counts(counts)


def mann_whitney_u_from_counts(counts: DataFrame) -> dict:
    """The U test evaluated from its SUFFICIENT STATISTIC — the
    (arm, v, c) per-distinct-value count table — which is what makes
    the streaming twin exact: the same table maintained as update-mode
    streaming aggregation state feeds the identical readout
    (streaming/abtest.py::streaming_mann_whitney_u, suite-pinned)."""
    op = "mann_whitney_u"
    from pyspark.sql import Window

    # Conditional aggregation instead of pivot('arm'): pivoted column
    # NAMES are identifiers, so an arm literally named 'v' collided
    # with the value column and a dotted arm name broke F.col
    # resolution.  Arm values stay LITERALS here, never identifiers —
    # any arm string works.  The distinct() job costs the same scan
    # pivot's implicit distinct-values pass did.
    arm_rows = [r["arm"] for r in counts.select("arm").distinct().collect()]
    if any(x is None for x in arm_rows):
        raise ValueError(f"{op}: NULL arm row — filter explicitly first")
    arms = sorted(arm_rows)
    if len(arms) != 2:
        raise ValueError(
            f"{op}: need exactly 2 arms, got {arms!r} — filter or split "
            "multi-arm experiments into pairwise readouts"
        )
    a, b = arms

    def _arm_c(side):
        return F.sum(
            F.when(F.col("arm") == F.lit(side), F.col("c"))
            .otherwise(F.lit(0).cast("long"))
        ).cast("long")

    cells = counts.groupBy("v").agg(
        _arm_c(a).alias("c1"), _arm_c(b).alias("c2")
    )
    w_ex = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d38 = "decimal(38,0)"
    staged = cells.withColumn(
        "cum1", (F.sum("c1").over(w_ex) - F.col("c1")).cast("long")
    )
    agg = staged.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(
            (F.lit(2).cast("decimal(19,0)")
             * F.col("c2").cast("decimal(19,0)")
             * F.col("cum1").cast("decimal(19,0)")
             + F.col("c2").cast("decimal(19,0)")
             * F.col("c1").cast("decimal(19,0)")).cast(d38)
        ).cast(d38).alias("two_u2"),
        F.sum(
            ((F.col("c1") + F.col("c2")).cast("decimal(19,0)")
             * (F.col("c1") + F.col("c2")).cast("decimal(19,0)")
             * (F.col("c1") + F.col("c2")).cast("decimal(19,0)")
             - (F.col("c1") + F.col("c2")).cast("decimal(19,0)")).cast(d38)
        ).cast(d38).alias("tie_term"),
    ).collect()[0]
    from fractions import Fraction

    n1, n2 = int(agg["n1"]), int(agg["n2"])
    if n1 < 1 or n2 < 1:
        raise ValueError(f"{op}: both arms need >= 1 row")
    two_u2 = int(agg["two_u2"])
    ties = int(agg["tie_term"])
    n = n1 + n2
    u2 = Fraction(two_u2, 2)
    mu = Fraction(n1 * n2, 2)
    var = Fraction(n1 * n2, 12) * (
        Fraction(n + 1) - Fraction(ties, n * (n - 1))
    ) if n > 1 else Fraction(0)
    if var <= 0:
        # every value identical: no test
        return {
            "arms": arms, "n": {a: n1, b: n2}, "u": float(u2),
            "mu": float(mu), "sigma": 0.0, "z": float("nan"),
            "p": float("nan"), "two_u": two_u2, "tie_term": ties,
        }
    sigma = math.sqrt(float(var))
    # continuity-corrected z toward the mean
    diff = u2 - mu
    cc = Fraction(1, 2) if diff > 0 else (Fraction(-1, 2) if diff < 0 else 0)
    z = float(diff - cc) / sigma
    p = math.erfc(abs(z) / math.sqrt(2.0))
    return {
        "arms": arms,
        "n": {a: n1, b: n2},
        "u": float(u2),
        "mu": float(mu),
        "sigma": sigma,
        "z": z,
        "p": p,
        "two_u": two_u2,
        "tie_term": ties,
    }


def wilcoxon_signed_rank(
    df: DataFrame,
    x_col: str,
    y_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED-sample
    nonparametric readout (pre/post, matched units) that completes
    :func:`mann_whitney_u`'s independent-sample one: per-row
    difference d = y - x, zeros DISCARDED (Wilcoxon's convention,
    reported as ``n_zero``), |d| midranked with ties, W+ = the rank
    sum of the positive differences; normal approximation with the
    tie-corrected variance and continuity correction,

        mu = n(n+1)/4,
        var = n(n+1)(2n+1)/24 - sum_v (t_v^3 - t_v)/48.

    Returns {n, n_zero, w_plus, mu, sigma, z, p, two_w, tie_term}.

    Exactness (the MWU discipline): no ranks are materialized — with
    per-distinct-|d| counts c+(v), c-(v) and the exclusive cumulative
    nonzero count T(<v),

        2*W+ = sum_v c+(v) * (2*T(<v) + t_v + 1),   t_v = c+(v)+c-(v)

    is an exact integer computed as decimal sums; mu, sigma, z
    assemble on the driver from exact Fractions with one float
    conversion each, p = erfc(|z|/sqrt 2).  Swapping x and y negates
    z EXACTLY (suite-pinned antisymmetry law).

    Scale shape / CARDINALITY CONTRACT: one groupBy over DISTINCT
    |d| values, one cumulative window over them (no partition key —
    the frame sorts in a SINGLE task; same contract and language as
    :func:`mann_whitney_u`), one aggregate.  For a continuous
    corpus-scale difference pass ``quantize_bits=s``: d is quantized
    as one floor((y - x) * 2^s + 0.5) — monotone, so the result IS
    the exact tie-corrected test on the bucketed difference
    (within-bucket differences become ties/zeros by construction;
    suite-pinned equal to the exact test on a pre-bucketed
    difference column)."""
    op = "wilcoxon_signed_rank"
    dx = F.col(x_col).cast("double")
    dy = F.col(y_col).cast("double")
    raw = dy - dx
    proj = df.select(raw.alias("d"))
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        d_expr = _q_expr("d", quantize_bits, op)
    else:
        s = F.col("d").cast("double")
        msg = (
            f"{op}: NULL/NaN difference row ({y_col} - {x_col}) — "
            "filter explicitly first"
        )
        d_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    cells = (
        proj.select(d_expr.alias("dd"))
        .select(F.abs(F.col("dd")).alias("v"), F.signum("dd").alias("sgn"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("sgn") > 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("cpos"),
            F.sum(F.when(F.col("sgn") < 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("cneg"),
            F.sum(F.when(F.col("sgn") == 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("czero"),
        )
    )
    return wilcoxon_signed_rank_from_counts(cells)


def wilcoxon_signed_rank_from_counts(counts: DataFrame) -> dict:
    """The signed-rank readout from its sufficient statistic — the
    per-distinct-|d| (v, cpos, cneg, czero) count table; see
    :func:`wilcoxon_signed_rank`.  The same table maintained as
    update-mode streaming state feeds this identical readout
    (streaming/abtest.py::streaming_wilcoxon_signed_rank,
    suite-pinned bit-equal).  The v = 0 row carries czero only
    (cpos = cneg = 0), so it contributes nothing to the window or the
    rank sums and needs no filter."""
    op = "wilcoxon_signed_rank"
    from pyspark.sql import Window

    w_ex = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d19, d38 = "decimal(19,0)", "decimal(38,0)"
    t = (F.col("cpos") + F.col("cneg")).cast("long")
    staged = counts.withColumn("t", t).withColumn(
        "cumt", (F.sum("t").over(w_ex) - F.col("t")).cast("long")
    )
    agg = staged.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum("czero").cast("long").alias("n_zero"),
        F.sum(
            (F.col("cpos").cast(d19)
             * (F.lit(2).cast(d19) * F.col("cumt").cast(d19)
                + F.col("t").cast(d19)
                + F.lit(1).cast(d19))).cast(d38)
        ).cast(d38).alias("two_w"),
        F.sum(
            (F.col("t").cast(d19) * F.col("t").cast(d19)
             * F.col("t").cast(d19)
             - F.col("t").cast(d19)).cast(d38)
        ).cast(d38).alias("tie_term"),
    ).collect()[0]
    from fractions import Fraction

    n = int(agg["n"] or 0)
    n_zero = int(agg["n_zero"] or 0)
    if n < 1:
        return {
            "n": 0, "n_zero": n_zero, "w_plus": float("nan"),
            "mu": float("nan"), "sigma": 0.0, "z": float("nan"),
            "p": float("nan"), "two_w": 0, "tie_term": 0,
        }
    two_w = int(agg["two_w"])
    ties = int(agg["tie_term"])
    w_plus = Fraction(two_w, 2)
    mu = Fraction(n * (n + 1), 4)
    var = Fraction(n * (n + 1) * (2 * n + 1), 24) - Fraction(ties, 48)
    if var <= 0:
        return {
            "n": n, "n_zero": n_zero, "w_plus": float(w_plus),
            "mu": float(mu), "sigma": 0.0, "z": float("nan"),
            "p": float("nan"), "two_w": two_w, "tie_term": ties,
        }
    sigma = math.sqrt(float(var))
    diff = w_plus - mu
    cc = Fraction(1, 2) if diff > 0 else (
        Fraction(-1, 2) if diff < 0 else 0
    )
    z = float(diff - cc) / sigma
    p = math.erfc(abs(z) / math.sqrt(2.0))
    return {
        "n": n,
        "n_zero": n_zero,
        "w_plus": float(w_plus),
        "mu": float(mu),
        "sigma": sigma,
        "z": z,
        "p": p,
        "two_w": two_w,
        "tie_term": ties,
    }


def kruskal_wallis(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Kruskal–Wallis H test (Kruskal & Wallis 1952) — the k-group
    extension of :func:`mann_whitney_u`: "do any of these groups'
    metric distributions differ?", rank-based, no normality
    assumption.  Returns {groups, n, h, h_tie_corrected, df, p,
    rank_sums_x2, tie_term}.

    Exactness: like the U test, no ranks materialize — with t_v the
    total count at value v and C(<v) the exclusive cumulative, the
    average-rank sum for group g is

        2 * R_g = sum_v c_g(v) * (2*C(<v) + t_v + 1)

    an exact integer (decimal sums; DuckDB-oracle-able); H and the
    tie-corrected H' assemble on the driver as exact Fractions (one
    float each), so at k = 2 the identity

        H' == z_uncorrected^2     (the MWU z WITHOUT continuity corr.)

    holds EXACTLY and is suite-pinned as a cross-operator law.
    p = chi2_sf(H', k - 1) via the in-repo incomplete gamma.

    Scale shape / CARDINALITY CONTRACT: one groupBy (value, group),
    one per-value total + cumulative window over DISTINCT values, one
    O(groups) collect.  The cumulative window is single-task over the
    distinct values (same class as :func:`mann_whitney_u` — see its
    docstring): distinct metric values must stay task-sized, and for
    a continuous corpus-scale metric pass ``quantize_bits=s`` to
    pre-bucket with the exact floor(v * 2^s + 0.5) idiom — monotone,
    so the result is the exact tie-corrected H on the bucketed
    metric (suite-pinned)."""
    op = "kruskal_wallis"
    from pyspark.sql import Window

    gmsg = f"{op}: NULL {group_col} row — filter explicitly first"
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = F.when(
            F.col(group_col).isNull(),
            F.raise_error(F.lit(gmsg)).cast("long"),
        ).otherwise(_q_expr(metric_col, quantize_bits, op))
    else:
        s = F.col(metric_col).cast("double")
        msg = (
            f"{op}: NULL/NaN {metric_col} or NULL {group_col} row — "
            "filter explicitly first"
        )
        v_expr = F.when(
            s.isNull() | F.isnan(s) | F.col(group_col).isNull(),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    gv = (
        df.select(F.col(group_col).cast("string").alias("g"),
                  v_expr.alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return kruskal_wallis_from_counts(gv)


def kruskal_wallis_from_counts(counts: DataFrame) -> dict:
    """The H test evaluated from its SUFFICIENT STATISTIC — the
    (g, v, c) per-(group, distinct-value) count table — the same
    split :func:`mann_whitney_u_from_counts` makes: the streaming
    twin maintains the identical table as update-mode aggregation
    state and feeds it here
    (streaming/abtest.py::streaming_kruskal_wallis, suite-pinned
    bit-equal to batch)."""
    op = "kruskal_wallis"
    from pyspark.sql import Window

    gv = counts
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per_v = (
        gv.groupBy("v").agg(F.sum("c").cast("long").alias("t"))
        .withColumn("cum_excl", (F.sum("t").over(w_cum) - F.col("t"))
                    .cast("long"))
    )
    d38 = "decimal(38,0)"
    rows = (
        gv.join(per_v, "v")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(
                (F.col("c").cast("decimal(19,0)")
                 * (F.lit(2).cast("decimal(19,0)")
                    * F.col("cum_excl").cast("decimal(19,0)")
                    + F.col("t").cast("decimal(19,0)")
                    + F.lit(1).cast("decimal(19,0)"))).cast(d38)
            ).cast(d38).alias("two_r"),
        )
        .collect()
    )
    tie = (
        per_v.agg(
            F.sum(
                (F.col("t").cast("decimal(19,0)")
                 * F.col("t").cast("decimal(19,0)")
                 * F.col("t").cast("decimal(19,0)")
                 - F.col("t").cast("decimal(19,0)")).cast(d38)
            ).cast(d38).alias("tt")
        ).collect()[0]
    )
    from fractions import Fraction

    if any(r["g"] is None for r in rows):
        raise ValueError(f"{op}: NULL group row — filter explicitly first")
    groups = sorted(r["g"] for r in rows)
    k = len(groups)
    if k < 2:
        raise ValueError(f"{op}: need >= 2 groups, got {groups!r}")
    by = {r["g"]: r for r in rows}
    n = sum(int(by[g]["n"]) for g in groups)
    if n < 3:
        raise ValueError(f"{op}: need n >= 3 total rows")
    ties = int(tie["tt"])
    h = Fraction(12, n * (n + 1)) * sum(
        Fraction(int(by[g]["two_r"]) ** 2, 4 * int(by[g]["n"]))
        for g in groups
    ) - 3 * (n + 1)
    denom = 1 - Fraction(ties, n**3 - n)
    if denom == 0:
        # every value identical
        return {
            "groups": groups, "n": {g: int(by[g]["n"]) for g in groups},
            "h": float(h), "h_tie_corrected": float("nan"),
            "df": k - 1, "p": float("nan"),
            "rank_sums_x2": {g: int(by[g]["two_r"]) for g in groups},
            "tie_term": ties,
        }
    h_c = h / denom
    from .srm import chi2_sf

    return {
        "groups": groups,
        "n": {g: int(by[g]["n"]) for g in groups},
        "h": float(h),
        "h_tie_corrected": float(h_c),
        "df": k - 1,
        "p": chi2_sf(float(h_c), k - 1),
        "rank_sums_x2": {g: int(by[g]["two_r"]) for g in groups},
        "tie_term": ties,
    }


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Spearman rank correlation, tie-aware — the monotone-association
    readout for metric-vs-ordinal drift checks where Pearson's
    linearity assumption is wrong.  Defined as Pearson correlation on
    AVERAGE ranks (the standard tie handling; reduces to
    1 - 6*sum(d^2)/(n(n^2-1)) when no ties, suite-pinned).

    Exactness: no ranks materialize per row as floats — each value's
    average rank is the half-integer (2*C(<v) + t_v + 1)/2 from the
    distinct-value machinery (the U-test idiom), so DOUBLED ranks are
    exact integers: every moment (sums, squares, cross products of
    2*rx and 2*ry) is an exact decimal sum, and rho assembles on the
    driver as ONE float conversion of an exact Fraction —
    bit-identical under any partitioning and equal to a brute-force
    replica EXACTLY (suite).

    Scale shape / CARDINALITY CONTRACT: two distinct-value rank maps
    (groupBy + cumulative window over DISTINCT values each), two
    value-keyed equi-joins to attach them, one moment aggregate.  The
    cumulative windows are single-task over each column's distinct
    values (same class as :func:`mann_whitney_u` — see its
    docstring): distinct values must stay task-sized, and for
    continuous corpus-scale columns pass ``quantize_bits=s`` to
    pre-bucket BOTH columns with the exact floor(v * 2^s + 0.5) idiom
    — monotone, so the result is the exact tie-aware rho on the
    bucketed pair (suite-pinned)."""
    op = "spearman_corr"
    from pyspark.sql import Window

    if quantize_bits is not None and not (1 <= quantize_bits <= 43):
        raise ValueError(
            f"{op}: quantize_bits must be in [1, 43], got {quantize_bits}"
        )

    def _checked(col):
        if quantize_bits is not None:
            return _q_expr(col, quantize_bits, op)
        c = F.col(col).cast("double")
        msg = f"{op}: NULL/NaN {col} row — filter explicitly first"
        return F.when(
            c.isNull() | F.isnan(c), F.raise_error(F.lit(msg)).cast("double")
        ).otherwise(c)

    rows = df.select(_checked(x_col).alias("x"), _checked(y_col).alias("y"))
    counts = rows.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return spearman_corr_from_counts(counts)


def spearman_corr_from_counts(counts: DataFrame) -> dict:
    """rho evaluated from its SUFFICIENT STATISTIC — the joint
    (x, y, c) count table (ranks are a function of the marginals, the
    cross moment of the joint): the same split the U test makes, so
    the streaming twin maintains the identical table as update-mode
    aggregation state and feeds it here
    (streaming/abtest.py::streaming_spearman_corr, suite-pinned
    bit-equal to batch).  Weighted-moment headroom: the summands are
    c * (2r)^2 <= 4 n^3-ish, so n < ~2.9e12 keeps every decimal(38,0)
    product inside headroom; beyond it the plan aborts loudly (ANSI),
    never silently."""
    op = "spearman_corr"
    from pyspark.sql import Window

    def _rank_map(col):
        w_cum = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            counts.groupBy(col)
            .agg(F.sum("c").cast("long").alias("t"))
            .withColumn(
                "r2",
                (F.lit(2) * (F.sum("t").over(w_cum) - F.col("t"))
                 + F.col("t") + F.lit(1)).cast("long"),
            )
            .select(col, "r2")
        )

    rx = _rank_map("x").withColumnRenamed("r2", "rx2")
    ry = _rank_map("y").withColumnRenamed("r2", "ry2")
    d38 = "decimal(38,0)"
    dc = F.col("c").cast("decimal(19,0)")

    def _p(a, b):
        # (r2 * r2) exact in 19x19 -> 38; * c clamps at 38 — exact at
        # scale 0 until true overflow (the documented decimal gotcha)
        return (
            (F.col(a).cast("decimal(19,0)")
             * F.col(b).cast("decimal(19,0)")).cast(d38) * dc
        ).cast(d38)

    agg = (
        counts.join(rx, "x").join(ry, "y")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(dc * F.col("rx2").cast("decimal(19,0)"))
            .cast(d38).alias("sx"),
            F.sum(dc * F.col("ry2").cast("decimal(19,0)"))
            .cast(d38).alias("sy"),
            F.sum(_p("rx2", "rx2")).cast(d38).alias("sxx"),
            F.sum(_p("ry2", "ry2")).cast(d38).alias("syy"),
            F.sum(_p("rx2", "ry2")).cast(d38).alias("sxy"),
        )
        .collect()[0]
    )
    from fractions import Fraction

    n = int(agg["n"] or 0)  # SUM over an empty frame is NULL
    if n < 2:
        raise ValueError(f"{op}: need n >= 2 rows, got {n}")
    sx, sy = int(agg["sx"]), int(agg["sy"])
    sxx, syy, sxy = int(agg["sxx"]), int(agg["syy"]), int(agg["sxy"])
    num = Fraction(n * sxy - sx * sy)
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den2 == 0:
        return {"n": n, "rho": float("nan")}  # a constant column
    # rho = num / sqrt(den2): keep it exact as num^2 sign-carried where
    # possible; the reported float is one sqrt + one division
    rho = float(num) / math.sqrt(float(den2))
    return {"n": n, "rho": rho, "num": int(num), "den2": int(den2)}


def _hl_scan(A, B, prefA, n_a, d):
    """One two-pointer pass over the sorted per-arm (value, count)
    arrays: (#pairs with diff <= d, largest achievable diff <= d,
    smallest achievable diff > d), where diff = b_value - a_value and
    every comparison uses the single float expression ``bv - av`` —
    self-consistent and deterministic (exact on quantized ints).
    O(|A| + |B|) Python-int counting."""
    cnt = 0
    pred = None
    succ = None
    i = 0
    la = len(A)
    for bv, cb in B:
        while i < la and bv - A[i][0] > d:
            i += 1
        cnt += cb * (n_a - prefA[i])
        if i < la:
            cand = bv - A[i][0]
            if pred is None or cand > pred:
                pred = cand
        if i > 0:
            cand = bv - A[i - 1][0]
            if succ is None or cand < succ:
                succ = cand
    return cnt, pred, succ


def _hl_select(A, B, prefA, n_a, k):
    """kth smallest pairwise difference (1-based) by float bisection
    with achievable-value snapping: every narrowing lands on an
    ACHIEVABLE difference (via the scan's pred/succ), so the loop
    returns the exact order statistic, never an interpolation.
    ~60 scans worst case."""
    lo = B[0][0] - A[-1][0]
    hi = B[-1][0] - A[0][0]
    while lo < hi:
        mid = 0.5 * (lo + hi)
        if not (lo <= mid < hi):
            mid = lo
        cnt, pred, succ = _hl_scan(A, B, prefA, n_a, mid)
        if cnt >= k:
            hi = pred
        else:
            lo = succ
    return lo


def hodges_lehmann_shift(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    confidence_ppm: int = 950_000,
    quantize_bits: int | None = None,
    max_cells: int = 1_000_000,
) -> dict:
    """The Hodges-Lehmann shift estimate with its rank-inversion
    confidence interval — the ROBUST effect size that pairs with
    :func:`mann_whitney_u` (Hodges & Lehmann 1963; Lehmann,
    "Nonparametrics"; Conover, "Practical Nonparametric Statistics"
    §5.4): the median of all n_a x n_b pairwise differences
    y_b - y_a, and the CI [D_(k_lo), D_(k_hi)] whose ranks come from
    inverting the U test at the normal approximation,

        C = floor(N/2 - z_{1-alpha/2} * sqrt(n_a n_b (n_a+n_b+1)/12)),
        k_lo = C + 1,  k_hi = N - C,   N = n_a * n_b.

    A single whale moves the estimate by at most one order statistic
    — the robustness the raw mean difference lacks (law-pinned).
    Ranks clamp to [1, N] at tiny n (one-sided-conservative, the
    :func:`grouped_quantile_cis` convention); even-N medians average
    the two middle order statistics (one IEEE op; exact on quantized
    values).  The no-tie variance is the standard textbook form for
    rank inversion; heavy ties make the interval conservative, never
    anti-conservative.

    Returns {arms, n, n_pairs, shift, ci_lo, ci_hi, k_lo, k_hi,
    confidence_ppm}.

    Exactness: the selection never materializes the N pairwise
    differences — a float-bisection over ACHIEVABLE differences with
    exact Python-int pair counting per probe (``_hl_select``), so the
    result is the exact order statistic of the float multiset
    {b - a}, bit-deterministic under any partitioning (suite-pinned
    against a brute-force replica).  With ``quantize_bits`` the
    arithmetic is pure integers and the outputs dequantize by exact
    2^-s division.

    Scale shape / CARDINALITY CONTRACT: ONE map-side-combinable
    corpus groupBy to the (arm, value, count) table — the same
    sufficient statistic as the U test — then O(distinct cells)
    driver work per probe, ~60 probes.  The driver collect is
    loudly bounded at ``max_cells`` (default 1e6; the
    ``grouped_quantile_cis`` guard convention) and ``quantize_bits``
    is the continuous-metric escape that bounds it by range * 2^s."""
    op = "hodges_lehmann_shift"
    _check_confidence_ppm(confidence_ppm, op)
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    counts = (
        df.select(_arm_checked(arm_col, op).alias("arm"),
                  v_expr.alias("v"))
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    out = hodges_lehmann_shift_from_counts(
        counts, confidence_ppm, max_cells
    )
    if quantize_bits is not None:
        ms = float(1 << quantize_bits)
        for key in ("shift", "ci_lo", "ci_hi"):
            out[key] = out[key] / ms
    return out


def hodges_lehmann_shift_from_counts(
    counts: DataFrame,
    confidence_ppm: int = 950_000,
    max_cells: int = 1_000_000,
) -> dict:
    """The shift estimate from the (arm, v, c) sufficient statistic —
    see :func:`hodges_lehmann_shift`.  The same count table maintained
    as update-mode streaming state feeds this identical readout
    (streaming/abtest.py::streaming_hodges_lehmann_shift,
    suite-pinned bit-equal)."""
    op = "hodges_lehmann_shift"
    _check_confidence_ppm(confidence_ppm, op)
    if not isinstance(max_cells, int) or max_cells < 2:
        raise ValueError(
            f"{op}: max_cells must be an int >= 2, got {max_cells!r}"
        )
    rows = counts.limit(max_cells + 1).collect()
    if len(rows) > max_cells:
        raise ValueError(
            f"{op}: more than max_cells={max_cells} distinct "
            "(arm, value) cells — the selection is driver-side over the "
            "count table; pass quantize_bits to bound a continuous "
            "metric, or raise max_cells explicitly"
        )
    arms = sorted({r["arm"] for r in rows})
    if any(x is None for x in arms):
        raise ValueError(f"{op}: NULL arm row — filter explicitly first")
    if len(arms) != 2:
        raise ValueError(
            f"{op}: need exactly 2 arms, got {arms!r} — filter or split "
            "multi-arm experiments into pairwise readouts"
        )
    a, b = arms
    cell = {a: {}, b: {}}
    for r in rows:
        cell[r["arm"]][r["v"]] = cell[r["arm"]].get(r["v"], 0) + int(r["c"])
    A = sorted(cell[a].items())
    B = sorted(cell[b].items())
    n_a = sum(c for _, c in A)
    n_b = sum(c for _, c in B)
    if n_a < 1 or n_b < 1:
        raise ValueError(f"{op}: both arms need >= 1 row")
    prefA = [0]
    for _, c in A:
        prefA.append(prefA[-1] + c)
    npairs = n_a * n_b
    k1 = (npairs + 1) // 2
    k2 = npairs // 2 + 1
    d1 = _hl_select(A, B, prefA, n_a, k1)
    d2 = d1 if k2 == k1 else _hl_select(A, B, prefA, n_a, k2)
    shift = d1 if k2 == k1 else (d1 + d2) / 2.0
    from statistics import NormalDist

    alpha = (1_000_000 - confidence_ppm) / 1_000_000.0
    z = NormalDist().inv_cdf(1.0 - alpha / 2.0)
    c_crit = math.floor(
        npairs / 2.0 - z * math.sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0)
    )
    k_lo = max(1, int(c_crit) + 1)
    k_hi = min(npairs, npairs - int(c_crit))
    if k_lo > k_hi:  # tiny n: clamp to the full achievable range
        k_lo, k_hi = 1, npairs
    ci_lo = _hl_select(A, B, prefA, n_a, k_lo)
    ci_hi = _hl_select(A, B, prefA, n_a, k_hi)
    return {
        "arms": arms,
        "n": {a: n_a, b: n_b},
        "n_pairs": npairs,
        "shift": float(shift),
        "ci_lo": float(ci_lo),
        "ci_hi": float(ci_hi),
        "k_lo": k_lo,
        "k_hi": k_hi,
        "confidence_ppm": int(confidence_ppm),
    }


def quantile_treatment_effects(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    quantize_bits: int | None = None,
) -> DataFrame:
    """Quantile treatment effects — the distributional A/B readout
    (Koenker & Bassett's quantile-difference estimand applied to the
    two-sample design): for each requested quantile level p (in parts
    per million) the per-arm empirical quantile and their difference,

        qte(p) = Q_b(p) - Q_a(p)

    the standard view when a treatment moves the TAILS (p95 latency,
    heavy spenders) and the mean readout hides it.

    One row per ppm: (ppm, arm_a, arm_b, q_a, q_b, qte), arms in
    sorted order (the 2-arm contract of :func:`mann_whitney_u`).
    Quantile definition: Q(p) = the smallest metric value whose
    cumulative count reaches ceil(n * p / 1e6) — the lower empirical
    (type-1) quantile, evaluated with the KLL integer-threshold idiom
    ``cw * 1e6 >= n * ppm`` (no float ceil, no division; exact for
    n per arm < 2^63 / 1e6 ~ 9.2e12).

    Exactness: the entire plan is integer arithmetic on the
    (arm, value, count) sufficient statistic — the SAME table the U
    test uses — plus a min over qualifying values, so the output
    hash-matches a DuckDB replica exactly (suite) and the streaming
    twin (streaming/abtest.py::streaming_quantile_treatment_effects)
    is bit-equal to batch by construction.  With ``quantize_bits=s``
    the metric pre-buckets per row (floor(v * 2^s + 0.5), monotone)
    and quantiles DEQUANTIZE back via division by 2^s — exact for
    |v_q| < 2^53 — trading quantile resolution (one bucket width,
    2^-s) for a bounded distinct-value frame.

    Scale shape / CARDINALITY CONTRACT: one groupBy over (arm,
    distinct value), one cumulative window PARTITIONED BY ARM over
    distinct values (two tasks — same distinct-value bound as
    :func:`mann_whitney_u`; same ``quantize_bits`` escape), one
    ppm-exploded filter + final O(|ppms|) aggregate."""
    op = "quantile_treatment_effects"
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    counts = (
        df.select(_arm_checked(arm_col, op).alias("arm"),
                  v_expr.alias("v"))
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # _from_counts runs two jobs (the arms distinct() pass + the
        # main plan): checkpoint the bucket-sized table so the corpus
        # groupBy computes once — the winsorized_ab_test idiom
        .localCheckpoint(eager=False)
    )
    out = quantile_treatment_effects_from_counts(counts, ppms)
    if quantize_bits is not None:
        ms = float(1 << quantize_bits)
        out = out.select(
            "ppm", "arm_a", "arm_b",
            (F.col("q_a") / F.lit(ms)).alias("q_a"),
            (F.col("q_b") / F.lit(ms)).alias("q_b"),
            (F.col("qte") / F.lit(ms)).alias("qte"),
        )
    return out


def quantile_treatment_effects_from_counts(
    counts: DataFrame,
    ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
) -> DataFrame:
    """QTE evaluated from the (arm, v, c) sufficient statistic — see
    :func:`quantile_treatment_effects`.  ``qte`` subtracts the two
    quantiles after casting to double (exact for integer-valued
    metrics below 2^53)."""
    op = "quantile_treatment_effects"
    from pyspark.sql import Window

    ppm_list = list(ppms)
    if not ppm_list:
        raise ValueError(f"{op}: ppms must be non-empty")
    if len(set(ppm_list)) != len(ppm_list):
        raise ValueError(f"{op}: duplicate ppm in {ppm_list!r}")
    for p in ppm_list:
        if not isinstance(p, int) or not (1 <= p <= 1_000_000):
            raise ValueError(
                f"{op}: each ppm must be an int in [1, 1000000], got "
                f"{p!r}"
            )
    arm_rows = [r["arm"] for r in counts.select("arm").distinct().collect()]
    if any(x is None for x in arm_rows):
        raise ValueError(f"{op}: NULL arm row — filter explicitly first")
    arms = sorted(arm_rows)
    if len(arms) != 2:
        raise ValueError(
            f"{op}: need exactly 2 arms, got {arms!r} — filter or split "
            "multi-arm experiments into pairwise readouts"
        )
    a, b = arms
    w_cum = Window.partitionBy("arm").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_arm = Window.partitionBy("arm")
    staged = (
        counts.withColumn("cw", F.sum("c").over(w_cum).cast("long"))
        .withColumn("n", F.sum("c").over(w_arm).cast("long"))
        .select(
            "arm", "v", "cw", "n",
            F.explode(
                F.array(*[F.lit(p).cast("long") for p in ppm_list])
            ).alias("ppm"),
        )
        # cw >= ceil(n * ppm / 1e6)  <=>  cw * 1e6 >= n * ppm
        .filter(F.col("cw") * F.lit(1_000_000) >= F.col("n") * F.col("ppm"))
    )
    qv = F.col("v").cast("double")
    return (
        staged.groupBy("ppm")
        .agg(
            F.min(F.when(F.col("arm") == F.lit(a), qv)).alias("q_a"),
            F.min(F.when(F.col("arm") == F.lit(b), qv)).alias("q_b"),
        )
        .select(
            "ppm",
            F.lit(a).alias("arm_a"),
            F.lit(b).alias("arm_b"),
            "q_a",
            "q_b",
            (F.col("q_b") - F.col("q_a")).alias("qte"),
        )
        .orderBy("ppm")
    )


def winsorized_ab_test(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    lower_ppm: int = 10_000,
    upper_ppm: int = 990_000,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """Winsorized two-sample readout — the robust mean test for
    heavy-tailed metrics (revenue, latency): each arm's values are
    CLAMPED to that arm's own [Q(lower_ppm), Q(upper_ppm)] empirical
    quantiles (Tukey's winsorization, the standard industry guard
    against a single whale flipping the experiment), then the usual
    Welch z runs on the winsorized means.  Returns {arms, per_arm:
    {n, mean, var, lo, hi}, diff, se, z, lower_ppm, upper_ppm,
    scale_bits} with lo/hi the clamp thresholds in metric units.

    Exactness: the metric quantizes ONCE per row
    (floor(v * 2^s + 0.5) — the module discipline), thresholds are
    integer quantiles of the quantized values selected with the KLL
    integer-threshold idiom (cw * 1e6 >= n * ppm; exact for n per arm
    < ~9.2e12), clamping happens on INTEGERS, and the winsorized
    moments are exact decimal sums weighted by the counts — so n, sy,
    syy, lo, hi are DuckDB-oracle-able exactly (suite) and the whole
    readout is bit-identical under any partitioning.  The final
    mean/var/z assembly is the fixed-order ``_mean_var`` float path
    every other readout uses.

    Scale shape / CARDINALITY CONTRACT: ONE corpus pass builds the
    (arm, quantized-value, count) sufficient statistic — the same
    table the U test and QTE use; everything after (threshold
    selection, clamping, moment sums) runs on that bounded bucket
    frame.  The per-arm cumulative window is partitioned by arm (two
    tasks) over distinct quantized values — scale_bits IS the
    cardinality bound here, the same knob as the rank statistics'
    ``quantize_bits``; the magnitude bound |v| < 2^(44 - s) is
    enforced in-plan."""
    op = "winsorized_ab_test"
    from pyspark.sql import Window

    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    for name, p in (("lower_ppm", lower_ppm), ("upper_ppm", upper_ppm)):
        if not isinstance(p, int) or not (1 <= p <= 1_000_000):
            raise ValueError(
                f"{op}: {name} must be an int in [1, 1000000], got {p!r}"
            )
    if lower_ppm >= upper_ppm:
        raise ValueError(
            f"{op}: need lower_ppm < upper_ppm, got "
            f"{lower_ppm} >= {upper_ppm}"
        )
    counts = (
        df.select(
            _arm_checked(arm_col, op).alias("arm"),
            _q_expr(metric_col, scale_bits, op).alias("v"),
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # cache the sufficient statistic: the threshold pass and the
    # moment pass both read it, and it is bucket-sized, not corpus-
    # sized (the cardinality contract above)
    counts = counts.localCheckpoint(eager=False)
    return winsorized_ab_test_from_counts(
        counts, lower_ppm, upper_ppm, scale_bits
    )


def winsorized_ab_test_from_counts(
    counts: DataFrame,
    lower_ppm: int = 10_000,
    upper_ppm: int = 990_000,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """The winsorized readout evaluated from the QUANTIZED
    (arm, v, c) sufficient statistic (v already integer-quantized at
    ``scale_bits`` — the caller's contract; :func:`winsorized_ab_test`
    builds it, the streaming twin drains the identical table from
    update-mode state).  See :func:`winsorized_ab_test`."""
    op = "winsorized_ab_test"
    from pyspark.sql import Window

    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    for name, p in (("lower_ppm", lower_ppm), ("upper_ppm", upper_ppm)):
        if not isinstance(p, int) or not (1 <= p <= 1_000_000):
            raise ValueError(
                f"{op}: {name} must be an int in [1, 1000000], got {p!r}"
            )
    if lower_ppm >= upper_ppm:
        raise ValueError(
            f"{op}: need lower_ppm < upper_ppm, got "
            f"{lower_ppm} >= {upper_ppm}"
        )
    ms = float(1 << scale_bits)
    w_cum = Window.partitionBy("arm").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_arm = Window.partitionBy("arm")
    cum = (
        counts.withColumn("cw", F.sum("c").over(w_cum).cast("long"))
        .withColumn("n", F.sum("c").over(w_arm).cast("long"))
    )

    def _thresh(ppm: int, alias: str):
        return (
            cum.filter(
                F.col("cw") * F.lit(1_000_000) >= F.col("n") * F.lit(ppm)
            )
            .groupBy("arm")
            .agg(F.min("v").cast("long").alias(alias))
        )

    bounds = (
        _thresh(lower_ppm, "lo").join(_thresh(upper_ppm, "hi"), "arm")
        .collect()
    )
    arms, by = _two_arms(bounds, op)
    lo = {r["arm"]: int(r["lo"]) for r in bounds}
    hi = {r["arm"]: int(r["hi"]) for r in bounds}
    # clamp on the CELL table (integers), weighted exact moments
    lo_c = F.when(F.col("arm") == arms[0], F.lit(lo[arms[0]])) \
            .otherwise(F.lit(lo[arms[1]])).cast("long")
    hi_c = F.when(F.col("arm") == arms[0], F.lit(hi[arms[0]])) \
            .otherwise(F.lit(hi[arms[1]])).cast("long")
    clamped = counts.withColumn(
        "w", F.greatest(lo_c, F.least(hi_c, F.col("v")))
    )
    dc = F.col("c").cast("decimal(19,0)")
    dw = F.col("w").cast("decimal(19,0)")
    mo = (
        clamped.groupBy("arm")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(dc * dw).cast("decimal(38,0)").alias("sy"),
            F.sum((dw * dw).cast("decimal(38,0)") * dc)
            .cast("decimal(38,0)").alias("syy"),
        )
        .collect()
    )
    _, bym = _two_arms(mo, op)
    stats = {}
    for a in arms:
        r = bym[a]
        mean, var = _mean_var(int(r["n"]), int(r["sy"]), int(r["syy"]), ms)
        stats[a] = {
            "n": int(r["n"]), "mean": mean, "var": var,
            "lo": lo[a] / ms, "hi": hi[a] / ms,
            "sy": int(r["sy"]), "syy": int(r["syy"]),
        }
    a, b = arms
    if stats[a]["n"] < 2 or stats[b]["n"] < 2:
        raise ValueError(f"{op}: both arms need n >= 2")
    diff = stats[b]["mean"] - stats[a]["mean"]
    v = stats[a]["var"] / stats[a]["n"] + stats[b]["var"] / stats[b]["n"]
    se = math.sqrt(v) if v > 0 else 0.0
    z = diff / se if se > 0 else float("nan")
    return {
        "arms": arms,
        "per_arm": stats,
        "diff": diff,
        "se": se,
        "z": z,
        "p": math.erfc(abs(z) / math.sqrt(2.0)) if se > 0 else float("nan"),
        "lower_ppm": int(lower_ppm),
        "upper_ppm": int(upper_ppm),
        "scale_bits": int(scale_bits),
    }


def trimmed_mean_ab_test(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    lower_ppm: int = 100_000,
    upper_ppm: int = 900_000,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """Yuen's trimmed-mean test (Yuen 1974, "The two-sample trimmed t
    for unequal population variances") — the other standard
    heavy-tail-robust readout: where :func:`winsorized_ab_test`
    CLAMPS the tails, this one DROPS them (each arm keeps only its
    observations ranked in (k_lo, k_hi], k_lo = floor(n * lower_ppm /
    1e6), k_hi = n - floor(n * (1e6 - upper_ppm) / 1e6)) and tests
    the trimmed means with the winsorized variance and
    Welch-Satterthwaite df on the TRIMMED counts — the correct
    inference for a trimmed mean (the trimmed observations are not
    independent draws, so the naive variance is wrong; Yuen's d_g =
    SSD_wins / (h (h - 1)) is).

    Returns {arms, per_arm: {n, h, mean_trimmed, lo, hi, d}, diff,
    se, t, df, p, lower_ppm, upper_ppm, scale_bits}.

    Exactness: quantize once (floor(v * 2^s + 0.5)); k_lo/k_hi are
    in-plan integer DIVs of n * ppm (exact, n per arm < ~9.2e12); the
    kept count of each (value, count) cell is the exact integer
    overlap  greatest(0, least(cw, k_hi) - greatest(cw - c, k_lo))
    of its cumulative rank range with the kept window; trimmed and
    winsorized moments are count-weighted decimal sums — so every
    collected number is an exact integer, the readout assembles
    driver-side from Fractions (one float per emitted field), and the
    whole dict is repartition-bit-identical (suite-pinned against an
    exact Python replica).  p uses the in-repo Student-t survival
    function (srm.student_t_sf, closed-form-pinned).

    Scale shape / CARDINALITY CONTRACT: identical to
    :func:`winsorized_ab_test` — ONE corpus pass to the quantized
    (arm, v, c) table, everything after on the bounded bucket frame;
    scale_bits is the cardinality knob, the per-arm cumulative window
    is two tasks."""
    op = "trimmed_mean_ab_test"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    counts = (
        df.select(
            _arm_checked(arm_col, op).alias("arm"),
            _q_expr(metric_col, scale_bits, op).alias("v"),
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return trimmed_mean_ab_test_from_counts(
        counts.localCheckpoint(eager=False),
        lower_ppm, upper_ppm, scale_bits,
    )


def trimmed_mean_ab_test_from_counts(
    counts: DataFrame,
    lower_ppm: int = 100_000,
    upper_ppm: int = 900_000,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """Yuen's test from the QUANTIZED (arm, v, c) sufficient statistic
    — see :func:`trimmed_mean_ab_test`; the streaming twin drains the
    identical table (streaming/abtest.py)."""
    op = "trimmed_mean_ab_test"
    from fractions import Fraction

    from pyspark.sql import Window

    from .srm import student_t_sf

    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    for name, p in (("lower_ppm", lower_ppm), ("upper_ppm", upper_ppm)):
        if not isinstance(p, int) or not (0 <= p <= 1_000_000):
            raise ValueError(
                f"{op}: {name} must be an int in [0, 1000000], got {p!r}"
            )
    if lower_ppm >= upper_ppm:
        raise ValueError(
            f"{op}: need lower_ppm < upper_ppm, got "
            f"{lower_ppm} >= {upper_ppm}"
        )
    ms = float(1 << scale_bits)
    w_cum = Window.partitionBy("arm").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_arm = Window.partitionBy("arm")
    m = F.lit(1_000_000)
    cum = (
        counts.withColumn("cw", F.sum("c").over(w_cum).cast("long"))
        .withColumn("n", F.sum("c").over(w_arm).cast("long"))
        .withColumn(
            "k_lo",
            F.expr(f"CAST((n * {lower_ppm}) DIV 1000000 AS BIGINT)"),
        )
        .withColumn(
            "k_hi",
            F.col("n") - F.expr(
                f"CAST((n * {1_000_000 - upper_ppm}) DIV 1000000 AS BIGINT)"
            ),
        )
    )
    # winsorize thresholds = the (k_lo+1)-th and k_hi-th order stats
    lo_df = (
        cum.filter(F.col("cw") >= F.col("k_lo") + 1)
        .groupBy("arm").agg(F.min("v").cast("long").alias("lo"))
    )
    hi_df = (
        cum.filter(F.col("cw") >= F.col("k_hi"))
        .groupBy("arm").agg(F.min("v").cast("long").alias("hi"))
    )
    bounds = lo_df.join(hi_df, "arm").collect()
    arms, _ = _two_arms(bounds, op)
    a, b = arms
    lo = {r["arm"]: int(r["lo"]) for r in bounds}
    hi = {r["arm"]: int(r["hi"]) for r in bounds}
    lo_c = F.when(F.col("arm") == a, F.lit(lo[a])) \
            .otherwise(F.lit(lo[b])).cast("long")
    hi_c = F.when(F.col("arm") == a, F.lit(hi[a])) \
            .otherwise(F.lit(hi[b])).cast("long")
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cw"), F.col("k_hi"))
        - F.greatest(F.col("cw") - F.col("c"), F.col("k_lo")),
    )
    w = F.greatest(lo_c, F.least(hi_c, F.col("v")))
    dk = kept.cast("decimal(19,0)")
    dc = F.col("c").cast("decimal(19,0)")
    dv = F.col("v").cast("decimal(19,0)")
    dw = w.cast("decimal(19,0)")
    d38 = "decimal(38,0)"
    mo = (
        cum.groupBy("arm")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("k_lo").cast("long").alias("k_lo"),
            F.max("k_hi").cast("long").alias("k_hi"),
            F.sum(dk).cast("long").alias("h"),
            F.sum(dk * dv).cast(d38).alias("st"),
            F.sum(dc * dw).cast(d38).alias("sw"),
            F.sum((dw * dw).cast(d38) * dc).cast(d38).alias("sww"),
        )
        .collect()
    )
    _, by = _two_arms(mo, op)
    stats = {}
    dvals = {}
    for g in arms:
        r = by[g]
        n, h = int(r["n"]), int(r["h"])
        if h != int(r["k_hi"]) - int(r["k_lo"]):
            raise RuntimeError(
                f"{op}: kept-count invariant broke for arm {g!r}"
            )
        if h < 2:
            raise ValueError(
                f"{op}: arm {g!r} keeps h = {h} < 2 rows after trimming "
                "— widen [lower_ppm, upper_ppm] or collect more data"
            )
        st, sw, sww = int(r["st"]), int(r["sw"]), int(r["sww"])
        mean_t = Fraction(st, h)                      # quantized units
        ssd_w = Fraction(n * sww - sw * sw, n)        # winsorized SSD
        d_g = ssd_w / (h * (h - 1))                   # Yuen's d
        stats[g] = {
            "n": n, "h": h,
            "mean_trimmed": float(mean_t) / ms,
            "lo": lo[g] / ms, "hi": hi[g] / ms,
            "st": st, "sw": sw, "sww": sww,
            "d": float(d_g) / (ms * ms),
        }
        dvals[g] = d_g
    diff_q = Fraction(int(by[b]["st"]), int(by[b]["h"])) - Fraction(
        int(by[a]["st"]), int(by[a]["h"])
    )
    dsum = dvals[a] + dvals[b]
    if dsum <= 0:
        return {
            "arms": arms, "per_arm": stats,
            "diff": float(diff_q) / ms, "se": 0.0,
            "t": float("nan"), "df": float("nan"), "p": float("nan"),
            "lower_ppm": int(lower_ppm), "upper_ppm": int(upper_ppm),
            "scale_bits": int(scale_bits),
        }
    # Welch-Satterthwaite on the trimmed counts (exact Fractions in,
    # one float out per field)
    df_frac = (dsum * dsum) / (
        dvals[a] * dvals[a] / (int(by[a]["h"]) - 1)
        + dvals[b] * dvals[b] / (int(by[b]["h"]) - 1)
    )
    se = math.sqrt(float(dsum)) / ms
    t_stat = (float(diff_q) / ms) / se
    dof = float(df_frac)
    return {
        "arms": arms,
        "per_arm": stats,
        "diff": float(diff_q) / ms,
        "se": se,
        "t": t_stat,
        "df": dof,
        "p": 2.0 * student_t_sf(abs(t_stat), dof),
        "lower_ppm": int(lower_ppm),
        "upper_ppm": int(upper_ppm),
        "scale_bits": int(scale_bits),
    }


def grouped_quantile_cis(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    ppms: tuple[int, ...] = (500_000,),
    confidence_ppm: int = 950_000,
    quantize_bits: int | None = None,
    max_groups: int = 10_000,
) -> DataFrame:
    """Distribution-free per-group quantile confidence bands — the
    order-statistic CI (the classical binomial argument; Conover,
    "Practical Nonparametric Statistics" §3.2): for quantile level p
    the interval [X(l), X(u)] with ranks chosen from the Binomial(n,
    p) CDF covers the true quantile with probability >= the requested
    confidence, NO distributional assumption.  The honest error bar
    for every :func:`quantile_treatment_effects` readout.

    One row per (group, ppm): (g, ppm, n, q, lo, hi, lo_rank,
    hi_rank) with q the point estimate at the QTE rank convention
    (smallest value whose cumulative count reaches ceil(n * p / 1e6))
    and [lo, hi] the band.  Ranks clamp to [1, n] when the exact
    two-sided cut does not exist at this n (tiny groups / extreme p)
    — coverage is then one-sided-conservative, never overstated.

    Float convention: the binomial CDF is evaluated driver-side as
    I_{1-p}(n-j, j+1) via the in-repo ``srm.betai`` (the lm.py
    ln/exp-crossing convention — deterministic libm floats, pinned
    against closed forms; the rank SEARCH is a ~60-step binary search
    per (group, ppm)).  Everything else — counts, cumulative ranks,
    the selected VALUES — is exact integer arithmetic on the same
    (group, value, count) sufficient statistic as QTE, so given the
    ranks the output is exact and repartition-bit-identical
    (suite-pinned against a Python replica using the same betai).

    Scale shape / CARDINALITY CONTRACT: identical to
    :func:`quantile_treatment_effects` — one corpus groupBy to the
    count table, per-group cumulative window over distinct values
    (``quantize_bits`` is the continuous-metric escape), then a
    BROADCAST join of the O(groups x ppms) rank table and one
    conditional aggregate.  The rank table is DRIVER work, so group
    cardinality is guarded loudly at ``max_groups`` (default 10_000)
    — see :func:`grouped_quantile_cis_from_counts`."""
    op = "grouped_quantile_cis"
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = F.when(
            F.col(group_col).isNull(),
            F.raise_error(
                F.lit(f"{op}: NULL {group_col} row — filter explicitly "
                      "first")
            ).cast("long"),
        ).otherwise(_q_expr(metric_col, quantize_bits, op))
    else:
        s = F.col(metric_col).cast("double")
        msg = (
            f"{op}: NULL/NaN {metric_col} or NULL {group_col} row — "
            "filter explicitly first"
        )
        v_expr = F.when(
            s.isNull() | F.isnan(s) | F.col(group_col).isNull(),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    counts = (
        df.select(F.col(group_col).cast("string").alias("g"),
                  v_expr.alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    out = grouped_quantile_cis_from_counts(
        counts.localCheckpoint(eager=False), ppms, confidence_ppm,
        max_groups,
    )
    if quantize_bits is not None:
        ms = float(1 << quantize_bits)
        out = out.select(
            "g", "ppm", "n",
            (F.col("q") / F.lit(ms)).alias("q"),
            (F.col("lo") / F.lit(ms)).alias("lo"),
            (F.col("hi") / F.lit(ms)).alias("hi"),
            "lo_rank", "hi_rank",
        )
    return out


def _binom_cdf(j: int, n: int, p: float) -> float:
    """P(Bin(n, p) <= j) = I_{1-p}(n - j, j + 1) — driver-side float
    (the documented convention of :func:`grouped_quantile_cis`)."""
    from .srm import betai

    if j < 0:
        return 0.0
    if j >= n:
        return 1.0
    return betai(float(n - j), float(j + 1), 1.0 - p)


def _ci_ranks(n: int, ppm: int, confidence_ppm: int) -> tuple[int, int]:
    """(lo_rank, hi_rank), 1-based, clamped to [1, n]: lo = the
    LARGEST k with CDF(k - 1) <= gamma/2, hi = the SMALLEST k with
    CDF(k - 1) >= 1 - gamma/2 — coverage >= confidence by the
    binomial argument.  Binary searches on the monotone CDF."""
    p = ppm / 1_000_000.0
    half = (1_000_000 - confidence_ppm) / 2_000_000.0

    # largest k in [1, n] with CDF(k-1) <= half (0 if none -> clamp 1)
    lo, hi_b = 0, n
    while lo < hi_b:
        mid = (lo + hi_b + 1) // 2
        if _binom_cdf(mid - 1, n, p) <= half:
            lo = mid
        else:
            hi_b = mid - 1
    lo_rank = max(1, lo)
    # smallest k in [1, n] with CDF(k-1) >= 1 - half (clamp n if none)
    a, b = 1, n
    if _binom_cdf(n - 1, n, p) < 1.0 - half:
        hi_rank = n
    else:
        while a < b:
            mid = (a + b) // 2
            if _binom_cdf(mid - 1, n, p) >= 1.0 - half:
                b = mid
            else:
                a = mid + 1
        hi_rank = a
    return lo_rank, hi_rank


def grouped_quantile_cis_from_counts(
    counts: DataFrame,
    ppms: tuple[int, ...] = (500_000,),
    confidence_ppm: int = 950_000,
    max_groups: int = 10_000,
) -> DataFrame:
    """The CI readout from the (g, v, c) sufficient statistic — see
    :func:`grouped_quantile_cis`.

    GROUP-CARDINALITY GUARD (the family's loud-guard convention): the
    rank table is O(groups x ppms) DRIVER work (~60 betai calls per
    cell), sized for experiment segments — handfuls to thousands.  A
    user-id-grained ``g`` by mistake would otherwise collect millions
    of rows and spin the driver for minutes with no error; instead
    the group collect is bounded at ``max_groups`` (default 10_000)
    and exceeding it raises loudly.  Raise ``max_groups`` explicitly
    if a genuinely larger segmentation is intended — driver time
    scales linearly with it."""
    op = "grouped_quantile_cis"
    from pyspark.sql import Window

    ppm_list = list(ppms)
    if not ppm_list or len(set(ppm_list)) != len(ppm_list):
        raise ValueError(f"{op}: ppms must be non-empty and distinct")
    for p in ppm_list:
        if not isinstance(p, int) or not (1 <= p <= 999_999):
            raise ValueError(
                f"{op}: each ppm must be an int in [1, 999999], got {p!r}"
            )
    _check_confidence_ppm(confidence_ppm, op)
    if not isinstance(max_groups, int) or max_groups < 1:
        raise ValueError(
            f"{op}: max_groups must be a positive int, got {max_groups!r}"
        )
    spark = counts.sparkSession
    # bounded collect: limit(max+1) caps the driver transfer even when
    # the guard is about to fire
    ns = (
        counts.groupBy("g")
        .agg(F.sum("c").cast("long").alias("n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(ns) > max_groups:
        raise ValueError(
            f"{op}: more than max_groups={max_groups} distinct groups — "
            "the per-group rank table is driver-side work sized for "
            "experiment segments, not row-grained keys; pass a coarser "
            "group_col or raise max_groups explicitly"
        )
    if not ns:
        raise ValueError(f"{op}: empty counts frame")
    if any(r["g"] is None for r in ns):
        raise ValueError(f"{op}: NULL group row — filter explicitly first")
    rank_rows = []
    for r in ns:
        g, n = r["g"], int(r["n"])
        for ppm in ppm_list:
            lo_rank, hi_rank = _ci_ranks(n, ppm, confidence_ppm)
            # the QTE point-estimate rank: ceil(n * ppm / 1e6)
            q_rank = -((-n * ppm) // 1_000_000)
            rank_rows.append((g, ppm, n, q_rank, lo_rank, hi_rank))
    ranks = spark.createDataFrame(
        rank_rows,
        "g string, ppm long, n long, q_rank long, lo_rank long, "
        "hi_rank long",
    )
    w_cum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("cw", F.sum("c").over(w_cum).cast("long"))
    qv = F.col("v").cast("double")

    def _at(rank_col: str):
        return F.min(F.when(F.col("cw") >= F.col(rank_col), qv))

    return (
        cum.join(F.broadcast(ranks), "g")
        .groupBy("g", "ppm", "n", "q_rank", "lo_rank", "hi_rank")
        .agg(_at("q_rank").alias("q"), _at("lo_rank").alias("lo"),
             _at("hi_rank").alias("hi"))
        .select("g", "ppm", "n", "q", "lo", "hi", "lo_rank", "hi_rank")
        .orderBy("g", "ppm")
    )


def quantile_treatment_effect_cis(
    df: DataFrame,
    metric_col: str,
    arm_col: str,
    ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    confidence_ppm: int = 950_000,
    quantize_bits: int | None = None,
) -> DataFrame:
    """:func:`quantile_treatment_effects` WITH its error bar: per ppm
    the per-arm point quantiles, their distribution-free
    order-statistic confidence bands (:func:`grouped_quantile_cis`'s
    binomial-rank machinery), and the PAIRED band on the difference,

        [qte_lo, qte_hi] = [lo_b - hi_a, hi_b - lo_a]

    — the conservative independent-sample pairing: each arm's band is
    taken at Bonferroni-split confidence 1 - (1-confidence)/2, and
    since the arms are independent samples the difference interval
    covers the true quantile difference whenever both per-arm bands
    cover, i.e. with probability >= confidence_ppm.  No
    distributional assumption (the Woodruff-style CI for the
    two-sample quantile-difference estimand).

    One row per ppm: (ppm, arm_a, arm_b, q_a, lo_a, hi_a, q_b, lo_b,
    hi_b, qte, qte_lo, qte_hi), arms in sorted order.  Per-arm ranks
    clamp to [1, n] at tiny n / extreme p — coverage then degrades
    one-sided-conservative, never overstated (the
    :func:`grouped_quantile_cis` clamp).

    Exactness: ranks are driver-side betai binary searches (the
    documented libm float convention, O(ppms) per arm); value
    selection, cumulative counts, and the quantized differences are
    exact integer arithmetic on the same (arm, value, count)
    sufficient statistic as QTE, repartition-bit-identical and
    Python-replica-pinned (suite).  ``quantize_bits`` pre-buckets and
    dequantizes exactly as in QTE.

    Scale shape / CARDINALITY CONTRACT: identical to
    :func:`quantile_treatment_effects` — one corpus groupBy, one
    arm-partitioned cumulative window over distinct values (the
    ``quantize_bits`` escape bounds it), a broadcast O(arms x ppms)
    rank join, one O(|ppms|) aggregate."""
    op = "quantile_treatment_effect_cis"
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    counts = (
        df.select(_arm_checked(arm_col, op).alias("arm"),
                  v_expr.alias("v"))
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # two driver jobs downstream (arms collect + main plan): one
        # corpus pass — the winsorized/QTE checkpoint idiom
        .localCheckpoint(eager=False)
    )
    out = quantile_treatment_effect_cis_from_counts(
        counts, ppms, confidence_ppm
    )
    if quantize_bits is not None:
        ms = float(1 << quantize_bits)
        vals = ["q_a", "lo_a", "hi_a", "q_b", "lo_b", "hi_b",
                "qte", "qte_lo", "qte_hi"]
        out = out.select(
            "ppm", "arm_a", "arm_b",
            *[(F.col(c) / F.lit(ms)).alias(c) for c in vals],
        )
    return out


def quantile_treatment_effect_cis_from_counts(
    counts: DataFrame,
    ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    confidence_ppm: int = 950_000,
) -> DataFrame:
    """QTE-with-bands from the (arm, v, c) sufficient statistic — see
    :func:`quantile_treatment_effect_cis`."""
    op = "quantile_treatment_effect_cis"
    from pyspark.sql import Window

    ppm_list = list(ppms)
    if not ppm_list or len(set(ppm_list)) != len(ppm_list):
        raise ValueError(f"{op}: ppms must be non-empty and distinct")
    for p in ppm_list:
        if not isinstance(p, int) or not (1 <= p <= 999_999):
            raise ValueError(
                f"{op}: each ppm must be an int in [1, 999999], got {p!r}"
            )
    _check_confidence_ppm(confidence_ppm, op)
    spark = counts.sparkSession
    ns = counts.groupBy("arm").agg(
        F.sum("c").cast("long").alias("n")
    ).collect()
    if any(r["arm"] is None for r in ns):
        raise ValueError(f"{op}: NULL arm row — filter explicitly first")
    arms = sorted(r["arm"] for r in ns)
    if len(arms) != 2:
        raise ValueError(
            f"{op}: need exactly 2 arms, got {arms!r} — filter or split "
            "multi-arm experiments into pairwise readouts"
        )
    a, b = arms
    # Bonferroni split: each arm's band carries alpha/2 (floor keeps
    # the split conservative for odd alpha_ppm)
    arm_conf = 1_000_000 - (1_000_000 - confidence_ppm) // 2
    n_by = {r["arm"]: int(r["n"]) for r in ns}
    rank_rows = []
    for arm in arms:
        n = n_by[arm]
        for ppm in ppm_list:
            lo_rank, hi_rank = _ci_ranks(n, ppm, arm_conf)
            q_rank = -((-n * ppm) // 1_000_000)
            rank_rows.append((arm, ppm, n, q_rank, lo_rank, hi_rank))
    ranks = spark.createDataFrame(
        rank_rows,
        "arm string, ppm long, n long, q_rank long, lo_rank long, "
        "hi_rank long",
    )
    w_cum = Window.partitionBy("arm").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("cw", F.sum("c").over(w_cum).cast("long"))
    qv = F.col("v").cast("double")

    def _at(rank_col: str):
        return F.min(F.when(F.col("cw") >= F.col(rank_col), qv))

    per = (
        cum.join(F.broadcast(ranks), "arm")
        .groupBy("arm", "ppm")
        .agg(_at("q_rank").alias("q"), _at("lo_rank").alias("lo"),
             _at("hi_rank").alias("hi"))
    )

    def _arm_val(side: str, col: str):
        # the arms are string literals, so conditional aggregation
        # pivots without a pivot() pass (the MWU from_counts idiom)
        return F.min(F.when(F.col("arm") == F.lit(side), F.col(col)))

    return (
        per.groupBy("ppm")
        .agg(
            _arm_val(a, "q").alias("q_a"),
            _arm_val(a, "lo").alias("lo_a"),
            _arm_val(a, "hi").alias("hi_a"),
            _arm_val(b, "q").alias("q_b"),
            _arm_val(b, "lo").alias("lo_b"),
            _arm_val(b, "hi").alias("hi_b"),
        )
        .select(
            "ppm",
            F.lit(a).alias("arm_a"),
            F.lit(b).alias("arm_b"),
            "q_a", "lo_a", "hi_a", "q_b", "lo_b", "hi_b",
            (F.col("q_b") - F.col("q_a")).alias("qte"),
            (F.col("lo_b") - F.col("hi_a")).alias("qte_lo"),
            (F.col("hi_b") - F.col("lo_a")).alias("qte_hi"),
        )
        .orderBy("ppm")
    )


def _beta_inv(gamma: float, a: float, b: float) -> float:
    """Inverse of the regularized incomplete beta in its first
    argument: the x with I_x(a, b) = gamma, by bisection on the
    monotone CDF (deterministic libm floats — the documented
    driver-side convention; ~60 betai calls)."""
    from .srm import betai

    if not (0.0 < gamma < 1.0):
        raise ValueError(f"_beta_inv: gamma must be in (0, 1), got {gamma}")
    lo, hi = 0.0, 1.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if mid == lo or mid == hi:
            break
        if betai(a, b, mid) < gamma:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _check_confidence_ppm(confidence_ppm, op: str) -> None:
    """Shared contract check for every confidence_ppm-taking readout:
    fail fast with the contract message BEFORE any corpus job or
    stream drain (an out-of-range value deep in ``_beta_inv`` would
    otherwise surface as a confusing gamma-domain error)."""
    if not isinstance(confidence_ppm, int) or not (
        500_000 <= confidence_ppm <= 999_999
    ):
        raise ValueError(
            f"{op}: confidence_ppm must be an int in [500000, 999999], "
            f"got {confidence_ppm!r}"
        )


def proportion_ab_test(
    df: DataFrame,
    success_col: str,
    arm_col: str,
    confidence_ppm: int = 950_000,
) -> dict:
    """Binary-metric (conversion-rate) A/B readout: per-arm success
    counts with EXACT Clopper-Pearson confidence intervals
    (Clopper & Pearson 1934 — the binomial-inversion interval, never
    below nominal coverage, correct at x = 0 and x = n where the Wald
    interval collapses) and the pooled two-proportion z test.

    Returns {arms, per_arm: {n, x, rate, ci_lo, ci_hi}, diff, lift,
    se_pooled, z, p, confidence_ppm}.  ``success_col`` must be
    boolean or integer 0/1 (anything else raises in-plan — a silent
    cast would count garbage as conversions); NULLs raise.

    Exactness: n and x are ONE map-side-combinable integer aggregate
    (exact, DuckDB-oracle-able; the streaming twin maintains the same
    sums as update-mode state bit-exactly).  The CP bounds are
    driver-side beta inversions via the in-repo ``srm.betai``
    (closed-form-pinned), lower = BetaInv(gamma/2; x, n-x+1), upper =
    BetaInv(1-gamma/2; x+1, n-x), with the exact x=0 -> lo=0 and
    x=n -> hi=1 edges.  z assembles in one fixed expression order.

    Scale shape: one aggregate over the corpus, O(arms) driver work.
    Nothing else touches the data."""
    op = "proportion_ab_test"
    _check_confidence_ppm(confidence_ppm, op)
    dt = df.schema[success_col].dataType.simpleString()
    s = F.col(success_col)
    if dt == "boolean":
        sx = s.cast("long")
    elif dt in ("tinyint", "smallint", "int", "bigint"):
        sx = s.cast("long")
    else:
        raise ValueError(
            f"{op}: {success_col!r} must be boolean or integer 0/1, got "
            f"{dt} — cast explicitly first"
        )
    msg = (
        f"{op}: NULL or non-0/1 {success_col} row — filter explicitly "
        "first"
    )
    checked = F.when(
        sx.isNull() | ~sx.isin(0, 1),
        F.raise_error(F.lit(msg)).cast("long"),
    ).otherwise(sx)
    rows = (
        df.select(_arm_checked(arm_col, op).alias("arm"),
                  checked.alias("x"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("x"),
        )
        .collect()
    )
    return _proportion_assemble(rows, confidence_ppm, op)


def _proportion_assemble(rows: list, confidence_ppm: int, op: str) -> dict:
    arms, by = _two_arms(rows, op)
    gamma = (1_000_000 - confidence_ppm) / 1_000_000.0
    stats = {}
    for g in arms:
        n, x = int(by[g]["n"]), int(by[g]["x"])
        if n < 1:
            raise ValueError(f"{op}: arm {g!r} has no rows")
        lo = 0.0 if x == 0 else _beta_inv(gamma / 2.0, float(x),
                                          float(n - x + 1))
        hi = 1.0 if x == n else _beta_inv(1.0 - gamma / 2.0,
                                          float(x + 1), float(n - x))
        stats[g] = {"n": n, "x": x, "rate": x / n, "ci_lo": lo,
                    "ci_hi": hi}
    a, b = arms
    na, xa = stats[a]["n"], stats[a]["x"]
    nb, xb = stats[b]["n"], stats[b]["x"]
    diff = xb / nb - xa / na
    pool = (xa + xb) / (na + nb)
    se = math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    z = diff / se if se > 0 else float("nan")
    return {
        "arms": arms,
        "per_arm": stats,
        "diff": diff,
        # 0/0 successes has no defined lift (NaN); +inf only when the
        # baseline is 0 and the treatment actually converted
        "lift": (xb / nb) / (xa / na) - 1.0 if xa > 0
        else (float("nan") if xb == 0 else float("inf")),
        "se_pooled": se,
        "z": z,
        "p": math.erfc(abs(z) / math.sqrt(2.0)) if se > 0
        else float("nan"),
        "confidence_ppm": int(confidence_ppm),
    }
