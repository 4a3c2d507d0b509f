"""Sample-ratio-mismatch (SRM) detection — the experiment-health gate
every A/B readout should run first (Fabijan et al., "Diagnosing Sample
Ratio Mismatch in Online Controlled Experiments", KDD'19): if the
observed arm counts differ from the designed split more than chance
allows, the assignment pipeline is broken and every downstream metric
readout (abtest.py's CUPED / mSPRT) is invalid regardless of its own
statistics.  The test is Pearson's chi-square on the assignment
counts against the designed ratios.

Exactness: the counts are one integer groupBy (exact, trivially
DuckDB-oracle-able); the chi-square statistic assembles on the driver
in one fixed expression order over the sorted arms; the p-value is a
regularized upper incomplete gamma Q(df/2, x/2) evaluated by the
classical series / continued-fraction pair (Numerical Recipes §6.2
scheme — public-domain mathematics), pinned in the suite against the
closed forms Q(1/2, y) = erfc(sqrt(y)) and Q(1, y) = exp(-y) and
Q(2, y) = exp(-y)(1 + y) rather than against another library.

Scale shape: ONE map-side-combinable aggregate over the assignment
log; O(arms) driver work.  Nothing else touches the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 3e-15
_ITMAX = 500


def _gser(a: float, x: float) -> float:
    """Regularized LOWER incomplete gamma P(a, x) by series (x < a+1)."""
    ap = a
    s = 1.0 / a
    delta = s
    for _ in range(_ITMAX):
        ap += 1.0
        delta *= x / ap
        s += delta
        if abs(delta) < abs(s) * _EPS:
            break
    return s * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf(a: float, x: float) -> float:
    """Regularized UPPER incomplete gamma Q(a, x) by modified Lentz
    continued fraction (x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _ITMAX + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammq(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = Gamma(a,x)/Gamma(a)
    — the chi-square survival function is Q(df/2, x/2)."""
    if a <= 0:
        raise ValueError(f"gammq: a must be > 0, got {a}")
    if x < 0:
        raise ValueError(f"gammq: x must be >= 0, got {x}")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gser(a, x)
    return _gcf(a, x)


def chi2_sf(x: float, df: int) -> float:
    """Chi-square survival function P(X > x) with df degrees of
    freedom."""
    if df < 1:
        raise ValueError(f"chi2_sf: df must be >= 1, got {df}")
    return gammq(df / 2.0, x / 2.0)


def sample_ratio_mismatch(
    df: DataFrame,
    arm_col: str,
    expected: dict,
) -> dict:
    """Chi-square SRM check of the observed arm counts against the
    designed split.  ``expected`` maps arm -> design weight (any
    positive scale; normalized internally).  Returns::

        {n, counts, expected_counts, chi2, df, p, srm}

    with ``srm`` = True when p < 1e-3 (the published operating
    threshold — an SRM alarm is a pipeline bug, so the gate is
    deliberately conservative).  An observed arm missing from
    ``expected`` raises (assignment produced an undesigned arm — that
    IS the bug); a designed arm with zero traffic counts as 0 and
    contributes its full expectation to the statistic."""
    if not expected:
        raise ValueError("sample_ratio_mismatch: expected is empty")
    arms = sorted(expected, key=str)
    weights = [float(expected[a]) for a in arms]
    if any(w <= 0 for w in weights):
        raise ValueError(
            f"sample_ratio_mismatch: design weights must be > 0, got "
            f"{expected!r}"
        )
    msg = f"sample_ratio_mismatch: NULL {arm_col} row — filter explicitly first"
    checked = F.when(
        F.col(arm_col).isNull(), F.raise_error(F.lit(msg)).cast("string")
    ).otherwise(F.col(arm_col).cast("string"))
    rows = (
        df.select(checked.alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    got = {r["arm"]: int(r["c"]) for r in rows}
    undesigned = sorted(set(got) - {str(a) for a in arms})
    if undesigned:
        raise ValueError(
            f"sample_ratio_mismatch: observed arm(s) {undesigned!r} are "
            "not in the design — the assignment pipeline emitted an "
            "undesigned arm"
        )
    counts = [got.get(str(a), 0) for a in arms]
    n = sum(counts)
    if n == 0:
        raise ValueError("sample_ratio_mismatch: empty assignment log")
    wsum = math.fsum(weights)
    exp_counts = [n * w / wsum for w in weights]
    chi2 = math.fsum(
        (o - e) * (o - e) / e for o, e in zip(counts, exp_counts)
    )
    dof = len(arms) - 1
    if dof == 0:
        p = 1.0
    else:
        p = chi2_sf(chi2, dof)
    return {
        "n": n,
        "counts": {str(a): c for a, c in zip(arms, counts)},
        "expected_counts": {str(a): e for a, e in zip(arms, exp_counts)},
        "chi2": chi2,
        "df": dof,
        "p": p,
        "srm": p < 1e-3,
    }


__all__ = ["sample_ratio_mismatch", "chi2_sf", "gammq"]


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Numerical Recipes
    §6.4 scheme, modified Lentz — public-domain mathematics)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, _ITMAX + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betai(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) — suite-pinned against
    the closed forms I_x(1, b) = 1 - (1-x)^b, I_x(a, 1) = x^a, and
    the symmetry I_x(a, b) = 1 - I_{1-x}(b, a), not against another
    library."""
    if a <= 0 or b <= 0:
        raise ValueError(f"betai: a, b must be > 0, got {a}, {b}")
    if not (0.0 <= x <= 1.0):
        raise ValueError(f"betai: x must be in [0, 1], got {x}")
    if x == 0.0:
        return 0.0
    if x == 1.0:
        return 1.0
    front = math.exp(
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def student_t_sf(t: float, df: float) -> float:
    """Student-t survival function P(T > t), real df (Welch /
    Yuen-Satterthwaite df are non-integer).  For t >= 0 it is
    0.5 * I_{df/(df+t^2)}(df/2, 1/2); suite-pinned against the df=1
    Cauchy and df=2 closed forms and the df->inf normal limit."""
    if df <= 0:
        raise ValueError(f"student_t_sf: df must be > 0, got {df}")
    if math.isnan(t):
        return float("nan")
    if t < 0:
        return 1.0 - student_t_sf(-t, df)
    x = df / (df + t * t)
    return 0.5 * betai(df / 2.0, 0.5, x)
