"""Kaplan–Meier survival / retention curves — the censoring-aware
complement to operators/funnel.py's retention_cohorts (Kaplan & Meier
1958, "Nonparametric Estimation from Incomplete Observations"): the
product-limit estimator

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

over distinct event times t_i with d_i events among n_i still at
risk, which is how user-retention ("how long until churn") must be
read when the observation window right-censors the still-active
users — counting censored users as churned (what a naive ECDF does)
biases every retention number down.

Exactness: the corpus work is ONE integer aggregate per (group,
duration) — d (events) and c (censored) counts; the curve assembles
on the driver with fractions.Fraction (S(t) and the Greenwood
variance sum are exact rationals; one float conversion per reported
number), so the output is bit-identical under any partitioning and
EQUALS a brute-force replica exactly (suite), with the textbook
Freireich 6-MP arm pinned to its published values.

Greenwood's formula ships alongside:  var(S) = S^2 * sum d/(n(n-d)).

Scale shape: one map-side-combinable groupBy; the collect is
O(groups x distinct durations) — durations are time BUCKETS (days/
weeks: bucket upstream), the same driver budget class as calibration
blocks and k-means centroids.  Nothing else touches the corpus.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Guard on the driver-side assembly: distinct (group, duration) cells
#: beyond this indicate un-bucketed raw timestamps, which belongs in a
#: window plan, not a product-limit collect.
MAX_CELLS = 200_000


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Product-limit curve.  ``duration_col``: non-negative time to
    event or censoring (bucket to days/weeks upstream);
    ``event_col``: 1 = the event happened (churn/death), 0 = censored
    at that duration (still active when observation ended).  Returns
    one row per distinct event-or-censoring time (per group):

        ([group,] t, n_risk, n_events, n_censored, survival,
         greenwood_se)

    where ``survival`` is S(t) AFTER the events at t and rows exist
    for censoring-only times too (n_events = 0, survival unchanged) —
    the lifelines/R-survfit convention.  NULLs, negative durations,
    and event flags outside {0, 1} are rejected in-plan (single
    pass)."""
    op = "kaplan_meier"
    gcols = [group_col] if group_col else []
    dmsg = (
        f"{op}: NULL/negative {duration_col}, NULL {event_col} or "
        f"{event_col} not in {{0,1}}"
        + (f", or NULL {group_col}" if group_col else "")
        + " — filter explicitly first"
    )
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("long")
    bad = d.isNull() | F.isnan(d) | (d < 0) | e.isNull() | ~e.isin(0, 1)
    if group_col:
        bad = bad | F.col(group_col).isNull()
    checked_d = F.when(bad, F.raise_error(F.lit(dmsg)).cast("double")).otherwise(d)
    cells = (
        df.select(*gcols, checked_d.alias("t"), e.alias("e"))
        .groupBy(*gcols, "t")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("c"),
        )
    )
    rows = cells.collect()
    if not rows:
        raise ValueError(f"{op}: empty frame")
    if len(rows) > MAX_CELLS:
        raise ValueError(
            f"{op}: {len(rows)} distinct (group, duration) cells — bucket "
            f"durations upstream (limit {MAX_CELLS})"
        )
    return assemble_km_frame(df.sparkSession, rows, group_col,
                             df.schema[group_col].dataType.simpleString()
                             if group_col else None)


#: Output schema of the curve frame (shared with the streaming twin).
KM_SCHEMA = (
    "t double, n_risk long, n_events long, n_censored long, "
    "survival double, greenwood_se double"
)


def assemble_km_frame(spark, rows, group_col, group_type):
    """Driver-side exact-Fraction assembly of the product-limit curve
    from collected ([group,] t, d, c) cells — shared by the batch
    operator and streaming/survival.py's twin so the two cannot
    drift."""
    by_group: dict = {}
    for r in rows:
        key = r[group_col] if group_col else None
        by_group.setdefault(key, []).append(
            (float(r["t"]), int(r["d"]), int(r["c"]))
        )
    out = []
    for key in sorted(by_group, key=lambda k: (k is None, str(k))):
        cells_g = sorted(by_group[key])
        n_risk = sum(dd + cc for _, dd, cc in cells_g)
        s = Fraction(1)
        gw = Fraction(0)  # sum d / (n (n - d))
        for t, dd, cc in cells_g:
            if dd:
                s *= Fraction(n_risk - dd, n_risk)
                if n_risk - dd > 0:
                    gw += Fraction(dd, n_risk * (n_risk - dd))
                    se = float(s) * float(gw) ** 0.5
                else:
                    se = 0.0  # S hit exactly 0 — Greenwood degenerates
            else:
                se = float(s) * float(gw) ** 0.5
            rec = (t, n_risk, dd, cc, float(s), se)
            out.append(((key,) + rec) if group_col else rec)
            n_risk -= dd + cc
    if group_col:
        return spark.createDataFrame(out, f"{group_col} {group_type}, {KM_SCHEMA}")
    return spark.createDataFrame(out, KM_SCHEMA)


def median_survival_time(km: DataFrame, group_col: str | None = None):
    """Smallest t with S(t) <= 0.5 from a :func:`kaplan_meier` frame —
    the standard summary number.  Returns a float (or a {group: float}
    dict), None where the curve never reaches 0.5 (censoring-dominated
    data: the honest answer, not an extrapolation)."""
    rows = sorted(
        km.collect(),
        key=lambda r: ((str(r[group_col]) if group_col else ""), r["t"]),
    )
    if group_col is None:
        for r in rows:
            if r["survival"] <= 0.5:
                return r["t"]
        return None
    out: dict = {}
    seen = []
    for r in rows:
        g = r[group_col]
        if g not in out:
            if g not in seen:
                seen.append(g)
            if r["survival"] <= 0.5:
                out[g] = r["t"]
    return {g: out.get(g) for g in seen}




def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
) -> dict:
    """Two-group log-rank test (Mantel 1966; Peto & Peto 1972) — "are
    these two survival curves the same?", the hypothesis test that
    pairs with :func:`kaplan_meier` exactly like the z readout pairs
    with ab_arm_stats.  At each distinct event time t the observed
    group-1 events d1 are compared with the hypergeometric expectation
    d * n1/n, with variance d*(n1/n)*(n2/n)*(n-d)/(n-1):

        chi2 = (sum (d1 - E1))^2 / sum V,   p = chi2_sf(chi2, 1)

    Exactness: the corpus work is the same one integer aggregate as
    kaplan_meier; O, E, and V assemble on the driver as exact
    Fractions — chi2 is one float conversion of an exact rational and
    EQUALS a brute-force replica exactly (suite); the Freireich
    6-MP-vs-placebo chi2 = 16.79 is pinned.  Returns {chi2, p, groups,
    observed, expected, n}."""
    op = "logrank_test"
    dmsg = (
        f"{op}: NULL/negative {duration_col}, NULL {event_col} or "
        f"{event_col} not in {{0,1}}, or NULL {group_col} — filter "
        "explicitly first"
    )
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("long")
    bad = (
        d.isNull() | F.isnan(d) | (d < 0) | e.isNull() | ~e.isin(0, 1)
        | F.col(group_col).isNull()
    )
    checked_d = F.when(bad, F.raise_error(F.lit(dmsg)).cast("double")).otherwise(d)
    rows = (
        df.select(F.col(group_col).alias("g"), checked_d.alias("t"),
                  e.alias("e"))
        .groupBy("g", "t")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("c"),
        )
        .collect()
    )
    if len(rows) > MAX_CELLS:
        raise ValueError(
            f"{op}: {len(rows)} distinct (group, duration) cells — bucket "
            f"durations upstream (limit {MAX_CELLS})"
        )
    groups = sorted({r["g"] for r in rows}, key=str)
    if len(groups) != 2:
        raise ValueError(
            f"{op}: need exactly 2 groups, got {groups!r}"
        )
    g1 = groups[0]
    cells: dict = {}
    n1 = n2 = 0
    for r in rows:
        t = float(r["t"])
        cur = cells.setdefault(t, [0, 0, 0, 0])  # d1, c1, d2, c2
        if r["g"] == g1:
            cur[0] += int(r["d"])
            cur[1] += int(r["c"])
            n1 += int(r["d"]) + int(r["c"])
        else:
            cur[2] += int(r["d"])
            cur[3] += int(r["c"])
            n2 += int(r["d"]) + int(r["c"])
    obs1 = 0
    exp1 = Fraction(0)
    var = Fraction(0)
    r1, r2 = n1, n2  # at risk
    for t in sorted(cells):
        d1, c1, d2, c2 = cells[t]
        dt = d1 + d2
        nt = r1 + r2
        if dt and nt > 1:
            obs1 += d1
            exp1 += Fraction(dt * r1, nt)
            var += Fraction(dt * r1 * r2 * (nt - dt), nt * nt * (nt - 1))
        elif dt and nt == 1:
            obs1 += d1
            exp1 += Fraction(dt * r1, nt)
        r1 -= d1 + c1
        r2 -= d2 + c2
    if var == 0:
        chi2 = 0.0
        p = 1.0
    else:
        chi2 = float((obs1 - exp1) ** 2 / var)
        from .srm import chi2_sf

        p = chi2_sf(chi2, 1)
    return {
        "groups": groups,
        "n": {str(groups[0]): n1, str(groups[1]): n2},
        "observed": obs1,
        "expected": float(exp1),
        "chi2": chi2,
        "p": p,
    }

__all__ = ["kaplan_meier", "median_survival_time", "logrank_test", "assemble_km_frame", "KM_SCHEMA", "MAX_CELLS"]
