"""Kaplan–Meier (operators/survival.py): the textbook Freireich 6-MP
arm pinned to published values, exact equality against a brute-force
Fraction replica, the no-censoring ECDF reduction, grouped curves,
bit-determinism, and loud rejection."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR

from kafka_avro_order_processing_spark.operators.survival import (
    kaplan_meier,
    median_survival_time,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

# Freireich et al. 1963, 6-MP arm (n=21) — the canonical KM example:
# remission lengths in weeks; * = censored.
_FREIREICH = (
    [(6.0, 1)] * 3 + [(6.0, 0)]
    + [(7.0, 1)] + [(9.0, 0)]
    + [(10.0, 1)] + [(10.0, 0)] + [(11.0, 0)]
    + [(13.0, 1)] + [(16.0, 1)] + [(17.0, 0)] + [(19.0, 0)] + [(20.0, 0)]
    + [(22.0, 1)] + [(23.0, 1)]
    + [(25.0, 0)] + [(32.0, 0)] * 2 + [(34.0, 0)] + [(35.0, 0)]
)


def _km_replica(rows):
    """Brute-force product-limit with exact Fractions."""
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for t, e in rows:
        agg[t][0 if e else 1] += 1
    n = len(rows)
    s = Fraction(1)
    out = {}
    for t in sorted(agg):
        d, c = agg[t]
        if d:
            s *= Fraction(n - d, n)
        out[t] = (n, d, c, float(s))
        n -= d + c
    return out


def test_freireich_textbook_values(spark):
    df = spark.createDataFrame(_FREIREICH, "weeks double, relapse int")
    km = {r["t"]: r for r in kaplan_meier(df, "weeks", "relapse").collect()}
    # the published curve (3 decimals)
    for t, want in ((6.0, 0.857), (7.0, 0.807), (10.0, 0.753),
                    (13.0, 0.690), (16.0, 0.627), (22.0, 0.538),
                    (23.0, 0.448)):
        assert abs(km[t]["survival"] - want) < 5e-4, t
    assert km[6.0]["n_risk"] == 21 and km[6.0]["n_events"] == 3
    # censoring-only times keep S flat
    assert km[9.0]["survival"] == km[7.0]["survival"]
    assert km[9.0]["n_events"] == 0 and km[9.0]["n_censored"] == 1
    # published Greenwood SE at t=6 is ~0.0764
    assert abs(km[6.0]["greenwood_se"] - 0.0764) < 5e-4
    # median: the curve never reaches 0.5 within follow-up? It does at 23
    assert median_survival_time(kaplan_meier(df, "weeks", "relapse")) == 23.0


def test_matches_fraction_replica_exactly(spark):
    df = spark.createDataFrame(_FREIREICH, "weeks double, relapse int")
    got = {r["t"]: r for r in kaplan_meier(df, "weeks", "relapse").collect()}
    want = _km_replica(_FREIREICH)
    assert set(got) == set(want)
    for t, (n, d, c, s) in want.items():
        assert got[t]["n_risk"] == n
        assert got[t]["n_events"] == d
        assert got[t]["n_censored"] == c
        assert got[t]["survival"] == s, t  # EXACT: Fraction assembly
    # repartitioning cannot move a bit
    again = {
        r["t"]: tuple(r)
        for r in kaplan_meier(
            df.repartition(7), "weeks", "relapse"
        ).collect()
    }
    assert again == {r["t"]: tuple(r) for _, r in
                     ((t, got[t]) for t in got)}


def test_no_censoring_reduces_to_ecdf(spark):
    """With every observation an event, S(t) = 1 - ECDF(t) exactly."""
    vals = [float(v) for v in (3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5)]
    df = spark.createDataFrame([(v, 1) for v in vals], "t double, e int")
    km = {r["t"]: r["survival"] for r in kaplan_meier(df, "t", "e").collect()}
    n = len(vals)
    for t in set(vals):
        ge = sum(1 for v in vals if v > t)
        assert km[t] == float(Fraction(ge, n)), t
    # all-censored: S stays exactly 1
    dfc = spark.createDataFrame([(v, 0) for v in vals], "t double, e int")
    assert all(
        r["survival"] == 1.0 for r in kaplan_meier(dfc, "t", "e").collect()
    )


def test_grouped_curves_on_events(spark):
    """Churn-style frame from the real events table: per-user span in
    days, censored when the user is active in the final day."""
    ev = load_table(spark, SF_DIR, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = (
        ev.groupBy("user_id")
        .agg(
            (((F.max(us) - F.min(us)) / F.lit(86400.0 * 1e6))
             .cast("int").cast("double")).alias("days"),
        )
        .select(
            "days",
            (F.col("user_id") % 2 == 0).cast("string").alias("cohort"),
            (F.col("days") < 6.0).cast("int").alias("churned"),
        )
    )
    km = kaplan_meier(span, "days", "churned", group_col="cohort")
    rows = km.collect()
    assert len(rows) > 0
    # survival is non-increasing within each group
    for g in ("true", "false"):
        s = [r["survival"] for r in sorted(
            (r for r in rows if r["cohort"] == g), key=lambda r: r["t"])]
        assert all(a >= b for a, b in zip(s, s[1:]))
        assert all(0.0 <= v <= 1.0 for v in s)
    med = median_survival_time(km, group_col="cohort")
    assert set(med) == {"true", "false"}
    # grouped == per-group global
    for g in ("true", "false"):
        sub = kaplan_meier(
            span.filter(F.col("cohort") == g), "days", "churned"
        ).collect()
        want = sorted(tuple(r) for r in sub)
        got = sorted(
            tuple(r)[1:] for r in rows if r["cohort"] == g
        )
        assert got == want, g


def test_validation(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 0)], "t double, e int")
    with pytest.raises(Exception, match="filter explicitly"):
        kaplan_meier(
            spark.createDataFrame([(None, 1)], "t double, e int"), "t", "e"
        )
    with pytest.raises(Exception, match="filter explicitly"):
        kaplan_meier(
            spark.createDataFrame([(-1.0, 1)], "t double, e int"), "t", "e"
        )
    with pytest.raises(Exception, match="filter explicitly"):
        kaplan_meier(
            spark.createDataFrame([(1.0, 2)], "t double, e int"), "t", "e"
        )
    with pytest.raises(ValueError, match="empty"):
        kaplan_meier(df.filter("t > 99"), "t", "e")


# ------------------------------------------------------------- log-rank

from kafka_avro_order_processing_spark.operators.survival import (  # noqa: E402
    logrank_test,
)

# Freireich placebo arm (n=21, no censoring)
_PLACEBO = [
    (1.0, 1), (1.0, 1), (2.0, 1), (2.0, 1), (3.0, 1), (4.0, 1), (4.0, 1),
    (5.0, 1), (5.0, 1), (8.0, 1), (8.0, 1), (8.0, 1), (8.0, 1), (11.0, 1),
    (11.0, 1), (12.0, 1), (12.0, 1), (15.0, 1), (17.0, 1), (22.0, 1),
    (23.0, 1),
]


def _logrank_replica(rows):
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])
    n1 = n2 = 0
    for g, t, e in rows:
        idx = 0 if g == "6mp" else 2
        cells[t][idx + (0 if e else 1)] += 1
        if g == "6mp":
            n1 += 1
        else:
            n2 += 1
    obs1 = 0
    exp1 = Fraction(0)
    var = Fraction(0)
    r1, r2 = n1, n2
    for t in sorted(cells):
        d1, c1, d2, c2 = cells[t]
        dt, nt = d1 + d2, r1 + r2
        if dt and nt > 1:
            obs1 += d1
            exp1 += Fraction(dt * r1, nt)
            var += Fraction(dt * r1 * r2 * (nt - dt), nt * nt * (nt - 1))
        r1 -= d1 + c1
        r2 -= d2 + c2
    return float((obs1 - exp1) ** 2 / var)


def test_logrank_freireich_textbook(spark):
    rows = ([("6mp", t, e) for t, e in _FREIREICH]
            + [("placebo", t, e) for t, e in _PLACEBO])
    df = spark.createDataFrame(rows, "arm string, weeks double, relapse int")
    out = logrank_test(df, "weeks", "relapse", "arm")
    # the published Freireich log-rank chi2 (survival-analysis texts)
    assert abs(out["chi2"] - 16.79) < 0.01
    assert out["p"] < 1e-4
    assert out["n"] == {"6mp": 21, "placebo": 21}
    # exact equality with the Fraction replica
    assert out["chi2"] == _logrank_replica(rows)
    # repartition-invariant
    again = logrank_test(df.repartition(5), "weeks", "relapse", "arm")
    assert again == out


def test_logrank_identical_groups_is_null(spark):
    one = [(float(v), 1) for v in (3, 5, 5, 8, 13)] + [(9.0, 0)]
    rows = [("a", t, e) for t, e in one] + [("b", t, e) for t, e in one]
    df = spark.createDataFrame(rows, "g string, t double, e int")
    out = logrank_test(df, "t", "e", "g")
    # identical curves: observed == expected exactly -> chi2 == 0
    assert out["chi2"] == 0.0 and out["p"] == 1.0
    with pytest.raises(ValueError, match="exactly 2 groups"):
        logrank_test(
            df.withColumn("g", F.concat(F.col("g"), (F.col("t") % 2).cast("int").cast("string"))),
            "t", "e", "g",
        )


def test_streaming_km_bit_matches_batch(spark, tmp_path):
    """Cells are associative integer sums: the streaming curve equals
    batch EXACTLY across micro-batches, grouped and ungrouped."""
    from kafka_avro_order_processing_spark.streaming.survival import (
        streaming_kaplan_meier,
    )

    rows = ([("6mp", t, e) for t, e in _FREIREICH]
            + [("placebo", t, e) for t, e in _PLACEBO])
    df = spark.createDataFrame(rows, "arm string, weeks double, relapse int")
    d = str(tmp_path / "churn")
    df.repartition(4).write.parquet(d)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        tuple(r)
        for r in streaming_kaplan_meier(
            stream, "weeks", "relapse", group_col="arm"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in kaplan_meier(
            spark.read.parquet(d), "weeks", "relapse", group_col="arm"
        ).collect()
    )
    assert got == want
    # ungrouped too
    stream2 = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got2 = sorted(
        tuple(r)
        for r in streaming_kaplan_meier(stream2, "weeks", "relapse").collect()
    )
    want2 = sorted(
        tuple(r)
        for r in kaplan_meier(
            spark.read.parquet(d), "weeks", "relapse"
        ).collect()
    )
    assert got2 == want2
