"""Split conformal prediction (operators/conformal.py): exact order
statistics against a Python reference and DuckDB oracles on the real
events table, finite-sample coverage on held-out data, the Mondrian
grouped variant, boundary-exact k arithmetic, and loud rejection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.conformal import (
    ALPHA_DEN,
    _k_of,
    conformal_coverage,
    conformal_threshold,
    grouped_conformal_thresholds,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def test_k_is_boundary_exact():
    # ceil((n+1)(1-alpha)) with exact rationals: alpha=0.5, n=9 ->
    # ceil(5.0) = 5 (float form yields 5.000000000000001 -> 6)
    assert _k_of(9, 0.5) == 5
    assert _k_of(9, 0.1) == 9
    # alpha=0.05, n=19: ceil(20*0.95) = 19 exactly
    assert _k_of(19, 0.05) == 19
    # pure-python reference over a grid
    from fractions import Fraction

    for n in range(1, 200):
        for a in (0.01, 0.05, 0.1, 0.25, 0.5, 0.9):
            fa = Fraction(round(a * ALPHA_DEN), ALPHA_DEN)
            want = -((-(n + 1) * (1 - fa)) // 1)
            assert _k_of(n, a) == int(want), (n, a)


def test_threshold_matches_sorted_reference(spark):
    vals = [float(v) for v in [5, 1, 9, 3, 3, 7, 2, 8, 6, 4]]
    df = spark.createDataFrame([(v,) for v in vals], "s double")
    out = conformal_threshold(df, "s", alpha=0.2)
    srt = sorted(vals)
    assert out["k"] == _k_of(10, 0.2) == 9
    assert out["qhat"] == srt[out["k"] - 1] == 8.0
    assert out["n"] == 10
    # repartitioning cannot move an order statistic
    out2 = conformal_threshold(df.repartition(5), "s", alpha=0.2)
    assert out2 == out


def test_threshold_duckdb_oracle_on_events(spark):
    """qhat as a one-row frame vs the DuckDB k-th order statistic on
    the real value column."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    out = conformal_threshold(ev, "value", alpha=0.1)
    sdf = spark.createDataFrame(
        [(out["n"], out["k"], out["qhat"])], "n long, k long, qhat double"
    )
    sql = f"""
    WITH s AS (SELECT CAST(value AS DOUBLE) AS v FROM events
               WHERE value IS NOT NULL),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
    k AS (SELECT n,
                 CAST(((n + 1) * {ALPHA_DEN - 100000} + {ALPHA_DEN} - 1)
                      // {ALPHA_DEN} AS BIGINT) AS k
          FROM n),
    ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM s)
    SELECT k.n AS n, k.k AS k, r.v AS qhat
    FROM k JOIN ranked r ON r.rn = k.k
    """
    _assert_parity(sdf, sql)


def test_coverage_guarantee_on_split(spark):
    """Deterministic split of the events value column: empirical
    held-out coverage must be >= 1 - alpha (the finite-sample
    guarantee) and not wildly over."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    cal = ev.filter(F.col("event_id") % 2 == 0)
    test = ev.filter(F.col("event_id") % 2 == 1)
    alpha = 0.1
    out = conformal_threshold(cal, "value", alpha=alpha)
    cov = conformal_coverage(test, "value", out["qhat"])
    assert cov["coverage"] >= 1 - alpha - 0.02  # exchangeable-split slack
    assert cov["coverage"] <= 1.0
    assert cov["n_covered"] <= cov["n"]


def test_grouped_thresholds_match_global_per_group(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    got = {
        r["event_type"]: r
        for r in grouped_conformal_thresholds(
            ev, "value", "event_type", alpha=0.2
        ).collect()
    }
    for et in [r["event_type"] for r in ev.select("event_type").distinct().collect()]:
        sub = ev.filter(F.col("event_type") == et)
        want = conformal_threshold(sub, "value", alpha=0.2)
        assert got[et]["n"] == want["n"]
        assert got[et]["k"] == want["k"]
        assert got[et]["qhat"] == want["qhat"], et


def test_grouped_small_group_reports_null(spark):
    df = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g2", 5.0)] ,
        "g string, s double",
    )
    got = {
        r["g"]: r
        for r in grouped_conformal_thresholds(df, "s", "g", alpha=0.1).collect()
    }
    # g2: n=1, k = ceil(2*0.9) = 2 > 1 -> NULL qhat, not a weaker one
    assert got["g2"]["qhat"] is None and got["g2"]["k"] == 2
    # g1: n=2, k = ceil(3*0.9) = 3 > 2 -> NULL too
    assert got["g1"]["qhat"] is None
    big = spark.createDataFrame(
        [("g3", float(v)) for v in range(1, 30)], "g string, s double"
    )
    got3 = grouped_conformal_thresholds(big, "s", "g", alpha=0.1).collect()[0]
    assert got3["qhat"] == float(_k_of(29, 0.1))


def test_validation(spark):
    df = spark.createDataFrame([(1.0,)], "s double")
    for a in (0.0, 1.0, -0.1, 1e-9):
        with pytest.raises(ValueError, match="alpha"):
            conformal_threshold(df, "s", alpha=a)
    with pytest.raises(ValueError, match="<= n"):
        conformal_threshold(df, "s", alpha=0.1)  # k=2 > n=1
    withnull = spark.createDataFrame([(1.0,), (None,)], "s double")
    with pytest.raises(ValueError, match="NULL"):
        conformal_threshold(withnull, "s", alpha=0.5)
    with pytest.raises(ValueError, match="NULL"):
        conformal_coverage(withnull, "s", 1.0)
    with pytest.raises(Exception, match="NULL"):
        grouped_conformal_thresholds(
            withnull.withColumn("g", F.lit("x")), "s", "g", alpha=0.5
        ).collect()
    with pytest.raises(ValueError, match="empty"):
        conformal_threshold(df.filter("s > 99"), "s", alpha=0.5)
