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


# ---------------------------------------------------------------- weighted

from kafka_avro_order_processing_spark.operators.conformal import (  # noqa: E402
    grouped_weighted_conformal_thresholds,
    weighted_conformal_coverage,
    weighted_conformal_threshold,
)

_WSB = 20
_MS = float(1 << _WSB)


def _py_weighted_qhat(pairs, w_test, alpha):
    """Pure-Python reference of the Tibshirani et al. 2019 weighted
    quantile: quantize weights exactly like the operator, then scan the
    score-sorted cumulative mass for the defining inequality."""
    import math as _m

    num = round(alpha * ALPHA_DEN)
    wq = [(s, int(_m.floor(w * _MS + 0.5))) for s, w in pairs]
    wtest_q = int(_m.floor(w_test * _MS + 0.5))
    total = sum(q for _, q in wq)
    need = (ALPHA_DEN - num) * (total + wtest_q)
    if total * ALPHA_DEN < need:
        return None
    cum = 0
    for s in sorted({s for s, _ in wq}):
        cum += sum(q for v, q in wq if v == s)
        if cum * ALPHA_DEN >= need:
            return s
    return None


def _weighted_events(spark):
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    return ev.select(
        F.col("value").cast("double").alias("s"),
        (F.lit(0.5) + (F.col("event_id") % 7).cast("double") * F.lit(0.25)
         ).alias("w"),
        (F.col("event_id") % 3).cast("string").alias("g"),
    )


def test_weighted_reduces_to_unweighted_with_unit_weights(spark):
    """The reduction law: w_i = w_test = 1 makes the weighted quantile
    EXACTLY the ceil((n+1)(1-alpha)) order statistic."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    wdf = ev.withColumn("w", F.lit(1.0))
    for alpha in (0.05, 0.1, 0.25, 0.5):
        want = conformal_threshold(ev, "value", alpha=alpha)
        got = weighted_conformal_threshold(wdf, "value", "w", 1.0, alpha)
        assert got["qhat"] == want["qhat"], alpha
        assert got["n"] == want["n"]
    # and repartitioning cannot move it
    got2 = weighted_conformal_threshold(
        wdf.repartition(7), "value", "w", 1.0, 0.1
    )
    assert got2["qhat"] == conformal_threshold(ev, "value", alpha=0.1)["qhat"]


def test_weighted_matches_python_reference(spark):
    rows = [
        (1.0, 0.5), (2.0, 3.0), (2.0, 0.25), (3.0, 1.0), (4.0, 2.0),
        (5.0, 0.75), (6.0, 1.5), (7.0, 0.5), (8.0, 4.0), (9.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "s double, w double")
    for alpha, wt in ((0.1, 1.0), (0.25, 2.5), (0.4, 0.5)):
        want = _py_weighted_qhat(rows, wt, alpha)
        if want is None:
            with pytest.raises(ValueError, match="infinity"):
                weighted_conformal_threshold(df, "s", "w", wt, alpha)
        else:
            got = weighted_conformal_threshold(df, "s", "w", wt, alpha)
            assert got["qhat"] == want, (alpha, wt)
    # on the real events frame too (varied weights, tie-dense scores)
    wdf = _weighted_events(spark)
    pairs = [(r["s"], r["w"]) for r in wdf.collect()]
    got = weighted_conformal_threshold(wdf, "s", "w", 1.0, 0.1)
    assert got["qhat"] == _py_weighted_qhat(pairs, 1.0, 0.1)


def test_weighted_threshold_duckdb_oracle(spark):
    """The full weighted quantile — quantization, tie-merge, cumulative
    mass, integer inequality — replicated in DuckDB SQL."""
    wdf = _weighted_events(spark)
    out = weighted_conformal_threshold(wdf, "s", "w", 1.0, 0.1)
    sdf = spark.createDataFrame(
        [(out["n"], out["qhat"], out["w_total_q"])],
        "n long, qhat double, w_total_q long",
    )
    num = 100000  # alpha = 0.1 in millionths
    wtest_q = 1 << _WSB
    sql = f"""
    WITH s AS (
      SELECT CAST(value AS DOUBLE) AS v,
             CAST(FLOOR((0.5 + (event_id % 7) * 0.25) * {_MS} + 0.5)
                  AS BIGINT) AS wq
      FROM events WHERE value IS NOT NULL),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(wq) AS BIGINT) AS tw FROM s),
    m AS (SELECT v, CAST(SUM(wq) AS BIGINT) AS gw FROM s GROUP BY v),
    c AS (SELECT v, CAST(SUM(gw) OVER (ORDER BY v) AS BIGINT) AS cw FROM m)
    SELECT t.n AS n, c.v AS qhat, t.tw AS w_total_q
    FROM c, t
    WHERE cw * {ALPHA_DEN} >= ({ALPHA_DEN} - {num}) * (t.tw + {wtest_q})
    ORDER BY c.v LIMIT 1
    """
    _assert_parity(sdf, sql)


def test_weighted_defining_inequality_and_minimality(spark):
    """qhat satisfies the quantile inequality with the +infinity mass
    in the denominator, and the distinct score just below it does NOT
    (minimality) — the operative ingredient of the coverage theorem,
    checked with exact integers."""
    import math as _m

    wdf = _weighted_events(spark)
    alpha, wt = 0.1, 1.5
    out = weighted_conformal_threshold(wdf, "s", "w", wt, alpha)
    pairs = [(r["s"], int(_m.floor(r["w"] * _MS + 0.5))) for r in wdf.collect()]
    total = sum(q for _, q in pairs)
    num = round(alpha * ALPHA_DEN)
    need = (ALPHA_DEN - num) * (total + out["w_test_q"])
    cum_at = sum(q for s, q in pairs if s <= out["qhat"])
    assert cum_at * ALPHA_DEN >= need
    below = [s for s, _ in pairs if s < out["qhat"]]
    if below:
        prev = max(below)
        cum_prev = sum(q for s, q in pairs if s <= prev)
        assert cum_prev * ALPHA_DEN < need
    # the weighted coverage audit sees at least 1 - alpha by the same
    # integers (cw/tw >= cw/(tw + wtest) >= 1 - alpha)
    cov = weighted_conformal_coverage(wdf, "s", "w", out["qhat"])
    assert cov["coverage"] >= 1 - alpha
    assert cov["w_covered"] <= cov["w_total"]


def test_grouped_weighted_matches_global_per_group(spark):
    from pyspark.sql import functions as F

    wdf = _weighted_events(spark)
    got = {
        r["g"]: r
        for r in grouped_weighted_conformal_thresholds(
            wdf, "s", "w", "g", w_test=1.0, alpha=0.2
        ).collect()
    }
    for gv in ("0", "1", "2"):
        sub = wdf.filter(F.col("g") == gv)
        want = weighted_conformal_threshold(sub, "s", "w", 1.0, 0.2)
        assert got[gv]["qhat"] == want["qhat"], gv
        assert got[gv]["n"] == want["n"]
        assert abs(got[gv]["w_total"] - want["w_total_q"] / _MS) < 1e-12


def test_grouped_weighted_insufficient_mass_is_null(spark):
    # g2's total mass 2.0 < (1-alpha)/alpha * w_test = 9 -> +infinity
    df = spark.createDataFrame(
        [("g1", float(v), 1.0) for v in range(1, 40)]
        + [("g2", 1.0, 1.0), ("g2", 2.0, 1.0)],
        "g string, s double, w double",
    )
    got = {
        r["g"]: r
        for r in grouped_weighted_conformal_thresholds(
            df, "s", "w", "g", w_test=1.0, alpha=0.1
        ).collect()
    }
    assert got["g2"]["qhat"] is None
    assert got["g1"]["qhat"] is not None
    # the global operator raises on the same frame restricted to g2
    with pytest.raises(ValueError, match="infinity"):
        weighted_conformal_threshold(
            df.filter("g = 'g2'"), "s", "w", 1.0, 0.1
        )


def test_weighted_validation(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0)], "s double, w double"
    )
    for bad_w in (0.0, -1.0, None, float("nan"), float(1 << 30)):
        bad = spark.createDataFrame([(1.0, bad_w)], "s double, w double")
        with pytest.raises(Exception, match="weight|NaN|NULL"):
            weighted_conformal_threshold(df.union(bad), "s", "w", 1.0, 0.5)
    with pytest.raises(Exception, match="NULL|NaN"):
        weighted_conformal_threshold(
            spark.createDataFrame([(None, 1.0)], "s double, w double"),
            "s", "w", 1.0, 0.5,
        )
    with pytest.raises(ValueError, match="w_test"):
        weighted_conformal_threshold(df, "s", "w", 0.0, 0.5)
    with pytest.raises(ValueError, match="w_test"):
        weighted_conformal_threshold(df, "s", "w", -2.0, 0.5)
    with pytest.raises(ValueError, match="empty"):
        weighted_conformal_threshold(df.filter("s > 99"), "s", "w", 1.0, 0.5)
    with pytest.raises(ValueError, match="scale_bits"):
        weighted_conformal_threshold(df, "s", "w", 1.0, 0.5, scale_bits=44)


def test_weighted_coverage_under_covariate_shift(spark):
    """A real tilted-target check: the target oversamples b=1 rows 3x.
    Calibrating with likelihood-ratio weights w = 1 + 2b and per-test
    w_test matching the test point's covariate keeps target coverage
    >= 1 - alpha (with split slack); UNWEIGHTED calibration on the
    same shifted data undercovers the b=1 stratum when scores shift
    with b."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    base = ev.select(
        F.col("event_id"),
        ((F.col("event_id") % 4) == 0).cast("int").alias("b"),
        (F.col("value").cast("double")
         + ((F.col("event_id") % 4) == 0).cast("double") * F.lit(50.0)
         ).alias("s"),
    )
    cal = base.filter(F.col("event_id") % 2 == 0).withColumn(
        "w", F.lit(1.0) + F.col("b").cast("double") * F.lit(2.0)
    )
    # target = odd rows, b=1 rows tripled (explode) — the 3x tilt
    test = (
        base.filter(F.col("event_id") % 2 == 1)
        .withColumn(
            "__r", F.expr("sequence(1, CASE WHEN b = 1 THEN 3 ELSE 1 END)")
        )
        .withColumn("__x", F.explode("__r"))
        .drop("__r", "__x"[:0])  # keep columns tidy; __x unused
    )
    alpha = 0.1
    n_t = test.count()
    covered = 0
    for b_val, wt in ((0, 1.0), (1, 3.0)):
        qh = weighted_conformal_threshold(cal, "s", "w", wt, alpha)["qhat"]
        sub = test.filter(F.col("b") == b_val)
        covered += sub.filter(F.col("s") <= F.lit(qh)).count()
    assert covered / n_t >= 1 - alpha - 0.03


def test_weighted_conformal_composes_with_dsir_weights(spark):
    """The covariate-shift weights come from the repo's own DSIR
    estimator (the HANDOFF composition): target = short documents,
    source = everything; likelihood ratios exp(dsir log-weight) feed
    the weighted threshold, and TARGET-distribution coverage meets
    1 - alpha where the unweighted source threshold undercovers."""
    from kafka_avro_order_processing_spark.operators.dsir import (
        dsir_features,
        dsir_fit,
        dsir_log_weights,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").filter(
        "text IS NOT NULL"
    ).select("doc_id", "text", F.length("text").alias("len"))
    # score correlates with the shifting covariate (length)
    docs = docs.withColumn("score", F.col("len").cast("double"))
    # calibration = even ids (source-distributed); target population =
    # odd ids RESTRICTED to short docs (a real distribution shift)
    cal = docs.filter("doc_id % 2 = 0")
    target = docs.filter("doc_id % 2 = 1 AND len < 400")
    target_sample = target  # what we want coverage on
    n_buckets = 512
    feats_target = dsir_features(target, n_buckets=n_buckets)
    feats_cal = dsir_features(cal, n_buckets=n_buckets)
    ratios = dsir_fit(feats_target, feats_cal, n_buckets=n_buckets)
    lw = dsir_log_weights(cal, feats_cal, ratios)
    wcal = cal.join(lw, "doc_id").select(
        "score", F.exp(F.col("log_weight")).alias("w")
    )
    # clip pathological ratios into the quantizer's mass range (the
    # standard practice for importance weights)
    wcal = wcal.select(
        "score",
        F.least(F.greatest(F.col("w"), F.lit(1e-3)), F.lit(1e3)).alias("w"),
    )
    alpha = 0.2
    qw = weighted_conformal_threshold(wcal, "score", "w", 1.0, alpha)["qhat"]
    qu = conformal_threshold(cal, "score", alpha=alpha)["qhat"]
    n_t = target_sample.count()
    cov_w = target_sample.filter(F.col("score") <= qw).count() / n_t
    cov_u = target_sample.filter(F.col("score") <= qu).count() / n_t
    # the weighted threshold adapts DOWN toward the short-doc target
    assert qw <= qu
    assert cov_w >= 1 - alpha - 0.05
    # and it is not trivially loose: it sits closer to the target's
    # own quantile than the unweighted one does
    q_ideal = conformal_threshold(target_sample, "score", alpha=alpha)["qhat"]
    assert abs(qw - q_ideal) <= abs(qu - q_ideal)


def test_k_of_equals_the_multiply_compare_idiom():
    """The r11 builder note: KLL's integer-threshold idiom
    (cw * b >= a  <=>  cw >= ceil(a / b), for integer cw) and
    conformal's explicit integer ceil-division must define the SAME
    k.  Pinned as a law across an n x alpha sweep so neither side can
    drift: _k_of(n, alpha) is exactly the MINIMAL integer rk with
    rk * ALPHA_DEN >= (n + 1) * (ALPHA_DEN - num)."""
    from kafka_avro_order_processing_spark.operators.conformal import (
        ALPHA_DEN,
        _alpha_num,
        _k_of,
    )

    for alpha in (0.5, 0.25, 0.2, 0.1, 0.05, 0.01, 0.001, 0.999,
                  0.123456, 0.904):
        num = _alpha_num(alpha)
        for n in (1, 2, 3, 9, 10, 19, 20, 99, 100, 10**6, 9 * 10**12):
            k = _k_of(n, alpha)
            t = (n + 1) * (ALPHA_DEN - num)
            assert k * ALPHA_DEN >= t, (n, alpha)
            assert (k - 1) * ALPHA_DEN < t, (n, alpha)
