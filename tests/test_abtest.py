"""CUPED A/B readouts (operators/abtest.py): per-arm stats against a
DuckDB oracle on the real events table, the full CUPED readout
against an exact Python replica, variance reduction on a planted
correlated covariate, bit-determinism under repartitioning, and the
loud-rejection contracts.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.abtest import (
    ab_arm_stats,
    cuped_ab_test,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

S = 1 << 20  # DEFAULT_SCALE_BITS


def _exp_frame(spark):
    """A deterministic 2-arm experiment on the events table: arm by
    user parity, metric = value, covariate = a pre-period proxy
    CORRELATED with the metric (value + deterministic hash noise) so
    CUPED has real variance to remove."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    return ev.select(
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treat")
        .alias("arm"),
        F.col("value").alias("y"),
        (
            F.col("value") * 0.8
            + (F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4),
                      16, 10).cast("double") / 65536.0 - 0.5) * 10.0
        ).alias("x"),
    )


def test_arm_stats_duckdb_oracle(spark):
    sdf = ab_arm_stats(_exp_frame(spark), "y", "arm")
    sql = f"""
    WITH e AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treat' END AS arm,
             CAST(floor(CAST(value AS DOUBLE) * {float(S)} + 0.5) AS BIGINT)
               AS y
      FROM events WHERE value IS NOT NULL
    ), mo AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
               AS syy
      FROM e GROUP BY arm
    )
    SELECT arm, n,
           CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * {float(S)}) AS mean,
           CASE WHEN n > 1 THEN
             CAST(n * syy - sy * sy AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                * {float(S)} * {float(S)})
           END AS var
    FROM mo
    """
    _assert_parity(sdf, sql)


def _replica(rows, scale_bits=20):
    """Independent Python replica of the two-pass CUPED pipeline on
    (arm, y, x) tuples — same quantization, exact-int moments, same
    fixed assembly order."""
    ms = float(1 << scale_bits)
    q = lambda v: math.floor(v * ms + 0.5)  # noqa: E731
    by: dict = {}
    for arm, y, x in rows:
        d = by.setdefault(arm, {"n": 0, "sy": 0, "syy": 0, "sx": 0,
                                "sxx": 0, "sxy": 0})
        yq, xq = q(y), q(x)
        d["n"] += 1
        d["sy"] += yq
        d["syy"] += yq * yq
        d["sx"] += xq
        d["sxx"] += xq * xq
        d["sxy"] += xq * yq
    arms = sorted(by)
    N = sum(by[a]["n"] for a in arms)
    Sx = sum(by[a]["sx"] for a in arms)
    Sy = sum(by[a]["sy"] for a in arms)
    Sxx = sum(by[a]["sxx"] for a in arms)
    Sxy = sum(by[a]["sxy"] for a in arms)
    theta = float(N * Sxy - Sx * Sy) / float(N * Sxx - Sx * Sx)
    adj: dict = {}
    for arm, y, x in rows:
        d = adj.setdefault(arm, {"n": 0, "sy": 0, "syy": 0})
        a = q(y) - math.floor(theta * float(q(x)) + 0.5)
        d["n"] += 1
        d["sy"] += a
        d["syy"] += a * a

    def mv(d):
        mean = float(d["sy"]) / (float(d["n"]) * ms)
        var = float(d["n"] * d["syy"] - d["sy"] * d["sy"]) / (
            float(d["n"]) * float(d["n"] - 1) * ms * ms
        )
        return mean, var

    out = {"theta": theta, "raw": {}, "cuped": {}}
    for a in arms:
        out["raw"][a] = mv(by[a])
        out["cuped"][a] = mv(adj[a])
    return arms, out


def test_cuped_matches_python_replica_exactly(spark):
    rows = [
        ("control", 10.5, 9.0), ("control", 12.25, 11.5),
        ("control", 8.0, 7.75), ("control", 11.0, 10.5),
        ("treat", 13.0, 9.5), ("treat", 11.75, 11.0),
        ("treat", 9.5, 8.0), ("treat", 14.0, 12.25),
    ]
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    got = cuped_ab_test(df, "y", "x", "arm")
    arms, want = _replica(rows)
    assert got["arms"] == arms
    assert got["theta"] == want["theta"]  # exact: same ints, same order
    for a in arms:
        assert got["raw"][a]["mean"] == want["raw"][a][0]
        assert got["raw"][a]["var"] == want["raw"][a][1]
        assert got["cuped"][a]["mean"] == want["cuped"][a][0]
        assert got["cuped"][a]["var"] == want["cuped"][a][1]
    # repartitioning cannot move a single bit
    got2 = cuped_ab_test(df.repartition(7), "y", "x", "arm")
    assert got2 == got


def test_cuped_reduces_variance_on_events(spark):
    out = cuped_ab_test(_exp_frame(spark), "y", "x", "arm")
    # x explains ~most of y's variance by construction
    assert out["var_reduction"] > 0.5
    # CUPED must not move the point estimate far (unbiased adjustment;
    # the planted experiment has no true effect, both diffs are small)
    assert abs(out["cuped"]["diff"]) <= abs(out["raw"]["diff"]) + 0.5
    # tighter se -> larger |z| per unit diff
    assert out["cuped"]["se"] < out["raw"]["se"]


def test_validation(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 2.0, 2.0), ("c", 3.0, 3.0)],
        "arm string, y double, x double",
    )
    with pytest.raises(ValueError, match="exactly 2 arms"):
        cuped_ab_test(df, "y", "x", "arm")
    const = spark.createDataFrame(
        [("a", 1.0, 5.0), ("a", 2.0, 5.0), ("b", 3.0, 5.0)],
        "arm string, y double, x double",
    )
    with pytest.raises(ValueError, match="zero variance"):
        cuped_ab_test(const, "y", "x", "arm")
    withnull = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", None, 2.0)],
        "arm string, y double, x double",
    )
    with pytest.raises(Exception, match="NULL"):
        cuped_ab_test(withnull, "y", "x", "arm")
    big = spark.createDataFrame(
        [("a", float(1 << 30), 1.0), ("b", 2.0, 2.0)],
        "arm string, y double, x double",
    )
    with pytest.raises(Exception, match="headroom"):
        cuped_ab_test(big, "y", "x", "arm")
    with pytest.raises(ValueError, match="scale_bits"):
        ab_arm_stats(df, "y", "arm", scale_bits=50)
    # ab_arm_stats is lazy: NULL rejection fires at action (in-plan)
    lazy = ab_arm_stats(withnull, "y", "arm")
    with pytest.raises(Exception, match="NULL"):
        lazy.collect()


def test_streaming_arm_stats_bit_match_batch(spark, tmp_path):
    """The moments are associative integer sums, so the drained
    streaming readout must BIT-match batch on the same rows — single
    and multi micro-batch."""
    from kafka_avro_order_processing_spark.operators.abtest import (
        streaming_ab_arm_stats,
    )

    df = _exp_frame(spark).select("arm", "y")
    d = str(tmp_path / "exp")
    # three files -> three micro-batches with maxFilesPerTrigger=1
    df.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    want = sorted(
        tuple(r) for r in ab_arm_stats(spark.read.parquet(d), "y", "arm").collect()
    )
    got = sorted(
        tuple(r) for r in streaming_ab_arm_stats(stream, "y", "arm").collect()
    )
    assert got == want


def test_moments_exact_at_documented_magnitude_bound(spark):
    """Regression (int64-wrap class): |v| just under the documented
    2^(44 - scale_bits) bound must aggregate EXACTLY — the moment
    products multiply in DECIMAL, so y_q * y_q (up to 2^88) never
    touches a long.  Before the fix this crashed with ANSI
    ARITHMETIC_OVERFLOW at 2^43 * 2^43."""
    big = float(1 << 23)  # scale_bits=20 -> y_q = 2^43
    df = spark.createDataFrame(
        [("a", big), ("a", big), ("b", 1.0), ("b", 3.0)],
        "arm string, v double",
    )
    got = {r["arm"]: r for r in ab_arm_stats(df, "v", "arm").collect()}
    assert got["a"]["mean"] == big and got["a"]["var"] == 0.0
    assert got["b"]["mean"] == 2.0 and got["b"]["var"] == 2.0
    # CUPED end-to-end at the same magnitudes (covariate near the bound)
    df2 = spark.createDataFrame(
        [("a", big, big - 1.0), ("a", 2.0, 3.0), ("a", 5.0, 4.0),
         ("b", 1.0, 2.0), ("b", 2.0, 1.0), ("b", 7.0, 6.0)],
        "arm string, y double, x double",
    )
    res = cuped_ab_test(df2, "y", "x", "arm")
    assert math.isfinite(res["theta"]) and math.isfinite(res["cuped"]["z"])
    # and the bound itself still rejects loudly one step further out
    over = spark.createDataFrame(
        [("a", float(1 << 24)), ("b", 1.0)], "arm string, v double"
    )
    with pytest.raises(Exception, match="headroom"):
        ab_arm_stats(over, "v", "arm").collect()


# ------------------------------------------------------- multi-covariate

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    cuped_ab_test_multi,
)


def _multi_frame(spark):
    """Planted frame: y = 2*x1 + 3*x2 + structured residual + arm
    effect, covariates deterministic from event_id — both covariates
    carry real signal, so the OLS adjustment must beat either alone."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    return ev.select(
        F.when(F.col("event_id") % 2 == 0, "control")
        .otherwise("treat").alias("arm"),
        ((F.col("event_id") % 13)).cast("double").alias("x1"),
        ((F.col("event_id") % 7)).cast("double").alias("x2"),
        (
            F.lit(2.0) * (F.col("event_id") % 13).cast("double")
            + F.lit(3.0) * (F.col("event_id") % 7).cast("double")
            + (F.col("value") % 5).cast("double")
            + F.when(F.col("event_id") % 2 == 0, 0.0).otherwise(0.25)
        ).alias("y"),
    )


def test_multi_reduces_to_single_at_d1(spark):
    df = _multi_frame(spark)
    single = cuped_ab_test(df, "y", "x1", "arm")
    multi = cuped_ab_test_multi(df, "y", ["x1"], "arm")
    assert multi["theta"][0] == single["theta"]
    for k in ("control", "treat", "diff", "se", "z"):
        assert multi["cuped"][k] == single["cuped"][k], k
        assert multi["raw"][k] == single["raw"][k], k
    assert multi["var_reduction"] == single["var_reduction"]


def test_multi_matches_python_replica_exactly(spark):
    """Full bigint replica: quantize rows in Python, assemble the
    centered Gram as exact ints, solve with the same numpy call —
    theta and both readouts must agree EXACTLY."""
    import math as _m

    import numpy as np

    df = _multi_frame(spark)
    sb = 20
    ms = float(1 << sb)
    rows = df.collect()
    arms = sorted({r["arm"] for r in rows})
    d = 2

    def q(v):
        return int(_m.floor(v * ms + 0.5))

    N = len(rows)
    ys = [q(r["y"]) for r in rows]
    xs = [[q(r["x1"]), q(r["x2"])] for r in rows]
    Sy = sum(ys)
    Sx = [sum(x[j] for x in xs) for j in range(d)]
    Sxy = [sum(x[j] * y for x, y in zip(xs, ys)) for j in range(d)]
    A = [[N * sum(x[j] * x[k] for x in xs) - Sx[j] * Sx[k]
          for k in range(d)] for j in range(d)]
    b = [N * Sxy[j] - Sx[j] * Sy for j in range(d)]
    theta = np.linalg.solve(
        np.array(A, dtype=np.float64), np.array(b, dtype=np.float64)
    )
    got = cuped_ab_test_multi(df, "y", ["x1", "x2"], "arm", scale_bits=sb)
    assert got["theta"] == [float(t) for t in theta]
    # replica of the adjusted per-arm means
    for ai, arm in enumerate(arms):
        sel = [
            (y, x) for y, x, r in zip(ys, xs, rows) if r["arm"] == arm
        ]
        adj = [
            y - _m.floor(0.0 + float(theta[0]) * x[0]
                         + float(theta[1]) * x[1] + 0.5)
            for y, x in sel
        ]
        n = len(adj)
        mean = float(sum(adj)) / (float(n) * ms)
        assert got["cuped"][arm]["mean"] == mean, arm
    # and the whole dict is repartition-bit-identical
    again = cuped_ab_test_multi(
        df.repartition(13), "y", ["x1", "x2"], "arm", scale_bits=sb
    )
    assert again == got


def test_multi_beats_single_on_planted_signal(spark):
    df = _multi_frame(spark)
    multi = cuped_ab_test_multi(df, "y", ["x1", "x2"], "arm")
    s1 = cuped_ab_test(df, "y", "x1", "arm")
    s2 = cuped_ab_test(df, "y", "x2", "arm")
    assert multi["var_reduction"] > max(s1["var_reduction"],
                                        s2["var_reduction"])
    assert multi["var_reduction"] > 0.9  # y is mostly x1/x2-explained
    assert abs(multi["theta"][0] - 2.0) < 0.2
    assert abs(multi["theta"][1] - 3.0) < 0.2
    # the planted 0.25 arm effect survives adjustment (unbiasedness)
    assert abs(multi["cuped"]["diff"] - multi["raw"]["diff"]) < 0.2


def test_multi_validation(spark):
    df = _multi_frame(spark)
    with pytest.raises(ValueError, match="1..16"):
        cuped_ab_test_multi(df, "y", [], "arm")
    with pytest.raises(ValueError, match="distinct"):
        cuped_ab_test_multi(df, "y", ["x1", "x1"], "arm")
    with pytest.raises(ValueError, match="distinct"):
        cuped_ab_test_multi(df, "y", ["y"], "arm")
    # collinear: x3 = 2*x1 exactly
    dd = df.withColumn("x3", F.col("x1") * 2.0)
    with pytest.raises(ValueError, match="collinear"):
        cuped_ab_test_multi(dd, "y", ["x1", "x3"], "arm")
    # constant covariate
    dc = df.withColumn("c", F.lit(5.0))
    with pytest.raises(ValueError, match="zero variance"):
        cuped_ab_test_multi(dc, "y", ["x1", "c"], "arm")


# ------------------------------------------------ always-valid inference

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    always_valid_pvalues,
    msprt_ab_test,
)


def _timed_frame(spark, effect=0.0):
    """Deterministic two-arm frame with a time bucket (event day) and
    an optional planted effect on the treat arm."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    return ev.select(
        F.when(F.col("event_id") % 2 == 0, "control")
        .otherwise("treat").alias("arm"),
        (F.col("event_id") % 10).cast("long").alias("bucket"),
        (
            (F.col("value") % 7).cast("double")
            + F.when(F.col("event_id") % 2 == 0, 0.0).otherwise(float(effect))
        ).alias("y"),
    )


def test_always_valid_matches_python_replica(spark):
    """Replica from quantized integers: cumulative moments, the exact
    mean/var/diff expressions, Lambda via math.exp — diff/se exact,
    lam/p at libm tolerance (the lm.py convention)."""
    import math as _m

    sb = 20
    ms = float(1 << sb)
    tau = 0.7
    df = _timed_frame(spark, effect=0.4)
    got = always_valid_pvalues(df, "y", "arm", "bucket", tau=tau).collect()
    rows = df.collect()
    buckets = sorted({r["bucket"] for r in rows})
    cum = {a: [0, 0, 0] for a in ("control", "treat")}
    p_run = 1.0
    by_bucket = {}
    for bk in buckets:
        for r in rows:
            if r["bucket"] != bk:
                continue
            q = int(_m.floor(r["y"] * ms + 0.5))
            c = cum[r["arm"]]
            c[0] += 1
            c[1] += q
            c[2] += q * q
        (na, sya, syya), (nb, syb, syyb) = cum["control"], cum["treat"]
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
            v = va / na + vb / nb
            lam = _m.sqrt(v / (v + tau * tau)) * _m.exp(
                tau * tau * diff * diff / (2.0 * v * (v + tau * tau))
            )
            p_run = min(p_run, min(1.0, 1.0 / lam))
            by_bucket[bk] = (diff, _m.sqrt(v), lam, p_run)
        else:
            by_bucket[bk] = (None, None, None, p_run)
    assert len(got) == len(buckets)
    for r in got:
        diff, se, lam, p = by_bucket[r["bucket"]]
        if diff is None:
            assert r["diff"] is None and r["p_always"] == 1.0
            continue
        assert r["diff"] == diff, r["bucket"]          # exact: no libm
        assert r["se"] == se, r["bucket"]              # sqrt is IEEE-exact
        assert abs(r["lam"] - lam) <= 1e-12 * abs(lam)  # exp: libm tolerance
        assert abs(r["p_always"] - p) <= 1e-12


def test_always_valid_laws(spark):
    df = _timed_frame(spark, effect=1.5)
    out = sorted(
        always_valid_pvalues(df, "y", "arm", "bucket", tau=1.0).collect(),
        key=lambda r: r["bucket"],
    )
    ps = [r["p_always"] for r in out]
    # monotone non-increasing, in [0, 1]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    # a 1.5-sigma-ish planted effect on this much data is detected
    assert ps[-1] < 0.01
    # bit-identical under repartitioning
    again = sorted(
        always_valid_pvalues(
            df.repartition(11), "y", "arm", "bucket", tau=1.0
        ).collect(),
        key=lambda r: r["bucket"],
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_always_valid_null_effect_keeps_p_at_one(spark):
    """Symmetric arms (identical value multisets per bucket) -> diff
    is EXACTLY 0 at every look -> Lambda < 1 -> p stays 1.0."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    base = ev.select(
        (F.col("event_id") % 10).cast("long").alias("bucket"),
        (F.col("value") % 7).cast("double").alias("y"),
    )
    both = base.withColumn("arm", F.lit("control")).union(
        base.withColumn("arm", F.lit("treat"))
    )
    out = always_valid_pvalues(both, "y", "arm", "bucket", tau=1.0).collect()
    assert all(r["p_always"] == 1.0 for r in out)
    assert all(r["diff"] == 0.0 for r in out if r["diff"] is not None)


def test_msprt_scalar_equals_final_single_bucket_look(spark):
    df = _timed_frame(spark, effect=0.8).withColumn("one", F.lit(1))
    scalar = msprt_ab_test(df, "y", "arm", tau=0.5)
    table = always_valid_pvalues(df, "y", "arm", "one", tau=0.5).collect()
    assert len(table) == 1
    r = table[0]
    assert r["diff"] == scalar["diff"]
    assert r["se"] == scalar["se"]
    assert abs(r["lam"] - scalar["lambda"]) <= 1e-12 * scalar["lambda"]
    assert abs(r["p_always"] - scalar["p_always"]) <= 1e-12


def test_always_valid_integer_columns_duckdb_oracle(spark):
    """The libm-free columns — bucket, cumulative n per arm, diff, se
    — replicated exactly in DuckDB (divisions and sqrt are correctly
    rounded IEEE ops; only exp crosses libm and is excluded)."""
    df = _timed_frame(spark, effect=0.4)
    sdf = always_valid_pvalues(df, "y", "arm", "bucket", tau=1.0).select(
        "bucket", "n_a", "n_b", "diff", "se"
    )
    ms = float(1 << 20)
    sql = f"""
    WITH r AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'control' ELSE 'treat' END
               AS arm,
             CAST(event_id % 10 AS BIGINT) AS bucket,
             CAST(FLOOR(((value % 7) +
                    CASE WHEN event_id % 2 = 0 THEN 0.0 ELSE 0.4 END)
                  * {ms} + 0.5) AS BIGINT) AS q
      FROM events WHERE value IS NOT NULL
    ), per AS (
      SELECT arm, bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sy,
             CAST(SUM(q * q) AS BIGINT) AS syy
      FROM r GROUP BY arm, bucket
    ), pv AS (
      SELECT bucket,
        SUM(CASE WHEN arm = 'control' THEN n ELSE 0 END) AS dna,
        SUM(CASE WHEN arm = 'control' THEN sy ELSE 0 END) AS dsya,
        SUM(CASE WHEN arm = 'control' THEN syy ELSE 0 END) AS dsyya,
        SUM(CASE WHEN arm = 'treat' THEN n ELSE 0 END) AS dnb,
        SUM(CASE WHEN arm = 'treat' THEN sy ELSE 0 END) AS dsyb,
        SUM(CASE WHEN arm = 'treat' THEN syy ELSE 0 END) AS dsyyb
      FROM per GROUP BY bucket
    ), c AS (
      SELECT bucket,
        CAST(SUM(dna) OVER w AS BIGINT) AS n_a,
        CAST(SUM(dsya) OVER w AS BIGINT) AS sy_a,
        CAST(SUM(dsyya) OVER w AS BIGINT) AS syy_a,
        CAST(SUM(dnb) OVER w AS BIGINT) AS n_b,
        CAST(SUM(dsyb) OVER w AS BIGINT) AS sy_b,
        CAST(SUM(dsyyb) OVER w AS BIGINT) AS syy_b
      FROM pv WINDOW w AS (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT bucket, n_a, n_b,
      CASE WHEN n_a >= 2 AND n_b >= 2 THEN
        CAST(sy_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * {ms})
        - CAST(sy_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * {ms})
      END AS diff,
      CASE WHEN n_a >= 2 AND n_b >= 2 THEN
        SQRT(
          CAST(CAST(n_a AS HUGEINT) * syy_a - CAST(sy_a AS HUGEINT) * sy_a AS DOUBLE)
            / (CAST(n_a AS DOUBLE) * CAST(n_a - 1 AS DOUBLE) * ({ms} * {ms}))
            / CAST(n_a AS DOUBLE)
          + CAST(CAST(n_b AS HUGEINT) * syy_b - CAST(sy_b AS HUGEINT) * sy_b AS DOUBLE)
            / (CAST(n_b AS DOUBLE) * CAST(n_b - 1 AS DOUBLE) * ({ms} * {ms}))
            / CAST(n_b AS DOUBLE)
        )
      END AS se
    FROM c
    """
    _assert_parity(sdf, sql)


def test_msprt_validation(spark):
    df = _timed_frame(spark)
    with pytest.raises(ValueError, match="tau"):
        msprt_ab_test(df, "y", "arm", tau=0.0)
    with pytest.raises(ValueError, match="tau"):
        always_valid_pvalues(df, "y", "arm", "bucket", tau=-1.0)
    three = _timed_frame(spark).withColumn(
        "arm3",
        F.concat(F.lit("arm"), (F.col("bucket") % 3).cast("string")),
    )
    assert three.select("arm3").distinct().count() == 3
    with pytest.raises(ValueError, match="exactly 2 arms"):
        always_valid_pvalues(three, "y", "arm3", "bucket")
    tiny = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "arm string, y double"
    )
    with pytest.raises(ValueError, match="n >= 2"):
        msprt_ab_test(tiny, "y", "arm")


def test_streaming_always_valid_looks(spark, tmp_path):
    """Every micro-batch is a look: with maxFilesPerTrigger=1 over k
    files the trajectory has one row per epoch, p is monotone, and the
    FINAL look's cumulative readout equals the batch msprt scalar
    exactly (integer moments cannot be moved by batch boundaries)."""
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_always_valid_pvalues,
    )

    df = _timed_frame(spark, effect=1.5).select("arm", "y")
    d = str(tmp_path / "exp")
    df.repartition(4).write.parquet(d)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = sorted(
        streaming_always_valid_pvalues(stream, "y", "arm", tau=1.0).collect(),
        key=lambda r: r["look"],
    )
    assert len(out) >= 2  # multiple looks actually happened
    ps = [r["p_always"] for r in out]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(x >= y for x, y in zip(ps, ps[1:]))
    scalar = msprt_ab_test(spark.read.parquet(d), "y", "arm", tau=1.0)
    last = out[-1]
    assert last["n_a"] == scalar["n"]["control"]
    assert last["n_b"] == scalar["n"]["treat"]
    assert last["diff"] == scalar["diff"]
    assert last["se"] == scalar["se"]
    assert abs(last["lam"] - scalar["lambda"]) <= 1e-12 * scalar["lambda"]
    assert abs(last["p_always"] - scalar["p_always"]) <= 1e-12
    # the planted effect is detected by the final look
    assert last["p_always"] < 0.01


def test_always_valid_beyond_r12_decimal_headroom(spark):
    """The r13 wider contract (r12 verdict task 3): the trajectory is
    assembled driver-side from Python-int moments, so cumulative n is
    bounded only by the module-level moment-sum headroom.  This frame
    — 1e6 rows per arm at scale_bits=43 with y in [1, 2) — puts the
    final look's sy ~ 1.3e19 per arm, so the RETIRED in-plan
    sy*sy decimal product (~1.7e38 > 10^38) would have overflowed
    decimal(38,0); the driver-side path must score it exactly,
    matching msprt_ab_test's never-overflowing _mean_var assembly on
    the final look."""
    from kafka_avro_order_processing_spark.operators.abtest import (
        always_valid_pvalues as avp,
    )

    sb = 43
    df = spark.range(2_000_000).select(
        F.when(F.col("id") % 2 == 0, "control").otherwise("treat")
        .alias("arm"),
        (F.col("id") % 4).cast("long").alias("bucket"),
        (1.0 + (F.col("id") % 1000).cast("double") / 1000.0).alias("y"),
    )
    out = sorted(
        avp(df, "y", "arm", "bucket", tau=1.0, scale_bits=sb).collect(),
        key=lambda r: r["bucket"],
    )
    assert len(out) == 4
    last = out[-1]
    assert last["n_a"] == last["n_b"] == 1_000_000
    # sanity: the final-look moments really exceed the old cap —
    # mean(y) ~ 1.4995, so sy ~ 1.4995 * 2^43 * 1e6 and sy^2 ~ 1.7e38
    ms = float(1 << sb)
    assert (last["n_a"] * (1.4 * ms)) ** 2 > 1e38
    ps = [r["p_always"] for r in out]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(x >= y for x, y in zip(ps, ps[1:]))
    scalar = msprt_ab_test(df, "y", "arm", tau=1.0, scale_bits=sb)
    assert last["diff"] == scalar["diff"]
    assert last["se"] == scalar["se"]
    assert abs(last["lam"] - scalar["lambda"]) <= 1e-12 * abs(
        scalar["lambda"]
    )
    assert abs(last["p_always"] - scalar["p_always"]) <= 1e-12


def test_minimum_detectable_effect(spark):
    from statistics import NormalDist

    from kafka_avro_order_processing_spark.operators.abtest import (
        minimum_detectable_effect,
    )

    df = _exp_frame(spark).select("arm", "y")
    out = minimum_detectable_effect(df, "y", "arm", alpha=0.05, power=0.8)
    # stdlib quantiles at the textbook values
    assert abs(out["z_alpha"] - 1.959963984540054) < 1e-12
    assert abs(out["z_power"] - 0.8416212335729143) < 1e-12
    # closed form from ab_arm_stats
    st = {r["arm"]: r for r in ab_arm_stats(df, "y", "arm").collect()}
    se = math.sqrt(
        st["control"]["var"] / st["control"]["n"]
        + st["treat"]["var"] / st["treat"]["n"]
    )
    assert out["se"] == se
    assert out["mde"] == (out["z_alpha"] + out["z_power"]) * se
    # sizing: the needed n shrinks the pooled MDE to the target
    tgt = out["mde"] / 2.0
    out2 = minimum_detectable_effect(
        df, "y", "arm", alpha=0.05, power=0.8, target_mde=tgt
    )
    n_need = out2["n_per_arm_needed"]
    want = math.ceil(
        (out["z_alpha"] + out["z_power"]) ** 2
        * (st["control"]["var"] + st["treat"]["var"]) / tgt**2
    )
    assert n_need == want
    # halving the MDE costs ~4x the traffic
    assert 3.5 * st["control"]["n"] < n_need < 4.5 * st["control"]["n"]
    for bad in ({"alpha": 0.0}, {"power": 1.0}, {"target_mde": -1.0}):
        with pytest.raises(ValueError):
            minimum_detectable_effect(df, "y", "arm", **bad)


# ------------------------------------------------------- ratio metrics

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    ratio_metric_ab_test,
)


def _ratio_frame(spark):
    """Event-level frame randomized by user: numerator = value-derived
    'clicks', denominator = 1 per event (so the ratio is clicks per
    event), users carry multiple events (real clustering)."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    return ev.select(
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("treat").alias("arm"),
        F.col("user_id").alias("unit"),
        (F.col("value") % 3).cast("double").alias("num"),
        F.lit(1.0).alias("den"),
    )


def test_ratio_metric_matches_python_replica(spark):
    import math as _m

    sb = 20
    ms = float(1 << sb)
    df = _ratio_frame(spark)
    got = ratio_metric_ab_test(df, "num", "den", "unit", "arm", scale_bits=sb)
    per: dict = {}
    for r in df.collect():
        key = (r["arm"], r["unit"])
        y, n = per.get(key, (0, 0))
        per[key] = (y + int(_m.floor(r["num"] * ms + 0.5)),
                    n + int(_m.floor(r["den"] * ms + 0.5)))
    for arm in got["arms"]:
        units = [(y, n) for (a, _), (y, n) in per.items() if a == arm]
        m = len(units)
        sy = sum(y for y, _ in units)
        sn = sum(n for _, n in units)
        syy = sum(y * y for y, _ in units)
        snn = sum(n * n for _, n in units)
        syn = sum(y * n for y, n in units)
        from fractions import Fraction

        R = Fraction(sy, sn)
        mm1 = m * (m - 1)
        f_var_ratio = (
            (Fraction(m * syy - sy * sy, mm1)
             - 2 * R * Fraction(m * syn - sy * sn, mm1)
             + R * R * Fraction(m * snn - sn * sn, mm1))
            / (m * Fraction(sn, m) ** 2)
        )
        assert got["per_arm"][arm]["n_units"] == m
        assert got["per_arm"][arm]["ratio"] == float(R)
        assert got["per_arm"][arm]["var_ratio"] == float(f_var_ratio)
    # bit-identical under repartitioning
    again = ratio_metric_ab_test(
        df.repartition(13), "num", "den", "unit", "arm", scale_bits=sb
    )
    assert again == got


def test_ratio_metric_cluster_invariance(spark):
    """Duplicating every unit's rows k times changes NOTHING — the
    per-unit sums scale by k and the delta-method variance is
    homogeneous of degree zero in that scaling.  (A naive row-level
    variance would shrink by ~k — the bug clustered SEs exist to
    fix.)"""
    df = _ratio_frame(spark)
    base = ratio_metric_ab_test(df, "num", "den", "unit", "arm")
    tripled = df.union(df).union(df)
    got = ratio_metric_ab_test(tripled, "num", "den", "unit", "arm")
    for arm in base["arms"]:
        assert got["per_arm"][arm]["ratio"] == base["per_arm"][arm]["ratio"]
        assert (got["per_arm"][arm]["var_ratio"]
                == base["per_arm"][arm]["var_ratio"])
        assert got["per_arm"][arm]["n_units"] == base["per_arm"][arm]["n_units"]
    assert got["se"] == base["se"] and got["z"] == base["z"]
    # while the row-level (wrong) variance WOULD shrink: ab_arm_stats
    # on the tripled frame reports ~1/3 the var of the base frame
    v1 = {r["arm"]: r["var"] for r in ab_arm_stats(df, "num", "arm").collect()}
    v3 = {r["arm"]: r["var"]
          for r in ab_arm_stats(tripled, "num", "arm").collect()}
    for arm in v1:
        assert v3[arm] < v1[arm] * 1.01  # naive var does not grow...
    n1 = {r["arm"]: r["n"] for r in ab_arm_stats(df, "num", "arm").collect()}
    n3 = {r["arm"]: r["n"]
          for r in ab_arm_stats(tripled, "num", "arm").collect()}
    assert all(n3[a] == 3 * n1[a] for a in n1)  # so its se shrinks ~sqrt(3)


def test_ratio_metric_validation(spark):
    df = _ratio_frame(spark)
    # a unit in both arms is a randomization bug
    flipped = df.union(
        df.limit(1).withColumn(
            "arm", F.when(F.col("arm") == "treat", "control")
            .otherwise("treat")
        )
    )
    with pytest.raises(ValueError, match="more than one arm"):
        ratio_metric_ab_test(flipped, "num", "den", "unit", "arm")
    with pytest.raises(Exception, match="NULL"):
        ratio_metric_ab_test(
            df.withColumn("unit", F.when(F.col("num") < 1.0, F.col("unit"))),
            "num", "den", "unit", "arm",
        )
    with pytest.raises(ValueError, match="scale_bits"):
        ratio_metric_ab_test(df, "num", "den", "unit", "arm", scale_bits=0)


# ----------------------------------------------------------- rank tests

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    mann_whitney_u,
)


def _mwu_replica(pairs):
    """Brute-force pairwise U for arm b, with exact Fraction moments."""
    from fractions import Fraction

    xs = [v for a, v in pairs if a == "a"]
    ys = [v for a, v in pairs if a == "b"]
    two_u = sum(
        2 if y > x else (1 if y == x else 0) for y in ys for x in xs
    )
    n1, n2 = len(xs), len(ys)
    n = n1 + n2
    from collections import Counter

    t = Counter(v for _, v in pairs)
    ties = sum(c**3 - c for c in t.values())
    mu = Fraction(n1 * n2, 2)
    var = Fraction(n1 * n2, 12) * (Fraction(n + 1) - Fraction(ties, n * (n - 1)))
    return two_u, ties, mu, var


def test_mann_whitney_matches_brute_force(spark):
    pairs = [("a", float(v)) for v in (1, 2, 2, 3, 5, 7, 7, 7, 9)] + [
        ("b", float(v)) for v in (2, 4, 4, 6, 7, 8, 10, 10)
    ]
    df = spark.createDataFrame(pairs, "arm string, y double")
    out = mann_whitney_u(df, "y", "arm")
    two_u, ties, mu, var = _mwu_replica(pairs)
    assert out["two_u"] == two_u
    assert out["tie_term"] == ties
    assert out["mu"] == float(mu)
    assert out["sigma"] == math.sqrt(float(var))
    # z replica with continuity correction
    from fractions import Fraction

    diff = Fraction(two_u, 2) - mu
    cc = Fraction(1, 2) if diff > 0 else (Fraction(-1, 2) if diff < 0 else 0)
    want_z = float(diff - cc) / math.sqrt(float(var))
    assert out["z"] == want_z
    assert out["p"] == math.erfc(abs(want_z) / math.sqrt(2.0))
    # repartition-invariant
    assert mann_whitney_u(df.repartition(5), "y", "arm") == out


def test_mann_whitney_laws(spark):
    # identical multisets -> U = mu exactly -> z = 0, p = 1
    vals = [float(v) for v in (1, 3, 3, 5, 8, 8, 9)]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    out = mann_whitney_u(
        spark.createDataFrame(rows, "arm string, y double"), "y", "arm"
    )
    assert out["u"] == out["mu"] and out["z"] == 0.0 and out["p"] == 1.0
    # a planted location shift on the real events table is detected
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        ((F.col("value") % 13)
         + F.when(F.col("event_id") % 2 == 0, 0.0).otherwise(1.0)
         ).alias("y"),
    )
    shifted = mann_whitney_u(df, "y", "arm")
    assert shifted["z"] > 0 and shifted["p"] < 1e-4
    # degenerate: every value identical -> NaN test, not a crash
    const = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 2.0)], "arm string, y double"
    )
    res = const and mann_whitney_u(const, "y", "arm")
    assert math.isnan(res["z"]) and res["sigma"] == 0.0
    with pytest.raises(Exception, match="NULL|NaN"):
        mann_whitney_u(
            spark.createDataFrame([("a", None), ("b", 1.0)],
                                  "arm string, y double"),
            "y", "arm",
        )


def test_mann_whitney_integer_statistics_duckdb_oracle(spark):
    """two_u and tie_term are exact integers — full hash oracle."""
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 13).cast("double").alias("y"),
    )
    out = mann_whitney_u(df, "y", "arm")
    sdf = spark.createDataFrame(
        [(out["n"]["a"], out["n"]["b"], out["two_u"], out["tie_term"])],
        "n1 long, n2 long, two_u long, tie_term long",
    )
    sql = """
    WITH r AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
             CAST(value % 13 AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ), cells AS (
      SELECT v,
             CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM r GROUP BY v
    ), c AS (
      SELECT v, c1, c2,
             CAST(SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c1
               AS BIGINT) AS cum1
      FROM cells
    )
    SELECT CAST(SUM(c1) AS BIGINT) AS n1,
           CAST(SUM(c2) AS BIGINT) AS n2,
           CAST(SUM(2 * c2 * cum1 + c2 * c1) AS BIGINT) AS two_u,
           CAST(SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
                AS BIGINT) AS tie_term
    FROM c
    """
    _assert_parity(sdf, sql)


from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    kruskal_wallis,
)


def test_kruskal_wallis_matches_replica_and_mwu_identity(spark):
    from collections import Counter
    from fractions import Fraction

    pairs = [("a", float(v)) for v in (1, 2, 2, 3, 5, 7, 7, 7, 9)] + [
        ("b", float(v)) for v in (2, 4, 4, 6, 7, 8, 10, 10)
    ]
    df = spark.createDataFrame(pairs, "arm string, y double")
    kw = kruskal_wallis(df, "y", "arm")
    # replica: average ranks, exact Fractions
    allv = sorted(v for _, v in pairs)
    t = Counter(allv)
    start = {}
    c = 0
    for v in sorted(t):
        start[v] = c
        c += t[v]
    avg_rank = {v: Fraction(2 * start[v] + t[v] + 1, 2) for v in t}
    n = len(pairs)
    groups = sorted({g for g, _ in pairs})
    H = Fraction(12, n * (n + 1)) * sum(
        (sum(avg_rank[v] for g2, v in pairs if g2 == g)) ** 2
        / Fraction(sum(1 for g2, _ in pairs if g2 == g))
        for g in groups
    ) - 3 * (n + 1)
    ties = sum(cc**3 - cc for cc in t.values())
    Hc = H / (1 - Fraction(ties, n**3 - n))
    assert kw["h"] == float(H)
    assert kw["h_tie_corrected"] == float(Hc)
    assert kw["tie_term"] == ties
    # k=2 law: H' equals the UNCORRECTED MWU z^2 exactly (Fractions)
    mwu = mann_whitney_u(df, "y", "arm")
    n1, n2 = mwu["n"]["a"], mwu["n"]["b"]
    diff = Fraction(mwu["two_u"], 2) - Fraction(n1 * n2, 2)
    var = Fraction(n1 * n2, 12) * (
        Fraction(n + 1) - Fraction(mwu["tie_term"], n * (n - 1))
    )
    assert kw["h_tie_corrected"] == float(diff * diff / var)
    # repartition-invariant
    assert kruskal_wallis(df.repartition(7), "y", "arm") == kw


def test_kruskal_wallis_laws(spark):
    # identical multisets in 3 equal groups -> H == 0, p == 1
    vals = [float(v) for v in (1, 4, 4, 6, 9)]
    rows = [(g, v) for g in ("x", "y", "z") for v in vals]
    kw = kruskal_wallis(
        spark.createDataFrame(rows, "g string, y double"), "y", "g"
    )
    assert kw["h_tie_corrected"] == 0.0 and kw["p"] == 1.0
    assert kw["df"] == 2
    # planted 3-group shift on real events is detected
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        (F.col("event_id") % 3).cast("string").alias("g"),
        ((F.col("value") % 13)
         + (F.col("event_id") % 3).cast("double") * 1.5).alias("y"),
    )
    kw2 = kruskal_wallis(df, "y", "g")
    assert kw2["p"] < 1e-6 and kw2["df"] == 2
    # degenerate: constant metric -> NaN, not a crash
    const = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 2.0)], "g string, y double"
    )
    res = kruskal_wallis(const, "y", "g")
    assert math.isnan(res["p"])
    with pytest.raises(ValueError, match=">= 2 groups"):
        kruskal_wallis(
            spark.createDataFrame([("a", 1.0), ("a", 2.0), ("a", 3.0)],
                                  "g string, y double"),
            "y", "g",
        )


def test_streaming_mann_whitney_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_mann_whitney_u,
    )

    df = _timed_frame(spark, effect=0.4).select("arm", "y")
    d = str(tmp_path / "mwu")
    df.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_mann_whitney_u(stream, "y", "arm")
    want = mann_whitney_u(spark.read.parquet(d), "y", "arm")
    assert got == want


from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    spearman_corr,
)


def test_spearman_matches_replica_and_closed_form(spark):
    from fractions import Fraction

    # tie-dense deterministic pairs
    pts = [(float(v % 7), float((3 * v + 1) % 5)) for v in range(40)]
    df = spark.createDataFrame(pts, "x double, y double")
    out = spearman_corr(df, "x", "y")

    def avg_ranks(vals):
        s = sorted(vals)
        return {
            v: Fraction(2 * s.index(v) + s.count(v) + 1, 2) for v in set(vals)
        }

    rx = avg_ranks([x for x, _ in pts])
    ry = avg_ranks([y for _, y in pts])
    n = len(pts)
    sx = sum(2 * rx[x] for x, _ in pts)
    sy = sum(2 * ry[y] for _, y in pts)
    sxx = sum((2 * rx[x]) ** 2 for x, _ in pts)
    syy = sum((2 * ry[y]) ** 2 for _, y in pts)
    sxy = sum(4 * rx[x] * ry[y] for x, y in pts)
    num = n * sxy - sx * sy
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    assert out["num"] == num and out["den2"] == den2
    assert out["rho"] == float(num) / math.sqrt(float(den2))
    # no-ties closed form: rho = 1 - 6*sum(d^2)/(n(n^2-1))
    pure = [(float(v), float((v * 17) % 29)) for v in range(29)]
    dfp = spark.createDataFrame(pure, "x double, y double")
    got = spearman_corr(dfp, "x", "y")
    rxp = {x: i + 1 for i, x in enumerate(sorted(p[0] for p in pure))}
    ryp = {y: i + 1 for i, y in enumerate(sorted(p[1] for p in pure))}
    d2 = sum((rxp[x] - ryp[y]) ** 2 for x, y in pure)
    m = len(pure)
    want = float(Fraction(1) - Fraction(6 * d2, m * (m * m - 1)))
    assert abs(got["rho"] - want) < 1e-12
    # monotone laws: identity -> exactly 1, reversal -> exactly -1
    mono = spark.createDataFrame(
        [(float(v), float(v * v)) for v in range(15)], "x double, y double"
    )
    assert spearman_corr(mono, "x", "y")["rho"] == 1.0
    rev = spark.createDataFrame(
        [(float(v), float(-v)) for v in range(15)], "x double, y double"
    )
    assert spearman_corr(rev, "x", "y")["rho"] == -1.0
    # repartition-invariant; constant column -> NaN; tiny n raises
    assert spearman_corr(df.repartition(7), "x", "y") == out
    const = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0)], "x double, y double")
    assert math.isnan(spearman_corr(const, "x", "y")["rho"])
    with pytest.raises(ValueError, match="n >= 2"):
        spearman_corr(df.limit(1), "x", "y")


# ------------------------------------------- quantized rank statistics
# The r11 verdict's watch item 1: the rank statistics' cumulative
# windows sort DISTINCT metric values in a single task, so a
# continuous corpus-scale metric (distinct ~ rows) needs the explicit
# quantize_bits opt-in.  The LAW pinned here: because
# floor(v * 2^s + 0.5) is monotone non-decreasing, the quantized test
# EQUALS the exact tie-corrected test applied to a pre-bucketed
# column — whole readout dict, bit-for-bit.


def _bucketed(df, cols, bits):
    ms = float(1 << bits)
    return df.select(*[
        F.floor(F.col(c) * F.lit(ms) + F.lit(0.5)).cast("double").alias(c)
        if c in cols else F.col(c)
        for c in df.columns
    ])


def test_mann_whitney_quantized_equals_exact_on_bucketed(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        # continuous-ish metric: an irrational-scaled value
        (F.col("value") * 0.7071067811865476).alias("y"),
    )
    got = mann_whitney_u(df, "y", "arm", quantize_bits=3)
    want = mann_whitney_u(_bucketed(df, {"y"}, 3), "y", "arm")
    assert got == want
    # coarser buckets create MORE ties; the tie term must reflect it
    coarse = mann_whitney_u(df, "y", "arm", quantize_bits=1)
    assert coarse["tie_term"] >= got["tie_term"]
    with pytest.raises(ValueError, match="quantize_bits"):
        mann_whitney_u(df, "y", "arm", quantize_bits=0)


def test_kruskal_wallis_quantized_equals_exact_on_bucketed(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        (F.col("event_id") % 3).cast("string").alias("g"),
        (F.col("value") * 1.4142135623730951).alias("y"),
    )
    got = kruskal_wallis(df, "y", "g", quantize_bits=2)
    want = kruskal_wallis(_bucketed(df, {"y"}, 2), "y", "g")
    assert got == want
    # NULL group still raises loudly on the quantized path
    bad = spark.createDataFrame(
        [("a", 1.0), (None, 2.0)], "g string, y double"
    )
    with pytest.raises(Exception, match="NULL g"):
        kruskal_wallis(bad, "y", "g", quantize_bits=2)
    with pytest.raises(ValueError, match="quantize_bits"):
        kruskal_wallis(df, "y", "g", quantize_bits=44)


def test_spearman_quantized_equals_exact_on_bucketed(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        (F.col("value") * 0.3333333333333333).alias("x"),
        ((F.col("value") % 17) * 2.718281828459045).alias("y"),
    )
    got = spearman_corr(df, "x", "y", quantize_bits=4)
    want = spearman_corr(_bucketed(df, {"x", "y"}, 4), "x", "y")
    assert got == want
    # quantization is an opt-in resolution change: at high enough s on
    # an integer-spaced metric it changes NOTHING (no new ties)
    ints = spark.createDataFrame(
        [(float(v), float((v * 7) % 11)) for v in range(11)],
        "x double, y double",
    )
    assert spearman_corr(ints, "x", "y", quantize_bits=8) == \
        spearman_corr(ints, "x", "y")
    with pytest.raises(ValueError, match="quantize_bits"):
        spearman_corr(df, "x", "y", quantize_bits=-1)


def test_streaming_mann_whitney_quantized_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_mann_whitney_u,
    )

    d = str(tmp_path / "mwuq")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") * 0.123456789).alias("y"),
    ).limit(400).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_mann_whitney_u(stream, "y", "arm", quantize_bits=5)
    want = mann_whitney_u(spark.read.parquet(d), "y", "arm",
                          quantize_bits=5)
    assert got == want


def test_streaming_kruskal_wallis_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_kruskal_wallis,
    )

    d = str(tmp_path / "kwstream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        (F.col("event_id") % 3).cast("string").alias("g"),
        (F.col("value") % 23).cast("double").alias("y"),
    ).limit(500).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_kruskal_wallis(stream, "y", "g")
    want = kruskal_wallis(spark.read.parquet(d), "y", "g")
    assert got == want
    # quantized twin matches the quantized batch readout bit-for-bit
    stream2 = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got_q = streaming_kruskal_wallis(stream2, "y", "g", quantize_bits=6)
    want_q = kruskal_wallis(spark.read.parquet(d), "y", "g",
                            quantize_bits=6)
    assert got_q == want_q


def test_kruskal_wallis_from_counts_guards(spark):
    from kafka_avro_order_processing_spark.operators.abtest import (
        kruskal_wallis_from_counts,
    )

    null_g = spark.createDataFrame(
        [(None, 1.0, 2), ("b", 2.0, 3)], "g string, v double, c long"
    )
    with pytest.raises(ValueError, match="NULL group"):
        kruskal_wallis_from_counts(null_g)
    one = spark.createDataFrame([("a", 1.0, 5)], "g string, v double, c long")
    with pytest.raises(ValueError, match=">= 2 groups"):
        kruskal_wallis_from_counts(one)
    # the k=2 identity holds through the from_counts split too:
    # H' == z_uncorrected^2 with the SAME count table fed to both
    counts = spark.createDataFrame(
        [("a", 1.0, 4), ("a", 2.0, 2), ("b", 1.0, 1),
         ("b", 3.0, 5), ("a", 3.0, 1)],
        "g string, v double, c long",
    )
    kw = kruskal_wallis_from_counts(counts)
    from kafka_avro_order_processing_spark.operators.abtest import (
        mann_whitney_u_from_counts,
    )
    mwu = mann_whitney_u_from_counts(
        counts.withColumnRenamed("g", "arm")
    )
    from fractions import Fraction

    z_unc = (Fraction(mwu["two_u"], 2) - Fraction(int(mwu["mu"]))) \
        / Fraction(mwu["sigma"])
    assert abs(kw["h_tie_corrected"] - float(z_unc) ** 2) < 1e-9


# ------------------------------------------- quantile treatment effects

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    quantile_treatment_effects,
    quantile_treatment_effects_from_counts,
)

_QTE_PPMS = (250_000, 500_000, 900_000, 1_000_000)


def _q_replica(vals, ppm):
    """Lower empirical quantile: k-th smallest, k = ceil(n*ppm/1e6)."""
    s = sorted(vals)
    n = len(s)
    k = -((-n * ppm) // 1_000_000)  # exact integer ceil
    return s[k - 1]


def test_qte_matches_brute_force_and_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 13).cast("double").alias("y"),
    )
    out = quantile_treatment_effects(df, "y", "arm", ppms=_QTE_PPMS)
    rows = {r["ppm"]: r for r in out.collect()}
    pairs = [(r["arm"], r["y"]) for r in df.collect()]
    xs = [v for a, v in pairs if a == "a"]
    ys = [v for a, v in pairs if a == "b"]
    for ppm in _QTE_PPMS:
        r = rows[ppm]
        assert r["arm_a"] == "a" and r["arm_b"] == "b"
        assert r["q_a"] == _q_replica(xs, ppm)
        assert r["q_b"] == _q_replica(ys, ppm)
        assert r["qte"] == r["q_b"] - r["q_a"]
    # the driver's exact compare against a DuckDB integer replica
    sql = """
    WITH r AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
             CAST(value % 13 AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ), cells AS (
      SELECT arm, v, CAST(COUNT(*) AS BIGINT) AS c FROM r GROUP BY arm, v
    ), cum AS (
      SELECT arm, v,
             CAST(SUM(c) OVER (PARTITION BY arm ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cw,
             CAST(SUM(c) OVER (PARTITION BY arm) AS BIGINT) AS n
      FROM cells
    ), t AS (
      SELECT CAST(ppm AS BIGINT) AS ppm
      FROM (VALUES (250000), (500000), (900000), (1000000)) AS t(ppm)
    ), cand AS (
      SELECT t.ppm, cum.arm, cum.v FROM cum, t
      WHERE cum.cw * 1000000 >= cum.n * t.ppm
    )
    SELECT ppm, 'a' AS arm_a, 'b' AS arm_b,
           MIN(CASE WHEN arm = 'a' THEN v END) AS q_a,
           MIN(CASE WHEN arm = 'b' THEN v END) AS q_b,
           MIN(CASE WHEN arm = 'b' THEN v END)
             - MIN(CASE WHEN arm = 'a' THEN v END) AS qte
    FROM cand GROUP BY ppm
    """
    _assert_parity(out, sql)


def test_qte_quantized_and_guards(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") * 0.7071067811865476).alias("y"),
    )
    s = 4
    ms = float(1 << s)
    out = {r["ppm"]: r
           for r in quantile_treatment_effects(
               df, "y", "arm", ppms=(500_000,), quantize_bits=s
           ).collect()}
    pairs = [(r["arm"], math.floor(r["y"] * ms + 0.5)) for r in df.collect()]
    xs = [v for a, v in pairs if a == "a"]
    ys = [v for a, v in pairs if a == "b"]
    r = out[500_000]
    assert r["q_a"] == _q_replica(xs, 500_000) / ms
    assert r["q_b"] == _q_replica(ys, 500_000) / ms
    assert r["qte"] == (_q_replica(ys, 500_000)
                        - _q_replica(xs, 500_000)) / ms
    # guards
    with pytest.raises(ValueError, match="ppm"):
        quantile_treatment_effects(df, "y", "arm", ppms=())
    with pytest.raises(ValueError, match="ppm"):
        quantile_treatment_effects(df, "y", "arm", ppms=(0,))
    with pytest.raises(ValueError, match="duplicate"):
        quantile_treatment_effects(df, "y", "arm", ppms=(1, 1))
    with pytest.raises(ValueError, match="2 arms"):
        quantile_treatment_effects(
            df.withColumn("arm", F.lit("x")), "y", "arm"
        )
    null_arm = spark.createDataFrame(
        [(None, 1.0, 2)], "arm string, v double, c long"
    )
    with pytest.raises(ValueError, match="NULL arm"):
        quantile_treatment_effects_from_counts(null_arm)


def test_streaming_qte_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_quantile_treatment_effects,
    )

    d = str(tmp_path / "qtestream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 19).cast("double").alias("y"),
    ).limit(600).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        streaming_quantile_treatment_effects(stream, "y", "arm").collect()
    )
    want = sorted(
        quantile_treatment_effects(
            spark.read.parquet(d), "y", "arm"
        ).collect()
    )
    assert got == want


def test_streaming_qte_cis_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.operators.abtest import (
        quantile_treatment_effect_cis,
    )
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_quantile_treatment_effect_cis,
    )

    d = str(tmp_path / "qtecistream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 19).cast("double").alias("y"),
    ).limit(600).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        streaming_quantile_treatment_effect_cis(stream, "y", "arm").collect()
    )
    want = sorted(
        quantile_treatment_effect_cis(
            spark.read.parquet(d), "y", "arm"
        ).collect()
    )
    assert got == want
    # contract check fires before any drain
    with pytest.raises(ValueError, match="confidence_ppm"):
        streaming_quantile_treatment_effect_cis(
            stream, "y", "arm", confidence_ppm=100_000
        )


def test_streaming_spearman_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_spearman_corr,
    )

    d = str(tmp_path / "rhostream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        (F.col("value") % 29).cast("double").alias("x"),
        ((F.col("value") * 7) % 31).cast("double").alias("y"),
    ).limit(500).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_spearman_corr(stream, "x", "y")
    want = spearman_corr(spark.read.parquet(d), "x", "y")
    assert got == want
    # quantized twin
    stream2 = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got_q = streaming_spearman_corr(stream2, "x", "y", quantize_bits=7)
    want_q = spearman_corr(spark.read.parquet(d), "x", "y",
                           quantize_bits=7)
    assert got_q == want_q


# ------------------------------------------------ winsorized readout

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    winsorized_ab_test,
)


def test_winsorized_matches_python_replica_exactly(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        # heavy tail: cube the metric so whales exist
        (F.pow(F.col("value") % 50, 3) * 1e-3).alias("y"),
    )
    s = 12
    msf = float(1 << s)
    out = winsorized_ab_test(df, "y", "arm", lower_ppm=50_000,
                             upper_ppm=950_000, scale_bits=s)
    pairs = [(r["arm"], math.floor(r["y"] * msf + 0.5))
             for r in df.collect()]

    def _rep(arm):
        vals = sorted(v for a2, v in pairs if a2 == arm)
        n = len(vals)
        klo = -((-n * 50_000) // 1_000_000)
        khi = -((-n * 950_000) // 1_000_000)
        lo, hi = vals[klo - 1], vals[khi - 1]
        w = [min(max(v, lo), hi) for v in vals]
        sy, syy = sum(w), sum(x * x for x in w)
        mean = float(sy) / (float(n) * msf)
        var = float(n * syy - sy * sy) / (float(n) * float(n - 1)
                                          * msf * msf)
        return n, sy, syy, lo, hi, mean, var

    for arm in ("a", "b"):
        n, sy, syy, lo, hi, mean, var = _rep(arm)
        pa = out["per_arm"][arm]
        assert pa["n"] == n and pa["sy"] == sy and pa["syy"] == syy
        assert pa["lo"] == lo / msf and pa["hi"] == hi / msf
        assert pa["mean"] == mean and pa["var"] == var
    na, nb = out["per_arm"]["a"], out["per_arm"]["b"]
    diff = nb["mean"] - na["mean"]
    v = na["var"] / na["n"] + nb["var"] / nb["n"]
    assert out["diff"] == diff and out["se"] == math.sqrt(v)
    assert out["z"] == diff / math.sqrt(v)
    # repartition-bit-identical (the module discipline)
    assert winsorized_ab_test(df.repartition(11), "y", "arm",
                              lower_ppm=50_000, upper_ppm=950_000,
                              scale_bits=s) == out


def test_winsorized_robustness_law_and_guards(spark):
    """The point of winsorizing: ONE planted whale cannot move the
    readout, while it wrecks the plain mean difference."""
    base = [("a", float(v % 7)) for v in range(200)] + [
        ("b", float((v * 3) % 7)) for v in range(200)
    ]
    clean = spark.createDataFrame(base, "arm string, y double")
    whale = spark.createDataFrame(
        base + [("b", 1e6)], "arm string, y double"
    )
    wz_clean = winsorized_ab_test(clean, "y", "arm", scale_bits=8)
    wz_whale = winsorized_ab_test(whale, "y", "arm", scale_bits=8)
    # winsorized means barely move (the whale clamps to q99)
    assert abs(wz_whale["diff"] - wz_clean["diff"]) < 0.1
    # while the raw mean difference explodes by ~5000
    raw = {a: sum(v for x, v in (base + [("b", 1e6)]) if x == a)
           / (200 + (1 if a == "b" else 0)) for a in ("a", "b")}
    assert abs((raw["b"] - raw["a"]) - wz_clean["diff"]) > 1000
    with pytest.raises(ValueError, match="lower_ppm < upper_ppm"):
        winsorized_ab_test(clean, "y", "arm", lower_ppm=900_000,
                           upper_ppm=100_000)
    with pytest.raises(ValueError, match="ppm"):
        winsorized_ab_test(clean, "y", "arm", lower_ppm=0)
    with pytest.raises(Exception, match="NULL"):
        winsorized_ab_test(
            spark.createDataFrame([("a", None), ("b", 1.0)],
                                  "arm string, y double"),
            "y", "arm",
        )


def test_streaming_winsorized_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_winsorized_ab_test,
    )

    d = str(tmp_path / "wzstream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.pow(F.col("value") % 40, 2) * 1e-2).alias("y"),
    ).limit(600).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_winsorized_ab_test(stream, "y", "arm", scale_bits=10)
    want = winsorized_ab_test(spark.read.parquet(d), "y", "arm",
                              scale_bits=10)
    assert got == want


# ------------------------------------------------ Yuen trimmed-mean test

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    trimmed_mean_ab_test,
)


def test_trimmed_mean_matches_python_replica_exactly(spark):
    from fractions import Fraction

    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.pow(F.col("value") % 60, 3) * 1e-3).alias("y"),
    )
    s = 12
    msf = float(1 << s)
    lop, upp = 100_000, 900_000
    out = trimmed_mean_ab_test(df, "y", "arm", lower_ppm=lop,
                               upper_ppm=upp, scale_bits=s)
    pairs = [(r["arm"], math.floor(r["y"] * msf + 0.5))
             for r in df.collect()]

    def _rep(arm):
        vals = sorted(v for a2, v in pairs if a2 == arm)
        n = len(vals)
        k_lo = (n * lop) // 1_000_000
        k_hi = n - (n * (1_000_000 - upp)) // 1_000_000
        keep = vals[k_lo:k_hi]
        h = len(keep)
        lo_t, hi_t = vals[k_lo], vals[k_hi - 1]
        wv = [min(max(v, lo_t), hi_t) for v in vals]
        sw, sww = sum(wv), sum(x * x for x in wv)
        ssd_w = Fraction(n * sww - sw * sw, n)
        d = ssd_w / (h * (h - 1))
        return n, h, lo_t, hi_t, sum(keep), sw, sww, d

    reps = {arm: _rep(arm) for arm in ("a", "b")}
    for arm in ("a", "b"):
        n, h, lo_t, hi_t, st, sw, sww, d = reps[arm]
        pa = out["per_arm"][arm]
        assert pa["n"] == n and pa["h"] == h
        assert pa["st"] == st and pa["sw"] == sw and pa["sww"] == sww
        assert pa["lo"] == lo_t / msf and pa["hi"] == hi_t / msf
        assert pa["mean_trimmed"] == float(Fraction(st, h)) / msf
        assert pa["d"] == float(d) / (msf * msf)
    da, db_ = reps["a"][7], reps["b"][7]
    diff = float(Fraction(reps["b"][4], reps["b"][1])
                 - Fraction(reps["a"][4], reps["a"][1])) / msf
    se = math.sqrt(float(da + db_)) / msf
    assert out["diff"] == diff and out["se"] == se
    assert out["t"] == diff / se
    want_df = float((da + db_) ** 2 / (da * da / (reps["a"][1] - 1)
                                       + db_ * db_ / (reps["b"][1] - 1)))
    assert out["df"] == want_df
    from kafka_avro_order_processing_spark.operators.srm import (
        student_t_sf,
    )
    assert out["p"] == 2.0 * student_t_sf(abs(out["t"]), want_df)
    # repartition-bit-identical
    assert trimmed_mean_ab_test(df.repartition(9), "y", "arm",
                                lower_ppm=lop, upper_ppm=upp,
                                scale_bits=s) == out


def test_trimmed_mean_robustness_and_guards(spark):
    base = [("a", float(v % 7)) for v in range(300)] + [
        ("b", float((v * 3) % 7)) for v in range(300)
    ]
    clean = spark.createDataFrame(base, "arm string, y double")
    whale = spark.createDataFrame(
        base + [("b", 1e6)], "arm string, y double"
    )
    tm_clean = trimmed_mean_ab_test(clean, "y", "arm", scale_bits=8)
    tm_whale = trimmed_mean_ab_test(whale, "y", "arm", scale_bits=8)
    assert abs(tm_whale["diff"] - tm_clean["diff"]) < 0.1
    with pytest.raises(ValueError, match="lower_ppm < upper_ppm"):
        trimmed_mean_ab_test(clean, "y", "arm", lower_ppm=900_000,
                             upper_ppm=100_000)
    tiny = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)],
        "arm string, y double",
    )
    # n = 2 per arm, trim [0.5, 0.500001): k_lo = 1, k_hi = 2 -> h = 1
    with pytest.raises(ValueError, match="keeps h"):
        trimmed_mean_ab_test(tiny, "y", "arm", lower_ppm=500_000,
                             upper_ppm=500_001)


def test_student_t_sf_closed_form_pins():
    from kafka_avro_order_processing_spark.operators.srm import (
        betai,
        student_t_sf,
    )

    for t in (0.0, 0.3, 1.0, 2.5, 17.0):
        assert abs(student_t_sf(t, 1.0)
                   - (0.5 - math.atan(t) / math.pi)) < 1e-13
        assert abs(student_t_sf(t, 2.0)
                   - 0.5 * (1 - t / math.sqrt(2 + t * t))) < 1e-13
    for t in (0.5, 1.96, 3.0):
        assert abs(student_t_sf(t, 1e8)
                   - 0.5 * math.erfc(t / math.sqrt(2))) < 1e-7
    # reflection + betai closed forms and symmetry
    assert abs(student_t_sf(-1.3, 5) + student_t_sf(1.3, 5) - 1.0) < 1e-14
    for a, x in ((1.0, 0.3), (1.0, 0.9)):
        assert abs(betai(a, 4.0, x) - (1 - (1 - x) ** 4)) < 1e-13
        assert abs(betai(3.0, 1.0, x) - x ** 3) < 1e-13
    assert abs(betai(2.5, 3.5, 0.4) - (1 - betai(3.5, 2.5, 0.6))) < 1e-13
    with pytest.raises(ValueError, match="df"):
        student_t_sf(1.0, 0.0)


def test_streaming_trimmed_mean_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_trimmed_mean_ab_test,
    )

    d = str(tmp_path / "tmstream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.pow(F.col("value") % 35, 2) * 1e-2).alias("y"),
    ).limit(600).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_trimmed_mean_ab_test(stream, "y", "arm", scale_bits=10)
    want = trimmed_mean_ab_test(spark.read.parquet(d), "y", "arm",
                                scale_bits=10)
    assert got == want


# -------------------------------------------- quantile confidence bands

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    _ci_ranks,
    grouped_quantile_cis,
    grouped_quantile_cis_from_counts,
)


def test_ci_ranks_textbook_and_clamps():
    # the classical median example: n = 10, p = 0.5, 95% -> ranks
    # (2, 9) (Conover §3.2; actual coverage 0.9786)
    assert _ci_ranks(10, 500_000, 950_000) == (2, 9)
    # tiny n clamps one-sided-conservative
    assert _ci_ranks(1, 500_000, 950_000) == (1, 1)
    lo, hi = _ci_ranks(5, 900_000, 990_000)
    assert 1 <= lo <= hi <= 5
    # monotone in confidence: wider confidence -> wider (or equal) band
    l90, h90 = _ci_ranks(200, 500_000, 900_000)
    l99, h99 = _ci_ranks(200, 500_000, 990_000)
    assert l99 <= l90 and h99 >= h90


def test_grouped_quantile_cis_match_python_replica(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        (F.col("event_id") % 3).cast("string").alias("g"),
        (F.col("value") % 41).cast("double").alias("y"),
    )
    ppms = (250_000, 500_000, 900_000)
    got = {
        (r["g"], r["ppm"]): r
        for r in grouped_quantile_cis(
            df, "y", "g", ppms=ppms, confidence_ppm=950_000
        ).collect()
    }
    rows = [(r["g"], r["y"]) for r in df.collect()]
    groups = sorted({g for g, _ in rows})
    assert set(got) == {(g, p) for g in groups for p in ppms}
    for g in groups:
        vals = sorted(v for g2, v in rows if g2 == g)
        n = len(vals)
        for ppm in ppms:
            lo_rank, hi_rank = _ci_ranks(n, ppm, 950_000)
            q_rank = -((-n * ppm) // 1_000_000)
            r = got[(g, ppm)]
            assert r["n"] == n
            assert (r["lo_rank"], r["hi_rank"]) == (lo_rank, hi_rank)
            assert r["q"] == vals[q_rank - 1]
            assert r["lo"] == vals[lo_rank - 1]
            assert r["hi"] == vals[hi_rank - 1]
            assert r["lo"] <= r["q"] <= r["hi"]
    # quantized path: equal to the replica on bucketed values,
    # dequantized by 2^-s
    s = 6
    msf = float(1 << s)
    gq = {
        (r["g"], r["ppm"]): r
        for r in grouped_quantile_cis(
            df, "y", "g", ppms=(500_000,), confidence_ppm=950_000,
            quantize_bits=s,
        ).collect()
    }
    for g in groups:
        vals = sorted(math.floor(v * msf + 0.5) for g2, v in rows
                      if g2 == g)
        n = len(vals)
        q_rank = -((-n * 500_000) // 1_000_000)
        lo_rank, hi_rank = _ci_ranks(n, 500_000, 950_000)
        r = gq[(g, 500_000)]
        assert r["q"] == vals[q_rank - 1] / msf
        assert r["lo"] == vals[lo_rank - 1] / msf
        assert r["hi"] == vals[hi_rank - 1] / msf


def test_grouped_quantile_cis_guards(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1)], "g string, v double, c long"
    )
    with pytest.raises(ValueError, match="ppms"):
        grouped_quantile_cis_from_counts(df, ppms=())
    with pytest.raises(ValueError, match="ppm"):
        grouped_quantile_cis_from_counts(df, ppms=(1_000_000,))
    with pytest.raises(ValueError, match="confidence_ppm"):
        grouped_quantile_cis_from_counts(df, confidence_ppm=400_000)
    null_g = spark.createDataFrame(
        [(None, 1.0, 1)], "g string, v double, c long"
    )
    with pytest.raises(ValueError, match="NULL group"):
        grouped_quantile_cis_from_counts(null_g)
    with pytest.raises(ValueError, match="max_groups"):
        grouped_quantile_cis_from_counts(df, max_groups=0)


def test_grouped_quantile_cis_group_cardinality_guard(spark):
    """r12 verdict task 4: a row-grained group_col must raise loudly
    instead of collecting every group and spinning the driver through
    the per-group betai searches.  The guard message names the knob;
    raising it explicitly admits the same frame."""
    many = spark.range(500).select(
        F.col("id").cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
        F.lit(1).cast("long").alias("c"),
    )
    with pytest.raises(ValueError, match="max_groups=100"):
        grouped_quantile_cis_from_counts(many, max_groups=100)
    # explicit opt-in scores the same frame fine
    out = grouped_quantile_cis_from_counts(many, max_groups=500)
    assert out.count() == 500
    # the wrapper forwards the knob
    wide = spark.range(300).select(
        F.col("id").cast("string").alias("seg"),
        F.col("id").cast("double").alias("y"),
    )
    with pytest.raises(ValueError, match="max_groups=50"):
        grouped_quantile_cis(wide, "y", "seg", max_groups=50).collect()


def test_qte_cis_match_python_replica_and_qte(spark):
    """r13: the paired quantile-difference bands.  Whole-table pin
    against a Python replica using the same _ci_ranks (Bonferroni
    arm confidence), and the point columns must EQUAL the plain QTE
    readout on the same frame."""
    from kafka_avro_order_processing_spark.operators.abtest import (
        quantile_treatment_effect_cis,
        quantile_treatment_effects,
    )

    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 41).cast("double").alias("y"),
    )
    ppms = (250_000, 500_000, 900_000)
    conf = 950_000
    got = {
        r["ppm"]: r
        for r in quantile_treatment_effect_cis(
            df, "y", "arm", ppms=ppms, confidence_ppm=conf
        ).collect()
    }
    assert set(got) == set(ppms)
    rows = [(r["arm"], r["y"]) for r in df.collect()]
    arm_conf = 1_000_000 - (1_000_000 - conf) // 2
    by = {}
    for arm in ("a", "b"):
        vals = sorted(v for a2, v in rows if a2 == arm)
        by[arm] = vals
    for ppm in ppms:
        r = got[ppm]
        assert (r["arm_a"], r["arm_b"]) == ("a", "b")
        rep = {}
        for arm in ("a", "b"):
            vals = by[arm]
            n = len(vals)
            lo_rank, hi_rank = _ci_ranks(n, ppm, arm_conf)
            q_rank = -((-n * ppm) // 1_000_000)
            rep[arm] = (vals[q_rank - 1], vals[lo_rank - 1],
                        vals[hi_rank - 1])
        assert (r["q_a"], r["lo_a"], r["hi_a"]) == rep["a"]
        assert (r["q_b"], r["lo_b"], r["hi_b"]) == rep["b"]
        assert r["qte"] == rep["b"][0] - rep["a"][0]
        assert r["qte_lo"] == rep["b"][1] - rep["a"][2]
        assert r["qte_hi"] == rep["b"][2] - rep["a"][1]
        # band law: the interval brackets the point estimate
        assert r["qte_lo"] <= r["qte"] <= r["qte_hi"]
    # the point columns equal the plain QTE readout exactly
    qte = {
        r["ppm"]: r
        for r in quantile_treatment_effects(df, "y", "arm",
                                            ppms=ppms).collect()
    }
    for ppm in ppms:
        assert got[ppm]["q_a"] == qte[ppm]["q_a"]
        assert got[ppm]["q_b"] == qte[ppm]["q_b"]
        assert got[ppm]["qte"] == qte[ppm]["qte"]


def test_qte_cis_quantized_laws_and_monotone_confidence(spark):
    from kafka_avro_order_processing_spark.operators.abtest import (
        quantile_treatment_effect_cis,
    )

    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 17).cast("double").alias("y"),
    )
    s = 6
    msf = float(1 << s)
    r90, r99 = [
        quantile_treatment_effect_cis(
            df, "y", "arm", ppms=(500_000,), confidence_ppm=c,
            quantize_bits=s,
        ).collect()[0]
        for c in (900_000, 990_000)
    ]
    # dequantized values are exact multiples of 2^-s
    for c in ("q_a", "lo_a", "hi_a", "q_b", "lo_b", "hi_b"):
        assert r90[c] * msf == float(int(r90[c] * msf)), c
    # wider confidence -> wider (or equal) band, same point estimate
    assert r99["qte_lo"] <= r90["qte_lo"]
    assert r99["qte_hi"] >= r90["qte_hi"]
    assert r99["qte"] == r90["qte"]
    # bit-identical under repartitioning
    again = quantile_treatment_effect_cis(
        df.repartition(13), "y", "arm", ppms=(500_000,),
        confidence_ppm=900_000, quantize_bits=s,
    ).collect()[0]
    assert tuple(again) == tuple(r90)


def test_qte_cis_guards(spark):
    from kafka_avro_order_processing_spark.operators.abtest import (
        quantile_treatment_effect_cis,
        quantile_treatment_effect_cis_from_counts,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1), ("b", 2.0, 1)], "arm string, v double, c long"
    )
    with pytest.raises(ValueError, match="ppms"):
        quantile_treatment_effect_cis_from_counts(df, ppms=())
    with pytest.raises(ValueError, match="confidence_ppm"):
        quantile_treatment_effect_cis_from_counts(
            df, confidence_ppm=100_000
        )
    three = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "arm string, y double"
    )
    with pytest.raises(ValueError, match="exactly 2 arms"):
        quantile_treatment_effect_cis(three, "y", "arm")


# ------------------------------------------------ Wilcoxon signed-rank

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    wilcoxon_signed_rank,
)


def _wsr_replica(ds):
    """Exact Python replica: midranks over |d| with ties, Wilcoxon
    zero-discard, tie-corrected normal approximation — assembled in
    the operator's exact Fraction/float order."""
    from fractions import Fraction

    nz = [d for d in ds if d != 0]
    n_zero = len(ds) - len(nz)
    n = len(nz)
    if n < 1:
        return {"n": 0, "n_zero": n_zero}
    av = sorted((abs(d), d > 0) for d in nz)
    # group by |d|
    groups = {}
    for v, pos in av:
        c = groups.setdefault(v, [0, 0])
        c[0 if pos else 1] += 1
    two_w = 0
    ties = 0
    cumt = 0
    for v in sorted(groups):
        cpos, cneg = groups[v]
        t = cpos + cneg
        two_w += cpos * (2 * cumt + t + 1)
        ties += t * t * t - t
        cumt += t
    w_plus = Fraction(two_w, 2)
    mu = Fraction(n * (n + 1), 4)
    var = Fraction(n * (n + 1) * (2 * n + 1), 24) - Fraction(ties, 48)
    sigma = math.sqrt(float(var))
    diff = w_plus - mu
    cc = Fraction(1, 2) if diff > 0 else (
        Fraction(-1, 2) if diff < 0 else 0
    )
    z = float(diff - cc) / sigma
    return {
        "n": n, "n_zero": n_zero, "w_plus": float(w_plus),
        "mu": float(mu), "sigma": sigma, "z": z,
        "p": math.erfc(abs(z) / math.sqrt(2.0)),
        "two_w": two_w, "tie_term": ties,
    }


def test_wilcoxon_signed_rank_hand_case_and_replica(spark):
    # hand case: d = [1, 2, 3, -4, 5] -> ranks 1..5, W+ = 1+2+3+5 = 11
    tiny = spark.createDataFrame(
        [(0.0, 1.0), (0.0, 2.0), (0.0, 3.0), (4.0, 0.0), (0.0, 5.0)],
        "x double, y double",
    )
    t = wilcoxon_signed_rank(tiny, "x", "y")
    assert t["w_plus"] == 11.0 and t["n"] == 5 and t["n_zero"] == 0
    assert t["mu"] == 7.5 and t["tie_term"] == 0
    # replica on a real slice with ties and zeros, quantized + not
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        (F.col("value") % 11).cast("double").alias("x"),
        (F.col("value") % 7).cast("double").alias("y"),
    ).limit(500)
    rows = [(r["x"], r["y"]) for r in df.collect()]
    got = wilcoxon_signed_rank(df, "x", "y")
    want = _wsr_replica([y - x for x, y in rows])
    assert got == want
    assert got["n_zero"] > 0  # the slice really exercises zeros
    sq = 4
    gotq = wilcoxon_signed_rank(df, "x", "y", quantize_bits=sq)
    wantq = _wsr_replica(
        [math.floor((y - x) * (1 << sq) + 0.5) for x, y in rows]
    )
    assert gotq == wantq


def test_wilcoxon_signed_rank_laws(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        (F.col("value") % 11).cast("double").alias("x"),
        (F.col("value") % 7 + 0.5).cast("double").alias("y"),
    )
    out = wilcoxon_signed_rank(df, "x", "y")
    # antisymmetry: swapping the pair negates z exactly
    swapped = wilcoxon_signed_rank(df, "y", "x")
    assert swapped["z"] == -out["z"]
    assert swapped["n"] == out["n"] and swapped["p"] == out["p"]
    # rank-sum identity: W+ + W- = n(n+1)/2 exactly
    n = out["n"]
    assert out["w_plus"] + swapped["w_plus"] == n * (n + 1) / 2
    # identical pairs -> all zeros -> no test, loudly NaN
    same = df.select("x", F.col("x").alias("y"))
    deg = wilcoxon_signed_rank(same, "x", "y")
    assert deg["n"] == 0 and deg["n_zero"] > 0
    assert math.isnan(deg["z"]) and math.isnan(deg["p"])
    # bit-identical under repartitioning
    again = wilcoxon_signed_rank(df.repartition(13), "x", "y")
    assert again == out
    # validation
    with pytest.raises(ValueError, match="quantize_bits"):
        wilcoxon_signed_rank(df, "x", "y", quantize_bits=0)


def test_streaming_wilcoxon_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_wilcoxon_signed_rank,
    )

    d = str(tmp_path / "wsrstream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        (F.col("value") % 11).cast("double").alias("x"),
        (F.col("value") % 7).cast("double").alias("y"),
    ).limit(600).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_wilcoxon_signed_rank(stream, "x", "y")
    want = wilcoxon_signed_rank(spark.read.parquet(d), "x", "y")
    assert got == want


# ------------------------------------------------ Hodges-Lehmann shift

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    hodges_lehmann_shift,
    hodges_lehmann_shift_from_counts,
)


def _hl_brute(avals, bvals, confidence_ppm=950_000):
    """Brute-force replica: materialize ALL pairwise differences with
    the operator's exact float expression (b - a), sort, select."""
    from statistics import NormalDist

    diffs = sorted(bv - av for av in avals for bv in bvals)
    npairs = len(diffs)
    k1, k2 = (npairs + 1) // 2, npairs // 2 + 1
    shift = diffs[k1 - 1] if k1 == k2 else (
        diffs[k1 - 1] + diffs[k2 - 1]
    ) / 2.0
    alpha = (1_000_000 - confidence_ppm) / 1_000_000.0
    z = NormalDist().inv_cdf(1.0 - alpha / 2.0)
    na, nb = len(avals), len(bvals)
    c = math.floor(npairs / 2.0 - z * math.sqrt(
        na * nb * (na + nb + 1) / 12.0))
    k_lo, k_hi = max(1, c + 1), min(npairs, npairs - c)
    if k_lo > k_hi:
        k_lo, k_hi = 1, npairs
    return shift, diffs[k_lo - 1], diffs[k_hi - 1], k_lo, k_hi


def test_hodges_lehmann_textbook_and_brute_force(spark):
    # hand case: a=[1,2,3], b=[4,5,6] -> 9 diffs 1..5, median 3
    tiny = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        "arm string, y double",
    )
    t = hodges_lehmann_shift(tiny, "y", "arm")
    assert t["shift"] == 3.0 and t["n_pairs"] == 9
    assert t["ci_lo"] <= 3.0 <= t["ci_hi"]
    # brute-force replica on a real slice with ties and both parities
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    for nlim in (120, 121):
        df = ev.select(
            F.when(F.col("event_id") % 2 == 0, "a").otherwise("b")
            .alias("arm"),
            (F.col("value") % 13).cast("double").alias("y"),
        ).limit(nlim)
        rows = [(r["arm"], r["y"]) for r in df.collect()]
        avals = [v for a2, v in rows if a2 == "a"]
        bvals = [v for a2, v in rows if a2 == "b"]
        want = _hl_brute(avals, bvals)
        got = hodges_lehmann_shift(df, "y", "arm")
        assert got["shift"] == want[0]
        assert (got["ci_lo"], got["ci_hi"]) == (want[1], want[2])
        assert (got["k_lo"], got["k_hi"]) == (want[3], want[4])
        assert got["n"] == {"a": len(avals), "b": len(bvals)}


def test_hodges_lehmann_laws(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 29).cast("double").alias("y"),
    )
    out = hodges_lehmann_shift(df, "y", "arm", quantize_bits=8)
    assert out["ci_lo"] <= out["shift"] <= out["ci_hi"]
    # translation equivariance: +c on arm b shifts everything by +c
    # exactly (quantized integers)
    shifted = df.withColumn(
        "y",
        F.when(F.col("arm") == "b", F.col("y") + 4.0).otherwise(F.col("y")),
    )
    out2 = hodges_lehmann_shift(shifted, "y", "arm", quantize_bits=8)
    for k in ("shift", "ci_lo", "ci_hi"):
        assert out2[k] == out[k] + 4.0, k
    # robustness law: one 1e6 whale in arm b barely moves the HL shift
    # while the raw mean difference explodes
    whale = df.limit(400).union(
        spark.createDataFrame([("b", 1e6)], "arm string, y double")
    )
    base = hodges_lehmann_shift(df.limit(400), "y", "arm", quantize_bits=8)
    w = hodges_lehmann_shift(whale, "y", "arm", quantize_bits=8)
    assert abs(w["shift"] - base["shift"]) < 1.0
    means = {
        r["arm"]: r["m"]
        for r in whale.groupBy("arm").agg(F.avg("y").alias("m")).collect()
    }
    assert means["b"] - means["a"] > 1000.0
    # bit-identical under repartitioning
    again = hodges_lehmann_shift(
        df.repartition(17), "y", "arm", quantize_bits=8
    )
    assert again == out


def test_hodges_lehmann_guards(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "arm string, y double"
    )
    with pytest.raises(ValueError, match="confidence_ppm"):
        hodges_lehmann_shift(df, "y", "arm", confidence_ppm=100_000)
    three = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "arm string, y double"
    )
    with pytest.raises(ValueError, match="exactly 2 arms"):
        hodges_lehmann_shift(three, "y", "arm")
    wide = spark.range(300).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("arm"),
        F.col("id").cast("double").alias("v"),
        F.lit(1).cast("long").alias("c"),
    )
    with pytest.raises(ValueError, match="max_cells=100"):
        hodges_lehmann_shift_from_counts(wide, max_cells=100)
    # tiny n: ranks clamp to the full range, never invert
    out = hodges_lehmann_shift(df, "y", "arm")
    assert (out["k_lo"], out["k_hi"]) == (1, 1)
    assert out["shift"] == out["ci_lo"] == out["ci_hi"] == 1.0


def test_streaming_hodges_lehmann_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_hodges_lehmann_shift,
    )

    d = str(tmp_path / "hlstream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 19).cast("double").alias("y"),
    ).limit(600).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_hodges_lehmann_shift(stream, "y", "arm")
    want = hodges_lehmann_shift(spark.read.parquet(d), "y", "arm")
    assert got == want
    with pytest.raises(ValueError, match="confidence_ppm"):
        streaming_hodges_lehmann_shift(
            stream, "y", "arm", confidence_ppm=5
        )


# ------------------------------------------------ proportion (binary) A/B

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    _beta_inv,
    proportion_ab_test,
)


def test_clopper_pearson_closed_forms_and_replica(spark):
    from kafka_avro_order_processing_spark.operators.srm import betai

    # inversion self-consistency
    for (g, a, b_) in ((0.025, 3.0, 8.0), (0.975, 11.0, 2.0),
                       (0.5, 1.5, 1.5)):
        x = _beta_inv(g, a, b_)
        assert abs(betai(a, b_, x) - g) < 1e-12
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.floor(F.col("value")) % 5 == 0).alias("converted"),
    )
    out = proportion_ab_test(df, "converted", "arm")
    pairs = [(r["arm"], int(r["converted"])) for r in df.collect()]
    for arm in ("a", "b"):
        xs = [v for a2, v in pairs if a2 == arm]
        n, x = len(xs), sum(xs)
        pa = out["per_arm"][arm]
        assert pa["n"] == n and pa["x"] == x and pa["rate"] == x / n
        # replica bounds through the same inversion
        assert pa["ci_lo"] == (0.0 if x == 0 else
                               _beta_inv(0.025, float(x), float(n - x + 1)))
        assert pa["ci_hi"] == (1.0 if x == n else
                               _beta_inv(0.975, float(x + 1), float(n - x)))
        assert pa["ci_lo"] <= pa["rate"] <= pa["ci_hi"]
    na, xa = out["per_arm"]["a"]["n"], out["per_arm"]["a"]["x"]
    nb, xb = out["per_arm"]["b"]["n"], out["per_arm"]["b"]["x"]
    pool = (xa + xb) / (na + nb)
    se = math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    assert out["se_pooled"] == se
    assert out["z"] == (xb / nb - xa / na) / se
    # the x = 0 edge: CP upper has the closed form 1 - (gamma/2)^(1/n)
    zero = spark.createDataFrame(
        [("a", 0)] * 10 + [("b", 1), ("b", 0)], "arm string, c int"
    )
    z0 = proportion_ab_test(zero, "c", "arm")
    assert z0["per_arm"]["a"]["ci_lo"] == 0.0
    assert abs(z0["per_arm"]["a"]["ci_hi"]
               - (1 - 0.025 ** (1 / 10))) < 1e-12
    # guards: non-binary dtype and non-0/1 values raise loudly
    with pytest.raises(ValueError, match="boolean or integer"):
        proportion_ab_test(
            spark.createDataFrame([("a", 1.0)], "arm string, c double"),
            "c", "arm",
        )
    with pytest.raises(Exception, match="non-0/1"):
        proportion_ab_test(
            spark.createDataFrame([("a", 2), ("b", 1)],
                                  "arm string, c int"),
            "c", "arm",
        )


def test_proportion_integer_counts_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    df = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.floor(F.col("value")) % 5 == 0).alias("converted"),
    )
    out = proportion_ab_test(df, "converted", "arm")
    sdf = spark.createDataFrame(
        [(a, out["per_arm"][a]["n"], out["per_arm"][a]["x"])
         for a in out["arms"]],
        "arm string, n long, x long",
    )
    sql = """
    SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(FLOOR(value) AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS x
    FROM events WHERE value IS NOT NULL GROUP BY 1
    """
    _assert_parity(sdf, sql)


def test_streaming_proportion_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_proportion_ab_test,
    )

    d = str(tmp_path / "propstream")
    ev = load_table(spark, SF_DIR, "events").filter("value IS NOT NULL")
    ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value").cast("long") % 7 <= 2).cast("int").alias("c"),
    ).limit(600).write.parquet(d)
    stream = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_proportion_ab_test(stream, "c", "arm")
    want = proportion_ab_test(spark.read.parquet(d), "c", "arm")
    assert got == want


def test_proportion_lift_zero_zero_is_nan(spark):
    """ADVICE r12: lift with 0 successes in BOTH arms is undefined
    (NaN), not +inf; +inf stays reserved for 0 baseline with a
    converting treatment."""
    both_zero = spark.createDataFrame(
        [("a", 0)] * 5 + [("b", 0)] * 5, "arm string, c int"
    )
    out = proportion_ab_test(both_zero, "c", "arm")
    assert math.isnan(out["lift"])
    treat_only = spark.createDataFrame(
        [("a", 0)] * 5 + [("b", 0), ("b", 1)], "arm string, c int"
    )
    assert proportion_ab_test(treat_only, "c", "arm")["lift"] == float(
        "inf"
    )


def test_streaming_proportion_validates_confidence_ppm(spark):
    """ADVICE r12: the streaming twin enforces the same confidence_ppm
    contract as batch, and fails FAST — before any stream drain — so
    the bogus value surfaces as the contract message, not a
    _beta_inv gamma-domain error after the drain."""
    from kafka_avro_order_processing_spark.streaming.abtest import (
        streaming_proportion_ab_test,
    )

    # never started: a raising-on-touch stream stub is unnecessary —
    # rate source is valid but the check must fire before .start()
    stream = (
        spark.readStream.format("rate").load()
        .select(F.lit("a").alias("arm"), F.lit(1).alias("c"))
    )
    for bad in (100_000, 400_000, 1_000_000, 0.95, None):
        with pytest.raises(ValueError, match="confidence_ppm"):
            streaming_proportion_ab_test(
                stream, "c", "arm", confidence_ppm=bad
            )
