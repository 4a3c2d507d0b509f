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
