"""KLL/MRL quantile sketch (operators/kll.py): exact weight
conservation, the size bound, rank-error bounds against exact
quantiles (global + grouped, on real event values), the merge law
(roll-up of halves stays within the one-sketch error bound with
exact total weight), small-input exactness, determinism over a fixed
layout, and loud NULL/NaN rejection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR

from kafka_avro_order_processing_spark.operators.kll import (
    kll_merge,
    kll_quantiles,
    kll_sketch,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def _values(spark):
    return load_table(spark, SF_DIR, "events").select("value", "event_type")


def _exact_rank(sorted_vals: list[float], v: float) -> int:
    """# of elements <= v."""
    import bisect

    return bisect.bisect_right(sorted_vals, v)


QS = (0.01, 0.25, 0.5, 0.9, 0.99)


def test_weight_conservation_and_size_bound(spark):
    df = _values(spark)
    n = df.count()
    sk = kll_sketch(df, "value", k=64)
    rows = sk.collect()
    assert sum(2 ** r["level"] for r in rows) == n
    n_levels = max(r["level"] for r in rows) + 1
    assert n_levels <= math.ceil(math.log2(max(n, 64) / 64)) + 3
    # every level within capacity after the final compaction
    per_level: dict[int, int] = {}
    for r in rows:
        per_level[r["level"]] = per_level.get(r["level"], 0) + 1
    assert all(c <= 64 for c in per_level.values()), per_level


def test_rank_error_bound_global(spark):
    df = _values(spark)
    vals = sorted(r["value"] for r in df.collect())
    n = len(vals)
    k = 128
    ests = {
        r["q"]: r["est"]
        for r in kll_quantiles(kll_sketch(df, "value", k=k), QS).collect()
    }
    # MRL-style deterministic bound ~ n*log2(n/k)/k; allow that much.
    budget = n * math.log2(max(n / k, 2)) / k
    for q in QS:
        err = abs(_exact_rank(vals, ests[q]) - q * n)
        assert err <= budget, (q, ests[q], err, budget)


def test_rank_error_bound_grouped(spark):
    df = _values(spark)
    by_type: dict[str, list[float]] = {}
    for r in df.collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for v in by_type.values():
        v.sort()
    sk = kll_sketch(df, "value", k=96, by=["event_type"])
    out = kll_quantiles(sk, (0.5, 0.9), by=["event_type"]).collect()
    assert {r["event_type"] for r in out} == set(by_type)
    for r in out:
        vals = by_type[r["event_type"]]
        n = len(vals)
        budget = n * math.log2(max(n / 96, 2)) / 96 + 1
        err = abs(_exact_rank(vals, r["est"]) - r["q"] * n)
        assert err <= budget, (r, err, budget)


def test_merge_law(spark):
    df = _values(spark)
    a = df.filter(F.col("value") >= 50.0)
    b = df.filter(F.col("value") < 50.0)
    merged = kll_merge(
        kll_sketch(a, "value", k=128), kll_sketch(b, "value", k=128), k=128
    )
    rows = merged.collect()
    assert sum(2 ** r["level"] for r in rows) == df.count()
    vals = sorted(r["value"] for r in df.collect())
    n = len(vals)
    ests = {r["q"]: r["est"] for r in kll_quantiles(merged, QS).collect()}
    budget = 2 * n * math.log2(max(n / 128, 2)) / 128
    for q in QS:
        err = abs(_exact_rank(vals, ests[q]) - q * n)
        assert err <= budget, (q, err, budget)


def test_small_input_is_exact(spark):
    df = spark.createDataFrame([Row(value=float(i)) for i in range(50)])
    sk = kll_sketch(df, "value", k=64)
    rows = sk.collect()
    assert all(r["level"] == 0 for r in rows) and len(rows) == 50
    ests = {r["q"]: r["est"] for r in
            kll_quantiles(sk, (0.02, 0.5, 1.0)).collect()}
    # rank = ceil(q*50): 1 -> 0.0, 25 -> 24.0, 50 -> 49.0
    assert ests == {0.02: 0.0, 0.5: 24.0, 1.0: 49.0}


def test_deterministic_over_fixed_layout(spark):
    df = _values(spark).repartition(4, "event_type").sortWithinPartitions(
        "event_type", "value"
    )
    r1 = sorted(map(tuple, kll_sketch(df, "value", k=64).collect()))
    r2 = sorted(map(tuple, kll_sketch(df, "value", k=64).collect()))
    assert r1 == r2


def test_null_nan_rejected(spark):
    df = spark.createDataFrame(
        [Row(value=1.0), Row(value=None)], "value double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        kll_sketch(df, "value", k=16).collect()
    df2 = spark.createDataFrame(
        [Row(value=1.0), Row(value=float("nan"))], "value double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        kll_sketch(df2, "value", k=16).collect()
    with pytest.raises(ValueError, match="k >= 8"):
        kll_sketch(df, "value", k=4)
    with pytest.raises(ValueError, match="outside"):
        kll_quantiles(kll_sketch(df.limit(1), "value"), (0.0,))
