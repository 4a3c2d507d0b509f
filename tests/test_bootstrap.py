"""Poisson bootstrap (operators/bootstrap.py): replicate weights
re-derived bit-for-bit by a Python replica, replicate means exact under
the decimal discipline, repartition/rerun determinism, CI sanity
(brackets the mean, tightens with n), and loud validation.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from kafka_avro_order_processing_spark.operators.bootstrap import (
    _MAX_K,
    _poisson_cdf_ladder,
    poisson_bootstrap_mean_ci,
)
from kafka_avro_order_processing_spark.operators.similarity import MEAN_SCALE


def _py_weight(salt, rid, rep):
    h = hashlib.md5(f"{salt}:{rid}:{rep}".encode()).hexdigest()[:13]
    u = int(h, 16) / float(1 << 52)
    for k, c in enumerate(_poisson_cdf_ladder()):
        if u < c:
            return k
    return _MAX_K


def _py_ci(rows, b, alpha, salt="boot:"):
    n = len(rows)
    scaled = {rid: int(round(v * MEAN_SCALE)) for rid, v in rows}
    mean = sum(scaled.values()) / (n * MEAN_SCALE)
    means = []
    for rep in range(1, b + 1):
        sw = sv = 0
        for rid, _ in rows:
            w = _py_weight(salt, rid, str(rep))
            sw += w
            sv += w * scaled[rid]
        if sw > 0:
            means.append(sv / (sw * MEAN_SCALE))
    means = sorted(means + [mean] * (b - len(means)))
    lo_i = max(0, min(b - 1, int(math.floor((b + 1) * (alpha / 2))) - 1))
    hi_i = max(0, min(b - 1, int(math.ceil((b + 1) * (1 - alpha / 2))) - 1))
    return mean, means[lo_i], means[hi_i]


ROWS = [(i, float((i * 7) % 23) / 4.0) for i in range(60)]  # dyadic values


def _frame(spark, rows=ROWS):
    return spark.createDataFrame(rows, "rid long, v double")


def test_matches_python_replica_exactly(spark):
    got = poisson_bootstrap_mean_ci(_frame(spark), "v", "rid", b=50)
    mean, lo, hi = _py_ci(ROWS, b=50, alpha=0.05)
    assert got["mean"] == mean  # dyadic values: decimal sum is exact
    assert got["lo"] == lo and got["hi"] == hi
    assert got["n"] == len(ROWS)


def test_rerun_and_repartition_deterministic(spark):
    a = poisson_bootstrap_mean_ci(_frame(spark), "v", "rid", b=40)
    c = poisson_bootstrap_mean_ci(
        _frame(spark).repartition(7), "v", "rid", b=40
    )
    assert a == c


def test_ci_brackets_mean_and_tightens(spark):
    small = poisson_bootstrap_mean_ci(_frame(spark), "v", "rid", b=60)
    assert small["lo"] <= small["mean"] <= small["hi"]
    big_rows = [(i, float((i * 7) % 23) / 4.0) for i in range(600)]
    big = poisson_bootstrap_mean_ci(_frame(spark, big_rows), "v", "rid", b=60)
    assert big["hi"] - big["lo"] < small["hi"] - small["lo"]


def test_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="b must"):
        poisson_bootstrap_mean_ci(df, "v", "rid", b=1)
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_mean_ci(df, "v", "rid", alpha=1.5)
    withnull = spark.createDataFrame([(1, None)], "rid long, v double")
    with pytest.raises(ValueError, match="NULL"):
        poisson_bootstrap_mean_ci(withnull, "v", "rid")
    empty = spark.createDataFrame([], "rid long, v double")
    with pytest.raises(ValueError, match="empty"):
        poisson_bootstrap_mean_ci(empty, "v", "rid")
