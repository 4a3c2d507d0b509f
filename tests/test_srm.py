"""Sample-ratio-mismatch gate (operators/srm.py): the incomplete-gamma
p-value pinned against CLOSED FORMS (erfc / exp identities — no
third-party stats library), the chi-square statistic against a hand
computation, healthy and broken splits on the real events table, and
the loud-rejection contracts.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR

from kafka_avro_order_processing_spark.operators.srm import (
    chi2_sf,
    gammq,
    sample_ratio_mismatch,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def test_gammq_closed_forms():
    # df=1: Q(1/2, y) = erfc(sqrt(y));  df=2: Q(1, y) = exp(-y)
    # df=4: Q(2, y) = exp(-y) * (1 + y)
    for x in (0.01, 0.3, 1.0, 2.5, 3.841, 6.63, 15.0, 40.0):
        y = x / 2.0
        assert abs(chi2_sf(x, 1) - math.erfc(math.sqrt(y))) < 1e-12
        assert abs(chi2_sf(x, 2) - math.exp(-y)) < 1e-12
        assert abs(chi2_sf(x, 4) - math.exp(-y) * (1 + y)) < 1e-12
    # textbook quantiles: chi2_{0.95, df} -> p = 0.05
    for df, q95 in ((1, 3.841458820694124), (2, 5.991464547107979),
                    (5, 11.070497693516351)):
        assert abs(chi2_sf(q95, df) - 0.05) < 1e-9
    # laws: Q(a, 0) = 1, decreasing in x, in [0, 1]
    assert gammq(2.5, 0.0) == 1.0
    prev = 1.0
    for x in (0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 30.0):
        v = gammq(2.5, x)
        assert 0.0 <= v <= prev
        prev = v
    with pytest.raises(ValueError):
        gammq(0.0, 1.0)
    with pytest.raises(ValueError):
        gammq(1.0, -1.0)


def test_srm_hand_computed(spark):
    # 60/40 observed vs 50/50 designed over 100: chi2 = 4.0, df = 1
    rows = [("a",)] * 60 + [("b",)] * 40
    df = spark.createDataFrame(rows, "arm string")
    out = sample_ratio_mismatch(df, "arm", {"a": 1, "b": 1})
    assert out["n"] == 100
    assert out["counts"] == {"a": 60, "b": 40}
    assert out["chi2"] == 4.0
    assert out["df"] == 1
    assert abs(out["p"] - math.erfc(math.sqrt(2.0))) < 1e-12
    assert out["srm"] is False  # p ~ 0.0455 > 1e-3
    # unequal design weights: 3:1 over (72, 28) of 100 -> e = (75, 25)
    rows2 = [("a",)] * 72 + [("b",)] * 28
    df2 = spark.createDataFrame(rows2, "arm string")
    out2 = sample_ratio_mismatch(df2, "arm", {"a": 3, "b": 1})
    want = (72 - 75.0) ** 2 / 75.0 + (28 - 25.0) ** 2 / 25.0
    assert abs(out2["chi2"] - want) < 1e-12


def test_srm_on_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    healthy = ev.select(
        F.when(F.col("event_id") % 2 == 0, "control")
        .otherwise("treat").alias("arm")
    )
    out = sample_ratio_mismatch(healthy, "arm", {"control": 1, "treat": 1})
    assert out["srm"] is False  # parity split of sequential ids is exact-ish
    # a broken pipeline: ~30% of treat rows silently dropped
    broken = load_table(spark, SF_DIR, "events").select(
        F.when(F.col("event_id") % 2 == 0, "control")
        .otherwise("treat").alias("arm"),
        F.col("event_id"),
    ).filter(
        (F.col("event_id") % 2 == 0) | (F.col("event_id") % 20 >= 7)
    )
    out2 = sample_ratio_mismatch(broken, "arm", {"control": 1, "treat": 1})
    assert out2["counts"]["treat"] < out2["counts"]["control"]
    assert out2["srm"] is True
    assert out2["p"] < 1e-3


def test_srm_validation(spark):
    df = spark.createDataFrame([("a",), ("b",)], "arm string")
    with pytest.raises(ValueError, match="empty"):
        sample_ratio_mismatch(df, "arm", {})
    with pytest.raises(ValueError, match="> 0"):
        sample_ratio_mismatch(df, "arm", {"a": 1, "b": 0})
    with pytest.raises(ValueError, match="undesigned"):
        sample_ratio_mismatch(df, "arm", {"a": 1})
    with pytest.raises(Exception, match="NULL"):
        sample_ratio_mismatch(
            spark.createDataFrame([("a",), (None,)], "arm string"),
            "arm", {"a": 1, "b": 1},
        )
    with pytest.raises(ValueError, match="empty assignment"):
        sample_ratio_mismatch(df.filter("arm = 'zz'"), "arm", {"a": 1, "b": 1})
    # a designed arm with zero traffic is an extreme SRM, not an error
    out = sample_ratio_mismatch(
        spark.createDataFrame([("a",)] * 50, "arm string"),
        "arm", {"a": 1, "b": 1},
    )
    assert out["counts"]["b"] == 0 and out["srm"] is True
