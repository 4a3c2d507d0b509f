"""Leakage-safe splitting (operators/splits.py) and k-fold
cross-validation (classifier.crossval_logistic): group atomicity (the
anti-leakage property itself), fraction accuracy, determinism under
partitioning, salt independence, and the end-to-end crossval journey.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.classifier import (
    crossval_logistic,
)
from kafka_avro_order_processing_spark.operators.splits import (
    assign_split,
    kfold_assign,
)


def _groups(spark, n_groups=800, rows_per=3):
    rows = [
        (g, r, g * 10 + r) for g in range(n_groups) for r in range(rows_per)
    ]
    return spark.createDataFrame(rows, "grp int, member int, payload int")


def test_groups_never_straddle_splits(spark):
    df = _groups(spark)
    out = assign_split(
        df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    per_group = out.groupBy("grp").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_group.filter(F.col("k") > 1).count() == 0


def test_fractions_roughly_hold(spark):
    df = _groups(spark, n_groups=5000, rows_per=1)
    out = assign_split(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts.get("val", 0) / 5000 - 0.1) < 0.03
    assert abs(counts.get("test", 0) / 5000 - 0.1) < 0.03


def test_split_deterministic_and_salted(spark):
    df = _groups(spark, n_groups=300)
    a = sorted(
        (r["grp"], r["member"], r["split"])
        for r in assign_split(df, "grp", {"a": 0.5, "b": 0.5}).collect()
    )
    b = sorted(
        (r["grp"], r["member"], r["split"])
        for r in assign_split(
            df.repartition(11), "grp", {"a": 0.5, "b": 0.5}
        ).collect()
    )
    assert a == b
    c = sorted(
        (r["grp"], r["member"], r["split"])
        for r in assign_split(
            df, "grp", {"a": 0.5, "b": 0.5}, salt="other"
        ).collect()
    )
    assert a != c  # a different salt is a different split


def test_bad_fractions_rejected(spark):
    df = _groups(spark, n_groups=10)
    with pytest.raises(ValueError):
        assign_split(df, "grp", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        assign_split(df, "grp", {"a": 1.5, "b": -0.5})


def test_kfold_covers_and_is_group_consistent(spark):
    df = _groups(spark, n_groups=1000)
    out = kfold_assign(df, "grp", 5)
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds == {0, 1, 2, 3, 4}
    per_group = out.groupBy("grp").agg(F.countDistinct("fold").alias("k"))
    assert per_group.filter(F.col("k") > 1).count() == 0
    sizes = [
        r["n"]
        for r in out.groupBy("fold").agg(F.count("*").alias("n")).collect()
    ]
    assert min(sizes) > 0.6 * max(sizes)  # roughly balanced
    with pytest.raises(ValueError):
        kfold_assign(df, "grp", 1)


@pytest.mark.slow
def test_crossval_logistic_journey(spark):
    rnd = random.Random(17)
    rows = []
    for i in range(600):
        y = 1 if rnd.random() < 0.5 else 0
        rows.append(
            (
                i,
                rnd.gauss(2.0 if y else -1.0, 1.0),
                rnd.gauss(-1.0 if y else 1.5, 1.5),
                y,
            )
        )
    df = spark.createDataFrame(rows, "i int, f0 double, f1 double, label int")
    res = crossval_logistic(
        df, ["f0", "f1"], k=3, by="i", n_rounds=25
    )
    assert [r["fold"] for r in res] == [0, 1, 2]
    assert sum(r["n_test"] for r in res) == 600  # folds partition the data
    for r in res:
        assert r["auc"] > 0.85
        assert len(r["model"]["weights"]) == 2
    with pytest.raises(ValueError):
        crossval_logistic(df, ["f0"], k=3)  # 'by' is required
